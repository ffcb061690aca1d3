"""scoring-depth plugin — depth-limited crawling via metadata counters.

Reference: src/plugin/scoring-depth/src/java/org/apache/nutch/scoring/
depth/DepthScoringFilter.java. The plugin bounds how many hops a crawl
follows from the seeds by carrying two integers in CrawlDatum metadata:

  ``_depth_``    — hops from the nearest seed (seeds start at 1),
  ``_maxdepth_`` — per-URL hop budget (seed-file override of the
                   ``scoring.depth.max`` default, carried downstream).

Hook-for-hook mapping (reference line refs are DepthScoringFilter.java):

  injectedScore (141-158)    → ``injected_metadata``: keep a seed-file
      ``_maxdepth_`` if present, else write the default; always set
      ``_depth_`` = 1.
  generatorSortValue (97-117)→ ``generator_sort_value_meta``: boost
      shallow pages — sort = initSort × (1 + maxdepth − depth); a row
      with no depth key is penalized with depth = maxdepth (mul 0).
  distributeScoreToOutlinks (56-95) → ``outlink_gate`` (a page with no
      depth key, or depth ≥ maxdepth, contributes NO outlinks) +
      ``outlink_metadata`` (targets get depth+1, plus the custom
      maxdepth when the page carries one).
  updateDbScore (185-207)    → ``link_meta_agg`` (per-link depth int) +
      ``update_db_metadata``: result depth = min(DEFAULT_MAX_DEPTH,
      old depth, min over linked depths), nulls skipped — including
      the reference's quirk that an old row WITHOUT a depth key does
      not contribute (initialScore mutates `old` but newDepth keeps
      running from DEFAULT_MAX_DEPTH).
  passScoreBefore/AfterParsing (160-183) → structural: the engine
      threads fetch-datum metadata through parse_data (the contentMeta
      path), so the copy hops are the identity here.

Divergence (documented): ``update_db_metadata``'s min runs over ALL of
a URL's linked datums, while the reference iterates the top-K-by-score
capped list (CrawlDbReducer's InlinkPriorityQueue). The two differ only
for URLs with more than db.update.max.inlinks (10 000) inlinks whose
minimum-depth link ranks below the cap.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .scoring import ScoringHooks, _as_score_col

DEPTH_KEY = "_depth_"
MAX_DEPTH_KEY = "_maxdepth_"
# "maximum value that we are never likely to reach" —
# DepthScoringFilter.java:40 (scoring.depth.max default)
DEFAULT_MAX_DEPTH = 1000


def _meta(meta: Column) -> Column:
    return F.coalesce(meta, F.create_map().cast("map<string,string>"))


def _depth_of(meta: Column) -> Column:
    return F.element_at(_meta(meta), DEPTH_KEY).try_cast("int")


def _maxdepth_of(meta: Column, default_max: int) -> Column:
    return F.coalesce(
        F.element_at(_meta(meta), MAX_DEPTH_KEY).try_cast("int"),
        F.lit(default_max),
    )


def depth_hooks(max_depth: int = DEFAULT_MAX_DEPTH) -> ScoringHooks:
    """ScoringHooks for the scoring-depth plugin.

    ``max_depth`` is the ``scoring.depth.max`` config default; a seed
    row's ``_maxdepth_`` metadata overrides it per-URL and is inherited
    by that page's outlinks, exactly like the reference's injector-file
    override.
    """
    default_max = int(max_depth) if int(max_depth) > 0 else DEFAULT_MAX_DEPTH

    def injected_metadata(meta: Column) -> Column:
        # keep a seed-supplied _maxdepth_, else the default; depth = 1
        # (DepthScoringFilter.injectedScore)
        m = _meta(meta)
        return F.map_concat(
            F.map_filter(
                m, lambda k, _v: (k != DEPTH_KEY) & (k != MAX_DEPTH_KEY)
            ),
            F.create_map(
                F.lit(DEPTH_KEY),
                F.lit("1"),
                F.lit(MAX_DEPTH_KEY),
                F.coalesce(
                    F.element_at(m, MAX_DEPTH_KEY), F.lit(str(default_max))
                ),
            ),
        )

    def generator_sort_value_meta(
        score: Column, meta: Column, init_sort=1.0
    ) -> Column:
        cur_max = _maxdepth_of(meta, default_max)
        # missing depth is penalized to depth = maxdepth (mul = 0)
        cur_depth = F.coalesce(_depth_of(meta), cur_max)
        return _as_score_col(init_sort) * (
            F.lit(1) + (cur_max - cur_depth)
        ).cast("float")

    def outlink_gate(page_meta: Column) -> Column:
        # missing depth → "removing all outlinks" (reference warns);
        # depth ≥ maxdepth → depth limit reached, targets cleared
        d = _depth_of(page_meta)
        return d.isNotNull() & (d < _maxdepth_of(page_meta, default_max))

    def outlink_metadata(page_meta: Column) -> Column:
        custom = F.element_at(_meta(page_meta), MAX_DEPTH_KEY)
        bumped = (_depth_of(page_meta) + F.lit(1)).cast("string")
        base = F.create_map(F.lit(DEPTH_KEY), bumped)
        # record maxDepth only when the page carries a custom one
        # (DepthScoringFilter.java:87-91)
        return F.when(
            custom.isNotNull(),
            F.map_concat(
                base, F.create_map(F.lit(MAX_DEPTH_KEY), custom)
            ),
        ).otherwise(base)

    def link_meta_agg(link_meta: Column) -> Column:
        return _depth_of(link_meta)

    def update_db_metadata(
        result_meta: Column, old_meta: Column, link_agg: Column
    ) -> Column:
        # newDepth starts at DEFAULT_MAX_DEPTH (not the configured
        # default) per the reference; least() skips nulls
        new_depth = F.least(
            F.lit(DEFAULT_MAX_DEPTH),
            _depth_of(old_meta),
            link_agg.try_cast("int"),
        )
        return F.map_concat(
            F.map_filter(_meta(result_meta), lambda k, _v: k != DEPTH_KEY),
            F.create_map(F.lit(DEPTH_KEY), new_depth.cast("string")),
        )

    return ScoringHooks(
        injected_metadata=injected_metadata,
        generator_sort_value_meta=generator_sort_value_meta,
        outlink_gate=outlink_gate,
        outlink_metadata=outlink_metadata,
        link_meta_agg=link_meta_agg,
        update_db_metadata=update_db_metadata,
    )


# default-config instance in the plugin registry, next to "opic"/"link"
from .scoring import register as _register  # noqa: E402

_register("depth", depth_hooks())
