"""Scoring-filter hook registry — the reference's ScoringFilter
extension surface as column-function hooks.

Reference: scoring/ScoringFilter.java defines 9 hook points that
plugins (default: scoring-opic) implement; the crawl jobs call them at
fixed places. Here each hook is a plain Python callable over Columns,
collected in a `ScoringHooks` record — registering a custom scorer is
assigning a function, no classloading:

  hook                      called from                reference
  ----                      -----------                ---------
  injected_score            inject seed rows           OPICScoringFilter.injectedScore (score as-is)
  initial_score             new linked URLs            OPICScoringFilter.initialScore = 0.0
  generator_sort_value      generate ordering          OPICScoringFilter.generatorSortValue = score × initSort
  pass_score_before_parsing fetch → content metadata   OPIC stashes score for parse
  pass_score_after_parsing  content → parse metadata   (pass-through)
  distribute_score_to_outlinks  parse outlink contribs OPICScoringFilter.distributeScoreToOutlinks:
                                                       score/valid_count × internal/external factor
  update_db_score           updatedb merge             OPICScoringFilter.updateDbScore = score + Σ inlinks
  indexer_score             index boost                OPICScoringFilter.indexerScore = score
  orphan_score              (orphan cleanup; unused)   —

`OPIC` below reproduces the default plugin exactly — it is the very
arithmetic the operators inline (updatedb adds the link-adjust sum,
parse divides by valid_count, generate sorts by score), so the default
hook set and the operator defaults agree by construction; operators
take these hooks where the computation is a genuine extension point.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F

ColumnFn = Callable[..., Column]


def _identity(score: Column) -> Column:
    return score


def _as_score_col(init_sort) -> Column:
    """Sort values thread through plugin chains
    (ScoringFilters.generatorSortValue), so a hook's init_sort may be
    the previous plugin's output Column rather than a float."""
    return init_sort if isinstance(init_sort, Column) else F.lit(float(init_sort))


@dataclass
class ScoringHooks:
    injected_score: ColumnFn = _identity
    # initialScore(url, datum) runs on the promoted first-link datum
    # for brand-new linked URLs (CrawlDbReducer.java:150-153, 192-206):
    # OPIC resets the score to 0; a no-op filter (AbstractScoringFilter)
    # keeps the link datum's own score, so the hook receives it.
    initial_score: ColumnFn = field(default=lambda link_score=None: F.lit(0.0))
    generator_sort_value: ColumnFn = field(
        default=lambda score, init_sort=1.0: score * _as_score_col(init_sort)
    )
    pass_score_before_parsing: ColumnFn = _identity
    pass_score_after_parsing: ColumnFn = _identity
    distribute_score_to_outlinks: ColumnFn = field(
        default=lambda score, valid_count, factor: score / valid_count * factor
    )
    update_db_score: ColumnFn = field(
        default=lambda base, link_adjust: base + link_adjust
    )
    indexer_score: ColumnFn = _identity

    # --- metadata-aware extension points (None = inactive; operators
    # add the corresponding plan nodes only when a hook is set, so the
    # default OPIC plan is unchanged). These exist because some
    # reference plugins (scoring-depth is the shipped example) carry
    # state through CrawlDatum.metaData rather than the score float:
    #
    #   injected_metadata(seed_meta) -> map          inject: decorate seed rows
    #     (DepthScoringFilter.injectedScore writes _depth_/_maxdepth_)
    #   generator_sort_value_meta(score, meta, init_sort) -> sort Column
    #     (generatorSortValue reads datum.getMetaData())
    #   outlink_gate(page_meta) -> boolean           parse: emit outlinks at all?
    #     (distributeScoreToOutlinks may targets.clear())
    #   outlink_metadata(page_meta) -> map           parse: per-target metadata
    #     (distributeScoreToOutlinks decorates each target datum)
    #   link_meta_agg(link_meta) -> orderable value  updatedb: min-aggregated
    #     over a URL's linked datums (updateDbScore iterates `inlinked`)
    #   update_db_metadata(result_meta, old_meta, link_agg) -> map
    #     updatedb: rewrite the result row's metadata from the old row's
    #     metadata and the aggregate (updateDbScore writes the result)
    injected_metadata: ColumnFn | None = None
    generator_sort_value_meta: ColumnFn | None = None
    outlink_gate: ColumnFn | None = None
    outlink_metadata: ColumnFn | None = None
    link_meta_agg: ColumnFn | None = None
    update_db_metadata: ColumnFn | None = None


OPIC = ScoringHooks()


def link_analysis_hooks(normalized_score: float = 1.0) -> ScoringHooks:
    """scoring-link plugin (LinkAnalysisScoringFilter.java) — the
    webgraph-score-consuming twin of scoring-opic. The CrawlDb score is
    NOT crawl-derived: ScoreUpdater writes the webgraph/linkrank score
    into the frontier (operators/linkdb.py update_scores), and this
    filter only *reads* it:

      - injectedScore: no-op (seed scores untouched)
      - initialScore: 0.0 for brand-new URLs
      - generatorSortValue: score × initSort — same formula as OPIC but
        over the linkrank-written score, so generate ordering follows
        link analysis, not OPIC cash flow
      - distributeScoreToOutlinks: returns adjust untouched and leaves
        targets at the CrawlDatum default score 0.0 (linkrank will
        score them once they enter the webgraph)
      - updateDbScore: no-op — the merged row keeps its base score,
        with NO inlink-contribution sum added
      - indexerScore: normalizedScore × dbDatum score
        (link.analyze.normalize.score, default 1.0)
    """
    ns = float(normalized_score)
    return ScoringHooks(
        injected_score=_identity,
        initial_score=lambda link_score=None: F.lit(0.0),
        generator_sort_value=lambda score, init_sort=1.0: score
        * _as_score_col(init_sort),
        distribute_score_to_outlinks=lambda score, valid_count, factor: F.lit(
            0.0
        ),
        update_db_score=lambda base, link_adjust: base,
        indexer_score=lambda score: F.lit(ns) * score,
    )


_REGISTRY: dict[str, ScoringHooks] = {
    "opic": OPIC,
    "link": link_analysis_hooks(),
}


def register(name: str, hooks: ScoringHooks) -> None:
    _REGISTRY[name] = hooks


def get(name: str) -> ScoringHooks:
    return _REGISTRY[name]
