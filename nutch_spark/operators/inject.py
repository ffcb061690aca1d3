"""Inject — merge seed URLs into the frontier.

Semantics from reference crawl/Injector.java:
  * seed lines carry optional ``k=v`` metadata with reserved keys
    ``nutch.score``, ``nutch.fetchInterval``, ``nutch.fetchInterval.fixed``
    (Injector.java:87-98, 146-181);
  * seeds are normalized + filtered before the merge (Injector.java:183-218);
  * merge rules (Injector.java:257-312):
      - seed-only  → new row, status=db_unfetched, score=db.score.injected,
        interval=default (or seed override), fetch_time=now
      - db-only    → kept unchanged
      - both, no flags        → old row kept byte-for-byte
      - both, overwrite=True  → injected row wins
      - both, update=True     → old row kept, metadata merged (seed
        overrides), non-default seed score/interval copied over
  * rows with status db_gone can be purged like the 404-purge path
    (Injector.java:225-226) — exposed as purge_404.

Spark-first: one full-outer join on url (Catalyst plans a broadcast for
small seed lists automatically under AQE) + a when/otherwise column
program. No shuffling beyond the single join; at 10^10-frontier scale
the join key is the frontier's bucketed sort key, so Iceberg
storage-partitioned join avoids the big-side shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..constants import (
    Defaults,
    META_FIXED_INTERVAL_KEY,
    META_INTERVAL_KEY,
    META_SCORE_KEY,
    STATUS_DB_GONE,
    STATUS_DB_UNFETCHED,
)
from ..functions.scoring import OPIC, ScoringHooks
from ..functions.urls import accept_urls, host_of, url_hash_col, with_normalized
from ..schema import FRONTIER


def prepare_seeds(
    seeds: DataFrame, cur_time_ms: int, hooks: ScoringHooks = OPIC,
    normalizers=None,  # functions.urlplugins.ScopedNormalizers | None
    url_filters=None,  # functions.urlplugins.FilterChain | None
) -> DataFrame:
    """Normalize/filter seeds and shape them as frontier rows.

    `hooks.injected_score` is the ScoringFilter.injectedScore hook point
    (Injector.java:169-175; OPIC keeps the score as-is)."""
    meta = F.coalesce(
        F.col("metadata"), F.create_map().cast("map<string,string>")
    )
    renamed = seeds.withColumnRenamed("url", "_url_raw")
    normed = (
        normalizers.with_normalized(renamed, "_url_raw", "url", scope="inject")
        if normalizers is not None
        else with_normalized(renamed, "_url_raw", "url")
    )
    s = (
        normed
        .drop("_url_raw")
        .filter(F.col("url").isNotNull() & (F.col("url") != ""))
        .filter(accept_urls(F.col("url")))
        .withColumn("metadata", meta)
    )
    if url_filters is not None:
        from ..functions.urlplugins import filter_pred

        s = s.filter(filter_pred(url_filters, F.col("url")))
    score = hooks.injected_score(
        F.coalesce(
            F.element_at("metadata", META_SCORE_KEY).cast("float"),
            F.lit(float(Defaults.SCORE_INJECTED)),
        )
    )
    interval = F.coalesce(
        F.element_at("metadata", META_FIXED_INTERVAL_KEY).cast("int"),
        F.element_at("metadata", META_INTERVAL_KEY).cast("int"),
        F.lit(Defaults.FETCH_INTERVAL),
    )
    if hooks.injected_metadata is not None:
        # metadata half of ScoringFilter.injectedScore (scoring-depth
        # stamps _depth_=1 and the _maxdepth_ budget on every seed)
        s = s.withColumn(
            "metadata", hooks.injected_metadata(F.col("metadata"))
        )
    return s.select(
        F.col("url"),
        url_hash_col(F.col("url")).alias("url_hash"),
        host_of(F.col("url")).alias("host"),
        F.lit(STATUS_DB_UNFETCHED).alias("status"),
        F.lit(cur_time_ms).alias("fetch_time"),
        F.lit(0).alias("retries"),
        interval.alias("fetch_interval"),
        score.alias("score"),
        F.lit(None).cast("string").alias("signature"),
        F.lit(0).cast("long").alias("modified_time"),
        F.col("metadata"),
    )


def inject(
    spark,
    frontier: DataFrame | None,
    seeds: DataFrame,
    cur_time_ms: int,
    overwrite: bool = False,
    update: bool = False,
    purge_404: bool = False,
    hooks: ScoringHooks = OPIC,
    normalizers=None,
    url_filters=None,
) -> DataFrame:
    inj = prepare_seeds(seeds, cur_time_ms, hooks, normalizers, url_filters)
    if frontier is None:
        frontier = spark.createDataFrame([], FRONTIER)
    if purge_404:
        frontier = frontier.filter(F.col("status") != STATUS_DB_GONE)

    old = frontier.select([F.col(c).alias(f"old_{c}") for c in frontier.columns])
    new = inj.select([F.col(c).alias(f"new_{c}") for c in inj.columns])
    j = old.join(new, old.old_url == new.new_url, "full_outer")

    has_old = F.col("old_url").isNotNull()
    has_new = F.col("new_url").isNotNull()

    def pick(col: str):
        o, n = F.col(f"old_{col}"), F.col(f"new_{col}")
        if overwrite:
            both = n
        elif update and col == "metadata":
            # old kept, metadata merged with seed overriding
            both = F.map_zip_with(
                F.coalesce(o, F.create_map().cast("map<string,string>")),
                F.coalesce(n, F.create_map().cast("map<string,string>")),
                lambda _k, vo, vn: F.coalesce(vn, vo),
            )
        elif update and col in ("score", "fetch_interval"):
            # non-default seed score/interval copied over (Injector.java:296-305)
            default = (
                float(Defaults.SCORE_INJECTED)
                if col == "score"
                else Defaults.FETCH_INTERVAL
            )
            both = F.when(n != F.lit(default), n).otherwise(o)
        else:
            both = o  # no flags / update: old row kept
        return (
            F.when(has_old & has_new, both)
            .when(has_old, o)
            .otherwise(n)
            .alias(col)
        )

    return j.select([pick(c) for c in frontier.columns])
