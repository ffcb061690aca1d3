"""CrawlDbMerger + SegmentMerger — n-way dataset merges.

Reference semantics:
  * CrawlDbMerger (crawl/CrawlDbMerger.Merger.reduce,
    CrawlDbMerger.java:75-112): union N frontiers; per URL the row
    with the latest fetch_time wins; metadata is the union of all
    rows' maps with the newer row's entries overriding.
  * SegmentMerger (segment/SegmentMerger.java:126-560): union N
    segments' outputs per URL, latest generation wins (here: latest
    fetch_time, then segment id as tiebreak); optional slicing into
    fixed-size output slices (sliceSize, SegmentMerger.java:381-394).

Spark shape: unionByName + one window (max-by) per key — a single
shuffle on url. The reference runs one MR job with a custom reducer;
Catalyst's WindowGroupLimit turns the rank-1 filter into a partial
top-1 per map side, so the shuffle carries one candidate row per
(partition, url) — the same work its combiner did.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def merge_crawldbs(
    frontiers: list[DataFrame],
    normalizers=None,  # functions.urlplugins.ScopedNormalizers | None
    url_filters=None,  # functions.urlplugins.FilterChain | None
) -> DataFrame:
    """Latest-fetch_time row per URL wins; metadata union with the
    winner's (newer) entries overriding older ones.

    With `normalizers` / `url_filters`, each input row's URL is first
    re-normalized (crawldb scope) and filtered — the CrawlDbFilter
    map pass (crawl/CrawlDbFilter.java:63-107): normalize may COLLAPSE
    keys, in which case the normal latest-wins merge resolves the
    duplicates; filtered-out URLs are dropped."""
    u = reduce(lambda a, b: a.unionByName(b, allowMissingColumns=True), frontiers)
    if normalizers is not None:
        u = (
            normalizers.with_normalized(
                u.withColumnRenamed("url", "_url_raw"), "_url_raw", "url",
                scope="crawldb",
            )
            .drop("_url_raw")
            .filter(F.col("url").isNotNull() & (F.col("url") != ""))
        )
    if url_filters is not None:
        from ..functions.urlplugins import filter_pred

        u = u.filter(filter_pred(url_filters, F.col("url")))
    w = Window.partitionBy("url").orderBy(
        F.desc("fetch_time"), F.desc("score"), F.asc("status")
    )
    meta = F.coalesce(
        F.col("metadata"), F.create_map().cast("map<string,string>")
    )
    ranked = u.withColumn("_r", F.row_number().over(w)).withColumn("_m", meta)
    # per-key union with newest-row value winning: explode every map,
    # keep the lowest-rank (newest) row's value per (url, key), fold
    # back into one map
    entries = ranked.select(
        "url", "_r", F.explode_outer("_m").alias("key", "value")
    ).filter(F.col("key").isNotNull())
    wk = Window.partitionBy("url", "key").orderBy(F.asc("_r"))
    kept = entries.withColumn("_rk", F.row_number().over(wk)).filter(
        F.col("_rk") == 1
    )
    merged_meta = kept.groupBy("url").agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("key", "value")))
        ).alias("metadata_merged")
    )
    winner = ranked.filter(F.col("_r") == 1).drop("_r", "_m", "metadata")
    return (
        winner.join(merged_meta, "url", "left")
        .withColumn(
            "metadata",
            F.coalesce(
                F.col("metadata_merged"),
                F.create_map().cast("map<string,string>"),
            ),
        )
        .drop("metadata_merged")
    )


class SegmentMergeFilter:
    """Extension point ≙ segment/SegmentMergeFilter.java: a per-URL
    veto that sees the FULL record bundle being merged for that key —
    every row the URL has across all input segments (the reference
    hands the reduce group: generate/fetch/signature datums, content,
    parse data/text, linked datums) — so it can filter "on more
    sophisticated criteria than just URLs", e.g. parse metadata. Like
    SegmentMergeFilters.filter (SegmentMergeFilters.java:70-85), the
    chain is ANY-VETO: one filter returning false drops the URL from
    the merged segment entirely.

    Spark shape: ``accept(key_col, rows_col) -> boolean Column`` where
    ``rows_col`` is ``array<struct<all input columns>>`` — the bundle
    is assembled with collect_list over the same url-partitioned
    window the latest-wins merge already shuffles on, so the hook adds
    no exchange. Express per-bundle criteria with F.exists/F.filter/
    F.transform over the array (JVM-side higher-order functions, no
    Python)."""

    def accept(self, key_col, rows_col):
        raise NotImplementedError


class RequireAllSegmentsFilter(SegmentMergeFilter):
    """Example merge filter: keep only URLs observed in at least
    `n_segments` distinct input segments — a bundle-level criterion no
    plain URLFilter can express."""

    def __init__(self, n_segments: int):
        self.n_segments = int(n_segments)

    def accept(self, key_col, rows_col):
        segs = F.array_distinct(
            F.transform(rows_col, lambda r: r["segment"])
        )
        return F.size(segs) >= F.lit(self.n_segments)


class MetadataMergeFilter(SegmentMergeFilter):
    """Example merge filter: keep a URL iff SOME row in its bundle
    carries metadata[key] (optionally = value) — the reference's
    motivating case, filtering on metadata collected while parsing."""

    def __init__(self, key: str, value: str | None = None):
        self.key, self.value = key, value

    def accept(self, key_col, rows_col):
        if self.value is None:
            return F.exists(
                rows_col, lambda r: r["metadata"][self.key].isNotNull()
            )
        return F.exists(
            rows_col, lambda r: r["metadata"][self.key] == F.lit(self.value)
        )


def merge_segments(
    segments: list[DataFrame],
    slice_size: int | None = None,
    url_filters=None,  # functions.urlplugins.FilterChain | None
    merge_filters=None,  # list[SegmentMergeFilter | callable] | None
) -> DataFrame:
    """Per-URL latest row across segments; optional slicing adds a
    `slice` column (row_number div slice_size — SegmentMerger's
    sliceSize semantics, deterministic by url_hash order). With
    `url_filters`, rows failing the chain are dropped (SegmentMerger
    -filter, segment/SegmentMerger.java). `merge_filters` is the
    SegmentMergeFilter extension point (any-veto per URL over the full
    record bundle — see the class docstring); following the reference,
    URL filters run first (map side) and merge filters on the
    collected reduce group (SegmentMerger.java reduce)."""
    u = reduce(lambda a, b: a.unionByName(b, allowMissingColumns=True), segments)
    if url_filters is not None:
        from ..functions.urlplugins import filter_pred

        u = u.filter(filter_pred(url_filters, F.col("url")))
    if merge_filters:
        rows_col = F.collect_list(
            F.struct(*[F.col(c) for c in u.columns])
        ).over(Window.partitionBy("url"))
        u = u.withColumn("_rows", rows_col)
        pred = F.lit(True)
        for flt in merge_filters:
            fn = flt.accept if hasattr(flt, "accept") else flt
            pred = pred & fn(F.col("url"), F.col("_rows"))
        u = u.filter(pred).drop("_rows")
    w = Window.partitionBy("url").orderBy(
        F.desc("fetch_time"), F.desc("segment")
    )
    out = u.withColumn("_r", F.row_number().over(w)).filter(
        F.col("_r") == 1
    ).drop("_r")
    if slice_size:
        ws = Window.orderBy("url_hash", "url")
        out = out.withColumn(
            "slice",
            F.floor((F.row_number().over(ws) - 1) / F.lit(slice_size)).cast(
                "int"
            ),
        )
    return out
