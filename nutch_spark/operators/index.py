"""Indexing join — build index documents from frontier ⋈ parse ⋈ linkdb.

Reference: indexer/IndexerMapReduce.java:56-379 co-groups CrawlDb +
LinkDb + segment parse/fetch data per URL and emits one NutchDocument
per successfully-fetched page: db status must be fetched/notmodified,
parse data must exist, inlink anchors are attached (index-anchor
plugin), and the document boost comes from the page score
(scoring-opic indexerScore = score).

Spark shape: two equi-joins on url — parse_data inner (no parse ⇒ no
document, IndexerMapReduce.java:239-244), linkdb left (anchors
optional). Both joins are broadcast-able when the cycle's parse output
is small relative to the frontier; at 10^10 scale all three tables
share the host-hash bucketing so the joins co-locate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..constants import (
    STATUS_DB_DUPLICATE,
    STATUS_DB_FETCHED,
    STATUS_DB_GONE,
    STATUS_DB_NOTMODIFIED,
    STATUS_DB_REDIR_PERM,
    STATUS_DB_REDIR_TEMP,
    STATUS_FETCH_GONE,
    STATUS_FETCH_NOTMODIFIED,
    STATUS_FETCH_REDIR_PERM,
    STATUS_FETCH_REDIR_TEMP,
    STATUS_FETCH_SUCCESS,
)
from ..functions.scoring import OPIC, ScoringHooks


def index_documents(
    frontier: DataFrame,
    parse_data: DataFrame,
    linkdb: DataFrame | None = None,
    max_anchors: int = 100,
    hooks: ScoringHooks = OPIC,
    fetch_results: DataFrame | None = None,
    extended: bool = False,
    include_links: bool = False,
) -> DataFrame:
    """One index document per fetched+parsed URL.

    Document boost goes through `hooks.indexer_score` — the
    ScoringFilter.indexerScore hook point (scoring-opic: boost =
    score). The optional inputs feed the IndexingFilter plugin chain
    (operators.indexplugins): `extended` adds the db datum's metadata
    map + modified time (index-basic repr-URL, urlmeta, index-more
    date fallback), `fetch_results` adds the fetch content metadata
    (Content-Type/-Length/Last-Modified — IndexerMapReduce.java:181-197
    carries the fetch datum into the reduce for exactly this), and
    `include_links` adds outlink/inlink URL arrays (index-links).
    Defaults keep the round-1 output schema byte-identical."""
    extra_db = (
        [
            F.col("metadata").alias("db_meta"),
            F.col("modified_time").alias("db_modified_time"),
        ]
        if extended
        else []
    )
    db = frontier.filter(
        F.col("status").isin(STATUS_DB_FETCHED, STATUS_DB_NOTMODIFIED)
    ).select(
        "url",
        hooks.indexer_score(F.col("score")).alias("boost"),
        F.col("fetch_time").alias("db_fetch_time"),
        F.col("signature").alias("db_signature"),
        *extra_db,
    )
    pd_cols = ["url", "title", "text", "segment"]
    if include_links and "outlinks" in parse_data.columns:
        pd_ = parse_data.select(
            *pd_cols,
            F.transform("outlinks", lambda o: o["to_url"]).alias(
                "outlink_urls"
            ),
        )
    else:
        pd_ = parse_data.select(*pd_cols)
    doc = db.join(pd_, "url")  # no parse ⇒ no document
    if fetch_results is not None:
        doc = doc.join(
            fetch_results.select(
                "url", F.col("metadata").alias("content_meta")
            ),
            "url",
            "left",
        )
    if linkdb is not None:
        link_cols = [
            F.slice(
                F.array_sort(
                    F.array_distinct(
                        F.transform("inlinks", lambda i: i["anchor"])
                    )
                ),
                1,
                max_anchors,
            ).alias("anchors"),
        ]
        if include_links:
            link_cols.append(
                F.transform("inlinks", lambda i: i["from_url"]).alias(
                    "inlink_urls"
                )
            )
        doc = doc.join(
            linkdb.select("url", *link_cols), "url", "left"
        ).withColumn(
            "anchors",
            F.coalesce(F.col("anchors"), F.array().cast("array<string>")),
        )
    else:
        doc = doc.withColumn("anchors", F.array().cast("array<string>"))
    base_cols = [
        "url",
        "title",
        "text",
        "anchors",
        F.col("boost").cast("float").alias("boost"),
        "db_fetch_time",
        "db_signature",
        "segment",
    ]
    extra = [
        c
        for c in (
            "db_meta",
            "db_modified_time",
            "content_meta",
            "outlink_urls",
            "inlink_urls",
        )
        if c in doc.columns
    ]
    return doc.select(*base_cols, *extra)


# --- IndexerMapReduce action demux + CleaningJob ------------------------

ACTION_ADD = 0
ACTION_DELETE = 1


def index_actions(
    frontier: DataFrame,
    parse_data: DataFrame,
    fetch_results: DataFrame | None = None,
    linkdb: DataFrame | None = None,
    chain=None,
    delete_gone: bool = False,
    delete_robots_noindex: bool = False,
    skip_notmodified: bool = False,
    hooks: ScoringHooks = OPIC,
) -> DataFrame:
    """The full IndexerMapReduce reduce (IndexerMapReduce.java:171-310)
    as one DataFrame program: per URL, classify into DELETE / ADD /
    skip, then run the adds through the IndexingFilter chain.

    Decision order (exactly the reference's early returns):
      1. robots meta contains "noindex"            -> DELETE (NUTCH-1434)
      2. delete && fetch+db present && either gone -> DELETE
      3. delete && fetch or db redirect            -> DELETE
      4. no fetch / no parse                       -> skip
      5. delete && db duplicate                    -> DELETE
      6. skip && db notmodified                    -> skip
      7. fetch status != success                   -> skip
      8. otherwise                                 -> ADD (via chain)

    A fetch_notmodified datum is treated as "no fetch datum"
    (IndexerMapReduce.java:202-205). Output: `action` (0=add,
    1=delete) + the document columns (null for deletes). One wide join
    on url — frontier⋈fetch is the same host-hash co-location as every
    other cycle join, so no extra shuffle class at scale."""
    db = frontier.select(
        "url",
        F.col("status").alias("db_status"),
        F.col("score").alias("db_score"),
        F.col("fetch_time").alias("db_fetch_time"),
        F.col("signature").alias("db_signature"),
        F.col("metadata").alias("db_meta"),
        F.col("modified_time").alias("db_modified_time"),
    )
    joined = db
    if fetch_results is not None:
        fe = fetch_results.filter(
            F.col("status") != STATUS_FETCH_NOTMODIFIED
        ).select(
            "url",
            F.col("status").alias("fetch_status"),
            F.col("metadata").alias("content_meta"),
        )
        joined = joined.join(fe, "url", "left")
    else:
        joined = joined.withColumn(
            "fetch_status", F.lit(None).cast("int")
        ).withColumn(
            "content_meta", F.lit(None).cast("map<string,string>")
        )
    pd_ = parse_data.select(
        "url", "title", "text", "segment", F.lit(True).alias("has_parse")
    )
    joined = joined.join(pd_, "url", "left")

    robots = F.lower(
        F.coalesce(
            F.element_at(
                F.coalesce(
                    F.col("content_meta"),
                    F.create_map().cast("map<string,string>"),
                ),
                "robots",
            ),
            F.lit(""),
        )
    )
    del_robots = F.lit(delete_robots_noindex) & robots.contains("noindex")
    both = F.col("fetch_status").isNotNull()
    del_gone = (
        F.lit(delete_gone)
        & both
        & (
            (F.col("fetch_status") == STATUS_FETCH_GONE)
            | (F.col("db_status") == STATUS_DB_GONE)
        )
    )
    del_redir = (
        F.lit(delete_gone)
        & both
        & (
            F.col("fetch_status").isin(
                STATUS_FETCH_REDIR_PERM, STATUS_FETCH_REDIR_TEMP
            )
            | F.col("db_status").isin(
                STATUS_DB_REDIR_PERM, STATUS_DB_REDIR_TEMP
            )
        )
    )
    complete = both & F.coalesce(F.col("has_parse"), F.lit(False))
    del_dup = (
        F.lit(delete_gone)
        & complete
        & (F.col("db_status") == STATUS_DB_DUPLICATE)
    )
    skip_nm = F.lit(skip_notmodified) & (
        F.col("db_status") == STATUS_DB_NOTMODIFIED
    )
    # the reduce gates adds only on fetch success + parse presence
    # (IndexerMapReduce.java:277-281) — NOT on db status; db hygiene is
    # the delete flags' and CleaningJob's business
    addable = (
        complete
        & ~del_dup
        & ~skip_nm
        & (F.col("fetch_status") == STATUS_FETCH_SUCCESS)
    )
    action = (
        F.when(del_robots | del_gone | del_redir | del_dup, ACTION_DELETE)
        .when(addable, ACTION_ADD)
        .cast("int")
    )
    classified = joined.withColumn("action", action).filter(
        F.col("action").isNotNull()
    )

    deletes = classified.filter(F.col("action") == ACTION_DELETE).select(
        "url", "action"
    )
    adds = classified.filter(F.col("action") == ACTION_ADD).select(
        "url",
        "action",
        "title",
        "text",
        hooks.indexer_score(F.col("db_score")).cast("float").alias("boost"),
        "db_fetch_time",
        "db_signature",
        "segment",
        "db_meta",
        "db_modified_time",
        "content_meta",
    )
    if linkdb is not None:
        adds = adds.join(
            linkdb.select(
                "url",
                F.array_sort(
                    F.array_distinct(
                        F.transform("inlinks", lambda i: i["anchor"])
                    )
                ).alias("anchors"),
            ),
            "url",
            "left",
        ).withColumn(
            "anchors",
            F.coalesce(F.col("anchors"), F.array().cast("array<string>")),
        )
    else:
        adds = adds.withColumn("anchors", F.array().cast("array<string>"))
    if chain is not None:
        adds = chain(adds)
    doc_cols = [c for c in adds.columns if c not in ("url", "action")]
    for c in doc_cols:
        dt = dict(adds.dtypes)[c]
        deletes = deletes.withColumn(c, F.lit(None).cast(dt))
    return adds.unionByName(deletes)


def cleaning_job(frontier: DataFrame) -> DataFrame:
    """CleaningJob (indexer/CleaningJob.java:61-99): scan the CrawlDb
    and emit a delete for every db_gone or db_duplicate URL — the
    index-hygiene pass run between cycles. One filter inside the scan
    stage; no shuffle."""
    return frontier.filter(
        F.col("status").isin(STATUS_DB_GONE, STATUS_DB_DUPLICATE)
    ).select(
        "url",
        F.lit(ACTION_DELETE).cast("int").alias("action"),
        F.col("status").alias("db_status"),
    )
