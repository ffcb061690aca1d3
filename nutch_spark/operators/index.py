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

from ..constants import STATUS_DB_FETCHED, STATUS_DB_NOTMODIFIED
from ..functions.scoring import OPIC, ScoringHooks


def index_documents(
    frontier: DataFrame,
    parse_data: DataFrame,
    linkdb: DataFrame | None = None,
    max_anchors: int = 100,
    hooks: ScoringHooks = OPIC,
) -> DataFrame:
    """One index document per fetched+parsed URL.

    Document boost goes through `hooks.indexer_score` — the
    ScoringFilter.indexerScore hook point (scoring-opic: boost =
    score)."""
    db = frontier.filter(
        F.col("status").isin(STATUS_DB_FETCHED, STATUS_DB_NOTMODIFIED)
    ).select(
        "url",
        hooks.indexer_score(F.col("score")).alias("boost"),
        F.col("fetch_time").alias("db_fetch_time"),
        F.col("signature").alias("db_signature"),
    )
    pd_ = parse_data.select("url", "title", "text", "segment")
    doc = db.join(pd_, "url")  # no parse ⇒ no document
    if linkdb is not None:
        anchors = linkdb.select(
            "url",
            F.slice(
                F.array_sort(
                    F.array_distinct(
                        F.transform("inlinks", lambda i: i["anchor"])
                    )
                ),
                1,
                max_anchors,
            ).alias("anchors"),
        )
        doc = doc.join(anchors, "url", "left").withColumn(
            "anchors",
            F.coalesce(F.col("anchors"), F.array().cast("array<string>")),
        )
    else:
        doc = doc.withColumn("anchors", F.array().cast("array<string>"))
    return doc.select(
        "url",
        "title",
        "text",
        "anchors",
        F.col("boost").cast("float").alias("boost"),
        "db_fetch_time",
        "db_signature",
        "segment",
    )
