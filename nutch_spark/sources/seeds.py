"""Seed-list text source — the reference's inject input format.

Reference: Injector.InjectMapper.map (crawl/Injector.java:183-218)
reads one URL per line with optional tab-separated ``key=value``
metadata; ``#`` comment lines and blank lines are skipped; reserved
keys ``nutch.score`` / ``nutch.fetchInterval`` /
``nutch.fetchInterval.fixed`` (Injector.java:87-98) are consumed by
the inject merge (operators/inject.prepare_seeds).

Pure Catalyst: spark.read.text → split/transform — the k=v map is
built with JVM array functions, no python."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_seed_text(spark: SparkSession, path: str) -> DataFrame:
    """path (text file/dir) → seeds DataFrame (url, metadata)."""
    lines = spark.read.text(path).select(
        F.trim(F.col("value")).alias("line")
    )
    rows = lines.filter(
        (F.col("line") != "") & ~F.col("line").startswith("#")
    )
    parts = F.split(F.col("line"), "\t")
    kvs = F.filter(
        F.slice(parts, 2, 1_000_000), lambda p: p.contains("=")
    )
    metadata = F.map_from_entries(
        F.transform(
            kvs,
            lambda p: F.struct(
                F.substring_index(p, "=", 1).alias("key"),
                F.substring_index(p, "=", -1).alias("value"),
            ),
        )
    )
    return rows.select(
        F.element_at(parts, 1).alias("url"),
        metadata.alias("metadata"),
    )
