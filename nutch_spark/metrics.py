"""Per-partition lineage + counters (north_rule metrics requirement).

The reference reports Hadoop counters per job (e.g. FetcherStatus
counters, fetcher/Fetcher.java:281; CrawlDbFilter/Generator counters).
Here every stage can emit a metrics DataFrame of per-partition counter
rows — computed FROM the stage output itself (no accumulators, so the
numbers are exactly reproducible and survive stage retries):

  (segment, stage, partition_id, counter, value)

`partition_counts` gives the per-partition row lineage (which physical
partition produced how many rows — skew visibility); `status_counters`
gives the reference-style per-status counters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .constants import STATUS_NAMES


def partition_counts(df: DataFrame, segment: str, stage: str) -> DataFrame:
    """Row-count per physical partition — the lineage row."""
    return (
        df.withColumn("partition_id", F.spark_partition_id())
        .groupBy("partition_id")
        .count()
        .select(
            F.lit(segment).alias("segment"),
            F.lit(stage).alias("stage"),
            "partition_id",
            F.lit("rows").alias("counter"),
            F.col("count").alias("value"),
        )
    )


def status_counters(df: DataFrame, segment: str, stage: str) -> DataFrame:
    """Per-status counters (≙ FetcherStatus / CrawlDB filter counters)."""
    name_expr = F.create_map(
        *[x for code, name in sorted(STATUS_NAMES.items()) for x in (F.lit(code), F.lit(name))]
    )
    return (
        df.groupBy("status")
        .count()
        .select(
            F.lit(segment).alias("segment"),
            F.lit(stage).alias("stage"),
            F.lit(-1).alias("partition_id"),
            F.coalesce(name_expr[F.col("status")], F.col("status").cast("string")).alias(
                "counter"
            ),
            F.col("count").alias("value"),
        )
    )
