"""Event-stream rollups: time-bucketed aggregation over the events
table, batch and Structured Streaming shapes.

Batch: one hash aggregation keyed (hour, event_type) — partial/final
agg, a single shuffle. Value sums use a fixed-point bigint
(floor(value·100)) so results are order-independent and exactly
reproducible (a double sum's value depends on reduction order).

Streaming: the same aggregation as an incremental query —
`rollup_stream` wires readStream → watermark → window agg so late
events beyond the watermark are dropped deterministically; run it with
`availableNow` over the same parquet for batch-equivalent output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hourly_rollup(events: DataFrame) -> DataFrame:
    """(hour, event_type) → count, exact fixed-point value sum, id span."""
    hour = F.date_format(
        F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd HH"
    )
    cents = F.floor(F.col("value") * F.lit(100.0)).cast("long")
    return (
        events.withColumn("hour", hour)
        .withColumn("cents", cents)
        .groupBy("hour", "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("cents").alias("sum_cents"),
            F.min("event_id").alias("min_event_id"),
            F.max("event_id").alias("max_event_id"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


def rollup_stream(
    spark,
    source_dir: str,
    schema,
    watermark: str = "1 hour",
):
    """Streaming twin of `hourly_rollup` (file source, event-time
    window + watermark). Caller starts it with
    ``.writeStream.trigger(availableNow=True)`` for a batch-equivalent
    run, or a real trigger for continuous ingestion."""
    stream = (
        spark.readStream.schema(schema).parquet(source_dir)
        # watermarks require TIMESTAMP (ltz); parquet may carry NTZ
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
    )
    return (
        stream.groupBy(
            F.window("ts", "1 hour").alias("w"), F.col("event_type")
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum(
                F.floor(F.col("value") * F.lit(100.0)).cast("long")
            ).alias("sum_cents"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH").alias("hour"),
            "event_type",
            "n_events",
            "sum_cents",
        )
    )
