"""Continuous frontier maintenance — Structured Streaming ingestion of
fetch results into the snapshot-store frontier.

The reference's crawl is strictly batch (segment directories per
cycle); a Spark-native engine can instead run the updatedb merge
CONTINUOUSLY: fetch/parse results land as parquet files in an incoming
directory (e.g. written by a separate fetch fleet, a Kafka sink, or
another cluster), and a Structured Streaming query folds every
micro-batch into the frontier through the exact same updatedb state
machine, committing each merge as an atomic snapshot. Checkpointing
makes the ingestion exactly-once across restarts: a replayed batch
re-runs the same deterministic merge against the same parent snapshot
lineage (the store keeps per-batch snapshots, so recovery is rollback +
replay, mirroring the batch driver's stage manifest).

At 10^10-URL scale the shape is identical — `availableNow` drains a
backlog with bounded batches; a continuous trigger keeps the frontier
within one micro-batch of the fetch fleet.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import functions as F

from .operators.parse import crawl_parse_from, parse_pages
from .operators.updatedb import updatedb
from .schema import FETCH_RESULTS
from .store import SnapshotStore


def stream_updatedb(
    spark,
    store: SnapshotStore,
    incoming_dir: str,
    checkpoint_dir: str,
    clock: Callable[[object], int] | None = None,
    max_files_per_trigger: int | None = None,
    available_now: bool = True,
    schedule: str = "default",
    seen_filter=None,
    parse_cp: Callable[[object], object] | None = None,
):
    """Start the streaming merge: parquet files of FETCH_RESULTS rows
    appearing under `incoming_dir` are parsed and folded into the
    `frontier` table per micro-batch. Returns the StreamingQuery.

    `clock(batch_df) -> cur_time_ms` derives the merge clock from the
    batch (default: max fetch_time in the batch) so the result is a
    pure function of the data — replays after a crash produce the same
    frontier, which is what makes foreachBatch + snapshot commits
    exactly-once here.

    `parse_cp(batch_df) -> crawl_parse DataFrame` overrides the default
    parse stage (parse_pages → crawl_parse_from) — the streaming twin
    of the batch driver's configurable parse surface, for fleets that
    land pre-extracted datums alongside (or instead of) raw span
    content. It must be deterministic in the batch for the replay
    guarantee to hold.

    `seen_filter` (operators.seen SeenFilter | CuckooSeenFilter) prunes
    each micro-batch's frontier join exactly like the batch crawl loop:
    definitely-new outlink datums take the frontier-free reduce, and
    the seen table learns the batch's new keys — built from the current
    frontier on first use, then maintained incrementally per batch
    (same filter ⊇ frontier invariant, same row-identical result).
    """

    def _clock(batch_df) -> int:
        if clock is not None:
            return clock(batch_df)
        row = batch_df.agg(F.max("fetch_time").alias("m")).collect()[0]
        return int(row.m or 0)

    def _merge(batch_df, batch_id: int) -> None:
        if not batch_df.take(1):
            return
        now = _clock(batch_df)
        # cut lineage: the batch is consumed by parse + updatedb twice
        batch_df = batch_df.localCheckpoint()
        if parse_cp is not None:
            cp = parse_cp(batch_df)
        else:
            pd_ = parse_pages(batch_df).localCheckpoint()
            cp = crawl_parse_from(pd_, batch_df)
        fr = (
            store.read(spark, "frontier")
            if store.exists("frontier")
            else None
        )
        if seen_filter is None or fr is None:
            merged = updatedb(spark, fr, batch_df, cp, now,
                              schedule=schedule)
            seen_next = None
        else:
            from .operators.updatedb import updatedb_seen_split

            if not store.exists("seen"):
                store.write(seen_filter.build(fr), "seen")
            merged, seen_next = updatedb_seen_split(
                spark, fr, batch_df, cp, now,
                seen_filter, store.read(spark, "seen"),
                schedule=schedule,
            )
        store.write(merged, "frontier")
        if seen_next is not None:
            store.write(seen_next, "seen")
        store.mark_stage(f"stream{batch_id:08d}", "updatedb", rows=None)

    reader = spark.readStream.schema(FETCH_RESULTS)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(incoming_dir)
    writer = (
        stream.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
