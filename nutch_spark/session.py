"""SparkSession factory tuned for the crawl engine.

Local mode here; on a real cluster the same builder flags apply and the
entry point is ``spark-submit --py-files nutch_spark.zip`` (north_rule).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    app_name: str = "nutch-spark",
    executors: int | None = None,
    executor_mem_mb: int | None = None,
) -> SparkSession:
    """local[cores] session, or — with `executors` — a
    local-cluster[executors, cores, mem] session: real executor JVMs,
    the shape the N→4N scaling evidence runs on (and much kinder to GC
    than one giant 32-thread heap). `cores` is per-executor there."""
    cores = cores or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    executor_mem_mb = executor_mem_mb or int(
        os.environ.get("NUTCH_EXECUTOR_MEM_MB", "4096")
    )
    if executors:
        master = f"local-cluster[{executors},{cores},{executor_mem_mb}]"
        # 3 tasks per core, not 1: a single wave (partitions == cores)
        # is straggler-bound — one slow/skewed partition idles every
        # other core, and AQE can only coalesce, never re-split a
        # too-coarse non-skewed shuffle. Measured on the 4x2 steady
        # cycle: updatedb 27.6 s → 21-25 s, fetch 30.7 s → ~23 s.
        shuffle_partitions = shuffle_partitions or max(3 * executors * cores, 8)
    else:
        master = f"local[{cores}]"
        shuffle_partitions = shuffle_partitions or max(cores, 8)
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        # AQE: runtime coalescing + skew-join splitting (north_rule skew req)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # politeness scheduler must not double-fetch (Fetcher.java:483)
        .config("spark.speculation", "false")
        # deterministic oracle comparison (duckdb is UTC-naive)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    # Scratch space for shuffle/spill files. On a real cluster every
    # node brings its own disks (or a disaggregated shuffle service
    # scaled with the node count); in this sandbox ALL executor JVMs
    # share one virtio disk with exhaustible burst credits, so disk
    # scratch anti-scales with executor count. The bench points this
    # at tmpfs to keep that artifact out of the scaling measurement.
    local_dir = os.environ.get("NUTCH_SPARK_LOCAL_DIR")
    if local_dir:
        builder = builder.config("spark.local.dir", local_dir)
    if executors:
        repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        builder = (
            builder.config("spark.executor.memory", f"{executor_mem_mb}m")
            # ≙ spark-submit --py-files nutch_spark.zip (north_rule):
            # executor python workers must resolve this package
            .config("spark.executorEnv.PYTHONPATH", repo_root)
            # Heap sizing: -Xms=-Xmx and -XX:+AlwaysPreTouch were both
            # TRIED AND REJECTED (interleaved A/B, BASELINE.md) — on
            # this slow-page-fault host the total faulted footprint is
            # what hurts, so pre-committing the full heap was
            # consistently worse. Executors run Spark's default heap
            # flags deliberately.
        )
    return builder.getOrCreate()
