"""Dedup — mark duplicate-content URLs in the frontier.

Reference semantics (crawl/DeduplicationJob.java:92-268), re-expressed
as one window program instead of two MR jobs:

  * only rows with status ∈ {db_fetched, db_notmodified} and a
    non-null signature compete (DeduplicationJob.java:110-120);
  * group key = signature, optionally + host or registered domain
    (group modes none|host|domain, DeduplicationJob.java:124-127);
  * the winner per group is chosen by a configurable comparison order
    over (score desc, fetchTime desc, urlLength asc) — default
    compare order "score,fetchTime,urlLength"
    (DedupReducer.java:152-223); ties broken by url for determinism;
  * losers get status db_duplicate; the status write-back join keeps
    every other column (StatusUpdateReducer, 232-268).

Scale: a single window over signature groups — one shuffle on the
group key. Signature groups are tiny (dup clusters), so no skew risk;
the write-back is a projection, not a second join, because the window
runs over the full frontier (duplicate rows are rare, the window cost
is dominated by the one exchange — same as Nutch's one shuffle).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..constants import (
    STATUS_DB_DUPLICATE,
    STATUS_DB_FETCHED,
    STATUS_DB_NOTMODIFIED,
)
from ..functions.urls import domain_col


def _order_cols(compare_order: str) -> list[Column]:
    cols: list[Column] = []
    for key in compare_order.split(","):
        key = key.strip()
        if key == "score":
            cols.append(F.desc("score"))
        elif key == "fetchTime":
            cols.append(F.desc("fetch_time"))
        elif key == "urlLength":
            cols.append(F.asc(F.length("url")))
        else:
            raise ValueError(f"unknown compare key: {key}")
    cols.append(F.asc("url"))  # deterministic final tiebreak
    return cols


def dedup(
    frontier: DataFrame,
    group_mode: str = "none",  # none | host | domain
    compare_order: str = "score,fetchTime,urlLength",
) -> DataFrame:
    """Return the frontier with duplicate losers marked db_duplicate."""
    eligible = (
        F.col("status").isin(STATUS_DB_FETCHED, STATUS_DB_NOTMODIFIED)
        & F.col("signature").isNotNull()
    )
    if group_mode == "host":
        gkey = F.concat_ws("|", F.col("signature"), F.col("host"))
    elif group_mode == "domain":
        gkey = F.concat_ws("|", F.col("signature"), domain_col(F.col("host")))
    else:
        gkey = F.col("signature")

    # non-eligible rows get a unique group (their url) so the window
    # never ranks them against real groups
    key = F.when(eligible, gkey).otherwise(F.concat(F.lit("\0u:"), F.col("url")))
    w = Window.partitionBy(key).orderBy(*_order_cols(compare_order))
    r = F.row_number().over(w)
    new_status = F.when(eligible & (r > 1), F.lit(STATUS_DB_DUPLICATE)).otherwise(
        F.col("status")
    )
    return frontier.withColumn("status", new_status)
