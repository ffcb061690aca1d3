"""Fetch schedules as Catalyst column expressions.

Pure scalar state-transition functions from the reference, re-expressed
as when/otherwise column programs so the updatedb stage stays fully
JVM-side (whole-stage codegen — no Python in the hot path):

  * shouldFetch / clamp      — AbstractFetchSchedule.java:183-197
  * setFetchSchedule Default — DefaultFetchSchedule.java:33-45
  * setFetchSchedule Adaptive— AdaptiveFetchSchedule.java:96-144
  * setPageGoneSchedule      — AbstractFetchSchedule.java:107-117
  * setPageRetrySchedule     — AbstractFetchSchedule.java:144-149
  * forceRefetch             — AbstractFetchSchedule.java:214-225

Each helper returns a dict of named Columns {fetch_interval, fetch_time,
modified_time, retries} that the caller merges into its select.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..constants import Defaults, META_FIXED_INTERVAL_KEY

STATE_MODIFIED = "modified"
STATE_NOTMODIFIED = "notmodified"
STATE_UNKNOWN = "unknown"

SECONDS_PER_DAY = 86_400


def should_fetch(fetch_time: Column, fetch_interval: Column, cur_time_ms: int,
                 max_interval: int = Defaults.FETCH_INTERVAL_MAX) -> Column:
    """Due-for-fetch predicate with the too-remote clamp.

    The clamp branch (fetchTime − curTime > maxInterval·1000 ⇒ due now)
    is folded into the predicate; the interval adjustment happens in
    `clamped_interval` for rows selected via this branch.
    """
    too_remote = (fetch_time - F.lit(cur_time_ms)) > F.lit(int(max_interval) * 1000)
    return too_remote | (fetch_time <= F.lit(cur_time_ms))


def clamped_interval(fetch_time: Column, fetch_interval: Column, cur_time_ms: int,
                     max_interval: int = Defaults.FETCH_INTERVAL_MAX) -> Column:
    too_remote = (fetch_time - F.lit(cur_time_ms)) > F.lit(int(max_interval) * 1000)
    return F.when(
        too_remote & (fetch_interval > F.lit(max_interval)),
        (F.lit(max_interval) * 0.9).cast("int"),
    ).otherwise(fetch_interval)


def set_fetch_schedule_default(
    fetch_interval: Column,
    fetch_time_ms: Column,
    modified_time_ms: Column,
) -> dict[str, Column]:
    interval = F.when(fetch_interval == 0, F.lit(Defaults.FETCH_INTERVAL)).otherwise(
        fetch_interval
    )
    return {
        "fetch_interval": interval.cast("int"),
        "fetch_time": (fetch_time_ms + interval.cast("long") * 1000).cast("long"),
        "modified_time": modified_time_ms.cast("long"),
        "retries": F.lit(0),
    }


def set_fetch_schedule_adaptive(
    fetch_interval: Column,
    fetch_time_ms: Column,
    modified_time_ms: Column,
    state: Column,
    metadata: Column,
    inc_rate: float = Defaults.ADAPTIVE_INC_RATE,
    dec_rate: float = Defaults.ADAPTIVE_DEC_RATE,
    min_interval: float = Defaults.ADAPTIVE_MIN_INTERVAL,
    max_interval: float = Defaults.ADAPTIVE_MAX_INTERVAL,
    sync_delta: bool = Defaults.ADAPTIVE_SYNC_DELTA,
    sync_delta_rate: float = Defaults.ADAPTIVE_SYNC_DELTA_RATE,
) -> dict[str, Column]:
    # All arithmetic in DOUBLE with floor(x+0.5) for Math.round and
    # explicit floor for narrowing — the exact op sequence is portable
    # SQL (DuckDB `round` is half-even and bigint casts round, so this
    # discipline is what lets updatedb_adaptive carry a full value-hash
    # oracle instead of rows-only).
    interval0 = (
        F.when(fetch_interval == 0, F.lit(Defaults.FETCH_INTERVAL))
        .otherwise(fetch_interval)
        .cast("double")
    )
    fixed = F.element_at(
        F.coalesce(metadata, F.create_map().cast("map<string,string>")),
        META_FIXED_INTERVAL_KEY,
    ).cast("double")

    # inc/dec may be python floats or per-row Columns (MimeAdaptive);
    # 1.0±rate computes the identical double either way
    inc_c = inc_rate if isinstance(inc_rate, Column) else F.lit(float(inc_rate))
    dec_c = dec_rate if isinstance(dec_rate, Column) else F.lit(float(dec_rate))
    mod_time = F.when(modified_time_ms <= 0, fetch_time_ms).otherwise(modified_time_ms)
    interval1 = (
        F.when(state == STATE_MODIFIED, interval0 * (F.lit(1.0) - dec_c))
        .when(state == STATE_NOTMODIFIED, interval0 * (F.lit(1.0) + inc_c))
        .otherwise(interval0)
    )
    if sync_delta:
        # Java: (fetchTime - modifiedTime) / 1000L — integer floor div
        delta = F.floor((fetch_time_ms - mod_time) / F.lit(1000.0)).cast("long")
        interval2 = F.when(delta > interval1, delta.cast("double")).otherwise(interval1)
        ref_time = fetch_time_ms - F.floor(
            delta * F.lit(float(sync_delta_rate)) * F.lit(1000.0) + F.lit(0.5)
        ).cast("long")
    else:
        interval2 = interval1
        ref_time = fetch_time_ms
    interval3 = F.greatest(
        F.lit(float(min_interval)), F.least(F.lit(float(max_interval)), interval2)
    )

    final_interval = F.when(fixed.isNotNull(), fixed).otherwise(interval3)
    final_ref = F.when(fixed.isNotNull(), fetch_time_ms).otherwise(ref_time)
    final_mod = F.when(fixed.isNotNull(), modified_time_ms).otherwise(mod_time)
    return {
        "fetch_interval": F.floor(final_interval).cast("int"),
        "fetch_time": (
            final_ref
            + F.floor(final_interval * F.lit(1000.0) + F.lit(0.5)).cast("long")
        ).cast("long"),
        "modified_time": final_mod.cast("long"),
        "retries": F.lit(0),
    }


META_CONTENT_TYPE_KEY = "Content-Type"  # HttpHeaders.WRITABLE_CONTENT_TYPE

# conf/adaptive-mimetypes.txt defaults: mime → (inc_rate, dec_rate)
DEFAULT_MIME_RATES: dict[str, tuple[float, float]] = {
    "text/html": (0.2, 0.2),
    "application/xhtml+xml": (0.2, 0.2),
    "application/pdf": (0.1, 0.4),
}


def parse_mime_rates(text: str) -> dict[str, tuple[float, float]]:
    """db.fetch.schedule.mime.file lines: `mime\\tinc\\tdec`
    (MimeAdaptiveFetchSchedule.readMimeFile)."""
    out: dict[str, tuple[float, float]] = {}
    for line in text.splitlines():
        if not line.strip() or line.startswith("#"):
            continue
        parts = line.split("\t")
        if len(parts) == 3:
            out[parts[0].lower()] = (float(parts[1]), float(parts[2]))
    return out


def set_fetch_schedule_mime_adaptive(
    fetch_interval: Column,
    fetch_time_ms: Column,
    modified_time_ms: Column,
    state: Column,
    metadata: Column,
    mime_rates: dict[str, tuple[float, float]] | None = None,
    default_inc: float = Defaults.ADAPTIVE_INC_RATE,
    default_dec: float = Defaults.ADAPTIVE_DEC_RATE,
    **adaptive_kwargs,
) -> dict[str, Column]:
    """AdaptiveFetchSchedule with per-MIME inc/dec rates
    (MimeAdaptiveFetchSchedule.java:30-235): the datum's Content-Type
    metadata picks the rate pair; unknown/absent MIME falls back to the
    adaptive defaults. The rate table becomes one CASE expression over
    the cleaned MIME (lowercased, parameters stripped — MimeUtil
    .cleanMimeType), so the whole schedule stays a codegen'd column
    program — no per-row lookup."""
    rates = DEFAULT_MIME_RATES if mime_rates is None else mime_rates
    raw_ct = F.element_at(
        F.coalesce(metadata, F.create_map().cast("map<string,string>")),
        META_CONTENT_TYPE_KEY,
    )
    cleaned = F.lower(F.trim(F.substring_index(raw_ct, ";", 1)))
    inc_col: Column = F.lit(float(default_inc))
    dec_col: Column = F.lit(float(default_dec))
    for mime, (inc, dec) in sorted(rates.items()):
        inc_col = F.when(cleaned == mime, F.lit(float(inc))).otherwise(inc_col)
        dec_col = F.when(cleaned == mime, F.lit(float(dec))).otherwise(dec_col)
    return set_fetch_schedule_adaptive(
        fetch_interval,
        fetch_time_ms,
        modified_time_ms,
        state,
        metadata,
        inc_rate=inc_col,
        dec_rate=dec_col,
        **adaptive_kwargs,
    )


def set_page_gone_schedule(
    fetch_interval: Column,
    fetch_time_ms: Column,
    max_interval: int = Defaults.FETCH_INTERVAL_MAX,
) -> dict[str, Column]:
    grown = F.when(
        fetch_interval.cast("float") * 1.5 < F.lit(float(max_interval)),
        fetch_interval.cast("float") * 1.5,
    ).otherwise(F.lit(max_interval * 0.9))
    return {
        "fetch_interval": grown.cast("int"),
        "fetch_time": (fetch_time_ms + grown.cast("long") * 1000).cast("long"),
    }


def set_page_retry_schedule(
    retries: Column, fetch_time_ms: Column
) -> dict[str, Column]:
    return {
        "fetch_time": (fetch_time_ms + F.lit(SECONDS_PER_DAY * 1000)).cast("long"),
        "retries": (retries + 1).cast("int"),
    }


def force_refetch_interval(
    fetch_interval: Column, max_interval: int = Defaults.FETCH_INTERVAL_MAX
) -> Column:
    return (
        F.when(fetch_interval > F.lit(max_interval), F.lit(max_interval * 0.9))
        .otherwise(fetch_interval)
        .cast("int")
    )
