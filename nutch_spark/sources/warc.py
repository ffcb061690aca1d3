"""WARC / CommonCrawl export sinks.

Reference:
  * tools/warc/WARCExporter.java — one WARC/1.0 record per
    successfully fetched URL: WARC-Record-ID, Content-Length,
    WARC-Date (ISO-8601 of the fetch time), WARC-Type
    (resource/response), WARC-Target-URI, blank line, payload;
  * tools/CommonCrawlDataDumper.java — JSON dump per URL with content
    + crawl metadata fields.

This engine's content model is the span sequence, so the record
payload is the canonical JSON rendering of the spans (kind, text,
media_ref, offset — in document order): a faithful export of
everything the engine stores for a page. Two deliberate deviations,
both for determinism (north_rule reproducibility; the gate hashes
values):

  * WARC-Record-ID is ``urn:uuid`` shaped from md5(url|fetch_time)
    instead of UUID.randomUUID() (WARCExporter.java:141-143) — same
    format, reproducible across runs;
  * records are emitted as a DataFrame of (url, record) strings; the
    file sink is a plain text write (WARC files are just concatenated
    records), partitioned however the caller partitions the frame.

Scale: everything is a per-row Column program in the scan stage — no
shuffle, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..constants import STATUS_FETCH_SUCCESS

CRLF = "\r\n"
WARC_VERSION = "WARC/1.0"
_DATE_FMT = "yyyy-MM-dd'T'HH:mm:ss'Z'"


def _record_id():
    """urn:uuid formatted 8-4-4-4-12 from md5(url|fetch_time)."""
    h = F.md5(F.concat_ws("|", F.col("url"), F.col("fetch_time")))
    return F.concat(
        F.lit("<urn:uuid:"),
        F.substring(h, 1, 8), F.lit("-"),
        F.substring(h, 9, 4), F.lit("-"),
        F.substring(h, 13, 4), F.lit("-"),
        F.substring(h, 17, 4), F.lit("-"),
        F.substring(h, 21, 12),
        F.lit(">"),
    )


def _payload():
    """Span sequence as canonical JSON — the stored page content."""
    return F.to_json(F.struct(F.col("url"), F.col("spans")))


def warc_records(
    fetch_results: DataFrame, warc_type: str = "resource"
) -> DataFrame:
    """(url, content_length, warc_date, record_id, record) per
    successfully fetched page (WARCExporter.java record layout)."""
    ok = fetch_results.filter(F.col("status") == STATUS_FETCH_SUCCESS)
    payload = _payload()
    base = ok.select(
        "url",
        F.octet_length(payload).alias("content_length"),
        F.date_format(
            F.timestamp_millis(F.col("fetch_time")), _DATE_FMT
        ).alias("warc_date"),
        _record_id().alias("record_id"),
        payload.alias("payload"),
    )
    record = F.concat_ws(
        CRLF,
        F.lit(WARC_VERSION),
        F.concat(F.lit("WARC-Record-ID: "), F.col("record_id")),
        F.concat(F.lit("Content-Length: "), F.col("content_length")),
        F.concat(F.lit("WARC-Date: "), F.col("warc_date")),
        F.concat(F.lit("WARC-Target-URI: "), F.col("url")),
        F.lit(f"WARC-Type: {warc_type}"),
        F.lit(""),  # end of headers
        F.col("payload"),
        F.lit(""),
        F.lit(""),  # record separator: two empty lines
    )
    return base.withColumn("record", record)


def write_warc(fetch_results: DataFrame, path: str, partitions: int = 1) -> None:
    """Write concatenated WARC records as text files (one record per
    line-group; WARC files are plain record concatenations)."""
    warc_records(fetch_results).select("record").coalesce(
        partitions
    ).write.mode("overwrite").text(path)


def commoncrawl_dump(
    fetch_results: DataFrame, parse_data: DataFrame | None = None
) -> DataFrame:
    """CommonCrawlDataDumper-style JSON rows: one (url, json) per
    fetched page, with parse text/title merged in when available."""
    ok = fetch_results.filter(F.col("status") == STATUS_FETCH_SUCCESS)
    left = ok.select(
        "url",
        F.col("fetch_time"),
        F.col("host"),
        F.col("spans"),
        F.col("score"),
    )
    if parse_data is not None:
        pd_ = parse_data.select("url", "title", "text", "signature")
        left = left.join(pd_, "url", "left")
    else:
        left = (
            left.withColumn("title", F.lit(None).cast("string"))
            .withColumn("text", F.lit(None).cast("string"))
            .withColumn("signature", F.lit(None).cast("string"))
        )
    return left.select(
        "url",
        F.to_json(
            F.struct(
                F.col("url"),
                F.col("host"),
                F.col("fetch_time"),
                F.col("score"),
                F.col("title"),
                F.col("text"),
                F.col("signature"),
                F.col("spans"),
            )
        ).alias("json"),
    )
