"""ArcSegmentCreator — ARC archives → fetch segment, replacing fetcher.

Reference: tools/arc/ArcSegmentCreator.java (426 LoC),
ArcRecordReader.java, ArcInputFormat.java. ARC files (Internet
Archive / grub): each record is an independent gzip member; members
are concatenated to form the file (ArcRecordReader.java class doc).
Each decompressed record is a whitespace-separated header line
``URL IP date content-type length`` followed by the payload bytes.
The reference's map() consumes ``headers[0]`` (url), ``headers[2]``
(stored as ``arc.url.version`` metadata — ArcSegmentCreator.java:
300-302, 341-342) and ``headers[3]`` (content type), skips
``filedesc://`` file headers (:305-309), normalizes with the FETCHER
scope and filters the URL (:317-325, first-null-wins), then emits a
STATUS_FETCH_SUCCESS datum + content + parse entries exactly like
Fetcher.output (:144-259) with score 1.0 and the default fetch
interval (:312-313).

Spark-first shape — two stages, no driver loop:

  1. ``arc_records``: ``spark.read.format("binaryFile")`` over the
     ARC directory, then ``mapInPandas`` splitting each blob into its
     gzip members (zlib ``unused_data`` walks member boundaries — the
     same boundaries ArcRecordReader finds by magic-byte scan) and
     parsing the header line. One output row per record. Files split
     across tasks, records across Arrow batches: scales with file
     count like the reference's per-gzip-member InputFormat splits.
  2. ``arc_segment``: a pure Column program shaping records as
     fetch_results rows (the engine's segment currency — the caller
     pipes them through extract_pages/finish_pages/crawl_parse_from
     exactly like a real fetch), with the normalize→filter gate
     applied via the compiled-or-pandas ``filter_pred`` path.

Content-model mapping (deliberate, documented divergence): the
reference hands raw bytes to the parse-tika plugin zoo; this engine's
content model is the interleaved span sequence, so a text/* record
becomes one text span holding the decoded payload (outlinks flow via
the plain-text ``href:`` token form the span parser understands) and
a non-text record becomes one media span referencing its own URL
with the payload length in metadata.
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..constants import Defaults, STATUS_DB_FETCHED, STATUS_FETCH_SUCCESS
from ..functions.urls import (
    accept_urls,
    host_of,
    url_hash_col,
    with_normalized,
)

URL_VERSION_KEY = "arc.url.version"  # ArcSegmentCreator.URL_VERSION

ARC_RECORD = T.StructType(
    [
        T.StructField("arc_file", T.StringType()),
        T.StructField("url", T.StringType()),
        T.StructField("ip", T.StringType()),
        T.StructField("version", T.StringType()),
        T.StructField("content_type", T.StringType()),
        T.StructField("payload", T.BinaryType()),
    ]
)


def split_gzip_members(blob: bytes) -> Iterator[bytes]:
    """Decompress each concatenated gzip member of `blob` in turn —
    the member boundaries ArcRecordReader.java finds by scanning for
    the 0x1F8B magic, walked here via zlib's ``unused_data``."""
    rest = blob
    while rest[:2] == b"\x1f\x8b":
        d = zlib.decompressobj(wbits=16 + 15)
        try:
            out = d.decompress(rest)
        except zlib.error:
            return  # corrupt tail: stop like a reader EOF
        if not d.eof:
            return  # truncated final member: no complete record
        yield out
        rest = d.unused_data


def parse_arc_member(member: bytes, arc_file: str) -> dict | None:
    """One decompressed record → header fields + payload, per the
    reference's header consumption (split on whitespace; url, [2]
    version, [3] content type)."""
    head, sep, payload = member.partition(b"\n")
    if not sep and not head:
        return None
    try:
        headers = head.decode("utf-8", errors="replace").split()
    except Exception:
        return None
    if not headers:
        return None
    return {
        "arc_file": arc_file,
        "url": headers[0],
        "ip": headers[1] if len(headers) > 1 else None,
        "version": headers[2] if len(headers) > 2 else None,
        "content_type": headers[3] if len(headers) > 3 else None,
        "payload": payload.rstrip(b"\n"),
    }


def arc_records(spark: SparkSession, path: str) -> DataFrame:
    """ARC directory/glob → one row per archive record.

    ``filedesc://`` file-description headers are dropped here
    (ArcSegmentCreator.java:305-309)."""
    blobs = spark.read.format("binaryFile").load(path).select(
        "path", "content"
    )

    def explode_members(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in ARC_RECORD.fields]
        for pdf in batches:
            rows = []
            for p, blob in zip(pdf["path"], pdf["content"]):
                for member in split_gzip_members(bytes(blob)):
                    rec = parse_arc_member(member, p)
                    if rec is not None and not rec["url"].startswith(
                        "filedesc://"
                    ):
                        rows.append(rec)
            yield pd.DataFrame(rows, columns=cols)

    return blobs.mapInPandas(explode_members, ARC_RECORD)


def arc_segment(
    records: DataFrame,
    cur_time_ms: int,
    segment: str,
    normalizers=None,  # functions.urlplugins.ScopedNormalizers | None
    url_filters=None,  # functions.urlplugins.FilterChain | None
    fetch_interval: int = Defaults.FETCH_INTERVAL,
) -> DataFrame:
    """Shape ARC records as fetch_results rows — the replacement for
    the fetcher stage (ArcSegmentCreator.java:310-355): URL normalized
    in the FETCHER scope then filtered (dropped on rejection), datum
    status fetch_success over a db_fetched base, score 1.0, default
    interval, fetch time = now, ``arc.url.version`` + Content-Type in
    metadata. The result feeds extract_pages/finish_pages/
    crawl_parse_from like any fetch output."""
    renamed = records.withColumnRenamed("url", "_url_raw")
    normed = (
        normalizers.with_normalized(
            renamed, "_url_raw", "url", scope="fetcher"
        )
        if normalizers is not None
        else with_normalized(renamed, "_url_raw", "url")
    )
    rows = normed.drop("_url_raw").filter(
        F.col("url").isNotNull()
        & (F.col("url") != "")
        & accept_urls(F.col("url"))
    )
    if url_filters is not None:
        from ..functions.urlplugins import filter_pred  # noqa: PLC0415

        rows = rows.filter(filter_pred(url_filters, F.col("url")))

    is_text = F.coalesce(
        F.col("content_type").startswith("text/")
        | F.col("content_type").contains("html")
        | F.col("content_type").contains("xml"),
        F.lit(False),
    )
    # binary→string cast is the non-validating UTF-8 read (F.decode
    # raises on malformed bytes under ANSI mode; archives are dirty)
    text_payload = F.col("payload").cast("string")
    span = F.when(
        is_text,
        F.struct(
            F.lit("text").alias("kind"),
            text_payload.alias("text"),
            F.lit(None).cast("string").alias("media_ref"),
            F.lit(0).alias("offset"),
        ),
    ).otherwise(
        F.struct(
            F.lit("media").alias("kind"),
            F.lit(None).cast("string").alias("text"),
            F.col("url").alias("media_ref"),
            F.lit(0).alias("offset"),
        )
    )
    meta_entries = [
        (F.lit("Content-Type"), F.col("content_type")),
        (F.lit(URL_VERSION_KEY), F.col("version")),
        (F.lit("arc.file"), F.col("arc_file")),
        (
            F.lit("arc.content.length"),
            F.octet_length(F.col("payload")).cast("string"),
        ),
    ]
    metadata = F.map_filter(
        F.map_from_arrays(
            F.array(*[k for k, _ in meta_entries]),
            F.array(*[v for _, v in meta_entries]),
        ),
        lambda _k, v: v.isNotNull(),
    )
    return rows.select(
        F.col("url"),
        url_hash_col(F.col("url")).alias("url_hash"),
        host_of(F.col("url")).alias("host"),
        F.lit(STATUS_FETCH_SUCCESS).cast("int").alias("status"),
        F.lit(STATUS_DB_FETCHED).cast("int").alias("prev_status"),
        F.lit(cur_time_ms).cast("long").alias("fetch_time"),
        F.lit(0).cast("int").alias("retries"),
        F.lit(fetch_interval).cast("int").alias("fetch_interval"),
        F.lit(1.0).cast("float").alias("score"),
        F.lit(None).cast("string").alias("prev_signature"),
        F.lit(0).cast("long").alias("prev_modified_time"),
        F.lit(None).cast("string").alias("redirect_to"),
        F.lit("success").alias("protocol_status"),
        F.array(span).alias("spans"),
        metadata.alias("metadata"),
        F.lit(segment).alias("segment"),
    )


def write_arc(rows: list[tuple[str, str, str, str, bytes]], path: str) -> None:
    """Test/fixture helper: write (url, ip, date, content_type,
    payload) records as a well-formed ARC file — one gzip member per
    record, preceded by the filedesc:// file header the reference
    readers expect and skip."""
    import gzip

    def member(url, ip, date, ctype, payload: bytes) -> bytes:
        body = payload if isinstance(payload, bytes) else payload.encode()
        head = f"{url} {ip} {date} {ctype} {len(body)}\n".encode()
        return gzip.compress(head + body, mtime=0)

    blob = member(
        f"filedesc://{path.rsplit('/', 1)[-1]}", "0.0.0.0", "20260101000000",
        "text/plain", b"1 0 ArcFileDescription",
    )
    for url, ip, date, ctype, payload in rows:
        blob += member(url, ip, date, ctype, payload)
    with open(path, "wb") as fh:
        fh.write(blob)
