"""SegmentReader — the query surface over segment tables.

Reference: segment/SegmentReader.java, three modes:
  * ``-list`` → per-segment stats row: NAME, GENERATED (fetchlist
    entries), FETCHER START/END (min/max fetch time), FETCHED, PARSED
    (SegmentReader.list:~300-360, getStats);
  * ``-dump`` → a text dump of every record across the segment's parts
    (crawl_generate / crawl_fetch / parse_data / parse_text /
    crawl_parse), "Recno:: / URL:: / part payload" per record;
  * ``-get <url>`` → the same dump restricted to one URL.

Spark shape: stats is one groupBy(segment) per part table + a
full-outer join on segment (tiny — one row per segment). Dump/get emit
one (segment, part, url, payload-json) row per record; `get` pushes
the URL equality predicate into every part scan (parquet row-group
pruning at scale), never a full-segment materialization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _agg(df: DataFrame | None, **aggs) -> DataFrame | None:
    if df is None:
        return None
    return df.groupBy("segment").agg(
        *[expr.alias(name) for name, expr in aggs.items()]
    )


def segment_stats(
    fetchlist: DataFrame | None = None,
    fetch_results: DataFrame | None = None,
    parse_data: DataFrame | None = None,
) -> DataFrame:
    """Per-segment stats (SegmentReader -list). Missing parts report -1
    (the reference prints '?')."""
    gen = _agg(fetchlist, generated=F.count("*"))
    fet = _agg(
        fetch_results,
        fetched=F.count("*"),
        fetch_start=F.min("fetch_time"),
        fetch_end=F.max("fetch_time"),
    )
    par = _agg(parse_data, parsed=F.count("*"))
    out = None
    for part in (gen, fet, par):
        if part is None:
            continue
        out = part if out is None else out.join(part, "segment", "full_outer")
    if out is None:
        raise ValueError("segment_stats needs at least one part table")
    fill = {
        "generated": -1,
        "fetched": -1,
        "fetch_start": -1,
        "fetch_end": -1,
        "parsed": -1,
    }
    for name, default in fill.items():
        if name not in out.columns:
            out = out.withColumn(name, F.lit(default))
    return out.select(
        "segment",
        *[
            F.coalesce(F.col(n).cast("long"), F.lit(d)).alias(n)
            for n, d in fill.items()
        ],
    )


_PARTS = ("crawl_generate", "crawl_fetch", "parse_data", "crawl_parse")


def segment_dump(
    fetchlist: DataFrame | None = None,
    fetch_results: DataFrame | None = None,
    parse_data: DataFrame | None = None,
    crawl_parse: DataFrame | None = None,
    url: str | None = None,
) -> DataFrame:
    """One row per segment record: (segment, part, url, payload) with
    the record rendered as canonical JSON (SegmentReader -dump; with
    `url`, -get <url>). The part name matches the reference's segment
    subdirectory."""
    parts = {
        "crawl_generate": fetchlist,
        "crawl_fetch": fetch_results,
        "parse_data": parse_data,
        "crawl_parse": crawl_parse,
    }
    out = None
    for name, df in parts.items():
        if df is None:
            continue
        if url is not None:
            df = df.filter(F.col("url") == url)
        seg_col = (
            F.col("segment") if "segment" in df.columns else F.lit("?")
        )
        payload_cols = [
            c for c in df.columns if c not in ("url", "segment", "spans")
        ]
        piece = df.select(
            seg_col.alias("segment"),
            F.lit(name).alias("part"),
            "url",
            F.to_json(F.struct(*[F.col(c) for c in payload_cols])).alias(
                "payload"
            ),
        )
        out = piece if out is None else out.unionByName(piece)
    if out is None:
        raise ValueError("segment_dump needs at least one part table")
    return out


def segment_get(url: str, **tables) -> DataFrame:
    """All segment records for one URL (SegmentReader -get)."""
    return segment_dump(url=url, **tables)


def main(argv: list[str] | None = None) -> None:
    """CLI twin of `nutch readseg` (SegmentReader.main,
    segment/SegmentReader.java): list | dump | get over a SnapshotStore
    warehouse's segment tables."""
    import argparse
    import json as _json

    from ..session import get_spark
    from ..store import SnapshotStore

    ap = argparse.ArgumentParser(description="segment query surface")
    ap.add_argument("--warehouse", required=True)
    sub = ap.add_subparsers(dest="cmd", required=True)
    sub.add_parser("list")
    d = sub.add_parser("dump")
    d.add_argument("--out")
    g = sub.add_parser("get")
    g.add_argument("url")
    args = ap.parse_args(argv)

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    store = SnapshotStore(args.warehouse)

    def _read(table: str):
        try:
            return store.read(spark, table)
        except FileNotFoundError:
            return None

    tables = dict(
        fetchlist=_read("fetchlist"),
        fetch_results=_read("fetch_results"),
        parse_data=_read("parse_data"),
        crawl_parse=_read("crawl_parse"),
    )
    if args.cmd == "list":
        out = segment_stats(
            tables["fetchlist"], tables["fetch_results"], tables["parse_data"]
        )
        for row in out.orderBy("segment").collect():
            print(_json.dumps(row.asDict(), default=str))
    elif args.cmd == "dump":
        out = segment_dump(**tables)
        if args.out:
            out.write.mode("overwrite").json(args.out)
        else:
            for row in out.limit(100).collect():
                print(_json.dumps(row.asDict(), default=str))
    elif args.cmd == "get":
        for row in segment_get(args.url, **tables).collect():
            print(_json.dumps(row.asDict(), default=str))


if __name__ == "__main__":
    main()


def segment_check(
    segment: str,
    fetchlist: DataFrame | None = None,
    fetch_results: DataFrame | None = None,
    parse_text: DataFrame | None = None,
    parse_data: DataFrame | None = None,
    crawl_parse: DataFrame | None = None,
) -> dict:
    """SegmentChecker (segment/SegmentChecker.java:44-140): verify a
    segment's parts exist and are non-empty, and classify it —
    `parsed` (isParsed: parse output present) and `indexable`
    (isIndexable: fetch + parse output present). Parts are the global
    cycle tables filtered on the segment column; presence = at least
    one row (a limit-1 probe per part, pushdown-friendly)."""

    def present(df: DataFrame | None) -> bool:
        if df is None:
            return False
        return bool(
            df.filter(F.col("segment") == segment).limit(1).take(1)
        )

    parts = {
        "fetchlist": present(fetchlist),
        "fetch_results": present(fetch_results),
        "parse_text": present(parse_text),
        "parse_data": present(parse_data),
        "crawl_parse": present(crawl_parse),
    }
    parts["parsed"] = parts["parse_data"] and parts["crawl_parse"]
    parts["indexable"] = parts["fetch_results"] and parts["parsed"]
    return parts
