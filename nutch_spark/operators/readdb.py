"""ReadDb — the frontier query surface (stats / dump / topN / url).

Reference: crawl/CrawlDbReader.java — the reference's entire analytics
query surface (SURVEY.md §3.2):
  * -stats: count by status, retry histogram, score min/max/avg/total,
    fetch-time quantiles, optional per-host breakdown, with a combiner
    (CrawlDbReader.java:179-305) — Spark's partial/final hash agg gives
    the combiner for free;
  * -dump with status/retry/regex/expression predicates
    (CrawlDbDumpMapper, 527-584) — plain Catalyst filters; the JEXL
    expression becomes F.expr over the same field names;
  * -topN with min-score pre-filter (two jobs, 586-640) — a single
    orderBy(desc(score)).limit(n): Spark plans TakeOrderedAndProject
    (per-partition heap + single merge), which IS the reference's
    two-phase topN;
  * -url point lookup (readUrl, 470-479) — filter on the key; at scale
    the frontier table's sort order/min-max stats prune to one file.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..constants import STATUS_NAMES


def stats(frontier: DataFrame, by_host: bool = False) -> DataFrame:
    """Status histogram + score stats (CrawlDbReader.CrawlDbStat*)."""
    keys = ["status"] + (["host"] if by_host else [])
    out = (
        frontier.groupBy(*keys)
        .agg(
            F.count("*").alias("count"),
            F.min("score").alias("min_score"),
            F.max("score").alias("max_score"),
            F.avg("score").alias("avg_score"),
            F.min("fetch_time").alias("earliest_fetch_time"),
            F.max("fetch_time").alias("latest_fetch_time"),
            F.max("retries").alias("max_retries"),
        )
    )
    name_expr = F.create_map(
        *[x for code, name in sorted(STATUS_NAMES.items()) for x in (F.lit(code), F.lit(name))]
    )
    return out.withColumn("status_name", name_expr[F.col("status")])


def retry_histogram(frontier: DataFrame) -> DataFrame:
    return frontier.groupBy("retries").count().orderBy("retries")


def dump(
    frontier: DataFrame,
    status: int | None = None,
    min_retries: int | None = None,
    url_regex: str | None = None,
    expr: str | None = None,
) -> DataFrame:
    """Filtered dump (CrawlDbReader.java:527-584 predicates)."""
    df = frontier
    if status is not None:
        df = df.filter(F.col("status") == status)
    if min_retries is not None:
        df = df.filter(F.col("retries") >= min_retries)
    if url_regex is not None:
        df = df.filter(F.col("url").rlike(url_regex))
    if expr is not None:
        df = df.filter(F.expr(expr))  # ≙ the reference's JEXL predicate
    return df


def topn(frontier: DataFrame, n: int, min_score: float | None = None) -> DataFrame:
    """Top-N by score (CrawlDbReader.processTopNJob, two jobs → one
    TakeOrderedAndProject)."""
    df = frontier
    if min_score is not None:
        df = df.filter(F.col("score") > min_score)
    return df.orderBy(F.desc("score"), F.asc("url")).limit(n)


def read_url(frontier: DataFrame, url: str) -> DataFrame:
    return frontier.filter(F.col("url") == url)


def dump_format(frontier: DataFrame, fmt: str = "csv") -> DataFrame:
    """Dump projection in the reference's -dump formats
    (CrawlDbReader.java:109-177, 481-525): 'csv' = flat columns ready
    for df.write.csv; 'normal' = one formatted text line per URL."""
    name_expr = F.create_map(
        *[x for code, name in sorted(STATUS_NAMES.items())
          for x in (F.lit(code), F.lit(name))]
    )
    flat = frontier.select(
        "url",
        F.col("status"),
        name_expr[F.col("status")].alias("status_name"),
        F.col("fetch_time"),
        F.col("retries"),
        F.col("fetch_interval"),
        F.col("score"),
        F.col("signature"),
        F.col("modified_time"),
    )
    if fmt == "csv":
        return flat
    if fmt == "normal":
        return flat.select(
            F.concat_ws(
                "\n",
                F.concat(F.lit("URL: "), F.col("url")),
                F.concat(
                    F.lit("Status: "),
                    F.col("status").cast("string"),
                    F.lit(" ("),
                    F.col("status_name"),
                    F.lit(")"),
                ),
                F.concat(F.lit("Fetch time: "),
                         F.col("fetch_time").cast("string")),
                F.concat(F.lit("Retries since fetch: "),
                         F.col("retries").cast("string")),
                F.concat(F.lit("Retry interval: "),
                         F.col("fetch_interval").cast("string"),
                         F.lit(" seconds")),
                F.concat(F.lit("Score: "), F.col("score").cast("string")),
                F.concat(F.lit("Signature: "),
                         F.coalesce(F.col("signature"), F.lit("null"))),
            ).alias("entry")
        )
    raise ValueError(f"unknown dump format: {fmt}")


def domain_statistics(frontier: DataFrame, mode: str = "domain") -> DataFrame:
    """DomainStatistics (util/domain/DomainStatistics.java:64-151):
    counts of fetched/notmodified URLs grouped by host | domain |
    suffix | tld. One hash aggregate — combiner for free."""
    from ..constants import STATUS_DB_FETCHED, STATUS_DB_NOTMODIFIED
    from ..functions.urls import domain_col

    host = F.col("host")
    if mode == "host":
        key = host
    elif mode == "domain":
        key = domain_col(host)
    elif mode == "suffix":
        # DomainSuffix = the registered domain minus its first label
        # (example.co.uk → co.uk; example.com → com)
        parts = F.split(domain_col(host), r"\.")
        key = F.concat_ws(
            ".", F.slice(parts, 2, F.greatest(F.size(parts) - 1, F.lit(1)))
        )
    elif mode == "tld":
        key = F.element_at(F.split(host, r"\."), -1)
    else:
        raise ValueError(mode)
    return (
        frontier.filter(
            F.col("status").isin(STATUS_DB_FETCHED, STATUS_DB_NOTMODIFIED)
        )
        .groupBy(key.alias("key"))
        .agg(F.count("*").alias("n_urls"))
    )


def crawl_completion_stats(frontier: DataFrame, mode: str = "host") -> DataFrame:
    """CrawlCompletionStats (util/CrawlCompletionStats.java:79-132):
    per host|domain counts split into FETCHED (db_fetched/notmodified)
    vs UNFETCHED (everything else)."""
    from ..constants import STATUS_DB_FETCHED, STATUS_DB_NOTMODIFIED
    from ..functions.urls import domain_col

    key = F.col("host") if mode == "host" else domain_col(F.col("host"))
    state = F.when(
        F.col("status").isin(STATUS_DB_FETCHED, STATUS_DB_NOTMODIFIED),
        F.lit("FETCHED"),
    ).otherwise(F.lit("UNFETCHED"))
    return (
        frontier.groupBy(key.alias("key"), state.alias("state"))
        .agg(F.count("*").alias("n_urls"))
    )


def protocol_status_stats(fetch_results: DataFrame) -> DataFrame:
    """ProtocolStatusStatistics (util/ProtocolStatusStatistics.java):
    segment-wide counts per protocol status code."""
    return fetch_results.groupBy("protocol_status").agg(
        F.count("*").alias("n_urls")
    )


def main(argv: list[str] | None = None) -> None:
    """CLI twin of `nutch readdb` (CrawlDbReader.run,
    CrawlDbReader.java:642-684): -stats | -dump | -topN | -url over a
    SnapshotStore warehouse."""
    import argparse
    import json as _json

    from ..session import get_spark
    from ..store import SnapshotStore

    ap = argparse.ArgumentParser(description="frontier query surface")
    ap.add_argument("--warehouse", required=True)
    sub = ap.add_subparsers(dest="cmd", required=True)
    sub.add_parser("stats").add_argument("--by-host", action="store_true")
    d = sub.add_parser("dump")
    d.add_argument("--status", type=int)
    d.add_argument("--min-retries", type=int)
    d.add_argument("--regex")
    d.add_argument("--expr")
    d.add_argument("--format", default="csv", choices=["csv", "normal"])
    d.add_argument("--out")
    t = sub.add_parser("topn")
    t.add_argument("n", type=int)
    t.add_argument("--min-score", type=float)
    u = sub.add_parser("url")
    u.add_argument("url")
    args = ap.parse_args(argv)

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    fr = SnapshotStore(args.warehouse).read(spark, "frontier")
    if args.cmd == "stats":
        for row in stats(fr, by_host=getattr(args, "by_host", False)).collect():
            print(_json.dumps(row.asDict(), default=str))
    elif args.cmd == "dump":
        df = dump(fr, status=args.status, min_retries=args.min_retries,
                  url_regex=args.regex, expr=args.expr)
        out = dump_format(df, args.format)
        if args.out:
            (out.write.mode("overwrite").csv(args.out)
             if args.format == "csv"
             else out.write.mode("overwrite").text(args.out))
        else:
            for row in out.limit(100).collect():
                print(row[0] if args.format == "normal" else _json.dumps(
                    row.asDict(), default=str))
    elif args.cmd == "topn":
        for row in topn(fr, args.n, args.min_score).collect():
            print(_json.dumps(
                {"url": row.url, "score": row.score}, default=str))
    elif args.cmd == "url":
        for row in read_url(fr, args.url).collect():
            print(_json.dumps(row.asDict(), default=str))


if __name__ == "__main__":
    main()
