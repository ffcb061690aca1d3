"""Debug checker tools — the reference's one-URL inspection CLIs.

Reference: parse/ParserChecker.java (fetch one URL with optional
injected metadata, follow redirects up to http.redirect.max, parse,
print status/signature/title/outlinks/parse metadata and optionally
the text) and indexer/IndexingFiltersChecker.java (same fetch+parse,
then run the IndexingFilter chain and print the NutchDocument fields;
its TCP listen mode is a thin wrapper over the same single-URL check —
the REST server in server.py is this engine's service surface).

These are driver-side debugging helpers by design: they build a
ONE-ROW fetchlist and run it through the REAL operators (fetch's
politeness scheduler, parse_pages, the parse-filter chain,
index_documents), so what they print is exactly what the crawl
pipeline computes for that URL.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from .constants import Defaults, STATUS_DB_FETCHED
from .functions.urls import host_of, url_hash_col, with_normalized
from .operators.fetch import fetch
from .operators.parse import crawl_parse_from, parse_pages
from .synth import WebConfig


def _one_row_fetchlist(spark: SparkSession, url: str, metadata: dict | None):
    df = spark.createDataFrame(
        [(url, metadata or {})], "url string, metadata map<string,string>"
    )
    df = with_normalized(df, "url", "_norm")
    return df.select(
        F.col("_norm").alias("url"),
        url_hash_col(F.col("_norm")).alias("url_hash"),
        host_of(F.col("_norm")).alias("host"),
        F.lit(1).alias("status"),
        F.lit(0).cast("long").alias("fetch_time"),
        F.lit(0).alias("retries"),
        F.lit(Defaults.FETCH_INTERVAL).alias("fetch_interval"),
        F.lit(1.0).cast("float").alias("score"),
        F.lit(None).cast("string").alias("signature"),
        F.lit(0).cast("long").alias("modified_time"),
        F.col("metadata"),
        F.lit("check").alias("segment"),
    )


def check_parse(
    spark: SparkSession,
    web: WebConfig,
    url: str,
    metadata: dict | None = None,
    robots: dict | None = None,
    redirect_max: int = 0,
    cur_time_ms: int = 0,
    dump_text: bool = False,
    normalizers=None,
    url_filters=None,
    parse_filters=None,
) -> dict:
    """ParserChecker: fetch + parse ONE url; returns the checker report
    (status, signature, title, outlinks, parse metadata, optionally the
    text). `metadata` ≙ the -md flags (injected datum metadata);
    `redirect_max` ≙ http.redirect.max."""
    fl = _one_row_fetchlist(spark, url, metadata)
    res = fetch(
        fl, robots or {}, web, cur_time_ms, redirect_max=redirect_max,
        num_partitions=1,
    )
    fres = res.collect()
    if not fres:
        return {"ok": False, "status": None, "reason": "dropped"}
    r = fres[0]
    out: dict = {
        "ok": r["protocol_status"] == "success",
        "url": r["url"],
        "fetch_status": int(r["status"]),
        "protocol_status": r["protocol_status"],
        "redirect_to": r["redirect_to"],
        "content_metadata": dict(r["metadata"] or {}),
    }
    if not out["ok"]:
        return out
    pd_ = parse_pages(
        res, normalizers=normalizers, url_filters=url_filters,
        parse_filters=parse_filters,
    )
    rows = pd_.filter(F.col("is_canonical")).collect()
    if not rows:
        out["ok"] = False
        out["reason"] = "no parse"
        return out
    p = rows[0]
    out.update(
        signature=p["signature"],
        title=p["title"],
        outlinks=[o["to_url"] for o in (p["outlinks"] or [])],
        parse_meta=dict(p["parse_meta"] or {})
        if "parse_meta" in pd_.columns
        else {},
    )
    if dump_text:
        out["text"] = p["text"]
    # the crawl_parse datums this page would emit (linked/signature)
    cp = crawl_parse_from(pd_, res, normalizers=normalizers)
    out["crawl_parse"] = [
        {"url": c["url"], "status": int(c["status"]),
         "score": float(c["score"])}
        for c in cp.collect()
    ]
    return out


def check_index(
    spark: SparkSession,
    web: WebConfig,
    url: str,
    metadata: dict | None = None,
    robots: dict | None = None,
    redirect_max: int = 0,
    chain=None,
    normalizers=None,
    url_filters=None,
    parse_filters=None,
) -> dict:
    """IndexingFiltersChecker: fetch + parse one url, then run the
    indexing join + IndexingFilter chain; returns the checker report
    with the would-be index document's fields."""
    from .operators.index import index_documents

    report = check_parse(
        spark, web, url, metadata, robots, redirect_max,
        normalizers=normalizers, url_filters=url_filters,
        parse_filters=parse_filters, dump_text=True,
    )
    if not report["ok"]:
        return report
    fl = _one_row_fetchlist(spark, url, metadata)
    res = fetch(
        fl, robots or {}, web, 0, redirect_max=redirect_max,
        num_partitions=1,
    )
    pd_ = parse_pages(
        res, normalizers=normalizers, url_filters=url_filters,
        parse_filters=parse_filters,
    )
    frontier = fl.drop("segment").withColumn(
        "status", F.lit(STATUS_DB_FETCHED)
    )
    docs = index_documents(
        frontier, pd_, fetch_results=res, extended=True,
        include_links=True,
    )
    if chain is not None:  # IndexingFilterChain, like index_actions
        docs = chain(docs)
    rows = docs.collect()
    if not rows:
        report["ok"] = False
        report["reason"] = "not indexable"
        return report
    report["doc"] = rows[0].asDict(recursive=True)
    return report


def check_robots(
    spark: SparkSession,
    robots_txt: str,
    urls,  # DataFrame with a `url` column, or list[str]
    agent: str = "nutch",
    http_code: int = 200,
    whitelist: tuple[str, ...] = (),
) -> "DataFrame":
    """RobotRulesParser's check tool (protocol/RobotRulesParser.java:
    216-316): parse one robots.txt under `agent`, test every URL, and
    report ``whitelisted`` / ``allowed`` / ``not allowed`` per URL —
    whitelisted hosts (http.robots.whitelist) bypass the rules, exactly
    the isWhiteListed branch. Malformed/unparseable URLs are dropped
    like the reference's MalformedURLException continue.

    Distributed: the parsed rule set is tiny and rides the closure; the
    verdict is an Arrow-batched map over the URL frame (same
    `robots_allows` longest-match the fetch scheduler runs)."""
    import pandas as pd  # noqa: PLC0415

    from pyspark.sql import DataFrame, types as T  # noqa: PLC0415

    from .functions.robots import parse_robots_txt, robots_allows

    if not isinstance(urls, DataFrame):
        urls = spark.createDataFrame([(u,) for u in urls], "url string")
    rules = parse_robots_txt(robots_txt, agent=agent, http_code=http_code)
    white = {w.strip().lower() for w in whitelist if w.strip()}

    # no pd.Series annotations: pandas is function-local here and the
    # stringified hints (PEP 563) would not resolve at decoration time
    def _status_fn(s):
        out = []
        for u in s:
            if u is None or "://" not in u:
                out.append(None)  # malformed: dropped below
                continue
            hostpart = u.partition("://")[2].partition("/")[0]
            host = hostpart.rpartition("@")[2].partition(":")[0].lower()
            if host in white:
                out.append("whitelisted")
                continue
            path = "/" + u.partition("://")[2].partition("/")[2]
            out.append(
                "allowed" if robots_allows(rules, path) else "not allowed"
            )
        return pd.Series(out, index=s.index, dtype="object")

    _status = F.pandas_udf(_status_fn, T.StringType())
    return (
        urls.withColumn("status", _status(F.col("url")))
        .filter(F.col("status").isNotNull())
        .select("url", "status")
    )
