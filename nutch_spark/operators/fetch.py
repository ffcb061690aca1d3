"""Fetch — per-host politeness scheduling as a grouped pandas stage.

Replaces the reference's in-JVM producer/consumer machinery
(QueueFeeder + FetchItemQueues + FetcherThread,
fetcher/FetchItemQueue.java:95-138, FetcherThread.java:259-525) with a
Spark-native design per the north rule:

  fetchlist (already host-partitioned by generate)
    → groupBy(host).applyInPandas(token-bucket scheduler)

Each host group is processed as ONE vectorized unit:
  * fetch order inside a host = url_hash order (the reference's
    HashComparator order, Generator.java:399-429);
  * robots gating per host from a broadcast rules table with
    HttpRobotRulesParser semantics (403 ⇒ forbid-all iff
    !http.robots.403.allow; 5xx ⇒ allow-all —
    lib-http/.../HttpRobotRulesParser.java:137-147); disallowed path ⇒
    fetch_gone/robots_denied (FetcherThread.java:259-271); crawl_delay >
    fetcher.max.crawl.delay ⇒ fetch_gone/robots_denied_maxcrawldelay
    (FetcherThread.java:273-283);
  * politeness: at most `threads_per_queue` in flight, consecutive
    slots spaced `crawl_delay` apart — simulated timestamps assigned by
    a vectorized cumulative slot counter (no wall-clock sleeps; the
    politeness *assertion* is on the assigned timestamps, cf.
    TestFetcher.java:116-119);
  * redirects: http.redirect.max=0 records the target for updatedb to
    turn into a linked datum (FetcherThread.java:473-492); >0 follows
    up to N hops then fetch_gone/redir_exceeded
    (FetcherThread.java:396-406);
  * the "network" is the deterministic synthetic web (synth.py) —
    page_outcome/page_spans are pure hash functions, so fetching is
    reproducible at any parallelism.

Skew: politeness is inherently per-host serial, so a mega-host group is
the *semantic* critical path (same in the reference — one queue).
Protection is upstream: generate's per-host cap bounds group size; the
host-salted repartition spreads distinct hosts evenly.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..constants import (
    Defaults,
    STATUS_FETCH_GONE,
    STATUS_FETCH_REDIR_PERM,
    STATUS_FETCH_REDIR_TEMP,
    STATUS_FETCH_RETRY,
    STATUS_FETCH_SUCCESS,
)
from ..schema import FETCH_RESULTS
from ..synth import WebConfig, page_outcome, page_spans


def _robots_allows(rules: dict | None, path: str, allow_forbidden: bool) -> bool:
    if rules is None:
        return True
    code = rules.get("http_code", 200)
    if code >= 500:
        return True  # 5xx ⇒ allow-all, uncached
    if code == 403 and not allow_forbidden:
        return False  # forbid-all
    for prefix in rules.get("disallow") or ():
        if path.startswith(prefix):
            return False
    return True


def fetch(
    fetchlist: DataFrame,
    robots: dict[str, dict],
    web: WebConfig,
    cur_time_ms: int,
    threads_per_queue: int = Defaults.THREADS_PER_QUEUE,
    default_delay: float = Defaults.SERVER_DELAY,
    max_crawl_delay: float = Defaults.MAX_CRAWL_DELAY,
    redirect_max: int = Defaults.REDIRECT_MAX,
    allow_forbidden: bool = False,
    retry_frac: float = 0.0,
) -> DataFrame:
    """Run the simulated fetch over a fetchlist; returns fetch_results."""
    spark = fetchlist.sparkSession
    robots_bc = spark.sparkContext.broadcast(robots)

    def fetch_host(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("url_hash", kind="mergesort").reset_index(drop=True)
        host = pdf["host"].iloc[0]
        rules = robots_bc.value.get(host)
        delay = default_delay
        if rules is not None and rules.get("crawl_delay") is not None:
            delay = float(rules["crawl_delay"])

        n = len(pdf)
        out = {
            "url": pdf["url"],
            "url_hash": pdf["url_hash"],
            "host": pdf["host"],
            "status": pd.Series([0] * n, dtype="int32"),
            "prev_status": pdf["status"].astype("int32"),
            "fetch_time": pd.Series([cur_time_ms] * n, dtype="int64"),
            "retries": pdf["retries"].astype("int32"),
            "fetch_interval": pdf["fetch_interval"].astype("int32"),
            "score": pdf["score"].astype("float32"),
            "prev_signature": pdf["signature"],
            "prev_modified_time": pdf["modified_time"].astype("int64"),
            "redirect_to": pd.Series([None] * n, dtype="object"),
            "protocol_status": pd.Series([""] * n, dtype="object"),
            "spans": pd.Series([None] * n, dtype="object"),
            "metadata": pdf["metadata"],
            "segment": pdf["segment"],
        }

        if delay > max_crawl_delay:
            # host skipped entirely (FetcherThread.java:273-283)
            out["status"][:] = STATUS_FETCH_GONE
            out["protocol_status"][:] = "robots_denied_maxcrawldelay"
            return pd.DataFrame(out)

        paths = pdf["url"].str.replace(r"\Ahttps?://[^/]+", "", regex=True, n=1)
        allowed = paths.map(lambda p: _robots_allows(rules, p or "/", allow_forbidden))

        # politeness slots: only actually-fetched items consume a slot
        slot = allowed.cumsum() - 1
        delay_ms = int(delay * 1000)
        times = cur_time_ms + (slot.clip(lower=0) // max(threads_per_queue, 1)) * delay_ms

        statuses = out["status"].to_numpy()
        proto = out["protocol_status"]
        redirs = out["redirect_to"]
        spans_col = out["spans"]
        ftime = out["fetch_time"].to_numpy()

        for i in range(n):
            if not allowed.iloc[i]:
                statuses[i] = STATUS_FETCH_GONE
                proto.iloc[i] = "robots_denied"
                continue
            ftime[i] = times.iloc[i]
            url = pdf["url"].iloc[i]
            kind, redirect_to = page_outcome(web, url)
            if retry_frac > 0 and kind == "ok":
                import hashlib  # noqa: PLC0415

                r = int.from_bytes(
                    hashlib.md5(f"retry|{url}|{web.seed}".encode()).digest()[:4], "big"
                )
                if (r % 10_000) < int(retry_frac * 10_000):
                    kind = "retry"
            hops = 0
            while kind in ("redir_temp", "redir_perm") and hops < redirect_max:
                url = redirect_to
                kind, redirect_to = page_outcome(web, url)
                hops += 1
            if kind in ("redir_temp", "redir_perm"):
                if hops >= redirect_max and redirect_max > 0:
                    statuses[i] = STATUS_FETCH_GONE
                    proto.iloc[i] = "redir_exceeded"
                else:
                    statuses[i] = (
                        STATUS_FETCH_REDIR_TEMP
                        if kind == "redir_temp"
                        else STATUS_FETCH_REDIR_PERM
                    )
                    redirs.iloc[i] = redirect_to
                    proto.iloc[i] = "moved" if kind == "redir_perm" else "temp_moved"
            elif kind == "ok":
                statuses[i] = STATUS_FETCH_SUCCESS
                proto.iloc[i] = "success"
                spans_col.iloc[i] = page_spans(web, url)
            elif kind == "retry":
                statuses[i] = STATUS_FETCH_RETRY
                proto.iloc[i] = "exception"
            else:  # gone / missing
                statuses[i] = STATUS_FETCH_GONE
                proto.iloc[i] = "notfound"

        out["status"] = pd.Series(statuses, dtype="int32")
        out["fetch_time"] = pd.Series(ftime, dtype="int64")
        return pd.DataFrame(out)

    return fetchlist.groupBy("host").applyInPandas(fetch_host, FETCH_RESULTS)
