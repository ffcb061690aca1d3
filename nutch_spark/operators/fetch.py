"""Fetch — per-host politeness scheduling as a partition-vectorized
pandas stage.

Replaces the reference's in-JVM producer/consumer machinery
(QueueFeeder + FetchItemQueues + FetcherThread,
fetcher/FetchItemQueue.java:95-138, FetcherThread.java:259-525) with a
Spark-native design per the north rule:

  fetchlist → repartition(P, host) → sortWithinPartitions(host, url_hash)
            → mapInPandas(politeness scheduler)

ONE explicit shuffle keyed on host (the reference's unsplittable
fetchlist inputs, Fetcher.java:91-104, exist for the same reason: a
host's queue must live in one task). The scheduler walks each Arrow
batch in a single pass over host-sorted rows, resetting the politeness
slot counter at host boundaries — per-host cost is O(rows), not
O(groups). Two earlier shapes were rejected by measurement: a
groupBy().applyInPandas paid ~10 ms of pandas/Arrow overhead per host
group; a per-group pdf.iloc slicing loop paid ~100 µs per group, which
at 20-URL host groups doubled the stage. A host group that spans Arrow
batch boundaries is carried over to the next batch, so politeness is
still computed over the whole group.

Semantics (identical across all three shapes, covered by tests):
  * fetch order inside a host = url_hash order (HashComparator,
    Generator.java:399-429);
  * robots gating per host from a broadcast rules table with
    HttpRobotRulesParser semantics (403 ⇒ forbid-all iff
    !http.robots.403.allow; 5xx ⇒ allow-all —
    lib-http/.../HttpRobotRulesParser.java:137-147); disallowed path ⇒
    fetch_gone/robots_denied (FetcherThread.java:259-271); crawl_delay >
    fetcher.max.crawl.delay ⇒ fetch_gone/robots_denied_maxcrawldelay
    (FetcherThread.java:273-283);
  * politeness: at most `threads_per_queue` in flight, consecutive
    slots spaced `crawl_delay` apart — simulated timestamps from a
    per-host slot counter (no wall-clock sleeps; the politeness
    *assertion* is on assigned timestamps, cf. TestFetcher.java:116-119);
  * redirects: http.redirect.max=0 records the target for updatedb
    (FetcherThread.java:473-492); >0 follows up to N hops then
    fetch_gone/redir_exceeded (FetcherThread.java:396-406);
  * the "network" is the deterministic synthetic web (synth.py) —
    page_outcome/page_spans are pure hash functions, so fetching is
    reproducible at any parallelism.

Skew: politeness is per-host serial by nature (one queue in the
reference too); generate's per-host cap bounds group size, and the
host-keyed repartition spreads distinct hosts evenly.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
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
from ..synth import WebConfig, page_content_type, page_outcome, page_spans


# longest-match Allow/Disallow + HTTP status rules; rules dicts come
# from synth.robots_rows or functions.robots.parse_robots_txt
from ..functions.robots import robots_allows as _robots_allows  # noqa: E402


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
    num_partitions: int | None = None,
    queue_mode: str = "byHost",  # byHost | byDomain | byIP (fetcher.queue.mode)
    resolver: dict[str, str] | None = None,
    time_limit_ms: int | None = None,  # fetcher.timelimit.mins × 60000
) -> DataFrame:
    """Run the simulated fetch over a fetchlist; returns fetch_results.

    ``time_limit_ms`` is the fetcher timebomb (Fetcher.java:391-396,
    FetchItemQueues.checkTimelimit/emptyQueues): once a queue's
    politeness schedule would run past cur_time + limit, the rest of
    that queue is DROPPED — no output rows; the URLs stay due in the
    frontier and are regenerated after the gen-delay marker expires.
    (The throughput kill-switch shares emptyQueues in the reference;
    it has no analogue here because the simulated fetch has no
    varying page rate.)

    ``byIP`` keys the politeness queue on the host's resolved address
    (FetchItem.create, fetcher/FetchItem.java:60-101: hosts sharing a
    server share one queue; unresolvable hosts fall back to the
    hostname). DNS is an external effect, so the verdicts arrive as the
    `resolver` mapping (host → IP) — at scale produced by a
    mapInPandas resolver stage over distinct hosts and broadcast; with
    no mapping each host falls back to itself, which degrades byIP to
    byHost exactly like all-distinct-IPs would."""
    from ..functions.urls import get_domain  # noqa: PLC0415

    spark = fetchlist.sparkSession
    robots_bc = spark.sparkContext.broadcast(robots)
    nparts = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions")
    )
    tpq = max(threads_per_queue, 1)
    by_domain = queue_mode == "byDomain"
    by_ip = queue_mode == "byIP"
    deadline_ms = (
        cur_time_ms + time_limit_ms if time_limit_ms is not None else None
    )

    def process_block(pdf: pd.DataFrame) -> pd.DataFrame:
        """One queue-sorted block of complete queue groups, single pass.

        The politeness slot counter is per queue key (host, or
        registered domain for byDomain — FetchItem.create,
        fetcher/FetchItem.java:60-101); robots rules stay per host."""
        urls = pdf["url"].to_list()
        hosts = pdf["host"].to_list()
        qkeys = pdf["_qkey"].to_list()
        n = len(urls)
        statuses = [0] * n
        ftimes = [cur_time_ms] * n
        redirs: list = [None] * n
        protos = [""] * n
        spans_out: list = [None] * n
        metas = pdf["metadata"].to_list()

        robots_all = robots_bc.value
        host_info: dict[str, tuple] = {}
        cur_q: str | None = None
        slot = 0
        for i in range(n):
            if qkeys[i] != cur_q:
                cur_q = qkeys[i]
                slot = 0
            h = hosts[i]
            info = host_info.get(h)
            if info is None:
                rules = robots_all.get(h)
                delay = default_delay
                if rules is not None and rules.get("crawl_delay") is not None:
                    delay = float(rules["crawl_delay"])
                info = (rules, int(delay * 1000), delay > max_crawl_delay)
                host_info[h] = info
            rules, delay_ms, blocked = info
            if blocked:
                # host skipped entirely (FetcherThread.java:273-283)
                statuses[i] = STATUS_FETCH_GONE
                protos[i] = "robots_denied_maxcrawldelay"
                continue
            url = urls[i]
            path = "/" + url.partition("://")[2].partition("/")[2]
            if not _robots_allows(rules, path, allow_forbidden=allow_forbidden):
                statuses[i] = STATUS_FETCH_GONE
                protos[i] = "robots_denied"
                continue
            t_assigned = cur_time_ms + (slot // tpq) * delay_ms
            if deadline_ms is not None and t_assigned >= deadline_ms:
                # timebomb: this and every later slot of the queue
                # would fire past the limit — drop (no output row)
                statuses[i] = -1
                continue
            ftimes[i] = t_assigned
            slot += 1
            kind, redirect_to = page_outcome(web, url)
            if retry_frac > 0 and kind == "ok":
                r = int.from_bytes(
                    hashlib.md5(
                        f"retry|{url}|{web.seed}".encode()
                    ).digest()[:4],
                    "big",
                )
                if (r % 10_000) < int(retry_frac * 10_000):
                    kind = "retry"
            hops = 0
            u = url
            while kind in ("redir_temp", "redir_perm") and hops < redirect_max:
                u = redirect_to
                kind, redirect_to = page_outcome(web, u)
                hops += 1
            if kind in ("redir_temp", "redir_perm"):
                if hops >= redirect_max and redirect_max > 0:
                    statuses[i] = STATUS_FETCH_GONE
                    protos[i] = "redir_exceeded"
                else:
                    statuses[i] = (
                        STATUS_FETCH_REDIR_TEMP
                        if kind == "redir_temp"
                        else STATUS_FETCH_REDIR_PERM
                    )
                    redirs[i] = redirect_to
                    protos[i] = "moved" if kind == "redir_perm" else "temp_moved"
            elif kind == "ok":
                statuses[i] = STATUS_FETCH_SUCCESS
                protos[i] = "success"
                spans_out[i] = page_spans(web, u)
                # ≙ Content metadata Content-Type reaching the datum
                # (CrawlDbReducer merges fetch metadata); feeds the
                # MimeAdaptive schedule
                md = dict(metas[i]) if metas[i] else {}
                md["Content-Type"] = page_content_type(web, u)
                metas[i] = md
            elif kind == "retry":
                statuses[i] = STATUS_FETCH_RETRY
                protos[i] = "exception"
            else:  # gone / missing
                statuses[i] = STATUS_FETCH_GONE
                protos[i] = "notfound"

        out_pdf = pd.DataFrame(
            {
                "url": pdf["url"],
                "url_hash": pdf["url_hash"],
                "host": pdf["host"],
                "status": pd.Series(statuses, dtype="int32", index=pdf.index),
                "prev_status": pdf["status"].astype("int32"),
                "fetch_time": pd.Series(ftimes, dtype="int64", index=pdf.index),
                "retries": pdf["retries"].astype("int32"),
                "fetch_interval": pdf["fetch_interval"].astype("int32"),
                "score": pdf["score"].astype("float32"),
                "prev_signature": pdf["signature"],
                "prev_modified_time": pdf["modified_time"].astype("int64"),
                "redirect_to": pd.Series(redirs, dtype="object", index=pdf.index),
                "protocol_status": pd.Series(protos, dtype="object", index=pdf.index),
                "spans": pd.Series(spans_out, dtype="object", index=pdf.index),
                "metadata": pd.Series(metas, dtype="object", index=pdf.index),
                "segment": pdf["segment"],
            }
        )
        if deadline_ms is not None:
            out_pdf = out_pdf[out_pdf["status"] != -1]
        return out_pdf

    def fetch_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        carry: pd.DataFrame | None = None
        for pdf in batches:
            if carry is not None and len(carry):
                pdf = pd.concat([carry, pdf], ignore_index=True)
                carry = None
            if not len(pdf):
                continue
            keys = pdf["_qkey"].to_numpy()
            # rows of the batch's last queue may continue in the next
            # batch — carry them over so the group stays whole
            cut = int(np.flatnonzero(keys == keys[-1])[0])
            carry = pdf.iloc[cut:]
            head = pdf.iloc[:cut]
            if len(head):
                yield process_block(head)
        if carry is not None and len(carry):
            yield process_block(carry)

    if by_domain:
        # registered-domain queue key via the domain suffix table
        from pyspark.sql import types as T  # noqa: PLC0415

        @F.pandas_udf(T.StringType())
        def _domain_key(hosts_s: pd.Series) -> pd.Series:
            # resolve each DISTINCT host once (batches carry many rows
            # per host), then a vectorized map over the batch
            tbl = {h: (get_domain(h) or h) for h in hosts_s.dropna().unique()}
            return hosts_s.map(tbl)

        keyed = fetchlist.withColumn("_qkey", _domain_key(F.col("host")))
    elif by_ip:
        from pyspark.sql import types as T  # noqa: PLC0415

        ip_bc = spark.sparkContext.broadcast(resolver or {})

        @F.pandas_udf(T.StringType())
        def _ip_key(hosts_s: pd.Series) -> pd.Series:
            tbl = ip_bc.value
            return pd.Series(
                [tbl.get(h, h) for h in hosts_s], index=hosts_s.index
            )

        keyed = fetchlist.withColumn("_qkey", _ip_key(F.col("host")))
    else:
        keyed = fetchlist.withColumn("_qkey", F.col("host"))

    part = keyed.repartition(nparts, "_qkey").sortWithinPartitions(
        "_qkey", "url_hash"
    )
    out = part.mapInPandas(
        fetch_partition,
        FETCH_RESULTS,
    )
    return out
