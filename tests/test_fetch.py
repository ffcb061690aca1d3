"""Fetch politeness / robots / redirects (FIXTURES.md §D; reference
TestFetcher.java:82-180 politeness assertion re-expressed on simulated
timestamps — no wall-clock sleeps)."""

from __future__ import annotations

import itertools

from nutch_spark.constants import (
    STATUS_FETCH_GONE,
    STATUS_FETCH_REDIR_PERM,
    STATUS_FETCH_REDIR_TEMP,
    STATUS_FETCH_SUCCESS,
)
from nutch_spark.operators.fetch import fetch
from nutch_spark.operators.generate import generate
from nutch_spark.operators.inject import inject
from nutch_spark.synth import (
    WebConfig,
    host_name,
    page_url,
    robots_rows,
    seeds_df,
)

T0 = 1_700_000_000_000


def make_fetchlist(spark, cfg, urls=None):
    from pyspark.sql import Row

    from nutch_spark.schema import SEEDS

    if urls is None:
        seeds = seeds_df(spark, cfg)
    else:
        seeds = spark.createDataFrame([Row(url=u, metadata={}) for u in urls], SEEDS)
    fr = inject(spark, None, seeds, T0)
    return generate(fr, T0, "seg", top_n=10_000)


def robots_map(cfg):
    return {r["host"]: r for r in robots_rows(cfg)}


def test_single_host_politeness(spark):
    """6 pages, 1 host, delay 5s ⇒ timestamps strictly spaced ≥5s and
    makespan ≥ (n−1)×5s (cf. TestFetcher.java:116-119)."""
    cfg = WebConfig(n_hosts=1, pages_per_host=6, zipf=False, gone_frac=0, redir_frac=0)
    urls = [page_url(cfg, 0, i) for i in range(6)]
    fl = make_fetchlist(spark, cfg, urls)
    res = fetch(fl, robots_map(cfg), cfg, T0).collect()
    assert len(res) == 6
    assert all(r.status == STATUS_FETCH_SUCCESS for r in res)
    ts = sorted(r.fetch_time for r in res)
    gaps = [b - a for a, b in zip(ts, ts[1:])]
    assert all(g >= 5000 for g in gaps)
    assert ts[-1] - ts[0] >= 5 * 5000


def test_multi_host_concurrent(spark):
    """Hosts proceed concurrently: every host's first fetch is at T0."""
    cfg = WebConfig(n_hosts=3, pages_per_host=3, zipf=False, gone_frac=0, redir_frac=0)
    urls = [page_url(cfg, h, i) for h in range(3) for i in range(3)]
    fl = make_fetchlist(spark, cfg, urls)
    res = fetch(fl, robots_map(cfg), cfg, T0).collect()
    rows = sorted((r.host, r.fetch_time) for r in res)
    for host, grp in itertools.groupby(rows, key=lambda x: x[0]):
        ts = sorted(t for _, t in grp)
        assert ts[0] == T0, host
        assert all(b - a >= 5000 for a, b in zip(ts, ts[1:]))


def test_robots_disallow_path(spark):
    cfg = WebConfig(n_hosts=1, pages_per_host=3, zipf=False)
    host = host_name(cfg, 0)
    robots = {host: {"host": host, "disallow": ["/p/0000"], "crawl_delay": 5.0, "http_code": 200}}
    fl = make_fetchlist(spark, cfg, [page_url(cfg, 0, i) for i in range(3)])
    res = fetch(fl, robots, cfg, T0).collect()
    assert all(r.status == STATUS_FETCH_GONE for r in res)
    assert all(r.protocol_status == "robots_denied" for r in res)


def test_robots_403_forbids_all(spark):
    cfg = WebConfig(n_hosts=1, pages_per_host=2, zipf=False)
    host = host_name(cfg, 0)
    robots = {host: {"host": host, "disallow": [], "crawl_delay": 5.0, "http_code": 403}}
    fl = make_fetchlist(spark, cfg, [page_url(cfg, 0, 0)])
    res = fetch(fl, robots, cfg, T0).collect()
    assert res[0].status == STATUS_FETCH_GONE
    # allow_forbidden flips it (http.robots.403.allow)
    res2 = fetch(fl, robots, cfg, T0, allow_forbidden=True).collect()
    assert res2[0].status == STATUS_FETCH_SUCCESS


def test_robots_5xx_allows_all(spark):
    cfg = WebConfig(n_hosts=1, pages_per_host=2, zipf=False)
    host = host_name(cfg, 0)
    robots = {host: {"host": host, "disallow": ["/"], "crawl_delay": 5.0, "http_code": 503}}
    fl = make_fetchlist(spark, cfg, [page_url(cfg, 0, 0)])
    res = fetch(fl, robots, cfg, T0).collect()
    assert res[0].status == STATUS_FETCH_SUCCESS


def test_crawl_delay_exceeds_max(spark):
    """crawl_delay 60s > max 30s ⇒ whole host skipped
    (FetcherThread.java:273-283)."""
    cfg = WebConfig(n_hosts=1, pages_per_host=2, zipf=False, slow_hosts=(0,))
    fl = make_fetchlist(spark, cfg, [page_url(cfg, 0, i) for i in range(2)])
    res = fetch(fl, robots_map(cfg), cfg, T0).collect()
    assert all(r.status == STATUS_FETCH_GONE for r in res)
    assert all(r.protocol_status == "robots_denied_maxcrawldelay" for r in res)


def test_redirect_recorded_not_followed(spark):
    """http.redirect.max=0 ⇒ redirect target recorded in redirect_to
    (FetcherThread.java:473-492)."""
    cfg = WebConfig(n_hosts=1, pages_per_host=20, zipf=False, redir_frac=1.0, gone_frac=0)
    urls = [page_url(cfg, 0, i) for i in range(1, 10)]
    fl = make_fetchlist(spark, cfg, urls)
    res = fetch(fl, robots_map(cfg), cfg, T0, redirect_max=0).collect()
    redirs = [r for r in res if r.status in (STATUS_FETCH_REDIR_TEMP, STATUS_FETCH_REDIR_PERM)]
    assert redirs, "redir_frac=1.0 must produce redirects"
    assert all(r.redirect_to and r.redirect_to != r.url for r in redirs)
    assert all(r.spans is None for r in redirs)


def test_redirect_followed(spark):
    cfg = WebConfig(n_hosts=1, pages_per_host=20, zipf=False, redir_frac=1.0, gone_frac=0)
    urls = [page_url(cfg, 0, i) for i in range(1, 10)]
    fl = make_fetchlist(spark, cfg, urls)
    res = fetch(fl, robots_map(cfg), cfg, T0, redirect_max=5).collect()
    # following up to 5 hops should resolve most to success or gone
    assert all(
        r.status in (STATUS_FETCH_SUCCESS, STATUS_FETCH_GONE) or r.protocol_status == "redir_exceeded"
        for r in res
    )


def test_fetch_order_is_url_hash_order(spark):
    """Within a host fetch proceeds in url_hash order (reference
    HashComparator semantics, Generator.java:399-429)."""
    cfg = WebConfig(n_hosts=1, pages_per_host=8, zipf=False, gone_frac=0, redir_frac=0)
    urls = [page_url(cfg, 0, i) for i in range(8)]
    fl = make_fetchlist(spark, cfg, urls)
    res = fetch(fl, robots_map(cfg), cfg, T0).collect()
    by_time = [r.url_hash for r in sorted(res, key=lambda r: r.fetch_time)]
    assert by_time == sorted(by_time)


def test_deterministic_across_parallelism(spark):
    """Same input ⇒ identical fetch results regardless of partitioning."""
    cfg = WebConfig(n_hosts=4, pages_per_host=6, zipf=False)
    urls = [page_url(cfg, h, i) for h in range(4) for i in range(4)]
    fl = make_fetchlist(spark, cfg, urls)
    a = fetch(fl.repartition(1), robots_map(cfg), cfg, T0)
    b = fetch(fl.repartition(16), robots_map(cfg), cfg, T0)
    ka = sorted((r.url, r.status, r.fetch_time) for r in a.collect())
    kb = sorted((r.url, r.status, r.fetch_time) for r in b.collect())
    assert ka == kb


def test_queue_mode_by_domain(spark):
    """byDomain queue mode: hosts sharing a registered domain share one
    politeness queue (FetchItem.create, fetcher/FetchItem.java:60-101).
    Synthetic hosts host0/host3 both live in example0.com."""
    cfg = WebConfig(n_hosts=6, pages_per_host=2, zipf=False,
                    gone_frac=0, redir_frac=0)
    urls = [page_url(cfg, h, i) for h in (0, 3) for i in range(2)]
    fl = make_fetchlist(spark, cfg, urls)
    res = fetch(fl, robots_map(cfg), cfg, T0, queue_mode="byDomain").collect()
    assert len(res) == 4
    ts = sorted(r.fetch_time for r in res)
    # one shared queue of 4 items at 5s delay ⇒ makespan ≥ 3×5s and all
    # timestamps distinct
    assert ts[-1] - ts[0] >= 3 * 5000
    assert len(set(ts)) == 4
    # byHost: the two hosts run concurrently ⇒ two fetches at T0
    res_h = fetch(fl, robots_map(cfg), cfg, T0).collect()
    assert sorted(r.fetch_time for r in res_h)[:2] == [T0, T0]


def test_queue_mode_by_ip(spark):
    """byIP queue mode: hosts resolving to the same address share one
    politeness queue; hosts without a resolver entry fall back to their
    own hostname (FetchItem.create, fetcher/FetchItem.java:60-101)."""
    cfg = WebConfig(n_hosts=6, pages_per_host=2, zipf=False,
                    gone_frac=0, redir_frac=0)
    urls = [page_url(cfg, h, i) for h in (0, 1) for i in range(2)]
    fl = make_fetchlist(spark, cfg, urls)
    shared = {host_name(cfg, 0): "10.0.0.1", host_name(cfg, 1): "10.0.0.1"}
    res = fetch(fl, robots_map(cfg), cfg, T0, queue_mode="byIP",
                resolver=shared).collect()
    ts = sorted(r.fetch_time for r in res)
    assert ts[-1] - ts[0] >= 3 * 5000  # one queue of 4 at 5s delay
    assert len(set(ts)) == 4
    # no resolver ⇒ per-host queues, two immediate fetches
    res_h = fetch(fl, robots_map(cfg), cfg, T0, queue_mode="byIP").collect()
    assert sorted(r.fetch_time for r in res_h)[:2] == [T0, T0]


def test_parse_robots_txt_grammar():
    """robots.txt grammar + crawler-commons matching semantics
    (protocol/RobotRulesParser.java → SimpleRobotRulesParser): agent
    substring groups, named-beats-wildcard, longest-match Allow/
    Disallow with Allow winning ties, Crawl-delay, empty Disallow."""
    from nutch_spark.functions.robots import parse_robots_txt, robots_allows

    txt = """
# robots for example.com
User-agent: googlebot
Disallow: /private/

User-agent: nutch-crawler
User-agent: otherbot
Disallow: /secret/
Allow: /secret/ok/
Crawl-delay: 2.5

User-agent: *
Disallow: /all/
"""
    r = parse_robots_txt(txt, agent="nutch")
    assert r["crawl_delay"] == 2.5
    assert not robots_allows(r, "/secret/x")
    assert robots_allows(r, "/secret/ok/y")  # longer Allow wins
    assert robots_allows(r, "/all/z")  # named group won, '*' ignored
    assert robots_allows(r, "/open")

    w = parse_robots_txt(txt, agent="unknownbot")
    assert not robots_allows(w, "/all/z")  # wildcard group applies
    assert robots_allows(w, "/secret/x")

    # empty Disallow ⇒ allow everything; missing file ⇒ allow
    e = parse_robots_txt("User-agent: *\nDisallow:\n", agent="nutch")
    assert robots_allows(e, "/anything")
    assert robots_allows(parse_robots_txt(None), "/x")

    # Allow/Disallow tie at equal length → Allow
    t = parse_robots_txt(
        "User-agent: *\nDisallow: /a/\nAllow: /a/\n", agent="nutch"
    )
    assert robots_allows(t, "/a/page")

    # HTTP status rules (HttpRobotRulesParser.java:137-147)
    assert robots_allows({"http_code": 503}, "/x")
    assert not robots_allows({"http_code": 403}, "/x")
    assert robots_allows({"http_code": 403}, "/x", allow_forbidden=True)


def test_fetch_with_parsed_robots(spark):
    """A parsed robots.txt drives the fetch gate end-to-end (Allow
    carve-out inside a Disallow subtree)."""
    from nutch_spark.functions.robots import parse_robots_txt

    cfg = WebConfig(n_hosts=2, pages_per_host=4, zipf=False,
                    gone_frac=0, redir_frac=0)
    h0 = host_name(cfg, 0)
    robots = {h0: parse_robots_txt(
        "User-agent: *\nDisallow: /p/\nAllow: /p/00002\n", agent="nutch")}
    urls = [page_url(cfg, 0, i) for i in range(4)]
    fl = make_fetchlist(spark, cfg, urls)
    res = {r.url: r for r in fetch(fl, robots, cfg, T0).collect()}
    for i in (0, 1, 3):
        assert res[page_url(cfg, 0, i)].protocol_status == "robots_denied"
    assert res[page_url(cfg, 0, 2)].protocol_status == "success"


def test_fetch_time_limit_drops_queue_tail(spark):
    """fetcher.timelimit: politeness slots past the deadline are
    dropped — no output rows, URLs stay due in the frontier
    (Fetcher.java:391-396, FetchItemQueues.emptyQueues)."""
    cfg = WebConfig(n_hosts=1, pages_per_host=6, zipf=False,
                    gone_frac=0, redir_frac=0)
    urls = [page_url(cfg, 0, i) for i in range(4)]
    fl = make_fetchlist(spark, cfg, urls)
    # delay 5s; slots at T0, +5s, +10s, +15s; limit 11s keeps 3
    res = fetch(fl, robots_map(cfg), cfg, T0, time_limit_ms=11_000).collect()
    assert len(res) == 3
    assert max(r.fetch_time for r in res) <= T0 + 10_000
    # no limit: all 4 fetched
    assert len(fetch(fl, robots_map(cfg), cfg, T0).collect()) == 4


def test_fetch_emits_content_type(spark):
    """Successful fetches carry a deterministic Content-Type in their
    metadata (feeds MimeAdaptiveFetchSchedule e2e)."""
    from nutch_spark.synth import page_content_type

    cfg = WebConfig(n_hosts=2, pages_per_host=5, zipf=False,
                    gone_frac=0, redir_frac=0)
    urls = [page_url(cfg, h, i) for h in range(2) for i in range(5)]
    fl = make_fetchlist(spark, cfg, urls)
    res = fetch(fl, robots_map(cfg), cfg, T0).collect()
    oks = [r for r in res if r.protocol_status == "success"]
    assert oks
    for r in oks:
        assert r.metadata["Content-Type"] == page_content_type(cfg, r.url)
