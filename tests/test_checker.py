"""ParserChecker / IndexingFiltersChecker tool-surface tests
(reference parse/ParserChecker.java, indexer/IndexingFiltersChecker.java)."""

from __future__ import annotations

import pytest

from nutch_spark.synth import WebConfig, page_outcome, robots_rows


@pytest.fixture(scope="module")
def web():
    return WebConfig(n_hosts=4, pages_per_host=6, zipf=False)


def _find_url(web, *kinds_want):
    for h in range(web.n_hosts):
        host = f"host{h}.example{h % 3}.com"
        for p in range(web.pages_per_host):
            url = f"http://{host}/p/{p:05d}"
            kind, _ = page_outcome(web, url)
            if kind in kinds_want:
                return url
    raise AssertionError(f"no {kinds_want} url in this web")


def test_check_parse_success(spark, web):
    from nutch_spark.checker import check_parse

    url = _find_url(web, "ok")
    rep = check_parse(spark, web, url, dump_text=True)
    assert rep["ok"] and rep["protocol_status"] == "success"
    assert rep["signature"] and rep["title"]
    assert rep["outlinks"], "a synthetic ok-page always has outlinks"
    assert rep["text"]
    # the would-be crawl_parse datums: per-outlink linked + signature
    statuses = {c["status"] for c in rep["crawl_parse"]}
    assert statuses == {0x43, 0x41}  # linked, signature


def test_check_parse_metadata_rides_along(spark, web):
    """-md key=value metadata reaches the fetch datum (the reference
    simulates injection metadata this way)."""
    from nutch_spark.checker import check_parse

    url = _find_url(web, "ok")
    rep = check_parse(spark, web, url, metadata={"k": "v"})
    assert rep["content_metadata"]["k"] == "v"


def test_check_parse_redirect_followed(spark):
    from nutch_spark.checker import check_parse

    # a web with enough redirect mass to guarantee one
    web = WebConfig(n_hosts=6, pages_per_host=30, zipf=False,
                    redir_frac=0.2)
    url = _find_url(web, "redir_perm", "redir_temp")
    # http.redirect.max=0: record the target, do not follow
    rep0 = check_parse(spark, web, url)
    assert not rep0["ok"] and rep0["redirect_to"]
    # following resolves to a success (synthetic redirects point at
    # ok pages unless chained past the hop limit)
    rep1 = check_parse(spark, web, url, redirect_max=3)
    assert rep1["ok"] or rep1["protocol_status"] == "redir_exceeded"


def test_check_parse_robots_denied(spark):
    from nutch_spark.checker import check_parse

    cfg = WebConfig(n_hosts=4, pages_per_host=6, zipf=False,
                    blocked_hosts=(0,))
    robots = {r["host"]: r for r in robots_rows(cfg)}
    url = "http://host0.example0.com/p/00000"
    rep = check_parse(spark, cfg, url, robots=robots)
    assert not rep["ok"]
    assert rep["protocol_status"].startswith("robots_denied")


def test_check_index_document(spark, web):
    from nutch_spark.checker import check_index
    from nutch_spark.operators.indexplugins import (
        BasicFields,
        IndexingFilterChain,
        StaticFields,
    )

    url = _find_url(web, "ok")
    chain = IndexingFilterChain(
        [BasicFields(), StaticFields({"source": "check"})]
    )
    rep = check_index(spark, web, url, chain=chain)
    assert rep["ok"]
    doc = rep["doc"]
    assert doc["url"] == url
    assert doc["source"] == "check"
    assert doc["title"]


def test_check_robots_verdicts(spark):
    """RobotRulesParser tool surface: allowed / not allowed /
    whitelisted per URL, longest-match Allow beating shorter
    Disallow, malformed URLs dropped."""
    from nutch_spark.checker import check_robots

    robots = """
User-agent: nutch
Disallow: /private/
Allow: /private/open/

User-agent: *
Disallow: /
"""
    urls = [
        "http://a.com/ok",
        "http://a.com/private/x",
        "http://a.com/private/open/y",
        "http://white.com/private/x",
        "not a url",
    ]
    got = {
        r["url"]: r["status"]
        for r in check_robots(
            spark, robots, urls, agent="nutch", whitelist=("white.com",)
        ).collect()
    }
    assert got == {
        "http://a.com/ok": "allowed",
        "http://a.com/private/x": "not allowed",
        "http://a.com/private/open/y": "allowed",
        "http://white.com/private/x": "whitelisted",
    }


def test_check_robots_wildcard_group(spark):
    """An agent with no named group falls to the `*` group (the
    reference's http.agent.name-empty behavior)."""
    from nutch_spark.checker import check_robots

    robots = "User-agent: *\nDisallow: /secret/\n"
    got = {
        r["url"]: r["status"]
        for r in check_robots(
            spark, robots, ["http://h/secret/a", "http://h/pub"],
            agent="someother",
        ).collect()
    }
    assert got == {
        "http://h/secret/a": "not allowed",
        "http://h/pub": "allowed",
    }
