"""scoring-depth plugin tests (reference DepthScoringFilter.java).

Covers the hook points individually (injected metadata, generator sort
boost, outlink gate/decorate, updatedb min-depth merge) and the e2e
guarantee the plugin exists for: a depth-k budget stops the crawl from
growing past k hops, no matter how many more cycles run.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from nutch_spark.constants import STATUS_DB_UNFETCHED, STATUS_LINKED
from nutch_spark.functions.depth import (
    DEFAULT_MAX_DEPTH,
    DEPTH_KEY,
    MAX_DEPTH_KEY,
    depth_hooks,
)
from tests.conftest import T0


def _meta(df):
    return {
        r["url"]: dict(r["metadata"] or {}) for r in df.collect()
    }


# ---------------------------------------------------------------------
# inject: injectedScore metadata (DepthScoringFilter.java:141-158)
# ---------------------------------------------------------------------


def test_inject_stamps_depth_and_maxdepth(spark):
    from nutch_spark.operators.inject import inject

    seeds = spark.createDataFrame(
        [
            ("http://a.com/", None),
            ("http://b.com/", {MAX_DEPTH_KEY: "7", "k": "v"}),
        ],
        "url string, metadata map<string,string>",
    )
    fr = inject(spark, None, seeds, T0, hooks=depth_hooks(max_depth=3))
    m = _meta(fr)
    assert m["http://a.com/"][DEPTH_KEY] == "1"
    assert m["http://a.com/"][MAX_DEPTH_KEY] == "3"
    # seed-file override wins over the config default; other keys kept
    assert m["http://b.com/"][MAX_DEPTH_KEY] == "7"
    assert m["http://b.com/"][DEPTH_KEY] == "1"
    assert m["http://b.com/"]["k"] == "v"


# ---------------------------------------------------------------------
# generate: sort boost (DepthScoringFilter.java:97-117)
# ---------------------------------------------------------------------


def test_generate_prefers_shallow_pages(spark):
    from nutch_spark.operators.generate import generate
    from nutch_spark.schema import FRONTIER

    def row(url, depth):
        meta = {DEPTH_KEY: str(depth), MAX_DEPTH_KEY: "5"} if depth else {}
        return (
            url, 0, "h", STATUS_DB_UNFETCHED, T0 - 1000, 0,
            2592000, 1.0, None, 0, meta,
        )

    fr = spark.createDataFrame(
        [row("http://h/deep", 4), row("http://h/shallow", 1),
         row("http://h/mid", 2), row("http://h/nodepth", None)],
        FRONTIER,
    )
    fl = generate(
        fr, T0, "seg", top_n=2, hooks=depth_hooks(max_depth=5)
    )
    picked = {r["url"] for r in fl.select("url").collect()}
    # sort = initSort × (1 + maxdepth − depth): shallow(5) > mid(4);
    # nodepth is penalized to depth = maxdepth (mul 0, sort 1)
    assert picked == {"http://h/shallow", "http://h/mid"}


# ---------------------------------------------------------------------
# parse: outlink gate + target decorate (DepthScoringFilter.java:56-95)
# ---------------------------------------------------------------------


@pytest.fixture()
def parsed_pages(spark):
    from nutch_spark.schema import FETCH_RESULTS

    def page(url, meta, outlink):
        spans = [
            ("text", f"page with href:{outlink}", None, 0),
        ]
        return (
            url, 0, "h", 33, 1, T0, 0, 2592000, 1.0, None, 0,
            None, "success", spans, meta, "seg",
        )

    return spark.createDataFrame(
        [
            page("http://h/at-limit", {DEPTH_KEY: "2", MAX_DEPTH_KEY: "2"},
                 "http://h/x1"),
            page("http://h/under", {DEPTH_KEY: "1", MAX_DEPTH_KEY: "2"},
                 "http://h/x2"),
            page("http://h/custom", {DEPTH_KEY: "1", MAX_DEPTH_KEY: "9"},
                 "http://h/x3"),
            page("http://h/missing", {}, "http://h/x4"),
        ],
        FETCH_RESULTS,
    )


def test_outlinks_gated_and_decorated(spark, parsed_pages):
    from nutch_spark.operators.parse import parse

    _, cp = parse(parsed_pages, hooks=depth_hooks(max_depth=2))
    linked = cp.filter(F.col("status") == STATUS_LINKED)
    m = {
        r["url"]: dict(r["metadata"] or {}) for r in linked.collect()
    }
    # at-limit (depth ≥ maxdepth) and missing-depth pages emit nothing
    assert set(m) == {"http://h/x2", "http://h/x3"}
    assert m["http://h/x2"] == {DEPTH_KEY: "2", MAX_DEPTH_KEY: "2"}
    # custom budget inherited by the target
    assert m["http://h/x3"] == {DEPTH_KEY: "2", MAX_DEPTH_KEY: "9"}


# ---------------------------------------------------------------------
# updatedb: min-depth merge (DepthScoringFilter.java:185-207)
# ---------------------------------------------------------------------


def test_updatedb_takes_min_depth(spark):
    from nutch_spark.operators.updatedb import updatedb
    from nutch_spark.schema import CRAWL_PARSE, FRONTIER

    fr = spark.createDataFrame(
        [(
            "http://h/u", 0, "h", STATUS_DB_UNFETCHED, T0, 0,
            2592000, 0.0, None, 0, {DEPTH_KEY: "4", MAX_DEPTH_KEY: "9"},
        )],
        FRONTIER,
    )
    links = spark.createDataFrame(
        [
            ("http://h/u", STATUS_LINKED, 0.5, 2592000, None, "a",
             "http://h/p3", {DEPTH_KEY: "3"}, None),
            ("http://h/u", STATUS_LINKED, 0.5, 2592000, None, "a",
             "http://h/p2", {DEPTH_KEY: "2"}, None),
            # brand-new URL reached only by links
            ("http://h/new", STATUS_LINKED, 0.5, 2592000, None, "a",
             "http://h/p3", {DEPTH_KEY: "5"}, None),
        ],
        CRAWL_PARSE,
    )
    out = updatedb(spark, fr, None, links, T0 + 10, hooks=depth_hooks())
    m = _meta(out)
    # old depth 4 vs link depths {3, 2} → 2; _maxdepth_ carried from old
    assert m["http://h/u"][DEPTH_KEY] == "2"
    assert m["http://h/u"][MAX_DEPTH_KEY] == "9"
    # new linked-only row takes the link's depth
    assert m["http://h/new"][DEPTH_KEY] == "5"


def test_updatedb_old_without_depth_keeps_default_max(spark):
    """Reference quirk: an old row WITHOUT a depth key does not feed the
    min — newDepth runs from DEFAULT_MAX_DEPTH (updateDbScore's
    initialScore(old) call mutates `old`, not newDepth)."""
    from nutch_spark.operators.updatedb import updatedb
    from nutch_spark.schema import CRAWL_PARSE, FRONTIER

    fr = spark.createDataFrame(
        [(
            "http://h/u", 0, "h", STATUS_DB_UNFETCHED, T0, 0,
            2592000, 0.0, None, 0, {},
        )],
        FRONTIER,
    )
    links = spark.createDataFrame(
        [("http://h/u", STATUS_LINKED, 0.5, 2592000, None, "a",
          "http://h/p", None, None)],
        CRAWL_PARSE,
    )
    out = updatedb(spark, fr, None, links, T0 + 10, hooks=depth_hooks())
    m = _meta(out)
    assert m["http://h/u"][DEPTH_KEY] == str(DEFAULT_MAX_DEPTH)


# ---------------------------------------------------------------------
# e2e: a depth-k budget stops the crawl (the plugin's reason to exist)
# ---------------------------------------------------------------------


def test_depth_bounded_crawl_stops(spark):
    from nutch_spark.operators.fetch import fetch
    from nutch_spark.operators.generate import generate
    from nutch_spark.operators.inject import inject
    from nutch_spark.operators.parse import parse
    from nutch_spark.operators.updatedb import updatedb
    from nutch_spark.synth import WebConfig, robots_rows, seeds_df

    cfg = WebConfig(n_hosts=4, pages_per_host=6, zipf=False)
    robots = {r["host"]: r for r in robots_rows(cfg)}
    hooks = depth_hooks(max_depth=2)

    def crawl(h):
        fr = inject(spark, None, seeds_df(spark, cfg), T0, hooks=h)
        counts = []
        for d in range(3):
            fl = generate(fr, T0 + d, f"s{d}", top_n=1000, hooks=h)
            res = fetch(fl, robots, cfg, T0 + d).localCheckpoint()
            _, cp = parse(res, hooks=h)
            fr = updatedb(
                spark, fr, res, cp.localCheckpoint(), T0 + d, hooks=h
            ).localCheckpoint()
            counts.append(fr.count())
        return fr, counts

    fr_b, bounded = crawl(hooks)
    # depth budget 2: cycle 1 adds the seeds' outlinks (depth 2), and
    # the frontier must stop growing from cycle 2 on (their outlinks
    # are cleared), bar the depth-less redirect-target quirk rows
    assert bounded[1] >= bounded[0]
    assert bounded[2] == bounded[1]
    # every crawled row is within the budget (redirect quirk rows sit
    # at DEFAULT_MAX_DEPTH, never generated thanks to the sort penalty)
    depths = {
        int(v)
        for v in (
            r[0]
            for r in fr_b.select(
                F.element_at("metadata", DEPTH_KEY)
            ).collect()
        )
        if v is not None
    }
    assert depths <= {1, 2, DEFAULT_MAX_DEPTH}

    from nutch_spark.functions.scoring import OPIC

    _, unbounded = crawl(OPIC)
    assert unbounded[2] > bounded[2]
