"""Generator topN / per-host caps (FIXTURES.md §B; reference
src/test/org/apache/nutch/crawl/TestGenerator.java:79-283 semantics)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from nutch_spark.constants import Defaults, META_GENERATE_TIME, STATUS_DB_UNFETCHED
from nutch_spark.operators.generate import generate, mark_generated
from nutch_spark.schema import FRONTIER

T0 = 1_700_000_000_000


def frontier(spark, rows):
    def mk(url, score, host=None, fetch_time=T0 - 1000, interval=1, meta=None):
        import hashlib

        h = host or url.split("/")[2]
        return Row(
            url=url,
            url_hash=int.from_bytes(hashlib.md5(url.encode()).digest()[:8], "big") // 4,
            host=h,
            status=STATUS_DB_UNFETCHED,
            fetch_time=fetch_time,
            retries=0,
            fetch_interval=interval,
            score=float(score),
            signature=None,
            modified_time=0,
            metadata=meta or {},
        )

    return spark.createDataFrame([mk(*r[:2], **(r[2] if len(r) > 2 else {})) for r in rows], FRONTIER)


def test_topn_highest_scores(spark):
    """101 urls scored 0..100, topN=2 ⇒ exactly /100 and /099
    (TestGenerator.java:79-107)."""
    rows = [(f"http://aaa.example.com/{i:03d}", i) for i in range(101)]
    fl = generate(frontier(spark, rows), T0, "seg", top_n=2)
    urls = sorted(r.url for r in fl.collect())
    assert urls == ["http://aaa.example.com/099", "http://aaa.example.com/100"]


@pytest.mark.parametrize("max_count,expected", [(2, 1), (3, 2), (4, 3)])
def test_per_host_cap(spark, max_count, expected):
    """generate.max.count=k ⇒ fetchlist keeps k−1 per host for segment 1
    (TestGenerator.java:139-186 observed counts)."""
    rows = [(f"http://aaa.example.com/{i}", 10 - i) for i in range(3)]
    fl = generate(frontier(spark, rows), T0, "seg", top_n=100, max_count=max_count)
    assert fl.count() == min(expected, 3)


def test_per_domain_cap(spark):
    """count.mode=domain groups a./b./c.example.com together
    (TestGenerator.java:195-245)."""
    rows = [
        (f"http://{sub}.example.com/x", s)
        for sub, s in [("a", 3), ("b", 2), ("c", 1)]
    ]
    fl = generate(
        frontier(spark, rows), T0, "seg", top_n=100, max_count=3, count_mode="domain"
    )
    got = sorted(r.url for r in fl.collect())
    # maxCount=3 ⇒ keep 2 per domain, highest scores first
    assert got == ["http://a.example.com/x", "http://b.example.com/x"]


def test_due_filter(spark):
    rows = [
        ("http://aaa.example.com/due", 1, {"fetch_time": T0 - 10}),
        ("http://aaa.example.com/future", 2, {"fetch_time": T0 + 10_000_000}),
    ]
    fl = generate(frontier(spark, rows), T0, "seg", top_n=10)
    assert [r.url for r in fl.collect()] == ["http://aaa.example.com/due"]


def test_too_remote_clamp(spark):
    """fetchTime absurdly far in the future ⇒ due now with clamped interval
    (AbstractFetchSchedule.java:183-197)."""
    far = T0 + (Defaults.FETCH_INTERVAL_MAX + 10_000) * 1000
    rows = [("http://aaa.example.com/far", 1, {"fetch_time": far, "interval": Defaults.FETCH_INTERVAL_MAX + 5})]
    fl = generate(frontier(spark, rows), T0, "seg", top_n=10)
    out = fl.collect()
    assert len(out) == 1
    assert out[0].fetch_interval == int(Defaults.FETCH_INTERVAL_MAX * 0.9)


def test_recently_generated_skipped(spark):
    recent = str(T0 - 1000)
    old = str(T0 - Defaults.GEN_DELAY_MS - 1000)
    rows = [
        ("http://aaa.example.com/recent", 1, {"meta": {META_GENERATE_TIME: recent}}),
        ("http://aaa.example.com/old", 1, {"meta": {META_GENERATE_TIME: old}}),
        ("http://aaa.example.com/never", 1),
    ]
    fl = generate(frontier(spark, rows), T0, "seg", top_n=10)
    urls = sorted(r.url for r in fl.collect())
    assert urls == ["http://aaa.example.com/never", "http://aaa.example.com/old"]


def test_filter_chain_toggle(spark):
    """filter on rejects '?' URLs; off passes them (TestGenerator.java:254-283)."""
    rows = [("http://aaa.example.com/x?y=1", 1)]
    assert generate(frontier(spark, rows), T0, "s", top_n=10, apply_filters=True).count() == 0
    assert generate(frontier(spark, rows), T0, "s", top_n=10, apply_filters=False).count() == 1


def test_min_score_and_predicate(spark):
    rows = [("http://aaa.example.com/a", 5), ("http://aaa.example.com/b", 1)]
    fl = generate(frontier(spark, rows), T0, "s", top_n=10, min_score=2.0)
    assert [r.url for r in fl.collect()] == ["http://aaa.example.com/a"]
    fl2 = generate(frontier(spark, rows), T0, "s", top_n=10, predicate="score < 2")
    assert [r.url for r in fl2.collect()] == ["http://aaa.example.com/b"]


def test_mark_generated_roundtrip(spark):
    rows = [("http://aaa.example.com/a", 1), ("http://aaa.example.com/b", 1)]
    fr = frontier(spark, rows)
    fl = generate(fr, T0, "s", top_n=1)
    fr2 = mark_generated(fr, fl, T0)
    marked = {r.url: r.metadata.get(META_GENERATE_TIME) for r in fr2.collect()}
    gen_url = fl.collect()[0].url
    assert marked[gen_url] == str(T0)
    other = next(u for u in marked if u != gen_url)
    assert marked[other] is None
    # regenerating immediately skips the marked row
    fl2 = generate(fr2, T0 + 1, "s2", top_n=10)
    assert gen_url not in {r.url for r in fl2.collect()}


def test_deterministic_output(spark):
    rows = [(f"http://h{i % 7}.example.com/{i}", i % 13) for i in range(60)]
    a = sorted(r.url for r in generate(frontier(spark, rows), T0, "s", top_n=20).collect())
    b = sorted(r.url for r in generate(frontier(spark, rows), T0, "s", top_n=20).collect())
    assert a == b


def test_scoring_hooks_change_generate_order(spark, t0):
    """A registered non-OPIC scorer (inverted sort value) must actually
    drive generate ordering; the default OPIC hooks preserve the
    score-descending order (round-2: hooks are live, not a dead
    registry)."""
    from dataclasses import replace

    from pyspark.sql import functions as F

    from nutch_spark.functions.scoring import OPIC
    from nutch_spark.operators.generate import generate
    from nutch_spark.operators.inject import inject
    from nutch_spark.synth import WebConfig, seeds_df

    cfg = WebConfig(n_hosts=6, pages_per_host=2, zipf=False)
    fr = inject(spark, None, seeds_df(spark, cfg), t0)
    fr = fr.withColumn(
        "score", (F.xxhash64("url") % 100).cast("float") / 4.0
    )
    inverted = replace(OPIC, generator_sort_value=lambda score: -score)
    top_default = {r.url for r in generate(fr, t0, "s", top_n=3).collect()}
    top_inverted = {
        r.url
        for r in generate(fr, t0, "s", top_n=3, hooks=inverted).collect()
    }
    rows = {r.url: r.score for r in fr.collect()}
    want_default = set(
        sorted(rows, key=lambda u: (-rows[u]))[:3]
    )
    want_inverted = set(sorted(rows, key=lambda u: rows[u])[:3])
    assert top_default == want_default
    assert top_inverted == want_inverted
