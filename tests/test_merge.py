"""CrawlDbMerger / SegmentMerger semantics (CrawlDbMerger.java:75-112,
SegmentMerger.java:126-560)."""

from __future__ import annotations

from pyspark.sql import Row

from nutch_spark.operators.merge import merge_crawldbs, merge_segments
from nutch_spark.schema import FRONTIER


def fr_row(url, fetch_time, score=1.0, status=1, metadata=None):
    return Row(
        url=url, url_hash=hash(url) % (1 << 32), host="h.example.com",
        status=status, fetch_time=fetch_time, retries=0,
        fetch_interval=2_592_000, score=score, signature=None,
        modified_time=0, metadata=metadata,
    )


def test_merge_crawldbs_latest_wins_and_metadata_union(spark):
    a = spark.createDataFrame(
        [
            fr_row("http://x/1", 100, score=1.0, metadata={"k1": "old", "k2": "a"}),
            fr_row("http://x/2", 100),
        ],
        FRONTIER,
    )
    b = spark.createDataFrame(
        [
            fr_row("http://x/1", 200, score=9.0, metadata={"k1": "new", "k3": "b"}),
            fr_row("http://x/3", 50),
        ],
        FRONTIER,
    )
    out = {r.url: r for r in merge_crawldbs([a, b]).collect()}
    assert len(out) == 3
    w = out["http://x/1"]
    assert w.fetch_time == 200 and w.score == 9.0  # latest wins
    # metadata union, newer overrides (CrawlDbMerger.java:97-104)
    assert dict(w.metadata) == {"k1": "new", "k2": "a", "k3": "b"}
    assert out["http://x/2"].fetch_time == 100
    assert out["http://x/3"].fetch_time == 50


def test_merge_segments_latest_generation_and_slicing(spark):
    rows_a = [
        Row(url=f"http://s/{i}", url_hash=i, status=33, fetch_time=100,
            segment="segA")
        for i in range(6)
    ]
    rows_b = [
        Row(url=f"http://s/{i}", url_hash=i, status=33, fetch_time=200,
            segment="segB")
        for i in range(3)
    ]
    a = spark.createDataFrame(rows_a)
    b = spark.createDataFrame(rows_b)
    out = merge_segments([a, b], slice_size=2).collect()
    by_url = {r.url: r for r in out}
    assert len(by_url) == 6
    for i in range(3):  # overlap: latest segment wins
        assert by_url[f"http://s/{i}"].segment == "segB"
    for i in range(3, 6):
        assert by_url[f"http://s/{i}"].segment == "segA"
    # slices: deterministic url_hash order, 2 per slice
    slices = [r.slice for r in sorted(out, key=lambda r: r.url_hash)]
    assert slices == [0, 0, 1, 1, 2, 2]


def test_merge_crawldb_filter_and_renormalize(spark):
    """CrawlDbFilter pass inside the merge: re-normalization collapses
    key variants (latest wins) and the filter chain drops rows
    (crawl/CrawlDbFilter.java:63-107)."""
    from pyspark.sql import functions as F

    from nutch_spark.functions.urlplugins import (
        DomainFilter,
        FilterChain,
        RegexNormalizer,
        ScopedNormalizers,
    )
    from nutch_spark.functions.urls import normalize_url
    from nutch_spark.operators.merge import merge_crawldbs

    a = spark.createDataFrame(
        [fr_row("http://h.example.com/p;jsessionid=x", fetch_time=100),
         fr_row("http://drop.other.net/q", fetch_time=50)],
        FRONTIER,
    )
    b = spark.createDataFrame(
        [fr_row("http://h.example.com/p", fetch_time=200, score=7.0)],
        FRONTIER,
    )
    sn = ScopedNormalizers()
    sn.set_chain("crawldb", [RegexNormalizer(), normalize_url])
    chain = FilterChain([DomainFilter(["example.com"])])
    out = merge_crawldbs([a, b], normalizers=sn, url_filters=chain).collect()
    assert len(out) == 1  # session-id variant collapsed; other.net dropped
    row = out[0]
    assert row.url == "http://h.example.com/p"
    assert row.fetch_time == 200 and row.score == 7.0


def test_generate_adddays(spark, t0):
    """Generator -adddays advances the due clock by N days."""
    from nutch_spark.operators.generate import generate

    future = t0 + 2 * 86_400_000  # due in 2 days
    fr = spark.createDataFrame(
        [fr_row("http://h.example.com/a", fetch_time=future)], FRONTIER
    )
    assert generate(fr, t0, "s", top_n=10).count() == 0
    assert generate(fr, t0, "s", top_n=10, add_days=3).count() == 1


def test_merge_filters_linkdb_and_segments(spark):
    """-filter option on LinkDbMerger and SegmentMerger drops rows
    failing the chain (LinkDbFilter.java; SegmentMerger.java)."""
    from pyspark.sql import Row

    from nutch_spark.functions.urlplugins import DomainFilter, FilterChain
    from nutch_spark.operators.linkdb import merge_linkdbs
    from nutch_spark.operators.merge import merge_segments

    chain = FilterChain([DomainFilter(["example.com"])])
    ldb = spark.createDataFrame(
        [Row(url="http://a.example.com/x",
             inlinks=[Row(from_url="http://s/", anchor="a")]),
         Row(url="http://b.other.net/y",
             inlinks=[Row(from_url="http://s/", anchor="b")])]
    )
    merged = merge_linkdbs(ldb, ldb, url_filters=chain)
    assert [r.url for r in merged.collect()] == ["http://a.example.com/x"]

    seg = spark.createDataFrame(
        [Row(url="http://a.example.com/x", url_hash=1, status=33,
             fetch_time=1, segment="s"),
         Row(url="http://b.other.net/y", url_hash=2, status=33,
             fetch_time=1, segment="s")]
    )
    out = merge_segments([seg], url_filters=chain)
    assert [r.url for r in out.collect()] == ["http://a.example.com/x"]


def test_segment_merge_filter_any_veto(spark):
    """SegmentMergeFilter extension point (SegmentMergeFilter.java /
    SegmentMergeFilters.java:70-85): each filter sees the URL's FULL
    record bundle across all segments; ANY filter returning false
    drops the URL from the merged output entirely — including rows in
    segments that would individually survive."""
    from pyspark.sql import functions as F

    from nutch_spark.operators.merge import (
        MetadataMergeFilter,
        RequireAllSegmentsFilter,
        merge_segments,
    )

    rows_a = [
        ("http://a.com/1", 11, 33, 1000, "segA", {"lang": "en"}),
        ("http://a.com/2", 12, 33, 1000, "segA", {}),
        ("http://a.com/3", 13, 33, 1000, "segA", {"lang": "de"}),
    ]
    rows_b = [
        ("http://a.com/1", 11, 33, 2000, "segB", {}),
        ("http://a.com/3", 13, 33, 2000, "segB", {}),
        ("http://a.com/4", 14, 33, 2000, "segB", {"lang": "en"}),
    ]
    schema = ("url string, url_hash long, status int, fetch_time long,"
              " segment string, metadata map<string,string>")
    sa = spark.createDataFrame(rows_a, schema)
    sb = spark.createDataFrame(rows_b, schema)

    # bundle-level criterion: URL must appear in both segments
    got = merge_segments([sa, sb],
                         merge_filters=[RequireAllSegmentsFilter(2)])
    urls = {r.url for r in got.select("url").collect()}
    assert urls == {"http://a.com/1", "http://a.com/3"}
    # latest-wins still applies to survivors
    seg = {r.url: r.segment for r in got.collect()}
    assert seg == {"http://a.com/1": "segB", "http://a.com/3": "segB"}

    # the filter reads ANY row of the bundle: /1's lang rides only on
    # the segA row, yet the (winning) segB row survives through it
    got2 = merge_segments([sa, sb],
                          merge_filters=[MetadataMergeFilter("lang")])
    urls2 = {r.url for r in got2.select("url").collect()}
    assert urls2 == {"http://a.com/1", "http://a.com/3", "http://a.com/4"}

    # chain is any-veto (AND): both criteria must hold
    got3 = merge_segments(
        [sa, sb],
        merge_filters=[RequireAllSegmentsFilter(2),
                       MetadataMergeFilter("lang", "en")],
    )
    assert {r.url for r in got3.select("url").collect()} == {"http://a.com/1"}

    # plain callables work too
    got4 = merge_segments(
        [sa, sb],
        merge_filters=[lambda key, rows: F.size(rows) >= 2],
    )
    assert {r.url for r in got4.select("url").collect()} == {
        "http://a.com/1", "http://a.com/3"
    }
