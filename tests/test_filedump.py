"""FileDumper / ResolveUrls / DmozParser tools.

Reference: tools/FileDumper.java:140-300, util/DumpFileUtil.java:40-89,
util/TableUtil.java:41-85, tools/ResolveUrls.java:62-137,
tools/DmozParser.java.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from nutch_spark.sources.filedump import (
    dump_path_col,
    file_dump,
    file_dump_stats,
    parse_dmoz,
    resolve_urls,
    reverse_url_col,
)


def _rev(spark, url):
    df = spark.createDataFrame([(url,)], "url string")
    return df.select(reverse_url_col(F.col("url")).alias("r")).collect()[0].r


def test_reverse_url_javadoc_example(spark):
    # TableUtil.java:50-51's own example
    assert (
        _rev(spark, "http://bar.foo.com:8983/to/index.html?a=b")
        == "com.foo.bar:http:8983/to/index.html?a=b"
    )


def test_reverse_url_no_port_no_path(spark):
    assert _rev(spark, "http://bar.foo.com") == "com.foo.bar:http"
    assert _rev(spark, "https://single/") == "single:https/"


def _paths(spark, url, **kw):
    df = spark.createDataFrame([(url,)], "url string")
    return df.select(dump_path_col(F.col("url"), **kw).alias("p")).collect()[0].p


def test_dump_path_two_level_and_flat(spark):
    url = "http://h.example.com/p/00042"
    m = hashlib.md5(url.encode()).hexdigest()
    fname = f"{m}_00042.html"  # no extension → .html default
    assert _paths(spark, url, flat_dir=True) == f"dump/{fname}"
    assert (
        _paths(spark, url)
        == f"dump/{m[0]}{m[8]}/{m[16]}{m[24]}/{fname}"
    )


def test_dump_path_extension_and_truncation(spark):
    url = "http://h.example.com/files/averyveryverylongbasenamethatkeepsgoing.jpeg2000"
    m = hashlib.md5(url.encode()).hexdigest()
    p = _paths(spark, url, flat_dir=True)
    # base ≤ 32 chars, ext ≤ 5 chars (DumpFileUtil.java:73-88)
    assert p == f"dump/{m}_averyveryverylongbasenamethatkee.jpeg2"


def test_dump_path_reverse_url(spark):
    url = "http://bar.foo.com/x/y"
    sha = hashlib.sha256(url.encode()).hexdigest().upper()
    assert (
        _paths(spark, url, reverse_url_dump=True)
        == f"dump/com/foo/bar/{sha}"
    )


def _fetchish(spark):
    rows = [
        ("http://a.com/p1", "text/html; charset=utf-8", "alpha"),
        ("http://a.com/p2.png", "image/png", "beta"),
        ("http://b.com/p3", "application/pdf", "gamma"),
    ]
    return spark.createDataFrame(
        [
            (
                u,
                {"Content-Type": ct},
                [("text", t, None, 0), ("media", None, u + "/m.png", 1)],
            )
            for u, ct, t in rows
        ],
        "url string, metadata map<string,string>, "
        "spans array<struct<kind:string,text:string,media_ref:string,offset:int>>",
    )


def test_file_dump_mime_filter_and_content(spark):
    out = file_dump(_fetchish(spark), mime_types=["text/html", "image/png"])
    got = {r.url: r for r in out.collect()}
    assert set(got) == {"http://a.com/p1", "http://a.com/p2.png"}
    assert got["http://a.com/p1"].mime_type == "text/html"  # params stripped
    # content = raw span sequence: text + media_ref in order
    assert got["http://a.com/p1"].content == "alpha http://a.com/p1/m.png"


def test_file_dump_stats(spark):
    got = {
        r.mime_type: r["count"]
        for r in file_dump_stats(_fetchish(spark)).collect()
    }
    assert got == {"text/html": 1, "image/png": 1, "application/pdf": 1}


def test_resolve_urls(spark):
    urls = spark.createDataFrame(
        [("http://a.com/x",), ("http://b.com/y",), ("http://c.com/z",)],
        "url string",
    )
    out = {
        r.url: (r.address, r.resolved)
        for r in resolve_urls(
            urls, {"a.com": "10.0.0.1", "b.com": "10.0.0.2"}
        ).collect()
    }
    assert out["http://a.com/x"] == ("10.0.0.1", True)
    assert out["http://b.com/y"] == ("10.0.0.2", True)
    assert out["http://c.com/z"] == (None, False)


DMOZ = [
    '<ExternalPage about="http://www.example.com/one"> <topic>Top/Arts</topic>',
    "  <d:Title>irrelevant</d:Title>",
    '<ExternalPage about="http://www.example.org/two"> <topic>Top/Science</topic>',
    '<ExternalPage about="http://www.example.net/three"> <topic>Top/Arts/Music</topic>',
]


def test_parse_dmoz(spark):
    lines = spark.createDataFrame([(l,) for l in DMOZ], "value string")
    got = {r.url for r in parse_dmoz(lines).collect()}
    assert got == {
        "http://www.example.com/one",
        "http://www.example.org/two",
        "http://www.example.net/three",
    }
    arts = {r.url for r in parse_dmoz(lines, topic_pattern="Top/Arts").collect()}
    assert arts == {
        "http://www.example.com/one",
        "http://www.example.net/three",
    }


def test_parse_dmoz_subset_deterministic(spark):
    lines = spark.createDataFrame([(l,) for l in DMOZ], "value string")
    a = {r.url for r in parse_dmoz(lines, subset=2).collect()}
    b = {r.url for r in parse_dmoz(lines, subset=2).collect()}
    assert a == b
    full = {r.url for r in parse_dmoz(lines).collect()}
    assert a <= full


def test_unreverse_url_examples(spark):
    from nutch_spark.sources.filedump import unreverse_url_col

    df = spark.createDataFrame(
        [("com.foo.bar:http:8983/to/index.html?a=b",), ("com.foo.bar:http",)],
        "r string",
    )
    got = [r.u for r in df.select(unreverse_url_col(F.col("r")).alias("u")).collect()]
    assert got == ["http://bar.foo.com:8983/to/index.html?a=b", "http://bar.foo.com"]


def test_reverse_unreverse_roundtrip(spark):
    """unreverse(reverse(url)) == url for URLs with a path component
    (the reference's own domain of validity — a query-only URL folds
    into the protocol token, a documented reference quirk)."""
    from nutch_spark.sources.filedump import reverse_url_col, unreverse_url_col

    urls = [
        "http://bar.foo.com:8983/to/index.html?a=b",
        "http://single/",
        "https://a.b.c.d.example.org/deep/path/x.png",
        "http://h.example.com/p/00042",
        "ftp://files.example.net:2121/pub/data.bin",
        "http://example.com/",
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = [
        r.u
        for r in df.select(
            unreverse_url_col(reverse_url_col(F.col("url"))).alias("u")
        ).collect()
    ]
    assert got == urls
