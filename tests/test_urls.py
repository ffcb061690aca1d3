"""URL normalization + filter goldens.

Cases from the reference test suite semantics
(src/test/org/apache/nutch/net/TestURLNormalizers.java, plugin
urlnormalizer-basic TestBasicURLNormalizer cases, conf/regex-urlfilter
.txt.template) — re-derived, not copied.
"""

from __future__ import annotations

import pytest

from nutch_spark.functions.urls import (
    accept_url,
    get_domain,
    get_host,
    normalize_url,
)

NORM_CASES = [
    # FIXTURES.md §G golden
    ("HTTP://Foo.COM:80/a/../b/./c//d#frag", "http://foo.com/b/c/d"),
    ("http://foo.com", "http://foo.com/"),
    ("http://foo.com:80/", "http://foo.com/"),
    ("https://foo.com:443/x", "https://foo.com/x"),
    ("http://foo.com:8080/x", "http://foo.com:8080/x"),
    ("http://foo.com/%7Euser", "http://foo.com/~user"),
    ("http://foo.com/%66oo", "http://foo.com/foo"),  # unreserved unescaped
    ("http://foo.com/a b", "http://foo.com/a%20b"),  # space escaped
    ("http://foo.com/a/./b", "http://foo.com/a/b"),
    ("http://foo.com/a//b", "http://foo.com/a/b"),
    ("http://foo.com/a/../../b", "http://foo.com/b"),
    ("http://foo.com/path/", "http://foo.com/path/"),  # trailing slash kept
    ("http://foo.com/?q", "http://foo.com/?q"),
    ("http://FOO.com/BAR", "http://foo.com/BAR"),  # path case preserved
    ("http://foo.com:080/x", "http://foo.com/x"),  # leading-zero port not identity
]


@pytest.mark.parametrize("raw,expected", NORM_CASES)
def test_normalize_golden(raw, expected):
    assert normalize_url(raw) == expected


def test_normalize_idempotent():
    for raw, expected in NORM_CASES:
        assert normalize_url(expected) == expected


def test_normalize_unparseable():
    assert normalize_url("not a url") is None
    assert normalize_url("http://") is None


FILTER_CASES = [
    ("http://foo.com/page.html", True),
    ("file:///etc/passwd", False),
    ("ftp://foo.com/x", False),
    ("mailto:a@b.com", False),
    ("http://foo.com/image.GIF", False),
    ("http://foo.com/archive.zip", False),
    ("http://foo.com/a?b=c", False),  # query chars rejected by default rules
    ("http://foo.com/x/y/x/y/x/y/", False),  # loop trap
    ("http://foo.com/a/b/c", True),
]


@pytest.mark.parametrize("url,ok", FILTER_CASES)
def test_filter_default_rules(url, ok):
    assert accept_url(url) is ok


def test_vectorized_matches_scalar(spark):
    """pandas-UDF path must agree with the scalar reference fn."""
    from pyspark.sql import functions as F

    from nutch_spark.functions.urls import accept_urls, normalize_urls

    raws = [c[0] for c in NORM_CASES] + [c[0] for c in FILTER_CASES]
    df = spark.createDataFrame([(u,) for u in raws], "url string")
    rows = df.select(
        "url",
        normalize_urls(F.col("url")).alias("norm"),
        accept_urls(F.col("url")).alias("ok"),
    ).collect()
    for r in rows:
        assert r.norm == normalize_url(r.url), r.url
        assert r.ok == accept_url(r.url), r.url


def test_host_domain():
    assert get_host("http://Foo.COM:8080/x") == "foo.com"
    assert get_host("http://user@foo.com/x") == "foo.com"
    assert get_domain("a.b.example.com") == "example.com"
    assert get_domain("example.co.uk") == "example.co.uk"
    assert get_domain("www.example.co.uk") == "example.co.uk"


def test_leading_zero_port_not_canonical(spark):
    """Regression (round-2 ADVICE): http://h:080/ passed the JVM
    is_canonical fast path while the pandas normalizer rewrites it to
    http://h/ — the same page could exist under two spellings. The fast
    path must be a strict subset of normalize-identity URLs."""
    from pyspark.sql import functions as F

    from nutch_spark.functions.urls import with_normalized

    df = spark.createDataFrame(
        [("http://foo.com:080/x",), ("http://foo.com:8080/x",)], ["u"]
    )
    got = {
        r.u: r.n for r in with_normalized(df, "u", "n").collect()
    }
    assert got["http://foo.com:080/x"] == "http://foo.com/x"
    assert got["http://foo.com:8080/x"] == "http://foo.com:8080/x"
