"""Normalizer/filter plugin parity goldens — cases re-derived from the
reference plugin test semantics (urlnormalizer-regex
TestRegexURLNormalizer + conf/regex-normalize.xml.template,
urlfilter-suffix TestSuffixURLFilter, urlfilter-prefix,
urlfilter-domain TestDomainURLFilter, urlnormalizer-host,
net/URLNormalizers scopes)."""

from __future__ import annotations

import re

import pytest

from nutch_spark.functions.urlplugins import (
    SCOPE_DEFAULT,
    SCOPE_OUTLINK,
    DomainFilter,
    ExemptionRules,
    FilterChain,
    HostNormalizer,
    PrefixFilter,
    RegexNormalizer,
    ScopedNormalizers,
    SuffixFilter,
    ValidatorFilter,
)
from nutch_spark.functions.urls import normalize_url

REGEX_CASES = [
    # session-id strip (rule 1)
    ("http://h.com/p;jsessionid=abc123?q=1", "http://h.com/p?q=1"),
    ("http://h.com/p?PHPSESSID=xyz&a=1", "http://h.com/p?a=1"),
    ("http://h.com/p?a=1&sid=deadbeef", "http://h.com/p?a=1"),
    # interpage anchors (rule 2)
    ("http://h.com/page#anchor", "http://h.com/page"),
    ("http://h.com/page#a?q=1", "http://h.com/page?q=1"),
    # '?&' cleanup + '&&' runs (rules 3-4)
    ("http://h.com/p?&a=1", "http://h.com/p?a=1"),
    ("http://h.com/p?a=1&&&b=2", "http://h.com/p?a=1&b=2"),
    # trailing junk (rule 5)
    ("http://h.com/p?", "http://h.com/p"),
    ("http://h.com/p.", "http://h.com/p"),
    # file scheme + duplicate slashes (rules 6-7)
    ("file:////etc/x", "file:/etc/x"),
    ("http://h.com/a//b///c", "http://h.com/a/b/c"),
    # '://' double slash untouched
    ("http://h.com/", "http://h.com/"),
]


@pytest.mark.parametrize("raw,expected", REGEX_CASES)
def test_regex_normalizer_golden(raw, expected):
    assert RegexNormalizer()(raw) == expected


def test_scoped_chains_fallback_and_loop():
    sn = ScopedNormalizers()
    sn.set_chain(SCOPE_OUTLINK, [RegexNormalizer(), normalize_url])
    # outlink scope: regex rules run, then basic canonicalization
    assert (
        sn.normalize("HTTP://H.com/a//b;jsessionid=q?x=1", SCOPE_OUTLINK)
        == "http://h.com/a/b?x=1"
    )
    # unknown scope falls back to the default chain (basic only)
    assert sn.normalize("HTTP://H.com/a//b", "fetcher") == "http://h.com/a/b"
    assert sn.normalize(None, SCOPE_DEFAULT) is None


def test_scoped_loop_until_fixed_point():
    # urlnormalizer.loop.count: each extra pass re-runs the chain until
    # the URL stops changing; a shrink-by-one rule makes passes visible
    shrink = RegexNormalizer([(r"aaa", "aa")])
    one = ScopedNormalizers(loop_count=1)
    one.set_chain("x", [shrink])
    assert one.normalize("http://h.com/aaaaa", "x") == "http://h.com/aaaa"
    three = ScopedNormalizers(loop_count=3)
    three.set_chain("x", [shrink])
    assert three.normalize("http://h.com/aaaaa", "x") == "http://h.com/aa"


def test_host_normalizer_rules():
    hn = HostNormalizer.from_rules(
        "# comment\nwww.apache.org apache.org\n*.example.org example.org\n"
    )
    assert hn("http://www.apache.org/x?y=1") == "http://apache.org/x?y=1"
    assert hn("https://a.b.example.org/y") == "https://example.org/y"
    assert hn("http://other.com/z") == "http://other.com/z"
    assert hn(None) is None


def test_prefix_filter():
    pf = PrefixFilter.from_rules("# c\nhttp://\nhttps://\n")
    assert pf("http://h.com/")
    assert pf("https://h.com/")
    assert not pf("ftp://h.com/")
    assert not pf(None)


def test_suffix_filter_template_blocklist():
    sf = SuffixFilter.from_rules("+I +P\n.gif\n.png\n")
    assert sf.mode_accept and sf.ignore_case and sf.filter_from_path
    assert not sf("http://h.com/a.gif")
    assert not sf("http://h.com/a.GIF")  # I: case-insensitive
    assert not sf("http://h.com/a.gif?x=1")  # P: match on path only
    assert sf("http://h.com/a.html")
    assert sf("http://h.com/gif")  # no dot — not a suffix match


def test_suffix_filter_allowlist_mode():
    sf = SuffixFilter.from_rules("-\n.html\n")
    assert sf("http://h.com/a.html")
    assert not sf("http://h.com/a.gif")
    # empty list in allowlist mode rejects everything (reference warn)
    assert not SuffixFilter([])("http://h.com/a")


def test_domain_filter_and_blacklist():
    df = DomainFilter(["example0.com", "www.special.net"])
    assert df("http://a.example0.com/x")  # domain listed
    assert df("http://www.special.net/x")  # host listed
    assert not df("http://a.example2.com/x")
    assert DomainFilter([])("http://anything/")  # empty set accepts
    bl = DomainFilter(["bad.com"], blacklist=True)
    assert not bl("http://x.bad.com/")
    assert bl("http://good.com/")


def test_validator_filter():
    vf = ValidatorFilter()
    assert vf("http://h.com/a/b?q=1")
    assert not vf("http://h..com/")
    assert not vf("http://h .com/")
    assert not vf("notaurl")


def test_filter_chain_conjunction(spark):
    chain = FilterChain(
        [
            PrefixFilter(["http://", "https://"]),
            SuffixFilter.from_rules("+I +P\n.gif\n"),
            DomainFilter(["example0.com"]),
        ]
    )
    assert chain("http://a.example0.com/x.html")
    assert not chain("http://a.example0.com/x.gif")
    assert not chain("ftp://a.example0.com/x.html")
    assert not chain("http://a.other.com/x.html")
    # vectorized over a DataFrame
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("http://a.example0.com/x.html",), ("http://a.other.com/x.html",)],
        ["url"],
    )
    got = {r.url: r.ok for r in df.withColumn("ok", chain.udf()(F.col("url"))).collect()}
    assert got == {
        "http://a.example0.com/x.html": True,
        "http://a.other.com/x.html": False,
    }


def test_exemption_bypasses_ignore_external(spark):
    """ParseOutputFormat.java:356-358: exempted targets survive the
    ignore-external drop."""
    from pyspark.sql import functions as F

    from nutch_spark.operators.parse import parse
    from nutch_spark.schema import FETCH_RESULTS
    from tests.test_parse import fetch_result_row, spans_of

    spans = spans_of(
        ("media", "http://h.example.com/in"),
        ("media", "http://cdn.partner.net/asset"),
        ("media", "http://other.net/out"),
    )
    df = spark.createDataFrame(
        [fetch_result_row("http://h.example.com/p", spans)], FETCH_RESULTS
    )
    ex = ExemptionRules([r"://cdn\.partner\.net/"])
    pd_, _ = parse(df, ignore_external=True, exemptions=ex)
    assert [o.to_url for o in pd_.collect()[0].outlinks] == [
        "http://h.example.com/in",
        "http://cdn.partner.net/asset",
    ]


def test_scoped_chain_live_in_parse_and_inject(spark):
    """A registered outlink-scope regex chain strips session ids from
    extracted outlinks end-to-end, and an inject-scope chain rewrites
    seeds — the URLNormalizers scope surface is live, not a registry."""
    from pyspark.sql import Row
    from pyspark.sql import functions as F

    from nutch_spark.operators.inject import inject
    from nutch_spark.operators.parse import parse
    from nutch_spark.schema import FETCH_RESULTS
    from tests.test_parse import fetch_result_row, spans_of

    sn = ScopedNormalizers()
    sn.set_chain(SCOPE_OUTLINK, [RegexNormalizer(), normalize_url])
    sn.set_chain("inject", [RegexNormalizer(), normalize_url])

    spans = spans_of(
        ("media", "http://h.example.com/a;jsessionid=deadbeef"),
        ("media", "http://h.example.com/b"),
    )
    df = spark.createDataFrame(
        [fetch_result_row("http://h.example.com/p", spans)], FETCH_RESULTS
    )
    pd_, _ = parse(df, normalizers=sn)
    assert [o.to_url for o in pd_.collect()[0].outlinks] == [
        "http://h.example.com/a",
        "http://h.example.com/b",
    ]
    # default chain: basic normalize keeps the session id, and the
    # default regex-urlfilter then DROPS the URL (contains '='), so the
    # outlink is lost entirely — the rewrite chain is what saves it
    pd0, _ = parse(df)
    assert [o.to_url for o in pd0.collect()[0].outlinks] == [
        "http://h.example.com/b",
    ]

    seeds = spark.createDataFrame(
        [("HTTP://S.example.com/x;PHPSESSID=1", None)],
        "url string, metadata map<string,string>",
    )
    fr = inject(spark, None, seeds, 1_700_000_000_000, normalizers=sn)
    assert [r.url for r in fr.collect()] == ["http://s.example.com/x"]


def test_filter_chain_live_in_parse_and_inject(spark):
    """A custom FilterChain (domain allowlist) drops outlinks and seeds
    beyond the default regex rules — URLFilters chain is live."""
    from pyspark.sql import functions as F

    from nutch_spark.operators.inject import inject
    from nutch_spark.operators.parse import parse
    from nutch_spark.schema import FETCH_RESULTS
    from tests.test_parse import fetch_result_row, spans_of

    chain = FilterChain([DomainFilter(["example.com"])])
    spans = spans_of(
        ("media", "http://a.example.com/keep"),
        ("media", "http://b.other.net/drop"),
    )
    df = spark.createDataFrame(
        [fetch_result_row("http://h.example.com/p", spans)], FETCH_RESULTS
    )
    pd_, _ = parse(df, url_filters=chain)
    assert [o.to_url for o in pd_.collect()[0].outlinks] == [
        "http://a.example.com/keep"
    ]
    seeds = spark.createDataFrame(
        [("http://s.example.com/x", None), ("http://s.other.net/y", None)],
        "url string, metadata map<string,string>",
    )
    fr = inject(spark, None, seeds, 1_700_000_000_000, url_filters=chain)
    assert [r.url for r in fr.collect()] == ["http://s.example.com/x"]


# --- ajax / protocol / querystring / slash / pass normalizers + rule filter


def test_ajax_normalizer_goldens():
    """TestAjaxURLNormalizer cases verbatim."""
    from nutch_spark.functions.urlplugins import AjaxNormalizer

    n = AjaxNormalizer()
    assert (
        n("http://example.org/#!k=v")
        == "http://example.org/?_escaped_fragment_=k=v"
    )
    assert (
        n("http://example.org/#!k=v&something=is wrong")
        == "http://example.org/?_escaped_fragment_=k=v%26something=is%20wrong"
    )
    assert (
        n("http://example.org/path.html?queryparam=queryvalue#!key1=value1&key2=value2")
        == "http://example.org/path.html?queryparam=queryvalue"
        "&_escaped_fragment_=key1=value1%26key2=value2"
    )
    ix = AjaxNormalizer(indexer=True)
    assert (
        ix("http://example.org/?_escaped_fragment_=key=value")
        == "http://example.org/#!key=value"
    )
    assert (
        ix("http://example.org/?key=value&_escaped_fragment_=key=value")
        == "http://example.org/?key=value#!key=value"
    )
    assert (
        ix("http://example.org/page.html?key=value&_escaped_fragment_=key=value%26something=is%20wrong")
        == "http://example.org/page.html?key=value#!key=value&something=is wrong"
    )
    # no ajax markers → verbatim
    assert n("http://example.org/plain") == "http://example.org/plain"


def test_protocol_normalizer_goldens():
    """TestProtocolURLNormalizer cases."""
    from nutch_spark.functions.urlplugins import ProtocolNormalizer

    n = ProtocolNormalizer.from_rules(
        "example.org http\nexample.net http\n"
        "example.io https\nexample.nl https\n# comment\n"
    )
    assert n("https://example.org/") == "http://example.org/"
    assert n("https://example.net/") == "http://example.net/"
    assert n("https://example.io/") == "https://example.io/"
    assert n("http://example.nl/") == "https://example.nl/"
    # unlisted host → verbatim; query survives the rebuild
    assert n("https://other.com/x?a=1") == "https://other.com/x?a=1"
    assert n("https://example.org/x?a=1") == "http://example.org/x?a=1"


def test_querystring_normalizer_goldens():
    """TestQuerystringURLNormalizer cases verbatim."""
    from nutch_spark.functions.urlplugins import QuerystringNormalizer

    n = QuerystringNormalizer()
    assert n("http://example.com/?c=d&a=b") == "http://example.com/?a=b&c=d"
    assert n("http://example.com/a/b/c") == "http://example.com/a/b/c"
    assert n("http://example.com:1234/a/b/c") == "http://example.com:1234/a/b/c"
    assert (
        n("http://example.com:1234/a/b/c?c=d&a=b#ref")
        == "http://example.com:1234/a/b/c?a=b&c=d#ref"
    )
    assert (
        n("http://example.com/?a=c&c=d&a=b") == "http://example.com/?a=b&a=c&c=d"
    )


def test_slash_normalizer_goldens():
    """TestSlashURLNormalizer cases."""
    from nutch_spark.functions.urlplugins import SlashNormalizer

    n = SlashNormalizer.from_rules(
        "example.org +\nexample.net -\n"
        "www.example.org +\nwww.example.net -\n"
    )
    assert n("http://example.org/") == "http://example.org/"   # root: no-op
    assert n("http://example.net/") == "http://example.net/"
    assert n("http://example.org") == "http://example.org"
    assert (
        n("http://www.example.org/page") == "http://www.example.org/page/"
    )
    assert (
        n("http://www.example.net/path/to/something/")
        == "http://www.example.net/path/to/something"
    )
    assert n("http://example.org/buh/") == "http://example.org/buh/"
    assert n("http://example.net/blaat") == "http://example.net/blaat"
    # unlisted hosts → verbatim
    assert n("http://example.nl/buh/") == "http://example.nl/buh/"
    assert n("http://example.de/blaat") == "http://example.de/blaat"
    # extension suffix blocks slash ADDING only
    assert (
        n("http://example.org/page.html") == "http://example.org/page.html"
    )
    assert n("http://example.org/x?a=1") == "http://example.org/x/?a=1"


def test_pass_normalizer_identity():
    from nutch_spark.functions.urlplugins import pass_normalizer

    assert pass_normalizer("http://x/?weird=yes") == "http://x/?weird=yes"
    assert pass_normalizer(None) is None


def test_regex_rule_filter_first_match_wins():
    """RegexURLFilterBase truth table: first matching rule decides;
    no match rejects (also the automaton plugin's semantics)."""
    from nutch_spark.functions.urlplugins import RegexRuleFilter

    f = RegexRuleFilter.from_rules(
        "# comment\n"
        "-\\.gif$\n"
        "+^https?://([a-z0-9]+\\.)*example\\.com/\n"
        "-.\n"
    )
    assert f("http://www.example.com/page") is True
    assert f("http://www.example.com/img.gif") is False  # earlier - wins
    assert f("http://other.org/") is False
    assert f(None) is False
    # empty rule list rejects everything
    assert RegexRuleFilter([])("http://example.com/") is False


def test_new_normalizers_compose_in_scoped_chain():
    """The new plugins slot into ScopedNormalizers chains like any
    other NormFn, and the chain loop reaches a fixed point."""
    from nutch_spark.functions.urlplugins import (
        AjaxNormalizer,
        QuerystringNormalizer,
    )

    sn = ScopedNormalizers(loop_count=2)
    sn.set_chain(
        SCOPE_OUTLINK,
        [AjaxNormalizer(), QuerystringNormalizer(), normalize_url],
    )
    out = sn.normalize("HTTP://Example.org/#!k=v", SCOPE_OUTLINK)
    assert out == "http://example.org/?_escaped_fragment_=k=v"


# ---------------------------------------------------------------------
# vectorized-path equivalence: chain.apply_series must agree with the
# per-row chain for every member type (the per-rule Series rewrite is
# a pure optimization)
# ---------------------------------------------------------------------


def test_vectorized_normalizer_chain_matches_rowwise():
    import pandas as pd

    from nutch_spark.functions.urlplugins import (
        AjaxNormalizer,
        HostNormalizer,
        ProtocolNormalizer,
        QuerystringNormalizer,
        RegexNormalizer,
        ScopedNormalizers,
        SlashNormalizer,
        SCOPE_OUTLINK,
    )
    from nutch_spark.functions.urls import normalize_url

    sn = ScopedNormalizers(loop_count=2)
    sn.set_chain(
        SCOPE_OUTLINK,
        [
            RegexNormalizer(),
            HostNormalizer(
                {"cdn.example.com": "www.example.com"},
                {"mirror.org": "www.mirror.org"},
            ),
            AjaxNormalizer(),
            ProtocolNormalizer({"secure.example.com": "https"}),
            QuerystringNormalizer(),
            SlashNormalizer({"slash.example.com": True}),
            normalize_url,
        ],
    )
    urls = [
        "http://www.example.com/a?PHPSESSID=deadbeef&x=1",
        "http://cdn.example.com/lib.js?b=2&a=1",
        "http://a.mirror.org/path/",
        "http://www.example.com/page#!state",
        "http://secure.example.com/login",
        "http://slash.example.com/dir",
        "http://host.example.com//double//slash",
        "HTTP://UPPER.example.COM:80/x",
        "not a url",
        None,
        "http://www.example.com/ok/path",
    ]
    s = pd.Series(urls, dtype=object)
    vec = sn.apply_series(s, SCOPE_OUTLINK)
    row = [sn.normalize(u, SCOPE_OUTLINK) for u in urls]
    got = [None if v != v or v is None else v for v in vec.tolist()]
    assert got == row


def test_vectorized_filter_chain_matches_rowwise():
    import pandas as pd

    from nutch_spark.functions.urlplugins import (
        DomainFilter,
        FilterChain,
        PrefixFilter,
        RegexRuleFilter,
        SuffixFilter,
        ValidatorFilter,
    )

    chain = FilterChain(
        [
            PrefixFilter(["http://", "https://"]),
            SuffixFilter([".exe", ".zip"], mode_accept=True,
                         filter_from_path=True, ignore_case=True),
            DomainFilter(["example.com", "co.uk"]),
            ValidatorFilter(),
            RegexRuleFilter([(False, r"forbidden"), (True, r".")]),
        ]
    )
    urls = [
        "http://a.example.com/ok",
        "https://example.com/setup.EXE",
        "http://other.org/x",
        "http://b.example.com/forbidden/path",
        "http://shop.co.uk/item",
        "ftp://example.com/f",
        "http://example.com/sp ace",
        None,
        "",
    ]
    s = pd.Series(urls, dtype=object)
    vec = chain.apply_series(s).tolist()
    row = [chain(u) for u in urls]
    assert vec == row


def test_java_invalid_pattern_stays_on_udf_path(spark):
    """A Python-valid / Java-invalid rule pattern (named group) must
    make the compiled fast path decline — not raise at job execution —
    and the UDF fallback must still decide correctly."""
    import pandas as pd
    import pyspark.sql.functions as F

    from nutch_spark.functions.urlplugins import FilterChain, RegexRuleFilter

    chain = FilterChain(
        [RegexRuleFilter([(True, r"(?P<h>example)\.com")])]
    )
    assert chain.column_or_none(F.col("url")) is None
    # per-row and vectorized paths still work
    assert chain("http://example.com/x") is True
    assert chain("http://other.org/x") is False
    got = chain.apply_series(
        pd.Series(["http://example.com/x", "http://other.org/x"])
    ).tolist()
    assert got == [True, False]
    # and filter_pred end-to-end returns the right rows via the UDF
    from nutch_spark.functions.urlplugins import filter_pred

    df = spark.createDataFrame(
        [("http://example.com/x",), ("http://other.org/x",)], "url string"
    )
    rows = df.filter(filter_pred(chain, F.col("url"))).collect()
    assert [r["url"] for r in rows] == ["http://example.com/x"]


def test_divergent_escapes_screened():
    """Escapes whose Python/Java semantics differ (\\d, \\w, \\Z, …)
    keep the chain on the UDF path; escaped backslashes don't count."""
    import pyspark.sql.functions as F

    from nutch_spark.functions.urlplugins import (
        FilterChain,
        RegexRuleFilter,
        _dialect_divergent,
    )

    assert _dialect_divergent(r"host\d+") is True
    assert _dialect_divergent(r"\w+\.example\.com") is True
    assert _dialect_divergent(r"end\Z") is True
    assert _dialect_divergent(r"literal\\dash") is False  # \\ then 'd'
    assert _dialect_divergent(r"^https?://[a-z0-9.]+/") is False
    chain = FilterChain([RegexRuleFilter([(True, r"host\d+")])])
    assert chain.column_or_none(F.col("url")) is None


def test_java_valid_pattern_still_compiles(spark):
    """The default-rule-style patterns (shared Python∩Java dialect)
    must keep the compiled pure-JVM path and agree with the UDF."""
    import pyspark.sql.functions as F

    from nutch_spark.functions.urlplugins import FilterChain, RegexRuleFilter

    chain = FilterChain(
        [RegexRuleFilter([(False, r"[?*!@=]"), (True, r"^https?://")])]
    )
    col = chain.column_or_none(F.col("url"))
    assert col is not None
    urls = [
        "http://a.com/ok", "https://b.com/x?q=1", "ftp://c.com/y", None,
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = [r[0] for r in df.select(col).collect()]
    assert got == [chain(u) for u in urls]


def test_suffix_column_uppercase_scheme_matches_python(spark):
    """With ignore_case=False the path-extraction gate must still be
    scheme-case-insensitive (it is re.I on the Python paths): an
    uppercase-scheme URL whose PATH ends in a blocked suffix but whose
    full URL does not (query string) must be path-matched identically
    by __call__, series, and the compiled column."""
    import pandas as pd
    import pyspark.sql.functions as F

    from nutch_spark.functions.urlplugins import SuffixFilter

    sf = SuffixFilter([".exe"], mode_accept=True, filter_from_path=True,
                      ignore_case=False)
    urls = [
        "HTTP://HOST.COM/file.exe?x=1",   # path-match → blocked
        "http://host.com/file.exe?x=1",   # control: lowercase scheme
        "http://host.com/page.html?x=1",  # clean → accepted
        "HTTP://HOST.COM/file.EXE?x=1",   # suffix stays case-SENSITIVE
    ]
    want = [False, False, True, True]
    assert [sf(u) for u in urls] == want
    assert sf.series(pd.Series(urls)).tolist() == want
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = [r[0] for r in df.select(sf.column(F.col("url"))).collect()]
    assert got == want


def test_compiled_chain_keeps_parse_fast_path(spark):
    """A filter chain whose members all compile must leave the parse
    plan free of Python stages (no BatchEvalPython/ArrowEvalPython,
    no explode slow path) AND match the pandas-udf path's output."""
    import pyspark.sql.functions as F

    from nutch_spark.functions.urlplugins import DomainFilter, FilterChain
    from nutch_spark.operators.parse import finish_pages
    from nutch_spark.schema import SPAN
    from pyspark.sql import types as T

    base = spark.createDataFrame(
        [
            (
                "http://a.example.com/p/1", "a.example.com", 1.0, "s",
                [], 1, "text here", "sig", ["http://b.example.com/x",
                                            "http://other.org/y"], True,
                None,
            )
        ],
        T.StructType([
            T.StructField("url", T.StringType()),
            T.StructField("host", T.StringType()),
            T.StructField("score", T.FloatType()),
            T.StructField("segment", T.StringType()),
            T.StructField("spans", T.ArrayType(SPAN)),
            T.StructField("fetch_time", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("signature", T.StringType()),
            T.StructField("raw_outlinks", T.ArrayType(T.StringType())),
            T.StructField("is_canonical", T.BooleanType()),
            T.StructField("metadata",
                          T.MapType(T.StringType(), T.StringType())),
        ]),
    )
    def n_python_stages(df):
        plan = df._jdf.queryExecution().executedPlan().toString()
        return plan.count("ArrowEvalPython") + plan.count("BatchEvalPython")

    chain = FilterChain([DomainFilter(["example.com"])])
    out = finish_pages(base, url_filters=chain)
    # the dormant slow branch keeps its normalize_urls stage (the plan
    # is a fast∪slow union), but the COMPILED chain must not add any
    # python stage of its own...
    opaque = FilterChain([lambda u: u is not None and "example.com" in u])
    out_opaque = finish_pages(base, url_filters=opaque)
    assert n_python_stages(out) < n_python_stages(out_opaque)
    # ...and with every outlink canonical, the row must flow through
    # the fast branch with the filter applied in-array
    rows = out.collect()
    assert len(rows) == 1
    kept = [o["to_url"] for o in rows[0]["outlinks"]]
    # domain filter keeps only the example.com outlink
    assert kept == ["http://b.example.com/x"]
    # sanity: the per-row chain agrees
    assert chain("http://b.example.com/x") and not chain("http://other.org/y")


def test_compiled_rules_randomized_parity(spark):
    """Randomized Python/Java dialect parity: rule patterns drawn from
    the shared-safe grammar (literals, classes, quantifiers,
    alternation, anchors — what real rule files use) must decide
    IDENTICALLY on the compiled rlike cascade, the vectorized series
    path, and the per-row chain."""
    import random

    import pandas as pd
    import pyspark.sql.functions as F

    from nutch_spark.functions.urlplugins import FilterChain, RegexRuleFilter

    rng = random.Random(20260818)
    frags = ["http", "https", "host", "example", "com", "org", "p",
             "img", "css", "js", "private", "cgi-bin"]

    def rand_pattern():
        parts = []
        if rng.random() < 0.3:
            parts.append("^")
        for _ in range(rng.randint(1, 3)):
            kind = rng.random()
            if kind < 0.5:
                parts.append(re.escape(rng.choice(frags)))
            elif kind < 0.7:
                parts.append("[a-z0-9]" + rng.choice(["", "+", "*", "?"]))
            elif kind < 0.85:
                parts.append(
                    "(?:%s|%s)" % (rng.choice(frags), rng.choice(frags))
                )
            else:
                parts.append("." + rng.choice(["", "+", "*"]))
        if rng.random() < 0.2:
            parts.append("$")
        return "".join(parts)

    urls = [
        f"{rng.choice(['http', 'https', 'ftp'])}://{rng.choice(frags)}"
        f"{rng.randint(0, 99)}.{rng.choice(['example0.com', 'org'])}/"
        f"{rng.choice(frags)}/{rng.randint(0, 9999)}"
        for _ in range(300)
    ] + [None, ""]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    for _ in range(3):
        rules = [
            (rng.random() < 0.5, rand_pattern()) for _ in range(12)
        ]
        chain = FilterChain([RegexRuleFilter(rules)])
        col = chain.column_or_none(F.col("url"))
        assert col is not None, f"safe-grammar rules must compile: {rules}"
        got = [bool(r[0]) for r in df.select(col).collect()]
        want_series = chain.apply_series(
            pd.Series(urls, dtype=object)
        ).tolist()
        want_rows = [chain(u) for u in urls]
        assert got == want_series == want_rows, f"rules: {rules}"
