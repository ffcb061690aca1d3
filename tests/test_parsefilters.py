"""HtmlParseFilter chain + parsefilter-regex.

Reference: parse/HtmlParseFilters.java (ordered chain over parse
results), src/plugin/parsefilter-regex/.../RegexParseFilter.java and
its TestRegexParseFilter (positive + negative rule cases over html vs
text sources).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nutch_spark.operators.parse import parse
from nutch_spark.operators.parsefilters import (
    ParseFilterChain,
    RegexParseFilter,
    parse_rules,
    raw_content_col,
)
from nutch_spark.schema import FETCH_RESULTS
from tests.test_parse import fetch_result_row, spans_of


RULES = (
    "# mirrors the reference's regex-parsefilter.txt sample\n"
    "first\thtml\th1\n"
    "second\ttext\tblablabla\n"
)


def test_parse_rules_format():
    assert parse_rules(RULES) == [
        ("first", "html", "h1"),
        ("second", "text", "blablabla"),
    ]
    with pytest.raises(ValueError):
        parse_rules("only_two_fields\ttext")
    with pytest.raises(ValueError):
        parse_rules("f\tbody\tregex")  # source must be html|text


def _apply(spark, chain, text, spans):
    df = spark.createDataFrame(
        [(text, spans)],
        "text string, spans array<struct<kind:string,text:string,media_ref:string,offset:int>>",
    )
    return chain.apply(df).collect()[0].parse_meta


def test_regex_filter_positive_and_negative(spark):
    """TestRegexParseFilter.testPositiveFilter/testNegativeFilter: the
    html-source rule sees the raw span content, the text-source rule
    the extracted text; misses set the field to 'false', not null."""
    chain = ParseFilterChain((RegexParseFilter.from_text(RULES),))
    # positive: raw content contains 'h1', text contains 'blablabla'
    meta = _apply(
        spark, chain,
        "nutch this is the extracted text blablabla",
        [("text", "nutch h1 this is the extracted text blablabla", None, 0)],
    )
    assert meta == {"first": "true", "second": "true"}
    # negative: h2 instead of h1, 'bla' shorter than 'blablabla'
    meta = _apply(
        spark, chain,
        "nutch this is the extracted text bla",
        [("text", "nutch h2 this is the extracted text no bla", None, 0)],
    )
    assert meta == {"first": "false", "second": "false"}


def test_html_source_includes_media_refs(spark):
    """raw_content_col reconstructs the document source: media spans
    contribute their media_ref, in span order."""
    df = spark.createDataFrame(
        [([("text", "intro", None, 0), ("media", None, "http://m/x.png", 1),
           ("text", "outro", None, 2)],)],
        "spans array<struct<kind:string,text:string,media_ref:string,offset:int>>",
    )
    got = df.select(raw_content_col(F.col("spans")).alias("raw")).collect()[0].raw
    assert got == "intro http://m/x.png outro"


def test_chain_later_filter_overwrites(spark):
    """HtmlParseFilters order: a later filter's field replaces an
    earlier one's (Metadata.set semantics)."""
    f1 = RegexParseFilter((("flag", "text", "alpha"),))
    f2 = RegexParseFilter((("flag", "text", "zzz-never"), ("own", "text", "alpha")))
    meta = _apply(
        spark, ParseFilterChain((f1, f2)), "alpha beta",
        [("text", "alpha beta", None, 0)],
    )
    assert meta == {"flag": "false", "own": "true"}  # f2 won on 'flag'


def test_empty_chain_yields_null_map(spark):
    meta = _apply(
        spark, ParseFilterChain(()), "x", [("text", "x", None, 0)]
    )
    assert meta is None


def test_parse_filters_through_parse(spark):
    """e2e: parse(..., parse_filters=...) adds parse_meta to
    parse_data; the html rule sees href tokens that the text rule
    cannot (extracted text strips them)."""
    chain = ParseFilterChain(
        (
            RegexParseFilter(
                (
                    ("links_out", "html", r"href:http://"),
                    ("text_has_href", "text", r"href:http://"),
                    ("topic", "text", r"alpha"),
                )
            ),
        )
    )
    df = spark.createDataFrame(
        [
            fetch_result_row(
                "http://h.example.com/p",
                spans_of(("text", "alpha beta href:http://h.example.com/x")),
            )
        ],
        FETCH_RESULTS,
    )
    pd_, _ = parse(df, parse_filters=chain)
    row = pd_.collect()[0]
    assert row.parse_meta == {
        "links_out": "true",       # raw span content keeps the href
        "text_has_href": "false",  # extracted text strips it
        "topic": "true",
    }


def test_parse_meta_feeds_index_metadata_plugin(spark):
    """The chain's output is the parse_meta map the index-metadata
    plugin (MetadataFields) lifts into document fields."""
    from nutch_spark.operators.indexplugins import MetadataFields

    chain = ParseFilterChain(
        (RegexParseFilter((("is_alpha", "text", "alpha"),)),)
    )
    df = spark.createDataFrame(
        [
            fetch_result_row(
                "http://h.example.com/p", spans_of(("text", "alpha"))
            )
        ],
        FETCH_RESULTS,
    )
    pd_, _ = parse(df, parse_filters=chain)
    out = MetadataFields(parse_md=("is_alpha",))(pd_)
    assert out.collect()[0].is_alpha == "true"


# ---------------------------------------------------------------------
# parse-metatags (MetaTagsParser.java) + headings
# (HeadingsParseFilter.java) over WebConfig.meta_spans head spans
# ---------------------------------------------------------------------

def _meta_spans():
    return [
        ("meta", "This is a test of description", "description", 0),
        ("meta", "web crawler", "keywords", 1),
        ("meta", "Webcrawler", "keywords", 2),
        ("meta", "Doug Cutting", "DC.creator", 3),
        ("meta", "Michael Cafarella", "DC.creator", 4),
        ("meta", "300", "refresh", 5),  # http-equiv, same treatment
        ("heading", "  This is   a head1  ", "h1", 6),
        ("heading", "second head1", "h1", 7),
        ("heading", "head2\tvalue", "h2", 8),
        ("heading", "   ", "h3", 9),  # whitespace-only → skipped
    ]


def test_metatags_defaults_take_everything(spark):
    """TestMetatagParser.testIt: default metatags.names=* lifts every
    tag, lowercased, under metatag.; repeated names append."""
    from nutch_spark.operators.parsefilters import MetaTagsParser

    meta = _apply(spark, ParseFilterChain((MetaTagsParser(),)),
                  "text", _meta_spans())
    assert meta["metatag.description"] == "This is a test of description"
    assert set(meta["metatag.keywords"].split("\t")) == {
        "web crawler", "Webcrawler"
    }
    assert set(meta["metatag.dc.creator"].split("\t")) == {
        "Doug Cutting", "Michael Cafarella"
    }
    assert meta["metatag.refresh"] == "300"
    assert "metatag.h1" not in meta  # headings are not meta tags


def test_metatags_configured_subset(spark):
    """TestMetatagParser.testMultiValueMetatags: metatags.names =
    keywords,DC.creator keeps exactly those (name match ignoring
    case), multi-valued."""
    from nutch_spark.operators.parsefilters import MetaTagsParser

    meta = _apply(
        spark,
        ParseFilterChain((MetaTagsParser(("keywords", "DC.creator")),)),
        "text", _meta_spans(),
    )
    assert set(meta) == {"metatag.keywords", "metatag.dc.creator"}
    assert set(meta["metatag.dc.creator"].split("\t")) == {
        "Doug Cutting", "Michael Cafarella"
    }


def test_metatags_mirrors_earlier_chain_metadata(spark):
    """MetaTagsParser.java:105-108: parse metadata collected BEFORE
    this filter runs (the tika-compat loop) is mirrored under the
    metatag. prefix — so chain order is observable."""
    from nutch_spark.operators.parsefilters import MetaTagsParser

    regex = RegexParseFilter.from_text("first\ttext\tblabla\n")
    before = _apply(
        spark, ParseFilterChain((regex, MetaTagsParser())),
        "has blabla", _meta_spans(),
    )
    assert before["first"] == "true"
    assert before["metatag.first"] == "true"  # mirrored
    after = _apply(
        spark, ParseFilterChain((MetaTagsParser(), regex)),
        "has blabla", _meta_spans(),
    )
    assert after["first"] == "true"
    assert "metatag.first" not in after  # ran before the regex filter


def test_headings_first_only_and_multivalued(spark):
    """HeadingsParseFilter.java:97-101: multivalued=false takes the
    FIRST element per configured tag; whitespace collapsed
    (whitespacePattern); a tag with no (non-empty) element contributes
    no entry."""
    from nutch_spark.operators.parsefilters import HeadingsParseFilter

    meta = _apply(
        spark,
        ParseFilterChain((HeadingsParseFilter(("h1", "h2", "h3", "h4")),)),
        "text", _meta_spans(),
    )
    assert meta["h1"] == "This is a head1"  # first only, collapsed
    assert meta["h2"] == "head2 value"  # tab collapsed to one space
    assert "h3" not in meta  # whitespace-only heading skipped
    assert "h4" not in meta  # absent tag → absent key

    multi = _apply(
        spark,
        ParseFilterChain((HeadingsParseFilter(("h1",), multivalued=True),)),
        "text", _meta_spans(),
    )
    assert multi["h1"].split("\t") == ["This is a head1", "second head1"]


def test_metatags_headings_through_parse_and_indexer(spark):
    """The full path: synthetic meta_spans web → fetch/parse with the
    chain → parse_meta fields → index-metadata lifts metatag.* into
    index fields (the reference's 'indexed with index-metadata'
    contract, MetaTagsParser.java class doc)."""
    from nutch_spark.operators.fetch import fetch
    from nutch_spark.operators.generate import generate
    from nutch_spark.operators.inject import inject
    from nutch_spark.operators.parsefilters import (
        HeadingsParseFilter,
        MetaTagsParser,
    )
    from nutch_spark.synth import WebConfig, robots_rows, seeds_df

    T0 = 1_700_000_000_000
    web = WebConfig(n_hosts=3, pages_per_host=4, zipf=False,
                    meta_spans=True)
    robots = {r["host"]: r for r in robots_rows(web)}
    fr = inject(spark, None, seeds_df(spark, web), T0)
    fl = generate(fr, T0 + 1, "s1", top_n=50)
    res = fetch(fl, robots, web, T0 + 1).localCheckpoint()
    chain = ParseFilterChain((MetaTagsParser(), HeadingsParseFilter()))
    pd_, _cp = parse(res, parse_filters=chain)
    rows = pd_.filter(F.col("is_canonical")).select(
        "url", "parse_meta").collect()
    assert rows
    for r in rows:
        assert "metatag.description" in r.parse_meta
        assert "metatag.keywords" in r.parse_meta
        assert r.parse_meta.get("h1", "").strip() == r.parse_meta.get("h1", "")
        assert "h1" in r.parse_meta
    # meta spans are inert to text/outlinks: extracted text never
    # contains the description value, and no outlink is a tag name
    texts = pd_.filter(F.col("is_canonical")).select("text").collect()
    assert all("all about" not in t.text for t in texts)

    # index-metadata lift (MetadataFields ≙ index.parse.md config)
    from nutch_spark.operators.indexplugins import MetadataFields

    lifted = MetadataFields(parse_md=("metatag.keywords", "h1"))(
        pd_.filter(F.col("is_canonical"))
    )
    got = lifted.select("url", "`metatag.keywords`", "h1").collect()
    assert got and all(r["metatag.keywords"] for r in got)
    assert all(r["h1"] for r in got)
