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
