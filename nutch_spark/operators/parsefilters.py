"""HtmlParseFilter chain — the reference's parse-filter extension
point, with the parsefilter-regex plugin.

Reference: parse/HtmlParseFilter.java + parse/HtmlParseFilters.java
(filters run in registration order over each ParseResult; each may
read the raw content and the extracted text and write parse-metadata
fields), and src/plugin/parsefilter-regex/.../RegexParseFilter.java:
61-96, 170-189 — a rule table `field \\t source \\t regex` (source ∈
{html, text}; `#` comments) where each field is set to "true"/"false"
by an unanchored regex find over the chosen source
(matches(), RegexParseFilter.java:161-168).

Spark-first shape: the whole chain is ONE map-side Column program —
each rule is a `rlike` over the text column (or the reconstructed raw
span content for source=html), folded into a single `parse_meta`
map<string,string> literal-keyed create_map. No shuffle, no UDF; at
any scale the chain costs nothing beyond the parse scan it rides on.

"html" source maps to the raw span content (the engine's Content
bytes analogue: every span's text or media_ref in document order),
"text" to the extracted text column — mirroring how the reference
filter regexes the raw `content.getContent()` vs `parse.getText()`.

parsefilter-naivebayes (NaiveBayesParseFilter.java) is the chain's
trainable member: it classifies each page's extracted text with the
two-class model in functions/naivebayes.py and, for an IRRELEVANT
page, drops every outlink whose URL contains no wordlist word
(containsWord, NaiveBayesParseFilter.java:100-108; outlink rewrite
:155-195). It is a `transform`-style chain member — it rewrites the
outlinks column rather than contributing parse_meta fields — and runs
as a pure Column program (model tables as map literals).

Out of scope (documented): parse-metatags and headings operate on
HTML meta/hN tags that the synthetic span documents do not carry.
"""

from __future__ import annotations

from dataclasses import dataclass
from itertools import chain as _chain
from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def raw_content_col(spans: Column) -> Column:
    """The document's raw source, reconstructed from its span sequence
    in order (text spans verbatim, media spans as their media_ref) —
    the stand-in for Content.getContent() on synthetic documents."""
    return F.array_join(
        F.transform(spans, lambda s: F.coalesce(s["text"], s["media_ref"])),
        " ",
    )


def parse_rules(text: str) -> list[tuple[str, str, str]]:
    """Parse the reference's rule-file format (`field \\t source \\t
    regex`, blank lines and `#` comments skipped —
    RegexParseFilter.readConfiguration, RegexParseFilter.java:170-189).
    """
    rules: list[tuple[str, str, str]] = []
    for line in text.splitlines():
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        parts = line.split("\t")
        if len(parts) < 3:
            raise ValueError(f"malformed parsefilter-regex rule: {line!r}")
        field, source, regex = (p.strip() for p in parts[:3])
        if source.lower() not in ("html", "text"):
            raise ValueError(f"source must be html|text, got {source!r}")
        rules.append((field, source.lower(), regex))
    return rules


@dataclass(frozen=True)
class RegexParseFilter:
    """parsefilter-regex: each rule sets parse_meta[field] =
    'true'/'false' by unanchored regex find over the chosen source."""

    rules: tuple[tuple[str, str, str], ...]

    @classmethod
    def from_text(cls, text: str) -> "RegexParseFilter":
        return cls(tuple(parse_rules(text)))

    def entries(self, text: Column, html: Column) -> dict[str, Column]:
        out: dict[str, Column] = {}
        for field, source, regex in self.rules:
            src = html if source == "html" else text
            out[field] = F.when(
                F.coalesce(src, F.lit("")).rlike(regex), F.lit("true")
            ).otherwise(F.lit("false"))
        return out


@dataclass(frozen=True)
class NaiveBayesParseFilter:
    """parsefilter-naivebayes: classify the page text; an irrelevant
    page keeps only wordlist-matching outlinks (substring contains,
    like the reference's containsWord)."""

    model: object  # functions.naivebayes.NaiveBayesModel
    wordlist: tuple[str, ...] = ()

    @classmethod
    def from_training(
        cls, lines: list[str], wordlist: Sequence[str]
    ) -> "NaiveBayesParseFilter":
        from ..functions.naivebayes import train

        return cls(model=train(lines), wordlist=tuple(wordlist))

    def url_listed(self, url: Column) -> Column:
        out = F.lit(False)
        for w in self.wordlist:
            out = out | url.contains(w)
        return out

    def transform(
        self, parse_data: DataFrame, text: Column, html: Column
    ) -> DataFrame:
        from ..functions.naivebayes import relevant_col

        keep_all = relevant_col(self.model, text)
        filtered = F.filter(
            F.col("outlinks"), lambda o: self.url_listed(o["to_url"])
        )
        return parse_data.withColumn(
            "outlinks",
            F.when(keep_all, F.col("outlinks")).otherwise(filtered),
        )


@dataclass(frozen=True)
class ParseFilterChain:
    """HtmlParseFilters: filters run in registration order; a filter
    either contributes parse-metadata entries (`entries`, later fields
    overwrite earlier — the reference's Metadata.set replaces) or
    rewrites the parse rows (`transform`, e.g. naivebayes dropping
    outlinks)."""

    filters: tuple = ()

    def apply(
        self,
        parse_data: DataFrame,
        text_col: str = "text",
        spans_col: str = "spans",
        out_col: str = "parse_meta",
    ) -> DataFrame:
        text = F.col(text_col)
        html = raw_content_col(F.col(spans_col))
        entries: dict[str, Column] = {}
        for f in self.filters:
            if hasattr(f, "transform"):
                parse_data = f.transform(parse_data, text, html)
            else:
                entries.update(f.entries(text, html))  # later wins
        if not entries:
            return parse_data.withColumn(
                out_col, F.lit(None).cast("map<string,string>")
            )
        return parse_data.withColumn(
            out_col,
            F.create_map(
                *_chain.from_iterable(
                    (F.lit(k), v) for k, v in entries.items()
                )
            ),
        )
