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

parse-metatags (MetaTagsParser.java) and headings
(HeadingsParseFilter.java) complete the shipped HtmlParseFilter
family: the synthetic web can emit the HTML head as spans
(WebConfig.meta_spans — kind="meta"/"heading", media_ref = tag name,
text = value), and both filters are pure Column programs over that
span array. Multi-valued Metadata.add values are represented as one
tab-joined string per key (the map column is string-valued); split on
"\t" to recover the value list.
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
class MetaTagsParser:
    """parse-metatags (MetaTagsParser.java:41-124): lift every <meta>
    tag whose lowercased name is configured (or all, with "*") into
    parse metadata under `metatag.<lcname>`; general and http-equiv
    tags get identical treatment (filter(), :99-123), and parse
    metadata already collected by EARLIER chain members is mirrored
    under the prefix too (the tika-compat loop, :105-108). Repeated
    tag names append (Metadata.add) — represented here as one
    tab-joined value string per key.

    Dynamic-keyed: tag names are data, so this filter contributes a
    `dynamic_entries` array<struct<key,value>> Column (assembled with
    JVM higher-order functions) instead of literal-keyed entries."""

    names: tuple[str, ...] = ("*",)

    def dynamic_entries(self, text: Column, html: Column, spans: Column,
                        existing: dict[str, Column]) -> Column:
        star = "*" in self.names
        nameset = tuple(n.lower() for n in self.names)
        metas = F.filter(
            spans,
            lambda s: (s["kind"] == F.lit("meta"))
            & s["media_ref"].isNotNull()
            & s["text"].isNotNull(),
        )
        span_entries = F.transform(
            metas,
            lambda s: F.struct(
                F.lower(s["media_ref"]).alias("k"), s["text"].alias("v")
            ),
        )
        # existing parse metadata first (reference iterates
        # metadata.names() before the tag maps)
        mirrored = []
        for k, v in existing.items():
            lk = k.lower()
            if star or lk in nameset:
                mirrored.append(
                    F.array(F.struct(F.lit(lk).alias("k"), v.alias("v")))
                )
        all_e = (
            F.concat(*mirrored, span_entries) if mirrored else span_entries
        )
        all_e = F.filter(all_e, lambda e: e["v"].isNotNull())
        if not star:
            all_e = F.filter(all_e, lambda e: e["k"].isin(*nameset))
        keys = F.array_distinct(F.transform(all_e, lambda e: e["k"]))
        return F.transform(
            keys,
            lambda n: F.struct(
                F.concat(F.lit("metatag."), n).alias("key"),
                F.array_join(
                    F.transform(
                        F.filter(all_e, lambda e: e["k"] == n),
                        lambda e: e["v"],
                    ),
                    "\t",
                ).alias("value"),
            ),
        )


@dataclass(frozen=True)
class HeadingsParseFilter:
    """headings plugin (HeadingsParseFilter.java:46-68): for each
    configured heading tag (case-insensitive element match,
    :87-106), record its whitespace-collapsed text (whitespacePattern
    \\s+ → " ", trimmed) in parse metadata under the tag name. With
    headings.multivalued=false (the default) only the FIRST element of
    each tag is taken (:97-101 break); true keeps all, tab-joined.
    Empty headings are skipped (:58-62); a tag with no match
    contributes no entry (Metadata.add never ran)."""

    headings: tuple[str, ...] = ("h1", "h2")
    multivalued: bool = False

    wants_spans = True

    def entries(self, text: Column, html: Column,
                spans: Column) -> dict[str, Column]:
        out: dict[str, Column] = {}
        for tag in self.headings:
            lt = tag.lower()
            hs = F.filter(
                spans,
                lambda s: (s["kind"] == F.lit("heading"))
                & (F.lower(s["media_ref"]) == F.lit(lt)),
            )
            vals = F.transform(
                hs,
                lambda s: F.trim(
                    F.regexp_replace(s["text"], r"\s+", " ")
                ),
            )
            vals = F.filter(
                vals, lambda v: v.isNotNull() & (F.length(v) > 0)
            )
            picked = (
                F.array_join(vals, "\t")
                if self.multivalued
                else F.element_at(vals, 1)
            )
            out[tag] = F.when(F.size(vals) > 0, picked).otherwise(
                F.lit(None).cast("string")
            )
        return out


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
        spans = F.col(spans_col)
        html = raw_content_col(spans)
        entries: dict[str, Column] = {}
        dynamic: list[Column] = []  # array<struct<key,value>> per filter
        for f in self.filters:
            if hasattr(f, "transform"):
                parse_data = f.transform(parse_data, text, html)
            elif hasattr(f, "dynamic_entries"):
                # data-dependent keys (parse-metatags); sees the
                # entries accumulated so far, in chain order
                dynamic.append(
                    f.dynamic_entries(text, html, spans, dict(entries))
                )
            elif getattr(f, "wants_spans", False):
                entries.update(f.entries(text, html, spans))
            else:
                entries.update(f.entries(text, html))  # later wins
        if not entries and not dynamic:
            return parse_data.withColumn(
                out_col, F.lit(None).cast("map<string,string>")
            )
        if entries:
            m = F.create_map(
                *_chain.from_iterable(
                    (F.lit(k), v) for k, v in entries.items()
                )
            )
            # a null value means the filter recorded nothing for the
            # field (e.g. a heading tag with no element) — absent, not
            # null, like the reference's Metadata
            m = F.map_filter(m, lambda k, v: v.isNotNull())
        else:
            m = F.create_map().cast("map<string,string>")
        for d in dynamic:
            # keys are disjoint by construction (dynamic filters prefix
            # theirs, e.g. "metatag."); map_concat raises on overlap
            # under Spark's default dedup policy, surfacing a
            # misconfigured chain instead of silently dropping a value
            m = F.map_concat(m, F.map_from_entries(d))
        return parse_data.withColumn(out_col, m)
