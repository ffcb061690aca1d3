"""IndexingFilter plugin chain — the reference's index-time document
transforms re-expressed as Column programs over the document DataFrame.

Reference surface (one class per plugin):
  index-basic    BasicIndexingFilter.java:  host/domain/url/content/
                 title(maxlen)/tstamp fields, repr-URL substitution
  index-more     MoreIndexingFilter.java:   contentType + primary/sub
                 split, contentLength, lastModified/date
  index-static   StaticFieldIndexer.java:   literal field:value adds
  index-metadata MetadataIndexer.java:      lift parse/content/db
                 metadata keys into fields
  urlmeta        URLMetaIndexingFilter.java: lift db-datum tag keys
  tld            TLDIndexingFilter.java:    top-level-domain field
  subcollection  Subcollection.java + SubcollectionIndexingFilter.java:
                 substring white/black lists -> collection tags
  index-replace  ReplaceIndexer.java:       regexp field rewrites with
                 hostmatch/urlmatch scoping
  mimetype-filter MimeTypeIndexingFilter.java: keep/drop whole docs by
                 content-type prefix match (trie), accept/deny mode
  index-links    LinksIndexingFilter.java:  inlinks/outlinks fields,
                 outside-host-only option
  language-identifier LanguageIndexingFilter.java: `lang` field
  index-anchor   AnchorIndexingFilter.java: deduped inlink anchors
                 (done at join time in index_documents)

Chain semantics (IndexingFilters.java:41-51): filters run in order,
each may add/modify fields or return null to drop the document. Here
each filter is a DataFrame -> DataFrame function (Column-only — no
Python row path), a drop is a `.filter()`, and the chain is function
composition, so Catalyst sees ONE projection over the scan and the
whole chain collapses into the same whole-stage-codegen span as the
indexing join itself. At 100 TB nothing here adds a shuffle: every
filter is row-local.

The document DataFrame is `operators.index.index_documents` output:
  url, title, text, anchors, boost, db_fetch_time, db_signature,
  segment, and (when index_documents is given the extra inputs)
  content_meta:map, db_meta:map, db_modified_time, outlinks_urls,
  inlink_urls.
Filters write the reference's field names (`host`, `content`,
`tstamp`, `type`, ...) as new columns.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field
from typing import Callable, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.urls import _TWO_LEVEL_SUFFIXES, domain_col, host_of

IndexingFilter = Callable[[DataFrame], DataFrame]


def _meta(col_name: str, key: str) -> Column:
    return F.element_at(
        F.coalesce(
            F.col(col_name), F.create_map().cast("map<string,string>")
        ),
        key,
    )


@dataclass(frozen=True)
class BasicFields:
    """index-basic (BasicIndexingFilter.java:58-103): host from the
    repr URL when one was recorded (redirects), `url` field = repr URL,
    `content` = parse text truncated to max_content_length, `title`
    truncated to max_title_length and NOT set when empty (NUTCH-1004),
    `tstamp` = fetch time, optional registered `domain`."""

    max_title_length: int = 100
    max_content_length: int = -1
    add_domain: bool = False

    def __call__(self, df: DataFrame) -> Column:
        repr_url = (
            _meta("db_meta", "_repr_")
            if "db_meta" in df.columns
            else F.lit(None).cast("string")
        )
        doc_url = F.coalesce(repr_url, F.col("url"))
        out = df.withColumn("doc_url", doc_url).withColumn(
            "host", host_of(F.col("doc_url"))
        )
        if self.add_domain:
            out = out.withColumn("domain", domain_col(F.col("host")))
        content = F.coalesce(F.col("text"), F.lit(""))
        if self.max_content_length > -1:
            content = F.substring(content, 1, self.max_content_length)
        title = F.coalesce(F.col("title"), F.lit(""))
        if self.max_title_length > -1:
            title = F.substring(title, 1, self.max_title_length)
        return (
            out.withColumn("content", content)
            .withColumn(
                "title", F.when(F.length(title) > 0, title)
            )  # empty title -> null (not indexed)
            .withColumn("tstamp", F.col("db_fetch_time").cast("long"))
        )


# HTTP-date (RFC 1123) parsing for Last-Modified. The reference
# (MoreIndexingFilter.getTime) tries HttpDateFormat then 23 fallback
# patterns; the synthetic web only emits RFC 1123 GMT so one pattern
# suffices — additional patterns would chain the same way with
# coalesce(to_timestamp(...), ...).
def _http_date_ms(col: Column) -> Column:
    # Spark >= 3 refuses day-of-week ('EEE') in parse patterns, so drop
    # the "Tue, " prefix and " GMT" suffix before to_timestamp (the
    # session timezone is UTC — session.py pins it).
    stripped = F.regexp_replace(col, r"(^[A-Za-z]{3}, )|( GMT$)", "")
    ts = F.to_timestamp(stripped, "dd MMM yyyy HH:mm:ss")
    return (F.unix_timestamp(ts) * 1000).cast("long")


@dataclass(frozen=True)
class MoreFields:
    """index-more (MoreIndexingFilter.java): `type`/`primary_type`/
    `sub_type` from the fetch datum's Content-Type (db/fetch metadata
    first, then content metadata — MoreIndexingFilter.addType), trimmed
    `content_length`, parsed `last_modified`, and `date` =
    lastModified ?: modifiedTime ?: fetchTime (addTime)."""

    def __call__(self, df: DataFrame) -> Column:
        ctype_src = _meta("content_meta", "Content-Type")
        ctype = F.lower(F.trim(F.substring_index(ctype_src, ";", 1)))
        clen = F.trim(_meta("content_meta", "Content-Length"))
        lastmod = _http_date_ms(_meta("content_meta", "Last-Modified"))
        modified = (
            F.col("db_modified_time")
            if "db_modified_time" in df.columns
            else F.lit(0).cast("long")
        )
        date = F.coalesce(
            lastmod,
            F.when(modified > 0, modified),
            F.col("db_fetch_time").cast("long"),
        )
        return (
            df.withColumn("type", ctype)
            .withColumn("primary_type", F.substring_index(ctype, "/", 1))
            .withColumn(
                "sub_type",
                F.when(
                    ctype.contains("/"), F.substring_index(ctype, "/", -1)
                ),
            )
            .withColumn(
                "content_length", F.when(F.length(clen) > 0, clen)
            )
            .withColumn("last_modified", lastmod)
            .withColumn("date", date)
        )


@dataclass(frozen=True)
class TldField:
    """tld plugin (TLDIndexingFilter.java): top-level domain of the
    host — longest match in the suffix table (URLUtil.getTopLevelDomain
    over domain-suffixes.xml; here the same broadcastable two-level
    suffix table the domain extractor uses)."""

    def __call__(self, df: DataFrame) -> Column:
        host = F.col("host") if "host" in df.columns else host_of(F.col("url"))
        parts = F.split(host, r"\.")
        last1 = F.try_element_at(parts, F.lit(-1))
        last2 = F.concat_ws(
            ".",
            F.try_element_at(parts, F.lit(-2)),
            F.try_element_at(parts, F.lit(-1)),
        )
        tld = F.when(
            (F.size(parts) >= 2)
            & last2.isin(*sorted(_TWO_LEVEL_SUFFIXES)),
            last2,
        ).otherwise(last1)
        return df.withColumn("tld", tld)


@dataclass(frozen=True)
class StaticFields:
    """index-static (StaticFieldIndexer.java): literal field:value
    additions from config (`index.static`); multivalued values become
    array columns."""

    fields: dict[str, object] = dc_field(default_factory=dict)

    def __call__(self, df: DataFrame) -> Column:
        out = df
        for name, val in self.fields.items():
            if isinstance(val, (list, tuple)):
                out = out.withColumn(
                    name, F.array(*[F.lit(v) for v in val])
                )
            else:
                out = out.withColumn(name, F.lit(val))
        return out


@dataclass(frozen=True)
class MetadataFields:
    """index-metadata (MetadataIndexer.java): lift configured keys from
    the parse/content/db metadata maps into fields (field name = key,
    lowercased like `index.metadata`'s Solr mapping default)."""

    content_md: Sequence[str] = ()
    db_md: Sequence[str] = ()
    parse_md: Sequence[str] = ()

    def __call__(self, df: DataFrame) -> Column:
        out = df
        for src_col, keys in (
            ("content_meta", self.content_md),
            ("db_meta", self.db_md),
            ("parse_meta", self.parse_md),
        ):
            for k in keys:
                if src_col in df.columns:
                    out = out.withColumn(
                        k.lower().replace("-", "_"), _meta(src_col, k)
                    )
        return out


@dataclass(frozen=True)
class UrlMetaFields:
    """urlmeta (URLMetaIndexingFilter.java:60-77): lift the configured
    `urlmeta.tags` keys from the db datum's metadata."""

    tags: Sequence[str] = ()

    def __call__(self, df: DataFrame) -> Column:
        out = df
        for tag in self.tags:
            out = out.withColumn(tag, _meta("db_meta", tag))
        return out


@dataclass(frozen=True)
class Subcollection:
    """One <subcollection> of subcollections.xml (Subcollection.java:
    154-186): substring white/black lists; a URL belongs when any
    whitelist entry occurs in it and no blacklist entry does."""

    name: str
    whitelist: Sequence[str] = ()
    blacklist: Sequence[str] = ()
    key: str | None = None  # custom field name (TAG_KEY)

    def matches(self, url: Column) -> Column:
        white = F.lit(False)
        for w in self.whitelist:
            white = white | url.contains(w)
        black = F.lit(False)
        for b in self.blacklist:
            black = black | url.contains(b)
        return white & ~black


@dataclass(frozen=True)
class SubcollectionFields:
    """subcollection (SubcollectionIndexingFilter.java:52-76): tag each
    document with every matching subcollection; keyless collections
    collect into the default `subcollection` array field, keyed ones
    into their own field."""

    collections: Sequence[Subcollection] = ()
    field_name: str = "subcollection"

    def __call__(self, df: DataFrame) -> Column:
        url = F.col("url")
        default_entries = [
            F.when(c.matches(url), F.lit(c.name))
            for c in self.collections
            if c.key is None
        ]
        out = df
        if default_entries:
            out = out.withColumn(
                self.field_name,
                F.filter(
                    F.array(*default_entries), lambda x: x.isNotNull()
                ),
            )
        for c in self.collections:
            if c.key is not None:
                out = out.withColumn(
                    c.key, F.when(c.matches(url), F.lit(c.name))
                )
        return out


@dataclass(frozen=True)
class ReplaceRule:
    """One line of `index.replace.regexp` (ReplaceIndexer.java:48-120,
    FieldReplacer.java): rewrite `field` by regex, optionally scoped to
    documents whose host/url matches a pattern."""

    field: str
    pattern: str
    replacement: str
    hostmatch: str | None = None
    urlmatch: str | None = None


@dataclass(frozen=True)
class ReplaceFields:
    """index-replace: apply each rule in order; out-of-scope documents
    keep the field unchanged."""

    rules: Sequence[ReplaceRule] = ()

    def __call__(self, df: DataFrame) -> Column:
        out = df
        for r in self.rules:
            if r.field not in out.columns:
                continue
            scope = F.lit(True)
            if r.hostmatch is not None:
                scope = scope & F.coalesce(
                    F.col("host").rlike(r.hostmatch), F.lit(False)
                )
            if r.urlmatch is not None:
                scope = scope & F.col("url").rlike(r.urlmatch)
            out = out.withColumn(
                r.field,
                F.when(
                    scope,
                    F.regexp_replace(
                        F.col(r.field), r.pattern, r.replacement
                    ),
                ).otherwise(F.col(r.field)),
            )
        return out


@dataclass(frozen=True)
class MimeTypeFilter:
    """mimetype-filter (MimeTypeIndexingFilter.java:63-107): the rules
    file lists content-type prefixes into a trie; in accept mode a
    prefix MATCH drops the document, a miss keeps it — deny mode is the
    inverse. Whole-document drop = `.filter()`, so at scale this prunes
    rows inside the scan stage."""

    patterns: Sequence[str] = ()
    accept_mode: bool = True

    def __call__(self, df: DataFrame) -> Column:
        ctype = (
            F.col("type")
            if "type" in df.columns
            else F.lower(
                F.substring_index(_meta("content_meta", "Content-Type"), ";", 1)
            )
        )
        matched = F.lit(False)
        for p in self.patterns:
            matched = matched | ctype.startswith(p)
        keep = ~matched if self.accept_mode else matched
        return df.filter(F.coalesce(keep, F.lit(self.accept_mode)))


@dataclass(frozen=True)
class AnchorFields:
    """index-anchor (AnchorIndexingFilter.java:79-105): `anchor` field
    from the inlink anchors; `deduplicate` drops case-insensitive
    repeats keeping the first occurrence (the reference's HashSet walk
    preserves arrival order — here the join already array_sorts the
    anchors, so "first" = lexicographically first spelling per
    lowercase key, deterministic under any partitioning)."""

    deduplicate: bool = False

    def __call__(self, df: DataFrame) -> Column:
        anchors = F.coalesce(
            F.col("anchors"), F.array().cast("array<string>")
        )
        if self.deduplicate:
            # keep a[i] iff no earlier element lowercases to the same
            # key; array-local O(n²) over ≤ max_anchors elements
            arr = anchors
            anchors = F.filter(
                arr,
                lambda a, i: ~F.exists(
                    F.slice(arr, 1, i),
                    lambda b: F.lower(b) == F.lower(a),
                ),
            )
        return df.withColumn("anchor", anchors)


@dataclass(frozen=True)
class LinksFields:
    """index-links (LinksIndexingFilter.java): index outlink and inlink
    URL lists; `only_outside_host` keeps only cross-host links
    (index.links.outlinks.host.ignore semantics)."""

    only_outside_host: bool = False

    def __call__(self, df: DataFrame) -> Column:
        out = df
        for src, dst in (
            ("outlink_urls", "outlinks"),
            ("inlink_urls", "inlinks"),
        ):
            if src not in df.columns:
                continue
            links = F.coalesce(
                F.col(src), F.array().cast("array<string>")
            )
            if self.only_outside_host:
                host = F.col("host")
                links = F.filter(links, lambda u: host_of(u) != host)
            out = out.withColumn(dst, F.array_sort(F.array_distinct(links)))
        return out


@dataclass(frozen=True)
class LanguageField:
    """language-identifier (LanguageIndexingFilter.java): `lang` field
    from the content; profile ladder shared with
    pipeline.textstats.detect_language."""

    profiles: dict[str, list[str]] | None = None

    def __call__(self, df: DataFrame) -> Column:
        from ..pipeline.textstats import LANG_STOPWORDS, stopword_hits

        profiles = self.profiles or LANG_STOPWORDS
        langs = list(profiles)
        t = F.coalesce(F.col("text"), F.lit(""))
        hits = {
            lang: stopword_hits(t, words).cast("long")
            for lang, words in profiles.items()
        }
        ladder = None
        for i, lang in enumerate(langs[:-1]):
            cond = None
            for later in langs[i + 1:]:
                c = hits[lang] >= hits[later]
                cond = c if cond is None else (cond & c)
            ladder = (
                F.when(cond, F.lit(lang))
                if ladder is None
                else ladder.when(cond, F.lit(lang))
            )
        detected = (
            ladder.otherwise(F.lit(langs[-1]))
            if ladder is not None
            else F.lit(langs[-1])
        )
        return df.withColumn("lang", detected)


@dataclass(frozen=True)
class GeoIpFields:
    """index-geoip (GeoIPIndexingFilter.java:211-230;
    GeoIPDocumentCreator.createDocFromCityDb:66-96, trimmed to the
    city-database subset): the server IP is read from the content
    metadata key `_ip_` (stored when `store.ip.address` is on), then
    geolocation fields come from an injectable ip → attributes table —
    the sandbox stand-in for the MaxMind city database (no bundled db,
    no web service). Unknown/absent IPs leave the fields null, like
    the reference's doc-unchanged path.

    geo: {ip: (city_name, country_iso_code, country_name,
               lat_lon "lat,lon", time_zone)}

    Scale note: map literals suit a table of up to a few thousand
    entries (they live in the plan); a full MaxMind-sized table should
    instead be a broadcast DataFrame joined on ip — same columns, one
    broadcast hash join, no plan blowup.
    """

    geo: tuple = ()  # ((ip, (city, iso, country, lat_lon, tz)), ...)

    _FIELDS = ("city_name", "country_iso_code", "country_name",
               "lat_lon", "time_zone")

    @classmethod
    def from_dict(cls, geo: dict) -> "GeoIpFields":
        return cls(tuple(sorted(geo.items())))

    def __call__(self, df: DataFrame) -> DataFrame:
        ip = (
            _meta("content_meta", "_ip_")
            if "content_meta" in df.columns
            else F.lit(None).cast("string")
        )
        out = df.withColumn("ip", ip)
        # one small map literal per attribute — broadcast by value,
        # the lookup stays in the scan stage (no join, no shuffle)
        for i, field in enumerate(self._FIELDS):
            entries = [
                x
                for ip_, attrs in self.geo
                if attrs[i] is not None
                for x in (F.lit(ip_), F.lit(attrs[i]))
            ]
            val = (
                F.when(
                    F.col("ip").isNotNull(),
                    F.element_at(F.create_map(*entries), F.col("ip")),
                )
                if entries
                else F.lit(None).cast("string")
            )
            out = out.withColumn(field, val)
        return out


@dataclass(frozen=True)
class IndexingFilterChain:
    """IndexingFilters.java:41-51 — ordered composition; a filter that
    drops a document ends its processing (here: composition of
    DataFrame transforms, drops are filters)."""

    filters: Sequence[IndexingFilter] = ()

    def __call__(self, df: DataFrame) -> DataFrame:
        for f in self.filters:
            df = f(df)
        return df
