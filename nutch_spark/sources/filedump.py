"""FileDumper / ResolveUrls / DmozParser — the reference's remaining
`tools/` surface, re-expressed as DataFrame programs.

Reference:
- tools/FileDumper.java:140-300 — dump segment content to files named
  by url-MD5 (flat or two-level md5-prefix dirs) or by reversed-host
  path + upper SHA-256 (reverseURLDump), with a mimetype filter and a
  `-mimeStats` mode that only reports per-type counts. Naming helpers:
  util/DumpFileUtil.java:40-89 (getUrlMD5, two-level dirs from md5
  chars 0+8 / 16+24, `md5_base.ext` with base ≤ 32 chars / ext ≤ 5 and
  '?' stripped), util/TableUtil.java:41-85 (reverseUrl:
  `com.foo.bar:http[:port][/file]`).
- tools/ResolveUrls.java:62-137 — resolve the host of each URL in a
  list, reporting success/failure counts (thread pool → here one
  DataFrame pass with an injectable resolver table, like the fetch
  scheduler's byIP mode; no real DNS in this sandbox).
- tools/DmozParser.java — subselect seed URLs from a DMOZ RDF dump
  (ExternalPage about= attributes), with an optional subset divisor.

Everything is a map-side Column program over the input scan — no
shuffle except the stats aggregation; the dump itself would stream via
`df.write` at scale rather than driver-side file IO.

Tika type detection is replaced by the stored Content-Type from the
simulated fetch (synth.page_content_type) — documented divergence: the
sandbox has no Tika, and the simulated web's type IS its ground truth.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


# ---------------------------------------------------------------------
# TableUtil.reverseUrl + DumpFileUtil naming
# ---------------------------------------------------------------------


def reverse_url_col(url: Column) -> Column:
    """TableUtil.reverseUrl (TableUtil.java:57-85):
    http://bar.foo.com:8983/to/x?a=b → com.foo.bar:http:8983/to/x?a=b
    (host labels reversed, then :protocol[:port], then the file part
    with a leading '/' ensured when non-empty)."""
    proto = F.regexp_extract(url, r"^([a-z][a-z0-9+.-]*)://", 1)
    authority = F.regexp_extract(url, r"^[a-z][a-z0-9+.-]*://([^/?#]*)", 1)
    host = F.regexp_extract(authority, r"^([^:]*)", 1)
    port = F.regexp_extract(authority, r":(\d+)$", 1)
    file_part = F.regexp_extract(url, r"^[a-z][a-z0-9+.-]*://[^/?#]*(.*)$", 1)
    rev_host = F.array_join(F.reverse(F.split(host, r"\.")), ".")
    return F.concat(
        rev_host,
        F.lit(":"),
        proto,
        F.when(port != "", F.concat(F.lit(":"), port)).otherwise(F.lit("")),
        F.when(
            (file_part != "") & ~file_part.startswith("/"),
            F.concat(F.lit("/"), file_part),
        ).otherwise(file_part),
    )


def unreverse_url_col(rev: Column) -> Column:
    """TableUtil.unreverseUrl (TableUtil.java:87-110): inverse of
    reverse_url_col — `com.foo.bar:http:8983/to/x?a=b` →
    `http://bar.foo.com:8983/to/x?a=b`. Faithful to the reference's
    first-'/' split, including its quirk that a query-only URL (no
    path) folds the query into the protocol token — and, like
    TableUtil.unreverseUrl, appends a port ONLY when the pre-path head
    splits into exactly 3 ':' tokens (splits.length == 3), so a
    path-less reversed URL with extra ':' in the folded query gets no
    port, quirk-for-quirk."""
    head = F.regexp_extract(rev, r"^([^/]*)", 1)
    path = F.regexp_extract(rev, r"(/.*)$", 1)
    parts = F.split(head, ":")
    host = F.array_join(
        F.reverse(F.split(parts.getItem(0), r"\.")), "."
    )
    port = F.when(F.size(parts) == 3, parts.getItem(2))
    return F.concat(
        parts.getItem(1),
        F.lit("://"),
        host,
        F.when(port.isNotNull(), F.concat(F.lit(":"), port)).otherwise(
            F.lit("")
        ),
        path,
    )


def _base_and_ext(url: Column) -> tuple[Column, Column]:
    """FilenameUtils.getBaseName/getExtension over the URL string;
    empty extension defaults to 'html' (FileDumper.java:199-205)."""
    last = F.element_at(F.split(url, "/"), -1)
    has_ext = last.rlike(r"\.[^.]+$")
    base = F.when(has_ext, F.regexp_extract(last, r"^(.*)\.[^.]*$", 1)).otherwise(last)
    ext = F.when(has_ext, F.regexp_extract(last, r"\.([^.]*)$", 1)).otherwise(
        F.lit("html")
    )
    return base, ext


def dump_path_col(
    url: Column,
    flat_dir: bool = False,
    reverse_url_dump: bool = False,
    output_dir: str = "dump",
) -> Column:
    """The output path FileDumper would write a page's content to."""
    if reverse_url_dump:
        # reverseUrl(url).split(":")[0] with dots → slashes, then the
        # upper-cased sha256 hex of the url (FileDumper.java:244-255)
        rev = F.split(reverse_url_col(url), ":").getItem(0)
        return F.concat(
            F.lit(output_dir + "/"),
            F.regexp_replace(rev, r"\.", "/"),
            F.lit("/"),
            F.upper(F.sha2(url, 256)),
        )
    md5 = F.md5(url)
    base, ext = _base_and_ext(url)
    # createFileName: base ≤ 32 chars, ext ≤ 5, '?' stripped
    fname = F.concat(
        md5,
        F.lit("_"),
        F.regexp_replace(F.substring(base, 1, 32), r"\?", ""),
        F.lit("."),
        F.regexp_replace(F.substring(ext, 1, 5), r"\?", ""),
    )
    if flat_dir:
        return F.concat(F.lit(output_dir + "/"), fname)
    # two-level md5-prefix dirs: chars 0+8 / 16+24 (DumpFileUtil.java:51-55)
    lvl1 = F.concat(F.substring(md5, 1, 1), F.substring(md5, 9, 1))
    lvl2 = F.concat(F.substring(md5, 17, 1), F.substring(md5, 25, 1))
    return F.concat(
        F.lit(output_dir + "/"), lvl1, F.lit("/"), lvl2, F.lit("/"), fname
    )


def _mime_col(df: DataFrame) -> Column:
    """Bare mimetype from the fetch metadata's Content-Type (parameters
    like charset stripped); stands in for Tika detection."""
    ct = F.element_at(
        F.coalesce(
            F.col("metadata"), F.lit(None).cast("map<string,string>")
        ),
        "Content-Type",
    )
    return F.trim(F.split(F.coalesce(ct, F.lit("")), ";").getItem(0))


def file_dump(
    fetch_results: DataFrame,
    mime_types: list[str] | None = None,
    flat_dir: bool = False,
    reverse_url_dump: bool = False,
    output_dir: str = "dump",
) -> DataFrame:
    """FileDumper.dump: one row per page that passes the mimetype
    filter, with the path the reference would write and the raw span
    content (the Content bytes analogue)."""
    from ..operators.parsefilters import raw_content_col

    out = fetch_results.select(
        "url",
        _mime_col(fetch_results).alias("mime_type"),
        dump_path_col(
            F.col("url"), flat_dir, reverse_url_dump, output_dir
        ).alias("path"),
        raw_content_col(F.col("spans")).alias("content"),
    )
    if mime_types is not None:
        out = out.filter(F.col("mime_type").isin(list(mime_types)))
    return out


def file_dump_stats(
    fetch_results: DataFrame, mime_types: list[str] | None = None
) -> DataFrame:
    """-mimeStats mode: per-mimetype document counts
    (FileDumper.java:76-108 sample output)."""
    df = fetch_results.select(_mime_col(fetch_results).alias("mime_type"))
    if mime_types is not None:
        df = df.filter(F.col("mime_type").isin(list(mime_types)))
    return df.groupBy("mime_type").agg(F.count("*").alias("count"))


# ---------------------------------------------------------------------
# ResolveUrls
# ---------------------------------------------------------------------


def resolve_urls(
    urls: DataFrame, resolver: dict[str, str] | None = None
) -> DataFrame:
    """ResolveUrls (ResolveUrls.java:62-137): extract each URL's host
    and look it up in the injectable resolver table (host → address) —
    the byIP queue mode's resolver, since the sandbox has no DNS.
    Output: url, host, address (null = failure), resolved flag."""
    from ..functions.urls import host_of

    rmap = resolver or {}
    addr_map = (
        F.create_map(
            *[x for h, ip in sorted(rmap.items()) for x in (F.lit(h), F.lit(ip))]
        )
        if rmap
        else F.lit(None).cast("map<string,string>")
    )
    host = host_of(F.col("url"))
    addr = F.element_at(F.coalesce(addr_map, F.create_map()), host)
    return urls.select(
        "url",
        host.alias("host"),
        addr.alias("address"),
        addr.isNotNull().alias("resolved"),
    )


# ---------------------------------------------------------------------
# DmozParser
# ---------------------------------------------------------------------

_DMOZ_PAGE_RE = re.compile(r'<ExternalPage\s+about="([^"]*)"')


def parse_dmoz(
    rdf_lines: DataFrame,
    subset: int = 0,
    topic_pattern: str | None = None,
    line_col: str = "value",
) -> DataFrame:
    """DmozParser: pull seed URLs from a DMOZ RDF dump's
    `<ExternalPage about="...">` elements, optionally keeping a 1-in-N
    deterministic subset (the reference hashes the URL —
    DmozParser's subsetDenom; here xxhash64 % N == 0) and filtering by
    a `<topic>` prefix regex when given. Input = spark.read.text
    lines, so the parse is a single map-side regexp over the scan."""
    url = F.regexp_extract(F.col(line_col), _DMOZ_PAGE_RE.pattern, 1)
    out = rdf_lines.select(url.alias("url")).filter(F.col("url") != "")
    if topic_pattern:
        # the reference skips pages whose topic doesn't match; in the
        # line-oriented RDF dumps the topic rides on the same element
        # block — approximated as a same-line regex filter
        out = rdf_lines.select(
            url.alias("url"), F.col(line_col).alias("_line")
        ).filter(
            (F.col("url") != "") & F.col("_line").rlike(topic_pattern)
        ).select("url")
    if subset and subset > 1:
        out = out.filter(F.xxhash64("url") % subset == 0)
    return out
