"""Parse — span-preserving text/outlink extraction + OPIC distribution.

Reference semantics (re-expressed, not ported):
  * outlink sources: media spans' media_ref (≙ img/script/frame src —
    parse-html DOMContentUtils.java:72-83) and ``href:<url>`` tokens in
    text spans (≙ plain-text OutlinkExtractor.java:62-120), in document
    order;
  * per-page outlink pipeline (ParseOutputFormat.filterNormalize,
    ParseOutputFormat.java:321-396; FetcherThread.java:636-676):
    normalize → filter → drop self-links → optional ignore-external
    (byHost/byDomain) → per-page dedup (first occurrence wins) → cap
    db.max.outlinks.per.page (default 100);
  * OPIC score distribution (OPICScoringFilter.java:122-165): each kept
    outlink receives page_score / valid_count × internal/external factor;
  * one signature datum per parsed page (ParseOutputFormat.java:296) —
    signature = md5 of extracted text (TextMD5Signature semantics,
    crawl/TextMD5Signature.java) so duplicate content classes collide;
  * unfollowed redirects emit a linked datum for the target
    (FetcherThread.java:473-492).

**Span-sequence invariant** (BASELINE.json input_hint): parse_data
carries the input span array through untouched — (kind, text,
media_ref, offset) order is preserved exactly; outlink extraction is a
pure read.

**Execution shape — map-only fast path.** The whole per-page pipeline
runs as array expressions ON THE PAGE ROW (filter/array_distinct/slice
preserve document order), so for pages whose outlinks are already
canonical — the overwhelming majority in a real crawl — parse is a
single map stage: no explode-then-window, no shuffle at all, exactly
like the reference's map-side ParseOutputFormat. An earlier shape that
exploded every link and ran three window passes cost three full
shuffle+sort rounds and put a serial floor under the stage; the array
form scales linearly with input. Pages containing a non-canonical
outlink take a slow path (explode → pandas normalizer → windows) that
preserves normalize-then-dedup ordering semantics; the two paths union.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..constants import (
    Defaults,
    META_REPR_URL,
    STATUS_FETCH_REDIR_PERM,
    STATUS_FETCH_REDIR_TEMP,
    STATUS_FETCH_SUCCESS,
    STATUS_LINKED,
    STATUS_SIGNATURE,
)
from ..functions.scoring import OPIC, ScoringHooks
from ..functions.urls import (
    accept_urls,
    choose_repr_pd,
    domain_col,
    host_of,
    is_canonical,
    with_normalized,
)

HREF_RE = r"href:(\S+)"


def _once(col: Column) -> Column:
    """Evaluate-once barrier. Catalyst has no subexpression elimination
    for lambda-bearing (higher-order) expressions, and CollapseProject /
    PushDownPredicates happily duplicate them — the span-extraction
    chain showed up 7× in this plan before this barrier. Wrapping in a
    trivially-true nondeterministic conditional marks the expression
    nondeterministic, which the optimizer refuses to inline or push
    through, so every downstream reference reads the computed column.
    Costs one rand() per row; saves N-1 evaluations of the chain."""
    return F.when(F.rand() >= -1.0, col)


def _raw_outlinks_col():
    """Ordered outlink URLs from the span array — pure Catalyst.

    Only text/media spans contribute: a `subdoc` span is a nested
    document (its links belong to the sub-document's own parse entry,
    not the canonical page's — ParseResult sub-url semantics)."""
    per_span = F.transform(
        F.col("spans"),
        lambda s: F.when(s["kind"] == "media", F.array(s["media_ref"]))
        .when(
            s["kind"] == "text",
            F.regexp_extract_all(s["text"], F.lit(HREF_RE), F.lit(1)),
        )
        .otherwise(F.array().cast("array<string>")),
    )
    return F.flatten(per_span)


def _text_col():
    """Extracted plain text = text spans minus href tokens, in order."""
    texts = F.filter(F.col("spans"), lambda s: s["kind"] == "text")
    joined = F.array_join(F.transform(texts, lambda s: s["text"]), " ")
    return F.trim(F.regexp_replace(joined, HREF_RE, ""))


def _host_kind_filter(
    to_url: Column, page_host: Column, ignore_external: bool,
    external_mode: str, exemptions=None,
) -> Column:
    if not ignore_external:
        return F.lit(True)
    to_host = host_of(to_url)
    if external_mode == "byDomain":
        # domain_col, not the pandas UDF: this predicate runs inside an
        # array lambda on the fast path, where python UDFs are rejected
        ok = domain_col(to_host) == domain_col(page_host)
    else:
        ok = to_host == page_host
    if exemptions is not None and exemptions.java_pattern:
        # URLExemptionFilters.isExempted (ParseOutputFormat.java:356-358):
        # exempted targets bypass the ignore-external restriction
        ok = ok | to_url.rlike(exemptions.java_pattern)
    return ok


def parse(
    fetch_results: DataFrame,
    max_outlinks: int = Defaults.MAX_OUTLINKS_PER_PAGE,
    ignore_external: bool = False,
    external_mode: str = "byHost",  # byHost | byDomain
    score_internal: float = Defaults.SCORE_LINK_INTERNAL,
    score_external: float = Defaults.SCORE_LINK_EXTERNAL,
    hooks: ScoringHooks = OPIC,
    exemptions=None,  # functions.urlplugins.ExemptionRules | None
    normalizers=None,  # functions.urlplugins.ScopedNormalizers | None
    url_filters=None,  # functions.urlplugins.FilterChain | None
    parse_filters=None,  # operators.parsefilters.ParseFilterChain | None
    skip_truncated: bool = False,  # parser.skip.truncated
) -> tuple[DataFrame, DataFrame]:
    """fetch_results → (parse_data, crawl_parse).

    crawl_parse derives from parse_data's lineage; a caller that
    materializes parse_data first (the crawl driver does) should pass
    the STORED table to `crawl_parse_from` so the extraction chain runs
    exactly once per page."""
    pd_ = parse_pages(
        fetch_results, max_outlinks, ignore_external, external_mode,
        exemptions, normalizers, url_filters, parse_filters,
        skip_truncated,
    )
    cp = crawl_parse_from(
        pd_, fetch_results, score_internal, score_external, hooks,
        normalizers,
    )
    return pd_, cp


def parse_pages(
    fetch_results: DataFrame,
    max_outlinks: int = Defaults.MAX_OUTLINKS_PER_PAGE,
    ignore_external: bool = False,
    external_mode: str = "byHost",
    exemptions=None,
    normalizers=None,
    url_filters=None,
    parse_filters=None,
    skip_truncated: bool = False,
) -> DataFrame:
    """extraction + outlink pipeline → parse_data, in one lineage.

    The crawl driver materializes `extract_pages` first (≙ the
    reference's separate parse_text segment dir) and runs
    `finish_pages` on the stored table: the span-extraction chain is a
    higher-order expression Catalyst re-evaluates at every reference
    (7× in the fused plan — no subexpression elimination for
    lambda-bearing exprs, and predicate pushdown inlines them into
    filters), so cutting the lineage there is worth one extra write."""
    return finish_pages(
        extract_pages(fetch_results, skip_truncated=skip_truncated),
        max_outlinks, ignore_external,
        external_mode, exemptions, normalizers, url_filters, parse_filters,
    )


_EMPTY_SPANS = "array<struct<kind:string,text:string,media_ref:string,offset:int>>"


def is_truncated_col() -> Column:
    """Truncation check (ParseSegment.isTruncated,
    ParseSegment.java:159-192): the Content-Length header claims more
    bytes than the stored content actually has. Our content model is
    the span array, so the actual size is the byte length of all span
    text + media refs; a missing/empty/non-numeric header means not
    truncated (the reference's early returns)."""
    declared = F.element_at(
        F.coalesce(F.col("metadata"), F.create_map().cast("map<string,string>")),
        "Content-Length",
    )
    declared_n = F.trim(declared).try_cast("long")  # non-numeric → NULL (ANSI-safe)
    actual = F.aggregate(
        F.coalesce(F.col("spans"), F.array().cast(_EMPTY_SPANS)),
        F.lit(0).cast("long"),
        lambda acc, sp: acc
        + F.coalesce(F.octet_length(sp["text"]), F.lit(0))
        + F.coalesce(F.octet_length(sp["media_ref"]), F.lit(0)),
    )
    return declared_n.isNotNull() & (declared_n > actual)


def extract_pages(
    fetch_results: DataFrame, skip_truncated: bool = False
) -> DataFrame:
    """The expensive single-pass extraction projection: span text,
    signature, ordered raw outlinks. Evaluates each span chain once.

    A span of kind ``subdoc`` (text = nested document's text, media_ref
    = its sub-URL) yields an additional NON-CANONICAL parse entry keyed
    by the sub-URL — the fork's multi-entry ParseResult: a zip/feed
    parser emits one parse per contained item under sub-URL keys, and
    ``ParseResult.put`` marks entries canonical iff key == fetched URL
    (reference parse/ParseResult.java:137-139, ParseImpl.java:31-73).
    The canonical page row carries the input span array through
    UNTOUCHED (span-sequence invariant); sub-entries carry no spans."""
    if "metadata" not in fetch_results.columns:  # minimal test inputs
        fetch_results = fetch_results.withColumn(
            "metadata", F.lit(None).cast("map<string,string>")
        )
    ok = fetch_results.filter(F.col("status") == STATUS_FETCH_SUCCESS)
    if skip_truncated:
        # parser.skip.truncated (ParseSegment.java:112-116)
        ok = ok.filter(~is_truncated_col())
    pages = ok.select(
        "url",
        "host",
        "score",
        "segment",
        "spans",
        "fetch_time",
        # fetch-datum metadata rides along (contentMeta hop — carries
        # e.g. scoring-depth's _depth_/_maxdepth_ into parse_data)
        "metadata",
        _once(_text_col()).alias("text"),
        _once(_raw_outlinks_col()).alias("raw_outlinks"),
        F.lit(True).alias("is_canonical"),
    ).withColumn("signature", F.md5(F.col("text")))

    # sub-document entries — rare (zero in a plain HTML crawl), so the
    # exists() pre-filter keeps the explode off the hot path entirely
    with_subs = ok.filter(
        F.exists(F.col("spans"), lambda s: s["kind"] == "subdoc")
    )
    sub_text_raw = F.coalesce(F.col("sd.text"), F.lit(""))
    subs = (
        with_subs.select(
            "segment",
            "fetch_time",
            F.explode(
                F.filter(F.col("spans"), lambda s: s["kind"] == "subdoc")
            ).alias("sd"),
        )
        .filter(F.col("sd.media_ref").isNotNull())
        .select(
            F.col("sd.media_ref").alias("url"),
            host_of(F.col("sd.media_ref")).alias("host"),
            F.lit(0.0).cast("float").alias("score"),  # CrawlDatum default
            "segment",
            F.array().cast(_EMPTY_SPANS).alias("spans"),
            "fetch_time",
            # sub-entries carry no datum metadata (a fresh ParseData) —
            # under scoring-depth their outlinks are dropped like the
            # reference's missing-depth warning path
            F.lit(None).cast("map<string,string>").alias("metadata"),
            F.trim(F.regexp_replace(sub_text_raw, HREF_RE, "")).alias("text"),
            F.regexp_extract_all(
                sub_text_raw, F.lit(HREF_RE), F.lit(1)
            ).alias("raw_outlinks"),
            F.lit(False).alias("is_canonical"),
        )
        .withColumn("signature", F.md5(F.col("text")))
    )
    return pages.unionByName(subs)


def finish_pages(
    base: DataFrame,
    max_outlinks: int = Defaults.MAX_OUTLINKS_PER_PAGE,
    ignore_external: bool = False,
    external_mode: str = "byHost",
    exemptions=None,
    normalizers=None,
    url_filters=None,
    parse_filters=None,  # operators.parsefilters.ParseFilterChain | None
) -> DataFrame:
    """Outlink pipeline over extracted pages → parse_data.

    With a custom `normalizers` chain (ScopedNormalizers), EVERY page
    takes the explode path and outlinks run through the chain's
    `outlink` scope — the canonical fast path only proves basic-
    normalize identity, which a custom chain (e.g. session-id rewrite
    rules) does not imply (URLNormalizers scope semantics). A custom
    `url_filters` FilterChain likewise forces the explode path and runs
    IN ADDITION to the default regex rules (≙ enabling extra filter
    plugins in the URLFilters chain)."""

    # --- fast path: every outlink already canonical → pure array ops ---
    # NULL-safe: a NULL outlink element (schema allows null media_ref)
    # makes EXISTS evaluate to NULL, and a plain filter pair would drop
    # the page from BOTH paths — coalesce sends null-bearing pages down
    # the slow path, which filters null links per-element.
    all_canonical = F.coalesce(
        ~F.exists(F.col("raw_outlinks"), lambda u: ~is_canonical(u)),
        F.lit(False),
    )
    # a filter chain whose members all compile to Column predicates
    # runs INSIDE the fast array path (whole-stage codegen, no pandas
    # stage, no forced explode); only a chain with opaque-Python
    # members forces the slow path
    uf_col = (
        url_filters.column_or_none(F.lit("probe"))
        if url_filters is not None
        and hasattr(url_filters, "column_or_none")
        else None
    )
    uf_ok = (
        (lambda u: F.coalesce(url_filters.column_or_none(u), F.lit(False)))
        if uf_col is not None
        else (lambda u: F.lit(True))
    )
    if normalizers is not None or (url_filters is not None and uf_col is None):
        all_canonical = F.lit(False)  # custom chain ⇒ always slow path
    fast = base.filter(all_canonical)
    ext_ok = (
        (lambda u: _host_kind_filter(
            u, F.col("host"), ignore_external, external_mode, exemptions
        ))
        if ignore_external
        else (lambda u: F.lit(True))
    )
    kept_arr = F.slice(
        F.array_distinct(
            F.filter(
                F.col("raw_outlinks"),
                lambda u: accept_urls(u)
                & (u != F.col("url"))
                & ext_ok(u)
                & uf_ok(u),
            )
        ),
        1,
        max_outlinks,
    )
    fast = fast.withColumn("kept", _once(kept_arr)).withColumn(
        "valid_count", F.size("kept")
    )
    fast_pages = fast.select(
        "url",
        "host",
        "score",
        "segment",
        "spans",
        "fetch_time",
        "is_canonical",
        "metadata",
        "text",
        "signature",
        F.transform(
            "kept",
            lambda u, i: F.struct(
                u.alias("to_url"),
                F.substring(u, 1, Defaults.MAX_ANCHOR_LENGTH).alias("anchor"),
                F.lit("link").alias("kind"),
                (i + 1).alias("link_order"),
            ),
        ).alias("outlinks"),
        "valid_count",
    )

    # --- slow path: some outlink needs real normalization ---
    slow = base.filter(~all_canonical)
    slow_pages = _slow_outlink_pipeline(
        slow, max_outlinks, ignore_external, external_mode, exemptions,
        normalizers, url_filters,
    )

    pages = fast_pages.unionByName(slow_pages)

    out = pages.select(
        "url",
        F.regexp_extract("text", r"\A(\S+(?:\s+\S+)?)", 1).alias("title"),
        "text",
        "signature",
        "outlinks",
        "spans",
        "segment",
        "host",
        F.col("score").cast("float").alias("score"),
        "fetch_time",
        "is_canonical",
        "metadata",
    )
    if parse_filters is not None:
        # HtmlParseFilter chain (HtmlParseFilters.java): adds the
        # parse_meta map column; sub-entries have empty span arrays,
        # so their html-source rules see "" (their text still applies)
        out = parse_filters.apply(out)
    return out


def crawl_parse_from(
    parse_data: DataFrame,
    fetch_results: DataFrame,
    score_internal: float = Defaults.SCORE_LINK_INTERNAL,
    score_external: float = Defaults.SCORE_LINK_EXTERNAL,
    hooks: ScoringHooks = OPIC,
    normalizers=None,
) -> DataFrame:
    """parse_data (+ fetch_results for redirects) → crawl_parse datums.

    Cheap: one map-side explode of the stored outlink arrays — contrib
    needs no window because valid_count is the array size. Run this on
    the MATERIALIZED parse_data so extraction isn't re-executed.

    Non-canonical entries (sub-documents) additionally emit a
    `fetch_success` CrawlDatum under their own key — the fork's
    signature extension (reference ParseImpl.java:31-73;
    ParseOutputFormat.java:296-308: status=fetch_success, fetch time
    from the parent fetch, everything else CrawlDatum defaults) — so
    updatedb records the sub-URL as fetched without a separate fetch."""
    pages = parse_data.withColumn("valid_count", F.size("outlinks"))
    if "is_canonical" not in pages.columns:  # legacy stored parse_data
        pages = pages.withColumn("is_canonical", F.lit(True)).withColumn(
            "fetch_time", F.lit(None).cast("long")
        )
    if "metadata" not in pages.columns:  # legacy stored parse_data
        pages = pages.withColumn(
            "metadata", F.lit(None).cast("map<string,string>")
        )
    factor = F.when(
        host_of(F.col("o.to_url")) == F.col("host"),
        F.lit(float(score_internal)),
    ).otherwise(F.lit(float(score_external)))
    # ScoringFilter.distributeScoreToOutlinks hook point
    # (OPICScoringFilter.java:122-165); pass-score hooks bracket it
    # (passScoreBeforeParsing/AfterParsing — OPIC: identity). The pass
    # hooks run BEFORE the outlink explode, while page columns like
    # `text` are still in scope (a content-based scorer such as
    # scoring-similarity reads them) and so the page score is
    # evaluated once per page, not once per outlink.
    page_score = hooks.pass_score_after_parsing(
        hooks.pass_score_before_parsing(F.col("score"))
    )
    link_pages = pages.filter(F.col("valid_count") > 0)
    if hooks.outlink_gate is not None:
        # a metadata-gated scorer (scoring-depth) may clear ALL of a
        # page's outlinks (DepthScoringFilter.java:60-80 targets.clear)
        link_pages = link_pages.filter(
            hooks.outlink_gate(F.col("metadata"))
        )
    # per-target metadata from the page's metadata (scoring-depth puts
    # depth+1 on each target); evaluated per page, pre-explode
    target_meta = (
        hooks.outlink_metadata(F.col("metadata"))
        if hooks.outlink_metadata is not None
        else F.lit(None).cast("map<string,string>")
    )
    linked = (
        link_pages
        .withColumn("_page_score", page_score)
        .withColumn("_target_meta", target_meta)
        .select(
            "url",
            "host",
            "_page_score",
            "_target_meta",
            "valid_count",
            F.explode("outlinks").alias("o"),
        )
        .select(
            F.col("o.to_url").alias("out_url"),
            F.lit(STATUS_LINKED).alias("status"),
            hooks.distribute_score_to_outlinks(
                F.col("_page_score"), F.col("valid_count"), factor
            )
            .cast("float")
            .alias("score"),
            F.lit(Defaults.FETCH_INTERVAL).alias("fetch_interval"),
            F.lit(None).cast("string").alias("signature"),
            F.col("o.anchor").alias("anchor"),
            F.col("url").alias("from_url"),
            F.col("_target_meta").alias("metadata"),
            F.lit(None).cast("long").alias("fetch_time"),
        )
        .withColumnRenamed("out_url", "url")
    )
    sigs = pages.select(
        F.col("url"),
        F.lit(STATUS_SIGNATURE).alias("status"),
        F.lit(0.0).cast("float").alias("score"),
        F.lit(Defaults.FETCH_INTERVAL).alias("fetch_interval"),
        F.col("signature"),
        F.lit(None).cast("string").alias("anchor"),
        F.lit(None).cast("string").alias("from_url"),
        F.lit(None).cast("map<string,string>").alias("metadata"),
        F.lit(None).cast("long").alias("fetch_time"),
    )
    # the fork's canonical-key datum: one fetch_success per sub-entry
    canon = pages.filter(~F.col("is_canonical")).select(
        F.col("url"),
        F.lit(STATUS_FETCH_SUCCESS).alias("status"),
        F.lit(0.0).cast("float").alias("score"),  # CrawlDatum defaults
        F.lit(0).alias("fetch_interval"),
        F.lit(None).cast("string").alias("signature"),
        F.lit(None).cast("string").alias("anchor"),
        F.lit(None).cast("string").alias("from_url"),
        F.lit(None).cast("map<string,string>").alias("metadata"),
        F.col("fetch_time").cast("long").alias("fetch_time"),
    )
    # repr-URL choice (URLUtil.chooseRepr via FetcherThread.java:463 /
    # ParseOutputFormat's redirect datum): when the representative URL
    # differs from the redirect target, it rides in the linked datum's
    # metadata under META_REPR_URL and updatedb carries it into the db
    # row. Redirects are rare, so the pandas chooser stays off the hot
    # path.
    redir_base = fetch_results.filter(
        F.col("status").isin(STATUS_FETCH_REDIR_TEMP, STATUS_FETCH_REDIR_PERM)
        & F.col("redirect_to").isNotNull()
    ).select("url", "redirect_to", "status")
    redir_rows = (
        normalizers.with_normalized(
            redir_base, "redirect_to", "redir_norm", scope="fetcher"
        )
        if normalizers is not None
        else with_normalized(redir_base, "redirect_to", "redir_norm")
    ).withColumn(
        "repr_url",
        choose_repr_pd(
            F.col("url"),
            F.col("redir_norm"),
            F.col("status") == STATUS_FETCH_REDIR_TEMP,
        ),
    )
    repr_meta = F.when(
        F.col("repr_url").isNotNull() & (F.col("repr_url") != F.col("redir_norm")),
        F.create_map(F.lit(META_REPR_URL), F.col("repr_url")),
    ).otherwise(F.lit(None).cast("map<string,string>"))
    redirs = redir_rows.select(
        F.col("redir_norm").alias("target"),
        F.lit(STATUS_LINKED).alias("status"),
        F.lit(0.0).cast("float").alias("score"),
        F.lit(Defaults.FETCH_INTERVAL).alias("fetch_interval"),
        F.lit(None).cast("string").alias("signature"),
        F.lit(None).cast("string").alias("anchor"),
        F.col("url").alias("from_url"),
        repr_meta.alias("metadata"),
        F.lit(None).cast("long").alias("fetch_time"),
    ).filter(
        F.col("target").isNotNull() & accept_urls(F.col("target"))
    ).withColumnRenamed("target", "url")

    return (
        linked.unionByName(sigs).unionByName(canon).unionByName(redirs)
    )


def _slow_outlink_pipeline(
    slow: DataFrame,
    max_outlinks: int,
    ignore_external: bool,
    external_mode: str,
    exemptions=None,
    normalizers=None,
    url_filters=None,
) -> DataFrame:
    """Explode → pandas-normalize → window dedup/cap, for the rare pages
    whose outlinks need real normalization. Normalize happens BEFORE
    dedup (reference order), so two raw variants of one canonical URL
    collapse correctly here."""
    ex = slow.select(
        "url",
        "host",
        F.posexplode_outer("raw_outlinks").alias("pos", "to_url_raw"),
    )
    if normalizers is not None:
        ex = normalizers.with_normalized(
            ex, "to_url_raw", "to_url", scope="outlink"
        )
    else:
        ex = with_normalized(ex, "to_url_raw", "to_url")
    ex = ex.filter(
        F.col("to_url").isNotNull()
        & (F.col("to_url") != "")
        & accept_urls(F.col("to_url"))
        & (F.col("to_url") != F.col("url"))
    )
    if url_filters is not None:
        from ..functions.urlplugins import filter_pred

        ex = ex.filter(filter_pred(url_filters, F.col("to_url")))
    if ignore_external:
        ex = ex.filter(
            _host_kind_filter(
                F.col("to_url"), F.col("host"), ignore_external,
                external_mode, exemptions,
            )
        )
    w_dup = Window.partitionBy("url", "to_url").orderBy("pos")
    w_page = Window.partitionBy("url").orderBy("pos")
    kept = (
        ex.withColumn("dup_rank", F.row_number().over(w_dup))
        .filter(F.col("dup_rank") == 1)
        .withColumn("link_order", F.row_number().over(w_page))
        .filter(F.col("link_order") <= max_outlinks)
    )
    per_page = (
        kept.groupBy("url")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("link_order", "to_url"))
            ).alias("tmp")
        )
        .select(
            "url",
            F.transform(
                "tmp",
                lambda x: F.struct(
                    x["to_url"].alias("to_url"),
                    F.substring(x["to_url"], 1, Defaults.MAX_ANCHOR_LENGTH).alias(
                        "anchor"
                    ),
                    F.lit("link").alias("kind"),
                    x["link_order"].alias("link_order"),
                ),
            ).alias("outlinks"),
        )
    )
    empty_outlinks = F.array().cast(
        "array<struct<to_url:string,anchor:string,kind:string,link_order:int>>"
    )
    return (
        slow.join(per_page, "url", "left")
        .select(
            "url",
            "host",
            "score",
            "segment",
            "spans",
            "fetch_time",
            "is_canonical",
            "metadata",
            "text",
            "signature",
            F.coalesce("outlinks", empty_outlinks).alias("outlinks"),
        )
        .withColumn("valid_count", F.size("outlinks"))
    )
