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
pure read. Everything below is JVM-side Catalyst expressions
(higher-order array functions + regexp) — no Python in this stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..constants import (
    Defaults,
    STATUS_FETCH_REDIR_PERM,
    STATUS_FETCH_REDIR_TEMP,
    STATUS_FETCH_SUCCESS,
    STATUS_LINKED,
    STATUS_SIGNATURE,
)
from ..functions.urls import accept_urls, domain_of, host_of, normalize_urls

HREF_RE = r"href:(\S+)"


def _raw_outlinks_col():
    """Ordered outlink URLs from the span array — pure Catalyst."""
    per_span = F.transform(
        F.col("spans"),
        lambda s: F.when(
            s["kind"] == "media", F.array(s["media_ref"])
        ).otherwise(F.regexp_extract_all(s["text"], F.lit(HREF_RE), F.lit(1))),
    )
    return F.flatten(per_span)


def _text_col():
    """Extracted plain text = text spans minus href tokens, in order."""
    texts = F.filter(F.col("spans"), lambda s: s["kind"] == "text")
    joined = F.array_join(F.transform(texts, lambda s: s["text"]), " ")
    return F.trim(F.regexp_replace(joined, HREF_RE, ""))


def parse(
    fetch_results: DataFrame,
    max_outlinks: int = Defaults.MAX_OUTLINKS_PER_PAGE,
    ignore_external: bool = False,
    external_mode: str = "byHost",  # byHost | byDomain
    score_internal: float = Defaults.SCORE_LINK_INTERNAL,
    score_external: float = Defaults.SCORE_LINK_EXTERNAL,
) -> tuple[DataFrame, DataFrame]:
    """fetch_results → (parse_data, crawl_parse)."""
    ok = fetch_results.filter(F.col("status") == STATUS_FETCH_SUCCESS)

    base = ok.select(
        "url",
        "host",
        "score",
        "segment",
        "spans",
        _text_col().alias("text"),
        _raw_outlinks_col().alias("raw_outlinks"),
    ).withColumn("signature", F.md5(F.col("text")))

    # one row per candidate outlink, order preserved via pos
    ex = base.select(
        "url",
        "host",
        "score",
        "segment",
        F.posexplode("raw_outlinks").alias("pos", "to_url_raw"),
    )
    ex = ex.withColumn("to_url", normalize_urls(F.col("to_url_raw")))
    ex = ex.filter(
        F.col("to_url").isNotNull()
        & (F.col("to_url") != "")
        & accept_urls(F.col("to_url"))
        & (F.col("to_url") != F.col("url"))  # self-link drop
    )
    ex = ex.withColumn("to_host", host_of(F.col("to_url")))
    if ignore_external:
        if external_mode == "byDomain":
            ex = ex.filter(domain_of(F.col("to_host")) == domain_of(F.col("host")))
        else:
            ex = ex.filter(F.col("to_host") == F.col("host"))

    # per-page dedup (first occurrence) then cap, both in doc order
    w_dup = Window.partitionBy("url", "to_url").orderBy("pos")
    w_page = Window.partitionBy("url").orderBy("pos")
    kept = (
        ex.withColumn("dup_rank", F.row_number().over(w_dup))
        .filter(F.col("dup_rank") == 1)
        .withColumn("link_order", F.row_number().over(w_page))
        .filter(F.col("link_order") <= max_outlinks)
        .drop("dup_rank")
    )

    # OPIC distribution: score / valid_count × internal/external factor
    w_url = Window.partitionBy("url")
    kept = kept.withColumn("valid_count", F.count("*").over(w_url))
    factor = F.when(
        F.col("to_host") == F.col("host"), F.lit(float(score_internal))
    ).otherwise(F.lit(float(score_external)))
    kept = kept.withColumn(
        "contrib", (F.col("score") / F.col("valid_count") * factor).cast("float")
    )

    # parse_data: reassemble ordered outlink array per page (no extra
    # shuffle — reuse the url-partitioned exchange via collect over window)
    outlink_struct = F.struct(
        F.col("to_url").alias("to_url"),
        F.substring(F.col("to_url"), 1, Defaults.MAX_ANCHOR_LENGTH).alias("anchor"),
        F.lit("link").alias("kind"),
        F.col("link_order").alias("link_order"),
    )
    per_page = (
        kept.groupBy("url")
        .agg(F.sort_array(F.collect_list(F.struct("link_order", outlink_struct.alias("o")))).alias("tmp"))
        .select("url", F.transform("tmp", lambda x: x["o"]).alias("outlinks"))
    )
    parse_data = (
        base.join(per_page, "url", "left")
        .select(
            "url",
            F.regexp_extract("text", r"\A(\S+(?:\s+\S+)?)", 1).alias("title"),
            "text",
            "signature",
            F.coalesce(
                "outlinks", F.array().cast(per_page.schema["outlinks"].dataType)
            ).alias("outlinks"),
            "spans",
            "segment",
        )
    )

    # crawl_parse: linked datums + signature datums + redirect targets
    linked = kept.select(
        F.col("to_url").alias("url"),
        F.lit(STATUS_LINKED).alias("status"),
        F.col("contrib").alias("score"),
        F.lit(Defaults.FETCH_INTERVAL).alias("fetch_interval"),
        F.lit(None).cast("string").alias("signature"),
        F.substring(F.col("to_url"), 1, Defaults.MAX_ANCHOR_LENGTH).alias("anchor"),
        F.col("url").alias("from_url"),
        F.lit(None).cast("map<string,string>").alias("metadata"),
    )
    sigs = base.select(
        F.col("url"),
        F.lit(STATUS_SIGNATURE).alias("status"),
        F.lit(0.0).cast("float").alias("score"),
        F.lit(Defaults.FETCH_INTERVAL).alias("fetch_interval"),
        F.col("signature"),
        F.lit(None).cast("string").alias("anchor"),
        F.lit(None).cast("string").alias("from_url"),
        F.lit(None).cast("map<string,string>").alias("metadata"),
    )
    redirs = (
        fetch_results.filter(
            F.col("status").isin(STATUS_FETCH_REDIR_TEMP, STATUS_FETCH_REDIR_PERM)
            & F.col("redirect_to").isNotNull()
        )
        .select(
            normalize_urls(F.col("redirect_to")).alias("url"),
            F.lit(STATUS_LINKED).alias("status"),
            F.lit(0.0).cast("float").alias("score"),
            F.lit(Defaults.FETCH_INTERVAL).alias("fetch_interval"),
            F.lit(None).cast("string").alias("signature"),
            F.lit(None).cast("string").alias("anchor"),
            F.col("url").alias("from_url"),
            F.lit(None).cast("map<string,string>").alias("metadata"),
        )
        .filter(F.col("url").isNotNull() & accept_urls(F.col("url")))
    )

    crawl_parse = linked.unionByName(sigs).unionByName(redirs)
    return parse_data, crawl_parse
