"""LinkDb — invert the link graph; HostDb — per-host aggregates.

Reference semantics:
  * LinkDb inversion (crawl/LinkDb.java:86-156): explode outlinks,
    group by target URL, collect (from_url, anchor) inlinks; anchors
    truncated at db.max.anchor.length=100; inlink list capped at
    db.max.inlinks (LinkDbMerger semantics); internal links can be
    ignored (db.ignore.internal.links);
  * LinkDb merge (LinkDbMerger.java): union two linkdbs, re-group,
    cap — same group/cap program;
  * HostDb (hostdb/UpdateHostDb.java:62-258): per-host counts of each
    db status + score stats — a groupBy/pivot;
  * WebGraph node degrees (scoring/webgraph/WebGraph.java:96-440):
    out-degree from parse_data, in-degree from the inversion;
  * LinkRank (scoring/webgraph/LinkRank.java:433-522): iterative
    score = (1-d) + d·Σ inlink(score/outdegree), d=0.85 — an
    iterative DataFrame loop.

Scale: one shuffle per groupBy; inlink lists are bounded by
`max_inlinks` via window rank BEFORE collect_list so no group blows
up memory (the reference bounds the same way with a priority queue).
LinkRank caches the degree table and checkpoints per iteration to cut
the lineage chain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..constants import (
    Defaults,
    STATUS_DB_FETCHED,
    STATUS_DB_NOTMODIFIED,
    STATUS_NAMES,
)
from ..functions.urls import host_of


def invert_links(
    parse_data: DataFrame,
    max_anchor_length: int = Defaults.MAX_ANCHOR_LENGTH,
    max_inlinks: int = Defaults.MAX_INLINKS,
    ignore_internal: bool = False,
) -> DataFrame:
    """parse_data(url, outlinks) → linkdb(url, inlinks)."""
    ex = parse_data.select(
        F.col("url").alias("from_url"),
        F.explode("outlinks").alias("o"),
    ).select(
        F.col("o.to_url").alias("url"),
        "from_url",
        F.substring(F.col("o.anchor"), 1, max_anchor_length).alias("anchor"),
    )
    if ignore_internal:
        ex = ex.filter(host_of(F.col("url")) != host_of(F.col("from_url")))
    # bound before collect: rank within target, keep max_inlinks
    w = Window.partitionBy("url").orderBy(F.asc("from_url"), F.asc("anchor"))
    bounded = ex.withColumn("_r", F.row_number().over(w)).filter(
        F.col("_r") <= max_inlinks
    )
    return bounded.groupBy("url").agg(
        F.sort_array(
            F.collect_list(F.struct(F.col("from_url"), F.col("anchor")))
        ).alias("inlinks")
    )


def merge_linkdbs(
    a: DataFrame,
    b: DataFrame,
    max_inlinks: int = Defaults.MAX_INLINKS,
    url_filters=None,  # functions.urlplugins.FilterChain | None
) -> DataFrame:
    """LinkDbMerger: union, flatten, dedup, re-cap. With `url_filters`,
    target URLs failing the chain are dropped — the LinkDbFilter map
    pass (crawl/LinkDbFilter.java) that -filter merges run."""
    u = a.unionByName(b)
    if url_filters is not None:
        from ..functions.urlplugins import filter_pred

        u = u.filter(filter_pred(url_filters, F.col("url")))
    flat = u.select("url", F.explode("inlinks").alias("i")).select(
        "url", F.col("i.from_url").alias("from_url"), F.col("i.anchor").alias("anchor")
    ).distinct()
    w = Window.partitionBy("url").orderBy(F.asc("from_url"), F.asc("anchor"))
    return (
        flat.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= max_inlinks)
        .groupBy("url")
        .agg(
            F.sort_array(F.collect_list(F.struct("from_url", "anchor"))).alias("inlinks")
        )
    )


def hostdb(frontier: DataFrame) -> DataFrame:
    """Per-host status counts + score stats (UpdateHostDb semantics)."""
    status_name = F.col("status")
    agg = [
        F.count("*").alias("num_urls"),
        F.min("score").alias("min_score"),
        F.max("score").alias("max_score"),
        F.avg("score").alias("avg_score"),
        F.max("fetch_time").alias("last_fetch_time"),
    ]
    for code, name in sorted(STATUS_NAMES.items()):
        if name.startswith("db_"):
            agg.append(
                F.sum(F.when(status_name == code, 1).otherwise(0)).alias(f"n_{name}")
            )
    return frontier.groupBy("host").agg(*agg)


def update_hostdb(
    frontier: DataFrame,
    prev_hostdb: DataFrame | None = None,
    cur_time_ms: int = 0,
    dns_failed_hosts: DataFrame | None = None,
    purge_failed_hosts_threshold: int = -1,
) -> DataFrame:
    """Full UpdateHostDb: per-host status counts + score stats PLUS the
    HostDatum failure/homepage/last-check fields
    (hostdb/HostDatum.java:34-193; UpdateHostDbReducer.java:62-337;
    ResolverThread.java:60-100):

      * connection_failures — count of datums with retries-since-fetch
        != 0 (UpdateHostDbReducer.java:211-213);
      * homepage_url — the root URL `scheme://host/` when that row is
        fetched/notmodified (UpdateHostDbMapper.java:153-189's proposed
        homepage, minus live redirect resolution);
      * dns_failures — carried from the previous hostdb and updated by
        the resolver outcome: resolvable ⇒ reset to 0 (rediscovered),
        unresolvable ⇒ previous + 1 (ResolverThread.run). DNS itself is
        an external effect, so the resolver verdict arrives as the
        `dns_failed_hosts` DataFrame (host column) — at scale this is
        produced by a mapInPandas resolver stage over distinct hosts;
      * last_check — set on every checked host (setLastCheck);
      * purge — hosts whose dns_failures exceed the threshold are
        dropped (db.hostdb.purge.failed.hosts.threshold; NOTE the
        reference's keep-condition at ResolverThread.java:86-92 is
        inverted relative to its own documentation — we implement the
        documented semantics: keep while failures <= threshold).

    One groupBy(host) over the frontier + two small left joins
    (prev hostdb, resolver verdicts) — both broadcast-able; at 10^10
    scale the frontier aggregate is the only shuffle."""
    http_root = F.concat(F.lit("http://"), F.col("host"), F.lit("/"))
    https_root = F.concat(F.lit("https://"), F.col("host"), F.lit("/"))
    agg = hostdb(frontier).join(
        frontier.groupBy("host").agg(
            F.sum(F.when(F.col("retries") != 0, 1).otherwise(0)).alias(
                "connection_failures"
            ),
            F.max(
                F.when(
                    ((F.col("url") == http_root) | (F.col("url") == https_root))
                    & F.col("status").isin(
                        STATUS_DB_FETCHED, STATUS_DB_NOTMODIFIED
                    ),
                    F.col("url"),
                )
            ).alias("homepage_url"),
        ),
        "host",
    )
    prev = (
        prev_hostdb.select(
            "host", F.col("dns_failures").alias("_prev_dns")
        )
        if prev_hostdb is not None
        else None
    )
    failed = (
        dns_failed_hosts.select("host").distinct().withColumn(
            "_dns_failed", F.lit(True)
        )
        if dns_failed_hosts is not None
        else None
    )
    j = agg
    j = j.join(prev, "host", "left") if prev is not None else j.withColumn(
        "_prev_dns", F.lit(None).cast("int")
    )
    j = j.join(failed, "host", "left") if failed is not None else j.withColumn(
        "_dns_failed", F.lit(None).cast("boolean")
    )
    dns = F.when(
        F.coalesce(F.col("_dns_failed"), F.lit(False)),
        F.coalesce(F.col("_prev_dns"), F.lit(0)) + 1,
    ).otherwise(F.lit(0))
    out = j.withColumn("dns_failures", dns.cast("int")).withColumn(
        "last_check", F.lit(cur_time_ms).cast("long")
    ).drop("_prev_dns", "_dns_failed")
    if purge_failed_hosts_threshold != -1:
        out = out.filter(
            F.col("dns_failures") <= purge_failed_hosts_threshold
        )
    return out


def read_hostdb(
    hostdb_df: DataFrame,
    expr: str | None = None,
    dump_hostnames: bool = False,
    dump_homepages: bool = False,
) -> DataFrame:
    """ReadHostDb -dumpHostDb (hostdb/ReadHostDb.java:66-158): dump
    hostdb rows through an optional JEXL filter expression — here
    `F.expr` over the row's columns, same translation the CrawlDb
    dump uses (JexlUtil ≙ SQL boolean expressions). `dump_hostnames`
    emits only the host column, `dump_homepages` only the recorded
    homepage URLs (rows without one are skipped, ReadHostDb.java:
    133-145). The filter runs inside the scan stage — no shuffle."""
    out = hostdb_df
    if expr is not None:
        out = out.filter(F.expr(expr))
    if dump_homepages:
        return out.filter(F.col("homepage_url").isNotNull()).select(
            "homepage_url"
        )
    if dump_hostnames:
        return out.select("host")
    return out


def hostdb_get(hostdb_df: DataFrame, host: str) -> DataFrame:
    """ReadHostDb -get (ReadHostDb.java:176-202): one host's datum as
    key\\tvalue detail rows — here the row itself (point lookup)."""
    return hostdb_df.filter(F.col("host") == host)


def update_scores(
    frontier: DataFrame,
    scores: DataFrame,
    score_col: str = "score",
    clear_score: float = 0.0,
) -> DataFrame:
    """ScoreUpdater (scoring/webgraph/ScoreUpdater.java:65-110):
    overwrite frontier scores from a webgraph score table (LinkRank
    output); URLs with no node row get `clear_score`. One left join on
    url — broadcast-able when the score table is small, co-located at
    scale by the shared url bucketing."""
    sc = scores.select("url", F.col(score_col).alias("_new_score"))
    return (
        frontier.join(sc, "url", "left")
        .withColumn(
            "score",
            F.coalesce(
                F.col("_new_score").cast("float"),
                F.lit(float(clear_score)),
            ),
        )
        .drop("_new_score")
    )


def node_topn(
    nodes: DataFrame, by: str = "in_degree", n: int = 100
) -> DataFrame:
    """NodeDumper (scoring/webgraph/NodeDumper.java): top-N nodes by
    in/out degree or score — TakeOrderedAndProject, no global sort."""
    return nodes.orderBy(F.desc(by), F.asc("url")).limit(n)


def linkdb_dump(linkdb: DataFrame) -> DataFrame:
    """LinkDbReader -dump: one (url, from_url, anchor) row per inlink."""
    return linkdb.select(
        "url", F.explode("inlinks").alias("i")
    ).select("url", F.col("i.from_url").alias("from_url"),
             F.col("i.anchor").alias("anchor"))


def linkdb_get(linkdb: DataFrame, url: str) -> DataFrame:
    """LinkDbReader -url: the inlinks of one URL (point lookup; at
    scale the table's sort order prunes to one file)."""
    return linkdb_dump(linkdb.filter(F.col("url") == url))


def node_degrees(parse_data: DataFrame, linkdb: DataFrame) -> DataFrame:
    """WebGraph node table: out-degree ∪ in-degree per url."""
    out_deg = parse_data.select(
        "url", F.size(F.coalesce(F.col("outlinks"), F.array())).alias("out_degree")
    )
    in_deg = linkdb.select("url", F.size("inlinks").alias("in_degree"))
    return (
        out_deg.join(in_deg, "url", "full_outer")
        .select(
            "url",
            F.coalesce("out_degree", F.lit(0)).alias("out_degree"),
            F.coalesce("in_degree", F.lit(0)).alias("in_degree"),
        )
    )


def linkrank_quantized(
    edges: DataFrame,
    damping_pct: int = 85,
    iterations: int = 5,
    scale: int = 1_000_000,
    checkpoint_every: int = 3,
    checkpoint_partitions: int | None = None,
) -> DataFrame:
    """LinkRank in FIXED-POINT integer arithmetic: scores are bigint
    micro-units (×10^6) and every per-iteration op is an exact integer
    sum plus floor divisions — so the result is reduction-order
    independent and bit-identical across engines/parallelism (the
    double-sum variant below is order-sensitive, which is why it could
    only ever be rows-only checked). Quantization error is ≤ 1 unit
    (1e-6) per edge per iteration — negligible against d=0.85 damping.

      u₀ = scale;  uₖ₊₁ = (100−d%)·scale/100 + floor(d% · Σ floor(uₖ/outdeg) / 100)

    Same plan shape as `linkrank`: one groupBy + one join per
    iteration over a cached degree table, lineage cut every few
    rounds."""
    nodes = (
        edges.select(F.col("from_url").alias("url"))
        .union(edges.select(F.col("to_url").alias("url")))
        .distinct()
    )
    out_deg = edges.groupBy("from_url").agg(F.count("*").alias("out_degree"))
    edges_deg = edges.join(out_deg, "from_url").persist()
    base = (100 - damping_pct) * scale // 100
    units = nodes.withColumn("u", F.lit(scale).cast("long"))
    for i in range(iterations):
        contrib = (
            edges_deg.join(units, edges_deg.from_url == units.url)
            .select(
                F.col("to_url").alias("url"),
                F.floor(F.col("u") / F.col("out_degree")).cast("long").alias("c"),
            )
            .groupBy("url")
            .agg(F.sum("c").alias("insum"))
        )
        units = nodes.join(contrib, "url", "left").select(
            "url",
            (
                F.lit(base)
                + F.floor(
                    F.lit(damping_pct)
                    * F.coalesce(F.col("insum"), F.lit(0))
                    / F.lit(100)
                )
            ).cast("long").alias("u"),
        )
        if (i + 1) % checkpoint_every == 0:
            # `checkpoint_partitions` shrinks the materialized RDD for
            # SMALL graphs (a checkpoint write/read pays per-task
            # overhead on every one of the shuffle-partition tasks —
            # measured 4× on the sf0.1 gates); leave None at scale so
            # the score table keeps the shuffle-width layout.
            if checkpoint_partitions:
                units = units.coalesce(checkpoint_partitions)
            units = units.localCheckpoint(eager=True)
    edges_deg.unpersist()
    return units.select("url", F.col("u").alias("score_units"))


def linkrank(
    edges: DataFrame,
    damping: float = 0.85,
    iterations: int = 10,
    checkpoint_every: int = 3,
    checkpoint_partitions: int | None = None,
) -> DataFrame:
    """LinkRank (LinkRank.java:433-522): score = (1−d) + d·Σ contrib,
    over edges(from_url, to_url). Dangling handled rank-one style via
    the constant term only (reference uses rank-one correction).

    Iterative DataFrame loop with localCheckpoint to truncate lineage —
    each iteration is one shuffle (groupBy to_url) plus one join.
    """
    nodes = (
        edges.select(F.col("from_url").alias("url"))
        .union(edges.select(F.col("to_url").alias("url")))
        .distinct()
    )
    out_deg = edges.groupBy("from_url").agg(F.count("*").alias("out_degree"))
    # cache the static degree/edge tables once
    edges_deg = edges.join(out_deg, "from_url").persist()
    scores = nodes.withColumn("score", F.lit(1.0))
    for i in range(iterations):
        contrib = (
            edges_deg.join(scores, edges_deg.from_url == scores.url)
            .select(
                F.col("to_url").alias("url"),
                (F.col("score") / F.col("out_degree")).alias("c"),
            )
            .groupBy("url")
            .agg(F.sum("c").alias("in_score"))
        )
        scores = (
            nodes.join(contrib, "url", "left")
            .select(
                "url",
                (
                    F.lit(1.0 - damping)
                    + F.lit(damping) * F.coalesce("in_score", F.lit(0.0))
                ).alias("score"),
            )
        )
        if (i + 1) % checkpoint_every == 0:
            if checkpoint_partitions:  # small-graph hygiene, see above
                scores = scores.coalesce(checkpoint_partitions)
            scores = scores.localCheckpoint(eager=True)
    edges_deg.unpersist()
    return scores


def link_dumper(edges: DataFrame, scores: DataFrame) -> DataFrame:
    """LinkDumper (scoring/webgraph/LinkDumper.java:68-73): per target
    URL, its inlinks annotated with each inlink SOURCE's LinkRank
    score — the rank-debugging view ("why does this url rank this
    way"). One broadcast-able join of the edge list with the node
    score table; no per-key state.

    edges: (from_url, to_url); scores: (url, score_units) from
    linkrank_quantized (or any node-score table with those columns).
    """
    return (
        edges.join(
            scores.select(
                F.col("url").alias("from_url"),
                F.col("score_units").alias("from_score_units"),
            ),
            "from_url",
            "left",
        )
        .select(
            F.col("to_url").alias("url"),
            "from_url",
            F.coalesce(F.col("from_score_units"), F.lit(0)).cast("long")
            .alias("from_score_units"),
        )
    )
