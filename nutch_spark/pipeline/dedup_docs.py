"""Corpus deduplication operators: exact, n-gram Jaccard, MinHash+LSH,
SimHash.

Scale design (the reason each algorithm is shaped the way it is):

  - exact: one hash-groupBy on md5(text) — a single shuffle keyed by
    digest; at 100 TB pre-partition the write by digest-bucket so the
    groupBy is shuffle-free on re-runs.
  - n-gram Jaccard: the exact (quadratic-ish) path — explode distinct
    shingles, self-join on shingle, count intersections. Correct but
    the shingle join's fan-out is the cost; use it to VERIFY candidate
    pairs, not to generate them, beyond small corpora.
  - MinHash+LSH: the scale path — per-row signature (array program,
    no shuffle), banding, and a self-join on (band_idx, band_hash)
    buckets only. Candidates are then verified with the exact Jaccard
    join restricted to candidate pairs. The band join's skew (a hot
    bucket = a big dup cluster) is handled by AQE skew-join; bucket
    size can also be capped before the join.
  - SimHash: per-row 32-bit fingerprint from shingle hashes; near-dup
    pairs = hamming distance ≤ r, found by EXACT bit-band blocking
    (r+1 bands ⇒ any pair within distance r shares a band) — an
    equi-join on band value, never an all-pairs scan.

Hash discipline: every hash is md5-hex (lowercase) so test oracles in
any engine agree; a production deployment would swap in xxhash64 for
speed without changing semantics.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .textstats import shingles_col

ODD_HEX = ("1", "3", "5", "7", "9", "b", "d", "f")


def exact_dedup(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Group identical texts by md5; canonical row = min id per group."""
    h = F.md5(F.col(text_col))
    return (
        docs.select(F.col(id_col), h.alias("content_hash"))
        .groupBy("content_hash")
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count("*").alias("n_copies"),
        )
    )


def shingled(docs: DataFrame, text_col: str, id_col: str, n: int) -> DataFrame:
    # NOTE: downstream multi-reference consumers (minhash's 8 signature
    # columns) re-inline this projection, but with the slice-based
    # shingle builder the rebuild is ~0.5 s per reference at sf0.1 and
    # an evaluate-once barrier measured as a wash — the md5 transform
    # passes dominate.
    return docs.select(
        F.col(id_col).alias("id"),
        F.array_distinct(shingles_col(F.col(text_col), n)).alias("sh"),
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    threshold: float = 0.8,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Pairs (a < b) with Jaccard(shingle sets) ≥ threshold.

    With `candidates` (a DataFrame of (a, b)) ONLY those pairs are
    scored — the LSH verify path: candidate pairs join to the per-doc
    shingle arrays (two equi-joins on id, sized by |candidates|, not by
    corpus²) and Jaccard is computed per pair with array_intersect.
    Nothing explodes shingles globally, so verify cost scales with the
    candidate count — this is what makes MinHash+LSH actually cheap at
    100 TB. Without `candidates`, the brute-force baseline: explode
    distinct shingles and self-join on shingle (all co-shingled pairs)."""
    s = shingled(docs, text_col, id_col, n)
    if candidates is not None:
        # the candidate side is small, so AQE plans broadcast joins:
        # the corpus shingle table is SCANNED twice but never shuffled.
        # (A semi-join prune on candidate doc-ids was measured 5×
        # slower here — deriving the id set forces the whole candidate
        # pipeline, signatures included, to execute twice.)
        sa = s.select(F.col("id").alias("a"), F.col("sh").alias("sha"))
        sb = s.select(F.col("id").alias("b"), F.col("sh").alias("shb"))
        j = candidates.join(sa, "a").join(sb, "b")
        inter = F.size(F.array_intersect("sha", "shb"))
        jac = inter.cast("double") / (
            F.size("sha") + F.size("shb") - inter
        ).cast("double")
        return j.select("a", "b", jac.alias("jaccard")).filter(
            F.col("jaccard") >= F.lit(float(threshold))
        )
    sizes = s.select("id", F.size("sh").alias("sz"))
    ex = s.select("id", F.explode("sh").alias("g"))
    a = ex.select(F.col("id").alias("a"), "g")
    b = ex.select(F.col("id").alias("b"), "g")
    inter = (
        a.join(b, "g")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col("id").alias("a"), F.col("sz").alias("sza"))
    sb = sizes.select(F.col("id").alias("b"), F.col("sz").alias("szb"))
    j = inter.join(sa, "a").join(sb, "b")
    jac = F.col("inter").cast("double") / (
        F.col("sza") + F.col("szb") - F.col("inter")
    ).cast("double")
    return (
        j.select("a", "b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= F.lit(float(threshold)))
    )


def minhash_signatures(
    docs: DataFrame,
    num_perm: int = 8,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-doc MinHash signature: permutation i = lexicographic min of
    md5(i || shingle). A per-row array program — no shuffle, no UDF."""
    s = shingled(docs, text_col, id_col, n)

    def perm(i: int):
        # closure factory — a `lambda g, i=i:` two-arg lambda would be
        # interpreted by F.transform as its (element, index) form
        prefix = f"{i}|"
        return lambda g: F.md5(F.concat(F.lit(prefix), g))

    cols = [F.col("id")]
    for i in range(num_perm):
        cols.append(
            F.array_min(F.transform(F.col("sh"), perm(i))).alias(f"mh_{i}")
        )
    return s.select(*cols)


def lsh_candidate_pairs(
    signatures: DataFrame, num_perm: int = 8, band_rows: int = 2
) -> DataFrame:
    """Band the signature (bands of `band_rows` minima) and self-join
    per (band_idx, band_hash) bucket → distinct candidate pairs a<b."""
    n_bands = num_perm // band_rows
    bands = []
    for bidx in range(n_bands):
        parts = [
            F.col(f"mh_{bidx * band_rows + r}") for r in range(band_rows)
        ]
        bands.append(
            F.struct(
                F.lit(bidx).alias("bidx"),
                F.md5(F.concat_ws("#", *parts)).alias("bh"),
            )
        )
    e = signatures.select(
        "id", F.explode(F.array(*bands)).alias("band")
    ).select("id", F.col("band.bidx").alias("bidx"), F.col("band.bh").alias("bh"))
    a = e.select(F.col("id").alias("a"), "bidx", "bh")
    b = e.select(F.col("id").alias("b"), "bidx", "bh")
    return (
        a.join(b, ["bidx", "bh"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )


def minhash_dedup_pairs(
    docs: DataFrame,
    threshold: float = 0.8,
    num_perm: int = 8,
    band_rows: int = 2,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """End-to-end MinHash LSH near-dup detection: signature → band
    buckets → candidate pairs → exact-Jaccard verify ≥ threshold."""
    sigs = minhash_signatures(docs, num_perm, n, text_col, id_col)
    cands = lsh_candidate_pairs(sigs, num_perm, band_rows)
    return ngram_jaccard_pairs(
        docs, threshold, n, text_col, id_col, candidates=cands
    )


def _bit(h: Column, i: int) -> Column:
    """Bit i (≤ 31) of the fingerprint from md5 hex nibble parity (+1/-1).

    Kept for reference/tests; the aggregation below uses the chunked
    `conv` form (same parity, ~8× less per-row allocation)."""
    return F.when(
        F.substring(h, i + 1, 1).isin(*ODD_HEX), F.lit(1)
    ).otherwise(F.lit(-1))


def _nibble_parity_chunks(h: Column, bits: int) -> list[Column]:
    """Parse the md5 hex into 8-nibble integer chunks once; nibble i's
    parity is then a shift+mask on a long — far cheaper than 32
    substring+isin evaluations per row (less UTF8String allocation)."""
    n_chunks = (bits + 7) // 8
    return [
        F.conv(F.substring(h, 1 + 8 * j, 8), 16, 10).cast("long")
        for j in range(n_chunks)
    ]


def _parity01(chunks: list[Column], i: int) -> Column:
    """0/1 parity of hex nibble i via its chunk (nibble k-from-left of
    an 8-nibble value v = (v >> 4*(7-k)) & 1 for the low bit)."""
    j, k = divmod(i, 8)
    return F.shiftrightunsigned(chunks[j], 4 * (7 - k)).bitwiseAND(F.lit(1))


def simhash(
    docs: DataFrame,
    n: int = 3,
    bits: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """SimHash over shingle features (default 32-bit — one parity bit
    per md5 hex nibble, the widest this scheme supports; wider
    fingerprints make the bit-band buckets in `simhash_pairs`
    exponentially finer): bit i of the fingerprint
    is the majority of bit i over all shingle hashes. explode+groupBy
    (one shuffle on doc id); the per-feature bit extraction stays in
    codegen."""
    s = shingled(docs, text_col, id_col, n)
    ex = s.select("id", F.explode("sh").alias("g")).withColumn(
        "h", F.md5(F.col("g"))
    )
    chunks = _nibble_parity_chunks(F.col("h"), bits)
    # sum of 0/1 parities + total count; bit set iff strict majority
    # (2·ones > n) — identical to the ±1-sum > 0 rule incl. ties
    aggs = [F.count("*").alias("_n")] + [
        F.sum(_parity01(chunks, i)).alias(f"s{i}") for i in range(bits)
    ]
    summed = ex.groupBy("id").agg(*aggs)
    fp = None
    for i in range(bits):
        term = F.when(
            F.col(f"s{i}") * 2 > F.col("_n"), F.lit(1 << i)
        ).otherwise(F.lit(0))
        fp = term if fp is None else fp + term
    return summed.select("id", fp.cast("long").alias("simhash"))


def simhash_pairs(
    docs: DataFrame,
    max_distance: int = 2,
    n: int = 3,
    bits: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance ≤ max_distance.

    Pair generation is EXACT bit-band blocking, not an all-pairs scan:
    split the fingerprint into max_distance+1 contiguous bit bands — by
    pigeonhole, any pair within hamming distance ≤ max_distance agrees
    exactly on at least one band — equi-join per (band_idx, band_value)
    bucket, then verify the true hamming distance on the (few) bucket
    collisions. Same output set as the O(n²) crossJoin, but the join is
    a shuffle on band value: cost scales with bucket collisions, and a
    hot band bucket (a big dup cluster) splits under AQE skew-join."""
    sh = simhash(docs, n, bits, text_col, id_col)
    n_bands = max_distance + 1
    base_w, extra = divmod(bits, n_bands)
    bands = []
    lo = 0
    for i in range(n_bands):
        width = base_w + (1 if i < extra else 0)
        mask = (1 << width) - 1
        bands.append(
            F.struct(
                F.lit(i).alias("bidx"),
                F.shiftrightunsigned(F.col("simhash"), lo)
                .bitwiseAND(F.lit(mask))
                .alias("bv"),
            )
        )
        lo += width
    e = sh.select(
        "id", "simhash", F.explode(F.array(*bands)).alias("band")
    ).select(
        "id",
        "simhash",
        F.col("band.bidx").alias("bidx"),
        F.col("band.bv").alias("bv"),
    )
    a = e.select(F.col("id").alias("a"), F.col("simhash").alias("ha"), "bidx", "bv")
    b = e.select(F.col("id").alias("b"), F.col("simhash").alias("hb"), "bidx", "bv")
    cand = (
        a.join(b, ["bidx", "bv"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", "ha", "hb")
        .distinct()  # a pair may collide in several bands
    )
    dist = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    return (
        cand.withColumn("hamming", dist.cast("long"))
        .filter(F.col("hamming") <= max_distance)
        .select("a", "b", "hamming")
    )


def dedup_clusters(
    pairs: DataFrame,
    a_col: str = "a",
    b_col: str = "b",
    max_iterations: int = 25,
    checkpoint_partitions: int | None = None,
) -> DataFrame:
    """Resolve near-duplicate PAIRS into duplicate CLUSTERS: connected
    components over the undirected pair graph, labeling every node
    with the minimum doc id in its component (the canonical
    representative — keep cluster_id, drop the rest, exactly like
    DeduplicationJob's keep-one but across transitive matches).

    Min-label propagation: each round every node takes
    min(own label, neighbors' labels) — one join + one groupBy per
    round, lineage cut with localCheckpoint (the LinkRank discipline),
    stopping when a round changes nothing. Rounds needed = component
    diameter; near-dup clusters are small and dense (every member
    pairs with most others), so this converges in 2-3 rounds — the
    log-round star-contraction variant (Kiveris et al., "Connected
    Components in MapReduce") is the upgrade path if components with
    large diameters ever appear. min() is reduction-order independent,
    so the labeling is deterministic under any partitioning.

    Output: (doc_id, cluster_id) for every node that appears in a
    pair; singletons never enter the graph (their cluster is
    themselves by definition).
    """
    def _cut(df: DataFrame) -> DataFrame:
        # small-graph checkpoint hygiene: a localCheckpoint pays
        # per-task overhead on every shuffle-width partition, so the
        # gates shrink the materialized frame first (measured 4× on
        # the sf0.1 linkrank gates); None at scale keeps the layout
        if checkpoint_partitions:
            df = df.coalesce(checkpoint_partitions)
        return df.localCheckpoint()

    fwd = pairs.select(F.col(a_col).alias("u"), F.col(b_col).alias("v"))
    edges = _cut(
        fwd.union(
            fwd.select(F.col("v").alias("u"), F.col("u").alias("v"))
        ).distinct()
    )
    labels = _cut(
        edges.select("u").distinct()
        .select(F.col("u").alias("node"), F.col("u").alias("label"))
    )
    for _ in range(max_iterations):
        nbr = (
            edges.join(labels, edges.v == labels.node)
            .groupBy("u")
            .agg(F.min("label").alias("nbr_min"))
        )
        new_labels = _cut(
            labels.join(nbr, labels.node == nbr.u, "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce(F.col("nbr_min"), F.col("label"))
                ).alias("label"),
            )
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    else:
        # the loop exhausted max_iterations with labels still moving:
        # a component's diameter exceeds the budget and the returned
        # labels would silently split that component — surface it.
        import warnings

        warnings.warn(
            f"dedup_clusters: label propagation did not converge within "
            f"max_iterations={max_iterations}; a connected component has "
            f"diameter > {max_iterations} and its labels are truncated. "
            f"Raise max_iterations (rounds needed = component diameter).",
            RuntimeWarning,
            stacklevel=2,
        )
    return labels.select(
        F.col("node").alias("doc_id"), F.col("label").alias("cluster_id")
    )
