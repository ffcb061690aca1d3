"""Embedding similarity search: brute-force cosine k-NN + IVF variant.

Numeric discipline: embeddings are quantized to integers
(floor(x·1000)) so dot products and norms are EXACT integer sums —
order-independent, reproducible at any parallelism, and comparable
bit-for-bit against any SQL oracle. The only floating-point ops are
one sqrt per vector and one divide per pair (IEEE-deterministic).

Scale design:
  - brute force is the O(n²) baseline: a crossJoin whose pair count
    explodes quadratically — correct at test scale, verification-only
    beyond it. Two implementations: pure Catalyst (zip_with/aggregate)
    and an Arrow-batched numpy matmul (`knn_numpy`) that broadcasts
    the quantized matrix and does int64 BLAS per batch — the same
    arithmetic, ~50× faster, still O(n²).
  - IVF (inverted-file) is the scale path: assign each vector to its
    nearest pivot (coarse quantizer), search only within the probed
    cluster(s). Pair count drops to Σ cluster², and the cluster
    assignment is an embarrassingly-parallel map. Pivots here are the
    first `n_pivots` vectors (deterministic); a production deployment
    would k-means them the same shape.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

QUANT = 1000.0


def quantized(vec: Column) -> Column:
    """float array → exact integer array: floor(cast(x as double)·1000)."""
    return F.transform(
        vec, lambda x: F.floor(x.cast("double") * F.lit(QUANT)).cast("long")
    )


def _sq_norm(v: Column) -> Column:
    return F.aggregate(
        v, F.lit(0).cast("long"), lambda acc, x: acc + x * x
    )


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def _prep(emb: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    q = emb.select(
        F.col(id_col).alias("id"), quantized(F.col(vec_col)).alias("v")
    )
    return q.withColumn("nn", _sq_norm(F.col("v")))


def _cosine(dot: Column, na: Column, nb: Column) -> Column:
    # sim = dot / (sqrt(na) * sqrt(nb)) — identical op order everywhere
    return dot.cast("double") / (
        F.sqrt(na.cast("double")) * F.sqrt(nb.cast("double"))
    )


def knn_cosine(
    emb: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors per vector (brute force, Catalyst).

    Ties break on neighbor id ascending, so results are total-ordered
    and deterministic."""
    q = _prep(emb, id_col, vec_col)
    a = q.select(
        F.col("id").alias("a"), F.col("v").alias("va"), F.col("nn").alias("na")
    )
    b = q.select(
        F.col("id").alias("b"), F.col("v").alias("vb"), F.col("nn").alias("nb")
    )
    pairs = a.crossJoin(b).filter(F.col("a") != F.col("b"))
    sims = pairs.select(
        "a",
        "b",
        _cosine(
            _dot(F.col("va"), F.col("vb")), F.col("na"), F.col("nb")
        ).alias("sim"),
    )
    w = Window.partitionBy("a").orderBy(F.desc("sim"), F.asc("b"))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("a").alias("vec_id"),
            F.col("b").alias("neighbor_id"),
            "sim",
            F.col("rank").cast("long").alias("rank"),
        )
    )


def knn_numpy(
    emb: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Same result as `knn_cosine`, via broadcast int64 matmul in an
    Arrow-batched stage — the throughput shape for the O(n²) baseline."""
    import numpy as np  # noqa: PLC0415
    import pandas as pd  # noqa: PLC0415

    spark = emb.sparkSession
    q = _prep(emb, id_col, vec_col)
    rows = q.orderBy("id").collect()
    ids = np.array([r.id for r in rows], dtype="int64")
    mat = np.array([r.v for r in rows], dtype="int64")
    norms = np.sqrt(np.array([r.nn for r in rows], dtype="float64"))
    bc = spark.sparkContext.broadcast((ids, mat, norms))

    def topk(batches):
        b_ids, b_mat, b_norms = bc.value
        for pdf in batches:
            out = {"vec_id": [], "neighbor_id": [], "sim": [], "rank": []}
            if not len(pdf):
                yield pd.DataFrame(out)
                continue
            qm = np.array(pdf["v"].to_list(), dtype="int64")
            qn = np.sqrt(pdf["nn"].to_numpy().astype("float64"))
            dots = qm @ b_mat.T  # exact int64
            sims = dots.astype("float64") / (
                qn[:, None] * b_norms[None, :]
            )
            for r in range(len(pdf)):
                me = pdf["id"].iloc[r]
                s = sims[r].copy()
                mask = b_ids == me
                s[mask] = -np.inf
                # total order: sim desc, id asc; drop the -inf self
                # slot BEFORE slicing so k >= n never emits a self-pair
                # (knn_cosine and the oracle exclude self via a != b)
                order = np.lexsort((b_ids, -s))
                order = order[s[order] > -np.inf][:k]
                for rank, j in enumerate(order, start=1):
                    out["vec_id"].append(me)
                    out["neighbor_id"].append(b_ids[j])
                    # recompute with the scalar op order used everywhere
                    out["sim"].append(
                        float(dots[r, j]) / (float(qn[r]) * float(b_norms[j]))
                    )
                    out["rank"].append(rank)
            yield pd.DataFrame(out)

    schema = "vec_id long, neighbor_id long, sim double, rank long"
    return q.mapInPandas(topk, schema)


def knn_blocked(
    emb: DataFrame,
    k: int = 5,
    n_blocks: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact brute-force top-k as a DISTRIBUTED block-matrix product —
    the scale-safe shape for the O(n²) baseline (same results as
    `knn_cosine`/`knn_numpy`, same IEEE scalar op order):

      1. hash rows into `n_blocks` blocks; pack each block into one row
         (id/vector/norm arrays) — executor memory holds two blocks at
         a time, never the corpus;
      2. crossJoin the n_blocks² (query-block × corpus-block) pairs and
         compute each cell's int64 matmul in an Arrow batch, emitting a
         per-query LOCAL top-k per corpus block (global top-k ⊆ union
         of per-block top-k);
      3. one window merge ranks the n_blocks·k survivors per query.

    No driver collect, no broadcast of the corpus: the driver-memory
    ceiling of `knn_numpy` is gone, and blocks size independently of n
    (pick n_blocks ≈ corpus_bytes / 100 MB at scale). Cost is still
    quadratic compute — IVF is the sub-quadratic path."""
    import numpy as np  # noqa: PLC0415
    import pandas as pd  # noqa: PLC0415

    q = _prep(emb, id_col, vec_col)
    blk = q.withColumn("blk", F.pmod(F.col("id"), F.lit(n_blocks)).cast("int"))
    packed = blk.groupBy("blk").agg(
        F.collect_list(F.struct("id", "v", "nn")).alias("rows")
    )
    qb = packed.select(F.col("blk").alias("qblk"), F.col("rows").alias("qrows"))
    cb = packed.select(F.col("blk").alias("cblk"), F.col("rows").alias("crows"))
    # n_blocks² cells; spread them so each task owns ~one matmul
    cells = qb.crossJoin(cb).repartition(n_blocks * n_blocks)

    def cell_topk(batches):
        for pdf in batches:
            out = {"vec_id": [], "neighbor_id": [], "sim": []}
            for qrows, crows in zip(pdf["qrows"], pdf["crows"]):
                q_ids = np.array([r["id"] for r in qrows], dtype="int64")
                q_mat = np.array([r["v"] for r in qrows], dtype="int64")
                q_nrm = np.sqrt(
                    np.array([r["nn"] for r in qrows], dtype="float64")
                )
                c_ids = np.array([r["id"] for r in crows], dtype="int64")
                c_mat = np.array([r["v"] for r in crows], dtype="int64")
                c_nrm = np.sqrt(
                    np.array([r["nn"] for r in crows], dtype="float64")
                )
                dots = q_mat @ c_mat.T  # exact int64
                sims = dots.astype("float64") / (
                    q_nrm[:, None] * c_nrm[None, :]
                )
                for r in range(len(q_ids)):
                    s = sims[r].copy()
                    s[c_ids == q_ids[r]] = -np.inf  # self (same block only)
                    order = np.lexsort((c_ids, -s))
                    order = order[s[order] > -np.inf][:k]
                    for j in order:
                        out["vec_id"].append(q_ids[r])
                        out["neighbor_id"].append(c_ids[j])
                        # scalar op order identical to knn_cosine/oracle
                        out["sim"].append(
                            float(dots[r, j])
                            / (float(q_nrm[r]) * float(c_nrm[j]))
                        )
            yield pd.DataFrame(out)

    partial = cells.mapInPandas(
        cell_topk, "vec_id long, neighbor_id long, sim double"
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        partial.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("vec_id", "neighbor_id", "sim", F.col("rank").cast("long").alias("rank"))
    )


def srp_signs(bits: int = 16, dim: int = 64) -> list[list[int]]:
    """Deterministic ±1 random-hyperplane table: sign(i, d) = +1 iff
    the first hex nibble of md5("i|d") is odd. Pure constants (data-
    independent), identical in any engine/language — the oracle SQL
    inlines the same table, so there is no RNG to keep in sync."""
    import hashlib  # noqa: PLC0415

    return [
        [
            1
            if int(hashlib.md5(f"{i}|{d}".encode()).hexdigest()[0], 16) & 1
            else -1
            for d in range(dim)
        ]
        for i in range(bits)
    ]


def srp_fingerprint(
    emb: DataFrame,
    bits: int = 16,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Signed-random-projection fingerprint over the QUANTIZED vectors:
    bit i = 1 iff Σ_d sign(i,d)·v[d] > 0 (exact integer sums, strict
    inequality — ties land on 0 identically everywhere). Angle-
    preserving: P[bit differs] = angle/π, so near-parallel vectors
    share almost all bits. A per-row array program — no shuffle."""
    q = _prep(emb, id_col, vec_col)
    signs = srp_signs(bits, dim)
    fp = None
    for i in range(bits):
        sg = F.array(*[F.lit(s) for s in signs[i]])
        proj = F.aggregate(
            F.zip_with(F.col("v"), sg, lambda x, s: x * s),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        term = F.when(proj > 0, F.lit(1 << i)).otherwise(F.lit(0))
        fp = term if fp is None else fp + term
    return q.withColumn("srp", fp.cast("long"))


def embedding_dup_pairs(
    emb: DataFrame,
    threshold: float = 0.9,
    bits: int = 16,
    n_bands: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (a < b, cosine ≥
    threshold) — the dedup-family member for vector columns.

    Scale shape (same as the MinHash-LSH and SimHash paths): candidate
    generation is an equi-join on (band_idx, band_value) buckets of the
    SRP fingerprint — never an all-pairs scan — and the exact cosine is
    verified ONLY on bucket collisions, by joining the (small) candidate
    pair set back to the vector table twice. Cost scales with bucket
    collisions; a hot bucket (a big dup cluster) splits under AQE
    skew-join. Banding is the standard LSH trade: a qualifying pair is
    found iff it agrees exactly on ≥ 1 of the `n_bands` bit-bands
    (near-parallel vectors agree on almost all bits, so recall at
    cosine ≥ 0.9 is ~1; the brute-force twin below is the recall
    audit). The oracle replays the same sign table + banding, so the
    gate checks the algorithm exactly, not a looser superset."""
    f = srp_fingerprint(emb, bits, dim, id_col, vec_col)
    base_w, extra = divmod(bits, n_bands)
    bands = []
    lo = 0
    for i in range(n_bands):
        width = base_w + (1 if i < extra else 0)
        mask = (1 << width) - 1
        bands.append(
            F.struct(
                F.lit(i).alias("bidx"),
                F.shiftrightunsigned(F.col("srp"), lo)
                .bitwiseAND(F.lit(mask))
                .alias("bv"),
            )
        )
        lo += width
    e = f.select("id", F.explode(F.array(*bands)).alias("band")).select(
        "id", F.col("band.bidx").alias("bidx"), F.col("band.bv").alias("bv")
    )
    ca = e.select(F.col("id").alias("a"), "bidx", "bv")
    cb = e.select(F.col("id").alias("b"), "bidx", "bv")
    cand = (
        ca.join(cb, ["bidx", "bv"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )
    va = f.select(F.col("id").alias("a"), F.col("v").alias("va"), F.col("nn").alias("na"))
    vb = f.select(F.col("id").alias("b"), F.col("v").alias("vb"), F.col("nn").alias("nb"))
    j = cand.join(va, "a").join(vb, "b")
    sim = _cosine(_dot(F.col("va"), F.col("vb")), F.col("na"), F.col("nb"))
    return (
        j.select("a", "b", sim.alias("sim"))
        .filter(F.col("sim") >= F.lit(float(threshold)))
    )


def embedding_dup_pairs_exact(
    emb: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Brute-force twin of `embedding_dup_pairs` (all-pairs cosine ≥
    threshold) — O(n²) verification baseline / recall audit only."""
    q = _prep(emb, id_col, vec_col)
    a = q.select(
        F.col("id").alias("a"), F.col("v").alias("va"), F.col("nn").alias("na")
    )
    b = q.select(
        F.col("id").alias("b"), F.col("v").alias("vb"), F.col("nn").alias("nb")
    )
    pairs = a.crossJoin(b).filter(F.col("a") < F.col("b"))
    sim = _cosine(_dot(F.col("va"), F.col("vb")), F.col("na"), F.col("nb"))
    return (
        pairs.select("a", "b", sim.alias("sim"))
        .filter(F.col("sim") >= F.lit(float(threshold)))
    )


def ivf_assign(
    emb: DataFrame,
    n_pivots: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign each vector to its max-cosine pivot (pivots = the
    `n_pivots` lowest-id vectors). Deterministic: ties break on pivot
    id ascending."""
    q = _prep(emb, id_col, vec_col)
    piv = q.filter(F.col("id") < n_pivots).select(
        F.col("id").alias("p"), F.col("v").alias("pv"), F.col("nn").alias("pn")
    )
    sims = q.crossJoin(F.broadcast(piv)).select(
        "id",
        "v",
        "nn",
        "p",
        _cosine(_dot(F.col("v"), F.col("pv")), F.col("nn"), F.col("pn")).alias(
            "psim"
        ),
    )
    w = Window.partitionBy("id").orderBy(F.desc("psim"), F.asc("p"))
    return (
        sims.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") == 1)
        .select("id", "v", "nn", F.col("p").alias("cluster"))
    )


def kmeans_pivots(
    emb: DataFrame,
    n_pivots: int = 16,
    iterations: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic Lloyd k-means over the QUANTIZED vectors: init =
    the `n_pivots` lowest-id vectors, assign by max cosine (ties →
    lowest pivot id), centroid = per-dimension floor(avg) — exact
    integer sums make the floor reduction-order independent, so the
    trained pivots are bit-identical at any parallelism (and SQL-
    expressible for the gate). Empty clusters keep their previous
    centroid. One crossJoin(broadcast pivots) + one posexplode
    aggregate per iteration."""
    q = _prep(emb, id_col, vec_col)
    piv = q.filter(F.col("id") < n_pivots).select(
        F.col("id").alias("p"), F.col("v").alias("pv"), F.col("nn").alias("pn")
    )
    for _ in range(iterations):
        sims = q.crossJoin(F.broadcast(piv)).select(
            "id",
            "v",
            "p",
            _cosine(
                _dot(F.col("v"), F.col("pv")), F.col("nn"), F.col("pn")
            ).alias("psim"),
        )
        w = Window.partitionBy("id").orderBy(F.desc("psim"), F.asc("p"))
        asg = (
            sims.withColumn("r", F.row_number().over(w))
            .filter(F.col("r") == 1)
            .select("v", F.col("p").alias("cluster"))
        )
        cent = (
            asg.select("cluster", F.posexplode("v").alias("dim", "x"))
            .groupBy("cluster", "dim")
            .agg(F.floor(F.avg("x")).cast("long").alias("c"))
            .groupBy("cluster")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("dim", "c"))),
                    lambda s: s["c"],
                ).alias("cv")
            )
        )
        piv = (
            piv.join(cent, piv.p == cent.cluster, "left")
            .select(
                "p", F.coalesce(F.col("cv"), F.col("pv")).alias("pv")
            )
            .withColumn("pn", _sq_norm(F.col("pv")))
        )
        # Materialize the trained pivots each round: they are
        # O(n_pivots) driver state (the canonical k-means broadcast
        # pattern — NOT a corpus collect), and every downstream
        # reference would otherwise re-execute the whole
        # crossJoin+window+posexplode training chain (knn_ivf uses piv
        # twice: corpus top-1 and query top-p assignment).
        piv = _materialize_small(piv)
    return piv


def _materialize_small(df: DataFrame) -> DataFrame:
    """Collect a provably-small DataFrame (pivot table) and re-create
    it as a local relation, cutting the lineage so consumers broadcast
    literal rows instead of replaying the producing plan."""
    spark = df.sparkSession
    return spark.createDataFrame(df.collect(), df.schema)


def _assign_top(q: DataFrame, piv: DataFrame, n: int) -> DataFrame:
    """Top-n max-cosine pivots per vector (ties → lowest pivot id)."""
    sims = q.crossJoin(F.broadcast(piv)).select(
        "id",
        "v",
        "nn",
        "p",
        _cosine(_dot(F.col("v"), F.col("pv")), F.col("nn"), F.col("pn")).alias(
            "psim"
        ),
    )
    w = Window.partitionBy("id").orderBy(F.desc("psim"), F.asc("p"))
    return (
        sims.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= n)
        .select("id", "v", "nn", F.col("p").alias("cluster"))
    )


def knn_ivf(
    emb: DataFrame,
    k: int = 5,
    n_pivots: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_probes: int = 1,
    kmeans_iterations: int = 0,
) -> DataFrame:
    """Approximate top-k: exact search within the probed cluster(s).
    Defaults reproduce the single-probe, first-vectors-as-pivots
    baseline exactly; `kmeans_iterations` trains the pivots with
    deterministic Lloyd rounds, and `n_probes` > 1 searches each
    query's top-p clusters (corpus stays top-1 assigned) — recall goes
    up with probe count at Σ probed-cluster-size pair cost."""
    if kmeans_iterations > 0 or n_probes > 1:
        q = _prep(emb, id_col, vec_col)
        piv = kmeans_pivots(
            emb, n_pivots, kmeans_iterations, id_col, vec_col
        ) if kmeans_iterations > 0 else q.filter(
            F.col("id") < n_pivots
        ).select(
            F.col("id").alias("p"), F.col("v").alias("pv"),
            F.col("nn").alias("pn"),
        )
        corpus = _assign_top(q, piv, 1)
        probes = _assign_top(q, piv, n_probes)
        a = probes.select(
            F.col("id").alias("a"), F.col("v").alias("va"),
            F.col("nn").alias("na"), "cluster",
        )
        b = corpus.select(
            F.col("id").alias("b"), F.col("v").alias("vb"),
            F.col("nn").alias("nb"), F.col("cluster").alias("cluster_b"),
        )
        pairs = a.join(b, F.col("cluster") == F.col("cluster_b")).filter(
            F.col("a") != F.col("b")
        ).dropDuplicates(["a", "b"])
        sims = pairs.select(
            "a",
            "b",
            _cosine(
                _dot(F.col("va"), F.col("vb")), F.col("na"), F.col("nb")
            ).alias("sim"),
        )
        w = Window.partitionBy("a").orderBy(F.desc("sim"), F.asc("b"))
        return (
            sims.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(
                F.col("a").alias("vec_id"),
                F.col("b").alias("neighbor_id"),
                "sim",
                F.col("rank").cast("long").alias("rank"),
            )
        )
    assigned = ivf_assign(emb, n_pivots, id_col, vec_col)
    a = assigned.select(
        F.col("id").alias("a"), F.col("v").alias("va"),
        F.col("nn").alias("na"), "cluster",
    )
    b = assigned.select(
        F.col("id").alias("b"), F.col("v").alias("vb"),
        F.col("nn").alias("nb"), F.col("cluster").alias("cluster_b"),
    )
    pairs = a.join(b, F.col("cluster") == F.col("cluster_b")).filter(
        F.col("a") != F.col("b")
    )
    sims = pairs.select(
        "a",
        "b",
        _cosine(_dot(F.col("va"), F.col("vb")), F.col("na"), F.col("nb")).alias(
            "sim"
        ),
    )
    w = Window.partitionBy("a").orderBy(F.desc("sim"), F.asc("b"))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("a").alias("vec_id"),
            F.col("b").alias("neighbor_id"),
            "sim",
            F.col("rank").cast("long").alias("rank"),
        )
    )
