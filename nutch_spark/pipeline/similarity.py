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


def knn_ivf(
    emb: DataFrame,
    k: int = 5,
    n_pivots: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: exact search within the assigned cluster only
    (single-probe IVF). Deterministic; recall < 1 by design."""
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
