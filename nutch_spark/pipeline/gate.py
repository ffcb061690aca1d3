"""Correctness-gate wiring for the training-data pipeline operators.

Same discipline as nutch_spark/gate.py: each query runs a REAL
pipeline operator over the driver's parquet tables (documents /
embeddings / events, plus a derived dup-corpus), and the oracle
re-expresses its semantics in DuckDB SQL. Hashes are md5-hex
everywhere (identical across engines); floats only ever come from
exact-integer inputs through an identical IEEE op sequence.

The dup-corpus derivation plants both exact duplicates (doc_id+100000)
and near-duplicates (doc_id+200000 with three appended tokens) so the
dedup family has real positives to find.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..gate import _views

CORPUS_SQL = """
SELECT doc_id, text FROM documents
UNION ALL
SELECT doc_id + 100000 AS doc_id, text FROM documents WHERE doc_id % 4 = 0
UNION ALL
SELECT doc_id + 200000 AS doc_id,
       concat(text, ' qqextra zzword yynear') AS text
FROM documents WHERE doc_id % 5 = 0
"""

# DuckDB-side twin of textstats.shingles_col + array_distinct
_SHINGLE_CTES = f"""
corpus AS ({CORPUS_SQL}),
tok AS (SELECT doc_id, text, string_split(text, ' ') AS t FROM corpus),
sh AS (
  SELECT doc_id, unnest(
    case when len(t) >= 3
         then list_transform(range(1, len(t) - 1),
                             i -> concat(t[i], ' ', t[i+1], ' ', t[i+2]))
         else [text] end) AS g
  FROM tok),
dsh AS (SELECT DISTINCT doc_id, g FROM sh)
"""

_ODD = "('1','3','5','7','9','b','d','f')"


def corpus_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, ["documents"])
    # the documents parquet ships in ~3 files; the dedup family's
    # per-row shingle/hash work is expression-heavy (interpreted inside
    # array lambdas), so spread it across the full core count — at
    # production scale the input table already has proper partitioning
    n = int(spark.conf.get("spark.sql.shuffle.partitions"))
    return spark.sql(CORPUS_SQL).repartition(n)


# ---------------------------------------------------------------------
# dedup family
# ---------------------------------------------------------------------

def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .dedup_docs import exact_dedup

    out = exact_dedup(corpus_df(spark, sf_dir))
    return out.select(
        "content_hash",
        F.col("canonical_id").cast("long").alias("canonical_id"),
        F.col("n_copies").cast("long").alias("n_copies"),
    )


ORACLE_DEDUP_EXACT = f"""
WITH corpus AS ({CORPUS_SQL})
SELECT md5(text) AS content_hash,
       cast(min(doc_id) as bigint) AS canonical_id,
       cast(count(*) as bigint) AS n_copies
FROM corpus GROUP BY md5(text)
"""


def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .dedup_docs import ngram_jaccard_pairs

    out = ngram_jaccard_pairs(corpus_df(spark, sf_dir), threshold=0.8)
    return out.select(
        F.col("a").cast("long").alias("a"),
        F.col("b").cast("long").alias("b"),
        F.col("jaccard").cast("double").alias("jaccard"),
    )


ORACLE_NGRAM_JACCARD = f"""
WITH {_SHINGLE_CTES},
sz AS (SELECT doc_id, count(*) AS s FROM dsh GROUP BY doc_id),
inter AS (
  SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS i
  FROM dsh x JOIN dsh y ON x.g = y.g AND x.doc_id < y.doc_id
  GROUP BY x.doc_id, y.doc_id)
SELECT cast(a as bigint) AS a, cast(b as bigint) AS b,
       cast(i as double) / cast(sa.s + sb.s - i as double) AS jaccard
FROM inter
JOIN sz sa ON sa.doc_id = a
JOIN sz sb ON sb.doc_id = b
WHERE cast(i as double) / cast(sa.s + sb.s - i as double) >= 0.8
"""


def q_minhash_signature(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .dedup_docs import minhash_signatures

    out = minhash_signatures(corpus_df(spark, sf_dir), num_perm=8)
    return out.select(
        F.col("id").cast("long").alias("doc_id"),
        *[F.col(f"mh_{i}") for i in range(8)],
    )


_MH_COLS = ",\n       ".join(
    f"min(md5(concat('{i}|', g))) AS mh_{i}" for i in range(8)
)
ORACLE_MINHASH_SIG = f"""
WITH {_SHINGLE_CTES}
SELECT cast(doc_id as bigint) AS doc_id,
       {_MH_COLS}
FROM dsh GROUP BY doc_id
"""

_SIGS_CTE = f"""
sigs AS (
  SELECT doc_id, {_MH_COLS}
  FROM dsh GROUP BY doc_id),
bands AS (
  SELECT doc_id,
         md5(concat(mh_0, '#', mh_1)) AS b0,
         md5(concat(mh_2, '#', mh_3)) AS b1,
         md5(concat(mh_4, '#', mh_5)) AS b2,
         md5(concat(mh_6, '#', mh_7)) AS b3
  FROM sigs)
"""


def q_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .dedup_docs import minhash_dedup_pairs

    out = minhash_dedup_pairs(corpus_df(spark, sf_dir), threshold=0.8)
    return out.select(
        F.col("a").cast("long").alias("a"),
        F.col("b").cast("long").alias("b"),
        F.col("jaccard").cast("double").alias("jaccard"),
    )


ORACLE_MINHASH_LSH = f"""
WITH {_SHINGLE_CTES},
{_SIGS_CTE},
cand AS (
  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
  FROM bands x JOIN bands y
    ON x.doc_id < y.doc_id
   AND (x.b0 = y.b0 OR x.b1 = y.b1 OR x.b2 = y.b2 OR x.b3 = y.b3)),
sz AS (SELECT doc_id, count(*) AS s FROM dsh GROUP BY doc_id),
inter AS (
  SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS i
  FROM dsh x JOIN dsh y ON x.g = y.g AND x.doc_id < y.doc_id
  GROUP BY x.doc_id, y.doc_id)
SELECT cast(inter.a as bigint) AS a, cast(inter.b as bigint) AS b,
       cast(i as double) / cast(sa.s + sb.s - i as double) AS jaccard
FROM inter
JOIN cand ON cand.a = inter.a AND cand.b = inter.b
JOIN sz sa ON sa.doc_id = inter.a
JOIN sz sb ON sb.doc_id = inter.b
WHERE cast(i as double) / cast(sa.s + sb.s - i as double) >= 0.8
"""


def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .dedup_docs import dedup_clusters, minhash_dedup_pairs

    pairs = minhash_dedup_pairs(corpus_df(spark, sf_dir), threshold=0.8)
    out = dedup_clusters(pairs, checkpoint_partitions=8)
    return out.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("cluster_id").cast("long").alias("cluster_id"),
    )


# connected components over the verified LSH pairs: recursive
# min-label closure (DuckDB recursive CTE reaches the true fixpoint,
# the Spark loop iterates to convergence — both are the exact
# component labeling, so they match value-for-value)
ORACLE_DEDUP_CLUSTERS = f"""
WITH RECURSIVE {_SHINGLE_CTES},
{_SIGS_CTE},
cand AS (
  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
  FROM bands x JOIN bands y
    ON x.doc_id < y.doc_id
   AND (x.b0 = y.b0 OR x.b1 = y.b1 OR x.b2 = y.b2 OR x.b3 = y.b3)),
sz AS (SELECT doc_id, count(*) AS s FROM dsh GROUP BY doc_id),
inter AS (
  SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS i
  FROM dsh x JOIN dsh y ON x.g = y.g AND x.doc_id < y.doc_id
  GROUP BY x.doc_id, y.doc_id),
pairs AS (
  SELECT inter.a, inter.b
  FROM inter
  JOIN cand ON cand.a = inter.a AND cand.b = inter.b
  JOIN sz sa ON sa.doc_id = inter.a
  JOIN sz sb ON sb.doc_id = inter.b
  WHERE cast(i as double) / cast(sa.s + sb.s - i as double) >= 0.8),
edges AS (
  SELECT a AS u, b AS v FROM pairs
  UNION
  SELECT b AS u, a AS v FROM pairs),
reach(node, label) AS (
  SELECT u, u FROM edges
  UNION
  SELECT e.u, r.label FROM edges e JOIN reach r ON e.v = r.node)
SELECT cast(node as bigint) AS doc_id,
       cast(min(label) as bigint) AS cluster_id
FROM reach GROUP BY node
"""


def q_simhash_sig(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .dedup_docs import simhash

    out = simhash(corpus_df(spark, sf_dir))
    return out.select(
        F.col("id").cast("long").alias("doc_id"),
        F.col("simhash").cast("long").alias("simhash"),
    )


_BIT_SUMS = ",\n       ".join(
    f"sum(case when substr(h, {i + 1}, 1) in {_ODD} then 1 else -1 end) AS s{i}"
    for i in range(32)
)
_BIT_VAL = " + ".join(
    f"(case when s{i} > 0 then {1 << i} else 0 end)" for i in range(32)
)
_SIMHASH_CTE = f"""
hsh AS (SELECT doc_id, md5(g) AS h FROM dsh),
bits AS (
  SELECT doc_id, {_BIT_SUMS}
  FROM hsh GROUP BY doc_id),
simh AS (
  SELECT cast(doc_id as bigint) AS doc_id,
         cast({_BIT_VAL} as bigint) AS simhash
  FROM bits)
"""

ORACLE_SIMHASH_SIG = f"""
WITH {_SHINGLE_CTES},
{_SIMHASH_CTE}
SELECT doc_id, simhash FROM simh
"""


def q_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .dedup_docs import simhash_pairs

    out = simhash_pairs(corpus_df(spark, sf_dir), max_distance=2)
    return out.select(
        F.col("a").cast("long").alias("a"),
        F.col("b").cast("long").alias("b"),
        F.col("hamming").cast("long").alias("hamming"),
    )


ORACLE_SIMHASH_PAIRS = f"""
WITH {_SHINGLE_CTES},
{_SIMHASH_CTE}
SELECT x.doc_id AS a, y.doc_id AS b,
       cast(bit_count(xor(x.simhash, y.simhash)) as bigint) AS hamming
FROM simh x JOIN simh y ON x.doc_id < y.doc_id
WHERE bit_count(xor(x.simhash, y.simhash)) <= 2
"""


# ---------------------------------------------------------------------
# text analysis
# ---------------------------------------------------------------------

def q_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .textstats import token_stats

    _views(spark, sf_dir, ["documents"])
    return token_stats(spark.table("documents"))


ORACLE_TOKEN_STATS = """
SELECT cast(doc_id as bigint) AS doc_id,
       cast(length(text) as bigint) AS n_chars,
       cast(len(regexp_extract_all(text, '[a-z0-9]+')) as bigint) AS n_tokens,
       cast(len(regexp_extract_all(text, '[a-z0-9]')) as bigint) AS n_alnum,
       cast(len(regexp_extract_all(text, '[^a-z0-9 ]')) as bigint) AS n_punct,
       cast(len(regexp_extract_all(text, '[a-z0-9]+'))
            + len(regexp_extract_all(text, '[^a-z0-9 ]')) as bigint)
         AS n_bpe_pieces
FROM documents
"""


def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .textstats import quality_scores

    _views(spark, sf_dir, ["documents"])
    return quality_scores(spark.table("documents"))


_EN_PAT = " (the|a|an|of|to|in|and|is) "
ORACLE_TEXT_QUALITY = f"""
WITH c AS (
  SELECT doc_id,
    cast(len(regexp_extract_all(text, '[a-z0-9]+')) as double) AS n_tokens,
    cast(len(regexp_extract_all(text, '[a-z0-9]')) as double) AS n_alnum,
    cast(len(regexp_extract_all(text, '[^a-z0-9 ]')) as double) AS n_punct,
    cast(length(text) as double) AS n_chars,
    cast(len(regexp_extract_all(concat(' ', text, ' '), '{_EN_PAT}'))
         as double) AS stops
  FROM documents)
SELECT cast(doc_id as bigint) AS doc_id,
       cast(n_tokens as bigint) AS n_tokens,
       n_alnum / (n_tokens + 1.0) AS mean_token_len,
       n_punct / (n_chars + 1.0) AS punct_ratio,
       stops / (n_tokens + 1.0) AS stopword_ratio,
       (n_tokens / (n_tokens + 50.0)) * (1.0 - n_punct / (n_chars + 1.0))
         * (0.5 + stops / (n_tokens + 1.0)) AS quality
FROM c
"""


def q_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .textstats import detect_language

    _views(spark, sf_dir, ["documents"])
    return detect_language(spark.table("documents"))


def _hits(pat: str) -> str:
    return f"len(regexp_extract_all(concat(' ', text, ' '), ' ({pat}) '))"


def _langid_oracle() -> str:
    """Generated from textstats.LANG_STOPWORDS — single source of
    truth, so Spark ladder and SQL ladder cannot drift."""
    from .textstats import LANG_STOPWORDS

    langs = list(LANG_STOPWORDS)
    hit_cols = ",\n    ".join(
        f"cast({_hits('|'.join(LANG_STOPWORDS[l]))} as bigint) AS hits_{l}"
        for l in langs
    )
    cases = []
    for i, l in enumerate(langs[:-1]):
        conds = " AND ".join(f"hits_{l} >= hits_{l2}" for l2 in langs[i + 1:])
        cases.append(f"when {conds} then '{l}'")
    ladder = "case " + " ".join(cases) + f" else '{langs[-1]}' end"
    out_cols = ", ".join(f"hits_{l}" for l in langs)
    return (
        "WITH c AS (\n  SELECT doc_id,\n    " + hit_cols
        + "\n  FROM documents)\n"
        + "SELECT cast(doc_id as bigint) AS doc_id,\n       "
        + out_cols + ",\n       " + ladder + " AS detected_lang\nFROM c"
    )


ORACLE_LANGID = _langid_oracle()


def q_text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .textstats import repetition_stats

    _views(spark, sf_dir, ["documents"])
    return repetition_stats(
        spark.table("documents").select(F.col("doc_id").cast("long"), "text")
    )


ORACLE_TEXT_REPETITION = """
WITH t AS (
  SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents
), gr AS (
  SELECT doc_id, len(toks)::bigint AS n_tokens,
    CASE WHEN len(toks) >= 2
         THEN list_transform(range(1, len(toks)),
                             i -> toks[i] || ' ' || toks[i+1])
         ELSE [text] END AS g2,
    CASE WHEN len(toks) >= 3
         THEN list_transform(range(1, len(toks) - 1),
                             i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
         ELSE [text] END AS g3
  FROM t
), u2 AS (
  SELECT doc_id, unnest(g2) AS g FROM gr
), c2 AS (
  SELECT doc_id, g, count(*)::bigint AS c FROM u2 GROUP BY 1, 2
), s2 AS (
  SELECT doc_id, sum(c)::bigint AS total, max(c)::bigint AS mx,
         sum(CASE WHEN c > 1 THEN c ELSE 0 END)::bigint AS dup
  FROM c2 GROUP BY 1
), u3 AS (
  SELECT doc_id, unnest(g3) AS g FROM gr
), c3 AS (
  SELECT doc_id, g, count(*)::bigint AS c FROM u3 GROUP BY 1, 2
), s3 AS (
  SELECT doc_id, sum(c)::bigint AS total, max(c)::bigint AS mx,
         sum(CASE WHEN c > 1 THEN c ELSE 0 END)::bigint AS dup
  FROM c3 GROUP BY 1
)
SELECT cast(gr.doc_id as bigint) AS doc_id, gr.n_tokens,
       s2.mx::double / s2.total::double AS top2_frac,
       s2.dup::double / s2.total::double AS dup2_frac,
       s3.mx::double / s3.total::double AS top3_frac,
       s3.dup::double / s3.total::double AS dup3_frac
FROM gr JOIN s2 USING (doc_id) JOIN s3 USING (doc_id)
"""


def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .textstats import fingerprints

    _views(spark, sf_dir, ["documents"])
    return fingerprints(spark.table("documents")).select(
        F.col("doc_id").cast("long").alias("doc_id"), "fingerprint"
    )


ORACLE_FINGERPRINT = """
WITH tok AS (SELECT doc_id, text, string_split(text, ' ') AS t FROM documents),
shl AS (
  SELECT doc_id,
    case when len(t) >= 3
         then list_transform(range(1, len(t) - 1),
                             i -> concat(t[i], ' ', t[i+1], ' ', t[i+2]))
         else [text] end AS gs
  FROM tok)
SELECT cast(doc_id as bigint) AS doc_id,
       array_to_string(list_sort(list_transform(gs, g -> md5(g)))[1:4], ',')
         AS fingerprint
FROM shl
"""


# ---------------------------------------------------------------------
# similarity search
# ---------------------------------------------------------------------

VEC_CORPUS_SQL_DUCK = """
  SELECT vec_id, list_transform(embedding, x -> cast(x as double))
           AS embedding
  FROM embeddings
  UNION ALL
  SELECT vec_id + 100000 AS vec_id,
         list_transform(embedding, x -> cast(x as double)) AS embedding
  FROM embeddings WHERE vec_id % 4 = 0
  UNION ALL
  SELECT vec_id + 200000 AS vec_id,
         list_transform(embedding,
                        x -> cast(x as double) + cast(0.01 as double))
           AS embedding
  FROM embeddings WHERE vec_id % 5 = 0
"""


def vec_corpus_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derived vector dup-corpus, mirroring CORPUS_SQL for embeddings:
    exact duplicates (vec_id+100000, cosine = 1.0) and near-duplicates
    (vec_id+200000, each component +0.01 → cosine ≈ 0.99+); background
    pair similarity tops out ≈ 0.52, so a 0.9 threshold is unambiguous.
    All arithmetic is float→double then +0.01 — IEEE-identical to the
    DuckDB derivation above."""
    _views(spark, sf_dir, ["embeddings"])
    e = spark.table("embeddings")
    as_dbl = F.col("embedding").cast("array<double>")
    base = e.select("vec_id", as_dbl.alias("embedding"))
    exact = e.filter(F.col("vec_id") % 4 == 0).select(
        (F.col("vec_id") + 100000).alias("vec_id"), as_dbl.alias("embedding")
    )
    near = e.filter(F.col("vec_id") % 5 == 0).select(
        (F.col("vec_id") + 200000).alias("vec_id"),
        F.transform(as_dbl, lambda x: x + F.lit(0.01)).alias("embedding"),
    )
    n = int(spark.conf.get("spark.sql.shuffle.partitions"))
    return base.unionByName(exact).unionByName(near).repartition(n)


def q_dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs via SRP bit-band blocking +
    candidate-only cosine verify — the vector-column member of the
    dedup family (exact / Jaccard / MinHash-LSH / SimHash / this)."""
    from .similarity import embedding_dup_pairs

    out = embedding_dup_pairs(vec_corpus_df(spark, sf_dir), threshold=0.9)
    return out.select(
        F.col("a").cast("long").alias("a"),
        F.col("b").cast("long").alias("b"),
        F.col("sim").cast("double").alias("sim"),
    )


def _srp_sgn_values(bits: int = 16, dim: int = 64) -> str:
    """The SRP sign table inlined as SQL VALUES rows — generated from
    the SAME srp_signs() constants the Spark operator uses, so the two
    engines cannot drift."""
    from .similarity import srp_signs

    return ", ".join(
        f"({i}, [{', '.join(map(str, row))}])"
        for i, row in enumerate(srp_signs(bits, dim))
    )


ORACLE_DEDUP_EMBEDDING = f"""
WITH vcorpus AS ({VEC_CORPUS_SQL_DUCK}),
q AS (SELECT vec_id,
             list_transform(embedding,
               x -> cast(floor(x * 1000.0) as bigint)) AS v
      FROM vcorpus),
n AS (SELECT vec_id, v,
             cast(list_sum(list_transform(v, y -> y * y)) as double) AS nn
      FROM q),
sgn(i, sg) AS (VALUES {_srp_sgn_values()}),
proj AS (SELECT n.vec_id, s.i, list_dot_product(n.v, s.sg) AS pr
         FROM n, sgn s),
fp AS (SELECT vec_id,
              cast(sum(CASE WHEN pr > 0 THEN 1 << i ELSE 0 END) as bigint)
                AS f
       FROM proj GROUP BY vec_id),
bands AS (SELECT vec_id, b AS bidx, (f >> (4 * b)) & 15 AS bv
          FROM fp, range(0, 4) t(b)),
cand AS (SELECT DISTINCT x.vec_id AS a, y.vec_id AS b
         FROM bands x JOIN bands y
           ON x.bidx = y.bidx AND x.bv = y.bv AND x.vec_id < y.vec_id),
sims AS (SELECT cand.a, cand.b,
                list_dot_product(na.v, nb.v) / (sqrt(na.nn) * sqrt(nb.nn))
                  AS sim
         FROM cand
         JOIN n na ON na.vec_id = cand.a
         JOIN n nb ON nb.vec_id = cand.b)
SELECT cast(a as bigint) AS a, cast(b as bigint) AS b, sim
FROM sims WHERE sim >= 0.9
"""


def q_knn_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    # knn_blocked: distributed block-matrix exact kNN — no driver
    # collect/broadcast of the corpus (knn_numpy is the small-probe
    # baseline; its driver-side matrix is a scale ceiling)
    from .similarity import knn_blocked

    _views(spark, sf_dir, ["embeddings"])
    return knn_blocked(spark.table("embeddings"), k=5)


_Q_CTE = """
q AS (SELECT vec_id,
             list_transform(embedding,
               x -> cast(floor(cast(x as double) * 1000.0) as bigint)) AS v
      FROM embeddings),
n AS (SELECT vec_id, v,
             cast(list_sum(list_transform(v, y -> y * y)) as double) AS nn
      FROM q)
"""

ORACLE_KNN_COSINE = f"""
WITH {_Q_CTE},
p AS (
  SELECT a.vec_id AS a, b.vec_id AS b,
         list_dot_product(a.v, b.v) / (sqrt(a.nn) * sqrt(b.nn)) AS sim
  FROM n a, n b WHERE a.vec_id <> b.vec_id),
r AS (SELECT a, b, sim,
             row_number() OVER (PARTITION BY a ORDER BY sim DESC, b ASC)
               AS rank
      FROM p)
SELECT cast(a as bigint) AS vec_id, cast(b as bigint) AS neighbor_id,
       sim, cast(rank as bigint) AS rank
FROM r WHERE rank <= 5
"""


def q_knn_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .similarity import knn_ivf

    _views(spark, sf_dir, ["embeddings"])
    return knn_ivf(spark.table("embeddings"), k=5, n_pivots=16)


def q_knn_ivf_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF with ONE deterministic Lloyd round (floor(avg) integer
    centroids) and TWO query probes — the trained/multi-probe scale
    path; exact-SQL-expressible because centroid math is order-
    independent integer arithmetic."""
    from .similarity import knn_ivf

    _views(spark, sf_dir, ["embeddings"])
    return knn_ivf(
        spark.table("embeddings"), k=5, n_pivots=16,
        n_probes=2, kmeans_iterations=1,
    )


# one unrolled k-means round over the quantized vectors (dim = 64),
# then corpus top-1 / query top-2 assignment against the new pivots
ORACLE_KNN_IVF_KMEANS = f"""
WITH {_Q_CTE},
piv0 AS (SELECT vec_id AS p, v AS pv, nn AS pn FROM n WHERE vec_id < 16),
ps0 AS (
  SELECT n.vec_id, n.v, n.nn, piv0.p,
         list_dot_product(n.v, piv0.pv) / (sqrt(n.nn) * sqrt(piv0.pn)) AS psim
  FROM n, piv0),
asg0 AS (
  SELECT vec_id, v, p AS cluster FROM (
    SELECT *, row_number() OVER (
      PARTITION BY vec_id ORDER BY psim DESC, p ASC) AS r
    FROM ps0) t WHERE r = 1),
cent AS (
  SELECT cluster AS p, i AS dim,
         cast(floor(avg(v[i])) as bigint) AS c
  FROM asg0, range(1, 65) t(i) GROUP BY cluster, i),
newpv AS (SELECT p, list(c ORDER BY dim) AS cv FROM cent GROUP BY p),
piv1 AS (
  SELECT piv0.p, coalesce(newpv.cv, piv0.pv) AS pv,
         cast(list_sum(list_transform(coalesce(newpv.cv, piv0.pv),
                                      y -> y * y)) as double) AS pn
  FROM piv0 LEFT JOIN newpv ON piv0.p = newpv.p),
ps1 AS (
  SELECT n.vec_id, n.v, n.nn, piv1.p,
         list_dot_product(n.v, piv1.pv) / (sqrt(n.nn) * sqrt(piv1.pn)) AS psim
  FROM n, piv1),
ranked AS (
  SELECT vec_id, v, nn, p, row_number() OVER (
    PARTITION BY vec_id ORDER BY psim DESC, p ASC) AS r
  FROM ps1),
corpus AS (SELECT vec_id, v, nn, p AS cluster FROM ranked WHERE r = 1),
probes AS (SELECT vec_id, v, nn, p AS cluster FROM ranked WHERE r <= 2),
pp AS (
  SELECT DISTINCT a.vec_id AS a, b.vec_id AS b,
         list_dot_product(a.v, b.v) / (sqrt(a.nn) * sqrt(b.nn)) AS sim
  FROM probes a JOIN corpus b
    ON a.cluster = b.cluster AND a.vec_id <> b.vec_id),
r AS (SELECT a, b, sim,
             row_number() OVER (PARTITION BY a ORDER BY sim DESC, b ASC)
               AS rank
      FROM pp)
SELECT cast(a as bigint) AS vec_id, cast(b as bigint) AS neighbor_id,
       sim, cast(rank as bigint) AS rank
FROM r WHERE rank <= 5
"""


ORACLE_KNN_IVF = f"""
WITH {_Q_CTE},
piv AS (SELECT vec_id AS p, v AS pv, nn AS pn FROM n WHERE vec_id < 16),
ps AS (
  SELECT n.vec_id, n.v, n.nn, piv.p,
         list_dot_product(n.v, piv.pv) / (sqrt(n.nn) * sqrt(piv.pn)) AS psim
  FROM n, piv),
asg AS (
  SELECT vec_id, v, nn, p AS cluster FROM (
    SELECT *, row_number() OVER (
      PARTITION BY vec_id ORDER BY psim DESC, p ASC) AS r
    FROM ps) WHERE r = 1),
pp AS (
  SELECT a.vec_id AS a, b.vec_id AS b,
         list_dot_product(a.v, b.v) / (sqrt(a.nn) * sqrt(b.nn)) AS sim
  FROM asg a JOIN asg b
    ON a.cluster = b.cluster AND a.vec_id <> b.vec_id),
r AS (SELECT a, b, sim,
             row_number() OVER (PARTITION BY a ORDER BY sim DESC, b ASC)
               AS rank
      FROM pp)
SELECT cast(a as bigint) AS vec_id, cast(b as bigint) AS neighbor_id,
       sim, cast(rank as bigint) AS rank
FROM r WHERE rank <= 5
"""


# ---------------------------------------------------------------------
# multimodal
# ---------------------------------------------------------------------

_MEDIA_CTE = """
m AS (
  SELECT cast(doc_id as bigint) AS doc_id,
         concat('media://', md5(text)) AS media_ref,
         case cast(doc_id % 3 as int)
              when 0 then 'image' when 1 then 'audio'
              else 'video' end AS media_type
  FROM documents),
dec AS (
  SELECT doc_id, media_ref, media_type, md5(media_ref) AS h FROM m),
decoded AS (
  SELECT doc_id, media_ref, media_type,
         cast(64 + (ascii(substr(h, 1, 1)) % 8) * 32 as bigint) AS width,
         cast(64 + (ascii(substr(h, 2, 1)) % 8) * 32 as bigint) AS height,
         cast(1 + ascii(substr(h, 3, 1)) % 3 as bigint) AS channels,
         cast(case when media_type <> 'video' then 1
                   else 8 + ascii(substr(h, 4, 1)) % 120 end as bigint)
           AS n_frames,
         cast(ascii(substr(h, 5, 1)) % 128 as bigint) AS mean_pixel
  FROM dec)
"""


def q_media_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .multimodal import decode_media, synth_media

    _views(spark, sf_dir, ["documents"])
    out = decode_media(synth_media(spark.table("documents")))
    return out.select(
        "doc_id", "media_ref", "media_type",
        "width", "height", "channels", "n_frames", "mean_pixel",
    )


ORACLE_MEDIA_DECODE = f"""
WITH {_MEDIA_CTE}
SELECT doc_id, media_ref, media_type, width, height, channels, n_frames,
       mean_pixel
FROM decoded
"""


def q_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .multimodal import decode_media, frame_sample, synth_media

    _views(spark, sf_dir, ["documents"])
    dec = decode_media(synth_media(spark.table("documents")))
    return frame_sample(dec, every=10).select(
        "doc_id", "media_ref", F.col("frame_idx").cast("long").alias("frame_idx")
    )


ORACLE_FRAME_SAMPLE = f"""
WITH {_MEDIA_CTE}
SELECT doc_id, media_ref,
       cast(unnest(range(0, n_frames, 10)) as bigint) AS frame_idx
FROM decoded WHERE media_type = 'video'
"""


# ---------------------------------------------------------------------
# events rollup
# ---------------------------------------------------------------------

def q_events_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch rollup + its Structured Streaming twin, tag-unioned: the
    'stream' leg runs rollup_stream (readStream → event-time window →
    agg) with trigger(availableNow) into a complete-mode memory sink —
    complete mode emits every window regardless of watermark progress,
    so the streaming execution engine itself must reproduce the batch
    aggregation exactly under the value-hash oracle (the append-mode
    watermark-emission subset is covered in pytest)."""
    import os
    import tempfile
    import uuid

    from .rollup import hourly_rollup, rollup_stream

    _views(spark, sf_dir, ["events"])
    out = hourly_rollup(spark.table("events"))
    batch = out.select(
        F.lit("batch").alias("leg"),
        "hour",
        "event_type",
        F.col("n_events").cast("long").alias("n_events"),
        F.col("sum_cents").cast("long").alias("sum_cents"),
        F.col("min_event_id").cast("long").alias("min_event_id"),
        F.col("max_event_id").cast("long").alias("max_event_id"),
        F.col("n_users").cast("long").alias("n_users"),
    )

    # FileStreamSource ingests a DIRECTORY; the driver tables are
    # single files, so stage the events into one (≙ a landing zone)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    srcdir = os.path.join(
        tempfile.mkdtemp(prefix="gate_rollsrc_"), "events"
    )
    ev.write.parquet(srcdir)
    name = "gate_rollup_stream_" + uuid.uuid4().hex[:8]
    q = (
        rollup_stream(spark, srcdir, ev.schema)
        .writeStream.format("memory")
        .queryName(name)
        .option(
            "checkpointLocation", tempfile.mkdtemp(prefix="gate_rollck_")
        )
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    stream = spark.table(name).select(
        F.lit("stream").alias("leg"),
        "hour",
        "event_type",
        F.col("n_events").cast("long").alias("n_events"),
        F.col("sum_cents").cast("long").alias("sum_cents"),
        F.lit(None).cast("long").alias("min_event_id"),
        F.lit(None).cast("long").alias("max_event_id"),
        F.lit(None).cast("long").alias("n_users"),
    )
    return batch.unionByName(stream)


ORACLE_EVENTS_ROLLUP = """
WITH roll AS (
  SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H') AS hour,
         event_type,
         cast(count(*) as bigint) AS n_events,
         cast(sum(cast(floor(value * 100.0) as bigint)) as bigint)
           AS sum_cents,
         cast(min(event_id) as bigint) AS min_event_id,
         cast(max(event_id) as bigint) AS max_event_id,
         cast(count(DISTINCT user_id) as bigint) AS n_users
  FROM events GROUP BY 1, 2)
SELECT 'batch' AS leg, * FROM roll
UNION ALL
SELECT 'stream' AS leg, hour, event_type, n_events, sum_cents,
       cast(NULL as bigint) AS min_event_id,
       cast(NULL as bigint) AS max_event_id,
       cast(NULL as bigint) AS n_users
FROM roll
"""


# ---------------------------------------------------------------------
# merged gates — the driver correctness-checks at most 50 queries, so
# gates that share an input scan and a natural key are merged into one
# row each: the merged Spark query joins/unions the SAME operator
# outputs the standalone gates ran, and the merged oracle wraps the
# standalone oracles verbatim as subqueries. Every operator keeps its
# own oracle-checked gate row this way; nothing lost but registry slots.
# ---------------------------------------------------------------------


def q_text_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """token_stats ⋈ quality_scores ⋈ detect_language ⋈ fingerprints on
    doc_id — the full single-pass text-analysis feature set (each
    operator still runs unmodified; quality's duplicate n_tokens is
    dropped in favor of token_stats')."""
    tok = q_token_stats(spark, sf_dir)
    qual = q_text_quality(spark, sf_dir).drop("n_tokens")
    lang = q_langid(spark, sf_dir)
    fp = q_fingerprint(spark, sf_dir)
    return tok.join(qual, "doc_id").join(lang, "doc_id").join(fp, "doc_id")


def _text_features_oracle() -> str:
    from .textstats import LANG_STOPWORDS

    hit_cols = ", ".join(f"l.hits_{lang}" for lang in LANG_STOPWORDS)
    return f"""
SELECT t.doc_id, t.n_chars, t.n_tokens, t.n_alnum, t.n_punct,
       t.n_bpe_pieces,
       q.mean_token_len, q.punct_ratio, q.stopword_ratio, q.quality,
       {hit_cols}, l.detected_lang,
       f.fingerprint
FROM ({ORACLE_TOKEN_STATS}) t
JOIN ({ORACLE_TEXT_QUALITY}) q ON t.doc_id = q.doc_id
JOIN ({ORACLE_LANGID}) l ON t.doc_id = l.doc_id
JOIN ({ORACLE_FINGERPRINT}) f ON t.doc_id = f.doc_id
"""


ORACLE_TEXT_FEATURES = _text_features_oracle()


def q_dedup_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash signature ⋈ SimHash fingerprint on doc_id — the two
    per-document dedup sketches over the same dup-corpus."""
    mh = q_minhash_signature(spark, sf_dir)
    sh = q_simhash_sig(spark, sf_dir)
    return mh.join(sh, "doc_id")


ORACLE_DEDUP_FINGERPRINTS = f"""
SELECT m.*, s.simhash
FROM ({ORACLE_MINHASH_SIG}) m
JOIN ({ORACLE_SIMHASH_SIG}) s ON m.doc_id = s.doc_id
"""


def q_media_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """decode_media joined with the frame_sample aggregate — the full
    multimodal plumbing (decode metadata + per-video sampled-frame
    count/max) in one gate row."""
    dec = q_media_decode(spark, sf_dir)
    frames = (
        q_frame_sample(spark, sf_dir)
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_sampled_frames"),
            F.max("frame_idx").alias("max_sampled_frame"),
        )
    )
    return dec.join(frames, "doc_id", "left").select(
        dec["*"],
        F.coalesce(F.col("n_sampled_frames"), F.lit(0))
        .cast("long")
        .alias("n_sampled_frames"),
        F.coalesce(F.col("max_sampled_frame"), F.lit(-1))
        .cast("long")
        .alias("max_sampled_frame"),
    )


ORACLE_MEDIA_PIPELINE = f"""
SELECT d.*, coalesce(g.cnt, 0) AS n_sampled_frames,
       coalesce(g.mx, -1) AS max_sampled_frame
FROM ({ORACLE_MEDIA_DECODE}) d
LEFT JOIN (
  SELECT doc_id, cast(count(*) as bigint) AS cnt,
         cast(max(frame_idx) as bigint) AS mx
  FROM ({ORACLE_FRAME_SAMPLE}) f GROUP BY doc_id
) g ON d.doc_id = g.doc_id
"""


def q_knn_ivf_both(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF kNN, both variants tag-unioned: 'flat' (raw pivots, 1 probe)
    and 'kmeans1' (one deterministic Lloyd round, 2 probes)."""
    flat = q_knn_ivf(spark, sf_dir).select(
        F.lit("flat").alias("variant"), "*"
    )
    km = q_knn_ivf_kmeans(spark, sf_dir).select(
        F.lit("kmeans1").alias("variant"), "*"
    )
    return flat.unionByName(km)


ORACLE_KNN_IVF_BOTH = f"""
SELECT 'flat' AS variant, * FROM ({ORACLE_KNN_IVF})
UNION ALL
SELECT 'kmeans1' AS variant, * FROM ({ORACLE_KNN_IVF_KMEANS})
"""


PIPELINE_QUERIES: dict[str, tuple] = {
    "dedup_exact": (q_dedup_exact, ORACLE_DEDUP_EXACT),
    "dedup_ngram_jaccard": (q_ngram_jaccard, ORACLE_NGRAM_JACCARD),
    "dedup_fingerprints": (q_dedup_fingerprints, ORACLE_DEDUP_FINGERPRINTS),
    "dedup_minhash_lsh": (q_minhash_lsh_pairs, ORACLE_MINHASH_LSH),
    "dedup_clusters": (q_dedup_clusters, ORACLE_DEDUP_CLUSTERS),
    "dedup_simhash_pairs": (q_simhash_pairs, ORACLE_SIMHASH_PAIRS),
    "dedup_embedding": (q_dedup_embedding, ORACLE_DEDUP_EMBEDDING),
    "text_features": (q_text_features, ORACLE_TEXT_FEATURES),
    "text_repetition": (q_text_repetition, ORACLE_TEXT_REPETITION),
    "knn_cosine": (q_knn_cosine, ORACLE_KNN_COSINE),
    "knn_ivf": (q_knn_ivf_both, ORACLE_KNN_IVF_BOTH),
    "media_pipeline": (q_media_pipeline, ORACLE_MEDIA_PIPELINE),
    "events_rollup": (q_events_rollup, ORACLE_EVENTS_ROLLUP),
}
