"""Training-data pipeline operator tests (semantic assertions — the
engine-vs-DuckDB parity gate lives in tools/check_gate.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from nutch_spark.pipeline.dedup_docs import (
    exact_dedup,
    minhash_dedup_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash,
    simhash_pairs,
)
from nutch_spark.pipeline.multimodal import (
    decode_media,
    frame_sample,
    media_features,
    synth_media,
)
from nutch_spark.pipeline.rollup import hourly_rollup
from nutch_spark.pipeline.similarity import knn_cosine, knn_ivf, knn_numpy
from nutch_spark.pipeline.textstats import (
    detect_language,
    fingerprints,
    quality_scores,
    token_stats,
)

BASE = "the quick brown fox jumps over the lazy dog near a river bank today"


def docs_df(spark):
    rows = [
        Row(doc_id=0, text=BASE),
        Row(doc_id=1, text=BASE),  # exact dup of 0
        Row(doc_id=2, text=BASE + " extra trailing words here"),  # near dup
        Row(doc_id=3, text="completely different content about spark "
                           "shuffles and partitions and executors at scale"),
        Row(doc_id=4, text="short text"),
    ]
    return spark.createDataFrame(rows)


def test_exact_dedup_groups(spark):
    out = {r.canonical_id: r.n_copies for r in exact_dedup(docs_df(spark)).collect()}
    assert out[0] == 2  # docs 0+1 collapse, canonical = min id
    assert out[2] == 1 and out[3] == 1 and out[4] == 1


def test_ngram_jaccard_finds_near_dups(spark):
    pairs = {(r.a, r.b): r.jaccard for r in
             ngram_jaccard_pairs(docs_df(spark), threshold=0.5).collect()}
    assert pairs[(0, 1)] == 1.0  # exact dup
    assert (0, 2) in pairs and 0.5 <= pairs[(0, 2)] < 1.0  # near dup
    assert (0, 3) not in pairs  # unrelated


def test_minhash_lsh_recovers_dups(spark):
    sigs = minhash_signatures(docs_df(spark)).collect()
    by_id = {r.id: [r[f"mh_{i}"] for i in range(8)] for r in sigs}
    assert by_id[0] == by_id[1]  # identical docs → identical signature
    pairs = {(r.a, r.b) for r in
             minhash_dedup_pairs(docs_df(spark), threshold=0.5).collect()}
    assert (0, 1) in pairs
    assert (0, 3) not in pairs


def test_simhash_near_means_close(spark):
    h = {r.id: r.simhash for r in simhash(docs_df(spark)).collect()}
    assert h[0] == h[1]
    assert 0 <= h[0] < (1 << 32)  # 32-bit fingerprint
    pairs = {(r.a, r.b): r.hamming for r in
             simhash_pairs(docs_df(spark), max_distance=4).collect()}
    assert pairs[(0, 1)] == 0


def test_token_stats_counts(spark):
    df = spark.createDataFrame([Row(doc_id=0, text="ab cd, ef! 12")])
    r = token_stats(df).collect()[0]
    assert r.n_tokens == 4
    assert r.n_punct == 2  # ',' and '!'
    assert r.n_alnum == 8
    assert r.n_bpe_pieces == 6
    assert r.n_chars == 13


def test_quality_monotone_in_length(spark):
    df = spark.createDataFrame(
        [Row(doc_id=0, text="a b"), Row(doc_id=1, text=(BASE + " ") * 20)]
    )
    q = {r.doc_id: r.quality for r in quality_scores(df).collect()}
    assert q[1] > q[0]


def test_langid_english(spark):
    out = detect_language(docs_df(spark)).collect()
    assert all(r.detected_lang == "en" for r in out)
    assert all(r.hits_en > 0 for r in out if r.doc_id in (0, 1, 2))


def test_fingerprint_stable_and_dedup_friendly(spark):
    fp = {r.doc_id: r.fingerprint for r in fingerprints(docs_df(spark)).collect()}
    assert fp[0] == fp[1]  # identical docs → identical fingerprint
    assert fp[0] != fp[3]
    assert len(fp[0].split(",")) == 4


def emb_df(spark):
    rows = [
        Row(vec_id=0, embedding=[1.0, 0.0, 0.0]),
        Row(vec_id=1, embedding=[0.9, 0.1, 0.0]),   # closest to 0
        Row(vec_id=2, embedding=[0.0, 1.0, 0.0]),
        Row(vec_id=3, embedding=[0.0, 0.95, 0.05]),  # closest to 2
        Row(vec_id=4, embedding=[-1.0, 0.0, 0.0]),
    ]
    return spark.createDataFrame(rows)


def test_knn_cosine_neighbors(spark):
    top1 = {
        r.vec_id: r.neighbor_id
        for r in knn_cosine(emb_df(spark), k=1).collect()
    }
    assert top1[0] == 1 and top1[1] == 0
    assert top1[2] == 3 and top1[3] == 2


def test_knn_numpy_matches_catalyst(spark):
    a = knn_cosine(emb_df(spark), k=3).orderBy("vec_id", "rank").collect()
    b = knn_numpy(emb_df(spark), k=3).orderBy("vec_id", "rank").collect()
    assert [(r.vec_id, r.neighbor_id, r.rank) for r in a] == [
        (r.vec_id, r.neighbor_id, r.rank) for r in b
    ]
    for x, y in zip(a, b):
        assert x.sim == y.sim  # identical IEEE op sequence ⇒ exact


def test_knn_ivf_subset_of_cluster(spark):
    # pivots = ids < 2 → two clusters; neighbors stay within cluster
    out = knn_ivf(emb_df(spark), k=2, n_pivots=2).collect()
    assert all(r.vec_id != r.neighbor_id for r in out)
    assert len(out) > 0


def test_media_plumbing(spark):
    docs = docs_df(spark)
    media = synth_media(docs)
    assert media.schema["media_bytes"].dataType.typeName() == "binary"
    dec = decode_media(media)
    rows = dec.collect()
    assert len(rows) == 5
    for r in rows:
        assert 64 <= r.width <= 64 + 7 * 32
        assert r.channels in (1, 2, 3)
        if r.media_type != "video":
            assert r.n_frames == 1
        else:
            assert r.n_frames >= 8
    feats = media_features(dec).collect()
    assert all(f.n_pixels == next(r.width * r.height for r in rows
                                  if r.doc_id == f.doc_id) for f in feats)


def test_media_real_codecs_stubbed(spark):
    media = synth_media(docs_df(spark))
    with pytest.raises(Exception, match="NotImplementedError|real decoders"):
        decode_media(media, real_codecs=True).collect()


def test_frame_sample_stride(spark):
    dec = decode_media(synth_media(docs_df(spark)))
    frames = frame_sample(dec, every=10).collect()
    vids = {r.doc_id: r.n_frames for r in dec.collect()
            if r.media_type == "video"}
    for doc_id, n_frames in vids.items():
        idxs = sorted(r.frame_idx for r in frames if r.doc_id == doc_id)
        assert idxs == list(range(0, n_frames, 10))


def test_hourly_rollup_exact(spark):
    rows = [
        Row(event_id=1, ts="2024-01-01 10:05:00", user_id=7,
            event_type="click", value=1.234),
        Row(event_id=2, ts="2024-01-01 10:55:00", user_id=8,
            event_type="click", value=2.5),
        Row(event_id=3, ts="2024-01-01 11:05:00", user_id=7,
            event_type="view", value=0.5),
    ]
    df = spark.createDataFrame(rows).withColumn(
        "ts", F.to_timestamp("ts")
    )
    out = {(r.hour, r.event_type): r for r in hourly_rollup(df).collect()}
    r = out[("2024-01-01 10", "click")]
    assert r.n_events == 2
    assert r.sum_cents == 123 + 250  # floor(1.234*100) + floor(2.5*100)
    assert r.n_users == 2
    assert out[("2024-01-01 11", "view")].n_events == 1


def test_rollup_stream_matches_batch(spark, tmp_path):
    from nutch_spark.pipeline.rollup import rollup_stream

    src = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    srcdir = str(tmp_path / "events")
    src.write.parquet(srcdir)
    out = str(tmp_path / "out")
    q = (
        rollup_stream(spark, srcdir, src.schema)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    batch = hourly_rollup(src).select("hour", "event_type", "n_events",
                                      "sum_cents")
    # append-mode emits only watermark-closed windows; every emitted row
    # must match the batch rollup exactly
    emitted = got.join(
        batch.withColumnRenamed("n_events", "bn").withColumnRenamed(
            "sum_cents", "bs"),
        ["hour", "event_type"],
    )
    assert emitted.count() == got.count()
    bad = emitted.filter(
        (F.col("n_events") != F.col("bn")) | (F.col("sum_cents") != F.col("bs"))
    )
    assert bad.count() == 0
    assert got.count() > 0


def test_knn_numpy_k_exceeds_corpus_excludes_self(spark):
    """Regression (round-2 ADVICE): with k >= n the -inf self slot used
    to leak into the top-k slice as a self-pair."""
    out = knn_numpy(emb_df(spark), k=100).collect()
    assert out
    assert all(r.vec_id != r.neighbor_id for r in out)
    from collections import Counter

    per_vec = Counter(r.vec_id for r in out)
    assert set(per_vec.values()) == {4}  # n-1 neighbors each, n=5


def test_knn_blocked_matches_catalyst(spark):
    """Block-matrix distributed kNN reproduces the exact brute-force
    result — including bit-identical sims (same scalar op order)."""
    a = knn_cosine(emb_df(spark), k=3).orderBy("vec_id", "rank").collect()
    from nutch_spark.pipeline.similarity import knn_blocked

    b = knn_blocked(emb_df(spark), k=3, n_blocks=2).orderBy(
        "vec_id", "rank"
    ).collect()
    assert [(r.vec_id, r.neighbor_id, r.rank) for r in a] == [
        (r.vec_id, r.neighbor_id, r.rank) for r in b
    ]
    for x, y in zip(a, b):
        assert x.sim == y.sim


def test_simhash_banding_matches_crossjoin(spark):
    """Bit-band blocked pair search returns exactly the all-pairs
    result (pigeonhole: distance <= r => >= 1 of r+1 bands equal)."""
    from pyspark.sql import functions as F

    from nutch_spark.pipeline.dedup_docs import simhash as sh_fn

    docs = docs_df(spark)
    for r in (1, 2, 4):
        banded = {
            (x.a, x.b, x.hamming)
            for x in simhash_pairs(docs, max_distance=r).collect()
        }
        h = sh_fn(docs)
        a = h.select(F.col("id").alias("a"), F.col("simhash").alias("ha"))
        b = h.select(F.col("id").alias("b"), F.col("simhash").alias("hb"))
        brute = {
            (x.a, x.b, x.hamming)
            for x in a.crossJoin(b)
            .filter(F.col("a") < F.col("b"))
            .withColumn(
                "hamming",
                F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))).cast("long"),
            )
            .filter(F.col("hamming") <= r)
            .collect()
        }
        assert banded == brute, r


def test_knn_ivf_multiprobe_and_kmeans(spark):
    """Multi-probe + k-means-trained IVF: results stay self-free, all
    probed neighbors rank correctly, and recall@1 vs exact brute force
    is at least as good as single-probe."""
    emb = emb_df(spark)
    exact1 = {
        r.vec_id: r.neighbor_id
        for r in knn_cosine(emb, k=1).collect()
    }

    def recall(df):
        got = {r.vec_id: r.neighbor_id for r in df.filter("rank = 1").collect()}
        hit = sum(1 for u, n in exact1.items() if got.get(u) == n)
        return hit / len(exact1)

    single = knn_ivf(emb, k=2, n_pivots=2)
    multi = knn_ivf(emb, k=2, n_pivots=2, n_probes=2)
    trained = knn_ivf(emb, k=2, n_pivots=2, n_probes=2, kmeans_iterations=2)
    for df in (single, multi, trained):
        assert all(r.vec_id != r.neighbor_id for r in df.collect())
    assert recall(multi) >= recall(single)
    # 2 probes over 2 pivots = full search ⇒ exact recall
    assert recall(multi) == 1.0
    assert recall(trained) == 1.0


def test_kmeans_pivots_deterministic(spark):
    from nutch_spark.pipeline.similarity import kmeans_pivots

    emb = emb_df(spark)
    a = {r.p: (r.pv, r.pn) for r in kmeans_pivots(emb, 2, 2).collect()}
    b = {
        r.p: (r.pv, r.pn)
        for r in kmeans_pivots(emb.repartition(7), 2, 2).collect()
    }
    assert a == b  # bit-identical across partitionings


def dup_emb_df(spark):
    """Base vectors + one exact copy (id 10 ≡ 0) and one near copy
    (id 11 ≈ 1, each component +0.01): planted positives for the
    embedding-cosine dedup operator."""
    rows = [
        Row(vec_id=0, embedding=[1.0, 0.2, -0.3, 0.5]),
        Row(vec_id=1, embedding=[-0.4, 0.9, 0.1, -0.2]),
        Row(vec_id=2, embedding=[0.1, -0.8, 0.6, 0.3]),
        Row(vec_id=3, embedding=[0.7, 0.7, -0.1, -0.6]),
        Row(vec_id=10, embedding=[1.0, 0.2, -0.3, 0.5]),
        Row(vec_id=11, embedding=[-0.39, 0.91, 0.11, -0.19]),
    ]
    return spark.createDataFrame(rows)


def test_embedding_dup_pairs_matches_brute_force(spark):
    """SRP bit-band blocking finds the same ≥-threshold pairs as the
    all-pairs scan on this fixture, and never a pair the brute force
    rejects (the cosine verify runs on candidates only)."""
    from nutch_spark.pipeline.similarity import (
        embedding_dup_pairs,
        embedding_dup_pairs_exact,
    )

    emb = dup_emb_df(spark)
    banded = {
        (r.a, r.b): r.sim
        for r in embedding_dup_pairs(
            emb, threshold=0.9, bits=16, n_bands=4, dim=4
        ).collect()
    }
    brute = {
        (r.a, r.b): r.sim
        for r in embedding_dup_pairs_exact(emb, threshold=0.9).collect()
    }
    assert set(banded) <= set(brute)  # verify kills bucket false hits
    # exact dup: sim = dot/(sqrt(n)·sqrt(n)) ≈ 1 (one-ulp sqrt rounding)
    assert (0, 10) in banded and banded[(0, 10)] > 0.999999
    assert (1, 11) in banded  # near dup survives banding
    assert banded == brute  # full recall on this fixture
    assert all(sim >= 0.9 for sim in banded.values())


def test_srp_fingerprint_partitioning_invariant(spark):
    from nutch_spark.pipeline.similarity import srp_fingerprint

    emb = dup_emb_df(spark)
    a = {r.id: r.srp for r in srp_fingerprint(emb, 16, 4).collect()}
    b = {
        r.id: r.srp
        for r in srp_fingerprint(emb.repartition(5), 16, 4).collect()
    }
    assert a == b
    assert a[0] == a[10]  # identical vectors ⇒ identical fingerprint


def test_repetition_stats_known_values(spark):
    """Gopher-style repetition fractions, hand-computed:
    'a b a b a' → 2-grams [a b, b a, a b, b a]: top2 = 2/4, dup2 = 4/4;
    3-grams [a b a, b a b, a b a]: top3 = 2/3, dup3 = 2/3."""
    from nutch_spark.pipeline.textstats import repetition_stats

    docs = spark.createDataFrame(
        [
            (1, "a b a b a"),
            (2, "w x y z"),       # all distinct 2-/3-grams
            (3, "solo"),          # shorter than n → whole-text gram
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in repetition_stats(docs).collect()}
    r1 = got[1]
    assert r1.n_tokens == 5
    assert r1.top2_frac == pytest.approx(0.5)
    assert r1.dup2_frac == pytest.approx(1.0)
    assert r1.top3_frac == pytest.approx(2 / 3)
    assert r1.dup3_frac == pytest.approx(2 / 3)
    r2 = got[2]
    assert (r2.top2_frac, r2.dup2_frac) == (pytest.approx(1 / 3), 0.0)
    assert (r2.top3_frac, r2.dup3_frac) == (0.5, 0.0)
    r3 = got[3]
    assert (r3.n_tokens, r3.top2_frac, r3.dup2_frac) == (1, 1.0, 0.0)


def test_repetition_stats_no_shuffle(spark):
    from nutch_spark.pipeline.textstats import repetition_stats

    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    plan = repetition_stats(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_dedup_clusters_transitive(spark):
    """Connected components over pairs: transitive chains collapse to
    one cluster labeled by the minimum doc id; separate components
    stay separate. A path graph (1-2, 2-3, 3-4) needs propagation
    beyond one hop — the convergence loop, not a single join."""
    from nutch_spark.pipeline.dedup_docs import dedup_clusters

    pairs = spark.createDataFrame(
        [(2, 1), (2, 3), (3, 4), (10, 11)], "a long, b long"
    )
    got = {r.doc_id: r.cluster_id for r in dedup_clusters(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_dedup_clusters_partitioning_invariant(spark):
    from nutch_spark.pipeline.dedup_docs import dedup_clusters

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 20)] + [(100, 200)], "a long, b long"
    )
    one = {(r.doc_id, r.cluster_id) for r in dedup_clusters(pairs).collect()}
    many = {
        (r.doc_id, r.cluster_id)
        for r in dedup_clusters(pairs.repartition(7)).collect()
    }
    assert one == many
    assert all(c == 1 for d, c in one if d <= 20)
