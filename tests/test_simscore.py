"""scoring-similarity plugin: Porter stemmer, Lucene-style tokenizer,
gold-standard cosine, hook semantics, plugin chaining.

Reference: src/plugin/scoring-similarity (SimilarityScoringFilter.java,
cosine/Model.java, util/LuceneTokenizer.java); chain semantics from
scoring/ScoringFilters.java.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from nutch_spark.constants import Defaults, STATUS_LINKED
from nutch_spark.functions.scoring import OPIC
from nutch_spark.functions.simscore import (
    LUCENE_STOP_WORDS,
    chain_hooks,
    cosine_to_gold,
    gold_vector,
    porter_stem,
    similarity_hooks,
    similarity_scores,
    tokenize,
    tokens_col,
)
from nutch_spark.operators.parse import parse
from tests.test_parse import fetch_result_row, spans_of
from nutch_spark.schema import FETCH_RESULTS

T0 = 1_700_000_000_000


# ---------------------------------------------------------------------
# Porter stemmer — outputs from the published algorithm's sample
# vocabulary (Porter 1980; full 5-step pipeline, so e.g. the paper's
# step-2 illustration valenci→valence continues to 'valenc')
# ---------------------------------------------------------------------

PORTER_CASES = {
    "caresses": "caress", "ponies": "poni", "ties": "ti",
    "caress": "caress", "cats": "cat", "feed": "feed", "agreed": "agre",
    "plastered": "plaster", "bled": "bled", "motoring": "motor",
    "sing": "sing", "conflated": "conflat", "troubled": "troubl",
    "sized": "size", "hopping": "hop", "tanned": "tan",
    "falling": "fall", "hissing": "hiss", "fizzed": "fizz",
    "failing": "fail", "filing": "file", "happy": "happi", "sky": "sky",
    "relational": "relat", "conditional": "condit", "rational": "ration",
    "valenci": "valenc", "hesitanci": "hesit", "digitizer": "digit",
    "conformabli": "conform", "radicalli": "radic",
    "differentli": "differ", "vileli": "vile", "analogousli": "analog",
    "vietnamization": "vietnam", "predication": "predic",
    "operator": "oper", "feudalism": "feudal", "decisiveness": "decis",
    "hopefulness": "hope", "callousness": "callous",
    "formaliti": "formal", "sensitiviti": "sensit",
    "sensibiliti": "sensibl", "triplicate": "triplic",
    "formative": "form", "formalize": "formal", "electriciti": "electr",
    "electrical": "electr", "hopeful": "hope", "goodness": "good",
    "revival": "reviv", "allowance": "allow", "inference": "infer",
    "airliner": "airlin", "gyroscopic": "gyroscop",
    "adjustable": "adjust", "defensible": "defens", "irritant": "irrit",
    "replacement": "replac", "adjustment": "adjust",
    "dependent": "depend", "adoption": "adopt", "communism": "commun",
    "activate": "activ", "angulariti": "angular",
    "homologous": "homolog", "effective": "effect",
    "bowdlerize": "bowdler", "probate": "probat", "rate": "rate",
    "cease": "ceas", "controll": "control", "roll": "roll",
}


def test_porter_stemmer_goldens():
    got = {w: porter_stem(w) for w in PORTER_CASES}
    assert got == PORTER_CASES


def test_porter_short_words_untouched():
    assert porter_stem("is") == "is"
    assert porter_stem("as") == "as"
    assert porter_stem("s") == "s"


# ---------------------------------------------------------------------
# Tokenizer (LuceneTokenizer.java:108-136 semantics)
# ---------------------------------------------------------------------


def test_tokenize_stopwords_and_lowercase():
    assert tokenize("The quick Brown-Fox, and 3 dogs!") == [
        "quick", "brown", "fox", "3", "dogs",
    ]


def test_tokenize_ngram_path_skips_stop_filter():
    # createNGramTokenStream: no stop filter, unigrams off
    assert tokenize("the big cat", ngrams=(2, 2)) == ["the big", "big cat"]
    # maxgram <= 1 with mingram > 1 → maxgram = mingram
    assert tokenize("the big cat", ngrams=(2, 1)) == ["the big", "big cat"]
    assert tokenize("a b c d", ngrams=(2, 3)) == [
        "a b", "b c", "c d", "a b c", "b c d",
    ]


def test_tokenize_stemmed():
    assert tokenize("motoring cats hopping", stem=True) == ["motor", "cat", "hop"]


@pytest.mark.parametrize(
    "kw",
    [
        {},
        {"ngrams": (2, 3)},
        {"stem": True},
        {"stem": True, "ngrams": (2, 2)},
    ],
)
def test_tokens_col_matches_python(spark, kw):
    texts = [
        "The quick Brown-Fox, and 3 dogs! Motoring happily.",
        "a b",
        "",
        "such that the their then",  # all stopwords
        "spark spark spark",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = [
        r.toks
        for r in df.select(tokens_col(F.col("text"), **kw).alias("toks"))
        .collect()
    ]
    assert got == [tokenize(t, **kw) for t in texts]


# ---------------------------------------------------------------------
# Cosine score (Model.computeCosineSimilarity)
# ---------------------------------------------------------------------


def test_cosine_self_is_one(spark):
    gold_text = "spark table join table spark spark window"
    df = spark.createDataFrame([(gold_text,)], "text string")
    got = df.select(
        cosine_to_gold(F.col("text"), gold_vector(gold_text)).alias("sim")
    ).collect()[0].sim
    assert got == pytest.approx(1.0, abs=1e-12)


def test_cosine_known_value(spark):
    # doc tf {a:1, b:1}, gold {a:1, c:1} → 1/(√2·√2) = 0.5
    df = spark.createDataFrame([("alpha beta",)], "text string")
    gold = gold_vector("alpha gamma")
    got = df.select(
        cosine_to_gold(F.col("text"), gold).alias("sim")
    ).collect()[0].sim
    assert got == pytest.approx(0.5, abs=1e-12)


def test_cosine_empty_doc_scores_zero(spark):
    # empty doc vector → NaN never beats maxScore=0 in the reference
    df = spark.createDataFrame([("",), ("the and of",)], "text string")
    got = [
        r.sim
        for r in df.select(
            cosine_to_gold(F.col("text"), gold_vector("alpha")).alias("sim")
        ).collect()
    ]
    assert got == [0.0, 0.0]


def test_cosine_stemmed_path(spark):
    # stemming folds motoring/motored onto the same term
    df = spark.createDataFrame([("motoring wheels",)], "text string")
    gold = gold_vector("motored wheel", stem=True)
    got = df.select(
        cosine_to_gold(F.col("text"), gold, stem=True).alias("sim")
    ).collect()[0].sim
    assert got == pytest.approx(1.0, abs=1e-12)


def test_similarity_scores_operator(spark):
    docs = spark.createDataFrame(
        [(1, "spark table join"), (2, "unrelated words entirely")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.sim for r in
           similarity_scores(docs, "spark table join").collect()}
    assert out[1] == pytest.approx(1.0, abs=1e-12)
    assert out[2] == 0.0


def test_similarity_scores_plan_is_scan_only(spark):
    """The score is map-side: no Exchange in the plan."""
    docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    plan = similarity_scores(docs, "a c")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


# ---------------------------------------------------------------------
# Hook semantics (SimilarityScoringFilter.java:55-70)
# ---------------------------------------------------------------------


def _py_cosine(doc_text: str, gold_text: str) -> float:
    tf: dict[str, int] = {}
    for t in tokenize(doc_text):
        tf[t] = tf.get(t, 0) + 1
    gold = gold_vector(gold_text)
    num = sum(c * gold.get(t, 0) for t, c in tf.items())
    if not tf:
        return 0.0
    return num / (
        math.sqrt(sum(c * c for c in tf.values()))
        * math.sqrt(sum(c * c for c in gold.values()))
    )


def test_similarity_hooks_distribute_undivided(spark):
    """Every outlink target gets the page's own similarity score —
    not score/valid_count and no internal/external factor
    (CosineSimilarity.distributeScoreToOutlinks:81-90)."""
    gold_text = "alpha beta gamma delta"
    page_text = (
        "alpha beta gamma href:http://h.example.com/x "
        "href:http://other.example.net/y"
    )
    df = spark.createDataFrame(
        [fetch_result_row("http://h.example.com/p", spans_of(("text", page_text)))],
        FETCH_RESULTS,
    )
    hooks = similarity_hooks(gold_text)
    _, cp = parse(df, hooks=hooks)
    linked = {
        r.url: r.score
        for r in cp.filter(F.col("status") == STATUS_LINKED).collect()
    }
    # the hook scores the EXTRACTED text (href tokens stripped, like
    # the reference's parse.getText()): tf {alpha, beta, gamma} vs
    # gold {alpha, beta, gamma, delta} → 3/(√3·√4)
    expect = _py_cosine("alpha beta gamma", gold_text)
    assert expect == pytest.approx(3 / (math.sqrt(3) * 2), abs=1e-12)
    assert set(linked) == {
        "http://h.example.com/x", "http://other.example.net/y",
    }
    for v in linked.values():
        # internal and external targets get the SAME, undivided score:
        # OPIC would have emitted score/2 × internal/external factor
        assert v == pytest.approx(expect, rel=1e-6)


def test_similarity_hooks_updatedb_ignores_inlinks(spark):
    """AbstractScoringFilter.updateDbScore is a no-op — the db score
    is NOT bumped by Σ inlink contributions under similarity scoring."""
    from nutch_spark.operators.updatedb import updatedb

    df = spark.createDataFrame(
        [
            fetch_result_row(
                "http://h.example.com/p",
                spans_of(("text", "alpha omega href:http://h.example.com/x")),
                score=0.75,
            )
        ],
        FETCH_RESULTS,
    )
    hooks = similarity_hooks("alpha beta")
    _, cp = parse(df, hooks=hooks)
    fr = updatedb(spark, None, df, cp, T0, hooks=hooks)
    got = {r.url: r for r in fr.collect()}
    # the fetched page keeps its fetched score (no inlink sum applied)
    assert got["http://h.example.com/p"].score == pytest.approx(0.75)
    # the new outlink row is created with the distributed page score:
    # extracted text "alpha omega" vs gold {alpha, beta} → 1/2
    expect = _py_cosine("alpha omega", "alpha beta")
    assert expect == pytest.approx(0.5, abs=1e-12)
    assert got["http://h.example.com/x"].score == pytest.approx(expect, rel=1e-6)


def test_chain_hooks_opic_then_similarity(spark):
    """ScoringFilters chaining: similarity's distribute overrides the
    running score with the page score regardless of OPIC's division;
    OPIC's updateDbScore then still adds the inlink sum."""
    sim = similarity_hooks("alpha beta")
    chained = chain_hooks(OPIC, sim)
    df = spark.createDataFrame(
        [
            fetch_result_row(
                "http://h.example.com/p",
                spans_of(("text", "alpha omega href:http://h.example.com/x")),
            )
        ],
        FETCH_RESULTS,
    )
    _, cp = parse(df, hooks=chained)
    linked = cp.filter(F.col("status") == STATUS_LINKED).collect()
    expect = _py_cosine("alpha omega", "alpha beta")
    assert linked[0].score == pytest.approx(expect, rel=1e-6)
    # generator sort: OPIC (score×init) then similarity (passthrough)
    d = spark.createDataFrame([(2.0,)], "score double")
    got = d.select(
        chained.generator_sort_value(F.col("score"), init_sort=1.0).alias("s")
    ).collect()[0].s
    assert got == pytest.approx(2.0)


def test_chain_hooks_identity_for_single():
    one = chain_hooks(OPIC)
    from pyspark.sql import functions as F2

    # update_db_score folds to OPIC's base + adjust
    col = one.update_db_score(F2.lit(1.0), F2.lit(0.5))
    assert "1.0 + 0.5" in str(col) or col is not None
