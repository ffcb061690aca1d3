"""parsefilter-naivebayes tests (reference NaiveBayesParseFilter.java,
Train.java, Classify.java)."""

from __future__ import annotations

from math import log

import pyspark.sql.functions as F
import pytest

from nutch_spark.functions.naivebayes import (
    NaiveBayesModel,
    classify,
    relevant_col,
    tokenize,
    train,
)

TRAIN = [
    "1\talpha beta gamma delta",
    "1\talpha beta epsilon",
    "1\tgamma delta alpha",
    "0\tnoise junk spam",
    "0\tjunk spam filler noise",
    "0\tspam noise filler",
]


def test_tokenizer_java_quirks():
    # replaceAll("[^a-zA-Z ]","").toLowerCase().split(" ") quirks:
    assert tokenize("Hello, World!") == ["hello", "world"]
    # digits/punct removed BEFORE splitting → can create empty tokens
    assert tokenize("a 42 b") == ["a", "", "b"]   # interior empty kept
    assert tokenize("a b  ") == ["a", "b"]        # trailing dropped
    assert tokenize("") == [""]                   # Java "".split(" ")
    assert tokenize("123") == [""]                # cleans to "" → [""]
    assert tokenize("   ") == []                  # all-space → []


def test_train_counts_reference_quirks():
    m = train(TRAIN)
    assert m.numof_ir == 3 and m.numof_r == 3
    assert m.numwords_ir == 10 and m.numwords_r == 10
    assert m.wordfreq_r["alpha"] == 3 and m.wordfreq_ir["noise"] == 3
    assert m.uniquewords_size == 9
    # empty tokens inflate numwords and the unique set but never the
    # frequency maps (Train.updateHashMap skips "")
    m2 = train(["1\ta 1 b", "0\tc"])
    assert m2.numwords_r == 3  # a, "", b
    assert m2.uniquewords_size == 4  # a, "", b, c
    assert "" not in m2.wordfreq_r


def test_classify_hand_computed():
    """Pin the quirky per-token arithmetic on a 1-word example."""
    m = train(["1\tgood", "0\tbad"])
    # V=2, numwords each 1; P(c) = log(1) - log(2).
    # Reference quirk: the per-token term is log(freq)+1-log(n+V), so a
    # ONCE-seen word (log(1)=0) scores exactly like an unseen one — no
    # evidence either way — and every tie classifies relevant ("1",
    # Classify.java:101-106):
    prob_seen_once = (log(1) + 1 - log(3)) + (log(1) - log(2))
    prob_unseen = (1 - log(3)) + (log(1) - log(2))
    assert prob_seen_once == prob_unseen
    assert classify(m, "good") == "1"
    assert classify(m, "bad") == "1"       # tie, NOT "0" — the quirk
    assert classify(m, "mystery") == "1"   # unseen → tie → "1"
    # two occurrences DO carry evidence (log(2) > 0):
    m2 = train(["1\tgood good", "0\tbad bad"])
    assert classify(m2, "good") == "1"
    assert classify(m2, "bad") == "0"


def test_column_matches_python(spark):
    m = train(TRAIN)
    tests = [
        "alpha beta gamma alpha beta",
        "noise junk spam noise junk",
        "alpha noise junk spam noise",
        "alpha beta noise",
        "Alpha, BETA!! 42 noise",
        "",
        "unknownwords only here",
        None,
    ]
    df = spark.createDataFrame([(t,) for t in tests], "text string")
    got = [
        "1" if r["rel"] else "0"
        for r in df.select(
            relevant_col(m, F.col("text")).alias("rel")
        ).collect()
    ]
    want = [classify(m, t if t is not None else "") for t in tests]
    assert got == want


def test_empty_training_class_matches_java_log0(spark):
    """Math.log(0) is -Infinity in Java, not an exception: a training
    set with no irrelevant examples must classify (everything relevant
    — the -inf prior loses every comparison), on BOTH paths."""
    m = train(["1\tgood words here", "1\tmore good words"])
    assert m.numof_ir == 0
    assert classify(m, "good words") == "1"
    assert classify(m, "anything else entirely") == "1"
    df = spark.createDataFrame(
        [("good words",), ("anything else entirely",), ("",)],
        "text string",
    )
    got = df.select(relevant_col(m, F.col("text")).alias("rel")).collect()
    assert all(r["rel"] for r in got)


def test_chain_filters_outlinks(spark):
    from nutch_spark.operators.parsefilters import (
        NaiveBayesParseFilter,
        ParseFilterChain,
    )

    nb = NaiveBayesParseFilter.from_training(TRAIN, wordlist=["keep"])
    chain = ParseFilterChain((nb,))
    rows = [
        ("http://h/rel", "alpha beta gamma alpha beta"),
        ("http://h/irr", "noise junk spam noise junk"),
    ]
    outlinks = [
        {"to_url": "http://h/keep/x", "anchor": "a", "kind": "link",
         "link_order": 1},
        {"to_url": "http://h/other/y", "anchor": "b", "kind": "link",
         "link_order": 2},
    ]
    df = spark.createDataFrame(
        [(u, t, [], outlinks) for u, t in rows],
        "url string, text string, "
        "spans array<struct<kind:string,text:string,media_ref:string,"
        "offset:int>>, "
        "outlinks array<struct<to_url:string,anchor:string,kind:string,"
        "link_order:int>>",
    )
    out = {
        r["url"]: [o["to_url"] for o in r["outlinks"]]
        for r in chain.apply(df).collect()
    }
    # relevant page: all outlinks survive
    assert out["http://h/rel"] == [
        "http://h/keep/x", "http://h/other/y"
    ]
    # irrelevant page: only the wordlist-matching outlink survives
    assert out["http://h/irr"] == ["http://h/keep/x"]
