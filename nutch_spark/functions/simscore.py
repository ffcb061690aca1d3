"""scoring-similarity plugin: cosine similarity of each parsed page
against a gold-standard document — topical-crawl priority scoring.

Reference: src/plugin/scoring-similarity/.../SimilarityScoringFilter.java:55-70
(passScoreAfterParsing stores the page↔gold cosine in the content
metadata SCORE_KEY; distributeScoreToOutlinks gives EVERY outlink
target the page's own score, undivided), cosine/CosineSimilarity.java:46-90,
cosine/Model.java:103-166 (term-frequency doc vector: StandardTokenizer
→ lowercase → Lucene-default stopword filter → optional Porter stem →
optional word-shingle n-grams with unigram output OFF; cosine =
dot/(l2·l2) against the gold vector, max over gold docs — the shipped
model holds exactly one gold doc, Model.java:78-88), and
util/LuceneTokenizer.java:108-136 (the n-gram stream skips the stop
filter; the unigram stream applies it).

Spark-first shape: the whole score is ONE map-side Column program —
tokens via `regexp_extract_all`, the gold vector as a broadcast map
literal, Σ tf·gtf as a single `aggregate` pass (Σ_t tf(t)·gtf(t) =
Σ over token occurrences of gtf(token)), and ‖doc‖² as a run-length
`aggregate` over the sorted token array (Σ_t tf(t)² = Σ runs len²).
No shuffle, no UDF, stays inside whole-stage codegen; at 100 TB the
score costs exactly one scan. Porter stemming (reference default) is
the one part Catalyst can't express — it swaps the tokenizer for an
Arrow-batched pandas UDF; the unstemmed path stays pure Column.

Tokenizer simplification vs Lucene: StandardTokenizer's UAX#29 word
breaks are approximated by `[a-z0-9]+` runs over the lowercased text —
identical on both the Spark and oracle sides, documented divergence
for non-ASCII scripts.
"""

from __future__ import annotations

import re
from itertools import chain

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .scoring import ScoringHooks, _as_score_col

# Lucene StandardAnalyzer.STOP_WORDS_SET (the classic 33-word English
# stop set) — Model.java:103-130 applies it on the unigram path.
LUCENE_STOP_WORDS = frozenset(
    "a an and are as at be but by for if in into is it no not of on or "
    "such that the their then there these they this to was will with".split()
)

_TOKEN_RE = "[a-z0-9]+"


# ---------------------------------------------------------------------
# Porter stemmer (Porter 1980; Lucene PorterStemFilter applies the same
# published algorithm). Pure Python — used driver-side for the gold
# vector and inside the pandas tokenizer for the stemmed path.
# ---------------------------------------------------------------------

_VOWELS = "aeiou"


def _is_cons(w: str, i: int) -> bool:
    c = w[i]
    if c in _VOWELS:
        return False
    if c == "y":
        return i == 0 or not _is_cons(w, i - 1)
    return True


def _measure(stem: str) -> int:
    """m in [C](VC)^m[V]."""
    m, prev_vowel = 0, False
    for i in range(len(stem)):
        v = not _is_cons(stem, i)
        if prev_vowel and not v:
            m += 1
        prev_vowel = v
    return m


def _has_vowel(stem: str) -> bool:
    return any(not _is_cons(stem, i) for i in range(len(stem)))


def _ends_double_cons(w: str) -> bool:
    return len(w) >= 2 and w[-1] == w[-2] and _is_cons(w, len(w) - 1)


def _ends_cvc(w: str) -> bool:
    if len(w) < 3:
        return False
    return (
        _is_cons(w, len(w) - 3)
        and not _is_cons(w, len(w) - 2)
        and _is_cons(w, len(w) - 1)
        and w[-1] not in "wxy"
    )


_STEP2 = [
    ("ational", "ate"), ("tional", "tion"), ("enci", "ence"),
    ("anci", "ance"), ("izer", "ize"), ("abli", "able"), ("alli", "al"),
    ("entli", "ent"), ("eli", "e"), ("ousli", "ous"), ("ization", "ize"),
    ("ation", "ate"), ("ator", "ate"), ("alism", "al"), ("iveness", "ive"),
    ("fulness", "ful"), ("ousness", "ous"), ("aliti", "al"),
    ("iviti", "ive"), ("biliti", "ble"),
]
_STEP3 = [
    ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
    ("ical", "ic"), ("ful", ""), ("ness", ""),
]
_STEP4 = [
    "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
    "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous", "ive", "ize",
]


def porter_stem(word: str) -> str:
    w = word
    if len(w) <= 2:
        return w
    # Step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif not w.endswith("ss") and w.endswith("s"):
        w = w[:-1]
    # Step 1b
    flag_1b = False
    if w.endswith("eed"):
        if _measure(w[:-3]) > 0:
            w = w[:-1]
    elif w.endswith("ed") and _has_vowel(w[:-2]):
        w = w[:-2]
        flag_1b = True
    elif w.endswith("ing") and _has_vowel(w[:-3]):
        w = w[:-3]
        flag_1b = True
    if flag_1b:
        if w.endswith(("at", "bl", "iz")):
            w += "e"
        elif _ends_double_cons(w) and w[-1] not in "lsz":
            w = w[:-1]
        elif _measure(w) == 1 and _ends_cvc(w):
            w += "e"
    # Step 1c
    if w.endswith("y") and _has_vowel(w[:-1]):
        w = w[:-1] + "i"
    # Step 2
    for suf, rep in _STEP2:
        if w.endswith(suf):
            if _measure(w[: -len(suf)]) > 0:
                w = w[: -len(suf)] + rep
            break
    # Step 3
    for suf, rep in _STEP3:
        if w.endswith(suf):
            if _measure(w[: -len(suf)]) > 0:
                w = w[: -len(suf)] + rep
            break
    # Step 4
    for suf in _STEP4:
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if _measure(stem) > 1 and (
                suf != "ion" or (stem and stem[-1] in "st")
            ):
                w = stem
            break
    # Step 5a
    if w.endswith("e"):
        m = _measure(w[:-1])
        if m > 1 or (m == 1 and not _ends_cvc(w[:-1])):
            w = w[:-1]
    # Step 5b
    if _measure(w) > 1 and _ends_double_cons(w) and w.endswith("l"):
        w = w[:-1]
    return w


# ---------------------------------------------------------------------
# Tokenization — driver-side (gold doc) and Column/pandas (pages)
# ---------------------------------------------------------------------


def tokenize(
    text: str,
    stopwords: frozenset[str] = LUCENE_STOP_WORDS,
    stem: bool = False,
    ngrams: tuple[int, int] = (1, 1),
) -> list[str]:
    """Python mirror of the Column tokenizer (gold-vector path).

    n-gram mode (mingram > 1) reproduces LuceneTokenizer's shingle
    stream: no stop filter, shingles of every size mingram..maxgram,
    unigrams suppressed (createNGramTokenStream, LuceneTokenizer.java:
    108-118; Model.createDocVector size fixups, Model.java:112-125).
    """
    mn, mx = _fix_ngrams(ngrams)
    toks = re.findall(_TOKEN_RE, text.lower())
    if mn <= 1 and stopwords:
        toks = [t for t in toks if t not in stopwords]
    if stem:
        toks = [porter_stem(t) for t in toks]
    if mn <= 1:
        return toks
    return [
        " ".join(toks[i : i + s])
        for s in range(mn, mx + 1)
        for i in range(len(toks) - s + 1)
    ]


def _fix_ngrams(ngrams: tuple[int, int]) -> tuple[int, int]:
    # Model.createDocVector: maxgram<=1 with mingram>1 ⇒ maxgram=mingram
    mn, mx = ngrams
    if mn > 1 and mx <= 1:
        mx = mn
    return mn, mx


def gold_vector(gold_text: str, **tok_kw) -> dict[str, int]:
    """Term-frequency vector of the gold-standard doc
    (Model.createModel, Model.java:54-101 — one doc, driver-side)."""
    vec: dict[str, int] = {}
    for t in tokenize(gold_text, **tok_kw):
        vec[t] = vec.get(t, 0) + 1
    return vec


def tokens_col(
    text: Column,
    stopwords: frozenset[str] = LUCENE_STOP_WORDS,
    stem: bool = False,
    ngrams: tuple[int, int] = (1, 1),
) -> Column:
    """The tokenizer as a Column program (pandas UDF only if stem).

    The stemmed path runs the ENTIRE tokenizer (stop filter + shingles
    included) inside the Arrow-batched UDF: Catalyst rejects lambda
    functions over Python-UDF outputs
    (UNSUPPORTED_FEATURE.LAMBDA_FUNCTION_WITH_PYTHON_UDF), so the
    higher-order shingle expression cannot consume the UDF column.
    """
    mn, mx = _fix_ngrams(ngrams)
    if stem:
        return _tokenize_pd(text, stopwords=stopwords, stem=True, ngrams=(mn, mx))
    toks = F.regexp_extract_all(F.lower(text), F.lit(_TOKEN_RE), 0)
    if mn <= 1:
        if stopwords:
            stops = F.array(*[F.lit(s) for s in sorted(stopwords)])
            toks = F.filter(toks, lambda t: ~F.array_contains(stops, t))
        return toks
    def shingle(s: int):
        # NB: a 2-arg lambda would make F.transform pass (element,
        # index) — close over s instead of default-arg capturing it.
        def f(i: Column) -> Column:
            return F.array_join(F.slice(toks, i + 1, s), " ")

        return F.when(
            F.size(toks) >= s,
            F.transform(F.sequence(F.lit(0), F.size(toks) - s), f),
        ).otherwise(F.array().cast("array<string>"))

    sizes = [shingle(s) for s in range(mn, mx + 1)]
    return F.concat(*sizes) if len(sizes) > 1 else sizes[0]


def _tokenize_pd(text: Column, **tok_kw) -> Column:
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _tok(s: "pd.Series") -> "pd.Series":
        return s.map(lambda x: tokenize(x or "", **tok_kw))

    _tok.__annotations__ = {"s": pd.Series, "return": pd.Series}
    return pandas_udf(_tok, "array<string>")(text)


# ---------------------------------------------------------------------
# Cosine score
# ---------------------------------------------------------------------


def _norm2_col(toks: Column) -> Column:
    """‖tf‖² = Σ_t tf(t)² as a run-length pass over the sorted array
    (O(n log n), no shuffle): Σ over equal-token runs of len²."""
    zero = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("acc"),
    )

    def step(acc: Column, x: Column) -> Column:
        same = acc["prev"].eqNullSafe(x)
        return F.struct(
            x.alias("prev"),
            F.when(same, acc["run"] + 1).otherwise(F.lit(1).cast("long")).alias("run"),
            F.when(same, acc["acc"])
            .otherwise(acc["acc"] + acc["run"] * acc["run"])
            .alias("acc"),
        )

    return F.aggregate(
        F.array_sort(toks), zero, step, lambda a: a["acc"] + a["run"] * a["run"]
    )


def cosine_to_gold(
    text: Column,
    gold: dict[str, int],
    stopwords: frozenset[str] = LUCENE_STOP_WORDS,
    stem: bool = False,
    ngrams: tuple[int, int] = (1, 1),
) -> Column:
    """cosine(tf(text), gold) as one map-side Column
    (CosineSimilarity.setURLScoreAfterParsing → Model.
    computeCosineSimilarity, Model.java:156-166; empty doc vector ⇒
    NaN never beats maxScore=0 ⇒ score 0).

    Σ tf·gtf needs no per-term counting: it equals Σ over token
    occurrences of gtf(token), one `aggregate` over the array with the
    gold vector as a map literal.
    """
    toks = tokens_col(text, stopwords=stopwords, stem=stem, ngrams=ngrams)
    g2 = sum(c * c for c in gold.values())
    if not gold:
        return F.lit(0.0)
    gmap = F.create_map(
        *chain.from_iterable((F.lit(t), F.lit(c)) for t, c in sorted(gold.items()))
    )
    num = F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, x: acc + F.coalesce(F.element_at(gmap, x), F.lit(0)).cast("long"),
    )
    m2 = _norm2_col(toks)
    return F.when(
        m2 > 0,
        num.cast("double") / (F.sqrt(m2.cast("double")) * F.sqrt(F.lit(float(g2)))),
    ).otherwise(F.lit(0.0))


def similarity_scores(
    docs: DataFrame,
    gold_text: str,
    text_col: str = "text",
    out_col: str = "sim",
    *,
    stem: bool = True,
    **tok_kw,
) -> DataFrame:
    """Standalone operator: score every row of `docs` against the gold
    doc. One scan, zero shuffles — the plan is Project over the scan.

    `stem` defaults to True because the reference Model.createDocVector
    applies PORTERSTEM_FILTER unconditionally on both the unigram and
    n-gram paths (cosine/Model.java); pass stem=False only when a pure
    Column (no pandas UDF) plan is required."""
    gold = gold_vector(gold_text, stem=stem, **tok_kw)
    return docs.withColumn(
        out_col, cosine_to_gold(F.col(text_col), gold, stem=stem, **tok_kw)
    )


def similarity_hooks(gold_text: str, *, stem: bool = True, **tok_kw) -> ScoringHooks:
    """ScoringHooks for the similarity plugin, hook-for-hook faithful.

    `stem` defaults to True — the reference's Model.createDocVector
    stems unconditionally (see similarity_scores).

    - pass_score_after_parsing → the page↔gold cosine (replaces the
      incoming score; SimilarityScoringFilter.java:55-61)
    - distribute_score_to_outlinks → every target gets the page score,
      NOT divided by outlink count and with no internal/external factor
      (CosineSimilarity.distributeScoreToOutlinks, :81-90)
    - generator_sort_value / update_db_score / indexer_score /
      injected_score → AbstractScoringFilter no-ops (sort value stays
      initSort, db score unchanged by inlinks).

    The pass hook ignores the incoming score Column and reads the
    page's `text` column directly — valid anywhere the hook runs over
    parse_data rows (crawl_parse_from), mirroring how the reference
    hook receives the Parse object rather than a score.
    """
    gold = gold_vector(gold_text, stem=stem, **tok_kw)
    return ScoringHooks(
        pass_score_after_parsing=lambda score: cosine_to_gold(
            F.col("text"), gold, stem=stem, **tok_kw
        ),
        distribute_score_to_outlinks=lambda score, valid_count, factor: score,
        generator_sort_value=lambda score, init_sort=1.0: _as_score_col(init_sort),
        update_db_score=lambda base, link_adjust: base,
        # AbstractScoringFilter.initialScore is a no-op — a brand-new
        # linked URL keeps the promoted first-link datum's score
        # (CrawlDbReducer.java:150-153, 192-206)
        initial_score=lambda link_score=None: (
            F.lit(0.0) if link_score is None else F.coalesce(link_score, F.lit(0.0))
        ),
    )


def chain_hooks(*hooks: ScoringHooks) -> ScoringHooks:
    """ScoringFilters plugin chaining (scoring/ScoringFilters.java):
    each hook's score output feeds the next plugin in order; the
    2-arg hooks fold over the score with the extra args fixed."""
    if not hooks:
        raise ValueError("chain_hooks needs at least one ScoringHooks")

    def fold1(get):
        def h(score):
            for hk in hooks:
                score = get(hk)(score)
            return score

        return h

    def sortv(score, init_sort=1.0):
        # ScoringFilters.generatorSortValue threads the running sort
        # value through each plugin as its initSort — so after the
        # first plugin the init_sort argument is a Column, which every
        # hook must accept (see scoring._as_score_col).
        s = init_sort
        for hk in hooks:
            s = hk.generator_sort_value(score, init_sort=s)
        return s

    def distribute(score, valid_count, factor):
        s = score
        for hk in hooks:
            s = hk.distribute_score_to_outlinks(s, valid_count, factor)
        return s

    def update(base, link_adjust):
        s = base
        for hk in hooks:
            s = hk.update_db_score(s, link_adjust)
        return s

    def initial(link_score=None):
        s = link_score
        for hk in hooks:
            s = hk.initial_score(s)
        return s

    return ScoringHooks(
        injected_score=fold1(lambda h: h.injected_score),
        initial_score=initial,
        generator_sort_value=sortv,
        pass_score_before_parsing=fold1(lambda h: h.pass_score_before_parsing),
        pass_score_after_parsing=fold1(lambda h: h.pass_score_after_parsing),
        distribute_score_to_outlinks=distribute,
        update_db_score=update,
        indexer_score=fold1(lambda h: h.indexer_score),
    )
