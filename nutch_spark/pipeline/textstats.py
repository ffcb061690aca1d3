"""Text analysis operators: token counts, quality, language ID,
document fingerprints.

All pure Catalyst column programs (whole-stage codegen, zero Python in
the hot path) — at 100 TB these run inside the parquet scan stage with
full predicate/column pruning; nothing shuffles except the final
aggregation a caller might add.

Design notes for scale:
  - counting via `regexp_count` keeps the work in the JVM per row;
  - the fingerprint (bottom-k sketch of shingle hashes) is a per-row
    array program — no explode, no shuffle; k strings of 32 hex chars
    bound the row-state regardless of document length;
  - the language-ID heuristic is stopword-hit counting (the classic
    n-gram/stopword profile approach, cf. Nutch's language-identifier
    plugin, reference src/plugin/language-identifier/) — a broadcast
    profile table would extend it to more languages the same way.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

TOKEN_RE = r"[a-z0-9]+"
ALNUM_RE = r"[a-z0-9]"
PUNCT_RE = r"[^a-z0-9 ]"

# minimal per-language stopword profiles (expandable; broadcast a real
# profile table at production scale)
# priority order = dict order: a language wins a tie against every
# LATER profile (fixed deterministic ladder)
LANG_STOPWORDS = {
    "en": ["the", "a", "an", "of", "to", "in", "and", "is"],
    "es": ["el", "la", "de", "que", "y", "un", "los"],
    "de": ["der", "die", "das", "und", "ist", "von", "ein"],
    "fr": ["le", "les", "et", "des", "une", "du", "au"],
    "it": ["il", "di", "che", "per", "con", "non", "sono"],
    "pt": ["o", "que", "do", "da", "em", "um", "uma"],
    "nl": ["het", "een", "van", "dat", "niet", "zijn"],
}


def stopword_hits(text: Column, words: list[str]) -> Column:
    """Count space-delimited stopword occurrences (non-overlapping,
    left-to-right — identical scan semantics on Spark and DuckDB)."""
    pat = " (" + "|".join(words) + ") "
    return F.regexp_count(F.concat(F.lit(" "), text, F.lit(" ")), F.lit(pat))


def token_stats(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Whitespace/alnum token counts + a BPE-ish piece count (letters
    runs, digit runs and single punctuation marks each count as one
    piece — the shape a byte-pair tokenizer's pretokenizer produces)."""
    t = F.col(text_col)
    return docs.select(
        F.col(id_col),
        F.length(t).cast("long").alias("n_chars"),
        F.regexp_count(t, F.lit(TOKEN_RE)).cast("long").alias("n_tokens"),
        F.regexp_count(t, F.lit(ALNUM_RE)).cast("long").alias("n_alnum"),
        F.regexp_count(t, F.lit(PUNCT_RE)).cast("long").alias("n_punct"),
        (
            F.regexp_count(t, F.lit(TOKEN_RE))
            + F.regexp_count(t, F.lit(PUNCT_RE))
        ).cast("long").alias("n_bpe_pieces"),
    )


def quality_scores(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Heuristic document-quality score from length / punctuation /
    stopword-density signals (rational arithmetic only — deterministic
    IEEE ops, no transcendentals)."""
    t = F.col(text_col)
    n_tokens = F.regexp_count(t, F.lit(TOKEN_RE)).cast("double")
    n_alnum = F.regexp_count(t, F.lit(ALNUM_RE)).cast("double")
    n_punct = F.regexp_count(t, F.lit(PUNCT_RE)).cast("double")
    n_chars = F.length(t).cast("double")
    stops = stopword_hits(t, LANG_STOPWORDS["en"]).cast("double")
    len_score = n_tokens / (n_tokens + F.lit(50.0))
    punct_ratio = n_punct / (n_chars + F.lit(1.0))
    stop_ratio = stops / (n_tokens + F.lit(1.0))
    mean_tok_len = n_alnum / (n_tokens + F.lit(1.0))
    quality = len_score * (F.lit(1.0) - punct_ratio) * (
        F.lit(0.5) + stop_ratio
    )
    return docs.select(
        F.col(id_col),
        n_tokens.cast("long").alias("n_tokens"),
        mean_tok_len.alias("mean_token_len"),
        punct_ratio.alias("punct_ratio"),
        stop_ratio.alias("stopword_ratio"),
        quality.alias("quality"),
    )


def detect_language(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    profiles: dict[str, list[str]] | None = None,
) -> DataFrame:
    """Stopword-profile language ID over an arbitrary profile table.
    Ties break in profile order (dict order) so the result is
    deterministic; at production scale the profile table is just a
    bigger dict — the plan stays one regexp_count per language in the
    scan stage."""
    profiles = LANG_STOPWORDS if profiles is None else profiles
    langs = list(profiles)
    t = F.col(text_col)
    hits = {
        lang: stopword_hits(t, words).cast("long")
        for lang, words in profiles.items()
    }
    detected = F.lit(langs[-1])
    ladder = None
    for i, lang in enumerate(langs[:-1]):
        cond = None
        for later in langs[i + 1:]:
            c = hits[lang] >= hits[later]
            cond = c if cond is None else (cond & c)
        ladder = (
            F.when(cond, F.lit(lang))
            if ladder is None
            else ladder.when(cond, F.lit(lang))
        )
    detected = ladder.otherwise(F.lit(langs[-1])) if ladder is not None else detected
    return docs.select(
        F.col(id_col),
        *[hits[lang].alias(f"hits_{lang}") for lang in langs],
        detected.alias("detected_lang"),
    )


def shingles_col(text: Column, n: int = 3) -> Column:
    """Word n-gram shingle array (whole text as one shingle if too
    short). Per-row array program — no explode needed to build it.

    Built by zip_with over n SHIFTED SLICES of the token array, not by
    element_at inside a transform lambda: Catalyst has no subexpression
    elimination for lambda-bearing expressions, so the element_at form
    re-evaluated the split() n times PER SHINGLE (measured ~160×
    redundant tokenization on 50-token docs); the slice form evaluates
    split O(n) times per ROW and the lambda only concatenates."""
    toks = F.split(text, " ")
    sz = F.size(toks)
    m = sz - F.lit(n - 1)  # shingle count
    grams = F.slice(toks, 1, m)
    for j in range(1, n):
        grams = F.zip_with(
            grams,
            F.slice(toks, j + 1, m),
            lambda a, b: F.concat_ws(" ", a, b),
        )
    return F.when(sz >= n, grams).otherwise(F.array(text))


def _run_length_stats(grams: Column) -> Column:
    """(max_run, dup_occurrences) over an array's equal-value runs via
    one aggregate over the sorted array — the per-row analogue of a
    groupBy(gram).count() without the explode/shuffle."""
    zero = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("mx"),
        F.lit(0).cast("long").alias("dup"),
        F.lit(0).cast("long").alias("tot"),
    )

    def step(acc: Column, x: Column) -> Column:
        same = acc["prev"].eqNullSafe(x)
        closed_mx = F.greatest(acc["mx"], acc["run"])
        closed_dup = acc["dup"] + F.when(
            acc["run"] > 1, acc["run"]
        ).otherwise(F.lit(0).cast("long"))
        return F.struct(
            x.alias("prev"),
            F.when(same, acc["run"] + 1)
            .otherwise(F.lit(1).cast("long"))
            .alias("run"),
            F.when(same, acc["mx"]).otherwise(closed_mx).alias("mx"),
            F.when(same, acc["dup"]).otherwise(closed_dup).alias("dup"),
            (acc["tot"] + 1).alias("tot"),
        )

    def finish(acc: Column) -> Column:
        return F.struct(
            F.greatest(acc["mx"], acc["run"]).alias("mx"),
            (
                acc["dup"]
                + F.when(acc["run"] > 1, acc["run"]).otherwise(
                    F.lit(0).cast("long")
                )
            ).alias("dup"),
            acc["tot"].alias("tot"),
        )

    # total rides in the accumulator so the (lambda-bearing, hence
    # never subexpression-eliminated) shingle array is referenced once
    return F.aggregate(F.array_sort(grams), zero, step, finish)


def repetition_stats(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ns: tuple[int, ...] = (2, 3),
) -> DataFrame:
    """Gopher-style repetition signals (Rae et al. 2021 §A1.1, public
    quality heuristics used by every large-scale text pipeline): per
    document and n-gram size n,

      top{n}_frac — occurrences of the single most frequent word
        n-gram / total n-gram occurrences,
      dup{n}_frac — fraction of n-gram occurrences belonging to grams
        that appear more than once.

    Pure per-row array program over the same shifted-slice shingles as
    the dedup family — no explode, no shuffle; both fractions are one
    bigint/bigint division so a SQL oracle reproduces them bit-exactly.
    Docs shorter than n tokens collapse to a single whole-text gram
    (top = 1.0, dup = 0.0), mirroring shingles_col."""
    toks = F.split(F.col(text_col), " ")
    out = docs.select(
        F.col(id_col),
        F.size(toks).cast("long").alias("n_tokens"),
        *[
            _run_length_stats(shingles_col(F.col(text_col), n)).alias(
                f"_st{n}"
            )
            for n in ns
        ],
    )
    cols = [F.col(id_col), F.col("n_tokens")]
    for n in ns:
        st = F.col(f"_st{n}")
        cols.append(
            (st["mx"].cast("double") / st["tot"].cast("double")).alias(
                f"top{n}_frac"
            )
        )
        cols.append(
            (st["dup"].cast("double") / st["tot"].cast("double")).alias(
                f"dup{n}_frac"
            )
        )
    return out.select(*cols)


def fingerprints(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    k: int = 4,
) -> DataFrame:
    """Bottom-k sketch fingerprint: the k lexicographically smallest
    md5(shingle) values, joined — a winnowing-style rolling fingerprint
    with O(doc) work and O(k) output per row."""
    sh = shingles_col(F.col(text_col), n)
    hashed = F.array_sort(F.transform(sh, F.md5))
    return docs.select(
        F.col(id_col),
        F.array_join(F.slice(hashed, 1, k), ",").alias("fingerprint"),
    )
