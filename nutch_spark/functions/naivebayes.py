"""parsefilter-naivebayes — the trainable two-class HtmlParseFilter.

Reference: src/plugin/parsefilter-naivebayes/src/java/org/apache/nutch/
parsefilter/naivebayes/{NaiveBayesParseFilter,Train,Classify}.java.
Two classes: "0" = irrelevant, "1" = relevant. The filter classifies a
page's extracted text; a RELEVANT page keeps all outlinks, an
IRRELEVANT page keeps only outlinks whose URL contains a wordlist word
(NaiveBayesParseFilter.filter, :155-195).

The reference's arithmetic is quirky and reproduced EXACTLY:

  * tokenization (Train.java:100 / Classify.java:70-71):
    ``replaceAll("[^a-zA-Z ]", "").toLowerCase().split(" ")`` with
    Java split semantics — interior empty tokens KEPT, trailing empty
    tokens dropped, and ``"".split(" ")`` yields ``[""]``;
  * word counts include empty tokens (``numwords += linearray.length``,
    Train.java:106) and the unique-word set can contain "" (only the
    per-word frequency maps skip "", Train.java updateHashMap);
  * per-token log-likelihood (Classify.java:88-97):
    ``log(freq) + 1 − log(numwords_c + V)`` for a known word and
    ``1 − log(numwords_c + V)`` for an unknown one — the Laplace "+1"
    sits OUTSIDE the log (equivalent to treating unseen freq as 1);
  * priors ``log(numof_c) − log(numof_0 + numof_1)``; a tie classifies
    as relevant ("1", Classify.java:101-106).

The classifier is exposed both as pure Python (training fixtures,
tests) and as a map-side Column program (`relevant_col`) whose
frequency tables ride as map literals — at crawl scale the model is a
few thousand entries, far below broadcast thresholds, and the whole
classification stays inside the parse scan with no shuffle and no
Python. Summation runs in token order on both paths (Java loop ≙
``F.aggregate`` left fold), so the doubles match bit-for-bit.
"""

from __future__ import annotations

from dataclasses import dataclass
from itertools import chain as _chain
from math import log

from pyspark.sql import Column
from pyspark.sql import functions as F


def _jlog(x: float) -> float:
    """Math.log semantics: log(0) is -Infinity, not ValueError — an
    empty training class must classify like the reference, not raise."""
    return log(x) if x > 0 else float("-inf")


def _java_split(s: str, sep: str) -> list[str]:
    """Java String.split: all tokens, then trailing empties removed;
    an empty input yields [\"\"]."""
    parts = s.split(sep)
    while len(parts) > 1 and parts[-1] == "":
        parts.pop()
    if parts == [""] and s != "":
        return []
    return parts


def _clean(line: str) -> str:
    return "".join(c for c in line if c.isascii() and (c.isalpha() or c == " ")).lower()


def tokenize(line: str) -> list[str]:
    """The reference tokenizer, quirks included."""
    return _java_split(_clean(line), " ")


@dataclass(frozen=True)
class NaiveBayesModel:
    uniquewords_size: int
    numof_ir: int
    numwords_ir: int
    wordfreq_ir: dict
    numof_r: int
    numwords_r: int
    wordfreq_r: dict


def train(lines: list[str]) -> NaiveBayesModel:
    """Train.start over `target \\t text` lines (target 0/1; any line
    whose target is not \"0\" counts as relevant — the reference's
    else-branch)."""
    numof = {0: 0, 1: 0}
    numwords = {0: 0, 1: 0}
    freq = {0: {}, 1: {}}
    unique: set[str] = set()
    for raw in lines:
        target = _java_split(raw, "\t")[0] if raw else ""
        # replacefirstoccuranceof(target + "\t", line)
        marker = target + "\t"
        idx = raw.find(marker)
        rest = raw if idx == -1 else raw[:idx] + raw[idx + len(marker):]
        toks = tokenize(rest)
        cls = 0 if target == "0" else 1
        numof[cls] += 1
        numwords[cls] += len(toks)  # empties counted, like the reference
        for t in toks:
            unique.add(t)  # may include "" — reference quirk
            if t != "":
                freq[cls][t] = freq[cls].get(t, 0) + 1
    return NaiveBayesModel(
        uniquewords_size=len(unique),
        numof_ir=numof[0], numwords_ir=numwords[0], wordfreq_ir=freq[0],
        numof_r=numof[1], numwords_r=numwords[1], wordfreq_r=freq[1],
    )


def classify(model: NaiveBayesModel, line: str) -> str:
    """Classify.classify — returns \"0\"/\"1\"; tie → \"1\"."""
    prob_ir = 0.0
    prob_r = 0.0
    v = model.uniquewords_size
    for word in tokenize(line):
        f_ir = model.wordfreq_ir.get(word)
        prob_ir += (log(f_ir) if f_ir else 0.0) + 1 - _jlog(model.numwords_ir + v)
        f_r = model.wordfreq_r.get(word)
        prob_r += (log(f_r) if f_r else 0.0) + 1 - _jlog(model.numwords_r + v)
    prob_ir += _jlog(model.numof_ir) - _jlog(model.numof_ir + model.numof_r)
    prob_r += _jlog(model.numof_r) - _jlog(model.numof_ir + model.numof_r)
    return "0" if prob_ir > prob_r else "1"


def _tokens_col(text: Column) -> Column:
    """`tokenize` as a Column program (Java split semantics)."""
    cleaned = F.lower(F.regexp_replace(
        F.coalesce(text, F.lit("")), "[^a-zA-Z ]", ""
    ))
    rtrimmed = F.regexp_replace(cleaned, " +$", "")
    return (
        F.when(cleaned == "", F.array(F.lit("")))
        .when(rtrimmed == "", F.array().cast("array<string>"))
        .otherwise(F.split(rtrimmed, " ", -1))
    )


def _freq_map_lit(freq: dict) -> Column:
    if not freq:
        # element_at on an empty literal map is a type error; a typed
        # null map behaves the same (lookups yield null)
        return F.lit(None).cast("map<string,int>")
    return F.create_map(
        *_chain.from_iterable(
            (F.lit(k), F.lit(v)) for k, v in sorted(freq.items())
        )
    )


def class_log_prob(
    tokens: Column, freq: dict, numwords: int, v: int, numof: int,
    total: int,
) -> Column:
    """Σ per-token quirk-likelihood + prior, left-folded in token order
    (bit-identical to the reference's sequential double sum). The prior
    rides as ONE precomputed literal — Java's ``prob += log(a) - log(b)``
    groups as ``prob + (log a − log b)``, so adding log(a) and
    subtracting log(b) in two Column steps would associate differently
    and could flip ties."""
    m = _freq_map_lit(freq)
    denom = _jlog(numwords + v)
    term = lambda t: (  # noqa: E731
        F.coalesce(
            F.log(F.element_at(m, t).cast("double")), F.lit(0.0)
        )
        + F.lit(1.0)
        - F.lit(denom)
    )
    prior = _jlog(numof) - _jlog(total)
    return (
        F.aggregate(tokens, F.lit(0.0), lambda acc, t: acc + term(t))
        + F.lit(prior)
    )


def relevant_col(model: NaiveBayesModel, text: Column) -> Column:
    """Boolean Column: classify(text) == \"1\" (tie → relevant)."""
    toks = _tokens_col(text)
    total = model.numof_ir + model.numof_r
    v = model.uniquewords_size
    p_ir = class_log_prob(
        toks, model.wordfreq_ir, model.numwords_ir, v, model.numof_ir, total
    )
    p_r = class_log_prob(
        toks, model.wordfreq_r, model.numwords_r, v, model.numof_r, total
    )
    return ~(p_ir > p_r)
