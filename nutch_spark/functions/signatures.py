"""Content signatures — MD5, TextMD5, TextProfile.

Reference semantics (public Nutch behavior, re-expressed):
  * MD5Signature (crawl/MD5Signature.java:31-39): md5 of raw content
    bytes, fallback md5(url) — `md5_signature` column expr;
  * TextMD5Signature (crawl/TextMD5Signature.java): md5 of extracted
    text — what parse.py stamps on every page;
  * TextProfileSignature (crawl/TextProfileSignature.java:67-149): the
    near-duplicate-tolerant profile — tokenize to lowercase alnum
    runs, drop tokens shorter than MIN_TOKEN_LEN=2, count frequencies,
    QUANT = round(maxFreq × quant_rate) (min 2 when maxFreq > 1),
    quantize counts down to multiples of QUANT, drop below-QUANT
    tokens, emit "token count" lines sorted by count desc, md5 the
    joined profile. The reference's tie order within equal counts is
    HashMap iteration order (nondeterministic!); here ties sort by
    token asc so the signature is stable — a strict determinism
    improvement with identical dedup power.

All pure column expressions (explode-free for md5 variants; the
profile uses one explode + groupBy per doc — at corpus scale it rides
the same shuffle budget as any token-level aggregation).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MIN_TOKEN_LEN = 2


def md5_signature(content: Column, url: Column) -> Column:
    """md5(content) with md5(url) fallback (MD5Signature.java:31-39)."""
    return F.when(content.isNotNull(), F.md5(content)).otherwise(F.md5(url))


def text_md5_signature(text: Column) -> Column:
    return F.md5(text)


def text_profile_signatures(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_token_len: int = MIN_TOKEN_LEN,
    quant_rate: float = 0.01,
) -> DataFrame:
    """Per-doc TextProfileSignature → (id_col, profile, signature)."""
    toks = docs.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.filter(
                F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"),
                lambda t: F.length(t) > min_token_len,
            )
        ).alias("tok"),
    )
    counts = toks.groupBy("id", "tok").agg(F.count("*").alias("cnt"))
    maxf = counts.groupBy("id").agg(F.max("cnt").alias("maxf"))
    j = counts.join(maxf, "id")
    # floor(x + 0.5) instead of round(): round-half semantics differ
    # across engines (half-up vs half-even); floor is portable
    quant = F.when(
        F.col("maxf") > 1,
        F.greatest(
            F.lit(2).cast("long"),
            F.floor(F.col("maxf") * quant_rate + F.lit(0.5)).cast("long"),
        ),
    ).otherwise(F.lit(1).cast("long"))
    q = j.withColumn(
        "qcnt", (F.floor(F.col("cnt") / quant) * quant).cast("long")
    ).filter(F.col("qcnt") > 0)
    # (count desc, token asc) via ascending sort on (-count, token)
    profile = q.groupBy("id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            (-F.col("qcnt")).alias("neg"),
                            F.col("tok"),
                            F.col("qcnt"),
                        )
                    )
                ),
                lambda x: F.concat_ws(" ", x["tok"], x["qcnt"].cast("string")),
            ),
            "\n",
        ).alias("profile")
    )
    return profile.select(
        F.col("id").alias(id_col),
        "profile",
        F.md5("profile").alias("signature"),
    )
