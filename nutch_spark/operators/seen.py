"""URL-seen filter — partitioned blocked bloom over canonical URL hashes.

Replaces the reference's implicit URL-seen set (the CrawlDb MapFile key
set — CrawlDbReducer creates a row per never-seen URL and existence is
key lookup, crawl/CrawlDb.java:148, CrawlDbReducer.java:145-147) with
the explicit bloom/cuckoo structure the north rule calls for:

  * key = xxhash64(canonicalized url) — the same `url_hash` column the
    frontier carries (functions/urls.url_hash_col);
  * the filter is PARTITIONED: bucket = url_hash mod n_buckets; each
    bucket is an independent bloom bitset built per-partition with
    applyInPandas (all-NumPy, no per-row Python) and stored as one row
    (bucket, bitset, n_keys) in a sidecar table — at 10^10-URL scale
    each bucket holds ~10^10/n_buckets keys and buckets build/probe in
    parallel with no shared state;
  * probing joins candidates to their bucket row (bucket count is
    small ⇒ broadcast) and runs a vectorized double-hashing membership
    test inside one pandas batch;
  * incremental maintenance: per cycle, OR the delta bitsets of newly
    added URLs into the affected buckets — no global rebuild;
  * false positives lose only *new* outlinks (they are wrongly treated
    as already-known). `unseen_exact` is the audit path: a left-anti
    join against the frontier, used in tests to measure the FP rate
    and as the exact fallback.

Bloom math: k = round(bits_per_key·ln2) hash functions via double
hashing h_i = h1 + i·h2 (Kirsch–Mitzenmacher), h1/h2 drawn from the
64-bit url_hash halves. All membership/insert ops are NumPy bitwise
ops over uint8 arrays.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

SEEN_SCHEMA = T.StructType(
    [
        T.StructField("bucket", T.IntegerType(), False),
        T.StructField("bitset", T.BinaryType(), False),
        T.StructField("n_keys", T.LongType(), False),
    ]
)


def _num_hashes(bits_per_key: float) -> int:
    return max(1, round(bits_per_key * math.log(2)))


def _bit_positions(hashes: np.ndarray, m_bits: int, k: int) -> tuple[np.ndarray, np.ndarray]:
    """(n, k) arrays of byte index / bit mask for each key's k probes."""
    h = hashes.astype(np.uint64)
    h1 = h & np.uint64(0xFFFFFFFF)
    h2 = (h >> np.uint64(32)) | np.uint64(1)  # odd-ish second hash
    i = np.arange(k, dtype=np.uint64)
    pos = (h1[:, None] + i[None, :] * h2[:, None]) % np.uint64(m_bits)
    return (pos >> np.uint64(3)).astype(np.int64), (
        np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8)
    )


def _build_bitset(hashes: np.ndarray, m_bits: int, k: int) -> bytes:
    bits = np.zeros(m_bits // 8, dtype=np.uint8)
    if len(hashes):
        byte_idx, masks = _bit_positions(hashes, m_bits, k)
        np.bitwise_or.at(bits, byte_idx.ravel(), masks.ravel())
    return bits.tobytes()


def _contains(bitset: bytes, hashes: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    if not len(hashes):
        return np.zeros(0, dtype=bool)
    bits = np.frombuffer(bitset, dtype=np.uint8)
    byte_idx, masks = _bit_positions(hashes, m_bits, k)
    return ((bits[byte_idx] & masks) == masks).all(axis=1)


class SeenFilter:
    """Config + operations for the partitioned URL-seen bloom."""

    def __init__(self, n_buckets: int = 64, bits_per_key: float = 10.0,
                 expected_keys_per_bucket: int = 1_000_000):
        self.n_buckets = n_buckets
        self.bits_per_key = bits_per_key
        self.k = _num_hashes(bits_per_key)
        # bucket bitset sized for the expected load, byte-aligned
        m = int(expected_keys_per_bucket * bits_per_key)
        self.m_bits = max(64, (m + 7) // 8 * 8)

    # -- column helpers --
    def bucket_col(self, url_hash):
        return F.pmod(url_hash, F.lit(self.n_buckets)).cast("int")

    # -- build --
    def build(self, frontier: DataFrame) -> DataFrame:
        """frontier(url_hash, …) → seen table (bucket, bitset, n_keys).

        One shuffle on bucket; each bucket builds independently
        (mapInPandas-style vectorized NumPy inside applyInPandas).
        """
        m_bits, k = self.m_bits, self.k

        def build_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
            hashes = pdf["url_hash"].to_numpy(dtype=np.int64)
            return pd.DataFrame(
                {
                    "bucket": [int(pdf["bucket"].iloc[0])],
                    "bitset": [_build_bitset(hashes, m_bits, k)],
                    "n_keys": [len(hashes)],
                }
            )

        keyed = frontier.select(
            self.bucket_col(F.col("url_hash")).alias("bucket"), "url_hash"
        )
        return keyed.groupBy("bucket").applyInPandas(build_bucket, SEEN_SCHEMA)

    # -- incremental add --
    def add(self, seen: DataFrame, new_urls: DataFrame) -> DataFrame:
        """OR the delta bitsets of new url_hashes into existing buckets."""
        delta = self.build(new_urls)
        m_bits = self.m_bits

        a = seen.select("bucket", F.col("bitset").alias("b_old"), F.col("n_keys").alias("k_old"))
        b = delta.select("bucket", F.col("bitset").alias("b_new"), F.col("n_keys").alias("k_new"))
        j = a.join(b, "bucket", "full_outer")

        @F.pandas_udf(T.BinaryType())
        def or_bits(old: pd.Series, new: pd.Series) -> pd.Series:
            out = []
            for o, n in zip(old, new):
                if o is None:
                    out.append(n)
                elif n is None:
                    out.append(o)
                else:
                    out.append(
                        (
                            np.frombuffer(o, dtype=np.uint8)
                            | np.frombuffer(n, dtype=np.uint8)
                        ).tobytes()
                    )
            return pd.Series(out)

        return j.select(
            "bucket",
            or_bits(F.col("b_old"), F.col("b_new")).alias("bitset"),
            (F.coalesce("k_old", F.lit(0)) + F.coalesce("k_new", F.lit(0))).alias("n_keys"),
        )

    # -- probe --
    # Above this estimated bucket-table size the probe switches from the
    # driver-broadcast path to the partitioned cogroup path (the driver
    # never materializes the table).
    BROADCAST_LIMIT_BYTES = 64 << 20

    def mark_seen(self, candidates: DataFrame, seen: DataFrame,
                  url_hash_col: str = "url_hash",
                  mode: str = "auto") -> DataFrame:
        """Add boolean `maybe_seen` to candidates (true ⇒ probably in
        the frontier; false ⇒ DEFINITELY new — the useful guarantee).

        Two physical shapes, same result:

        * ``broadcast`` — the bucket table is collected once and RDD-
          broadcast; each Arrow batch probes against it in NumPy. (A
          broadcast JOIN instead would materialize the megabyte bitset
          into every candidate row and push it through Arrow per row —
          measured ~90 s for a 1.5k-candidate probe.) Right while the
          whole table fits comfortably in driver/executor memory.
        * ``partitioned`` — the 10^10-frontier shape: candidates
          shuffle once on bucket and COGROUP with the seen table, so
          each task sees (its candidates, its single bucket row) and
          probes in one NumPy batch. No driver collect, no broadcast;
          each bitset moves over the wire exactly once per bucket.

        ``auto`` picks by the configured table size
        (n_buckets × m_bits/8 vs BROADCAST_LIMIT_BYTES) — a static
        decision from filter config, not a data scan."""
        if mode == "auto":
            table_bytes = self.n_buckets * (self.m_bits // 8)
            mode = (
                "broadcast"
                if table_bytes <= self.BROADCAST_LIMIT_BYTES
                else "partitioned"
            )
        if mode == "partitioned":
            return self._mark_seen_partitioned(candidates, seen, url_hash_col)
        m_bits, k, nb = self.m_bits, self.k, self.n_buckets
        table = {int(r.bucket): r.bitset for r in seen.collect()}
        bc = candidates.sparkSession.sparkContext.broadcast(table)

        def probe_batches(batches):
            tbl = bc.value
            for pdf in batches:
                hv = pdf[url_hash_col].to_numpy(dtype=np.int64)
                buckets = hv % nb  # ≙ F.pmod: non-negative for nb > 0
                out = np.zeros(len(pdf), dtype=bool)
                for b in np.unique(buckets):
                    bs = tbl.get(int(b))
                    if bs is None:
                        continue  # empty bucket ⇒ definitely unseen
                    mask = buckets == b
                    out[mask] = _contains(bs, hv[mask], m_bits, k)
                res = pdf.copy()
                res["maybe_seen"] = out
                yield res

        out_schema = T.StructType(
            list(candidates.schema.fields)
            + [T.StructField("maybe_seen", T.BooleanType())]
        )
        return candidates.mapInPandas(probe_batches, out_schema)

    def _mark_seen_partitioned(
        self, candidates: DataFrame, seen: DataFrame, url_hash_col: str
    ) -> DataFrame:
        """Cogroup candidates with their bucket row — one shuffle keyed
        on bucket, one NumPy probe per (bucket-candidates, bitset)
        pair. Scales to bucket tables far beyond broadcast size."""
        m_bits, k = self.m_bits, self.k
        cand = candidates.withColumn(
            "__bucket", self.bucket_col(F.col(url_hash_col))
        )
        out_schema = T.StructType(
            list(candidates.schema.fields)
            + [T.StructField("maybe_seen", T.BooleanType())]
        )

        def probe(cpdf: pd.DataFrame, spdf: pd.DataFrame) -> pd.DataFrame:
            res = cpdf.drop(columns=["__bucket"])
            if len(spdf) and len(cpdf):
                hv = cpdf[url_hash_col].to_numpy(dtype=np.int64)
                res["maybe_seen"] = _contains(
                    spdf["bitset"].iloc[0], hv, m_bits, k
                )
            else:  # no bucket row ⇒ nothing of this bucket ever seen
                res["maybe_seen"] = np.zeros(len(cpdf), dtype=bool)
            return res

        return (
            cand.groupBy("__bucket")
            .cogroup(seen.groupBy("bucket"))
            .applyInPandas(probe, out_schema)
        )

    def unseen(self, candidates: DataFrame, seen: DataFrame,
               url_hash_col: str = "url_hash",
               mode: str = "auto") -> DataFrame:
        """Candidates definitely not in the seen set (bloom-pruned)."""
        return self.mark_seen(candidates, seen, url_hash_col, mode).filter(
            ~F.col("maybe_seen")
        ).drop("maybe_seen")


def unseen_exact(candidates: DataFrame, frontier: DataFrame, key: str = "url") -> DataFrame:
    """Exact audit path: left-anti join against the frontier keys."""
    return candidates.join(frontier.select(key), key, "left_anti")
