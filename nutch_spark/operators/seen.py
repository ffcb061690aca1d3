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

    def geometry(self) -> dict:
        """Probe-compatibility fingerprint. A stored seen table is only
        meaningful to a filter with the SAME geometry — probing a
        table built under a different bucketing/bit-space silently
        reads absent buckets / wrong bit positions as unseen (false
        negatives → double-created rows). Persist alongside the table
        and rebuild on mismatch (Crawler._ensure_seen does)."""
        return {"kind": "bloom", "n_buckets": self.n_buckets,
                "m_bits": self.m_bits, "k": self.k}

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
        """OR the delta bitsets of new url_hashes into existing buckets.

        `n_keys` (k_old + k_new) is an upper-bound insert counter, not
        a distinct-member count: re-added keys set no new bits but do
        count. The crawl loop feeds only definitely-new keys, keeping
        it exact; treat it as a ceiling for bits-per-key math
        otherwise."""
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


# ---------------------------------------------------------------------
# Cuckoo-filter URL-seen — the north rule's other option ("partitioned
# bloom/cuckoo filter"). Same sharded architecture as SeenFilter, but
# the per-shard structure is a cuckoo filter (Fan, Andersen,
# Kaminsky, Mitzenmacher: "Cuckoo Filter: Practically Better Than
# Bloom", CoNEXT 2014): a table of m indexes × `slots` entries, each
# entry a 16-bit key fingerprint; a key may live at one of TWO indexes
#
#   i1 = h & (m-1)
#   i2 = i1 XOR (fp(h) * 0x5BD1E995) & (m-1)          (m a power of 2)
#
# which is what buys cuckoo filters their advantage over blooms here:
# DELETION (remove one stored occurrence of the fingerprint — a 404-
# purged / CrawlDbFilter-evicted URL can leave the seen set without a
# rebuild) and bounded lookup cost (exactly 2 indexes per probe,
# vs k scattered bit reads).
#
# Deliberate divergence from the paper, documented: the build places
# keys with TWO deterministic greedy rounds (every key tries i1; the
# spill tries i2; rank-within-index by key order decides who fits)
# plus an EXACT overflow stash, instead of the randomized kick loop;
# DELETE mirrors it with the same two deterministic rounds (_remove),
# instead of the paper's sequential per-delete slot scan. Lookup
# semantics are the canonical ones; the only cost is a lower slot
# load before keys start landing in the stash (the kick loop reaches
# ~95% load, two-round greedy ~85% at slots=4 — size m accordingly).
# What it buys: build AND delete are order-independent pure
# window-function programs, so the correctness gate replays the
# ENTIRE filter — placement, fingerprints, stash, probe, deletion —
# in ANSI SQL (see gate.py ORACLE_BLOOM_UNSEEN's cuckoo branches),
# the same full-oracle discipline as the bloom's position replay; and
# neither inserts nor deletes loop per row (at 10^10 keys a
# data-dependent per-key branch chain is hostile to vectorization).
# ---------------------------------------------------------------------

CUCKOO_SCHEMA = T.StructType(
    [
        T.StructField("shard", T.IntegerType(), False),
        T.StructField("table", T.BinaryType(), False),   # uint16 (m·slots)
        T.StructField("stash", T.BinaryType(), False),   # int64 overflow keys
        T.StructField("n_keys", T.LongType(), False),
    ]
)

_FP_MIX = np.int64(0x5BD1E995)


def _cuckoo_parts(h: np.ndarray, m: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(fp, i1, i2) for int64 keys; all arithmetic replayable in SQL."""
    fp = (h >> np.int64(32)) & np.int64(0xFFFF)
    fp = np.where(fp == 0, np.int64(1), fp)
    i1 = h & np.int64(m - 1)
    i2 = i1 ^ ((fp * _FP_MIX) & np.int64(m - 1))
    return fp, i1, i2


def _rank_within(groups: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Stable 0-based rank of each element within its group value,
    preserving input order inside a group (input sorted by key ⇒ rank
    is rank-by-key, matching ``row_number() OVER (PARTITION BY g
    ORDER BY h)``). Returns (order, rank-in-sorted-order)."""
    order = np.argsort(groups, kind="stable")
    g = groups[order]
    starts = np.flatnonzero(np.r_[True, g[1:] != g[:-1]])
    reps = np.diff(np.r_[starts, len(g)])
    rank = np.arange(len(g)) - np.repeat(starts, reps)
    return order, rank


def _group_counts(idx: np.ndarray, f16: np.ndarray):
    """Yield (index, fingerprint, count) per unique (idx, fp) pair of
    the parallel consumer arrays — the per-group removal quota."""
    if not len(idx):
        return
    comp = idx.astype(np.int64) * np.int64(1 << 16) + f16.astype(np.int64)
    uniq, counts = np.unique(comp, return_counts=True)
    for u, c in zip(uniq, counts):
        yield int(u >> 16), np.uint16(u & 0xFFFF), int(c)


class CuckooSeenFilter:
    """Sharded cuckoo-filter URL-seen set.

    shard = pmod(url_hash, n_shards); each shard is an independent
    (table, stash) pair built/probed as one NumPy batch — identical
    distribution story to SeenFilter (build: one shuffle on shard;
    probe: broadcast table or cogroup-per-shard, chosen by configured
    table size).
    """

    BROADCAST_LIMIT_BYTES = SeenFilter.BROADCAST_LIMIT_BYTES

    def __init__(self, n_shards: int = 64, m_indexes: int = 1 << 18,
                 slots: int = 4):
        if m_indexes & (m_indexes - 1):
            raise ValueError("m_indexes must be a power of two")
        self.n_shards = n_shards
        self.m = m_indexes
        self.slots = slots

    def shard_col(self, url_hash):
        return F.pmod(url_hash, F.lit(self.n_shards)).cast("int")

    def geometry(self) -> dict:
        """Probe-compatibility fingerprint — see SeenFilter.geometry."""
        return {"kind": "cuckoo", "n_shards": self.n_shards,
                "m_indexes": self.m, "slots": self.slots}

    # -- core NumPy kernels (per shard) --
    def _place(self, h_sorted: np.ndarray, table: np.ndarray,
               stash: list[int]) -> None:
        """Two-round greedy placement of DISTINCT sorted keys into
        `table` (uint16 view, shape (m, slots), mutated); overflow
        appended to `stash`. Slot order inside an index is compacted
        first — it carries no meaning (lookup is set-membership)."""
        m, slots = self.m, self.slots
        # compact: nonzero fingerprints to the front of each index row
        occ = (table != 0).sum(axis=1).astype(np.int64)
        nz = table != 0
        packed = np.zeros_like(table)
        idx_r, slot_r = np.nonzero(nz)
        if len(idx_r):
            _, r = _rank_within(idx_r)  # idx_r already sorted
            packed[idx_r, r] = table[idx_r, slot_r]
        table[:] = packed
        fp, i1, i2 = _cuckoo_parts(h_sorted, m)
        # round A: everyone tries i1; capacity = slots - current occ
        oa, ra = _rank_within(i1)
        cap1 = slots - occ[i1[oa]]
        put_a = ra < cap1
        a_idx, a_slot = i1[oa[put_a]], occ[i1[oa[put_a]]] + ra[put_a]
        table[a_idx, a_slot] = fp[oa[put_a]]
        np.add.at(occ, a_idx, 1)
        # round B: the spill tries i2 against post-A occupancy
        rem = oa[~put_a]
        rem = rem[np.argsort(h_sorted[rem], kind="stable")]
        if len(rem):
            ob, rb = _rank_within(i2[rem])
            cap2 = slots - occ[i2[rem[ob]]]
            put_b = rb < cap2
            b_keys = rem[ob[put_b]]
            b_idx = i2[b_keys]
            table[b_idx, occ[b_idx] + rb[put_b]] = fp[b_keys]
            np.add.at(occ, b_idx, 1)
            stash.extend(h_sorted[rem[ob[~put_b]]].tolist())

    def _probe(self, table_b: bytes, stash_b: bytes,
               h: np.ndarray) -> np.ndarray:
        table = np.frombuffer(table_b, dtype=np.uint16).reshape(
            self.m, self.slots
        )
        stash = np.frombuffer(stash_b, dtype=np.int64)
        fp, i1, i2 = _cuckoo_parts(h, self.m)
        fp16 = fp.astype(np.uint16)
        hit = (table[i1] == fp16[:, None]).any(axis=1)
        hit |= (table[i2] == fp16[:, None]).any(axis=1)
        if len(stash):
            hit |= np.isin(h, stash)
        return hit

    # -- build / add / delete --
    def build(self, frontier: DataFrame) -> DataFrame:
        """frontier(url_hash, …) → (shard, table, stash, n_keys)."""
        filt = self

        def build_shard(pdf: pd.DataFrame) -> pd.DataFrame:
            h = np.unique(pdf["url_hash"].to_numpy(dtype=np.int64))
            table = np.zeros((filt.m, filt.slots), dtype=np.uint16)
            stash: list[int] = []
            filt._place(h, table, stash)
            return pd.DataFrame(
                {
                    "shard": [int(pdf["shard"].iloc[0])],
                    "table": [table.tobytes()],
                    "stash": [np.asarray(stash, dtype=np.int64).tobytes()],
                    "n_keys": [len(h)],
                }
            )

        keyed = frontier.select(
            self.shard_col(F.col("url_hash")).alias("shard"), "url_hash"
        )
        return keyed.groupBy("shard").applyInPandas(build_shard, CUCKOO_SCHEMA)

    def add(self, seen: DataFrame, new_urls: DataFrame) -> DataFrame:
        """Insert new url_hashes into existing shard tables — free
        slots first (i1 then i2), stash overflow appended. No rebuild;
        each shard row rewrites once (the same incremental contract as
        SeenFilter.add's bitset OR).

        `n_keys` is an UPPER-BOUND insert counter (n0 + batch-unique
        keys, no prior-membership probe): a key added twice counts —
        and occupies a slot — twice, while delete() decrements only on
        a successful removal. Callers keep it exact by feeding add()
        only definitely-new keys (the crawl loop feeds the
        maybe_seen=False set, which cannot already be present); fed
        overlapping deltas, the counter tracks inserts, not distinct
        members, and load-factor math should treat it as a ceiling."""
        filt = self
        delta = new_urls.select(
            self.shard_col(F.col("url_hash")).alias("shard"), "url_hash"
        )

        def merge(spdf: pd.DataFrame, dpdf: pd.DataFrame) -> pd.DataFrame:
            shard = int(
                (spdf if len(spdf) else dpdf)["shard"].iloc[0]
            )
            if len(spdf):
                table = np.frombuffer(
                    spdf["table"].iloc[0], dtype=np.uint16
                ).reshape(filt.m, filt.slots).copy()
                stash = np.frombuffer(
                    spdf["stash"].iloc[0], dtype=np.int64
                ).tolist()
                n0 = int(spdf["n_keys"].iloc[0])
            else:
                table = np.zeros((filt.m, filt.slots), dtype=np.uint16)
                stash, n0 = [], 0
            h = (
                np.unique(dpdf["url_hash"].to_numpy(dtype=np.int64))
                if len(dpdf)
                else np.zeros(0, dtype=np.int64)
            )
            filt._place(h, table, stash)
            return pd.DataFrame(
                {
                    "shard": [shard],
                    "table": [table.tobytes()],
                    "stash": [np.asarray(stash, dtype=np.int64).tobytes()],
                    "n_keys": [n0 + len(h)],
                }
            )

        return (
            seen.groupBy("shard")
            .cogroup(delta.groupBy("shard"))
            .applyInPandas(merge, CUCKOO_SCHEMA)
        )

    def _remove(self, hs: np.ndarray, table: np.ndarray,
                stash: list[int]) -> int:
        """Two-round greedy delete of DISTINCT sorted keys, the mirror
        of _place: round A, every key claims one occurrence of its
        fingerprint at i1 (rank-by-key within (i1, fp), guarded by the
        occurrence count there); round B, the spill claims at i2
        against post-A availability; the rest remove their EXACT key
        from the stash (no-op if absent). Deliberate divergence from
        the paper's per-delete slot scan, documented like the build's
        two-round placement: order-independent and window-expressible,
        so the gate replays the whole delete in ANSI SQL — and the
        kernel is vectorized (per-(index,fp) group ops, no per-delete
        branch chain). Same membership caveat as any cuckoo delete
        (§3.2): only delete inserted keys. Returns #removed."""
        if not len(hs):
            return 0
        m = self.m
        fp, i1, i2 = _cuckoo_parts(hs, m)
        fp16 = fp.astype(np.uint16)
        removed = 0
        # round A at i1: rank within (i1, fp) by key order, guarded by
        # the occurrence count currently stored there
        gA = i1 * np.int64(1 << 16) + fp
        oA, rA = _rank_within(gA)
        availA = (table[i1[oA]] == fp16[oA][:, None]).sum(axis=1)
        takeA = rA < availA
        for v, f, c in _group_counts(i1[oA[takeA]], fp16[oA[takeA]]):
            slots_f = np.flatnonzero(table[v] == f)
            table[v, slots_f[:c]] = 0
            removed += c
        # round B: the spill tries i2 against post-A occupancy
        rem = oA[~takeA]
        rem = rem[np.argsort(hs[rem], kind="stable")]
        stash_arr = np.asarray(stash, dtype=np.int64)
        if len(rem):
            gB = i2[rem] * np.int64(1 << 16) + fp[rem]
            oB, rB = _rank_within(gB)
            availB = (table[i2[rem[oB]]] == fp16[rem[oB]][:, None]).sum(
                axis=1
            )
            takeB = rB < availB
            for v, f, c in _group_counts(
                i2[rem[oB[takeB]]], fp16[rem[oB[takeB]]]
            ):
                slots_f = np.flatnonzero(table[v] == f)
                table[v, slots_f[:c]] = 0
                removed += c
            # the rest: exact-key stash removal
            left = hs[rem[oB[~takeB]]]
            if len(left) and len(stash_arr):
                gone = np.isin(stash_arr, left)
                removed += int(gone.sum())
                stash_arr = stash_arr[~gone]
        stash[:] = stash_arr.tolist()
        return removed

    def delete(self, seen: DataFrame, gone_urls: DataFrame) -> DataFrame:
        """Remove ONE stored occurrence per deleted url_hash (slot at
        i1, else i2, else exact stash key) — the filter operation
        blooms can't do. Canonical caveat (paper §3.2): only delete
        keys that were inserted; a delete may remove another key's
        identical fingerprint at a shared index, which stays
        membership-safe because the probe matches the survivor. The
        per-shard kernel is the order-independent two-round _remove."""
        filt = self
        delta = gone_urls.select(
            self.shard_col(F.col("url_hash")).alias("shard"), "url_hash"
        )

        def drop(spdf: pd.DataFrame, dpdf: pd.DataFrame) -> pd.DataFrame:
            if not len(spdf):
                return pd.DataFrame(
                    columns=["shard", "table", "stash", "n_keys"]
                ).astype({"shard": "int32", "n_keys": "int64"})
            shard = int(spdf["shard"].iloc[0])
            table = np.frombuffer(
                spdf["table"].iloc[0], dtype=np.uint16
            ).reshape(filt.m, filt.slots).copy()
            stash = np.frombuffer(
                spdf["stash"].iloc[0], dtype=np.int64
            ).tolist()
            n = int(spdf["n_keys"].iloc[0])
            hs = (
                np.unique(dpdf["url_hash"].to_numpy(dtype=np.int64))
                if len(dpdf)
                else np.zeros(0, dtype=np.int64)
            )
            n -= filt._remove(hs, table, stash)
            return pd.DataFrame(
                {
                    "shard": [shard],
                    "table": [table.tobytes()],
                    "stash": [np.asarray(stash, dtype=np.int64).tobytes()],
                    "n_keys": [n],
                }
            )

        return (
            seen.groupBy("shard")
            .cogroup(delta.groupBy("shard"))
            .applyInPandas(drop, CUCKOO_SCHEMA)
        )

    # -- probe --
    def mark_seen(self, candidates: DataFrame, seen: DataFrame,
                  url_hash_col: str = "url_hash",
                  mode: str = "auto") -> DataFrame:
        """Add boolean `maybe_seen`; same broadcast/partitioned duality
        and auto rule as SeenFilter.mark_seen."""
        if mode == "auto":
            table_bytes = self.n_shards * self.m * self.slots * 2
            mode = (
                "broadcast"
                if table_bytes <= self.BROADCAST_LIMIT_BYTES
                else "partitioned"
            )
        if mode == "partitioned":
            return self._mark_seen_partitioned(candidates, seen, url_hash_col)
        filt, ns = self, self.n_shards
        table = {
            int(r.shard): (bytes(r.table), bytes(r.stash))
            for r in seen.collect()
        }
        bc = candidates.sparkSession.sparkContext.broadcast(table)

        def probe_batches(batches):
            tbl = bc.value
            for pdf in batches:
                hv = pdf[url_hash_col].to_numpy(dtype=np.int64)
                shards = hv % ns
                out = np.zeros(len(pdf), dtype=bool)
                for s in np.unique(shards):
                    row = tbl.get(int(s))
                    if row is None:
                        continue
                    mask = shards == s
                    out[mask] = filt._probe(row[0], row[1], hv[mask])
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
        filt = self
        cand = candidates.withColumn(
            "__shard", self.shard_col(F.col(url_hash_col))
        )
        out_schema = T.StructType(
            list(candidates.schema.fields)
            + [T.StructField("maybe_seen", T.BooleanType())]
        )

        def probe(cpdf: pd.DataFrame, spdf: pd.DataFrame) -> pd.DataFrame:
            res = cpdf.drop(columns=["__shard"])
            if len(spdf) and len(cpdf):
                hv = cpdf[url_hash_col].to_numpy(dtype=np.int64)
                res["maybe_seen"] = filt._probe(
                    spdf["table"].iloc[0], spdf["stash"].iloc[0], hv
                )
            else:
                res["maybe_seen"] = np.zeros(len(cpdf), dtype=bool)
            return res

        return (
            cand.groupBy("__shard")
            .cogroup(seen.groupBy("shard"))
            .applyInPandas(probe, out_schema)
        )

    def unseen(self, candidates: DataFrame, seen: DataFrame,
               url_hash_col: str = "url_hash",
               mode: str = "auto") -> DataFrame:
        """Candidates definitely not in the seen set (no false
        negatives: every inserted key is in a slot or the stash)."""
        return self.mark_seen(candidates, seen, url_hash_col, mode).filter(
            ~F.col("maybe_seen")
        ).drop("maybe_seen")
