"""Pure-Python oracle implementing the reference crawl semantics.

Independent (driver-side, no Spark) re-implementation of
inject → generate → fetch → parse → updatedb over the same
deterministic synthetic web, used by test_cycle.py to assert the
north-rule equivalence contract:
  (1) per-cycle generated topN sets,
  (2) per-host fetch order,
  (3) final URL-seen set,
  (4) final frontier status histogram.

Float score arithmetic uses np.float32 at exactly the points the
engine casts to FloatType, so score-ordered selections agree bit-wise.

Includes a pure-Python XXH64 (seed 42) equal to Spark's `xxhash64` —
verified against Spark in test_cycle.py — because intra-host fetch
order is defined as url_hash order (reference HashComparator,
Generator.java:399-429).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from nutch_spark.constants import (
    Defaults,
    STATUS_DB_FETCHED,
    STATUS_DB_GONE,
    STATUS_DB_NOTMODIFIED,
    STATUS_DB_REDIR_PERM,
    STATUS_DB_REDIR_TEMP,
    STATUS_DB_UNFETCHED,
)
from nutch_spark.functions.urls import accept_url, get_host, normalize_url
from nutch_spark.synth import (
    WebConfig,
    page_outcome,
    page_spans,
    robots_rows,
    seed_urls,
)

# ---- XXH64 (pure python, matches Spark sql xxhash64 with seed 42) ----

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M = (1 << 64) - 1


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _round(acc: int, inp: int) -> int:
    acc = (acc + inp * _P2) & _M
    acc = _rotl(acc, 31)
    return (acc * _P1) & _M


def _merge_round(acc: int, val: int) -> int:
    acc ^= _round(0, val)
    return ((acc * _P1) + _P4) & _M


def xxhash64(data: bytes, seed: int = 42) -> int:
    """XXH64 → signed 64-bit int like Spark's xxhash64 column fn."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed & _M
        v4 = (seed - _P1) & _M
        while i <= n - 32:
            v1 = _round(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        h = _merge_round(h, v1)
        h = _merge_round(h, v2)
        h = _merge_round(h, v3)
        h = _merge_round(h, v4)
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while i <= n - 8:
        h ^= _round(0, int.from_bytes(data[i : i + 8], "little"))
        h = ((_rotl(h, 27) * _P1) + _P4) & _M
        i += 8
    if i <= n - 4:
        h ^= (int.from_bytes(data[i : i + 4], "little") * _P1) & _M
        h = ((_rotl(h, 23) * _P2) + _P3) & _M
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M
        h = (_rotl(h, 11) * _P1) & _M
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h - (1 << 64) if h >= (1 << 63) else h


def url_hash(url: str) -> int:
    return xxhash64(url.encode("utf-8"))


# ---- oracle frontier row ----

@dataclass
class Datum:
    status: int
    fetch_time: int
    retries: int = 0
    fetch_interval: int = Defaults.FETCH_INTERVAL
    score: np.float32 = np.float32(0)
    signature: str | None = None
    modified_time: int = 0
    generate_time: int | None = None


@dataclass
class OracleResult:
    generated: list[set] = field(default_factory=list)
    fetch_order: dict = field(default_factory=dict)  # host → [url,…] (last cycle orders appended)
    frontier: dict = field(default_factory=dict)  # url → Datum

    def histogram(self) -> dict:
        h: dict[int, int] = {}
        for d in self.frontier.values():
            h[d.status] = h.get(d.status, 0) + 1
        return h

    def seen(self) -> set:
        return set(self.frontier)


def crawl_oracle(
    web: WebConfig,
    depth: int,
    topn: int,
    start_ms: int = 1_700_000_000_000,
    cycle_ms: int = 3_600_000,
    gen_delay_ms: int = Defaults.GEN_DELAY_MS,
) -> OracleResult:
    import hashlib

    res = OracleResult()
    robots = {r["host"]: r for r in robots_rows(web)}
    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()

    # inject
    for u in seed_urls(web):
        nu = normalize_url(u)
        if nu and accept_url(nu):
            res.frontier[nu] = Datum(
                status=STATUS_DB_UNFETCHED,
                fetch_time=start_ms,
                score=np.float32(Defaults.SCORE_INJECTED),
            )

    for d in range(depth):
        now = start_ms + (d + 1) * cycle_ms
        # --- generate: due + gen-delay skip, topN by (score desc, url_hash asc) ---
        due = [
            (u, dat)
            for u, dat in res.frontier.items()
            if (dat.fetch_time <= now
                or dat.fetch_time - now > Defaults.FETCH_INTERVAL_MAX * 1000)
            and (dat.generate_time is None or dat.generate_time < now - gen_delay_ms)
        ]
        due.sort(key=lambda t: (-float(t[1].score), url_hash(t[0])))
        fetchlist = due[:topn] if topn > 0 else due
        gen_set = {u for u, _ in fetchlist}
        res.generated.append(gen_set)
        for u, dat in fetchlist:
            dat.generate_time = now

        # --- fetch per host in url_hash order with politeness slots ---
        by_host: dict[str, list[str]] = {}
        for u, _ in fetchlist:
            by_host.setdefault(get_host(u), []).append(u)
        fetch_out = {}  # url → (kind, redirect_to, spans, fetch_time_ms)
        for host, urls in by_host.items():
            urls.sort(key=url_hash)
            rules = robots.get(host)
            delay = float(rules["crawl_delay"]) if rules and rules.get("crawl_delay") is not None else 5.0
            if delay > Defaults.MAX_CRAWL_DELAY:
                for u in urls:
                    fetch_out[u] = ("robots_gone", None, None, now)
                continue
            delay_ms = int(delay * 1000)
            slot = 0
            for u in urls:
                path = u.split("/", 3)
                path = "/" + path[3] if len(path) > 3 else "/"
                denied = False
                if rules:
                    code = rules.get("http_code", 200)
                    if code == 403:
                        denied = True
                    elif code < 500:
                        for p in rules.get("disallow") or ():
                            if path.startswith(p):
                                denied = True
                                break
                if denied:
                    fetch_out[u] = ("robots_gone", None, None, now)
                    continue
                t = now + slot * delay_ms
                slot += 1
                res.fetch_order.setdefault(host, []).append(u)
                kind, redir = page_outcome(web, u)
                spans = page_spans(web, u) if kind == "ok" else None
                fetch_out[u] = (kind, redir, spans, t)

        # --- parse: outlinks + signature + contribs ---
        new_link_urls: dict[str, list[np.float32]] = {}
        signatures: dict[str, str] = {}
        for u, (kind, redir, spans, _t) in fetch_out.items():
            if kind == "ok":
                texts = [s["text"] for s in spans if s["kind"] == "text"]
                raw = []
                for s in spans:
                    if s["kind"] == "media":
                        raw.append(s["media_ref"])
                    else:
                        raw.extend(
                            tok[len("href:"):]
                            for tok in s["text"].split()
                            if tok.startswith("href:")
                        )
                import re

                text = " ".join(texts)
                text = re.sub(r"href:(\S+)", "", text).strip()
                signatures[u] = md5(text)
                kept, seen_l = [], set()
                for r in raw:
                    t = normalize_url(r)
                    if not t or not accept_url(t) or t == u:
                        continue
                    if t in seen_l:
                        continue
                    seen_l.add(t)
                    kept.append(t)
                    if len(kept) >= Defaults.MAX_OUTLINKS_PER_PAGE:
                        break
                if kept:
                    score = res.frontier[u].score
                    c = np.float32(float(score) / len(kept) * 1.0)
                    for t in kept:
                        new_link_urls.setdefault(t, []).append(c)
            elif kind in ("redir_temp", "redir_perm") and redir:
                t = normalize_url(redir)
                if t and accept_url(t):
                    new_link_urls.setdefault(t, []).append(np.float32(0.0))

        # --- updatedb ---
        link_adjust = {
            t: np.float32(float(np.sum(np.asarray(v, dtype=np.float64))))
            for t, v in new_link_urls.items()
        }
        for u, (kind, redir, spans, t) in fetch_out.items():
            dat = res.frontier[u]
            dat.generate_time = None  # marker stripped on update
            if kind == "ok":
                sig = signatures.get(u)
                if dat.signature is not None and sig is not None and dat.signature == sig:
                    dat.status = STATUS_DB_NOTMODIFIED
                else:
                    dat.status = STATUS_DB_FETCHED
                    dat.signature = sig
                dat.retries = 0
                dat.fetch_time = t + dat.fetch_interval * 1000
            elif kind in ("gone", "missing", "robots_gone"):
                dat.status = STATUS_DB_GONE
                grown = dat.fetch_interval * 1.5
                dat.fetch_interval = int(grown if grown < Defaults.FETCH_INTERVAL_MAX else Defaults.FETCH_INTERVAL_MAX * 0.9)
                dat.fetch_time = t + dat.fetch_interval * 1000
            elif kind == "redir_temp":
                dat.status = STATUS_DB_REDIR_TEMP
                dat.fetch_time = t + dat.fetch_interval * 1000
                dat.retries = 0
            elif kind == "redir_perm":
                dat.status = STATUS_DB_REDIR_PERM
                dat.fetch_time = t + dat.fetch_interval * 1000
                dat.retries = 0
        for t, adj in link_adjust.items():
            if t in res.frontier:
                dat = res.frontier[t]
                dat.score = np.float32(float(dat.score) + float(adj))
                if t not in fetch_out:
                    dat.generate_time = None
            else:
                res.frontier[t] = Datum(
                    status=STATUS_DB_UNFETCHED,
                    fetch_time=now,
                    score=np.float32(float(adj)),
                )
    return res
