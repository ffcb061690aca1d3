"""Deterministic synthetic web — the test/bench input generator.

No external data (sandbox protocol). Every property of every page —
its HTTP outcome, redirect target, span sequence, outlinks, robots
rules — is a pure function of (url, seed) via md5, so:

  * the pandas-UDF fetch stage can "fetch" any URL on any executor
    with zero I/O and full determinism,
  * the pure-Python oracle in tests computes the exact same web, and
  * two runs at different parallelism (local[8] vs local[32]) see the
    identical input, as the scaling-efficiency protocol requires.

Docs follow BASELINE.json input_hint exactly:
(doc_id:string, spans:array<struct<kind,text,media_ref,offset>>),
kind ∈ {text, media}; text spans carry ``href:<url>`` tokens (the
plain-text outlink form, cf. reference parse/OutlinkExtractor.java:62)
and media spans carry media_ref outlinks (cf. reference
parse-html DOMContentUtils.java:72-83 treating img/script/frame src as
outlinks). Span offsets are 0..n-1 strictly increasing.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass, field

_WORDS = (
    "crawl fetch parse link host page rank score queue delay robots "
    "frontier segment anchor token batch spark shuffle bloom hash span"
).split()


@dataclass(frozen=True)
class WebConfig:
    seed: int = 42
    n_hosts: int = 5
    pages_per_host: int = 20
    zipf: bool = True  # host h gets ~pages_per_host*n_hosts/(h+1) pages
    gone_frac: float = 0.05
    redir_frac: float = 0.05
    dup_classes: int = 0  # >0 ⇒ content ids collide → duplicate signatures
    outlinks_per_page: int = 4
    cross_host_frac: float = 0.25
    blocked_hosts: tuple[int, ...] = ()  # robots: forbid-all
    slow_hosts: tuple[int, ...] = ()  # robots: crawl_delay > max ⇒ skipped
    crawl_delay: float = 5.0  # fetcher.server.delay default
    # fraction of ok pages carrying embedded sub-documents (subdoc
    # spans → non-canonical parse entries + canonical-key datums)
    subdoc_frac: float = 0.0
    # emit HTML head structure as spans: kind="meta" (media_ref = tag
    # name, text = value; repeated names ≙ multiple <meta> tags) and
    # kind="heading" (media_ref = h1/h2, text = heading text). Opt-in:
    # the default web keeps the span fixtures of earlier rounds
    # byte-identical. Unknown kinds are inert to text/outlink
    # extraction (parse._text_col/_raw_outlinks_col filter by kind),
    # so these spans ride the span-sequence invariant untouched and
    # feed parse-metatags / headings filters.
    meta_spans: bool = False


def _h(cfg: WebConfig, *parts: object) -> int:
    """Stable 64-bit hash of (seed, *parts)."""
    raw = ("|".join(str(p) for p in parts) + f"|{cfg.seed}").encode()
    return int.from_bytes(hashlib.md5(raw).digest()[:8], "big")


def host_name(cfg: WebConfig, h: int) -> str:
    return f"host{h}.example{h % 3}.com"


def host_pages(cfg: WebConfig, h: int) -> int:
    if not cfg.zipf:
        return cfg.pages_per_host
    n = max(1, int(cfg.pages_per_host * cfg.n_hosts / (h + 1) / 2))
    return min(n, cfg.pages_per_host * cfg.n_hosts)


def page_url(cfg: WebConfig, h: int, i: int) -> str:
    return f"http://{host_name(cfg, h)}/p/{i:05d}"


def seed_urls(cfg: WebConfig) -> list[str]:
    """Page 0 of every host is a seed."""
    return [page_url(cfg, h, 0) for h in range(cfg.n_hosts)]


def _parse_url(cfg: WebConfig, url: str) -> tuple[int, int] | None:
    """url → (host_idx, page_idx) if it is part of the synthetic web."""
    try:
        hostpart, _, rest = url.removeprefix("http://").partition("/p/")
        if not hostpart.startswith("host"):
            return None
        h = int(hostpart.split(".")[0].removeprefix("host"))
        i = int(rest)
        return (h, i)
    except (ValueError, IndexError):
        return None


def page_outcome(cfg: WebConfig, url: str) -> tuple[str, str | None]:
    """(kind, redirect_to); kind ∈ ok|gone|redir_temp|redir_perm|missing."""
    loc = _parse_url(cfg, url)
    if loc is None:
        return ("missing", None)
    h, i = loc
    if i >= host_pages(cfg, h):
        return ("gone", None)
    r = _h(cfg, "outcome", url) % 10_000
    if i > 0 and r < int(cfg.gone_frac * 10_000):
        return ("gone", None)
    if i > 0 and r < int((cfg.gone_frac + cfg.redir_frac) * 10_000):
        tgt = page_url(cfg, h, (i * 7 + 1) % host_pages(cfg, h))
        if tgt != url:
            kind = "redir_perm" if r % 2 else "redir_temp"
            return (kind, tgt)
    return ("ok", None)


def page_outlinks(cfg: WebConfig, url: str) -> list[str]:
    loc = _parse_url(cfg, url)
    if loc is None:
        return []
    h, i = loc
    out: list[str] = []
    npages = host_pages(cfg, h)
    for k in range(cfg.outlinks_per_page):
        r = _h(cfg, "link", url, k)
        if cfg.n_hosts > 1 and (r % 1000) < int(cfg.cross_host_frac * 1000):
            th = r % cfg.n_hosts
            if th == h:
                th = (th + 1) % cfg.n_hosts
            out.append(page_url(cfg, th, (r >> 16) % host_pages(cfg, th)))
        else:
            out.append(page_url(cfg, h, (r >> 16) % max(npages * 2, 1)))
    return out


def page_content_type(cfg: WebConfig, url: str) -> str:
    """Deterministic Content-Type per page: mostly text/html with a
    pdf/xhtml tail — gives MimeAdaptiveFetchSchedule real per-MIME
    input in e2e crawls."""
    r = _h(cfg, "ctype", url) % 10
    if r == 0:
        return "application/pdf; version=1.7"
    if r == 1:
        return "application/xhtml+xml"
    return "text/html"


def content_id(cfg: WebConfig, url: str) -> int:
    """Duplicate-content class (dup_classes>0 ⇒ collisions)."""
    base = _h(cfg, "content", url)
    if cfg.dup_classes > 0:
        return base % cfg.dup_classes
    return base


def page_spans(cfg: WebConfig, url: str) -> list[dict]:
    """Ordered interleaved text+media span sequence for a fetched page.

    Text spans embed ``href:<url>`` outlink tokens; media spans carry
    media_ref outlinks. Content (minus the outlinks) depends only on
    content_id so duplicate classes produce identical signatures.
    """
    cid = content_id(cfg, url)
    links = page_outlinks(cfg, url)
    spans: list[dict] = []
    off = 0
    if cfg.meta_spans:
        def _w(k: int) -> str:
            return _WORDS[(cid >> (5 * k)) % len(_WORDS)]

        head = [
            ("meta", "description", f"all about {_w(0)} and {_w(1)}"),
            ("meta", "keywords", _w(2)),
        ]
        if cid % 2:  # multi-valued keywords (two <meta name=keywords>)
            head.append(("meta", "keywords", _w(3)))
        if cid % 3 == 0:  # mixed-case tag name → lowercased by the parser
            head.append(("meta", "DC.creator", f"{_w(4)} author"))
        if cid % 5 == 0:  # http-equiv rides the same span shape
            head.append(("meta", "refresh", "300"))
        # heading text carries surplus whitespace on purpose — the
        # headings filter must collapse it (HeadingsParseFilter
        # whitespacePattern)
        head.append(("heading", "h1", f"  {_w(0).title()}   page of {_w(1)} "))
        if cid % 2:
            head.append(("heading", "h2", f"section {_w(2)}"))
        if cid % 4 == 0:  # second h1 → only kept when headings.multivalued
            head.append(("heading", "h1", f"alt {_w(3)} title"))
        for kind, name, value in head:
            spans.append(
                {"kind": kind, "text": value, "media_ref": name,
                 "offset": off}
            )
            off += 1
    n_text = 2 + cid % 3
    li = 0
    for t in range(n_text):
        words = [_WORDS[(cid >> (4 * w + t)) % len(_WORDS)] for w in range(6)]
        txt = " ".join(words)
        # attach up to 2 outlinks per text span as href tokens
        for _ in range(2):
            if li < len(links) and (li % 2 == 0):
                txt += f" href:{links[li]}"
                li += 1
            else:
                break
        spans.append({"kind": "text", "text": txt, "media_ref": None, "offset": off})
        off += 1
        if li < len(links):
            spans.append(
                {"kind": "media", "text": None, "media_ref": links[li], "offset": off}
            )
            li += 1
            off += 1
    while li < len(links):
        spans.append(
            {"kind": "media", "text": None, "media_ref": links[li], "offset": off}
        )
        li += 1
        off += 1
    # embedded sub-documents (fork's multi-entry ParseResult): a
    # deterministic fraction of pages carries 1-2 subdoc spans whose
    # sub-URLs live under the page (zip/feed-entry style `!/subN`)
    if cfg.subdoc_frac > 0:
        r = _h(cfg, "subdoc", url) % 10_000
        if r < int(cfg.subdoc_frac * 10_000):
            n_subs = 1 + (r % 2)
            for sidx in range(n_subs):
                stxt = " ".join(
                    _WORDS[(cid >> (3 * w + sidx)) % len(_WORDS)]
                    for w in range(4)
                )
                spans.append(
                    {
                        "kind": "subdoc",
                        "text": stxt,
                        "media_ref": f"{url}!/sub{sidx}",
                        "offset": off,
                    }
                )
                off += 1
    return spans


def robots_rows(cfg: WebConfig) -> list[dict]:
    """Synthetic robots table (FIXTURES.md §5)."""
    rows = []
    for h in range(cfg.n_hosts):
        host = host_name(cfg, h)
        if h in cfg.blocked_hosts:
            rows.append(
                {"host": host, "disallow": ["/"], "crawl_delay": cfg.crawl_delay,
                 "http_code": 200}
            )
        elif h in cfg.slow_hosts:
            rows.append(
                {"host": host, "disallow": [], "crawl_delay": 60.0, "http_code": 200}
            )
        else:
            # every host disallows /p/0004* paths deterministically
            rows.append(
                {"host": host, "disallow": ["/private/"], "crawl_delay": cfg.crawl_delay,
                 "http_code": 200}
            )
    return rows


# ---- Spark-side generation (distributed, no driver loop) ----

def docs_df(spark, cfg: WebConfig):
    """Materialize the full corpus as a docs DataFrame (doc_id, spans).

    Built distributed: spark.range over (host, page) index space, then a
    mapInPandas that calls the deterministic span generator — scales to
    any size without a driver-side loop.
    """
    import pandas as pd  # noqa: PLC0415

    from .schema import DOCS  # noqa: PLC0415

    counts = [(h, host_pages(cfg, h)) for h in range(cfg.n_hosts)]
    offsets = []
    total = 0
    for h, n in counts:
        offsets.append((h, total, total + n))
        total += n

    # range × host-bounds with between-filter (bounds tiny → broadcast)
    from pyspark.sql import functions as F  # noqa: PLC0415

    bounds = spark.createDataFrame(offsets, "h int, lo long, hi long")

    rng = spark.range(0, total)
    b = F.broadcast(bounds)
    joined = rng.join(b, (rng.id >= b.lo) & (rng.id < b.hi)).select(
        "h", (rng.id - b.lo).cast("int").alias("i")
    )

    def gen(batches):
        for pdf in batches:
            rows = []
            for h, i in zip(pdf["h"], pdf["i"]):
                url = page_url(cfg, int(h), int(i))
                rows.append({"doc_id": url, "spans": page_spans(cfg, url)})
            yield pd.DataFrame(rows, columns=["doc_id", "spans"])

    return joined.mapInPandas(gen, DOCS)


def frontier_df(spark, cfg: WebConfig, fetch_time_ms: int, score: float = 1.0):
    """Materialize the full web as a due frontier DataFrame — the
    steady-state-cycle bench input (a 10^10-row frontier's cycle doesn't
    ramp from seeds; this synthesizes the mid-crawl state directly).

    Distributed: spark.range over the page index space, bounds joined
    broadcast, URL text built with JVM concat — no driver-side loop,
    no Python. Scales to any n_hosts.
    """
    from pyspark.sql import functions as F  # noqa: PLC0415

    if not cfg.zipf:
        # uniform pages/host ⇒ pure arithmetic, no join at all
        per = host_pages(cfg, 0)
        rng = spark.range(0, cfg.n_hosts * per)
        joined = rng.select(
            (F.col("id") / per).cast("int").alias("h"),
            (F.col("id") % per).cast("int").alias("i"),
        )
    else:
        counts = [(h, host_pages(cfg, h)) for h in range(cfg.n_hosts)]
        offsets = []
        total = 0
        for h, n in counts:
            offsets.append((h, total, total + n))
            total += n
        bounds = spark.createDataFrame(offsets, "h int, lo long, hi long")
        rng = spark.range(0, total)
        b = F.broadcast(bounds)
        # NB: a range-condition broadcast join is O(rows × hosts) — fine
        # for the zipf test webs (small n_hosts), never for big uniform
        # bench webs, which take the arithmetic path above
        joined = rng.join(b, (rng.id >= b.lo) & (rng.id < b.hi)).select(
            "h", (rng.id - b.lo).cast("int").alias("i")
        )
    host = F.concat(
        F.lit("host"), F.col("h").cast("string"),
        F.lit(".example"), (F.col("h") % 3).cast("string"), F.lit(".com"),
    )
    url = F.concat(
        F.lit("http://"), host, F.lit("/p/"),
        F.lpad(F.col("i").cast("string"), 5, "0"),
    )
    return joined.select(
        url.alias("url"),
        F.xxhash64(url).alias("url_hash"),
        host.alias("host"),
        F.lit(1).alias("status"),  # db_unfetched, due
        F.lit(fetch_time_ms).cast("long").alias("fetch_time"),
        F.lit(0).alias("retries"),
        F.lit(2_592_000).alias("fetch_interval"),
        (F.lit(float(score)) + (F.col("i") % 100) / F.lit(100.0))
        .cast("float")
        .alias("score"),
        F.lit(None).cast("string").alias("signature"),
        F.lit(0).cast("long").alias("modified_time"),
        F.lit(None).cast("map<string,string>").alias("metadata"),
    )


def seeds_df(spark, cfg: WebConfig):
    from .schema import SEEDS  # noqa: PLC0415

    return spark.createDataFrame(
        [(u, {}) for u in seed_urls(cfg)], SEEDS
    )


def robots_df(spark, cfg: WebConfig):
    from .schema import ROBOTS  # noqa: PLC0415

    return spark.createDataFrame(robots_rows(cfg), ROBOTS)
