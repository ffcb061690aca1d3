"""Status codes and configuration defaults.

Status byte values mirror the reference CrawlDatum exactly
(reference: src/java/org/apache/nutch/crawl/CrawlDatum.java:52-92)
so that fixtures and the state-transition matrix line up 1:1.
Config defaults mirror reference conf/nutch-default.xml.
"""

from __future__ import annotations

# --- DB states (frontier rows) — CrawlDatum.java:53-64 ---
STATUS_DB_UNFETCHED = 0x01
STATUS_DB_FETCHED = 0x02
STATUS_DB_GONE = 0x03
STATUS_DB_REDIR_TEMP = 0x04
STATUS_DB_REDIR_PERM = 0x05
STATUS_DB_NOTMODIFIED = 0x06
STATUS_DB_DUPLICATE = 0x07
STATUS_DB_MAX = 0x1F

# --- Fetch states (cycle outputs) — CrawlDatum.java:70-83 ---
STATUS_FETCH_SUCCESS = 0x21
STATUS_FETCH_RETRY = 0x22
STATUS_FETCH_REDIR_TEMP = 0x23
STATUS_FETCH_REDIR_PERM = 0x24
STATUS_FETCH_GONE = 0x25
STATUS_FETCH_NOTMODIFIED = 0x26
STATUS_FETCH_MAX = 0x3F

# --- Transient / carrier states — CrawlDatum.java:86-92 ---
STATUS_SIGNATURE = 0x41
STATUS_INJECTED = 0x42
STATUS_LINKED = 0x43
STATUS_PARSE_META = 0x44

STATUS_NAMES = {
    STATUS_DB_UNFETCHED: "db_unfetched",
    STATUS_DB_FETCHED: "db_fetched",
    STATUS_DB_GONE: "db_gone",
    STATUS_DB_REDIR_TEMP: "db_redir_temp",
    STATUS_DB_REDIR_PERM: "db_redir_perm",
    STATUS_DB_NOTMODIFIED: "db_notmodified",
    STATUS_DB_DUPLICATE: "db_duplicate",
    STATUS_FETCH_SUCCESS: "fetch_success",
    STATUS_FETCH_RETRY: "fetch_retry",
    STATUS_FETCH_REDIR_TEMP: "fetch_redir_temp",
    STATUS_FETCH_REDIR_PERM: "fetch_redir_perm",
    STATUS_FETCH_GONE: "fetch_gone",
    STATUS_FETCH_NOTMODIFIED: "fetch_notmodified",
    STATUS_SIGNATURE: "signature",
    STATUS_INJECTED: "injected",
    STATUS_LINKED: "linked",
    STATUS_PARSE_META: "parse_metadata",
}


def has_db_status(status: int) -> bool:
    """CrawlDatum.hasDbStatus equivalent (CrawlDatum.java:133-137)."""
    return 0 < status <= STATUS_DB_MAX


def has_fetch_status(status: int) -> bool:
    """CrawlDatum.hasFetchStatus equivalent (CrawlDatum.java:139-143)."""
    return STATUS_DB_MAX < status <= STATUS_FETCH_MAX


# --- Defaults mirroring conf/nutch-default.xml ---
class Defaults:
    # db.fetch.interval.default (nutch-default.xml:416-417): 30 days
    FETCH_INTERVAL = 2_592_000
    # db.fetch.interval.max (nutch-default.xml:423): 90 days
    FETCH_INTERVAL_MAX = 7_776_000
    # db.fetch.retry.max (nutch-default.xml:652)
    RETRY_MAX = 3
    # db.score.injected (nutch-default.xml)
    SCORE_INJECTED = 1.0
    # db.score.link.internal / db.score.link.external
    SCORE_LINK_INTERNAL = 1.0
    SCORE_LINK_EXTERNAL = 1.0
    # db.update.max.inlinks (CrawlDbReducer.java:57-58)
    MAX_INLINKS = 10_000
    # db.max.outlinks.per.page (nutch-default.xml:627-628)
    MAX_OUTLINKS_PER_PAGE = 100
    # db.max.anchor.length (LinkDb anchor truncation)
    MAX_ANCHOR_LENGTH = 100
    # fetcher.server.delay (nutch-default.xml:781-782): seconds
    SERVER_DELAY = 5.0
    # fetcher.threads.per.queue (nutch-default.xml:823-824)
    THREADS_PER_QUEUE = 1
    # fetcher.max.crawl.delay (FetcherThread.java:273-283): seconds
    MAX_CRAWL_DELAY = 30.0
    # http.redirect.max (nutch-default.xml:294-295): 0 = record, don't follow
    REDIRECT_MAX = 0
    # generate.max.count (nutch-default.xml:715-725): -1 = unlimited
    GENERATE_MAX_COUNT = -1
    # crawl.gen.delay (nutch-default.xml:768-769): 7 days, ms
    GEN_DELAY_MS = 7 * 24 * 3600 * 1000
    # Adaptive schedule (nutch-default.xml:442-481)
    ADAPTIVE_INC_RATE = 0.2
    ADAPTIVE_DEC_RATE = 0.2
    ADAPTIVE_MIN_INTERVAL = 60
    ADAPTIVE_MAX_INTERVAL = 31_536_000  # 365 d
    ADAPTIVE_SYNC_DELTA = True
    ADAPTIVE_SYNC_DELTA_RATE = 0.3
    # fetcher.queue.mode / generate.count.mode / partition.url.mode
    QUEUE_MODE = "byHost"
    # interval multiplier when a page is gone (AbstractFetchSchedule.java:107-117)
    GONE_INTERVAL_FACTOR = 1.5


# Reserved seed metadata keys (Injector.java:87-98)
META_SCORE_KEY = "nutch.score"
META_INTERVAL_KEY = "nutch.fetchInterval"
META_FIXED_INTERVAL_KEY = "nutch.fetchInterval.fixed"
META_REPR_URL = "_repr_"
META_GENERATE_TIME = "_ngt_"
META_REDIRECT_DISCOVERED = "_rdsc_"
