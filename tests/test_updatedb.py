"""UpdateDb state-transition matrix.

Replicates the reference's golden matrix
(src/test/org/apache/nutch/crawl/TestCrawlDbStates.java:65-187):
∀ schedule × old-db-status (incl. absent) × fetch-status (incl.
links-only) ⇒ expected resulting status, plus the retry counter,
signature/notmodified, force-refetch and metadata rules from
CrawlDbReducer.java:64-322.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from nutch_spark.constants import (
    Defaults,
    STATUS_DB_DUPLICATE,
    STATUS_DB_FETCHED,
    STATUS_DB_GONE,
    STATUS_DB_NOTMODIFIED,
    STATUS_DB_REDIR_PERM,
    STATUS_DB_REDIR_TEMP,
    STATUS_DB_UNFETCHED,
    STATUS_FETCH_GONE,
    STATUS_FETCH_NOTMODIFIED,
    STATUS_FETCH_REDIR_PERM,
    STATUS_FETCH_REDIR_TEMP,
    STATUS_FETCH_RETRY,
    STATUS_FETCH_SUCCESS,
    STATUS_LINKED,
    STATUS_SIGNATURE,
)
from nutch_spark.operators.updatedb import updatedb
from nutch_spark.schema import CRAWL_PARSE, FETCH_RESULTS, FRONTIER

T0 = 1_700_000_000_000
URL = "http://host0.example.com/p/0"

DB_STATUSES = [
    None,  # absent
    STATUS_DB_UNFETCHED,
    STATUS_DB_FETCHED,
    STATUS_DB_GONE,
    STATUS_DB_REDIR_TEMP,
    STATUS_DB_REDIR_PERM,
    STATUS_DB_NOTMODIFIED,
    STATUS_DB_DUPLICATE,
]

# fetch status → expected db status (TestCrawlDbStates.java:65-73 pairs)
FETCH_EXPECT = {
    STATUS_FETCH_SUCCESS: STATUS_DB_FETCHED,
    STATUS_FETCH_GONE: STATUS_DB_GONE,
    STATUS_FETCH_REDIR_TEMP: STATUS_DB_REDIR_TEMP,
    STATUS_FETCH_REDIR_PERM: STATUS_DB_REDIR_PERM,
    STATUS_FETCH_NOTMODIFIED: STATUS_DB_NOTMODIFIED,
}


def frontier_row(status, **kw):
    base = dict(
        url=URL,
        url_hash=1,
        host="host0.example.com",
        status=status,
        fetch_time=T0 - 1000,
        retries=0,
        fetch_interval=Defaults.FETCH_INTERVAL,
        score=1.0,
        signature=None,
        modified_time=0,
        metadata={},
    )
    base.update(kw)
    return Row(**base)


def fetch_row(status, **kw):
    base = dict(
        url=URL,
        url_hash=1,
        host="host0.example.com",
        status=status,
        prev_status=STATUS_DB_UNFETCHED,
        fetch_time=T0,
        retries=0,
        fetch_interval=Defaults.FETCH_INTERVAL,
        score=1.0,
        prev_signature=None,
        prev_modified_time=0,
        redirect_to=None,
        protocol_status="",
        spans=None,
        metadata={},
        segment="s",
    )
    base.update(kw)
    return Row(**base)


def linked_row(url=URL, score=0.5, from_url="http://other.example.com/"):
    return Row(
        url=url,
        status=STATUS_LINKED,
        score=score,
        fetch_interval=Defaults.FETCH_INTERVAL,
        signature=None,
        anchor="a",
        from_url=from_url,
        metadata=None,
        fetch_time=None,
    )


def sig_row(url=URL, signature="abc"):
    return Row(
        url=url,
        status=STATUS_SIGNATURE,
        score=0.0,
        fetch_interval=Defaults.FETCH_INTERVAL,
        signature=signature,
        anchor=None,
        from_url=None,
        metadata=None,
        fetch_time=None,
    )


def run(spark, old_status, fetch_status, n_links=0, schedule="default",
        frontier_kw=None, fetch_kw=None, parse_rows=None):
    frontier = (
        spark.createDataFrame([frontier_row(old_status, **(frontier_kw or {}))], FRONTIER)
        if old_status is not None
        else None
    )
    fetch = (
        spark.createDataFrame([fetch_row(fetch_status, **(fetch_kw or {}))], FETCH_RESULTS)
        if fetch_status is not None
        else None
    )
    cp = list(parse_rows or [])
    cp += [linked_row(score=0.5 / (i + 1)) for i in range(n_links)]
    crawl_parse = spark.createDataFrame(cp, CRAWL_PARSE) if cp else None
    out = updatedb(spark, frontier, fetch, crawl_parse, T0, schedule=schedule).collect()
    assert len(out) <= 1
    return out[0] if out else None


@pytest.mark.parametrize("schedule", ["default", "adaptive"])
@pytest.mark.parametrize("old_status", DB_STATUSES)
@pytest.mark.parametrize("fetch_status", sorted(FETCH_EXPECT))
def test_fetch_transitions(spark, schedule, old_status, fetch_status):
    r = run(spark, old_status, fetch_status, schedule=schedule)
    expected = FETCH_EXPECT[fetch_status]
    assert r is not None
    assert r.status == expected
    assert r.retries == 0
    # next fetch time is in the future
    assert r.fetch_time > T0


@pytest.mark.parametrize("old_status", DB_STATUSES)
@pytest.mark.parametrize("n_links", [1, 2])
def test_linked_only(spark, old_status, n_links):
    """links-only: absent → db_unfetched; present → status unchanged
    (TestCrawlDbStates 'linked' row) with score increased by Σ contribs."""
    r = run(spark, old_status, None, n_links=n_links)
    assert r is not None
    if old_status is None:
        assert r.status == STATUS_DB_UNFETCHED
        assert r.score == pytest.approx(sum(0.5 / (i + 1) for i in range(n_links)))
    else:
        assert r.status == old_status
        assert r.score == pytest.approx(
            1.0 + sum(0.5 / (i + 1) for i in range(n_links))
        )


@pytest.mark.parametrize("retries,expected", [
    (0, STATUS_DB_UNFETCHED),
    (1, STATUS_DB_UNFETCHED),
    (2, STATUS_DB_GONE),  # retries+1 == 3 == retryMax ⇒ gone
    (3, STATUS_DB_GONE),
])
def test_retry_counter(spark, retries, expected):
    """CrawlDbReducer.java:282-295 retry semantics."""
    r = run(
        spark,
        STATUS_DB_UNFETCHED,
        STATUS_FETCH_RETRY,
        fetch_kw={"retries": retries},
        frontier_kw={"retries": retries},
    )
    assert r.status == expected
    if expected == STATUS_DB_UNFETCHED:
        assert r.retries == retries + 1
        assert r.fetch_time == T0 + 86_400_000  # +1 day
    else:
        assert r.fetch_interval == int(Defaults.FETCH_INTERVAL * 1.5)


def test_signature_notmodified(spark):
    """Same signature ⇒ db_notmodified; modifiedTime reset to previous and
    old signature kept (NUTCH-1341, CrawlDbReducer.java:226-247)."""
    r = run(
        spark,
        STATUS_DB_FETCHED,
        STATUS_FETCH_SUCCESS,
        frontier_kw={"signature": "abc", "modified_time": T0 - 5000},
        parse_rows=[sig_row(signature="abc")],
    )
    assert r.status == STATUS_DB_NOTMODIFIED
    assert r.signature == "abc"
    assert r.modified_time == T0 - 5000


def test_signature_modified(spark):
    r = run(
        spark,
        STATUS_DB_FETCHED,
        STATUS_FETCH_SUCCESS,
        frontier_kw={"signature": "abc"},
        parse_rows=[sig_row(signature="xyz")],
    )
    assert r.status == STATUS_DB_FETCHED
    assert r.signature == "xyz"


def test_redirect_never_signature_compared(spark):
    """NUTCH-1422 (CrawlDbReducer.java:223-233): redirects keep redirect
    status even when signatures match."""
    r = run(
        spark,
        STATUS_DB_FETCHED,
        STATUS_FETCH_REDIR_TEMP,
        frontier_kw={"signature": "abc"},
        parse_rows=[sig_row(signature="abc")],
    )
    assert r.status == STATUS_DB_REDIR_TEMP


def test_notmodified_without_old_signature_stays_fetched(spark):
    """No old signature ⇒ cannot judge notmodified ⇒ db_fetched."""
    r = run(
        spark,
        STATUS_DB_UNFETCHED,
        STATUS_FETCH_SUCCESS,
        parse_rows=[sig_row(signature="abc")],
    )
    assert r.status == STATUS_DB_FETCHED
    assert r.signature == "abc"


def test_force_refetch_on_interval_overflow(spark):
    """interval > db.fetch.interval.max ⇒ forceRefetch: db_unfetched,
    signature cleared (CrawlDbReducer.java:274-276)."""
    r = run(
        spark,
        STATUS_DB_FETCHED,
        STATUS_FETCH_SUCCESS,
        fetch_kw={"fetch_interval": Defaults.FETCH_INTERVAL_MAX + 1},
    )
    assert r.status == STATUS_DB_UNFETCHED
    assert r.signature is None


def test_no_new_data_passthrough(spark):
    """Old row with no fetch/links passes through unchanged, including
    the generate-time marker (CrawlDbReducer.java:156-165)."""
    meta = {"_ngt_": "123", "k": "v"}
    r = run(spark, STATUS_DB_FETCHED, None, frontier_kw={"metadata": meta})
    assert r.status == STATUS_DB_FETCHED
    assert r.metadata == meta
    assert r.fetch_time == T0 - 1000


def test_updated_row_strips_generate_marker(spark):
    r = run(
        spark,
        STATUS_DB_UNFETCHED,
        STATUS_FETCH_SUCCESS,
        frontier_kw={"metadata": {"_ngt_": "123", "k": "v"}},
    )
    assert "_ngt_" not in r.metadata
    assert r.metadata.get("k") == "v"


def test_additions_not_allowed(spark):
    frontier = None
    fetch = None
    from nutch_spark.schema import CRAWL_PARSE as CP

    cp = spark.createDataFrame([linked_row()], CP)
    out = updatedb(spark, frontier, fetch, cp, T0, additions_allowed=False).collect()
    assert out == []


def test_gone_schedule_growth(spark):
    """gone ⇒ interval × 1.5 (AbstractFetchSchedule.java:107-117)."""
    r = run(spark, STATUS_DB_FETCHED, STATUS_FETCH_GONE)
    assert r.status == STATUS_DB_GONE
    assert r.fetch_interval == int(Defaults.FETCH_INTERVAL * 1.5)


def test_inlink_cap_top_by_score(spark):
    """Only the top-K inlinks by score are summed (CrawlDbReducer.java:57-58)."""
    links = [linked_row(score=float(i), from_url=f"http://h{i}/") for i in range(5)]
    frontier = spark.createDataFrame([frontier_row(STATUS_DB_FETCHED)], FRONTIER)
    cp = spark.createDataFrame(links, CRAWL_PARSE)
    out = updatedb(spark, frontier, None, cp, T0, max_inlinks=3).collect()[0]
    # top 3 scores: 4+3+2 = 9, plus old score 1.0
    assert out.score == pytest.approx(10.0)


def test_adaptive_interval_shrinks_on_modified(spark):
    r = run(
        spark,
        STATUS_DB_FETCHED,
        STATUS_FETCH_SUCCESS,
        schedule="adaptive",
        frontier_kw={"signature": "abc"},
        parse_rows=[sig_row(signature="xyz")],
        fetch_kw={"fetch_interval": 100_000},
    )
    assert r.fetch_interval < 100_000


def test_adaptive_interval_grows_on_notmodified(spark):
    r = run(
        spark,
        STATUS_DB_FETCHED,
        STATUS_FETCH_SUCCESS,
        schedule="adaptive",
        frontier_kw={"signature": "abc", "modified_time": T0 - 5000},
        parse_rows=[sig_row(signature="abc")],
        fetch_kw={"fetch_interval": 100_000},
    )
    assert r.status == STATUS_DB_NOTMODIFIED
    assert r.fetch_interval > 100_000


def test_adaptive_fixed_interval_override(spark):
    r = run(
        spark,
        STATUS_DB_FETCHED,
        STATUS_FETCH_SUCCESS,
        schedule="adaptive",
        fetch_kw={"metadata": {"nutch.fetchInterval.fixed": "777"}},
        frontier_kw={"metadata": {"nutch.fetchInterval.fixed": "777"}},
    )
    assert r.fetch_interval == 777


def test_scoring_hooks_change_updatedb_score(spark):
    """A custom updateDbScore (half-weight inlinks) changes the merged
    score as predicted; default hooks reproduce OPIC arithmetic."""
    from dataclasses import replace

    from nutch_spark.functions.scoring import OPIC

    frontier = spark.createDataFrame(
        [frontier_row(STATUS_DB_FETCHED, score=1.0)], FRONTIER
    )
    cp = spark.createDataFrame(
        [linked_row(score=0.5), linked_row(score=0.25, from_url="http://h2/")],
        CRAWL_PARSE,
    )
    half = replace(
        OPIC, update_db_score=lambda base, adjust: base + adjust * 0.5
    )
    out_d = updatedb(spark, frontier, None, cp, T0).collect()[0]
    out_h = updatedb(spark, frontier, None, cp, T0, hooks=half).collect()[0]
    assert abs(out_d.score - 1.75) < 1e-6
    assert abs(out_h.score - 1.375) < 1e-6


def test_mime_adaptive_rates(spark):
    """MimeAdaptiveFetchSchedule: the datum's Content-Type picks the
    inc/dec pair (pdf 0.1/0.4, unknown falls back to 0.2/0.2) —
    MimeAdaptiveFetchSchedule.java:30-235."""
    old_sig = "aaa"
    frontier = spark.createDataFrame(
        [frontier_row(STATUS_DB_FETCHED, signature=old_sig)], FRONTIER
    )

    def run_with_mime(mime):
        fetch = spark.createDataFrame(
            [fetch_row(STATUS_FETCH_SUCCESS,
                       metadata={"Content-Type": mime} if mime else None)],
            FETCH_RESULTS,
        )
        cp = spark.createDataFrame([sig_row(signature="bbb")], CRAWL_PARSE)
        return updatedb(
            spark, frontier, fetch, cp, T0, schedule="mime_adaptive"
        ).collect()[0]

    base = Defaults.FETCH_INTERVAL  # 2592000, state=modified → ×(1-dec)
    pdf = run_with_mime("application/pdf; version=1.7")
    assert pdf.fetch_interval == int(base * (1.0 - 0.4))
    html = run_with_mime("text/html")
    assert html.fetch_interval == int(base * (1.0 - 0.2))
    unknown = run_with_mime("image/png")
    assert unknown.fetch_interval == int(base * (1.0 - 0.2))
    absent = run_with_mime(None)
    assert absent.fetch_interval == int(base * (1.0 - 0.2))


def test_mime_adaptive_custom_table(spark):
    from nutch_spark.functions.schedules import parse_mime_rates

    rates = parse_mime_rates("# c\ntext/html\t0.5\t0.5\nbad line\n")
    assert rates == {"text/html": (0.5, 0.5)}
    frontier = spark.createDataFrame(
        [frontier_row(STATUS_DB_FETCHED, signature="aaa")], FRONTIER
    )
    fetch = spark.createDataFrame(
        [fetch_row(STATUS_FETCH_SUCCESS,
                   metadata={"Content-Type": "text/html"})],
        FETCH_RESULTS,
    )
    cp = spark.createDataFrame([sig_row(signature="bbb")], CRAWL_PARSE)
    out = updatedb(
        spark, frontier, fetch, cp, T0,
        schedule="mime_adaptive", mime_rates=rates,
    ).collect()[0]
    assert out.fetch_interval == int(Defaults.FETCH_INTERVAL * 0.5)
