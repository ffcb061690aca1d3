"""Injector merge rules (FIXTURES.md §C; reference Injector.java:257-312)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from nutch_spark.constants import Defaults, STATUS_DB_FETCHED, STATUS_DB_GONE, STATUS_DB_UNFETCHED
from nutch_spark.operators.inject import inject
from nutch_spark.schema import FRONTIER, SEEDS

T0 = 1_700_000_000_000


def seeds(spark, rows):
    return spark.createDataFrame([Row(url=u, metadata=m) for u, m in rows], SEEDS)


def existing(spark, url, status=STATUS_DB_FETCHED, **kw):
    base = dict(
        url=url, url_hash=1, host="foo.com", status=status, fetch_time=T0 - 99,
        retries=2, fetch_interval=999, score=7.0, signature="sig",
        modified_time=5, metadata={"old": "1"},
    )
    base.update(kw)
    return spark.createDataFrame([Row(**base)], FRONTIER)


def test_new_seed_defaults(spark):
    out = inject(spark, None, seeds(spark, [("http://foo.com/a", {})]), T0).collect()
    assert len(out) == 1
    r = out[0]
    assert r.status == STATUS_DB_UNFETCHED
    assert r.score == pytest.approx(Defaults.SCORE_INJECTED)
    assert r.fetch_interval == Defaults.FETCH_INTERVAL
    assert r.fetch_time == T0
    assert r.host == "foo.com"


def test_seed_metadata_overrides(spark):
    """nutch.score / nutch.fetchInterval reserved keys (Injector.java:87-98)."""
    m = {"nutch.score": "10", "nutch.fetchInterval": "3600", "k": "v"}
    r = inject(spark, None, seeds(spark, [("http://foo.com/a", m)]), T0).collect()[0]
    assert r.score == pytest.approx(10.0)
    assert r.fetch_interval == 3600
    assert r.metadata["k"] == "v"


def test_seed_normalized_and_filtered(spark):
    s = seeds(
        spark,
        [
            ("HTTP://Foo.COM:80/a/../b", {}),   # normalizes
            ("http://foo.com/img.gif", {}),     # filtered: extension
            ("mailto:x@y.z", {}),               # filtered: protocol
        ],
    )
    out = inject(spark, None, s, T0).collect()
    assert [r.url for r in out] == ["http://foo.com/b"]


def test_existing_kept_no_flags(spark):
    fr = existing(spark, "http://foo.com/a")
    out = inject(
        spark, fr, seeds(spark, [("http://foo.com/a", {"nutch.score": "10"})]), T0
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r.status == STATUS_DB_FETCHED
    assert r.score == pytest.approx(7.0)
    assert r.fetch_interval == 999
    assert r.metadata == {"old": "1"}


def test_overwrite_wins(spark):
    fr = existing(spark, "http://foo.com/a")
    r = inject(
        spark, fr, seeds(spark, [("http://foo.com/a", {})]), T0, overwrite=True
    ).collect()[0]
    assert r.status == STATUS_DB_UNFETCHED
    assert r.score == pytest.approx(1.0)
    assert r.signature is None


def test_update_merges(spark):
    fr = existing(spark, "http://foo.com/a")
    m = {"nutch.score": "10", "old": "2", "new": "3"}
    r = inject(
        spark, fr, seeds(spark, [("http://foo.com/a", m)]), T0, update=True
    ).collect()[0]
    # old row kept (status/signature), metadata merged with seed override,
    # non-default score copied
    assert r.status == STATUS_DB_FETCHED
    assert r.signature == "sig"
    assert r.score == pytest.approx(10.0)
    assert r.metadata["old"] == "2"
    assert r.fetch_interval == 999  # seed interval default ⇒ old kept


def test_db_only_rows_untouched(spark):
    fr = existing(spark, "http://foo.com/z")
    out = inject(spark, fr, seeds(spark, [("http://foo.com/a", {})]), T0).collect()
    by_url = {r.url: r for r in out}
    assert set(by_url) == {"http://foo.com/z", "http://foo.com/a"}
    assert by_url["http://foo.com/z"].score == pytest.approx(7.0)


def test_purge_404(spark):
    fr = existing(spark, "http://foo.com/gone", status=STATUS_DB_GONE)
    out = inject(
        spark, fr, seeds(spark, [("http://foo.com/a", {})]), T0, purge_404=True
    ).collect()
    assert [r.url for r in out] == ["http://foo.com/a"]
