"""REST service surface (service/NutchServer.java + resources/*) —
driven through the Flask test client, no network."""

from __future__ import annotations

import pytest

from nutch_spark.crawl import CrawlConfig, Crawler
from nutch_spark.store import SnapshotStore
from nutch_spark.synth import WebConfig

T0 = 1_700_000_000_000


@pytest.fixture()
def served(spark, tmp_path):
    flask = pytest.importorskip("flask")  # noqa: F841
    from nutch_spark.server import create_app

    web = WebConfig(n_hosts=3, pages_per_host=4, zipf=False)
    cfg = CrawlConfig(depth=1, topn=100, start_time_ms=T0,
                      dedup_each_cycle=False)
    store = SnapshotStore(str(tmp_path / "w"))
    Crawler(spark, store, web, cfg).crawl()
    app = create_app(spark, store, web=web, cfg=cfg)
    app.config.update(TESTING=True)
    return app.test_client(), store


def test_admin_and_db_endpoints(served):
    client, store = served
    r = client.get("/admin")
    assert r.status_code == 200
    body = r.get_json()
    assert body["engine"] == "nutch_spark"
    assert "frontier" in body["tables"]

    r = client.post("/db/crawldb", json={"type": "stats"})
    assert r.status_code == 200
    stats = r.get_json()
    assert sum(row["count"] for row in stats) > 0

    r = client.post("/db/crawldb", json={"type": "topN", "n": 3})
    assert len(r.get_json()) == 3

    some_url = r.get_json()[0]["url"]
    r = client.post("/db/crawldb", json={"type": "url", "url": some_url})
    assert r.get_json()[0]["url"] == some_url

    r = client.post("/db/crawldb", json={"type": "nope"})
    assert r.status_code == 400


def test_segments_hostdb_linkdb(served):
    client, _ = served
    segs = client.get("/segments").get_json()
    assert segs and segs[0]["generated"] > 0
    hosts = client.get("/hostdb").get_json()
    assert len(hosts) >= 3
    # some fetched page has inlinks after the cycle
    dump = client.post(
        "/db/crawldb", json={"type": "dump", "status": 1, "limit": 5}
    ).get_json()
    assert dump  # linked URLs exist
    inl = client.get(f"/linkdb/{dump[0]['url']}").get_json()
    assert isinstance(inl, list)


def test_seed_and_job_cycle(served, spark):
    client, store = served
    before = store.read(spark, "frontier").count()
    r = client.post(
        "/seed", json={"urls": ["http://newhost.example9.com/x"], "now": T0}
    )
    assert r.status_code == 200
    assert r.get_json()["frontier"] == before + 1

    r = client.post("/job/cycle", json={"depth": 1})
    assert r.status_code == 200
    out = r.get_json()
    assert out["segment"] == "seg0001"
    assert client.post("/seed", json={}).status_code == 400
