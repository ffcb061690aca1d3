"""IndexingFilter plugin chain + IndexerMapReduce actions + CleaningJob.

Mirrors the reference plugin unit tests (TestMoreIndexingFilter,
TestStaticFieldIndexerTest, TestSubcollection, TestMimeTypeIndexingFilter,
TestReplaceIndexer, TestIndexReplace) over the Spark document DataFrame.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from nutch_spark.constants import (
    STATUS_DB_DUPLICATE,
    STATUS_DB_FETCHED,
    STATUS_DB_GONE,
    STATUS_DB_REDIR_PERM,
    STATUS_DB_UNFETCHED,
    STATUS_FETCH_GONE,
    STATUS_FETCH_REDIR_TEMP,
    STATUS_FETCH_SUCCESS,
)
from nutch_spark.operators.index import (
    ACTION_ADD,
    ACTION_DELETE,
    cleaning_job,
    index_actions,
    index_documents,
)
from nutch_spark.operators.indexplugins import (
    BasicFields,
    IndexingFilterChain,
    LanguageField,
    LinksFields,
    MetadataFields,
    MimeTypeFilter,
    MoreFields,
    ReplaceFields,
    ReplaceRule,
    StaticFields,
    Subcollection,
    SubcollectionFields,
    TldField,
    UrlMetaFields,
)

T0 = 1_700_000_000_000

DOC_SCHEMA = (
    "url string, title string, text string, anchors array<string>, "
    "boost double, db_fetch_time long, db_signature string, "
    "segment string, db_meta map<string,string>, db_modified_time long, "
    "content_meta map<string,string>"
)


def doc_df(spark, rows):
    return spark.createDataFrame(rows, schema=DOC_SCHEMA)


def doc_row(
    url="http://example.com/a",
    title="Title",
    text="body text",
    db_meta=None,
    content_meta=None,
    db_modified_time=0,
):
    return Row(
        url=url,
        title=title,
        text=text,
        anchors=[],
        boost=1.0,
        db_fetch_time=T0,
        db_signature="sig",
        segment="seg1",
        db_meta=db_meta or {},
        db_modified_time=db_modified_time,
        content_meta=content_meta or {},
    )


@pytest.fixture()
def docs(spark):
    return doc_df(
        spark,
        [
            doc_row(
                url="http://a.example.com/page",
                content_meta={
                    "Content-Type": "text/html; charset=utf-8",
                    "Content-Length": " 1234 ",
                    "Last-Modified": "Tue, 14 Nov 2023 22:13:20 GMT",
                },
            ),
            doc_row(
                url="http://b.example.co.uk/img",
                title="",
                content_meta={"Content-Type": "image/png"},
                db_modified_time=T0 - 1000,
            ),
            doc_row(
                url="http://c.example.com/repr",
                db_meta={"_repr_": "http://canonical.example.com/repr"},
                content_meta={},
            ),
        ]
    )


def by_url(df):
    return {r["url"]: r.asDict() for r in df.collect()}


class TestBasicFields:
    def test_fields(self, docs):
        out = by_url(BasicFields(add_domain=True)(docs))
        a = out["http://a.example.com/page"]
        assert a["host"] == "a.example.com"
        assert a["domain"] == "example.com"
        assert a["content"] == "body text"
        assert a["title"] == "Title"
        assert a["tstamp"] == T0
        # repr-URL substitution (BasicIndexingFilter.java:58-75)
        c = out["http://c.example.com/repr"]
        assert c["doc_url"] == "http://canonical.example.com/repr"
        assert c["host"] == "canonical.example.com"
        # empty title not indexed (NUTCH-1004)
        assert out["http://b.example.co.uk/img"]["title"] is None

    def test_truncation(self, spark):
        df = doc_df(spark, [doc_row(title="T" * 300, text="x" * 500)])
        out = BasicFields(max_title_length=100, max_content_length=64)(
            df
        ).collect()[0]
        assert len(out["title"]) == 100
        assert len(out["content"]) == 64


class TestMoreFields:
    def test_type_split(self, docs):
        out = by_url(MoreFields()(docs))
        a = out["http://a.example.com/page"]
        assert a["type"] == "text/html"  # parameters stripped
        assert a["primary_type"] == "text"
        assert a["sub_type"] == "html"
        assert a["content_length"] == "1234"  # NUTCH-1010 trim
        # Last-Modified parsed: 2023-11-14T22:13:20Z == T0
        assert a["last_modified"] == T0
        assert a["date"] == T0

    def test_date_fallbacks(self, docs):
        out = by_url(MoreFields()(docs))
        b = out["http://b.example.co.uk/img"]
        # no Last-Modified -> modified_time (>0) wins
        assert b["last_modified"] is None
        assert b["date"] == T0 - 1000
        # neither -> fetch time
        c = out["http://c.example.com/repr"]
        assert c["date"] == T0
        assert c["content_length"] is None


class TestTldSubcollectionStatic:
    def test_tld(self, docs):
        out = by_url(IndexingFilterChain([BasicFields(), TldField()])(docs))
        assert out["http://a.example.com/page"]["tld"] == "com"
        assert out["http://b.example.co.uk/img"]["tld"] == "co.uk"

    def test_subcollection(self, docs):
        colls = [
            Subcollection("examples", whitelist=["example.com"]),
            Subcollection(
                "pages", whitelist=["/page", "/img"], blacklist=["b.example"]
            ),
            Subcollection("keyed", whitelist=["/img"], key="collkey"),
        ]
        out = by_url(SubcollectionFields(colls)(docs))
        assert out["http://a.example.com/page"]["subcollection"] == [
            "examples",
            "pages",
        ]
        # blacklist suppresses, keyed goes to its own field
        b = out["http://b.example.co.uk/img"]
        assert b["subcollection"] == []
        assert b["collkey"] == "keyed"

    def test_static(self, docs):
        out = StaticFields(
            {"source": "crawl", "tags": ["t1", "t2"]}
        )(docs).collect()[0]
        assert out["source"] == "crawl"
        assert out["tags"] == ["t1", "t2"]


class TestMetadataUrlMeta:
    def test_lift(self, spark):
        df = doc_df(
            spark,
            [
                doc_row(
                    db_meta={"priority": "9", "team": "news"},
                    content_meta={"X-Custom": "v"},
                )
            ],
        )
        chain = IndexingFilterChain(
            [
                MetadataFields(content_md=["X-Custom"], db_md=["priority"]),
                UrlMetaFields(tags=["team"]),
            ]
        )
        out = chain(df).collect()[0]
        assert out["x_custom"] == "v"
        assert out["priority"] == "9"
        assert out["team"] == "news"


class TestReplace:
    def test_scoped_rules(self, docs):
        rules = [
            ReplaceRule("title", "Title", "Re-Title"),
            ReplaceRule(
                "text", "body", "HOSTONLY", hostmatch=r"a\.example\.com"
            ),
            ReplaceRule(
                "text", "text", "URLONLY", urlmatch=r"/img$"
            ),
        ]
        chain = IndexingFilterChain([BasicFields(), ReplaceFields(rules)])
        out = by_url(chain(docs))
        assert out["http://a.example.com/page"]["title"] == "Re-Title"
        assert out["http://a.example.com/page"]["text"] == "HOSTONLY text"
        assert out["http://b.example.co.uk/img"]["text"] == "body URLONLY"
        assert out["http://c.example.com/repr"]["text"] == "body text"


class TestMimeTypeFilter:
    def test_accept_mode_blocks_matches(self, docs):
        chain = IndexingFilterChain(
            [MoreFields(), MimeTypeFilter(patterns=["image/"])]
        )
        urls = {r["url"] for r in chain(docs).collect()}
        assert "http://b.example.co.uk/img" not in urls
        assert "http://a.example.com/page" in urls
        # missing content-type kept in accept mode
        assert "http://c.example.com/repr" in urls

    def test_deny_mode_keeps_matches(self, docs):
        chain = IndexingFilterChain(
            [
                MoreFields(),
                MimeTypeFilter(patterns=["image/"], accept_mode=False),
            ]
        )
        urls = {r["url"] for r in chain(docs).collect()}
        assert urls == {"http://b.example.co.uk/img"}


class TestLanguageField:
    def test_lang(self, spark):
        df = doc_df(
            spark,
            [
                doc_row(url="http://e/1", text="the cat and the dog with a hat"),
                doc_row(url="http://e/2", text="el perro y la casa de los gatos"),
            ],
        )
        out = by_url(LanguageField()(df))
        assert out["http://e/1"]["lang"] == "en"
        assert out["http://e/2"]["lang"] == "es"


class TestAnchorFields:
    def test_anchor_plain_and_dedup(self, spark):
        from nutch_spark.operators.indexplugins import AnchorFields

        df = doc_df(spark, [doc_row(url="http://e/1")]).withColumn(
            "anchors",
            F.array(
                F.lit("Home"), F.lit("home"), F.lit("news"), F.lit("Home")
            ),
        )
        plain = by_url(AnchorFields()(df))
        assert plain["http://e/1"]["anchor"] == ["Home", "home", "news", "Home"]
        dd = by_url(AnchorFields(deduplicate=True)(df))
        # first occurrence per lowercase key survives
        assert dd["http://e/1"]["anchor"] == ["Home", "news"]

    def test_anchor_null_anchors(self, spark):
        from nutch_spark.operators.indexplugins import AnchorFields

        df = doc_df(spark, [doc_row(url="http://e/2")]).withColumn(
            "anchors", F.lit(None).cast("array<string>")
        )
        out = by_url(AnchorFields(deduplicate=True)(df))
        assert out["http://e/2"]["anchor"] == []


FRONTIER_SCHEMA = (
    "url string, url_hash long, host string, status int, fetch_time long, "
    "retries int, fetch_interval int, score float, signature string, "
    "modified_time long, metadata map<string,string>"
)
FETCH_SCHEMA = "url string, status int, metadata map<string,string>"
PARSE_SCHEMA = "url string, title string, text string, segment string"


def frontier_row(url, status=STATUS_DB_FETCHED, meta=None):
    return Row(
        url=url,
        url_hash=0,
        host=url.split("/")[2],
        status=status,
        fetch_time=T0,
        retries=0,
        fetch_interval=2_592_000,
        score=1.5,
        signature="sig-" + url[-1],
        modified_time=0,
        metadata=meta or {},
    )


def fetch_row(url, status=STATUS_FETCH_SUCCESS, meta=None):
    return Row(
        url=url,
        status=status,
        metadata=meta or {"Content-Type": "text/html"},
    )


def parse_row(url):
    return Row(url=url, title="T " + url, text="body of " + url, segment="s1")


class TestIndexActions:
    @pytest.fixture()
    def inputs(self, spark):
        frontier = spark.createDataFrame(
            [
                frontier_row("http://h1/ok"),
                frontier_row("http://h1/gone", status=STATUS_DB_GONE),
                frontier_row("http://h1/redir", status=STATUS_DB_REDIR_PERM),
                frontier_row("http://h1/dup", status=STATUS_DB_DUPLICATE),
                frontier_row("http://h1/unfetched", status=STATUS_DB_UNFETCHED),
                frontier_row("http://h1/noindex"),
                frontier_row("http://h1/nofetch"),
            ],
            schema=FRONTIER_SCHEMA,
        )
        fetch = spark.createDataFrame(
            [
                fetch_row("http://h1/ok"),
                fetch_row("http://h1/gone", status=STATUS_FETCH_GONE),
                fetch_row("http://h1/redir", status=STATUS_FETCH_REDIR_TEMP),
                fetch_row("http://h1/dup"),
                fetch_row(
                    "http://h1/noindex",
                    meta={"Content-Type": "text/html", "robots": "NOINDEX,nofollow"},
                ),
            ],
            schema=FETCH_SCHEMA,
        )
        parse = spark.createDataFrame(
            [
                parse_row("http://h1/ok"),
                parse_row("http://h1/dup"),
                parse_row("http://h1/noindex"),
                parse_row("http://h1/nofetch"),
            ],
            schema=PARSE_SCHEMA,
        )
        return frontier, fetch, parse

    def test_default_no_delete(self, inputs):
        frontier, fetch, parse = inputs
        out = index_actions(frontier, parse, fetch)
        acts = {r["url"]: r["action"] for r in out.collect()}
        # without delete flags only clean adds come out
        assert acts == {
            "http://h1/ok": ACTION_ADD,
            "http://h1/dup": ACTION_ADD,
            "http://h1/noindex": ACTION_ADD,
        }

    def test_delete_gone_redirects_dups_robots(self, inputs):
        frontier, fetch, parse = inputs
        out = index_actions(
            frontier,
            parse,
            fetch,
            delete_gone=True,
            delete_robots_noindex=True,
        )
        acts = {r["url"]: r["action"] for r in out.collect()}
        assert acts == {
            "http://h1/ok": ACTION_ADD,
            "http://h1/gone": ACTION_DELETE,
            "http://h1/redir": ACTION_DELETE,
            "http://h1/dup": ACTION_DELETE,
            "http://h1/noindex": ACTION_DELETE,
        }
        # deletes carry null docs
        rows = {r["url"]: r for r in out.collect()}
        assert rows["http://h1/gone"]["title"] is None
        assert rows["http://h1/ok"]["title"] == "T http://h1/ok"

    def test_chain_applies_to_adds_only(self, inputs):
        frontier, fetch, parse = inputs
        chain = IndexingFilterChain([BasicFields(), TldField()])
        out = index_actions(
            frontier, parse, fetch, chain=chain, delete_gone=True
        )
        rows = {r["url"]: r for r in out.collect()}
        assert rows["http://h1/ok"]["host"] == "h1"
        assert rows["http://h1/gone"]["host"] is None


class TestCleaningJob:
    def test_gone_and_dups(self, spark):
        frontier = spark.createDataFrame(
            [
                frontier_row("http://h1/ok"),
                frontier_row("http://h1/gone", status=STATUS_DB_GONE),
                frontier_row("http://h1/dup", status=STATUS_DB_DUPLICATE),
            ],
            schema=FRONTIER_SCHEMA,
        )
        out = cleaning_job(frontier).collect()
        assert {r["url"] for r in out} == {"http://h1/gone", "http://h1/dup"}
        assert all(r["action"] == ACTION_DELETE for r in out)


class TestIndexDocumentsExtended:
    def test_extended_columns(self, spark):
        frontier = spark.createDataFrame(
            [frontier_row("http://h1/ok", meta={"k": "v"})],
            schema=FRONTIER_SCHEMA,
        )
        parse = spark.createDataFrame(
            [
                Row(
                    url="http://h1/ok",
                    title="T",
                    text="x",
                    segment="s1",
                    outlinks=[
                        Row(
                            to_url="http://h2/t",
                            anchor="a",
                            kind="text-link",
                            link_order=0,
                        )
                    ],
                )
            ]
        )
        fetch = spark.createDataFrame(
            [fetch_row("http://h1/ok")], schema=FETCH_SCHEMA
        )
        linkdb = spark.createDataFrame(
            [
                Row(
                    url="http://h1/ok",
                    inlinks=[Row(from_url="http://h3/s", anchor="z")],
                )
            ]
        )
        out = index_documents(
            frontier,
            parse,
            linkdb,
            fetch_results=fetch,
            extended=True,
            include_links=True,
        ).collect()[0]
        assert out["db_meta"] == {"k": "v"}
        assert out["content_meta"]["Content-Type"] == "text/html"
        assert out["outlink_urls"] == ["http://h2/t"]
        assert out["inlink_urls"] == ["http://h3/s"]
        # default call keeps the original schema
        base = index_documents(frontier, parse, linkdb)
        assert base.columns == [
            "url",
            "title",
            "text",
            "anchors",
            "boost",
            "db_fetch_time",
            "db_signature",
            "segment",
        ]

    def test_links_fields_outside_host(self, spark):
        df = spark.createDataFrame(
            [
                Row(
                    **{
                        **doc_row().asDict(),
                        "host": "example.com",
                        "outlink_urls": [
                            "http://example.com/self",
                            "http://other.com/x",
                        ],
                        "inlink_urls": ["http://other.com/y"],
                    }
                )
            ],
            schema=DOC_SCHEMA
            + ", host string, outlink_urls array<string>, "
            "inlink_urls array<string>",
        )
        out = LinksFields(only_outside_host=True)(df).collect()[0]
        assert out["outlinks"] == ["http://other.com/x"]
        assert out["inlinks"] == ["http://other.com/y"]


class TestGeoIpFields:
    """index-geoip (GeoIPIndexingFilter.java:211-230): city-db field
    subset from the content-meta `_ip_` key via an injectable geo
    table (MaxMind stand-in)."""

    GEO = {
        "10.0.0.1": ("Berlin", "DE", "Germany", "52.52,13.405",
                     "Europe/Berlin"),
    }

    def test_known_unknown_and_missing_ip(self, spark):
        from nutch_spark.operators.indexplugins import GeoIpFields

        df = doc_df(
            spark,
            [
                doc_row(url="http://a/k", content_meta={"_ip_": "10.0.0.1"}),
                doc_row(url="http://a/u", content_meta={"_ip_": "10.9.9.9"}),
                doc_row(url="http://a/m", content_meta={}),
            ],
        )
        out = {r.url: r for r in GeoIpFields.from_dict(self.GEO)(df).collect()}
        k = out["http://a/k"]
        assert (k.ip, k.city_name, k.country_iso_code, k.country_name,
                k.lat_lon, k.time_zone) == (
            "10.0.0.1", "Berlin", "DE", "Germany", "52.52,13.405",
            "Europe/Berlin",
        )
        # unknown IP: ip field set, geo fields null (doc unchanged path)
        u = out["http://a/u"]
        assert u.ip == "10.9.9.9" and u.city_name is None
        # no _ip_ stored (store.ip.address off): everything null
        m = out["http://a/m"]
        assert m.ip is None and m.city_name is None and m.time_zone is None

    def test_in_chain(self, spark):
        from nutch_spark.operators.indexplugins import (
            GeoIpFields,
            IndexingFilterChain,
        )

        df = doc_df(
            spark, [doc_row(content_meta={"_ip_": "10.0.0.1"})]
        )
        chain = IndexingFilterChain(
            [BasicFields(), GeoIpFields.from_dict(self.GEO)]
        )
        row = chain(df).collect()[0]
        assert row.city_name == "Berlin" and row.host == "example.com"


# ---------------------------------------------------------------------
# IndexWriter exchange (IndexWriters.java + indexer-dummy)
# ---------------------------------------------------------------------


def test_index_writers_roundtrip(spark, tmp_path):
    import pyspark.sql.functions as F

    from nutch_spark.operators.index import ACTION_ADD, ACTION_DELETE
    from nutch_spark.operators.indexwriters import (
        DummyIndexWriter,
        ParquetIndexWriter,
        write_index,
    )

    actions = spark.createDataFrame(
        [
            ("http://h/a", ACTION_ADD, "Title A"),
            ("http://h/b", ACTION_ADD, "Title B"),
            ("http://h/gone", ACTION_DELETE, None),
        ],
        "url string, action int, title string",
    )
    dump = tmp_path / "dummy.txt"
    dump_nodel = tmp_path / "dummy_nodel.txt"
    pq = tmp_path / "pq"
    write_index(
        actions,
        [
            DummyIndexWriter(str(dump), delete=True),
            DummyIndexWriter(str(dump_nodel), delete=False),
            ParquetIndexWriter(str(pq)),
        ],
    )
    # dummy format: action\tkey lines + trailing commit (reference
    # DummyIndexWriter write/delete/commit)
    assert dump.read_text().splitlines() == [
        "add\thttp://h/a",
        "add\thttp://h/b",
        "delete\thttp://h/gone",
        "commit",
    ]
    # deletions disabled → delete lines suppressed (open() honors
    # INDEXER_DELETE)
    assert dump_nodel.read_text().splitlines() == [
        "add\thttp://h/a",
        "add\thttp://h/b",
        "commit",
    ]
    # columnar sink: full round-trip, deletes carried with null doc
    back = spark.read.parquet(str(pq))
    assert back.count() == 3
    got = {
        r["url"]: (r["action"], r["title"]) for r in back.collect()
    }
    assert got["http://h/gone"] == (ACTION_DELETE, None)
    assert got["http://h/a"] == (ACTION_ADD, "Title A")

