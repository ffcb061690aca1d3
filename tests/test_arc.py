"""ArcSegmentCreator tests (reference tools/arc/ArcSegmentCreator.java,
ArcRecordReader.java)."""

from __future__ import annotations

from nutch_spark.constants import STATUS_FETCH_SUCCESS
from nutch_spark.sources.arc import (
    URL_VERSION_KEY,
    arc_records,
    arc_segment,
    parse_arc_member,
    split_gzip_members,
    write_arc,
)

RECORDS = [
    ("http://a.example.com/", "10.0.0.1", "20260102030405", "text/html",
     b"hello page href:http://b.example.com/x trailing"),
    ("http://b.example.com/x", "10.0.0.2", "20260102030406", "text/plain",
     b"plain body"),
    ("http://c.example.com/media/item", "10.0.0.3", "20260102030407",
     "application/octet-stream", b"\x89BIN..."),
    ("ftp://d.example.com/f", "10.0.0.4", "20260102030408", "text/plain",
     b"filtered by scheme"),
]


def _write(tmp_path) -> str:
    p = str(tmp_path / "sample.arc")
    write_arc(RECORDS, p)
    return p


def test_member_split_and_header_parse(tmp_path):
    """write → split → parse round trip; the filedesc file header is
    the first member (ArcRecordReader: records are concatenated gzip
    members; ArcSegmentCreator.map: headers[0]=url, [2]=version,
    [3]=content type)."""
    p = _write(tmp_path)
    with open(p, "rb") as fh:
        blob = fh.read()
    members = list(split_gzip_members(blob))
    assert len(members) == 1 + len(RECORDS)
    first = parse_arc_member(members[0], p)
    assert first["url"].startswith("filedesc://")
    rec = parse_arc_member(members[1], p)
    assert rec["url"] == "http://a.example.com/"
    assert rec["ip"] == "10.0.0.1"
    assert rec["version"] == "20260102030405"
    assert rec["content_type"] == "text/html"
    assert rec["payload"].startswith(b"hello page")
    # truncated tail stops cleanly instead of raising
    assert len(list(split_gzip_members(blob[:-7]))) == len(members) - 1


def test_arc_records_skips_filedesc(spark, tmp_path):
    p = _write(tmp_path)
    rows = arc_records(spark, p).orderBy("url").collect()
    assert [r["url"] for r in rows] == sorted(u for u, *_ in RECORDS)
    byurl = {r["url"]: r for r in rows}
    assert byurl["http://c.example.com/media/item"]["content_type"] == "application/octet-stream"
    assert bytes(byurl["http://b.example.com/x"]["payload"]) == b"plain body"


def test_arc_segment_shapes_fetch_results(spark, tmp_path):
    """Records become fetch_success rows in the engine's segment
    currency; default filters drop the ftp record (like the
    reference's urlFilters.filter gate); text records carry their
    payload as a text span, binary records a media span."""
    from nutch_spark.schema import FETCH_RESULTS

    p = _write(tmp_path)
    seg = arc_segment(arc_records(spark, p), 1_700_000_000_000, "arc1")
    assert [f.name for f in seg.schema.fields] == [
        f.name for f in FETCH_RESULTS.fields
    ]
    rows = {r["url"]: r for r in seg.collect()}
    assert set(rows) == {
        "http://a.example.com/",
        "http://b.example.com/x",
        "http://c.example.com/media/item",
    }  # ftp:// rejected by the default filter rules
    a = rows["http://a.example.com/"]
    assert a["status"] == STATUS_FETCH_SUCCESS
    assert a["metadata"]["Content-Type"] == "text/html"
    assert a["metadata"][URL_VERSION_KEY] == "20260102030405"
    assert a["spans"][0]["kind"] == "text"
    assert "href:http://b.example.com/x" in a["spans"][0]["text"]
    img = rows["http://c.example.com/media/item"]
    assert img["spans"][0]["kind"] == "media"
    assert img["spans"][0]["media_ref"] == "http://c.example.com/media/item"
    assert img["spans"][0]["text"] is None


def test_arc_segment_feeds_parse_pipeline(spark, tmp_path):
    """The ARC segment flows through the real parse stage: the href:
    token in the text span surfaces as an outlink (the replacement-
    for-fetcher contract — output ≙ Fetcher.output then ParseSegment)."""
    from nutch_spark.operators.parse import extract_pages, finish_pages

    p = _write(tmp_path)
    seg = arc_segment(arc_records(spark, p), 1_700_000_000_000, "arc1")
    parsed = finish_pages(extract_pages(seg))
    out = {
        r["url"]: [o["to_url"] for o in (r["outlinks"] or [])]
        for r in parsed.collect()
    }
    assert "http://b.example.com/x" in out["http://a.example.com/"]


def test_arc_segment_honors_filter_chain(spark, tmp_path):
    from nutch_spark.functions.urlplugins import DomainFilter, FilterChain

    p = _write(tmp_path)
    seg = arc_segment(
        arc_records(spark, p), 1_700_000_000_000, "arc1",
        url_filters=FilterChain([DomainFilter(["a.example.com"])]),
    )
    assert [r["url"] for r in seg.select("url").collect()] == [
        "http://a.example.com/"
    ]
