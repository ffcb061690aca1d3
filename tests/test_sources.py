"""Seed text source, dump formats, scoring registry, text-profile
signature semantics."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from nutch_spark.functions.scoring import OPIC, ScoringHooks, get, register
from nutch_spark.functions.signatures import text_profile_signatures
from nutch_spark.operators.readdb import dump_format
from nutch_spark.schema import FRONTIER
from nutch_spark.sources.seeds import read_seed_text


def test_read_seed_text(spark, tmp_path):
    p = tmp_path / "seeds.txt"
    p.write_text(
        "# comment line\n"
        "http://a.example.com/\n"
        "\n"
        "http://b.example.com/\tnutch.score=2.5\tnutch.fetchInterval=60\n"
        "http://c.example.com/\tcustom=v\n"
    )
    rows = {r.url: r for r in read_seed_text(spark, str(p)).collect()}
    assert set(rows) == {
        "http://a.example.com/", "http://b.example.com/",
        "http://c.example.com/",
    }
    assert dict(rows["http://a.example.com/"].metadata) == {}
    assert dict(rows["http://b.example.com/"].metadata) == {
        "nutch.score": "2.5", "nutch.fetchInterval": "60",
    }
    assert dict(rows["http://c.example.com/"].metadata) == {"custom": "v"}


def test_seed_text_feeds_inject(spark, tmp_path):
    from nutch_spark.operators.inject import inject

    p = tmp_path / "seeds.txt"
    p.write_text("http://a.example.com/\tnutch.score=3.0\n")
    fr = inject(spark, None, read_seed_text(spark, str(p)), 1000)
    row = fr.collect()[0]
    assert row.score == 3.0  # reserved key consumed (Injector.java:146-181)


def test_dump_formats(spark):
    df = spark.createDataFrame(
        [Row(url="http://x/", url_hash=1, host="x", status=2,
             fetch_time=5, retries=0, fetch_interval=60, score=1.5,
             signature="abc", modified_time=0, metadata=None)],
        FRONTIER,
    )
    csv = dump_format(df, "csv").collect()[0]
    assert csv.status_name == "db_fetched"
    txt = dump_format(df, "normal").collect()[0].entry
    assert "URL: http://x/" in txt and "Status: 2 (db_fetched)" in txt
    assert "Signature: abc" in txt


def test_scoring_registry_defaults_match_opic(spark):
    df = spark.createDataFrame([Row(score=2.0, n=4, adj=0.5)])
    out = df.select(
        OPIC.generator_sort_value(F.col("score")).alias("sort"),
        OPIC.distribute_score_to_outlinks(
            F.col("score"), F.col("n"), F.lit(1.0)
        ).alias("contrib"),
        OPIC.update_db_score(F.col("score"), F.col("adj")).alias("upd"),
        OPIC.initial_score().alias("init"),
    ).collect()[0]
    assert out.sort == 2.0 and out.contrib == 0.5
    assert out.upd == 2.5 and out.init == 0.0


def test_scoring_registry_custom():
    custom = ScoringHooks(generator_sort_value=lambda s: s * F.lit(2.0))
    register("double", custom)
    assert get("double") is custom
    assert get("opic") is OPIC


def test_text_profile_signature_semantics(spark):
    docs = spark.createDataFrame(
        [
            Row(doc_id=0, text="Alpha beta beta GAMMA gamma gamma x y"),
            # same profile: token case folded, short tokens ignored,
            # different order
            Row(doc_id=1, text="gamma GAMMA gamma beta BETA alpha z q"),
            Row(doc_id=2, text="totally different words entirely here"),
        ]
    )
    out = {r.doc_id: r for r in text_profile_signatures(docs).collect()}
    # maxFreq=3 ⇒ QUANT=2: gamma 3→2, beta 2→2, alpha 1→dropped
    # (TextProfileSignature.java quantization); ties sort token asc
    assert out[0].profile == "beta 2\ngamma 2"
    assert out[0].signature == out[1].signature
    assert out[0].signature != out[2].signature
    # tokens ≤ 2 chars (x, y, z, q) dropped
    assert " x " not in out[0].profile


def test_warc_records_and_dump(spark, tmp_path):
    """WARC export: record layout, deterministic ids, text sink, and
    the CommonCrawl JSON dump (tools/warc/WARCExporter.java,
    tools/CommonCrawlDataDumper.java)."""
    from pyspark.sql import functions as F

    from nutch_spark.schema import FETCH_RESULTS
    from nutch_spark.sources.warc import (
        commoncrawl_dump,
        warc_records,
        write_warc,
    )
    from tests.test_parse import fetch_result_row, spans_of

    spans = spans_of(("text", "hello world"))
    df = spark.createDataFrame(
        [fetch_result_row("http://h.example.com/p", spans)], FETCH_RESULTS
    )
    rec = warc_records(df).collect()[0]
    assert rec.record.startswith("WARC/1.0\r\n")
    assert f"WARC-Target-URI: http://h.example.com/p" in rec.record
    assert rec.record_id.startswith("<urn:uuid:") and rec.record_id.endswith(">")
    assert f"Content-Length: {rec.content_length}" in rec.record
    assert rec.warc_date.endswith("Z") and "T" in rec.warc_date
    # deterministic: same input → same record id
    rec2 = warc_records(df).collect()[0]
    assert rec.record_id == rec2.record_id

    write_warc(df, str(tmp_path / "warc"))
    text = "\n".join(
        r.value for r in spark.read.text(str(tmp_path / "warc")).collect()
    )
    assert "WARC-Target-URI: http://h.example.com/p" in text

    cc = commoncrawl_dump(df).collect()[0]
    assert '"url":"http://h.example.com/p"' in cc.json
