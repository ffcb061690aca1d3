"""Spark schemas for every table in the engine.

Data-model mapping from the reference (SURVEY.md §1.3):
  - frontier        ≙ CrawlDb MapFile⟨Text,CrawlDatum⟩ (CrawlDatum.java:124-131)
  - docs            ≙ fetched Content+ParseText, as the interleaved
                      text+media span table per BASELINE.json input_hint
  - fetch_results   ≙ segment crawl_fetch + content
  - crawl_parse     ≙ segment crawl_parse (per-outlink linked datums,
                      signature datum, parse-meta datum —
                      ParseOutputFormat.java:158-308)
  - linkdb          ≙ LinkDb MapFile⟨Text,Inlinks⟩
  - hostdb          ≙ HostDb MapFile⟨Text,HostDatum⟩ (HostDatum.java:34-193)
"""

from __future__ import annotations

from pyspark.sql import types as T

# Span struct — exactly per BASELINE.json input_hint:
# (kind:string, text:string, media_ref:string, offset:int32)
SPAN = T.StructType(
    [
        T.StructField("kind", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("media_ref", T.StringType()),
        T.StructField("offset", T.IntegerType()),
    ]
)

DOCS = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("spans", T.ArrayType(SPAN), False),
    ]
)

# frontier ≙ CrawlDatum (CrawlDatum.java:124-131); see FIXTURES.md §2
FRONTIER = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("url_hash", T.LongType(), False),
        T.StructField("host", T.StringType(), False),
        T.StructField("status", T.IntegerType(), False),
        T.StructField("fetch_time", T.LongType(), False),  # ms epoch
        T.StructField("retries", T.IntegerType(), False),
        T.StructField("fetch_interval", T.IntegerType(), False),  # seconds
        T.StructField("score", T.FloatType(), False),
        T.StructField("signature", T.StringType()),  # hex digest, nullable
        T.StructField("modified_time", T.LongType(), False),
        T.StructField("metadata", T.MapType(T.StringType(), T.StringType())),
    ]
)

SEEDS = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("metadata", T.MapType(T.StringType(), T.StringType())),
    ]
)

# fetchlist = frontier columns + segment bookkeeping
FETCHLIST = T.StructType(
    FRONTIER.fields
    + [
        T.StructField("segment", T.StringType(), False),
    ]
)

OUTLINK = T.StructType(
    [
        T.StructField("to_url", T.StringType()),
        T.StructField("anchor", T.StringType()),
        T.StructField("kind", T.StringType()),  # text-link | media
        T.StructField("link_order", T.IntegerType()),
    ]
)

# fetch output: one row per attempted URL (FetcherThread.java:314-394)
FETCH_RESULTS = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("url_hash", T.LongType(), False),
        T.StructField("host", T.StringType(), False),
        T.StructField("status", T.IntegerType(), False),  # fetch_* space
        T.StructField("prev_status", T.IntegerType(), False),
        T.StructField("fetch_time", T.LongType(), False),  # simulated clock ms
        T.StructField("retries", T.IntegerType(), False),
        T.StructField("fetch_interval", T.IntegerType(), False),
        T.StructField("score", T.FloatType(), False),
        T.StructField("prev_signature", T.StringType()),
        T.StructField("prev_modified_time", T.LongType(), False),
        T.StructField("redirect_to", T.StringType()),
        T.StructField("protocol_status", T.StringType()),
        T.StructField("spans", T.ArrayType(SPAN)),  # fetched content
        T.StructField("metadata", T.MapType(T.StringType(), T.StringType())),
        T.StructField("segment", T.StringType(), False),
    ]
)

# parse outputs (ParseOutputFormat.java:119-308); host + page score are
# carried so crawl_parse datums can be derived from the STORED table
# without re-running extraction (≙ passScoreBeforeParsing stashing the
# score in parse metadata, OPICScoringFilter.java:98-104)
PARSE_DATA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("title", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("signature", T.StringType()),
        T.StructField("outlinks", T.ArrayType(OUTLINK)),
        T.StructField("spans", T.ArrayType(SPAN)),
        T.StructField("segment", T.StringType(), False),
        T.StructField("host", T.StringType()),
        T.StructField("score", T.FloatType()),
        # parent fetch time (for the canonical-key datum) and the fork's
        # ParseImpl.isCanonical flag — false for sub-document entries
        T.StructField("fetch_time", T.LongType()),
        T.StructField("is_canonical", T.BooleanType()),
        # fetch-datum metadata carried through parse (the reference's
        # contentMeta hop: passScoreBeforeParsing stashes datum keys
        # like scoring-depth's _depth_ in Content metadata, and
        # passScoreAfterParsing copies them to parse metadata —
        # DepthScoringFilter.java:160-183); null for sub-entries
        T.StructField("metadata", T.MapType(T.StringType(), T.StringType())),
    ]
)

# crawl_parse rows: per-outlink linked datums + signature datum +
# fetch_success datums for non-canonical (sub-document) parse keys
CRAWL_PARSE = T.StructType(
    [
        T.StructField("url", T.StringType(), False),  # target url
        # linked | signature | fetch_success (canonical-key datum)
        T.StructField("status", T.IntegerType(), False),
        T.StructField("score", T.FloatType(), False),  # OPIC contribution
        T.StructField("fetch_interval", T.IntegerType(), False),
        T.StructField("signature", T.StringType()),
        T.StructField("anchor", T.StringType()),
        T.StructField("from_url", T.StringType()),
        T.StructField("metadata", T.MapType(T.StringType(), T.StringType())),
        # set only on fetch_success rows: the parent fetch's time
        T.StructField("fetch_time", T.LongType()),
    ]
)

LINKDB = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField(
            "inlinks",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("from_url", T.StringType()),
                        T.StructField("anchor", T.StringType()),
                    ]
                )
            ),
        ),
    ]
)

ROBOTS = T.StructType(
    [
        T.StructField("host", T.StringType(), False),
        T.StructField("disallow", T.ArrayType(T.StringType())),
        T.StructField("crawl_delay", T.FloatType()),
        T.StructField("http_code", T.IntegerType()),
    ]
)

METRICS = T.StructType(
    [
        T.StructField("segment", T.StringType()),
        T.StructField("stage", T.StringType()),
        T.StructField("partition_id", T.IntegerType()),
        T.StructField("counter", T.StringType()),
        T.StructField("value", T.LongType()),
    ]
)
