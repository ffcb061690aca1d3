"""Multimodal columns: opaque binary media + typed metadata, with
decode / feature-extract / resize / frame-sample plumbing.

Media travel as opaque `binary` columns with a typed metadata struct —
the layout a 100 TB interleaved text+media corpus uses (media spans in
the crawl schema carry `media_ref` pointers; this module materializes
the referenced payloads). All heavy per-item work runs in Arrow-batched
`mapInPandas` stages so batches amortize python/Arrow overhead and the
stage parallelizes with the scan.

Container note: no image/audio libraries ship in this environment, so
`decode_media` is REAL plumbing around a STUBBED codec: with
`real_codecs=True` it raises NotImplementedError where PIL/ffmpeg
would be called; the default deterministic fake derives (width,
height, channels, n_frames, mean_pixel) from the md5 hex of the media
bytes — pure, portable (any SQL engine reproduces it from the same
bytes), and shaped exactly like a real decoder's output, so schema,
batching, partitioning and downstream feature logic are all genuinely
exercised.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_ref", T.StringType()),
        T.StructField("media_type", T.StringType()),  # image|audio|video
        T.StructField("media_bytes", T.BinaryType()),
    ]
)

DECODED_SCHEMA = T.StructType(
    MEDIA_SCHEMA.fields
    + [
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("channels", T.LongType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("mean_pixel", T.LongType()),
    ]
)

_TYPES = ("image", "audio", "video")


def synth_media(docs: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Derive a deterministic media table from a document corpus:
    media_ref and payload bytes are functions of the text digest (pure
    Catalyst — md5 + unhex run JVM-side)."""
    h = F.md5(F.col(text_col))
    mtype = F.element_at(
        F.array(*[F.lit(t) for t in _TYPES]),
        (F.col(id_col) % 3 + 1).cast("int"),
    )
    return docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.concat(F.lit("media://"), h).alias("media_ref"),
        mtype.alias("media_type"),
        F.unhex(h).alias("media_bytes"),
    )


def _fake_decode(ref: str, media_type: str) -> tuple[int, int, int, int, int]:
    """Deterministic stand-in for a real codec: dimensions from the md5
    hex of the media reference (ascii of hex chars — reproducible in
    any SQL engine; hashing the payload BLOB would be equivalent but
    portable md5-of-binary is not)."""
    hx = hashlib.md5(ref.encode()).hexdigest()
    width = 64 + (ord(hx[0]) % 8) * 32
    height = 64 + (ord(hx[1]) % 8) * 32
    channels = 1 + ord(hx[2]) % 3
    n_frames = 1 if media_type != "video" else 8 + ord(hx[3]) % 120
    mean_pixel = ord(hx[4]) % 128
    return width, height, channels, n_frames, mean_pixel


def decode_media(media: DataFrame, real_codecs: bool = False) -> DataFrame:
    """Attach decoded metadata columns. Arrow-batched; the per-item
    decode is the stub above (or NotImplementedError for real codecs
    until PIL/ffmpeg are present)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if real_codecs:
            raise NotImplementedError(
                "real decoders (PIL/ffmpeg) are not available in this "
                "container; plumbing is exercised via the deterministic "
                "fake decoder"
            )
        for pdf in batches:
            decoded = [
                _fake_decode(r, t)
                for r, t in zip(pdf["media_ref"], pdf["media_type"])
            ]
            out = pdf.copy()
            cols = list(zip(*decoded)) if decoded else [[], [], [], [], []]
            for name, vals in zip(
                ("width", "height", "channels", "n_frames", "mean_pixel"), cols
            ):
                out[name] = pd.Series(vals, dtype="int64", index=pdf.index)
            yield out

    return media.mapInPandas(run, DECODED_SCHEMA)


def frame_sample(decoded: DataFrame, every: int = 10) -> DataFrame:
    """Video frame sampling: one row per sampled frame index (stride
    `every`) — pure Catalyst sequence/explode, no python."""
    vids = decoded.filter(F.col("media_type") == "video")
    idx = F.sequence(
        F.lit(0), F.col("n_frames") - 1, F.lit(every)
    )
    return vids.select(
        "doc_id",
        "media_ref",
        F.explode(idx).alias("frame_idx"),
    )


def media_features(decoded: DataFrame) -> DataFrame:
    """Feature vector per media item from decoded metadata (aspect
    ratio, pixel count, per-type flags) — JVM column math; the slot a
    real embedding model output would occupy."""
    return decoded.select(
        "doc_id",
        "media_ref",
        "media_type",
        (F.col("width") * F.col("height")).alias("n_pixels"),
        (F.col("width").cast("double") / F.col("height").cast("double")).alias(
            "aspect"
        ),
        F.col("mean_pixel").cast("double").alias("brightness"),
        F.col("n_frames").alias("n_frames"),
    )
