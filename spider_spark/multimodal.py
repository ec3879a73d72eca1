"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The interleaved-docs model (spans with kind ∈ {text, image, …}) extends to
real media payloads as ``binary`` columns with a metadata struct. The
decode/resize/frame-sample kernels need codec libraries absent from this
container, so the *kernels* are stubbed (deterministic fake or
NotImplementedError) while the Spark-side plumbing — schema, Arrow batch
shape, mapInPandas partitioning — is real and tested.

Schema mirrors Resource.content.image_files[] (resource.proto:87-99):
url + raw bytes + declared format.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),     # image|audio|video
        T.StructField("format", T.StringType(), True),    # png|wav|mp4|...
        T.StructField("payload", T.BinaryType(), True),   # opaque bytes
        T.StructField("meta", T.StructType([
            T.StructField("width", T.IntegerType(), True),
            T.StructField("height", T.IntegerType(), True),
            T.StructField("duration_ms", T.IntegerType(), True),
        ]), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.IntegerType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def synthetic_media(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    """Deterministic fake media rows: payload = repeatable pseudo-bytes
    derived from (seed, id) — column expressions only."""
    kinds = F.array(F.lit("image"), F.lit("audio"), F.lit("video"))
    fmts = F.array(F.lit("png"), F.lit("wav"), F.lit("mp4"))
    k = (F.col("id") % 3 + 1).cast("int")
    return spark.range(n).select(
        F.concat(F.lit("m"), F.col("id")).alias("media_id"),
        F.element_at(kinds, k).alias("kind"),
        F.element_at(fmts, k).alias("format"),
        F.encode(
            F.sha2(F.concat(F.lit(seed), F.col("id")), 256), "utf-8"
        ).cast("binary").alias("payload"),
        F.struct(
            (F.pmod(F.xxhash64(F.lit(seed), F.col("id")), F.lit(1920)) + 1)
            .cast("int").alias("width"),
            (F.pmod(F.xxhash64(F.lit(seed + 1), F.col("id")), F.lit(1080)) + 1)
            .cast("int").alias("height"),
            (F.pmod(F.xxhash64(F.lit(seed + 2), F.col("id")), F.lit(60000)))
            .cast("int").alias("duration_ms"),
        ).alias("meta"),
    )


def _decode_image_stub(payload: bytes, fmt: str) -> "object":
    """Real impl would be PIL/opencv decode; absent here by design."""
    raise NotImplementedError(
        "image codec not available in this environment — plug PIL/cv2 here"
    )


def _fake_feature(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for an embedding model: bytes → fixed-dim
    float vector via byte-bucket sums (keeps tests meaningful)."""
    if payload is None:
        return [0.0] * dim
    buckets = [0] * dim
    for i, b in enumerate(payload):
        buckets[i % dim] += b
    total = sum(buckets) or 1
    return [round(x / total, 6) for x in buckets]


def extract_features(media: DataFrame, dim: int = 8,
                     batch_hint: int = 256) -> DataFrame:
    """mapInPandas feature extraction: the production shape (Arrow batches
    of binary payloads → float vectors) with the model stubbed. Partition
    by media kind upstream if kernels differ per modality."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(
                        lambda p: 0 if p is None else len(p)
                    ).astype("int32"),
                    "feature": pdf["payload"].map(
                        lambda p: _fake_feature(p, dim)
                    ),
                }
            )

    return media.mapInPandas(fn, schema=FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: per video row, the frame timestamps a
    decoder would extract (sequence column); the decode itself is the
    stubbed kernel. Demonstrates explode-shape without the codec."""
    return (
        media.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.col("meta.duration_ms") - 1, F.lit(0)),
                    F.lit(every_ms),
                )
            ).alias("frame_ts_ms"),
        )
    )
