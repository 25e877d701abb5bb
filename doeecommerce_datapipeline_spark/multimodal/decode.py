"""Multimodal column plumbing (north star): image/audio/video as
opaque binary columns + typed metadata, with decode / feature-extract /
resize / frame-sample as Arrow-batched mapInPandas stages.

The Spark side — schema, partitioning, UDF signatures, batch shapes —
is real and tested. The codec itself is STUBBED: this container ships
no image/audio libraries, so `decode_image_batch(real_decode=True)`
raises NotImplementedError, and the default path produces a
deterministic fake feature vector derived from the bytes (stable
across engines and runs, so downstream plumbing is testable).

At 100 TB: binary payloads dominate row size → keep them in their own
column family (parquet stores columns independently), repartition by
size not row count before the decode stage, and bound Arrow batch
bytes via spark.sql.execution.arrow.maxRecordsPerBatch.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..pyfiles import ensure_shipped

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("mime", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_DIM = 16

DECODED_SCHEMA = (
    "media_id long, kind string, n_bytes long, sha256 string, "
    f"features array<float>"
)


def _fake_features(payload: bytes) -> list[float]:
    """Deterministic stand-in for a real decoder: 16 floats derived
    from the sha256 digest — stable, content-addressed, unit-testable."""
    h = hashlib.sha256(payload or b"").digest()
    return [b / 255.0 for b in h[:FEATURE_DIM]]


def decode_media(df: DataFrame, real_decode: bool = False) -> DataFrame:
    """Decode/feature-extract stage over a binary media column.

    mapInPandas: one Arrow batch in, one out — payload bytes never
    pass through Python row-by-row. The real decoder would slot into
    `_decode_one` (PIL/torchaudio/ffmpeg), everything else unchanged.
    """

    def _decode_one(payload: bytes) -> list[float]:
        if real_decode:
            raise NotImplementedError(
                "no image/audio codecs in this environment — "
                "plug PIL/torchaudio here; the Spark plumbing is complete"
            )
        return _fake_features(payload)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": payloads.map(lambda b: len(b or b"")),
                    "sha256": payloads.map(
                        lambda b: hashlib.sha256(b or b"").hexdigest()
                    ),
                    "features": payloads.map(_decode_one),
                }
            )

    # the closure references this package by module name — ship it so
    # workers can import it regardless of driver cwd/sys.path
    ensure_shipped(df.sparkSession)
    return df.mapInPandas(batches, DECODED_SCHEMA)


def resize_stub(df: DataFrame, width: int, height: int) -> DataFrame:
    """Resize stage signature (stub): passes metadata through with the
    new target dims recorded; the pixel work is the decoder's."""
    return df.withColumn(
        "meta",
        F.struct(
            F.lit(width).alias("width"),
            F.lit(height).alias("height"),
            F.col("meta.duration_ms").alias("duration_ms"),
        ),
    )


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plan for video rows: explode the sample
    timestamps 0..duration step every_ms — the row fan-out is real
    Spark work; the frame grab is the stubbed codec's."""
    return (
        df.where(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0).cast("long"),
                    F.coalesce(F.col("meta.duration_ms"), F.lit(0)),
                    F.lit(every_ms).cast("long"),
                )
            ).alias("sample_at_ms"),
        )
    )
