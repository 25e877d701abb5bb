"""Media-table queries over the synthetic corpus: the oracle-paired
face of the multimodal plumbing in `decode.py`.

The container ships no media files, so the media table is DERIVED
deterministically from `documents` (payload = UTF-8 bytes of the text,
kind round-robins image/audio/video on doc_id). That makes the decode
stage independently checkable: Spark runs the real Arrow-batched
mapInPandas decoder while the DuckDB oracle recomputes the same
n_bytes/sha256 with its own built-ins — any drift in the batch
plumbing (dropped rows, payload corruption, encoding mismatch) fails
the hash gate.

At 100 TB the derivation disappears (payloads come from the lake) but
the shapes are identical: decode is a scan-bound mapInPandas with no
shuffle; frame sampling is an explode whose fan-out is bounded by
duration/step, repartitioned before the codec stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import table
from .decode import decode_media, frame_sample_plan


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic media rows from documents (no media files in the
    test environment): payload = encode(text,'utf-8'), kind by
    doc_id % 3, duration_ms = n_chars * 10 for audio/video."""
    d = table(spark, sf_dir, "documents")
    kind = (
        F.when(F.col("doc_id") % 3 == 0, F.lit("image"))
        .when(F.col("doc_id") % 3 == 1, F.lit("audio"))
        .otherwise(F.lit("video"))
    )
    timed = F.col("doc_id") % 3 != 0
    return d.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.concat(F.lit("application/x-fake-"), kind).alias("mime"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.struct(
            F.when(~timed, (F.col("n_chars") % 640 + 1).cast("int")).alias("width"),
            F.when(~timed, (F.col("n_chars") % 480 + 1).cast("int")).alias("height"),
            F.when(timed, (F.col("n_chars") * 10).cast("long")).alias("duration_ms"),
        ).alias("meta"),
    )


def media_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode stage end-to-end: every media row through the Arrow
    mapInPandas codec; surfaces the engine-independent outputs
    (byte count + content hash) for the oracle gate."""
    m = media_table(spark, sf_dir)
    return decode_media(m).select("media_id", "kind", "n_bytes", "sha256")


def media_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sample fan-out for the video rows: one row per sampled
    timestamp 0..duration_ms step 1s."""
    m = media_table(spark, sf_dir)
    return frame_sample_plan(m, every_ms=1000)
