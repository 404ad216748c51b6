"""Catalog entries for the multimodal-column operators (driver brief:
image/audio/video as opaque binary columns with typed metadata).

The binary payloads are synthesized deterministically from the
``documents`` table (utf-8 bytes of the text) because the TESTDATA has
no media table — the operator shapes (binary column never shuffled,
mapInPandas Arrow batches, metadata-only outputs) are exactly what a
real media pipeline runs; only the decode step is the documented stub
(`pipeline/multimodal.py`).

``multimodal_frame_sample`` is pure column ops (sequence + explode) and
carries a DuckDB oracle; the decode/feature entries are Python-side and
use the rows-only check, with their semantics unit-tested in
tests/test_pipeline.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import load, register


def _fake_media(spark: SparkSession, sf: str) -> DataFrame:
    """documents → an images-shaped table (media_id, data, format, w, h)."""
    docs = load(spark, sf, "documents")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "utf-8").alias("data"),
        F.lit("raw").alias("format"),
        (F.col("n_chars") % 640).cast("int").alias("width"),
        (F.col("n_chars") % 480).cast("int").alias("height"),
    )


@register(
    "multimodal_frame_sample",
    oracle="""
    SELECT doc_id AS media_id,
           CAST(unnest(range(0, n_chars % 100 + 1, 10)) AS BIGINT)
             AS frame_index
    FROM documents
    """,
    doc="multimodal: video frame-sampling plan (every 10th frame index, "
    "sequence+explode — map-only, no shuffle of media bytes)",
)
def multimodal_frame_sample(spark: SparkSession, sf: str) -> DataFrame:
    from ..pipeline.multimodal import sample_video_frames

    docs = load(spark, sf, "documents").select(
        F.col("doc_id").alias("media_id"),
        (F.col("n_chars") % 100 + 1).alias("n_frames"),
    )
    return sample_video_frames(docs, every_n=10).select(
        "media_id", F.col("frame_index").cast("bigint").alias("frame_index")
    )


@register(
    "multimodal_image_stats",
    oracle=None,
    doc="multimodal: decode-stats + feature extraction over binary media "
    "columns (mapInPandas, deterministic fake decoder); plumbing "
    "unit-tested in tests/test_pipeline.py",
)
def multimodal_image_stats(spark: SparkSession, sf: str) -> DataFrame:
    from ..pipeline.multimodal import decode_images, extract_image_features

    media = _fake_media(spark, sf)
    decoded = decode_images(media)
    feats = extract_image_features(decoded, dim=16)
    # metadata/features only — the binary column stays map-side
    return feats.select(
        "media_id",
        F.round("pixel_mean", 6).alias("pixel_mean"),
        F.round("pixel_std", 6).alias("pixel_std"),
        F.size("features").alias("n_features"),
    )


@register(
    "multimodal_audio_windows",
    oracle="""
    SELECT doc_id AS media_id,
           CAST(s AS BIGINT) AS start_sample,
           CAST(s + 400 AS BIGINT) AS end_sample
    FROM (SELECT doc_id, n_chars * 100 AS n_samples FROM documents) a,
         unnest(range(0, n_samples - 400 + 1, 160)) AS u(s)
    """,
    doc="multimodal: audio STFT framing plan (400-sample windows, "
    "160-sample hop — 25 ms / 10 ms at 16 kHz) over synthesized "
    "(media_id, n_samples) metadata; sequence+explode, map-only, the "
    "waveform bytes never shuffle. Short clips (< 1 window) emit "
    "nothing in both engines (null-array explode vs empty range).",
)
def multimodal_audio_windows(spark: SparkSession, sf: str) -> DataFrame:
    from ..pipeline.multimodal import chunk_audio_windows

    audio = load(spark, sf, "documents").select(
        F.col("doc_id").alias("media_id"),
        (F.col("n_chars") * 100).alias("n_samples"),
    )
    win = chunk_audio_windows(audio, window_samples=400, hop_samples=160)
    return win.select(
        "media_id",
        F.col("start_sample").cast("bigint").alias("start_sample"),
        F.col("end_sample").cast("bigint").alias("end_sample"),
    )
