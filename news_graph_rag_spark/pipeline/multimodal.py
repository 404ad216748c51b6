"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata (SURVEY driver brief).

The Spark-side plumbing — schemas, Arrow-batched UDF signatures, batch
shapes, partitioning — is real and tested; the actual media decoding is
STUBBED because no image/audio libraries exist in this container:
``decode_fn=None`` uses a deterministic fake decoder (metadata-derived),
and passing a real decoder (e.g. PIL-based) slots into the same
``mapInPandas`` operator unchanged.

Scale notes: media bytes dominate row size → these operators must never
shuffle the binary column. Every function here is map-only; outputs
carry features/metadata, not bytes, unless explicitly requested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

IMAGE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("data", T.BinaryType(), True),  # opaque encoded bytes
        T.StructField("format", T.StringType(), True),  # 'jpeg' | 'png' | ...
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
    ]
)

DecodeFn = Callable[[bytes], "tuple[float, float]"]  # bytes -> (mean, std)


def load_image_decoder() -> DecodeFn | None:
    """Try-import a real image library and adapt it to the decode
    contract ``bytes -> (pixel_mean, pixel_std)`` in [0, 1] grayscale.

    Mirrors the reference's guarded model loaders (ner.py:6-8,
    embedding.py:9-18): the import is attempted at loader-call time and
    ``None`` (→ deterministic fake path) is returned when the library
    is absent, which is the case in this container."""
    try:
        from PIL import Image  # type: ignore[import-not-found]
    except ImportError:
        return None
    import io as _io
    import math

    def decode(data: bytes) -> tuple[float, float]:
        img = Image.open(_io.BytesIO(bytes(data))).convert("L")
        px = list(img.getdata())
        n = len(px) or 1
        mean = sum(px) / n / 255.0
        var = sum((p / 255.0 - mean) ** 2 for p in px) / n
        return mean, math.sqrt(var)

    return decode


def load_audio_decoder() -> Callable[[bytes], "tuple[int, int, float]"] | None:
    """Try-import a real audio library and adapt it to
    ``bytes -> (n_samples, sample_rate, rms)``. ``None`` when absent
    (same guarded-loader shape as ``load_image_decoder``)."""
    try:
        import soundfile  # type: ignore[import-not-found]
    except ImportError:
        return None
    import io as _io
    import math

    def decode(data: bytes) -> tuple[int, int, float]:
        samples, rate = soundfile.read(_io.BytesIO(bytes(data)))
        flat = [float(s) for s in samples]
        n = len(flat) or 1
        rms = math.sqrt(sum(s * s for s in flat) / n)
        return len(flat), int(rate), rms

    return decode


def _fake_pixel_stats(data: bytes | None) -> tuple[float, float]:
    """Deterministic stand-in for decode+stats: derive pseudo mean/std
    from a hash of the bytes. Replaced by real decoding when a library
    is available."""
    if not data:
        return 0.0, 0.0
    h = hashlib.blake2b(bytes(data), digest_size=8).digest()
    return h[0] / 255.0, h[1] / 255.0


def decode_images(
    df: DataFrame,
    decode_fn: DecodeFn | None = None,
    data_col: str = "data",
) -> DataFrame:
    """Append decode-derived columns (pixel mean/std) via mapInPandas.

    With ``decode_fn=None`` the stats come from the deterministic fake;
    a real decoder (``load_image_decoder()``) slots into the same
    Arrow-batched operator unchanged. Note: a non-None decode_fn closes
    over the decoding library, which must then be importable on
    executors too.
    """
    out_schema = T.StructType(
        df.schema.fields
        + [
            T.StructField("pixel_mean", T.DoubleType(), True),
            T.StructField("pixel_std", T.DoubleType(), True),
        ]
    )
    cols = [f.name for f in df.schema.fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            means, stds = [], []
            for data in pdf[data_col]:
                if decode_fn is not None:
                    m, s = decode_fn(data)
                else:
                    m, s = _fake_pixel_stats(data)
                means.append(m)
                stds.append(s)
            out = pdf[cols].copy()
            out["pixel_mean"] = means
            out["pixel_std"] = stds
            yield out

    return df.mapInPandas(run, out_schema)


def extract_image_features(
    df: DataFrame, dim: int = 64, data_col: str = "data"
) -> DataFrame:
    """Append a feature vector (array<float>) per image — deterministic
    hash features standing in for a CNN/CLIP encoder; identical operator
    shape (mapInPandas, one model per executor) for the real thing."""
    out_schema = T.StructType(
        df.schema.fields + [T.StructField("features", T.ArrayType(T.FloatType()), True)]
    )
    cols = [f.name for f in df.schema.fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for data in pdf[data_col]:
                if data is None:
                    feats.append(None)
                    continue
                vals: list[float] = []
                i = 0
                while len(vals) < dim:
                    h = hashlib.blake2b(
                        bytes(data), digest_size=32, salt=i.to_bytes(8, "little")
                    ).digest()
                    vals.extend(b / 127.5 - 1.0 for b in h)
                    i += 1
                feats.append(vals[:dim])
            out = pdf[cols].copy()
            out["features"] = feats
            yield out

    return df.mapInPandas(run, out_schema)


def sample_video_frames(
    df: DataFrame,
    every_n: int = 10,
    id_col: str = "media_id",
    n_frames_col: str = "n_frames",
) -> DataFrame:
    """Frame-sampling plan: one output row per sampled frame index.

    Pure column ops (sequence + explode) — the frame EXTRACTION is the
    stubbed decode step; the partitioning/fan-out shape is the real
    operator a video pipeline needs.
    """
    from pyspark.sql import functions as F

    idxs = F.sequence(F.lit(0), F.col(n_frames_col) - 1, F.lit(every_n))
    return df.select(
        id_col, F.explode(idxs).alias("frame_index")
    )


def chunk_audio_windows(
    df: DataFrame,
    window_samples: int = 400,
    hop_samples: int = 160,
    id_col: str = "media_id",
    n_samples_col: str = "n_samples",
) -> DataFrame:
    """Analysis-window plan for audio: one row per (full) sliding window
    — the standard 25 ms / 10 ms STFT framing when n_samples is at
    16 kHz. Pure column ops (sequence + explode): the waveform DECODE
    is the stubbed step, but the fan-out, partitioning, and window
    arithmetic are the real operator an audio feature pipeline runs.
    Map-only — the audio bytes are never shuffled.
    """
    from pyspark.sql import functions as F

    starts = F.when(
        F.col(n_samples_col) >= window_samples,
        F.sequence(
            F.lit(0),
            F.col(n_samples_col) - window_samples,
            F.lit(hop_samples),
        ),
    )  # no otherwise: short clips yield a null array -> explode drops them
    return df.select(
        id_col,
        F.explode(starts).alias("start_sample"),
    ).select(
        id_col,
        "start_sample",
        (F.col("start_sample") + window_samples).alias("end_sample"),
    )
