"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata (SURVEY driver brief).

The Spark-side plumbing — schemas, Arrow-batched UDF signatures, batch
shapes, partitioning — is real and tested. Decode status: AUDIO decode
is REAL (``decode_wav_pcm`` — pure-stdlib RIFF/PCM chunk walker, plus a
``encode_wav_pcm16`` writer; ``load_audio_decoder`` upgrades to
soundfile when importable). IMAGE decode is REAL for uncompressed
24-bit BMP (``decode_bmp24`` / ``encode_bmp24`` — pure-stdlib header
parse, bottom-up BGR rows, 4-byte padding; oracle-backed round-trip in
``multimodal_bmp_decode_stats``); compressed formats (JPEG/PNG) and
VIDEO frames still require a codec library — ``decode_fn=None`` then
uses a deterministic fake decoder (metadata-derived), and a real
decoder (``load_image_decoder`` → PIL when importable) slots into the
same ``mapInPandas`` operator unchanged.

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


def load_audio_decoder() -> Callable[[bytes], "tuple[int, int, float]"]:
    """Return a real ``bytes -> (n_samples, sample_rate, rms)`` audio
    decoder: soundfile when importable (any libsndfile format), else the
    pure-stdlib RIFF/PCM parser (``decode_wav_pcm`` — WAV only, but a
    genuine decode, not a stub). Unlike the image loader this never
    returns ``None``: the audio modality always has a real decode
    path."""
    import math

    try:
        import soundfile  # type: ignore[import-not-found]
    except ImportError:
        soundfile = None

    if soundfile is not None:
        import io as _io

        def decode(data: bytes) -> tuple[int, int, float]:
            samples, rate = soundfile.read(_io.BytesIO(bytes(data)))
            flat = [float(s) for s in samples]
            n = len(flat) or 1
            rms = math.sqrt(sum(s * s for s in flat) / n)
            return len(flat), int(rate), rms

        return decode

    def decode_pure(data: bytes) -> tuple[int, int, float]:
        _, rate, samples = decode_wav_pcm(data)
        n = len(samples) or 1
        rms = math.sqrt(sum((s / 32768.0) ** 2 for s in samples) / n)
        return len(samples), rate, rms

    return decode_pure


def encode_wav_pcm16(
    samples: "list[int]", sample_rate: int = 16000, n_channels: int = 1
) -> bytes:
    """Minimal RIFF/WAVE writer for 16-bit PCM (public format; stdlib
    ``struct`` only). ``samples`` are interleaved int16 frames."""
    import struct

    data = b"".join(struct.pack("<h", s) for s in samples)
    byte_rate = sample_rate * n_channels * 2
    block_align = n_channels * 2
    fmt = struct.pack(
        "<HHIIHH", 1, n_channels, sample_rate, byte_rate, block_align, 16
    )
    body = (
        b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
        + (b"\x00" if len(data) % 2 else b"")
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav_pcm(data: bytes) -> "tuple[int, int, list[int]]":
    """REAL audio decode (no stub): parse a RIFF/WAVE container and
    return ``(n_channels, sample_rate, samples)`` with samples as
    interleaved int16 frames. Pure-stdlib chunk walker: verifies the
    RIFF/WAVE magics, iterates chunks honouring the spec's 2-byte
    alignment (odd-sized chunks carry a pad byte), reads ``fmt `` for
    the PCM params, and slices ``data``. Only uncompressed 16-bit PCM
    (format tag 1) is supported — anything else raises, it does not
    fake. This replaces the round-5 'decode is stubbed' caveat for the
    audio modality."""
    import struct

    buf = bytes(data)
    if len(buf) < 12 or buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    pos = 12
    fmt_params: tuple | None = None
    pcm: bytes | None = None
    while pos + 8 <= len(buf):
        cid = buf[pos : pos + 4]
        (clen,) = struct.unpack("<I", buf[pos + 4 : pos + 8])
        body = buf[pos + 8 : pos + 8 + clen]
        if len(body) < clen:
            raise ValueError(f"truncated chunk {cid!r}")
        if cid == b"fmt ":
            if clen < 16:
                raise ValueError("fmt chunk too short")
            fmt_params = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            pcm = body
        pos += 8 + clen + (clen % 2)  # chunks are 2-byte aligned
    if fmt_params is None or pcm is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, n_channels, sample_rate, _, _, bits = fmt_params
    if audio_format != 1 or bits != 16:
        raise ValueError(f"unsupported WAV encoding (fmt={audio_format}, bits={bits})")
    n = len(pcm) // 2
    samples = list(struct.unpack(f"<{n}h", pcm[: 2 * n]))
    return n_channels, sample_rate, samples


def encode_bmp24(width: int, height: int, pixels: "list[tuple]") -> bytes:
    """Minimal BMP writer for uncompressed 24-bit images (public
    format; stdlib ``struct`` only — the image analog of
    ``encode_wav_pcm16``). ``pixels`` is row-major TOP-DOWN, one
    ``(r, g, b)`` triple per pixel; the writer emits the spec's
    bottom-up row order, BGR byte order, rows padded to 4 bytes."""
    import struct

    if len(pixels) != width * height:
        raise ValueError("pixel count != width*height")
    row_pad = (4 - (3 * width) % 4) % 4
    rows = []
    for y in range(height - 1, -1, -1):  # bottom-up
        row = bytearray()
        for x in range(width):
            r, g, b = pixels[y * width + x]
            row += bytes((b, g, r))  # BGR
        row += b"\x00" * row_pad
        rows.append(bytes(row))
    pixel_data = b"".join(rows)
    info = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(pixel_data), 2835, 2835, 0, 0
    )
    offset = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", offset + len(pixel_data), 0, 0, offset)
    return header + info + pixel_data


def decode_bmp24(data: bytes) -> "tuple[int, int, list[tuple]]":
    """REAL image decode (no stub): parse an uncompressed 24-bit BMP
    and return ``(width, height, pixels)`` with pixels row-major
    TOP-DOWN as ``(r, g, b)`` tuples — undoing the container's
    bottom-up row order (or honoring top-down negative-height files),
    BGR byte order, and 4-byte row padding. Pure-stdlib ``struct``
    parser, the image analog of ``decode_wav_pcm``: magic and header
    sizes are verified, anything but BI_RGB 24-bit raises — it does
    not fake. This closes the round-6 'image decode is stubbed' caveat
    for the BMP format; JPEG/PNG still require a real codec library
    via ``load_image_decoder``."""
    import struct

    buf = bytes(data)
    if len(buf) < 54 or buf[:2] != b"BM":
        raise ValueError("not a BMP stream")
    (offset,) = struct.unpack_from("<I", buf, 10)
    (hdr_size,) = struct.unpack_from("<I", buf, 14)
    if hdr_size < 40:
        raise ValueError(f"unsupported DIB header size {hdr_size}")
    width, height_raw = struct.unpack_from("<ii", buf, 18)
    planes, bits = struct.unpack_from("<HH", buf, 26)
    (compression,) = struct.unpack_from("<I", buf, 30)
    if planes != 1 or bits != 24 or compression != 0:
        raise ValueError(
            f"unsupported BMP encoding (planes={planes}, bits={bits}, "
            f"compression={compression})"
        )
    top_down = height_raw < 0
    height = -height_raw if top_down else height_raw
    if width <= 0 or height <= 0:
        raise ValueError(f"bad dimensions {width}x{height_raw}")
    stride = 3 * width + (4 - (3 * width) % 4) % 4
    if offset + stride * height > len(buf):
        raise ValueError("truncated pixel data")
    pixels: list[tuple] = [None] * (width * height)  # type: ignore[list-item]
    for row_idx in range(height):
        y = row_idx if top_down else height - 1 - row_idx
        base = offset + row_idx * stride
        for x in range(width):
            b, g, r = buf[base + 3 * x : base + 3 * x + 3]
            pixels[y * width + x] = (r, g, b)
    return width, height, pixels


def _fake_pixel_stats(data: bytes | None) -> tuple[float, float]:
    """Deterministic stand-in for decode+stats on formats with no
    in-container codec (JPEG/PNG): derive pseudo mean/std from a hash
    of the bytes. BMP decodes for real (``decode_bmp24``); a library
    decoder (PIL) replaces this for compressed formats. Uses sha256
    (not blake2b) so an external SQL oracle can reproduce the exact
    values — DuckDB ships sha256 but no blake2 (see
    multimodal_image_stats' oracle)."""
    if not data:
        return 0.0, 0.0
    h = hashlib.sha256(bytes(data)).digest()
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
