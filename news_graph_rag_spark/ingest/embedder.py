"""Embedding inference (L7, SURVEY §2.l).

The reference encodes chunk texts with jina-embeddings-v2-base-de to
768-d vectors (embedding.py:9-18, config.py:6-8). Here the encoder is
pluggable behind one interface — ``encode(list[str]) -> list[list
[float]]`` — with:

- ``HashEmbedder``: deterministic fake (salted sha256 → unit-norm
  floats). Same text → same vector, so cosine tests are reproducible
  (FIXTURES.md requirement). Used in tests and offline environments.
- ``load_sentence_transformer()``: the real model behind an import-try
  (not installed in this container).

The Spark operator is an Arrow-batched ``mapInPandas`` so model weights
load once per executor; at scale this is the pattern for GPU inference
(one model per executor, batch size tuned to VRAM).
"""

from __future__ import annotations

import hashlib
import math
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

EMBEDDING_SIZE = 768  # reference config.py:6

EncoderFn = Callable[[list[str]], list[list[float]]]


class HashEmbedder:
    """Deterministic pseudo-embedding: sha256(text + '#' + i) → floats,
    unit-normalized. Not semantically meaningful; structurally faithful
    (fixed dim, unit norm, stable under re-ingest). Uses sha256 (not
    blake2) so an external SQL oracle can recompute the exact values —
    the arithmetic is all IEEE-deterministic (4-byte little-endian ints
    → x/2^31-1, sequential sum of squares, sqrt, divide), so engines
    agree bit-for-bit; see the ``embed_documents`` catalog oracle."""

    def __init__(self, dim: int = EMBEDDING_SIZE):
        self.dim = dim

    def _vec(self, text: str) -> list[float]:
        out: list[float] = []
        i = 0
        while len(out) < self.dim:
            h = hashlib.sha256(
                text.encode("utf-8") + b"#" + str(i).encode()
            ).digest()
            out.extend(int.from_bytes(h[j : j + 4], "little") / 2**31 - 1.0
                       for j in range(0, 32, 4))
            i += 1
        vec = out[: self.dim]
        norm = math.sqrt(sum(x * x for x in vec)) or 1.0
        return [x / norm for x in vec]

    def __call__(self, texts: list[str]) -> list[list[float]]:
        return [self._vec(t or "") for t in texts]


def load_sentence_transformer(
    model_name: str = "jinaai/jina-embeddings-v2-base-de",
) -> EncoderFn | None:
    """Real encoder (reference embedding.py:9-16) if installed, else None."""
    try:  # pragma: no cover - heavyweight optional dependency
        from sentence_transformers import SentenceTransformer  # type: ignore

        model = SentenceTransformer(model_name, trust_remote_code=True)

        def fn(texts: list[str]) -> list[list[float]]:
            return [list(map(float, v)) for v in model.encode(texts)]

        return fn
    except Exception:
        return None


def embed_texts(
    df: DataFrame,
    encoder_factory: Callable[[], EncoderFn],
    text_col: str = "text",
    out_col: str = "embedding",
    batch_size: int = 256,
) -> DataFrame:
    """Append an ArrayType(FloatType) embedding column (D7's preferred
    form: carry the embedding from ingest rather than update in place,
    SURVEY §2.d D7)."""
    out_schema = T.StructType(
        df.schema.fields + [T.StructField(out_col, T.ArrayType(T.FloatType()), True)]
    )
    in_cols = [f.name for f in df.schema.fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        encoder = encoder_factory()
        for pdf in batches:
            texts = pdf[text_col].fillna("").tolist()
            vecs: list[list[float]] = []
            for i in range(0, len(texts), batch_size):
                vecs.extend(encoder(texts[i : i + batch_size]))
            pdf = pdf[in_cols].copy()
            pdf[out_col] = vecs
            yield pdf

    return df.mapInPandas(run, out_schema)
