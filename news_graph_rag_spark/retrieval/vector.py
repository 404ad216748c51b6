"""R2: exact cosine vector top-k over chunk embeddings.

Reference: 768-d cosine vector index on Chunk.embedding
(graph.py:211-219), queried via ``similarity_search(question, k=5)``
(vector_index.ipynb raw 34-65). Spark realization: broadcast the query
vector as a literal, score every row with JVM-side array expressions
(zip_with + aggregate — no Python in the hot path), and take the top-k
with orderBy+limit, which Spark executes as distributed TakeOrdered
(per-partition heap, driver merge) — no global sort.

Scale: O(n·d) per query; fine to ~10^7 vectors per executor-second.
Beyond that use ``pipeline.similarity``'s LSH/IVF buckets to prune the
scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cosine(a: F.Column, b: F.Column) -> F.Column:
    """Cosine similarity of two array<float> columns (JVM-side).

    Zero-norm inputs score -1.0 rather than 0/0 = NaN: Spark sorts NaN
    ABOVE every double, so an unguarded division would rank zero-vector
    rows first in every descending top-k.
    """
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, x: acc + x * x))
    return F.when((na > 0) & (nb > 0), dot / (na * nb)).otherwise(F.lit(-1.0))


def vector_top_k(
    chunks: DataFrame,
    query_vector: list[float],
    k: int = 5,
    embedding_col: str = "embedding",
    id_col: str = "uid",
) -> DataFrame:
    """Top-k rows by cosine similarity to ``query_vector``.

    The query vector becomes a literal array in the plan (broadcast to
    every task with the serialized plan — no separate broadcast join).
    """
    qv = F.array(*[F.lit(float(x)) for x in query_vector]).cast("array<float>")
    scored = chunks.filter(F.col(embedding_col).isNotNull()).withColumn(
        "score", cosine(F.col(embedding_col), qv)
    )
    return scored.orderBy(F.desc("score"), F.asc(id_col)).limit(k)
