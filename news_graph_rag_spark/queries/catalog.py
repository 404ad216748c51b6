"""Registry for the correctness-gate query catalog.

Each entry pairs a Spark DataFrame program with an equivalent ANSI-SQL
string that DuckDB runs on the same parquet tables (the driver's oracle).
Determinism rules (so order-insensitive value hashes match bit-for-bit):

- Every floating-point SUM goes through a per-row ``CAST(x AS
  DECIMAL(p,s))`` first: the double→decimal cast rounds the shortest
  decimal repr identically in Spark (BigDecimal.valueOf + HALF_UP) and
  DuckDB, and decimal addition is exact, so aggregation order cannot
  change the result. The final value is cast back to DOUBLE so schemas
  agree.
- Integer aggregates are cast to BIGINT on the oracle side (DuckDB
  ``sum(int)`` is HUGEINT).
- Every LIMIT / top-k carries a total ORDER BY (unique tiebreaker).
- Threshold comparisons on ratios use cross-multiplied integer
  comparisons, never float thresholds.
- Cosine-similarity queries output ranks, not raw scores.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class CatalogQuery:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL, or None → driver does rows-only check
    doc: str = ""


_REGISTRY: dict[str, CatalogQuery] = {}

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def register(name: str, oracle: str | None = None, doc: str = ""):
    """Decorator: register a catalog query by name."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        _REGISTRY[name] = CatalogQuery(name=name, fn=fn, oracle=oracle, doc=doc)
        return fn

    return deco


def registry() -> dict[str, CatalogQuery]:
    return dict(_REGISTRY)


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{table}.parquet")
    # events.ts is TIMESTAMP(NANOS) in parquet → read as long nanos
    # (legacy conf above), convert to µs timestamps to match DuckDB
    if table == "events" and dict(df.dtypes).get("ts") == "bigint":
        # integer division — ns values ~1.7e18 overflow double precision
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def spread(df: DataFrame) -> DataFrame:
    """Repartition a narrow input up to full parallelism for CPU-heavy
    map stages.

    Small parquet files arrive as one split, which would serialize
    per-row compute (hashing, shingling) on a single core. The shuffle
    this adds is tiny (it carries the raw rows once); on big inputs
    (≥ default parallelism splits) it's a no-op.
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def load_views(spark: SparkSession, sf_dir: str) -> None:
    """Register all TESTDATA tables as temp views (for spark.sql paths)."""
    for t in TABLES:
        load(spark, sf_dir, t).createOrReplaceTempView(t)
