"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001; ``queries()`` /
``oracle_sql()`` expose the full catalog from
``news_graph_rag_spark.queries`` (one entry per implemented operator
from SURVEY.md §2 plus the training-data pipeline extras). The DuckDB
oracle SQL strings live next to each Spark implementation in the
catalog modules.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from news_graph_rag_spark.queries import registry

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    reg = registry()
    return reg["graph_2hop_filter_in"].fn(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.fn for name, q in registry().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per query (omitted → rows-only check)."""
    return {name: q.oracle for name, q in registry().items() if q.oracle is not None}
