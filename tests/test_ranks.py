"""Unit tests for the two-phase global ordering helpers (ranks.py).

These helpers replace the classic single-partition ``OVER (ORDER BY)``
scale cliff; the tests check exactness against the naive window on
small data, across partition counts and skewed layouts.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from news_graph_rag_spark.ranks import global_cumsum, global_row_number


def _naive(df, order_by):
    w = Window.orderBy(*order_by)
    return df.withColumn("exp_rnk", F.row_number().over(w)).withColumn(
        "exp_cum", F.sum("v").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )


def test_global_row_number_matches_naive(spark):
    df = spark.range(0, 1000).select(
        F.col("id"), (F.col("id") * 37 % 101).alias("v")
    )
    order = [F.desc("v"), F.asc("id")]
    got = {
        r["id"]: r["rnk"]
        for r in global_row_number(df, order, num_partitions=7).collect()
    }
    exp = {r["id"]: r["exp_rnk"] for r in _naive(df, order).collect()}
    assert got == exp


def test_global_cumsum_inclusive_and_exclusive(spark):
    df = spark.range(0, 500).select(F.col("id"), (F.col("id") % 13).alias("v"))
    order = [F.asc("id")]
    exp = {r["id"]: r["exp_cum"] for r in _naive(df, order).collect()}
    inc = {
        r["id"]: r["cum"]
        for r in global_cumsum(
            df, order, F.col("v"), num_partitions=5
        ).collect()
    }
    exc = {
        r["id"]: r["cum"]
        for r in global_cumsum(
            df, order, F.col("v"), num_partitions=5, inclusive=False
        ).collect()
    }
    assert inc == exp
    vals = {r["id"]: r["v"] for r in df.collect()}
    assert exc == {i: exp[i] - vals[i] for i in exp}


def test_global_cumsum_single_row_and_empty(spark):
    one = spark.createDataFrame([(1, 10)], "id long, v long")
    rows = global_cumsum(one, [F.asc("id")], F.col("v")).collect()
    assert [(r["id"], r["cum"]) for r in rows] == [(1, 10)]
    empty = one.filter(F.lit(False))
    assert global_cumsum(empty, [F.asc("id")], F.col("v")).count() == 0
