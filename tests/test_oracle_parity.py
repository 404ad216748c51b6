"""Local mirror of the driver's correctness gate: run every catalog query
on Spark AND its DuckDB oracle on the same parquet tables, then compare
row counts, column names/order-insensitive sorted values exactly.

This is deliberately strict (exact equality after canonicalization, no
float tolerance) — the driver hashes values, so any drift here is a
failed gate there.
"""

from __future__ import annotations

import math

import duckdb
import pytest

from news_graph_rag_spark.queries import registry
from news_graph_rag_spark.queries.catalog import TABLES

QUERIES = registry()
WITH_ORACLE = sorted(n for n, q in QUERIES.items() if q.oracle)
NO_ORACLE = sorted(n for n, q in QUERIES.items() if not q.oracle)


def _canon_cell(v):
    if v is None:
        return (0, "")
    if isinstance(v, float):
        if math.isnan(v):
            return (1, "nan")
        # repr of the exact double — any bit difference shows up
        return (1, repr(v))
    if isinstance(v, bool):
        return (2, str(int(v)))
    if isinstance(v, int):
        return (3, str(v))
    return (4, str(v))


def _canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(_canon_cell(r[i]) for i in order))
    out.sort()
    return out


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_oracle_parity(name, spark, sf_dir, duck):
    q = QUERIES[name]
    sdf = q.fn(spark, sf_dir)
    spark_cols = [c.lower() for c in sdf.columns]
    spark_rows = [tuple(r) for r in sdf.collect()]

    res = duck.execute(q.oracle)
    duck_cols = [d[0].lower() for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch spark={spark_cols} duck={duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count spark={len(spark_rows)} duck={len(duck_rows)}"
    )
    cs, cd = _canon(spark_rows, spark_cols), _canon(duck_rows, duck_cols)
    if cs != cd:
        diff = [(a, b) for a, b in zip(cs, cd) if a != b][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diff}")


@pytest.mark.parametrize("name", NO_ORACLE)
def test_rows_only(name, spark, sf_dir):
    q = QUERIES[name]
    df = q.fn(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema) > 0
