"""local_rel: VALUES-backed driver relations must be value- and
type-identical to createDataFrame, plan as LocalTableScan (no
parallelize job behind every broadcast), and survive the literal
shapes the serving paths feed them (nested arrays, floats incl.
NaN/Inf, escaped strings, empty input)."""

import pytest

from news_graph_rag_spark.localrel import MAX_LOCAL_REL_ROWS, local_rel

CASES = [
    (
        [(1, 10, [[1, 2], [3, 4]])],
        "centroid_id int, bd bigint, adc array<array<bigint>>",
    ),
    ([(0, "it's a \\ back\nslash"), (1, None)], "probe_id long, token string"),
    ([(0.5, float("nan")), (1e-300, float("inf"))], "a double, b double"),
    ([(True, [1.5, 2.5])], "f boolean, xs array<double>"),
    ([], "x bigint, y string"),
    ([(i, [float(i)] * 3) for i in range(5)], "n int, v array<float>"),
]


@pytest.mark.parametrize("rows,schema", CASES)
def test_local_rel_matches_create_dataframe(spark, rows, schema):
    a = local_rel(spark, rows, schema)
    b = spark.createDataFrame(rows, schema)
    assert sorted(map(str, a.collect())) == sorted(map(str, b.collect()))
    assert [(f.name, f.dataType) for f in a.schema.fields] == [
        (f.name, f.dataType) for f in b.schema.fields
    ]


def test_local_rel_is_local_table_scan(spark):
    df = local_rel(spark, [(1, "x")], "a int, b string")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "LocalTableScan" in plan
    assert "ExistingRDD" not in plan


def test_local_rel_falls_back_past_budget(spark):
    rows = [(i,) for i in range(MAX_LOCAL_REL_ROWS + 1)]
    df = local_rel(spark, rows, "n int")
    assert df.count() == len(rows)
    # fallback is the createDataFrame path — NOT a VALUES plan
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "LocalTableScan" not in plan


def test_local_rel_float_round_trip_is_exact(spark):
    import math

    vals = [0.1, 1 / 3, 2.5e-17, math.pi, -0.0]
    got = local_rel(
        spark, [(v,) for v in vals], "x double"
    ).collect()
    assert [r["x"] for r in got] == vals


def test_local_rel_quotes_reserved_and_special_column_names(spark):
    """Round-18 hardening (VERDICT r17 #4): output aliases are
    backtick-quoted, so reserved words and special characters in
    column names generate valid SQL; StructType schemas bypass the
    DDL round-trip entirely."""
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    # reserved words via the DDL-string path
    a = local_rel(spark, [(1, "x")], "select bigint, from string")
    b = spark.createDataFrame([(1, "x")], "`select` bigint, `from` string")
    assert sorted(map(str, a.collect())) == sorted(map(str, b.collect()))
    # special characters via the StructType path (a DDL string cannot
    # carry these names)
    st = StructType(
        [
            StructField("week day", LongType()),
            StructField("a`b", StringType()),
            StructField("x,y", StringType()),
        ]
    )
    got = local_rel(spark, [(7, "tick", "comma")], st)
    assert got.columns == ["week day", "a`b", "x,y"]
    assert [tuple(r) for r in got.collect()] == [(7, "tick", "comma")]


def test_local_rel_adversarial_strings_round_trip(spark):
    """Property test (VERDICT r17 #7): adversarial string literals —
    quotes, backslashes, unicode, newlines, control chars — round-trip
    value-identically to createDataFrame."""
    adversarial = [
        "it's",
        'double " quote',
        "back\\slash",
        "new\nline",
        "tab\tchar",
        "ctrl\x01byte",
        "unié中\U0001f600",
        "'; DROP TABLE x; --",
        "%s %d {} `backtick`",
        "\\' mixed \\\\' escapes",
        "",
        " leading and trailing ",
    ]
    rows = [(i, s) for i, s in enumerate(adversarial)]
    a = local_rel(spark, rows, "i int, s string")
    b = spark.createDataFrame(rows, "i int, s string")
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
