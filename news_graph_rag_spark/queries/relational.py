"""Relational operator catalog (SURVEY §2.b–2.h) over the TESTDATA tables.

The reference's graph traversals are equi-join chains on uid keys
(SURVEY §2.c); here the same join/filter/agg/set/unnest semantics are
exercised on the TPC-H-ish star schema. Scale notes per query:
dimension tables (region, nation, supplier, part ≤ O(10^5) rows even at
sf100) are broadcast; fact-fact joins shuffle on their keys and rely on
AQE for skew; every aggregation is partial (map-side combine) because it
is expressed with built-in aggregate functions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .catalog import load, register

# ---------------------------------------------------------------------------
# helpers: deterministic float aggregation (see catalog.py docstring)
# ---------------------------------------------------------------------------


def dsum(col: F.Column | str, scale: int = 2) -> F.Column:
    """Order-insensitive double sum: per-row decimal cast → exact sum."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(30,{scale})")).cast("double")


# ---------------------------------------------------------------------------
# J1 + A1 — 1-hop traversal + grouped count
# (reference graph.py:133 `(a:Article)-[:CONTAINS]->(c:Chunk)`;
#  count per group graph.py:52)
# ---------------------------------------------------------------------------


@register(
    "graph_1hop_count",
    oracle="""
    SELECT r_name, CAST(count(*) AS BIGINT) AS n_nations
    FROM nation JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name
    """,
    doc="J1/A1: 1-hop equi-join + grouped count (graph.py:133,52)",
)
def graph_1hop_count(spark: SparkSession, sf: str) -> DataFrame:
    nation, region = load(spark, sf, "nation"), load(spark, sf, "region")
    return (
        nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name")
        .agg(F.count(F.lit(1)).alias("n_nations"))
    )


# ---------------------------------------------------------------------------
# J2 + P3 + T1 + T3 — the chat.py:25 exemplar shape:
# MATCH (a)-[:CONTAINS]->(c)-[:MENTIONS]->(o) WHERE o.name IN [...]
# RETURN DISTINCT a.title LIMIT 10
# ---------------------------------------------------------------------------


@register(
    "graph_2hop_filter_in",
    oracle="""
    SELECT DISTINCT c_name
    FROM customer
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
    WHERE r_name IN ('EUROPE', 'ASIA')
    ORDER BY c_name LIMIT 10
    """,
    doc="J2/P3/T1/T3: 2-hop join + IN filter + DISTINCT + LIMIT (chat.py:25)",
)
def graph_2hop_filter_in(spark: SparkSession, sf: str) -> DataFrame:
    customer = load(spark, sf, "customer")
    nation = load(spark, sf, "nation")
    region = load(spark, sf, "region").filter(F.col("r_name").isin("EUROPE", "ASIA"))
    return (
        customer.join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("c_name")
        .distinct()
        .orderBy("c_name")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# J3 + T2 + A2 — the chat.py:28 exemplar shape:
# 3-hop chain, WITH DISTINCT s, RETURN count(s)
# ---------------------------------------------------------------------------


@register(
    "graph_3hop_count_distinct",
    oracle="""
    SELECT CAST(count(DISTINCT s_suppkey) AS BIGINT) AS n_suppliers
    FROM supplier
      JOIN lineitem ON s_suppkey = l_suppkey
      JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderpriority = '1-URGENT'
    """,
    doc="J3/T2/A2: 3-hop join + count distinct (chat.py:28)",
)
def graph_3hop_count_distinct(spark: SparkSession, sf: str) -> DataFrame:
    supplier = load(spark, sf, "supplier")
    lineitem = load(spark, sf, "lineitem")
    orders = load(spark, sf, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return (
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supplier), lineitem.l_suppkey == supplier.s_suppkey)
        .agg(F.count_distinct("s_suppkey").alias("n_suppliers"))
    )


# ---------------------------------------------------------------------------
# U1 — Cypher UNION (distinct) of two MATCH branches (chat.py:31)
# ---------------------------------------------------------------------------


@register(
    "union_distinct",
    oracle="""
    SELECT c_name FROM customer JOIN nation ON c_nationkey = n_nationkey
    WHERE n_name = 'NATION_0'
    UNION
    SELECT c_name FROM customer JOIN nation ON c_nationkey = n_nationkey
    WHERE n_name = 'NATION_1'
    """,
    doc="U1: UNION-distinct of two filtered branches (chat.py:31)",
)
def union_distinct(spark: SparkSession, sf: str) -> DataFrame:
    customer = load(spark, sf, "customer")
    nation = load(spark, sf, "nation")

    def branch(nname: str) -> DataFrame:
        return (
            customer.join(
                F.broadcast(nation.filter(F.col("n_name") == nname)),
                customer.c_nationkey == nation.n_nationkey,
            ).select("c_name")
        )

    return branch("NATION_0").union(branch("NATION_1")).distinct()


# ---------------------------------------------------------------------------
# J5 — join-after-anchor on a composite key (graph.py:84-91:
# `(a {uid:$uid})-[:CONTAINS]->(p:Chunk {position: entity.chunk})`)
# ---------------------------------------------------------------------------


@register(
    "composite_key_join",
    oracle="""
    SELECT o_orderkey, o_totalprice, l_partkey, l_quantity
    FROM orders JOIN lineitem
      ON o_orderkey = l_orderkey AND l_linenumber = 1
    WHERE o_orderstatus = 'F'
    """,
    doc="J5: anchored join on composite key (graph.py:84-91)",
)
def composite_key_join(spark: SparkSession, sf: str) -> DataFrame:
    orders = load(spark, sf, "orders").filter(F.col("o_orderstatus") == "F")
    lineitem = load(spark, sf, "lineitem").filter(F.col("l_linenumber") == 1)
    return orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey).select(
        "o_orderkey", "o_totalprice", "l_partkey", "l_quantity"
    )


# ---------------------------------------------------------------------------
# J6 — MERGE's matched/unmatched split: semi-join (exists) and anti-join
# (new keys) (graph.py:87-89 MERGE find-or-create)
# ---------------------------------------------------------------------------


@register(
    "semi_join_exists",
    oracle="""
    SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_customers
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY c_mktsegment
    """,
    doc="J6a: existence semi-join, the MERGE matched side (graph.py:87-89)",
)
def semi_join_exists(spark: SparkSession, sf: str) -> DataFrame:
    customer = load(spark, sf, "customer")
    orders = load(spark, sf, "orders")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


@register(
    "anti_join_new_keys",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
    doc="J6b: anti-join, the MERGE unmatched/insert side (graph.py:87-89)",
)
def anti_join_new_keys(spark: SparkSession, sf: str) -> DataFrame:
    customer = load(spark, sf, "customer")
    orders = load(spark, sf, "orders")
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


# ---------------------------------------------------------------------------
# A1/A3-style wide aggregation — TPC-H Q1 shape (pricing summary).
# Decimal-cast sums: deterministic under any aggregation order.
# ---------------------------------------------------------------------------


@register(
    "pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
      CAST(SUM(CAST(l_quantity AS DECIMAL(30,2))) AS DOUBLE) AS sum_qty,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,2))) AS DOUBLE) AS sum_base_price,
      CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,4))) AS DOUBLE)
        AS sum_disc_price,
      CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(30,6)))
        AS DOUBLE) AS sum_charge,
      CAST(count(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="A1: TPC-H Q1-shape grouped aggregation with deterministic sums",
)
def pricing_summary(spark: SparkSession, sf: str) -> DataFrame:
    li = load(spark, sf, "lineitem").filter(F.col("l_shipdate") <= "1998-09-02")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        dsum("l_quantity").alias("sum_qty"),
        dsum("l_extendedprice").alias("sum_base_price"),
        dsum(disc, 4).alias("sum_disc_price"),
        dsum(disc * (1 + F.col("l_tax")), 6).alias("sum_charge"),
        F.count(F.lit(1)).alias("count_order"),
    )


# ---------------------------------------------------------------------------
# T4 — top-k with total order (Spark TakeOrdered does distributed top-k)
# ---------------------------------------------------------------------------


@register(
    "topk_orders",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
    doc="T4: global top-k by score with unique tiebreaker (graph.py:159-165)",
)
def topk_orders(spark: SparkSession, sf: str) -> DataFrame:
    return (
        load(spark, sf, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# P1/P6/F1 — computed string projection with alias
# ('Title: ' + a.title + '\nText: ' + chunk.text, vector_index.ipynb:125)
# ---------------------------------------------------------------------------


@register(
    "projection_concat",
    oracle="""
    SELECT c_custkey,
           'Customer: ' || c_name || ' | Segment: ' || c_mktsegment AS text
    FROM customer WHERE c_acctbal > 0
    """,
    doc="P1/P6/F1: computed string projection (vector_index.ipynb:125)",
)
def projection_concat(spark: SparkSession, sf: str) -> DataFrame:
    return (
        load(spark, sf, "customer")
        .filter(F.col("c_acctbal") > 0)
        .select(
            "c_custkey",
            F.concat(
                F.lit("Customer: "),
                F.col("c_name"),
                F.lit(" | Segment: "),
                F.col("c_mktsegment"),
            ).alias("text"),
        )
    )


# ---------------------------------------------------------------------------
# A3 — collect-to-list per group (graph.py:135 `collect(c)`), rendered as
# a sorted joined string so the hash comparison is order-stable.
# ---------------------------------------------------------------------------


@register(
    "collect_sorted_list",
    oracle="""
    SELECT o_custkey,
           string_agg(CAST(o_orderkey AS VARCHAR), ','
                      ORDER BY CAST(o_orderkey AS VARCHAR)) AS order_keys,
           CAST(count(*) AS BIGINT) AS n_orders
    FROM orders
    GROUP BY o_custkey
    """,
    doc="A3: collect_list per group, sorted for determinism (graph.py:135)",
)
def collect_sorted_list(spark: SparkSession, sf: str) -> DataFrame:
    return (
        load(spark, sf, "orders")
        .groupBy("o_custkey")
        .agg(
            F.array_join(
                F.array_sort(F.collect_list(F.col("o_orderkey").cast("string"))), ","
            ).alias("order_keys"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


# ---------------------------------------------------------------------------
# X1 + F4 — unnest/explode: tokenize document text, top-20 tokens
# (UNWIND graph.py:49; sentence split utils.py:19-24)
# ---------------------------------------------------------------------------


@register(
    "explode_tokens",
    oracle="""
    SELECT token, CAST(count(*) AS BIGINT) AS n
    FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents) t
    WHERE token <> ''
    GROUP BY token
    ORDER BY n DESC, token LIMIT 20
    """,
    doc="X1/F4: explode(split(text)) + frequency top-k (graph.py:49)",
)
def explode_tokens(spark: SparkSession, sf: str) -> DataFrame:
    return (
        load(spark, sf, "documents")
        .select(F.explode(F.split(F.col("text"), " ")).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("token"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Window functions — top-k per group + ordered running aggregates.
# (SNIPPETS common-OLAP patterns; no window aggs exist in the reference,
#  but a training-data pipeline needs them — graded as first-class.)
# ---------------------------------------------------------------------------


@register(
    "window_topk_per_group",
    oracle="""
    SELECT * FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders) t
    WHERE rn <= 2
    """,
    doc="window: top-2 orders per customer (top-k-per-group pattern)",
)
def window_topk_per_group(spark: SparkSession, sf: str) -> DataFrame:
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        load(spark, sf, "orders")
        .select("o_custkey", "o_orderkey", "o_totalprice")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 2)
    )


@register(
    "window_lag_gap",
    oracle="""
    SELECT user_id, event_id,
           epoch_us(ts) - epoch_us(lag(ts) OVER w) AS gap_us,
           row_number() OVER w AS rn
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    doc="window: lag + inter-event gap per user (sessionization building block)",
)
def window_lag_gap(spark: SparkSession, sf: str) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ev = load(spark, sf, "events")
    return ev.select(
        "user_id",
        "event_id",
        (F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))).alias("gap_us"),
        F.row_number().over(w).alias("rn"),
    )


@register(
    "sessionize",
    oracle="""
    WITH flagged AS (
      SELECT user_id, event_id, ts,
             CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                  OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sessions AS (
      SELECT user_id, event_id,
             SUM(new_session) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM flagged
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           CAST(count(*) AS BIGINT) AS n_events
    FROM sessions GROUP BY user_id, session_id
    """,
    doc="sessionization: 30-min-gap sessions via lag + running sum",
)
def sessionize(spark: SparkSession, sf: str) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    new_session = F.when(gap_us.isNull() | (gap_us > 1_800_000_000), 1).otherwise(0)
    running = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        load(spark, sf, "events")
        .withColumn("new_session", new_session)
        .withColumn("session_id", F.sum("new_session").over(running).cast("bigint"))
        .groupBy("user_id", "session_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


@register(
    "tumbling_hourly",
    oracle="""
    SELECT date_trunc('hour', ts) AS hour_ts, event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(SUM(CAST(value AS DECIMAL(30,3))) AS DOUBLE) AS sum_value
    FROM events GROUP BY 1, 2
    """,
    doc="streaming-analog: tumbling 1h window aggregation over events",
)
def tumbling_hourly(spark: SparkSession, sf: str) -> DataFrame:
    return (
        load(spark, sf, "events")
        .groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour_ts"),
            F.col("event_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum("value", 3).alias("sum_value"),
        )
    )


# ---------------------------------------------------------------------------
# JSON property access (events.props) — map/struct surface (P5 analog)
# ---------------------------------------------------------------------------


@register(
    "json_extract_agg",
    oracle="""
    SELECT event_type,
           CAST(SUM(CAST(props->>'$.k' AS INTEGER)) AS BIGINT) AS sum_k,
           CAST(count(*) AS BIGINT) AS n
    FROM events GROUP BY event_type
    """,
    doc="P5-analog: JSON property extraction + aggregation over events.props",
)
def json_extract_agg(spark: SparkSession, sf: str) -> DataFrame:
    return (
        load(spark, sf, "events")
        .select(
            "event_type",
            F.get_json_object(F.col("props"), "$.k").cast("int").alias("k"),
        )
        .groupBy("event_type")
        .agg(F.sum("k").cast("bigint").alias("sum_k"), F.count(F.lit(1)).alias("n"))
    )


# ---------------------------------------------------------------------------
# F5/F8 — regex strip of Lucene special chars (utils.py:8,46-48) + initcap
# (graph.py:97 str.title)
# ---------------------------------------------------------------------------

_LUCENE_RE = r'[-+&|!(){}\[\]\^"~*?:\\\\]'


@register(
    "string_functions",
    oracle=r"""
    SELECT doc_id,
           trim(regexp_replace(substr(text, 1, 60),
                '[-+&|!(){}\[\]\^"~*?:\\\\]', ' ', 'g')) AS cleaned,
           upper(substr(lang, 1, 1)) || lower(substr(lang, 2)) AS lang_title,
           length(text) AS n_len
    FROM documents
    """,
    doc="F5/F8: Lucene-special-char strip (utils.py:46-48) + title-case",
)
def string_functions(spark: SparkSession, sf: str) -> DataFrame:
    return load(spark, sf, "documents").select(
        "doc_id",
        F.trim(
            F.regexp_replace(F.substring(F.col("text"), 1, 60), _LUCENE_RE, " ")
        ).alias("cleaned"),
        F.initcap(F.col("lang")).alias("lang_title"),
        F.length(F.col("text")).cast("bigint").alias("n_len"),
    )
