"""Advanced operator catalog: as-of / range joins, rollup & pivot,
exact percentiles, graph analytics (PageRank-lite, co-occurrence),
salting, calendar aggregation.

These go beyond the reference's Cypher surface (SURVEY §2 has no theta/
as-of/range joins) — they're the operators a production Spark analytics
stack adds on top, each still verified against a DuckDB oracle.

Scale notes:
- As-of join: Spark lacks a native one; implemented as union + ordered
  window carry-forward (one shuffle on (key), state = one row) — the
  standard trick that scales linearly, vs. merge_asof which needs
  per-key pandas.
- Range join: bucketize the time axis and equi-join on (key, bucket)
  so the join is hash-based, then filter exactly; candidate blowup is
  bounded by bucket width ÷ range width ≤ 2 buckets per probe.
- PageRank: fixed-iteration chained aggregations; contribution sums go
  through decimal casts so the result is bit-identical under any
  aggregation order (same trick as all float sums here).
- Salting: the heavy-hitter groupBy pre-aggregates on (key, salt) and
  re-aggregates on key — same result, skew split across partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..localrel import local_rel
from .catalog import load, register
from .relational import dsum

# ---------------------------------------------------------------------------
# As-of join: for each purchase, the latest prior (or same-instant)
# click by the same user
# ---------------------------------------------------------------------------


@register(
    "asof_join_purchase_click",
    oracle="""
    WITH purchases AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    ),
    clicks AS (
      -- max event_id among same-instant clicks: pins the tie the ASOF
      -- join would otherwise resolve arbitrarily (round-8 review; the
      -- Spark side orders its carry-forward window by click_id to the
      -- same effect)
      SELECT user_id, ts, max(event_id) AS click_id FROM events
      WHERE event_type = 'click' GROUP BY user_id, ts
    )
    SELECT p.event_id, p.user_id,
           epoch_us(p.ts) - epoch_us(c.ts) AS since_click_us,
           c.click_id
    FROM purchases p ASOF LEFT JOIN clicks c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
    doc="as-of join: latest click at-or-before each purchase, per user "
    "(union + window carry-forward; DuckDB oracle uses native ASOF JOIN)",
)
def asof_join_purchase_click(spark: SparkSession, sf: str) -> DataFrame:
    ev = load(spark, sf, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_id")
    )
    # union trick: tag rows, sort by (ts, is_purchase, click_id) so
    # clicks at the same instant sort first and the MAX click_id wins a
    # same-instant tie deterministically (round-8 review — without the
    # click_id term the winner was partition-order dependent)
    tagged = purchases.select(
        "user_id", "ts", F.lit(1).alias("is_purchase"), "event_id",
        F.lit(None).cast("bigint").alias("click_id"),
        F.lit(None).cast("timestamp").alias("click_ts"),
    ).unionByName(
        clicks.select(
            "user_id", "ts", F.lit(0).alias("is_purchase"),
            F.lit(None).cast("bigint").alias("event_id"),
            "click_id", F.col("ts").alias("click_ts"),
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_purchase", "click_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = tagged.withColumn(
        "last_click_id", F.last("click_id", ignorenulls=True).over(w)
    ).withColumn("last_click_ts", F.last("click_ts", ignorenulls=True).over(w))
    return carried.filter(F.col("is_purchase") == 1).select(
        "event_id",
        "user_id",
        (F.unix_micros(F.col("ts")) - F.unix_micros(F.col("last_click_ts"))).alias(
            "since_click_us"
        ),
        F.col("last_click_id").alias("click_id"),
    )


# ---------------------------------------------------------------------------
# Range join: clicks within 5 minutes before each purchase (bucketed)
# ---------------------------------------------------------------------------

_RANGE_US = 300_000_000  # 5 minutes


@register(
    "range_join_click_window",
    oracle=f"""
    WITH purchases AS (
      SELECT event_id, user_id, epoch_us(ts) AS tus FROM events
      WHERE event_type = 'purchase'
    ),
    clicks AS (
      SELECT user_id, epoch_us(ts) AS cus FROM events
      WHERE event_type = 'click'
    )
    SELECT p.event_id, p.user_id, CAST(count(c.cus) AS BIGINT) AS n_clicks_5m
    FROM purchases p LEFT JOIN clicks c
      ON p.user_id = c.user_id
     AND c.cus > p.tus - {_RANGE_US} AND c.cus <= p.tus
    GROUP BY p.event_id, p.user_id
    """,
    doc="range join: clicks in the 5 min before each purchase — bucketized "
    "equi-join + exact filter (hash join, ≤2 buckets/probe) vs. DuckDB "
    "inequality join",
)
def range_join_click_window(spark: SparkSession, sf: str) -> DataFrame:
    ev = load(spark, sf, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.unix_micros("ts").alias("tus")
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.unix_micros("ts").alias("cus")
    )
    # bucket width = range width → each probe overlaps ≤ 2 buckets
    p = purchases.withColumn(
        "bucket", F.explode(
            F.array(
                (F.col("tus") / _RANGE_US).cast("bigint") - 1,
                (F.col("tus") / _RANGE_US).cast("bigint"),
            )
        )
    )
    c = clicks.withColumn("bucket", (F.col("cus") / _RANGE_US).cast("bigint"))
    joined = p.join(
        c,
        (p.user_id == c.c_user)
        & (p.bucket == c.bucket)
        & (c.cus > p.tus - _RANGE_US)
        & (c.cus <= p.tus),
        "left",
    )
    return joined.groupBy("event_id", "user_id").agg(
        F.count("cus").alias("n_clicks_5m")
    )


# ---------------------------------------------------------------------------
# ROLLUP + pivot
# ---------------------------------------------------------------------------


@register(
    "rollup_revenue",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(count(*) AS BIGINT) AS n,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,2))) AS DOUBLE) AS revenue
    FROM lineitem
    GROUP BY ROLLUP(l_returnflag, l_linestatus)
    """,
    doc="rollup: hierarchical subtotals over (returnflag, linestatus)",
)
def rollup_revenue(spark: SparkSession, sf: str) -> DataFrame:
    return (
        load(spark, sf, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum("l_extendedprice").alias("revenue"),
        )
    )


@register(
    "pivot_status_by_segment",
    oracle="""
    SELECT c_mktsegment,
           CAST(count(*) FILTER (o_orderstatus = 'O') AS BIGINT) AS n_open,
           CAST(count(*) FILTER (o_orderstatus = 'F') AS BIGINT) AS n_filled,
           CAST(count(*) FILTER (o_orderstatus = 'P') AS BIGINT) AS n_partial
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
    doc="pivot: order-status counts per market segment (fixed value list)",
)
def pivot_status_by_segment(spark: SparkSession, sf: str) -> DataFrame:
    orders = load(spark, sf, "orders")
    customer = load(spark, sf, "customer")
    return (
        orders.join(
            F.broadcast(customer.select("c_custkey", "c_mktsegment")),
            orders.o_custkey == F.col("c_custkey"),
        )
        .groupBy("c_mktsegment")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(F.count(F.lit(1)))
        .select(
            "c_mktsegment",
            F.coalesce(F.col("O"), F.lit(0)).alias("n_open"),
            F.coalesce(F.col("F"), F.lit(0)).alias("n_filled"),
            F.coalesce(F.col("P"), F.lit(0)).alias("n_partial"),
        )
    )


# ---------------------------------------------------------------------------
# Exact percentiles (interpolated; integer-valued doubles → exact in FP)
# ---------------------------------------------------------------------------


@register(
    "percentile_quantity",
    oracle="""
    SELECT l_returnflag,
           quantile_cont(CAST(l_quantity AS DOUBLE), 0.25) AS p25,
           quantile_cont(CAST(l_quantity AS DOUBLE), 0.50) AS p50,
           quantile_cont(CAST(l_quantity AS DOUBLE), 0.75) AS p75
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="exact interpolated percentiles of l_quantity per returnflag "
    "(integer-valued data → bit-exact across engines)",
)
def percentile_quantity(spark: SparkSession, sf: str) -> DataFrame:
    li = load(spark, sf, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.percentile("l_quantity", 0.25).alias("p25"),
        F.percentile("l_quantity", 0.50).alias("p50"),
        F.percentile("l_quantity", 0.75).alias("p75"),
    )


# ---------------------------------------------------------------------------
# Graph analytics on derived graphs
# ---------------------------------------------------------------------------


@register(
    "pagerank_nations",
    oracle="""
    WITH edges AS (
      SELECT n_regionkey AS src, n_nationkey + 100 AS dst FROM nation
      UNION ALL
      SELECT n_nationkey + 100 AS src, n_regionkey AS dst FROM nation
    ),
    nodes AS (SELECT DISTINCT src AS id FROM edges),
    deg AS (SELECT src, CAST(count(*) AS BIGINT) AS out_deg
            FROM edges GROUP BY src),
    r0 AS (SELECT id, CAST(1.0 AS DOUBLE) AS rank FROM nodes),
    r1 AS (
      SELECT e.dst AS id,
             CAST(0.15 AS DOUBLE) + 0.85 * CAST(SUM(CAST(
               r.rank / d.out_deg AS DECIMAL(30,12))) AS DOUBLE) AS rank
      FROM edges e JOIN r0 r ON e.src = r.id JOIN deg d ON e.src = d.src
      GROUP BY e.dst
    ),
    r2 AS (
      SELECT e.dst AS id,
             CAST(0.15 AS DOUBLE) + 0.85 * CAST(SUM(CAST(
               r.rank / d.out_deg AS DECIMAL(30,12))) AS DOUBLE) AS rank
      FROM edges e JOIN r1 r ON e.src = r.id JOIN deg d ON e.src = d.src
      GROUP BY e.dst
    )
    SELECT CAST(id AS BIGINT) AS id, rank FROM r2
    """,
    doc="graph analytics: 2-iteration PageRank on the nation↔region "
    "bipartite graph (decimal-cast contribution sums → deterministic)",
)
def pagerank_nations(spark: SparkSession, sf: str) -> DataFrame:
    nation = load(spark, sf, "nation")
    fwd = nation.select(
        F.col("n_regionkey").cast("bigint").alias("src"),
        (F.col("n_nationkey") + 100).cast("bigint").alias("dst"),
    )
    rev = nation.select(
        (F.col("n_nationkey") + 100).cast("bigint").alias("src"),
        F.col("n_regionkey").cast("bigint").alias("dst"),
    )
    edges = fwd.unionByName(rev)
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg"))
    ranks = edges.select(F.col("src").alias("id")).distinct().withColumn(
        "rank", F.lit(1.0)
    )
    for _ in range(2):
        contrib = (
            edges.join(ranks, edges.src == ranks.id)
            .join(deg, "src")
            .select(
                F.col("dst").alias("id"),
                (F.col("rank") / F.col("out_deg")).alias("c"),
            )
        )
        ranks = contrib.groupBy("id").agg(
            (
                F.lit(0.15)
                + F.lit(0.85) * F.sum(F.col("c").cast("decimal(30,12)")).cast("double")
            ).alias("rank")
        )
    return ranks.select(F.col("id").cast("bigint").alias("id"), "rank")


def _copurchase_items(spark: SparkSession, sf: str) -> DataFrame:
    """The ONE distinct (l_orderkey, l_partkey < 50) item frame behind
    every co-purchase entry (round-8 review: four drifting copies)."""
    return (
        load(spark, sf, "lineitem")
        .filter(F.col("l_partkey") < 50)
        .select("l_orderkey", "l_partkey")
        .distinct()
    )


def _ordered_copurchase_pairs(items: DataFrame) -> DataFrame:
    """The ONE ordered self-join: a.l_orderkey = b.l_orderkey AND
    a.l_partkey < b.l_partkey, frame aliased a/b with any extra columns
    carried through — mirrors the shared oracle fragment."""
    a, b = items.alias("a"), items.alias("b")
    return a.join(
        b,
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("a.l_partkey") < F.col("b.l_partkey")),
    )


@register(
    "copurchase_part_pairs",
    oracle="""
    WITH items AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
      WHERE l_partkey < 50
    )
    SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
           CAST(count(*) AS BIGINT) AS n_orders
    FROM items a JOIN items b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    GROUP BY a.l_partkey, b.l_partkey
    HAVING count(*) >= 2
    """,
    doc="graph analytics: part co-occurrence edges (bounded key range, "
    "self-join on orderkey, support >= 2)",
)
def copurchase_part_pairs(spark: SparkSession, sf: str) -> DataFrame:
    return (
        _ordered_copurchase_pairs(_copurchase_items(spark, sf))
        .groupBy(
            F.col("a.l_partkey").alias("part_a"), F.col("b.l_partkey").alias("part_b")
        )
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .filter(F.col("n_orders") >= 2)
    )


# ---------------------------------------------------------------------------
# Salted aggregation (skew pattern; result identical to plain groupBy)
# ---------------------------------------------------------------------------


@register(
    "salted_event_counts",
    oracle="""
    SELECT event_type, CAST(count(*) AS BIGINT) AS n,
           CAST(SUM(CAST(value AS DECIMAL(30,3))) AS DOUBLE) AS sum_value
    FROM events GROUP BY event_type
    """,
    doc="skew pattern: two-phase salted aggregation on a hot key — "
    "pre-agg on (key, salt) then final agg; oracle is the plain groupBy",
)
def salted_event_counts(spark: SparkSession, sf: str) -> DataFrame:
    ev = load(spark, sf, "events")
    salted = ev.withColumn("_salt", (F.rand(seed=7) * 16).cast("int"))
    partial = salted.groupBy("event_type", "_salt").agg(
        F.count(F.lit(1)).alias("pn"),
        F.sum(F.col("value").cast("decimal(30,3)")).alias("psum"),
    )
    return partial.groupBy("event_type").agg(
        F.sum("pn").cast("bigint").alias("n"),
        F.sum("psum").cast("double").alias("sum_value"),
    )


# ---------------------------------------------------------------------------
# Salted JOIN (hot-key skew; result identical to the plain join)
# ---------------------------------------------------------------------------

_SKEW_SALTS = 8


@register(
    "salted_skew_join",
    oracle="""
    WITH dim AS (
      SELECT DISTINCT event_type,
             CAST(length(event_type) AS BIGINT) AS weight
      FROM events
    )
    SELECT e.event_type, CAST(count(*) AS BIGINT) AS n,
           CAST(SUM(CAST(e.value AS DECIMAL(30,3)) * d.weight) AS DOUBLE)
             AS weighted_value
    FROM events e JOIN dim d USING (event_type)
    GROUP BY e.event_type
    """,
    doc="skew pattern: salted shuffle join on a hot key. The graph-shaped "
    "instance is the MENTIONS join (a country entity mentioned in every "
    "chunk makes one join partition take the whole table); here the "
    "events fact (5 hot event_type keys) joins a per-type dim. Fact rows "
    "carry salt = hash(user_id) % 8; the dim side is replicated ×8 and "
    "the join runs on (key, salt) — 8× more, evenly-sized partitions. "
    "shuffle_hash hint models the 100 TB case where the dim is too big "
    "to broadcast. Aggregation reuses the salt for a two-phase combine.",
)
def salted_skew_join(spark: SparkSession, sf: str) -> DataFrame:
    ev = load(spark, sf, "events")
    dim = (
        ev.select("event_type")
        .distinct()
        .withColumn("weight", F.length("event_type").cast("bigint"))
    )
    fact = ev.withColumn(
        "_salt", F.pmod(F.xxhash64("user_id"), F.lit(_SKEW_SALTS)).cast("int")
    )
    # sequence of int literals → array<int>: explode yields int directly
    # (a generator can't be nested under a cast)
    dim_rep = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(_SKEW_SALTS - 1)))
    )
    joined = fact.join(dim_rep.hint("shuffle_hash"), ["event_type", "_salt"])
    partial = joined.groupBy("event_type", "_salt").agg(
        F.count(F.lit(1)).alias("pn"),
        F.sum(F.col("value").cast("decimal(30,3)") * F.col("weight")).alias("psum"),
    )
    return partial.groupBy("event_type").agg(
        F.sum("pn").cast("bigint").alias("n"),
        F.sum("psum").cast("double").alias("weighted_value"),
    )


# ---------------------------------------------------------------------------
# Calendar aggregation
# ---------------------------------------------------------------------------


@register(
    "orders_by_month",
    oracle="""
    SELECT CAST(year(o_orderdate) AS INT) AS y,
           CAST(month(o_orderdate) AS INT) AS m,
           CAST(count(*) AS BIGINT) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(30,2))) AS DOUBLE) AS revenue
    FROM orders GROUP BY 1, 2
    """,
    doc="calendar rollup: orders count + revenue per (year, month)",
)
def orders_by_month(spark: SparkSession, sf: str) -> DataFrame:
    return (
        load(spark, sf, "orders")
        .groupBy(
            F.year("o_orderdate").alias("y"), F.month("o_orderdate").alias("m")
        )
        .agg(F.count(F.lit(1)).alias("n"), dsum("o_totalprice").alias("revenue"))
    )


# ---------------------------------------------------------------------------
# Scalar-subquery threshold (decimal cross-multiplied, exact)
# ---------------------------------------------------------------------------


@register(
    "above_avg_customers",
    oracle="""
    WITH tot AS (
      SELECT SUM(CAST(c_acctbal AS DECIMAL(30,2))) AS s,
             CAST(count(*) AS BIGINT) AS n
      FROM customer
    )
    SELECT c_custkey, c_name
    FROM customer, tot
    WHERE CAST(c_acctbal AS DECIMAL(30,2)) * n > s
    """,
    doc="scalar subquery: customers above average balance (exact decimal "
    "cross-multiplied comparison, no float threshold)",
)
def above_avg_customers(spark: SparkSession, sf: str) -> DataFrame:
    customer = load(spark, sf, "customer")
    tot = customer.agg(
        F.sum(F.col("c_acctbal").cast("decimal(30,2)")).alias("s"),
        F.count(F.lit(1)).alias("n"),
    )
    return (
        customer.crossJoin(F.broadcast(tot))
        .filter(F.col("c_acctbal").cast("decimal(30,2)") * F.col("n") > F.col("s"))
        .select("c_custkey", "c_name")
    )


# ---------------------------------------------------------------------------
# Graph analytics: connected components + triangles on the co-purchase
# graph (parts co-occurring in an order, bounded key range)
# ---------------------------------------------------------------------------

_COPURCHASE_EDGES_SQL = """
      WITH items AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
        WHERE l_partkey < 50
      ),
      pairs AS (
        SELECT a.l_partkey AS src, b.l_partkey AS dst
        FROM items a JOIN items b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2
      )
      SELECT src, dst FROM pairs UNION SELECT dst, src FROM pairs
"""


def _copurchase_edges(spark: SparkSession, sf: str) -> DataFrame:
    return (
        _ordered_copurchase_pairs(_copurchase_items(spark, sf))
        .select(
            F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst")
        )
        .distinct()
    )


@register(
    "connected_components_parts",
    oracle="""
    WITH RECURSIVE items AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
      WHERE l_partkey < 50
    ),
    pairs AS (
      SELECT a.l_partkey AS src, b.l_partkey AS dst
      FROM items a JOIN items b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
    ),
    edges AS (
      SELECT src, dst FROM pairs UNION ALL SELECT dst, src FROM pairs
    ),
    reach(id, r) AS (
      SELECT src, dst FROM edges
      UNION
      SELECT reach.id, e.dst FROM reach JOIN edges e ON reach.r = e.src
    )
    SELECT CAST(id AS BIGINT) AS id,
           CAST(least(id, min(r)) AS BIGINT) AS component
    FROM reach GROUP BY id
    """,
    doc="graph analytics: weakly connected components to convergence "
    "(min-label propagation + pointer halving, news_graph_rag_spark."
    "graph_algos) vs. DuckDB recursive transitive closure — exact at "
    "the fixpoint, so iteration strategy can't affect parity",
)
def connected_components_parts(spark: SparkSession, sf: str) -> DataFrame:
    from ..graph_algos import connected_components

    cc = connected_components(_copurchase_edges(spark, sf))
    return cc.select(
        F.col("id").cast("bigint").alias("id"),
        F.col("component").cast("bigint").alias("component"),
    )


@register(
    "triangle_count_parts",
    oracle=f"""
    WITH edges AS ({_COPURCHASE_EDGES_SQL}),
    und AS (SELECT src, dst FROM edges WHERE src < dst),
    tri AS (
      SELECT ab.src AS a, ab.dst AS b, bc.dst AS c
      FROM und ab
      JOIN und bc ON ab.dst = bc.src
      JOIN und ac ON ab.src = ac.src AND bc.dst = ac.dst
    ),
    corners AS (
      SELECT a AS id FROM tri UNION ALL
      SELECT b FROM tri UNION ALL
      SELECT c FROM tri
    )
    SELECT CAST(id AS BIGINT) AS id, CAST(count(*) AS BIGINT) AS n_triangles
    FROM corners GROUP BY id
    """,
    doc="graph analytics: per-node triangle counts via oriented wedge "
    "join (each triangle found exactly once)",
)
def triangle_count_parts(spark: SparkSession, sf: str) -> DataFrame:
    from ..graph_algos import triangle_count

    tc = triangle_count(_copurchase_edges(spark, sf))
    return tc.select(
        F.col("id").cast("bigint").alias("id"),
        F.col("n_triangles").cast("bigint").alias("n_triangles"),
    )


@register(
    "bfs_hop_distance_parts",
    oracle="""
    WITH RECURSIVE items AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
      WHERE l_partkey < 50
    ),
    pairs AS (
      SELECT a.l_partkey AS src, b.l_partkey AS dst
      FROM items a JOIN items b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
    ),
    edges AS (
      SELECT src, dst FROM pairs UNION SELECT dst, src FROM pairs
    ),
    src0 AS (SELECT min(src) AS s FROM edges),
    reach(id, d) AS (
      SELECT s, 0 FROM src0
      UNION
      SELECT e.dst, r.d + 1
      FROM reach r JOIN edges e ON r.id = e.src
      WHERE r.d < 10
    )
    SELECT CAST(id AS BIGINT) AS id, CAST(min(d) AS BIGINT) AS dist
    FROM reach GROUP BY id
    """,
    doc="graph analytics: single-source BFS hop distances (<= 10 hops) "
    "over the co-purchase parts graph, source = smallest node id. "
    "Frontier-expansion BFS (graph_algos.bfs_distances): per round only "
    "the frontier joins the (checkpointed, reused) edge list and an "
    "anti-join drops visited nodes — state per round is O(frontier), "
    "not O(graph). Oracle: bounded-depth recursive CTE + min(d). "
    "Neo4j-parity: the reference's store answers this with Cypher "
    "shortestPath / variable-length patterns (graph.py traversals).",
)
def bfs_hop_distance_parts(spark: SparkSession, sf: str) -> DataFrame:
    from ..graph_algos import bfs_distances

    edges = _copurchase_edges(spark, sf)
    # source = smallest node id, derived INSIDE the kernel from the
    # checkpointed symmetric list — a separate edges.agg(min) here
    # re-ran the whole lineitem self-join pipeline for one scalar
    # (round-17; the kernel's min reads pinned blocks instead)
    return bfs_distances(edges, None, max_hops=10).select(
        F.col("id").cast("bigint").alias("id"),
        F.col("dist").cast("bigint").alias("dist"),
    )


# ---------------------------------------------------------------------------
# CUBE + grouping_id, running totals, moving averages (window breadth)
# ---------------------------------------------------------------------------


@register(
    "cube_orders",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           CAST(grouping(o_orderstatus) * 2 + grouping(o_orderpriority)
             AS BIGINT) AS gid,
           CAST(count(*) AS BIGINT) AS n
    FROM orders
    GROUP BY CUBE(o_orderstatus, o_orderpriority)
    """,
    doc="cube: all grouping-set combinations + grouping_id disambiguation "
    "(NULL group values vs real NULLs)",
)
def cube_orders(spark: SparkSession, sf: str) -> DataFrame:
    return (
        load(spark, sf, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping_id().cast("bigint").alias("gid"),
            F.count(F.lit(1)).alias("n"),
        )
        .select("o_orderstatus", "o_orderpriority", "gid", "n")
    )


@register(
    "window_running_total",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(30,2)))
                OVER (PARTITION BY o_custkey
                      ORDER BY o_orderdate, o_orderkey
                      ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_spend
    FROM orders
    WHERE o_custkey < 100
    """,
    doc="window: per-customer running revenue total (decimal-exact "
    "cumulative sum, deterministic order via unique key tiebreaker)",
)
def window_running_total(spark: SparkSession, sf: str) -> DataFrame:
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        load(spark, sf, "orders")
        .filter(F.col("o_custkey") < 100)
        .select(
            "o_custkey",
            "o_orderkey",
            F.sum(F.col("o_totalprice").cast("decimal(30,2)"))
            .over(w)
            .cast("double")
            .alias("running_spend"),
        )
    )


@register(
    "window_moving_avg",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(30,2))) OVER w AS DOUBLE)
             / COUNT(*) OVER w AS moving_avg_3
    FROM orders
    WHERE o_custkey < 100
    WINDOW w AS (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
    """,
    doc="window: 3-row moving average of order value per customer "
    "(exact decimal sum → double, then IEEE double division by the "
    "count — identical in both engines; decimal division would differ "
    "in scale rules)",
)
def window_moving_avg(spark: SparkSession, sf: str) -> DataFrame:
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-2, 0)
    )
    dec_sum = F.sum(F.col("o_totalprice").cast("decimal(30,2)")).over(w)
    cnt = F.count(F.lit(1)).over(w)
    return (
        load(spark, sf, "orders")
        .filter(F.col("o_custkey") < 100)
        .select(
            "o_custkey",
            "o_orderkey",
            (dec_sum.cast("double") / cnt).alias("moving_avg_3"),
        )
    )


@register(
    "ntile_customer_value",
    oracle="""
    WITH spend AS (
      SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(30,2))) AS s
      FROM orders GROUP BY o_custkey
    )
    SELECT o_custkey,
           CAST(ntile(4) OVER (ORDER BY s DESC, o_custkey) AS INT) AS quartile
    FROM spend
    """,
    doc="window: customer value quartiles with exact ntile(4) semantics, "
    "computed WITHOUT a global ntile window: the two-phase global ranker "
    "assigns each row its rank and the tile comes from closed-form "
    "arithmetic on (rank, total) — first (T%4) tiles get one extra row, "
    "matching ntile exactly. Fully distributed at any customer count "
    "(a plain ntile window is a single-partition sort).",
)
def ntile_customer_value(spark: SparkSession, sf: str) -> DataFrame:
    from ..ranks import global_row_number

    spend = (
        load(spark, sf, "orders")
        .groupBy("o_custkey")
        .agg(F.sum(F.col("o_totalprice").cast("decimal(30,2)")).alias("s"))
    )
    ranked = global_row_number(spend, [F.desc("s"), F.asc("o_custkey")], "_r")
    tot = spend.agg(F.count(F.lit(1)).alias("_t"))
    # ntile(4) closed form: q=T div 4 rows per tile, first T%4 tiles get
    # q+1 (greatest() keeps the unused else-branch division legal under
    # ANSI when T < 4)
    quartile = F.expr(
        """
        CAST(CASE WHEN _r <= (_t % 4) * (_t div 4 + 1)
             THEN (_r - 1) div (_t div 4 + 1) + 1
             ELSE (_t % 4)
                  + (_r - 1 - (_t % 4) * (_t div 4 + 1)) div greatest(_t div 4, 1)
                  + 1
        END AS INT)
        """
    )
    return (
        ranked.crossJoin(F.broadcast(tot))
        .withColumn("quartile", quartile)
        .select("o_custkey", "quartile")
    )


# ---------------------------------------------------------------------------
# Set-op completeness (INTERSECT / EXCEPT) + partition-pruned scan
# ---------------------------------------------------------------------------


@register(
    "intersect_except_customers",
    oracle="""
    SELECT c_custkey, 'both' AS bucket FROM (
      SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'F'
      INTERSECT
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    )
    UNION ALL
    SELECT c_custkey, 'only_f' AS bucket FROM (
      SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'F'
      EXCEPT
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    )
    """,
    doc="set ops: INTERSECT and EXCEPT of customer key sets by order "
    "status (completes the U1 union-distinct family)",
)
def intersect_except_customers(spark: SparkSession, sf: str) -> DataFrame:
    orders = load(spark, sf, "orders")
    f_keys = (
        orders.filter(F.col("o_orderstatus") == "F")
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    o_keys = (
        orders.filter(F.col("o_orderstatus") == "O")
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    # .intersect / .subtract are the DISTINCT set semantics (SQL
    # INTERSECT / EXCEPT); exceptAll would be multiset difference
    both = f_keys.intersect(o_keys).withColumn("bucket", F.lit("both"))
    only_f = f_keys.subtract(o_keys).withColumn("bucket", F.lit("only_f"))
    return both.unionByName(only_f)


def _stage_events_by_type(spark: SparkSession, sf: str) -> str:
    """The ONE staged events-partitioned-by-event_type layout, shared
    by partitioned_scan_pruning (static pruning) and
    dynamic_partition_pruning_join (runtime pruning) — round-8 review:
    two verbatim copies of the staging idiom writing the same
    fingerprint dir could silently drift into incompatible layouts."""
    import os

    from .catalog import fingerprint_stage_dir

    ev = load(spark, sf, "events")
    stage = fingerprint_stage_dir(os.path.join(sf, "events.parquet"), "events_by_type")
    if not os.path.exists(os.path.join(stage, "_SUCCESS")):
        ev.write.mode("overwrite").partitionBy("event_type").parquet(stage)
    return stage


@register(
    "partitioned_scan_pruning",
    oracle="""
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day_ts,
           CAST(count(*) AS BIGINT) AS n,
           CAST(SUM(CAST(value AS DECIMAL(30,3))) AS DOUBLE) AS sum_value
    FROM events WHERE event_type = 'purchase'
    GROUP BY 1
    """,
    doc="partition pruning (I2 range-index analog): events written "
    "partitioned by event_type, then one partition queried — the scan's "
    "PartitionFilters prune 4/5 of the data before any IO "
    "(plan-asserted in tests/test_plans.py)",
)
def partitioned_scan_pruning(spark: SparkSession, sf: str) -> DataFrame:
    # stage once per (source fingerprint): the partitioned layout is the
    # "index" — fingerprint_stage_dir guarantees regen freshness and
    # sweeps superseded staged copies
    stage = _stage_events_by_type(spark, sf)
    part = spark.read.parquet(stage).filter(F.col("event_type") == "purchase")
    return part.groupBy(F.date_trunc("day", F.col("ts")).alias("day_ts")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(30,3)")).cast("double").alias("sum_value"),
    )


# ---------------------------------------------------------------------------
# SCD2 temporal dimension build — event log → validity intervals
# ---------------------------------------------------------------------------


@register(
    "scd2_user_state",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_type, ts,
             lag(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_type) AS prev_type
      FROM events
    ),
    changes AS (
      SELECT user_id, event_type, ts FROM ordered
      WHERE prev_type IS NULL OR event_type <> prev_type
    )
    SELECT user_id, event_type, ts AS valid_from,
           lead(ts) OVER (
             PARTITION BY user_id ORDER BY ts, event_type) AS valid_to,
           (lead(ts) OVER (
             PARTITION BY user_id ORDER BY ts, event_type) IS NULL)
             AS is_current
    FROM changes
    """,
    doc="lakehouse: slowly-changing-dimension (type 2) build from an "
    "event log — consecutive same-state runs collapse to one version, "
    "each version carries [valid_from, valid_to) and an is_current "
    "flag. Two window passes, both partitioned by user_id (never "
    "global): change detection via lag, interval close via lead. "
    "Shuffles once on user_id; both windows reuse the same "
    "partitioning, so Catalyst plans a single exchange.",
)
def scd2_user_state(spark: SparkSession, sf: str) -> DataFrame:
    ev = load(spark, sf, "events").select("user_id", "event_type", "ts")
    w = Window.partitionBy("user_id").orderBy("ts", "event_type")
    changes = (
        ev.withColumn("_prev", F.lag("event_type").over(w))
        .filter(F.col("_prev").isNull() | (F.col("event_type") != F.col("_prev")))
        .drop("_prev")
    )
    wc = Window.partitionBy("user_id").orderBy("ts", "event_type")
    return changes.select(
        "user_id",
        "event_type",
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(wc).alias("valid_to"),
        F.lead("ts").over(wc).isNull().alias("is_current"),
    )


# ---------------------------------------------------------------------------
# Personalized PageRank — graph-RAG context expansion scoring
# ---------------------------------------------------------------------------


@register(
    "personalized_pagerank_parts",
    oracle=f"""
    WITH edges AS ({_COPURCHASE_EDGES_SQL}),
    deg AS (SELECT src, CAST(count(*) AS BIGINT) AS out_deg
            FROM edges GROUP BY src),
    s0 AS (SELECT min(src) AS s FROM edges),
    r0 AS (SELECT s AS id, CAST(1.0 AS DOUBLE) AS rank FROM s0),
    r1 AS (
      SELECT id, CAST(SUM(v) AS DOUBLE) AS rank FROM (
        SELECT s AS id, CAST(0.15 AS DECIMAL(30,12)) AS v FROM s0
        UNION ALL
        SELECT e.dst,
               CAST(CAST(0.85 AS DOUBLE) * r.rank / d.out_deg
                    AS DECIMAL(30,12))
        FROM edges e JOIN r0 r ON e.src = r.id JOIN deg d ON e.src = d.src
      ) GROUP BY id
    ),
    r2 AS (
      SELECT id, CAST(SUM(v) AS DOUBLE) AS rank FROM (
        SELECT s AS id, CAST(0.15 AS DECIMAL(30,12)) AS v FROM s0
        UNION ALL
        SELECT e.dst,
               CAST(CAST(0.85 AS DOUBLE) * r.rank / d.out_deg
                    AS DECIMAL(30,12))
        FROM edges e JOIN r1 r ON e.src = r.id JOIN deg d ON e.src = d.src
      ) GROUP BY id
    )
    SELECT CAST(id AS BIGINT) AS id, rank FROM r2
    """,
    doc="graph analytics / RAG expansion: 2-iteration personalized "
    "PageRank from the smallest node of the co-purchase graph — the "
    "teleport mass returns to the SOURCE (not uniformly), so ranks "
    "measure proximity to the query seed; this is the principled "
    "upgrade of 1-hop retrieval expansion (R4) for graph-RAG context "
    "selection. Sparse: only touched nodes carry rank, so per-iteration "
    "cost is O(frontier edges), not O(graph). Contribution sums go "
    "through decimal casts — bit-stable under any partitioning.",
)
def personalized_pagerank_parts(spark: SparkSession, sf: str) -> DataFrame:
    pairs = _copurchase_edges(spark, sf)
    # pin the symmetric edge list ONCE: deg, the source scalar, and
    # both power-iteration rounds all read it (round-17 — unpinned,
    # the lineitem self-join pipeline re-executed per consumer)
    edges = pairs.unionByName(
        pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint(eager=True)
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg"))
    source = int(edges.agg(F.min("src")).first()[0])
    teleport = local_rel(spark, [(source,)], "id bigint").select(
        "id", F.lit(0.15).cast("decimal(30,12)").alias("v")
    )
    ranks = local_rel(spark, [(source, 1.0)], "id bigint, rank double")
    for _ in range(2):
        contrib = (
            edges.join(ranks, edges["src"] == ranks["id"])
            .join(deg, "src")
            .select(
                F.col("dst").alias("id"),
                (F.lit(0.85) * F.col("rank") / F.col("out_deg"))
                .cast("decimal(30,12)")
                .alias("v"),
            )
        )
        ranks = (
            teleport.unionByName(contrib)
            .groupBy("id")
            .agg(F.sum("v").cast("double").alias("rank"))
        )
    return ranks.select(F.col("id").cast("bigint").alias("id"), "rank")


# ---------------------------------------------------------------------------
# Incremental rollup merge — algebraic partial-aggregate maintenance
# ---------------------------------------------------------------------------


@register(
    "incremental_rollup_merge",
    oracle="""
    WITH cents AS (
      SELECT o_orderpriority AS priority,
             date_trunc('month', o_orderdate) AS mon,
             o_orderdate < TIMESTAMP '1997-01-01' AS is_base,
             CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
               AS cents
      FROM orders
    ),
    base_partial AS (
      SELECT priority, mon, count(*) AS cnt, sum(cents) AS sum_cents,
             min(cents) AS min_cents, max(cents) AS max_cents
      FROM cents WHERE is_base GROUP BY priority, mon
    ),
    delta_partial AS (
      SELECT priority, mon, count(*) AS cnt, sum(cents) AS sum_cents,
             min(cents) AS min_cents, max(cents) AS max_cents
      FROM cents WHERE NOT is_base GROUP BY priority, mon
    ),
    partials AS (
      SELECT * FROM base_partial UNION ALL SELECT * FROM delta_partial
    )
    SELECT priority,
           CAST(sum(cnt) AS BIGINT) AS n_orders,
           CAST(sum(sum_cents) AS BIGINT) AS total_cents,
           CAST(min(min_cents) AS BIGINT) AS min_cents,
           CAST(max(max_cents) AS BIGINT) AS max_cents,
           CAST(sum(sum_cents) // sum(cnt) AS BIGINT) AS avg_cents
    FROM partials GROUP BY priority
    """,
    doc="incremental materialized-view maintenance: the rollup is stored "
    "as per-(priority, month) partial aggregates (count/sum/min/max — "
    "all algebraic, so partials merge associatively); a refresh "
    "re-aggregates base partials unioned with the new delta's partials "
    "and derives avg from merged sum/count. This is the pattern that "
    "makes a 100 TB rollup refresh touch only the delta partition plus "
    "the (tiny) stored partial table instead of rescanning history; "
    "money flows through DECIMAL(18,2)->cents BIGINT so the merged sums "
    "are exact integers in both engines. The exhibit computes base and "
    "delta partials from a date split of the same scan; in production "
    "the base partials are the stored rollup table.",
)
def incremental_rollup_merge(spark: SparkSession, sf: str) -> DataFrame:
    orders = load(spark, sf, "orders")
    cents = orders.select(
        F.col("o_orderpriority").alias("priority"),
        F.date_trunc("month", F.col("o_orderdate")).alias("mon"),
        (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp")).alias(
            "is_base"
        ),
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("cents"),
    )

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy("priority", "mon").agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum("cents").alias("sum_cents"),
            F.min("cents").alias("min_cents"),
            F.max("cents").alias("max_cents"),
        )

    partials = partial(cents.filter(F.col("is_base"))).unionByName(
        partial(cents.filter(~F.col("is_base")))
    )
    return partials.groupBy("priority").agg(
        F.sum("cnt").cast("bigint").alias("n_orders"),
        F.sum("sum_cents").cast("bigint").alias("total_cents"),
        F.min("min_cents").cast("bigint").alias("min_cents"),
        F.max("max_cents").cast("bigint").alias("max_cents"),
        # exact integral division (`div` on BIGINTs) — matches DuckDB's
        # `//` on positive sums; the old float-divide-then-cast could
        # drift one ulp below an integer boundary
        F.expr("sum(sum_cents) div sum(cnt)")
        .cast("bigint")
        .alias("avg_cents"),
    )


# ---------------------------------------------------------------------------
# k-core decomposition — iterative peel, oracle = unrolled peel rounds
# ---------------------------------------------------------------------------

_KCORE_K = 3
_KCORE_ORACLE_ROUNDS = 16  # unrolled peel rounds; rounds past the
# fixpoint are no-ops, so over-unrolling is harmless


def _kcore_oracle() -> str:
    rounds = []
    prev = "edges0"
    for i in range(1, _KCORE_ORACLE_ROUNDS + 1):
        rounds.append(
            f"deg{i} AS MATERIALIZED (SELECT src, count(*) AS d FROM {prev} GROUP BY 1),\n"
            f"    alive{i} AS MATERIALIZED (SELECT src FROM deg{i} WHERE d >= {_KCORE_K}),\n"
            f"    edges{i} AS MATERIALIZED (SELECT e.src, e.dst FROM {prev} e\n"
            f"      JOIN alive{i} a ON e.src = a.src\n"
            f"      JOIN alive{i} b ON e.dst = b.src)"
        )
        prev = f"edges{i}"
    body = ",\n    ".join(rounds)
    return f"""
    WITH items AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
      WHERE l_partkey < 50
    ),
    pairs AS (
      SELECT a.l_partkey AS src, b.l_partkey AS dst
      FROM items a JOIN items b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
    ),
    edges0 AS MATERIALIZED (
      SELECT src, dst FROM pairs UNION ALL SELECT dst, src FROM pairs
    ),
    {body}
    SELECT CAST(src AS BIGINT) AS id, CAST(count(*) AS BIGINT) AS degree
    FROM {prev} GROUP BY src
    """


@register(
    "kcore_parts",
    oracle=_kcore_oracle(),
    doc="graph analytics: k-core decomposition (k=3) of the co-purchase "
    "parts graph by iterative peeling — drop nodes with undirected "
    "distinct-neighbor degree < k until a fixpoint, return survivors "
    "with their within-core degree. Each round is one O(E) degree "
    "aggregation + two anti-joins; edge set shrinks monotonically and "
    "lineage is cut per round. The DuckDB oracle unrolls 16 peel rounds "
    "(rounds past the fixpoint are identity, so the unroll depth only "
    "needs to be >= the convergence count, which the Spark side checks "
    "rather than assumes).",
)
def kcore_parts(spark: SparkSession, sf: str) -> DataFrame:
    from ..graph_algos import k_core

    # cap Spark's peel rounds at the oracle's unroll depth: if peeling
    # ever needed more rounds than the oracle materializes, k_core
    # raises (loudly) instead of silently returning a deeper fixpoint
    # than the oracle's edge set reached (round-5 ADVICE).
    # +1: k_core certifies convergence by OBSERVING an empty peel set
    # at the top of the next round, so certifying a fixpoint reached in
    # exactly ORACLE_ROUNDS peels needs one look-ahead iteration
    # (round-8 review — otherwise a graph converging on the last
    # allowed round raises spuriously while the oracle is still exact)
    core = k_core(
        _copurchase_edges(spark, sf),
        k=_KCORE_K,
        max_iter=_KCORE_ORACLE_ROUNDS + 1,
    )
    return core.select(
        F.col("id").cast("bigint").alias("id"),
        F.col("degree").cast("bigint").alias("degree"),
    )


# ---------------------------------------------------------------------------
# Z-order clustering key — lakehouse layout op (Delta/Iceberg Z-ORDER)
# ---------------------------------------------------------------------------


@register(
    "zorder_layout_stats",
    oracle="""
    WITH b AS (
      SELECT o_custkey % 65536 AS x,
             date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
               % 65536 AS y
      FROM orders
    ),
    z AS (
      SELECT x, y,
             CAST(list_sum([((x >> i) & 1) << (2*i) FOR i IN range(0, 16)])
                  + list_sum([((y >> i) & 1) << (2*i + 1) FOR i IN range(0, 16)])
                  AS BIGINT) AS zval
      FROM b
    )
    SELECT zval >> 16 AS bucket,
           CAST(count(*) AS BIGINT) AS n,
           CAST(min(x) AS BIGINT) AS min_x, CAST(max(x) AS BIGINT) AS max_x,
           CAST(min(y) AS BIGINT) AS min_y, CAST(max(y) AS BIGINT) AS max_y
    FROM z GROUP BY 1
    """,
    doc="lakehouse layout: Z-order clustering key (bit-interleave of "
    "customer key and order date-day, 16 bits each) plus per-z-range "
    "bucket stats — the min/max spans per bucket are exactly the "
    "file-skipping stats a Z-ORDERed table write would produce, "
    "narrow in BOTH dimensions (the property linear clustering can't "
    "give). Pure integer bit arithmetic, exact in both engines; "
    "computing keys is a zero-shuffle map, the stats one groupBy. At "
    "scale the key feeds repartitionByRange(zval) before write so "
    "min/max pruning works for either predicate column.",
)
def zorder_layout_stats(spark: SparkSession, sf: str) -> DataFrame:
    o = load(spark, sf, "orders").select(
        (F.col("o_custkey") % 65536).cast("bigint").alias("x"),
        (
            F.datediff(F.col("o_orderdate"), F.lit("1970-01-01").cast("date"))
            % 65536
        )
        .cast("bigint")
        .alias("y"),
    )
    # closed-form bit interleave (the classic magic-number spread: 4
    # shift-or-mask rounds per coordinate) instead of a 16-iteration
    # aggregate(sequence(...)) HOF — nested Catalyst lambdas are
    # interpreted, not codegen'd, and paid ~32 per-element dispatches
    # per row (round-5 VERDICT). This form is ~10 plain integer ops
    # inside WholeStageCodegen; same zval for all x, y in [0, 65535].
    def _spread16(name: str) -> F.Column:
        c = F.col(name)
        for shift, mask in (
            (8, 0x00FF00FF),
            (4, 0x0F0F0F0F),
            (2, 0x33333333),
            (1, 0x55555555),
        ):
            c = c.bitwiseOR(F.shiftleft(c, shift)).bitwiseAND(F.lit(mask))
        return c

    z = _spread16("x").bitwiseOR(F.shiftleft(_spread16("y"), 1)).cast("bigint")
    return (
        o.withColumn("zval", z)
        .groupBy(F.shiftright(F.col("zval"), 16).alias("bucket"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.min("x").cast("bigint").alias("min_x"),
            F.max("x").cast("bigint").alias("max_x"),
            F.min("y").cast("bigint").alias("min_y"),
            F.max("y").cast("bigint").alias("max_y"),
        )
    )


# ---------------------------------------------------------------------------
# Funnel / ordered-sequence detection (CEP-lite)
# ---------------------------------------------------------------------------


@register(
    "funnel_view_click_purchase",
    oracle="""
    WITH o AS (
      SELECT user_id, ts, event_id, event_type,
             COALESCE(MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
               0) AS seen_view
      FROM events
    ),
    p AS (
      SELECT user_id, event_type,
             COALESCE(MAX(CASE WHEN event_type = 'click' AND seen_view = 1
                               THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
               0) AS view_then_click
      FROM o
    )
    SELECT user_id, CAST(count(*) AS BIGINT) AS n_funnel_purchases
    FROM p WHERE event_type = 'purchase' AND view_then_click = 1
    GROUP BY user_id
    """,
    doc="sequence detection (CEP-lite): per user, count purchases "
    "strictly preceded by a click that was itself strictly preceded by "
    "a view — the classic conversion-funnel operator, computed in one "
    "pass with two stacked running-max window flags over (ts, event_id) "
    "total order (the unique event_id tiebreak makes both engines "
    "deterministic). Windows are partitioned by user — never a global "
    "sort; state per row is two booleans, so the 100 TB form is the "
    "same two window exprs after a hash shuffle on user_id.",
)
def funnel_view_click_purchase(spark: SparkSession, sf: str) -> DataFrame:
    ev = load(spark, sf, "events").select("user_id", "ts", "event_id", "event_type")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    seen_view = F.coalesce(
        F.max(F.when(F.col("event_type") == "view", 1).otherwise(0)).over(w),
        F.lit(0),
    )
    o = ev.withColumn("seen_view", seen_view)
    view_then_click = F.coalesce(
        F.max(
            F.when(
                (F.col("event_type") == "click") & (F.col("seen_view") == 1), 1
            ).otherwise(0)
        ).over(w),
        F.lit(0),
    )
    p = o.withColumn("view_then_click", view_then_click)
    return (
        p.filter(
            (F.col("event_type") == "purchase") & (F.col("view_then_click") == 1)
        )
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_funnel_purchases"))
    )


# ---------------------------------------------------------------------------
# Cohort retention, gap-fill/LOCF, Markov transitions, distribution windows,
# decimal-exact regression aggregates, unpivot
# ---------------------------------------------------------------------------


@register(
    "retention_cohorts",
    oracle="""
    WITH first_day AS (
      SELECT user_id, CAST(min(date_trunc('day', ts)) AS DATE) AS cohort_day
      FROM events GROUP BY user_id
    ),
    activity AS (
      SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS active_day
      FROM events
    )
    SELECT f.cohort_day,
           CAST(datediff('day', f.cohort_day, a.active_day) AS INT) AS day_offset,
           CAST(count(DISTINCT a.user_id) AS BIGINT) AS n_users
    FROM activity a JOIN first_day f ON a.user_id = f.user_id
    GROUP BY f.cohort_day, day_offset
    """,
    doc="cohort retention matrix: users bucketed by first-activity day, "
    "counted on each later active day as an offset from their cohort "
    "day — the standard product-analytics retention triangle. Both "
    "sides of the self-join are keyed and aggregated on user_id first "
    "(first_day is one row per user), so the join shuffles pre-shrunk "
    "inputs and the final aggregate is (days x offsets)-sized, never "
    "event-sized; at 100 TB the only event-scale pass is the initial "
    "per-user min/distinct, both map-side combinable.",
)
def retention_cohorts(spark: SparkSession, sf: str) -> DataFrame:
    ev = load(spark, sf, "events").select(
        "user_id", F.date_trunc("day", F.col("ts")).cast("date").alias("active_day")
    )
    first_day = ev.groupBy("user_id").agg(F.min("active_day").alias("cohort_day"))
    activity = ev.distinct()
    return (
        activity.join(first_day, "user_id")
        .select(
            "cohort_day",
            F.datediff(F.col("active_day"), F.col("cohort_day")).alias("day_offset"),
            "user_id",
        )
        .groupBy("cohort_day", "day_offset")
        .agg(F.count_distinct("user_id").cast("bigint").alias("n_users"))
    )


@register(
    "gapfill_locf_hourly",
    oracle="""
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS hour,
             SUM(CAST(value AS DECIMAL(30,2))) AS hour_sum
      FROM events GROUP BY event_type, hour
    ),
    bounds AS (
      SELECT event_type, min(hour) AS mn, max(hour) AS mx
      FROM hourly GROUP BY event_type
    ),
    grid AS (
      SELECT event_type, unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS hour
      FROM bounds
    )
    SELECT g.event_type, g.hour,
           CAST(h.hour_sum IS NOT NULL AS INT) AS observed,
           CAST(last_value(h.hour_sum IGNORE NULLS)
                  OVER (PARTITION BY g.event_type ORDER BY g.hour
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS filled_sum
    FROM grid g LEFT JOIN hourly h
      ON g.event_type = h.event_type AND g.hour = h.hour
    """,
    doc="time-series gap fill + last-observation-carried-forward: build "
    "the dense hourly grid per series with sequence()/generate_series, "
    "left-join the observed hourly sums (decimal-exact), and fill holes "
    "with an IGNORE NULLS last_value window. The grid explode is "
    "map-side; the window partitions by series key, so the 100 TB form "
    "is one hash shuffle on (event_type) with per-series sorted fills — "
    "no global sort, and the grid is bounded by series x hours, not by "
    "raw events.",
)
def gapfill_locf_hourly(spark: SparkSession, sf: str) -> DataFrame:
    ev = load(spark, sf, "events")
    hourly = (
        ev.select(
            "event_type",
            F.date_trunc("hour", F.col("ts")).alias("hour"),
            F.col("value").cast("decimal(30,2)").alias("v"),
        )
        .groupBy("event_type", "hour")
        .agg(F.sum("v").alias("hour_sum"))
    )
    bounds = hourly.groupBy("event_type").agg(
        F.min("hour").alias("mn"), F.max("hour").alias("mx")
    )
    grid = bounds.select(
        "event_type",
        F.explode(F.sequence("mn", "mx", F.expr("INTERVAL 1 HOUR"))).alias("hour"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(hourly, ["event_type", "hour"], "left")
        .select(
            "event_type",
            "hour",
            F.col("hour_sum").isNotNull().cast("int").alias("observed"),
            F.last("hour_sum", ignorenulls=True)
            .over(w)
            .cast("double")
            .alias("filled_sum"),
        )
    )


@register(
    "markov_transitions",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type AS from_type,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS to_type
      FROM events
    ),
    trans AS (
      SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
      FROM seq WHERE to_type IS NOT NULL GROUP BY from_type, to_type
    )
    SELECT from_type, to_type, n,
           CAST(CAST(n AS DOUBLE)
                / CAST(SUM(n) OVER (PARTITION BY from_type) AS DOUBLE)
                AS DOUBLE) AS prob
    FROM trans
    """,
    doc="first-order Markov transition matrix over per-user event "
    "sequences: lead() within (user, time) order pairs consecutive "
    "events, counts collapse to a (states x states) matrix, and row "
    "probabilities come from a tiny window over that matrix. The only "
    "event-scale work is the per-user lead window (hash shuffle on "
    "user_id, never global); the probability division is bigint/bigint "
    "in both engines so the doubles match bit-for-bit.",
)
def markov_transitions(spark: SparkSession, sf: str) -> DataFrame:
    ev = load(spark, sf, "events").select("user_id", "ts", "event_id", "event_type")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    trans = (
        ev.select(
            F.col("event_type").alias("from_type"),
            F.lead("event_type").over(w).alias("to_type"),
        )
        .filter(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    wf = Window.partitionBy("from_type")
    return trans.select(
        "from_type",
        "to_type",
        "n",
        (F.col("n").cast("double") / F.sum("n").over(wf).cast("double"))
        .cast("double")
        .alias("prob"),
    )


@register(
    "window_percent_rank",
    oracle="""
    SELECT c_custkey, c_mktsegment,
           CAST(percent_rank() OVER (PARTITION BY c_mktsegment
                                     ORDER BY c_acctbal) AS DOUBLE) AS pr,
           CAST(cume_dist() OVER (PARTITION BY c_mktsegment
                                  ORDER BY c_acctbal) AS DOUBLE) AS cd
    FROM customer
    """,
    doc="distribution windows: percent_rank and cume_dist of account "
    "balance within market segment. Both are rational functions of "
    "(rank, n) so the doubles are identical across engines; the window "
    "partitions by segment — a hash shuffle, never a single-partition "
    "global sort.",
)
def window_percent_rank(spark: SparkSession, sf: str) -> DataFrame:
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal")
    return load(spark, sf, "customer").select(
        "c_custkey",
        "c_mktsegment",
        F.percent_rank().over(w).cast("double").alias("pr"),
        F.cume_dist().over(w).cast("double").alias("cd"),
    )


@register(
    "regression_price_acctbal",
    oracle="""
    WITH a AS (
      SELECT CAST(count(*) AS DOUBLE) AS n,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(30,2))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(c_acctbal AS DECIMAL(30,2))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))
                      * CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))
                      * CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS syy,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))
                      * CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sxy
      FROM orders JOIN customer ON o_custkey = c_custkey
    )
    SELECT CAST(n AS BIGINT) AS n,
           CAST((n * sxy - sx * sy)
                / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy))
                AS DOUBLE) AS corr_xy,
           CAST((n * sxy - sx * sy) / (n * sxx - sx * sx) AS DOUBLE) AS slope,
           CAST((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n
                AS DOUBLE) AS intercept
    FROM a
    """,
    doc="regression aggregates (corr / OLS slope / intercept) computed "
    "bit-stably: every sum runs in exact DECIMAL (order-independent), "
    "and only the final closed-form expressions touch doubles — the "
    "same IEEE expression tree on identical inputs in both engines. "
    "The native corr()/regr_slope() aggregates are order-dependent "
    "float folds and can't cross-engine hash-match; this shape can, "
    "and it's one map-side-combinable aggregate over the join at any "
    "scale.",
)
def regression_price_acctbal(spark: SparkSession, sf: str) -> DataFrame:
    orders = load(spark, sf, "orders").select("o_custkey", "o_totalprice")
    cust = load(spark, sf, "customer").select("c_custkey", "c_acctbal")
    j = orders.join(cust, orders.o_custkey == cust.c_custkey).select(
        F.col("o_totalprice").cast("decimal(18,2)").alias("x"),
        F.col("c_acctbal").cast("decimal(18,2)").alias("y"),
    )
    a = j.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(F.col("x").cast("decimal(30,2)")).cast("double").alias("sx"),
        F.sum(F.col("y").cast("decimal(30,2)")).cast("double").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("double").alias("syy"),
        F.sum(F.col("x") * F.col("y")).cast("double").alias("sxy"),
    )
    return a.select(
        F.col("n").cast("bigint").alias("n"),
        F.expr(
            "CAST((n * sxy - sx * sy)"
            " / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)) AS DOUBLE)"
        ).alias("corr_xy"),
        F.expr("CAST((n * sxy - sx * sy) / (n * sxx - sx * sx) AS DOUBLE)").alias(
            "slope"
        ),
        F.expr(
            "CAST((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n"
            " AS DOUBLE)"
        ).alias("intercept"),
    )


@register(
    "unpivot_order_metrics",
    oracle="""
    WITH m AS (
      SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
             CAST(count(*) AS BIGINT) AS n_orders,
             CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
                  AS BIGINT) AS sum_cents,
             CAST(max(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
                  AS BIGINT) AS max_cents
      FROM orders GROUP BY month
    )
    SELECT month, metric, value FROM (
      SELECT month, 'n_orders' AS metric, n_orders AS value FROM m
      UNION ALL SELECT month, 'sum_cents', sum_cents FROM m
      UNION ALL SELECT month, 'max_cents', max_cents FROM m
    )
    """,
    doc="unpivot (wide->long): monthly order metrics melted to "
    "(month, metric, value) rows with stack(); money goes through "
    "DECIMAL->cents BIGINT so every value is integer-exact. stack() is "
    "a map-side expression over the already-aggregated (months x 3) "
    "frame — the unpivot itself never touches event-scale data.",
)
def unpivot_order_metrics(spark: SparkSession, sf: str) -> DataFrame:
    cents = (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("bigint")
    m = (
        load(spark, sf, "orders")
        .select(
            F.date_trunc("month", F.col("o_orderdate")).cast("date").alias("month"),
            cents.alias("cents"),
        )
        .groupBy("month")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.sum("cents").cast("bigint").alias("sum_cents"),
            F.max("cents").cast("bigint").alias("max_cents"),
        )
    )
    return m.select(
        "month",
        F.expr(
            "stack(3, 'n_orders', n_orders, 'sum_cents', sum_cents,"
            " 'max_cents', max_cents) AS (metric, value)"
        ),
    )


# ---------------------------------------------------------------------------
# Weighted shortest path (unrolled Bellman-Ford), item-item recommender,
# order-independent table checksums
# ---------------------------------------------------------------------------


def _copurchase_weighted_edges(spark: SparkSession, sf: str) -> DataFrame:
    """Undirected co-purchase edges over parts < 50 with an integer weight:

    min over co-orders of |price difference in cents| between the two
    parts' cheapest lines in that order. All-integer so relaxation sums
    are exact in both engines.
    """
    li = (
        load(spark, sf, "lineitem")
        .filter(F.col("l_partkey") < 50)
        .select(
            "l_orderkey",
            "l_partkey",
            (F.col("l_extendedprice").cast("decimal(18,2)") * 100)
            .cast("bigint")
            .alias("cents"),
        )
        .groupBy("l_orderkey", "l_partkey")
        .agg(F.min("cents").alias("cents"))
    )
    pairs = (
        _ordered_copurchase_pairs(li)
        .groupBy(
            F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst")
        )
        .agg(F.min(F.abs(F.col("a.cents") - F.col("b.cents"))).alias("w"))
    )
    rev = pairs.select(
        F.col("dst").alias("src"), F.col("src").alias("dst"), "w"
    )
    return pairs.unionAll(rev)


_BF_EDGES_SQL = """
    li AS (
      SELECT l_orderkey, l_partkey,
             min(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT))
               AS cents
      FROM lineitem WHERE l_partkey < 50
      GROUP BY l_orderkey, l_partkey
    ),
    pairs AS (
      SELECT a.l_partkey AS src, b.l_partkey AS dst,
             CAST(min(abs(a.cents - b.cents)) AS BIGINT) AS w
      FROM li a JOIN li b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY a.l_partkey, b.l_partkey
    ),
    edges AS (
      SELECT src, dst, w FROM pairs
      UNION ALL SELECT dst AS src, src AS dst, w FROM pairs
    )
"""


@register(
    "bellman_ford_4relax",
    oracle=f"""
    WITH {_BF_EDGES_SQL},
    src0 AS (SELECT CAST(min(src) AS BIGINT) AS s FROM edges),
    d0 AS (SELECT s AS node, CAST(0 AS BIGINT) AS dist FROM src0),
    d1 AS (SELECT node, min(dist) AS dist FROM (
      SELECT node, dist FROM d0
      UNION ALL SELECT e.dst, d.dist + e.w FROM d0 d
        JOIN edges e ON d.node = e.src) GROUP BY node),
    d2 AS (SELECT node, min(dist) AS dist FROM (
      SELECT node, dist FROM d1
      UNION ALL SELECT e.dst, d.dist + e.w FROM d1 d
        JOIN edges e ON d.node = e.src) GROUP BY node),
    d3 AS (SELECT node, min(dist) AS dist FROM (
      SELECT node, dist FROM d2
      UNION ALL SELECT e.dst, d.dist + e.w FROM d2 d
        JOIN edges e ON d.node = e.src) GROUP BY node),
    d4 AS (SELECT node, min(dist) AS dist FROM (
      SELECT node, dist FROM d3
      UNION ALL SELECT e.dst, d.dist + e.w FROM d3 d
        JOIN edges e ON d.node = e.src) GROUP BY node)
    SELECT node, dist FROM d4
    """,
    doc="weighted single-source shortest path: four unrolled "
    "Bellman-Ford relaxations (paths of <= 4 edges) from the smallest "
    "part over the co-purchase graph, integer cents weights so every "
    "path sum is exact. Each relaxation is one join + min-groupBy on "
    "the frontier — the standard iterative-graph shape on Spark "
    "(edges hash-partitioned by src, distance table by node), never a "
    "driver-side loop over collected rows; the unrolled form keeps "
    "the oracle expressible as plain SQL.",
)
def bellman_ford_4relax(spark: SparkSession, sf: str) -> DataFrame:
    edges = _copurchase_weighted_edges(spark, sf).localCheckpoint()
    src = edges.agg(F.min("src").alias("node")).select(
        "node", F.lit(0).cast("bigint").alias("dist")
    )
    d = src
    for i in range(4):
        dd, ee = d.alias("d"), edges.alias("e")
        grown = dd.join(ee, F.col("d.node") == F.col("e.src")).select(
            F.col("e.dst").alias("node"),
            (F.col("d.dist") + F.col("e.w")).alias("dist"),
        )
        d = d.unionAll(grown).groupBy("node").agg(F.min("dist").alias("dist"))
        # d is referenced twice per relaxation — flatten the doubling
        # plan between rounds without a blocking job (the
        # temporal_earliest_arrival treatment, round-17)
        if i < 3:
            d = d.localCheckpoint(eager=False)
    return d


@register(
    "item_item_cosine_topk",
    oracle="""
    WITH items AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem WHERE l_partkey < 50
    ),
    n AS (SELECT l_partkey, CAST(count(*) AS BIGINT) AS n_ord
          FROM items GROUP BY l_partkey),
    co AS (
      SELECT a.l_partkey AS pa, b.l_partkey AS pb,
             CAST(count(*) AS BIGINT) AS n_co
      FROM items a JOIN items b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY a.l_partkey, b.l_partkey
    ),
    sym AS (
      SELECT pa, pb, n_co FROM co
      UNION ALL SELECT pb AS pa, pa AS pb, n_co FROM co
    ),
    scored AS (
      SELECT s.pa AS part_a, s.pb AS part_b, s.n_co,
             CAST(CAST(s.n_co AS DOUBLE)
                  / sqrt(CAST(na.n_ord * nb.n_ord AS DOUBLE)) AS DOUBLE)
               AS sim
      FROM sym s
      JOIN n na ON s.pa = na.l_partkey
      JOIN n nb ON s.pb = nb.l_partkey
    )
    SELECT part_a, part_b, n_co, sim, rn FROM (
      SELECT *, CAST(row_number() OVER (PARTITION BY part_a
                     ORDER BY sim DESC, part_b) AS INT) AS rn
      FROM scored
    ) WHERE rn <= 3
    """,
    doc="item-item collaborative filtering: cosine similarity over the "
    "order/part co-occurrence matrix (n_co / sqrt(n_a*n_b) — the "
    "integer product casts to double exactly below 2^53 and sqrt is "
    "correctly rounded, so both engines emit identical doubles), then "
    "top-3 neighbors per item via a window PARTITIONED BY item — never "
    "a global sort. The self-join is per-order and bounded by basket "
    "size; at 100 TB baskets get capped per order (same strategy as "
    "the LSH max_bucket guard) and the co-matrix shuffle carries "
    "(item, item, count) only.",
)
def item_item_cosine_topk(spark: SparkSession, sf: str) -> DataFrame:
    items = _copurchase_items(spark, sf)
    n = items.groupBy("l_partkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_ord")
    )
    co = (
        _ordered_copurchase_pairs(items)
        .groupBy(F.col("a.l_partkey").alias("pa"), F.col("b.l_partkey").alias("pb"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_co"))
    )
    sym = co.unionAll(
        co.select(F.col("pb").alias("pa"), F.col("pa").alias("pb"), "n_co")
    )
    na = n.alias("na")
    nb = n.alias("nb")
    scored = (
        sym.join(F.broadcast(na), sym.pa == F.col("na.l_partkey"))
        .join(F.broadcast(nb), sym.pb == F.col("nb.l_partkey"))
        .select(
            F.col("pa").alias("part_a"),
            F.col("pb").alias("part_b"),
            "n_co",
            (
                F.col("n_co").cast("double")
                / F.sqrt((F.col("na.n_ord") * F.col("nb.n_ord")).cast("double"))
            )
            .cast("double")
            .alias("sim"),
        )
    )
    w = Window.partitionBy("part_a").orderBy(F.desc("sim"), F.asc("part_b"))
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("int"))
        .filter(F.col("rn") <= 3)
        .select("part_a", "part_b", "n_co", "sim", "rn")
    )


@register(
    "table_checksums",
    oracle="""
    WITH c AS (
      SELECT 'customer' AS table_name, CAST(count(*) AS BIGINT) AS n_rows,
             bit_xor(CAST(concat('0x', substr(md5(concat_ws('|',
               CAST(c_custkey AS VARCHAR), c_name,
               CAST(c_nationkey AS VARCHAR), c_mktsegment,
               CAST(CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
                    AS VARCHAR))), 1, 15)) AS BIGINT)) AS checksum
      FROM customer
    ),
    p AS (
      SELECT 'part', CAST(count(*) AS BIGINT),
             bit_xor(CAST(concat('0x', substr(md5(concat_ws('|',
               CAST(p_partkey AS VARCHAR), p_name, p_brand, p_type,
               CAST(p_size AS VARCHAR),
               CAST(CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                    AS VARCHAR))), 1, 15)) AS BIGINT))
      FROM part
    ),
    s AS (
      SELECT 'supplier', CAST(count(*) AS BIGINT),
             bit_xor(CAST(concat('0x', substr(md5(concat_ws('|',
               CAST(s_suppkey AS VARCHAR), s_name,
               CAST(s_nationkey AS VARCHAR),
               CAST(CAST(CAST(s_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
                    AS VARCHAR))), 1, 15)) AS BIGINT))
      FROM supplier
    )
    SELECT * FROM c UNION ALL SELECT * FROM p UNION ALL SELECT * FROM s
    """,
    doc="order-independent table fingerprints for replica/migration "
    "verification: per row, md5 over a canonical '|'-joined rendering "
    "(ints and cents-exact money as decimal strings — never raw double "
    "repr), folded with the commutative bit_xor aggregate, so any "
    "partitioning and any row order give the same 60-bit checksum in "
    "both engines. One map-side-combinable aggregate per table — the "
    "cheapest possible full-table verification at 100 TB, and the same "
    "primitive an anti-entropy sync would diff per partition.",
)
def table_checksums(spark: SparkSession, sf: str) -> DataFrame:
    def cents_str(col: str):
        return (
            (F.col(col).cast("decimal(18,2)") * 100).cast("bigint").cast("string")
        )

    def checksum(df: DataFrame, name: str, cols: list) -> DataFrame:
        row = F.md5(F.concat_ws("|", *cols))
        hashed = df.select(
            F.conv(F.substring(row, 1, 15), 16, 10).cast("bigint").alias("_h"),
        )
        return hashed.agg(
            F.lit(name).alias("table_name"),
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.bit_xor("_h").alias("checksum"),
        )

    cust = checksum(
        load(spark, sf, "customer"),
        "customer",
        [
            F.col("c_custkey").cast("string"),
            F.col("c_name"),
            F.col("c_nationkey").cast("string"),
            F.col("c_mktsegment"),
            cents_str("c_acctbal"),
        ],
    )
    part = checksum(
        load(spark, sf, "part"),
        "part",
        [
            F.col("p_partkey").cast("string"),
            F.col("p_name"),
            F.col("p_brand"),
            F.col("p_type"),
            F.col("p_size").cast("string"),
            cents_str("p_retailprice"),
        ],
    )
    supp = checksum(
        load(spark, sf, "supplier"),
        "supplier",
        [
            F.col("s_suppkey").cast("string"),
            F.col("s_name"),
            F.col("s_nationkey").cast("string"),
            cents_str("s_acctbal"),
        ],
    )
    return cust.unionAll(part).unionAll(supp)


@register(
    "pareto_frontier_orders",
    oracle="""
    WITH pp AS (
      SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
               AS price_cents,
             max(CAST(o_orderdate AS DATE)) AS best_date
      FROM orders GROUP BY price_cents
    ),
    pm AS (
      SELECT price_cents, best_date,
             max(best_date) OVER (ORDER BY price_cents
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev
      FROM pp
    )
    SELECT price_cents, best_date FROM pm
    WHERE prev IS NULL OR best_date > prev
    """,
    doc="skyline / Pareto frontier (minimize price, maximize recency): "
    "an order is dominated if some order is both cheaper-or-equal and "
    "newer-or-equal (one strict). Classic formulation is a windowed "
    "prefix-max over the global price order — a single-partition "
    "cliff; here the per-price reduction shrinks the input to distinct "
    "prices and the strict-predecessor max runs through the two-phase "
    "range-partitioned global_running_max (local window per range "
    "partition + broadcast per-partition maxes), so no stage ever "
    "sees more than one range partition's rows. Prices are exact "
    "cents, dates compare as days.",
)
def pareto_frontier_orders(spark: SparkSession, sf: str) -> DataFrame:
    from ..ranks import global_running_max

    pp = (
        load(spark, sf, "orders")
        .groupBy(
            (F.col("o_totalprice").cast("decimal(18,2)") * 100)
            .cast("bigint")
            .alias("price_cents")
        )
        .agg(F.max(F.col("o_orderdate").cast("date")).alias("best_date"))
    )
    day = F.datediff(F.col("best_date"), F.lit("1970-01-01"))
    ranked = global_running_max(
        pp,
        [F.asc("price_cents")],
        day,
        out_col="_prev_day",
        inclusive=False,
    )
    return ranked.filter(
        F.col("_prev_day").isNull()
        | (F.datediff(F.col("best_date"), F.lit("1970-01-01")) > F.col("_prev_day"))
    ).select("price_cents", "best_date")


@register(
    "grouping_sets_revenue",
    oracle="""
    SELECT COALESCE(o_orderstatus, '(all)') AS status,
           COALESCE(o_orderpriority, '(all)') AS priority,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
                AS BIGINT) AS revenue_cents
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
    doc="GROUPING SETS (completes the rollup/cube family): one pass "
    "produces the per-status, per-priority, and grand-total aggregates "
    "— Spark expands the sets map-side and partial-aggregates before "
    "the shuffle, so the cost is one scan regardless of set count. "
    "Aggregation levels are disambiguated by COALESCE sentinels (the "
    "grouping columns are non-null here), avoiding cross-engine "
    "grouping_id bit-order differences; money is cents-exact.",
)
def grouping_sets_revenue(spark: SparkSession, sf: str) -> DataFrame:
    cents = (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("bigint")
    return (
        load(spark, sf, "orders")
        .select("o_orderstatus", "o_orderpriority", cents.alias("cents"))
        .groupingSets(
            [["o_orderstatus"], ["o_orderpriority"], []],
            "o_orderstatus",
            "o_orderpriority",
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.sum("cents").cast("bigint").alias("revenue_cents"),
        )
        .select(
            F.coalesce(F.col("o_orderstatus"), F.lit("(all)")).alias("status"),
            F.coalesce(F.col("o_orderpriority"), F.lit("(all)")).alias("priority"),
            "n_orders",
            "revenue_cents",
        )
    )


# ---------------------------------------------------------------------------
# Time-RANGE trailing windows, multiset set-ops, positional explode, binning
# ---------------------------------------------------------------------------


@register(
    "trailing_hour_range_window",
    oracle="""
    WITH e AS (
      SELECT event_id, user_id,
             CAST(floor(epoch(ts)) AS BIGINT) AS sec,
             CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      FROM events
    )
    SELECT event_id, user_id,
           CAST(count(cents) OVER w AS BIGINT) AS n_prev_hour,
           CAST(COALESCE(SUM(cents) OVER w, 0) AS BIGINT)
             AS cents_prev_hour
    FROM e
    WINDOW w AS (PARTITION BY user_id ORDER BY sec
                 RANGE BETWEEN 3600 PRECEDING AND 1 PRECEDING)
    """,
    doc="time-RANGE trailing window (the ROWS-frame entries can't "
    "express this): per event, count and cents-sum of the same user's "
    "events in the preceding hour — frame membership is by timestamp "
    "VALUE, so ties and gaps behave identically in both engines "
    "(epoch-seconds bigint order key, integer frame bounds). "
    "Partitioned by user: a hash shuffle then per-user sorted frames, "
    "no global sort; the 100 TB shape is identical.",
)
def trailing_hour_range_window(spark: SparkSession, sf: str) -> DataFrame:
    # unix_timestamp() truncates fractional seconds; the oracle must
    # truncate too (floor(epoch(ts))) — DuckDB's CAST(double AS BIGINT)
    # rounds-to-nearest, which changes RANGE-frame membership on
    # sub-second timestamps (round-5 ADVICE, reproduced at sf0.1).
    e = load(spark, sf, "events").select(
        "event_id",
        "user_id",
        F.unix_timestamp("ts").alias("sec"),
        (F.col("value").cast("decimal(18,2)") * 100).cast("bigint").alias("cents"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("sec")
        .rangeBetween(-3600, -1)
    )
    return e.select(
        "event_id",
        "user_id",
        F.count("cents").over(w).cast("bigint").alias("n_prev_hour"),
        F.coalesce(F.sum("cents").over(w), F.lit(0))
        .cast("bigint")
        .alias("cents_prev_hour"),
    )


@register(
    "except_intersect_all_priorities",
    oracle="""
    SELECT 'except_all' AS bucket, o_orderpriority FROM (
      SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'F'
      EXCEPT ALL
      SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'O'
    )
    UNION ALL
    SELECT 'intersect_all', o_orderpriority FROM (
      SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'F'
      INTERSECT ALL
      SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'O'
    )
    """,
    doc="multiset set-ops (EXCEPT ALL / INTERSECT ALL — the bag "
    "semantics the distinct variants can't express): per-copy "
    "difference and intersection of order-priority multisets between "
    "two order statuses. Spark plans both as a single aggregate "
    "counting per-side multiplicities then regenerating min/difference "
    "copies — one shuffle on the value, no join.",
)
def except_intersect_all_priorities(spark: SparkSession, sf: str) -> DataFrame:
    orders = load(spark, sf, "orders")
    f_side = orders.filter(F.col("o_orderstatus") == "F").select("o_orderpriority")
    o_side = orders.filter(F.col("o_orderstatus") == "O").select("o_orderpriority")
    ex = f_side.exceptAll(o_side).select(
        F.lit("except_all").alias("bucket"), "o_orderpriority"
    )
    it = f_side.intersectAll(o_side).select(
        F.lit("intersect_all").alias("bucket"), "o_orderpriority"
    )
    return ex.unionAll(it)


@register(
    "posexplode_tokens",
    oracle="""
    WITH ex AS (
      SELECT doc_id,
             CAST(unnest(generate_series(1, len(string_split(text, ' '))))
                  AS INT) AS pos,
             unnest(string_split(text, ' ')) AS token
      FROM documents WHERE doc_id < 50
    )
    SELECT doc_id, pos, token FROM ex WHERE token <> ''
    """,
    doc="positional explode: tokens with their 1-based position "
    "(posexplode / UNNEST WITH ORDINALITY) — order-preserving "
    "flattening, the primitive under n-gram windows and span "
    "reconstruction. Pure map-side generate, no shuffle.",
)
def posexplode_tokens(spark: SparkSession, sf: str) -> DataFrame:
    return (
        load(spark, sf, "documents")
        .filter(F.col("doc_id") < 50)
        .select(
            "doc_id",
            F.posexplode(F.split(F.col("text"), " ")).alias("pos0", "token"),
        )
        .filter(F.col("token") != "")
        .select(
            "doc_id", (F.col("pos0") + 1).cast("int").alias("pos"), "token"
        )
    )


@register(
    "histogram_totalprice",
    oracle="""
    WITH b AS (
      SELECT CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                  // 5000000 AS BIGINT) AS bucket,
             CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
               AS cents
      FROM orders
    )
    SELECT bucket, CAST(count(*) AS BIGINT) AS n,
           CAST(min(cents) AS BIGINT) AS min_cents,
           CAST(max(cents) AS BIGINT) AS max_cents
    FROM b GROUP BY bucket
    """,
    doc="equi-width histogram binning on exact cents ($50k buckets): "
    "integer floor-division bucketing (no float edges, so bucket "
    "membership can never disagree across engines) + per-bucket "
    "count/min/max — one map-side-combinable aggregate, output "
    "bounded by bucket count.",
)
def histogram_totalprice(spark: SparkSession, sf: str) -> DataFrame:
    cents = (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("bigint")
    return (
        load(spark, sf, "orders")
        .select(
            F.expr(
                "CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
                " div 5000000 AS BIGINT)"
            ).alias("bucket"),
            cents.alias("cents"),
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.min("cents").cast("bigint").alias("min_cents"),
            F.max("cents").cast("bigint").alias("max_cents"),
        )
    )


@register(
    "zscore_outlier_events",
    oracle="""
    WITH e AS (
      SELECT event_id, event_type,
             CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      FROM events
    ),
    s AS (
      SELECT event_type,
             CAST(count(*) AS DOUBLE) AS n,
             CAST(SUM(cents) AS DOUBLE) AS sx,
             CAST(SUM(cents * cents) AS DOUBLE) AS sxx
      FROM e GROUP BY event_type
    )
    SELECT e.event_id, e.event_type, e.cents,
           CAST((CAST(e.cents AS DOUBLE) - sx / n)
                / sqrt(sxx / n - (sx / n) * (sx / n)) AS DOUBLE) AS z
    FROM e JOIN s ON e.event_type = s.event_type
    WHERE abs(CAST(e.cents AS DOUBLE) - sx / n)
          > 3 * sqrt(sxx / n - (sx / n) * (sx / n))
    """,
    doc="anomaly detection: per-event-type z-score outliers (|x-mean| > "
    "3 sigma). Moments accumulate as exact integer cents sums (order-"
    "independent), and mean/sigma/z are the same IEEE expression tree "
    "on identical inputs in both engines — the only cross-engine-"
    "stable way to do float anomaly thresholds. One map-side-"
    "combinable agg to group-count moments, broadcast back, pure map "
    "filter: the event stream shuffles zero times at any scale.",
)
def zscore_outlier_events(spark: SparkSession, sf: str) -> DataFrame:
    e = load(spark, sf, "events").select(
        "event_id",
        "event_type",
        (F.col("value").cast("decimal(18,2)") * 100).cast("bigint").alias("cents"),
    )
    s = e.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("cents").cast("double").alias("sx"),
        F.sum(F.col("cents") * F.col("cents")).cast("double").alias("sxx"),
    )
    j = e.join(F.broadcast(s), "event_type")
    mean = F.expr("sx / n")
    sigma = F.expr("sqrt(sxx / n - (sx / n) * (sx / n))")
    z = ((F.col("cents").cast("double") - mean) / sigma).cast("double")
    return (
        j.filter(F.abs(F.col("cents").cast("double") - mean) > 3 * sigma)
        .select("event_id", "event_type", "cents", z.alias("z"))
    )


@register(
    "nearest_click_join",
    oracle="""
    WITH purchases AS (
      SELECT event_id, user_id, epoch_us(ts) AS tus FROM events
      WHERE event_type = 'purchase'
    ),
    clicks AS (
      SELECT user_id, event_id AS click_id, epoch_us(ts) AS cus FROM events
      WHERE event_type = 'click'
    ),
    ranked AS (
      SELECT p.event_id, p.user_id, c.click_id,
             CASE WHEN c.cus <= p.tus THEN p.tus - c.cus
                  ELSE c.cus - p.tus END AS abs_gap_us,
             CASE WHEN c.cus <= p.tus THEN 'backward'
                  ELSE 'forward' END AS direction,
             row_number() OVER (
               PARTITION BY p.event_id
               ORDER BY CASE WHEN c.cus <= p.tus THEN p.tus - c.cus
                             ELSE c.cus - p.tus END,
                        CASE WHEN c.cus <= p.tus THEN 0 ELSE 1 END,
                        CASE WHEN c.cus <= p.tus THEN -c.click_id
                             ELSE c.click_id END) AS rn
      FROM purchases p JOIN clicks c ON p.user_id = c.user_id
    )
    SELECT event_id, user_id, click_id,
           CAST(abs_gap_us AS BIGINT) AS abs_gap_us, direction
    FROM ranked WHERE rn = 1
    """,
    doc="bidirectional nearest-event join (the symmetric completion of "
    "the backward-only as-of join): each purchase pairs with its "
    "closest click in EITHER direction — backward wins gap ties, "
    "click_id breaks same-instant ties deterministically (max for "
    "backward = last carried, min for forward = first following). "
    "Spark side is the union+two-directional-window form: one hash "
    "shuffle on user_id, two per-user sorted passes, never the "
    "oracle's per-user cross product — the 100 TB cost is the as-of "
    "join's, doubled.",
)
def nearest_click_join(spark: SparkSession, sf: str) -> DataFrame:
    ev = load(spark, sf, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.lit(1).alias("is_purchase"),
        "event_id",
        F.lit(None).cast("bigint").alias("click_id"),
        F.lit(None).cast("timestamp").alias("click_ts"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        F.lit(0).alias("is_purchase"),
        F.lit(None).cast("bigint").alias("event_id"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    tagged = purchases.unionByName(clicks)
    # same-instant clicks sort before the purchase (is_purchase asc) so
    # they land in the backward frame with gap 0; click_id asc makes
    # last()=max id backward and first()=min id forward deterministic
    order = [
        F.asc("ts"),
        F.asc("is_purchase"),
        F.asc_nulls_first("click_id"),
    ]
    w_back = (
        Window.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_fwd = (
        Window.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(1, Window.unboundedFollowing)
    )
    carried = (
        tagged.withColumn("bk_id", F.last("click_id", ignorenulls=True).over(w_back))
        .withColumn("bk_ts", F.last("click_ts", ignorenulls=True).over(w_back))
        .withColumn("fw_id", F.first("click_id", ignorenulls=True).over(w_fwd))
        .withColumn("fw_ts", F.first("click_ts", ignorenulls=True).over(w_fwd))
        .filter(F.col("is_purchase") == 1)
    )
    gap_b = F.unix_micros(F.col("ts")) - F.unix_micros(F.col("bk_ts"))
    gap_f = F.unix_micros(F.col("fw_ts")) - F.unix_micros(F.col("ts"))
    use_back = F.col("bk_id").isNotNull() & (
        F.col("fw_id").isNull() | (gap_b <= gap_f)
    )
    return (
        carried.filter(F.col("bk_id").isNotNull() | F.col("fw_id").isNotNull())
        .select(
            "event_id",
            "user_id",
            F.when(use_back, F.col("bk_id")).otherwise(F.col("fw_id")).alias(
                "click_id"
            ),
            F.when(use_back, gap_b).otherwise(gap_f).cast("bigint").alias(
                "abs_gap_us"
            ),
            F.when(use_back, F.lit("backward"))
            .otherwise(F.lit("forward"))
            .alias("direction"),
        )
    )


@register(
    "point_in_time_join",
    oracle="""
    WITH ordered AS (
      SELECT user_id, event_type, ts,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_type) AS prev_type
      FROM events
    ),
    changes AS (
      SELECT user_id, event_type, ts FROM ordered
      WHERE prev_type IS NULL OR event_type <> prev_type
    ),
    versions AS (
      SELECT user_id, event_type AS state, ts AS valid_from,
             lead(ts) OVER (
               PARTITION BY user_id ORDER BY ts, event_type) AS valid_to
      FROM changes
    ),
    probes AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    )
    SELECT p.event_id, p.user_id, v.state,
           CAST(epoch_us(p.ts) - epoch_us(v.valid_from) AS BIGINT)
             AS in_state_us
    FROM probes p JOIN versions v
      ON p.user_id = v.user_id
     AND v.valid_from <= p.ts
     AND (v.valid_to IS NULL OR p.ts < v.valid_to)
    """,
    doc="point-in-time join (feature-store correctness primitive): each "
    "purchase joins the SCD2 state version valid at its event time — "
    "no leakage from future versions. The oracle is the textbook "
    "inequality join; the Spark side is the union+carry form: version "
    "begin-markers and probe events interleave per user ordered by "
    "(ts, marker-first), one last() window carries the active state — "
    "a single user_id shuffle, no inequality join, no per-user cross "
    "product. Markers sort before probes at the same instant, which "
    "reproduces valid_from <= ts inclusivity and makes zero-length "
    "versions (two state changes at one timestamp) resolve to the "
    "later version exactly like the ts < valid_to predicate.",
)
def point_in_time_join(spark: SparkSession, sf: str) -> DataFrame:
    ev = load(spark, sf, "events")
    w_lag = Window.partitionBy("user_id").orderBy("ts", "event_type")
    changes = (
        ev.select(
            "user_id",
            "ts",
            "event_type",
            F.lag("event_type").over(w_lag).alias("prev_type"),
        )
        .filter(
            F.col("prev_type").isNull()
            | (F.col("event_type") != F.col("prev_type"))
        )
    )
    markers = changes.select(
        "user_id",
        "ts",
        F.lit(0).alias("is_probe"),
        F.lit(None).cast("bigint").alias("event_id"),
        F.col("event_type").alias("state"),
        F.col("ts").alias("state_from"),
    )
    probes = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.lit(1).alias("is_probe"),
        "event_id",
        F.lit(None).cast("string").alias("state"),
        F.lit(None).cast("timestamp").alias("state_from"),
    )
    # markers first at equal ts; among same-instant markers the larger
    # state sorts last and wins the carry — matching the oracle's
    # zero-length-version elimination via ts < valid_to
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_probe", F.asc_nulls_last("state"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = (
        markers.unionByName(probes)
        .withColumn("cur_state", F.last("state", ignorenulls=True).over(w))
        .withColumn(
            "cur_from", F.last("state_from", ignorenulls=True).over(w)
        )
        .filter((F.col("is_probe") == 1) & F.col("cur_state").isNotNull())
    )
    return carried.select(
        "event_id",
        "user_id",
        F.col("cur_state").alias("state"),
        (F.unix_micros(F.col("ts")) - F.unix_micros(F.col("cur_from")))
        .cast("bigint")
        .alias("in_state_us"),
    )


# ---------------------------------------------------------------------------
# SCD1 last-writer-wins upsert — the complement of the reference's MERGE
# ---------------------------------------------------------------------------


@register(
    "scd1_upsert_documents",
    oracle="""
    WITH updates AS (
      SELECT doc_id, text || ' v2' AS text
      FROM documents WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) = 'b'
      UNION ALL
      SELECT doc_id + 1000000, text
      FROM documents WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) = 'c'
    ),
    kept AS (
      SELECT d.doc_id, d.text FROM documents d
      WHERE NOT EXISTS (SELECT 1 FROM updates u WHERE u.doc_id = d.doc_id)
    ),
    merged AS (SELECT * FROM kept UNION ALL SELECT * FROM updates)
    SELECT doc_id, md5(text) AS content_hash FROM merged
    """,
    doc="D8 complement: SCD1 (last-writer-wins) upsert — matched keys "
    "take the UPDATE version, unlike merge_into's keep-existing "
    "(the reference's MERGE ... ON CREATE SET, graph.py:221-236); "
    "together they cover both MERGE semantics a warehouse needs. "
    "Update batch derived deterministically (md5 bucket 'b' edited, "
    "'c' inserted under new ids); the existing side survives through "
    "a key-only anti-join (the shuffle carries keys, never documents) "
    "and the result is verified row-level by content hash.",
)
def scd1_upsert_documents(spark: SparkSession, sf: str) -> DataFrame:
    from ..ingest.upserts import upsert_into

    docs = load(spark, sf, "documents").select("doc_id", "text")
    h = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
    updates = (
        docs.filter(h == "b")
        .select("doc_id", F.concat(F.col("text"), F.lit(" v2")).alias("text"))
        .unionByName(
            docs.filter(h == "c").select(
                (F.col("doc_id") + 1000000).alias("doc_id"), "text"
            )
        )
    )
    merged = upsert_into(docs, updates, ["doc_id"])
    return merged.select("doc_id", F.md5("text").alias("content_hash"))


# ---------------------------------------------------------------------------
# Temporal split — leakage-free train/eval cutoff on the time axis
# ---------------------------------------------------------------------------


@register(
    "temporal_split_cutoff",
    oracle="""
    WITH b AS (
      SELECT CAST(min(epoch_us(ts)) AS BIGINT) AS lo,
             CAST(max(epoch_us(ts)) AS BIGINT) AS hi
      FROM events
    )
    SELECT CASE WHEN epoch_us(ts) <= lo + ((hi - lo) * 9) // 10
                THEN 'train' ELSE 'eval' END AS split,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events CROSS JOIN b
    GROUP BY 1
    """,
    doc="training-pipeline temporal split: events at or before 90% of "
    "the corpus time RANGE go to train, later ones to eval — the "
    "leakage-free split for temporal data (a random split lets the "
    "model see the future). The cutoff is integer microsecond "
    "arithmetic from two scalar aggregates (min/max ts, broadcast "
    "back), so unlike a row-quantile cutoff it needs no global sort "
    "or rank at any scale; the classification is a pure map.",
)
def temporal_split_cutoff(spark: SparkSession, sf: str) -> DataFrame:
    ev = load(spark, sf, "events")
    b = ev.agg(
        F.min(F.unix_micros("ts")).cast("bigint").alias("lo"),
        F.max(F.unix_micros("ts")).cast("bigint").alias("hi"),
    )
    j = ev.crossJoin(F.broadcast(b))
    split = F.when(
        F.unix_micros("ts")
        <= F.col("lo") + F.expr("((hi - lo) * 9) div 10"),
        "train",
    ).otherwise("eval")
    return (
        j.select(split.alias("split"), "user_id")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.count_distinct("user_id").cast("bigint").alias("n_users"),
        )
    )


# ---------------------------------------------------------------------------
# Month-over-month growth — period-comparison analytics
# ---------------------------------------------------------------------------


@register(
    "mom_revenue_growth",
    oracle="""
    WITH m AS (
      SELECT CAST(year(o_orderdate) * 100 + month(o_orderdate) AS INT)
               AS ym,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(30,2)) * 100)
                  AS BIGINT) AS rev_cents
      FROM orders GROUP BY 1
    )
    SELECT ym, rev_cents,
           lag(rev_cents) OVER (ORDER BY ym) AS prev_cents,
           CASE WHEN lag(rev_cents) OVER (ORDER BY ym) IS NULL THEN NULL
                ELSE CAST(((rev_cents - lag(rev_cents) OVER (ORDER BY ym))
                           * 10000) // lag(rev_cents) OVER (ORDER BY ym)
                          AS BIGINT) END AS growth_bps
    FROM m
    """,
    doc="period-over-period analytics: month-over-month revenue growth "
    "in integer basis points (revenue accumulated as exact cents, "
    "growth via integer division — no float drift between engines). "
    "The global-ordered lag window runs over MONTH-grain rows — at "
    "most a few hundred at any corpus size — so the 'unpartitioned "
    "window' cliff does not apply: the aggregation reduced the data "
    "to calendar cardinality first, the standard shape for all "
    "period-comparison dashboards.",
)
def mom_revenue_growth(spark: SparkSession, sf: str) -> DataFrame:
    m = (
        load(spark, sf, "orders")
        .groupBy(
            (F.year("o_orderdate") * 100 + F.month("o_orderdate"))
            .cast("int")
            .alias("ym")
        )
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(30,2)") * 100)
            .cast("bigint")
            .alias("rev_cents")
        )
    )
    w = Window.orderBy("ym")
    prev = F.lag("rev_cents").over(w)
    return m.select(
        "ym",
        "rev_cents",
        prev.alias("prev_cents"),
        F.when(prev.isNull(), F.lit(None).cast("bigint"))
        .otherwise(
            F.expr(
                "((rev_cents - lag(rev_cents) over (order by ym)) * 10000)"
                " div lag(rev_cents) over (order by ym)"
            )
        )
        .alias("growth_bps"),
    )


# ---------------------------------------------------------------------------
# CDC changelog apply — materialize final state from an ordered op log
# ---------------------------------------------------------------------------


@register(
    "cdc_apply_changelog",
    oracle="""
    WITH log AS (
      SELECT user_id,
             CASE WHEN event_type = 'purchase' THEN 'D' ELSE 'U' END AS op,
             CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
             ts, event_id
      FROM events
    ),
    latest AS (
      SELECT user_id, op, cents,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM log
    )
    SELECT user_id, cents AS last_cents
    FROM latest WHERE rn = 1 AND op = 'U'
    """,
    doc="data-ops: CDC changelog apply — materialize the final state of "
    "a keyed table from an ordered upsert/delete op log (here derived "
    "deterministically from events: purchases delete the key, "
    "everything else upserts its value in exact cents). The general "
    "pattern behind every CDC sink: one key-partitioned window takes "
    "the LAST op per key by (ts, unique-id) — total order per key, so "
    "replays are idempotent — then delete ops drop out. One shuffle on "
    "the key; at 100 TB the log is processed partition-parallel and "
    "the window never sees more than one key's ops. Complements "
    "scd1_upsert_documents (batch upsert, no ordering/deletes) and "
    "scd2_user_state (full history retention).",
)
def cdc_apply_changelog(spark: SparkSession, sf: str) -> DataFrame:
    ev = load(spark, sf, "events").select(
        "user_id",
        F.when(F.col("event_type") == "purchase", "D").otherwise("U").alias("op"),
        (F.col("value").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("cents"),
        "ts",
        "event_id",
    )
    w = Window.partitionBy("user_id").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("op") == "U"))
        .select("user_id", F.col("cents").alias("last_cents"))
    )


# ---------------------------------------------------------------------------
# Column profiling — the data-quality report every ingestion gate runs
# ---------------------------------------------------------------------------

_PROFILE_COLS = (
    "o_orderkey",
    "o_custkey",
    "o_orderstatus",
    "o_orderpriority",
)


@register(
    "profile_orders_columns",
    oracle="""
    SELECT 'o_orderkey' AS column_name,
           CAST(count(*) - count(o_orderkey) AS BIGINT) AS n_null,
           CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_distinct
    FROM orders
    UNION ALL
    SELECT 'o_custkey', CAST(count(*) - count(o_custkey) AS BIGINT),
           CAST(count(DISTINCT o_custkey) AS BIGINT) FROM orders
    UNION ALL
    SELECT 'o_orderstatus', CAST(count(*) - count(o_orderstatus) AS BIGINT),
           CAST(count(DISTINCT o_orderstatus) AS BIGINT) FROM orders
    UNION ALL
    SELECT 'o_orderpriority',
           CAST(count(*) - count(o_orderpriority) AS BIGINT),
           CAST(count(DISTINCT o_orderpriority) AS BIGINT) FROM orders
    """,
    doc="data-ops: per-column profiling (null count + exact distinct "
    "cardinality) — the report every ingestion gate and schema-drift "
    "monitor runs before data is admitted. All four column profiles "
    "compute in ONE pass over the scan (a single aggregate with four "
    "count-distinct branches, each expanded by Spark into the standard "
    "partial-distinct plan), then unpivot to (column, stats) rows "
    "driver-side — the scan is never repeated per column, which is "
    "the difference between a profiling job that reads 100 TB once "
    "and one that reads it per column. At extreme cardinalities swap "
    "exact distinct for approx_count_distinct (the sketch entries "
    "document the trade).",
)
def profile_orders_columns(spark: SparkSession, sf: str) -> DataFrame:
    orders = load(spark, sf, "orders")
    aggs = []
    for c in _PROFILE_COLS:
        aggs.append(
            (F.count(F.lit(1)) - F.count(F.col(c))).cast("bigint").alias(f"{c}__null")
        )
        aggs.append(F.count_distinct(F.col(c)).cast("bigint").alias(f"{c}__dist"))
    one = orders.agg(*aggs)
    stack_expr = ", ".join(
        f"'{c}', {c}__null, {c}__dist" for c in _PROFILE_COLS
    )
    return one.select(
        F.expr(
            f"stack({len(_PROFILE_COLS)}, {stack_expr}) "
            "AS (column_name, n_null, n_distinct)"
        )
    )


@register(
    "histogram_quantiles_priority",
    oracle="""
    WITH b AS (
      SELECT o_orderpriority AS prio,
             CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      FROM orders
    ),
    h AS (
      SELECT prio,
             cents // 5000000 AS bucket,
             CAST(count(*) AS BIGINT) AS n,
             CAST(max(cents) AS BIGINT) AS bmax
      FROM b GROUP BY prio, cents // 5000000
    ),
    c AS (
      SELECT *, SUM(n) OVER (PARTITION BY prio ORDER BY bucket) AS cum
      FROM h
    ),
    t AS (SELECT prio, CAST(SUM(n) AS BIGINT) AS total FROM h GROUP BY prio),
    p AS (SELECT unnest([50, 95, 99]) AS pct),
    j AS (
      SELECT c.prio, c.bucket, c.bmax, c.cum, p.pct,
             (t.total * p.pct + 99) // 100 AS target
      FROM c JOIN t USING (prio) CROSS JOIN p
    )
    SELECT prio AS o_orderpriority,
           CAST(pct AS INT) AS pct,
           CAST(min(bucket) AS BIGINT) AS est_bucket,
           CAST(arg_min(bmax, bucket) AS BIGINT) AS est_max_cents
    FROM j WHERE cum >= target
    GROUP BY prio, pct
    """,
    doc="approximate quantiles with FULL cross-engine value parity — "
    "the portable complement of approx_quantiles_value (whose "
    "engine-native sketch is rows-only by design): per order "
    "priority, build the exact-cents equi-width histogram "
    "(histogram_totalprice's integer bucketing — membership can never "
    "disagree across engines), cumulative-sum the BOUNDED bucket "
    "table, and read p50/p95/p99 as the first bucket whose cumulative "
    "count reaches ceil(p·total) (integer target arithmetic), "
    "reporting that bucket and its observed max-cents as the "
    "estimate. Every quantity is an exact integer, so the DuckDB "
    "oracle recomputes readout AND state bit-for-bit; tests assert "
    "the estimate brackets the exact sort-based percentile. At "
    "100 TB: one map-side-combinable aggregate over the data, then a "
    "window over ~120 BUCKETS per group — the global sort an exact "
    "percentile needs never happens; two-pass refinement (re-bucket "
    "inside the answer bucket) converges to exact cents in O(log "
    "range) passes of the same shape.",
)
def histogram_quantiles_priority(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    cents = (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("bigint")
    b = load(spark, sf, "orders").select(
        F.col("o_orderpriority").alias("prio"), cents.alias("cents")
    )
    h = (
        b.withColumn("bucket", F.expr("cents div 5000000"))
        .groupBy("prio", "bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.max("cents").cast("bigint").alias("bmax"),
        )
    )
    # the window runs over the HISTOGRAM (<= ~120 buckets per group),
    # never the raw rows — that is the whole point of the sketch
    c = h.withColumn(
        "cum", F.sum("n").over(Window.partitionBy("prio").orderBy("bucket"))
    )
    t = h.groupBy("prio").agg(F.sum("n").cast("bigint").alias("total"))
    p = local_rel(spark, [(50,), (95,), (99,)], "pct int")
    j = (
        c.join(F.broadcast(t), "prio")
        .crossJoin(F.broadcast(p))
        .withColumn("target", F.expr("(total * pct + 99) div 100"))
        .filter(F.col("cum") >= F.col("target"))
    )
    return j.groupBy("prio", "pct").agg(
        F.min("bucket").cast("bigint").alias("est_bucket"),
        F.min_by("bmax", "bucket").cast("bigint").alias("est_max_cents"),
    ).select(
        F.col("prio").alias("o_orderpriority"),
        F.col("pct").cast("int").alias("pct"),
        "est_bucket",
        "est_max_cents",
    )


@register(
    "exact_percentile_multipass",
    oracle="""
    WITH b AS (
      SELECT o_orderpriority AS prio,
             CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      FROM orders WHERE o_totalprice IS NOT NULL
    ),
    r AS (
      SELECT prio, cents,
             row_number() OVER (PARTITION BY prio ORDER BY cents) AS rn,
             count(*) OVER (PARTITION BY prio) AS n
      FROM b
    )
    SELECT prio AS o_orderpriority,
           CAST(cents AS BIGINT) AS p95_cents
    FROM r WHERE rn = (n * 95 + 99) // 100
    """,
    doc="EXACT distributed percentile WITHOUT a global sort (round 8; "
    "the refinement pass histogram_quantiles_priority's doc promises): "
    "per order priority, the exact ceil-rank p95 of the cents column "
    "is found by iterative histogram refinement — each pass buckets "
    "the per-group candidate range into <=1024 equi-width integer "
    "buckets (one map-side-combinable aggregate, candidate-range "
    "filter pushed to the scan), the driver walks the <=1024-row "
    "result to locate the bucket containing the target rank, and the "
    "range narrows 1024x per pass, so O(log_1024(range)) ~ 3 passes "
    "pinpoint the exact value. The raw rows NEVER shuffle and the "
    "driver only ever sees bucket counts — the classic "
    "selection-by-partition algorithm expressed Spark-first. The "
    "oracle is the straightforward rank window, so the driver gate "
    "value-verifies exactness, not an approximation.",
)
def exact_percentile_multipass(spark: SparkSession, sf: str) -> DataFrame:
    # kernel factored to pipeline/percentiles.py in round 11 so the
    # robust-stats entries (median/MAD) reuse the same refinement loop
    from ..pipeline.percentiles import exact_group_rank_value

    cents = (F.col("o_totalprice").cast("decimal(18,2)") * 100).cast("bigint")
    b = (
        load(spark, sf, "orders")
        # symmetric with the kernel's NULL exclusion: the oracle's rank
        # window must never count un-priced rows either
        .filter(F.col("o_totalprice").isNotNull())
        .select(F.col("o_orderpriority").alias("prio"), cents.alias("cents"))
    )
    answers = exact_group_rank_value(b, "prio", "cents", 95)
    return local_rel(
        spark,
        sorted((p, v) for p, v in answers.items()),
        "o_orderpriority string, p95_cents long",
    )


@register(
    "dynamic_partition_pruning_join",
    oracle="""
    WITH sel AS (
      SELECT DISTINCT event_type FROM events
      WHERE substr(md5(event_type), 1, 1) <= '7'
    )
    SELECT e.event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(SUM(CAST(value AS DECIMAL(30,3))) AS DOUBLE) AS sum_value
    FROM events e JOIN sel USING (event_type)
    GROUP BY e.event_type
    """,
    doc="DYNAMIC partition pruning (round 8; the runtime complement of "
    "partitioned_scan_pruning's static I2 exhibit): the fact side is "
    "the events table staged partitionBy(event_type), the dim side is "
    "a small staged (event_type, tag) table, and the QUERY's only "
    "filter is on the dim attribute (tag = md5 prefix — deliberately "
    "not derivable from the join key by constraint propagation, which "
    "would degrade this to static pruning). Catalyst inserts a "
    "dynamicpruning subquery into the fact scan's PartitionFilters "
    "(SubqueryAdaptiveBroadcast reusing the dim broadcast — "
    "plan-asserted in tests/test_plans.py), so the fact reads ONLY "
    "the partitions the filtered dim selects, discovered at RUNTIME. "
    "At 100 TB this is the star-schema workhorse: partition-eliminate "
    "a fact table by any dim predicate without materializing "
    "per-predicate layouts.",
)
def dynamic_partition_pruning_join(spark: SparkSession, sf: str) -> DataFrame:
    import os

    from .catalog import fingerprint_stage_dir

    stage = _stage_events_by_type(spark, sf)
    dim_dir = fingerprint_stage_dir(
        os.path.join(sf, "events.parquet"), "event_type_dim"
    )
    if not os.path.exists(os.path.join(dim_dir, "_SUCCESS")):
        load(spark, sf, "events").select("event_type").distinct().select(
            "event_type", F.substring(F.md5("event_type"), 1, 1).alias("tag")
        ).coalesce(1).write.mode("overwrite").parquet(dim_dir)
    fact = spark.read.parquet(stage)
    sel = spark.read.parquet(dim_dir).filter(F.col("tag") <= "7")
    return (
        fact.join(sel, "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.col("value").cast("decimal(30,3)"))
            .cast("double")
            .alias("sum_value"),
        )
    )


def _lpa_round_sql(prev: str) -> str:
    """One unrolled synchronous-LPA round as a DuckDB CTE body: every
    node adopts its neighbors' most frequent label, smallest label on
    ties — the exact tie-break label_propagation uses."""
    return f"""
      SELECT id, label FROM (
        SELECT id, label,
               row_number() OVER (
                 PARTITION BY id ORDER BY cnt DESC, label ASC
               ) AS rn
        FROM (
          SELECT e.dst AS id, l.label, count(*) AS cnt
          FROM edges e JOIN {prev} l ON e.src = l.id
          GROUP BY 1, 2
        )
      ) WHERE rn = 1
    """


@register(
    "label_propagation_parts",
    oracle=f"""
    WITH edges AS ({_COPURCHASE_EDGES_SQL}),
    l0 AS (SELECT DISTINCT src AS id, src AS label FROM edges),
    l1 AS ({_lpa_round_sql("l0")}),
    l2 AS ({_lpa_round_sql("l1")}),
    l3 AS ({_lpa_round_sql("l2")})
    SELECT CAST(id AS BIGINT) AS id, CAST(label AS BIGINT) AS community
    FROM l3
    """,
    doc="graph analytics: COMMUNITY DETECTION by deterministic "
    "synchronous label propagation over the co-purchase parts graph "
    "(VERDICT r9 #7; graph_algos.label_propagation). Unlike "
    "connected_components_parts (pure reachability), LPA's most-"
    "frequent-neighbor-label rule splits a connected graph into "
    "densely-linked communities; the min-label tie-break makes the "
    "synchronous variant a pure function of the edge set, so the "
    "DuckDB oracle unrolls the 3 fixed rounds as CTEs and replays "
    "every label exactly (integer labels, integer counts — the "
    "bfs_hop_distance_parts technique). Scale: per round one "
    "edges-to-labels shuffle join + per-node window top-1; state is "
    "O(nodes), the edge list never mutates. Convergence behavior "
    "unit-tested on a two-clique bridge graph in tests/test_graph_algos.py.",
)
def label_propagation_parts(spark: SparkSession, sf: str) -> DataFrame:
    from ..graph_algos import label_propagation

    return label_propagation(_copurchase_edges(spark, sf), rounds=3).select(
        F.col("id").cast("bigint").alias("id"),
        F.col("label").cast("bigint").alias("community"),
    )


@register(
    "aggregate_messages_parts",
    oracle="""
    WITH items AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
      WHERE l_partkey < 50
    ),
    edges AS (  -- DIRECTED low->high pairs: aggregate_messages receives
                -- the one-directional edge list and addresses a message
                -- to EACH endpoint itself, so the symmetric union here
                -- would double every message
      SELECT a.l_partkey AS src, b.l_partkey AS dst
      FROM items a JOIN items b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
    ),
    prices AS (SELECT p_partkey AS id, p_retailprice FROM part),
    msgs AS (
      -- msg_to_src: the neighbor's (dst's) retail price, addressed to src;
      -- msg_to_dst: the src's retail price, addressed to dst
      SELECT e.src AS id,
             CAST(pd.p_retailprice AS DECIMAL(30,2)) AS msg
      FROM edges e JOIN prices pd ON e.dst = pd.id
      UNION ALL
      SELECT e.dst AS id,
             CAST(ps.p_retailprice AS DECIMAL(30,2)) AS msg
      FROM edges e JOIN prices ps ON e.src = ps.id
    )
    SELECT CAST(id AS BIGINT) AS id,
           CAST(count(*) AS BIGINT) AS n_msgs,
           CAST(SUM(msg) AS DOUBLE) AS sum_neighbor_price
    FROM msgs GROUP BY id
    """,
    doc="GraphFrames API parity, part 2 (g.find was part 1, SURVEY "
    "§1.3): the aggregateMessages primitive — triplet view (src/edge/"
    "dst structs), per-edge message expressions addressed to either "
    "endpoint, one per-vertex aggregation "
    "(graph_algos.aggregate_messages). This entry sends each "
    "co-purchase neighbor's retail price to both endpoints and "
    "aggregates count + decimal-exact sum per part — the building "
    "block GraphFrames users write custom vertex analytics with. "
    "Scale: two vertex-attr joins (broadcastable), map-side "
    "message eval, one id-keyed shuffle with partial aggregation. "
    "Value-verified: the DuckDB oracle replays both message legs as "
    "UNION ALL + GROUP BY with the same DECIMAL(30,2) per-message "
    "casts.",
)
def aggregate_messages_parts(spark: SparkSession, sf: str) -> DataFrame:
    from ..graph_algos import aggregate_messages

    vertices = load(spark, sf, "part").select(
        F.col("p_partkey").alias("id"), F.col("p_retailprice")
    )
    return aggregate_messages(
        vertices,
        _copurchase_edges(spark, sf),
        msg_to_src=F.col("dst.p_retailprice").cast("decimal(30,2)"),
        msg_to_dst=F.col("src.p_retailprice").cast("decimal(30,2)"),
        aggs=[
            F.count(F.lit(1)).cast("bigint").alias("n_msgs"),
            F.sum("msg").cast("double").alias("sum_neighbor_price"),
        ],
    ).select(
        F.col("id").cast("bigint").alias("id"), "n_msgs", "sum_neighbor_price"
    )
