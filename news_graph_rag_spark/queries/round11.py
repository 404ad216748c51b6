"""Round-11 catalog extensions.

Graph: exact directed SCC (reachability-doubling closure), its
condensation DAG, longest-path layering (max-plus doubling), and
Cypher variable-length traversal with min-hop tags. Time series /
stats/ML: IEEE-exact truncated EWMA (batch + the watermark-ordered
streaming twin), integer Lloyd k-means, robust median/MAD outliers on
the factored multipass selection kernel, and a batch-perceptron
training loop with bit-replayable rounds. Text: bigram-LM familiarity
scoring. Streaming: stream-stream FULL OUTER interval join.
Multimodal: integer audio sample-rate normalization.

Position in the pinned ``_ROUND_MODULES`` order (queries/__init__.py)
keeps the driver's first-50 registry prefix — pinned by
tests/test_docs_synced.py::test_driver_first50_prefix_pinned — from
ever shifting; new rounds append their own module instead of growing
this one (round-12 reorg of the former ``extras.py``).

Determinism per catalog.py's rules: integer labels/counts everywhere
except ewma_user_value, which is deliberately IEEE-exact (dyadic
weights — every product is an exponent shift, every sum is evaluated
in the same textual left-associative order in Spark and DuckDB; the
same bit-for-bit technique as embed_documents' oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..localrel import local_rel
from .catalog import load, register, spread

# ---------------------------------------------------------------------------
# Exact SCC over a directed part-sequence graph
# ---------------------------------------------------------------------------

# Directed edges: consecutive lineitems within an order (line n → line
# n+1) over partkey-mod-48 nodes, sparsified with pure integer
# arithmetic (portable across engines, no hash functions): forward
# (src<dst) edges keep 1-in-4, back edges 1-in-97 — a layered DAG with
# rare back-edges, i.e. a graph with one ~10-node cyclic core plus
# singleton SCCs at every test SF (verified against Tarjan in
# tests/test_graph_algos.py).
_SEQ_EDGES_SQL = """
      SELECT DISTINCT (a.l_partkey % 48) AS src, (b.l_partkey % 48) AS dst
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND b.l_linenumber = a.l_linenumber + 1
      WHERE (a.l_partkey % 48) <> (b.l_partkey % 48)
        AND (((a.l_partkey % 48) < (b.l_partkey % 48)
              AND ((a.l_partkey % 48) * 31 + (b.l_partkey % 48)) % 4 = 0)
          OR ((a.l_partkey % 48) > (b.l_partkey % 48)
              AND ((a.l_partkey % 48) * 31 + (b.l_partkey % 48)) % 97 = 0))
"""


def _part_transitions(spark: SparkSession, sf: str) -> DataFrame:
    """Consecutive-lineitem part transitions (l_orderkey, src, dst) over
    partkey-mod-48 nodes, self-pairs removed — the ONE scaffold every
    derived graph (static sparsified, temporal month-stamped) filters
    from (round-11 review: the self-join shape was pasted per entry,
    so a change to the node space or the chaining rule could silently
    diverge the oracle-backed graphs)."""
    li = load(spark, sf, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_partkey"
    )
    a = li.select(
        "l_orderkey",
        F.col("l_linenumber").alias("ln"),
        (F.col("l_partkey") % 48).alias("src"),
    )
    b = li.select(
        "l_orderkey",
        F.col("l_linenumber").alias("ln1"),
        (F.col("l_partkey") % 48).alias("dst"),
    )
    return (
        a.join(b, (a.l_orderkey == b.l_orderkey) & (b.ln1 == a.ln + 1))
        .filter(F.col("src") != F.col("dst"))
        .select(a["l_orderkey"].alias("l_orderkey"), "src", "dst")
    )


def _seq_edges(spark: SparkSession, sf: str) -> DataFrame:
    s, d = F.col("src"), F.col("dst")
    return (
        _part_transitions(spark, sf)
        .filter(
            ((s < d) & ((s * 31 + d) % 4 == 0))
            | ((s > d) & ((s * 31 + d) % 97 == 0))
        )
        .select("src", "dst")
        .distinct()
    )


def _staged(spark: SparkSession, sf: str, kind: str, build) -> DataFrame:
    """Fingerprint-staged derived table (the retrieval_ppr_expand
    staging discipline that was the r9 verdict's #1 perf win, applied
    to the graph family in round 12): ``build()`` runs only on a cold
    stage for this (lineitem fingerprint, kind); every later consumer
    — across entries AND processes — reads the tiny staged parquet.
    ``kind`` must encode the derivation's parameters (node space,
    sparsifier, doubling count): bumping it on any change is what
    keeps a stale staged copy from silently serving the old graph.
    Publishes via catalog.stage_parquet (build tmp, atomic rename) so
    two concurrent cold builders can never tear the directory."""
    import os

    from .catalog import stage_parquet

    stage = stage_parquet(
        os.path.join(sf, "lineitem.parquet"),
        kind,
        lambda tmp: build().coalesce(1).write.mode("overwrite").parquet(tmp),
    )
    return spark.read.parquet(stage)


def _staged_seq_edges(spark: SparkSession, sf: str) -> DataFrame:
    """The sparsified directed part graph (src, dst), staged once per
    dataset fingerprint: four catalog entries (SCC, condensation, DAG
    layers, var-length traversal) consume the same ~10²-row edge list,
    and each used to re-run the lineitem self-join to rebuild it."""
    return _staged(
        spark, sf, "sccedges48v1", lambda: _seq_edges(spark, sf)
    )


def _staged_scc_labels(spark: SparkSession, sf: str) -> DataFrame:
    """(id, scc_id) of the sparsified part graph, staged once per
    dataset fingerprint: the 6-round reachability-doubling closure is
    the dominant cost of THREE catalog entries (scc_parts_directed,
    scc_condensation_parts, dag_layers_parts — ~3 s each at sf0.1),
    and the labels they derive are byte-identical. The closure now
    runs once per dataset; the entries read a ≤48-row parquet. The
    oracle gate still replays the full closure in SQL per entry, so
    staging can never mask a wrong label."""

    def build() -> DataFrame:
        from ..graph_algos import strongly_connected_components

        return strongly_connected_components(
            _staged_seq_edges(spark, sf), doublings=6
        )

    return _staged(spark, sf, "scclabels48d6v1", build)


def _tc_double_sql(prev: str) -> str:
    """One reachability-doubling round as a DuckDB CTE body.

    MATERIALIZED is load-bearing: each round references the previous
    relation twice (compose + carry), so DuckDB's default CTE inlining
    would re-expand the base lineitem self-join 2^rounds times.
    """
    return f"""MATERIALIZED (
      SELECT u, w FROM (
        SELECT a.u AS u, b.w AS w FROM {prev} a JOIN {prev} b ON a.w = b.u
        UNION SELECT u, w FROM {prev}
      ))"""


@register(
    "scc_parts_directed",
    oracle=f"""
    WITH edges AS MATERIALIZED ({_SEQ_EDGES_SQL}),
    nodes AS (SELECT DISTINCT src AS id FROM edges
              UNION SELECT DISTINCT dst FROM edges),
    r0 AS MATERIALIZED (SELECT src AS u, dst AS w FROM edges
                        UNION SELECT id AS u, id AS w FROM nodes),
    r1 AS {_tc_double_sql("r0")}, r2 AS {_tc_double_sql("r1")},
    r3 AS {_tc_double_sql("r2")}, r4 AS {_tc_double_sql("r3")},
    r5 AS {_tc_double_sql("r4")}, r6 AS {_tc_double_sql("r5")}
    SELECT CAST(f.u AS BIGINT) AS id, CAST(MIN(f.w) AS BIGINT) AS scc_id
    FROM r6 f JOIN r6 b ON f.u = b.w AND f.w = b.u
    GROUP BY f.u
    """,
    doc="graph analytics: EXACT strongly connected components over a "
    "DIRECTED graph — the piece the undirected family (CC, LPA, "
    "k-core) can't express, since weak connectivity ignores edge "
    "direction. Edges are consecutive-lineitem part transitions "
    "(line n → line n+1 within an order, partkey mod 48), sparsified "
    "by integer arithmetic into a layered DAG with rare back-edges so "
    "the SCC structure is non-trivial (one ~10-node cyclic core + "
    "singletons, Tarjan-verified in tests/test_graph_algos.py). "
    "Algorithm: reachability-doubling transitive closure (6 unrolled "
    "squarings cover paths ≤ 64 edges ≥ the 47-node simple-path "
    "bound; fixpoint asserted in tests), then scc_id(v) = min{u : "
    "v→u ∧ u→v} via one swapped-pair self-join of the closure. The "
    "DuckDB oracle replays the identical unrolling with MATERIALIZED "
    "CTEs (each round references the previous twice — inlining would "
    "re-expand the base join exponentially). Scale: exact closure is "
    "O(n²) pairs, the right tool for bounded subgraphs (entity cores, "
    "lineage condensations); the billion-node path is FW-BW/trim "
    "recursion whose per-round shape is LPA's edges⋈labels join — "
    "documented in graph_algos.strongly_connected_components. Round "
    "12: the closure-derived labels are STAGED per dataset "
    "fingerprint (_staged_scc_labels — the retrieval_ppr_expand "
    "staging discipline): three entries consume byte-identical "
    "labels, so the closure runs once per dataset instead of once "
    "per entry; the oracle still replays the full closure in SQL, so "
    "staging can never mask a wrong label.",
)
def scc_parts_directed(spark: SparkSession, sf: str) -> DataFrame:
    return _staged_scc_labels(spark, sf).select(
        F.col("id").cast("bigint").alias("id"),
        F.col("scc_id").cast("bigint").alias("scc_id"),
    )


# ---------------------------------------------------------------------------
# IEEE-exact truncated EWMA over per-user event streams
# ---------------------------------------------------------------------------

# dyadic weights 2^-1 .. 2^-8 — ONE definition (streaming/stateful.py's
# floats; round-11 review: a second hand-written literal list could
# silently diverge from the streaming twin). repr() of a dyadic double
# is its exact shortest decimal, which both engines parse back to the
# identical double; multiplication by it is an exponent shift (exact),
# so the only rounding is the shared-order additions.
from ..streaming.stateful import EWMA_WEIGHTS as _EWMA_WEIGHT_FLOATS

_EWMA_WEIGHTS = [repr(w) for w in _EWMA_WEIGHT_FLOATS]


def _ewma_oracle() -> str:
    lags = [
        f"LAG(value, {i}) OVER "
        "(PARTITION BY user_id ORDER BY ts, event_id)"
        if i
        else "value"
        for i in range(len(_EWMA_WEIGHTS))
    ]
    num = " + ".join(
        f"COALESCE(({lag}) * {w}, 0.0)"
        for lag, w in zip(lags, _EWMA_WEIGHTS)
    )
    den = " + ".join(
        f"CASE WHEN ({lag}) IS NOT NULL THEN {w} ELSE 0.0 END"
        for lag, w in zip(lags, _EWMA_WEIGHTS)
    )
    return f"""
    WITH scored AS (
      SELECT event_id, user_id,
             ({num}) AS num, ({den}) AS den
      FROM events WHERE ts IS NOT NULL
    )
    SELECT CAST(event_id AS BIGINT) AS event_id,
           CAST(user_id AS BIGINT) AS user_id,
           CASE WHEN den > 0.0 THEN num / den END AS ewma
    FROM scored WHERE user_id % 50 = 0
    """


@register(
    "ewma_user_value",
    oracle=_ewma_oracle(),
    doc="windowed time-series: truncated exponentially-weighted moving "
    "average of event value per user (weights 2^-1..2^-8 over the 8 "
    "most recent events, renormalized by the weight mass actually "
    "present — the standard warm-up correction). Deliberately "
    "IEEE-exact rather than decimal-cast: every weight is dyadic, so "
    "each product only shifts the exponent, and numerator/denominator "
    "sums are written in the same left-associative textual order in "
    "the Spark Column expression and the DuckDB SQL — both engines "
    "round identically at every step (the embed_documents bit-for-bit "
    "technique; NULL values drop out of both sums symmetrically). "
    "Plan: one shuffle on user_id for the lag window (total order "
    "ts+event_id inside each partition), everything else map-side; "
    "the user_id%50 output filter is a partition-key predicate, so "
    "Catalyst pushes it BELOW the window into the scan (plan-asserted "
    "in tests/test_plans.py) — at 100 TB the window state is 8 rows "
    "per user and the scan reads only the selected users' rows.",
)
def ewma_user_value(spark: SparkSession, sf: str) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lags = [
        F.col("value") if i == 0 else F.lag("value", i).over(w)
        for i in range(len(_EWMA_WEIGHTS))
    ]
    num = None
    den = None
    for lag, wt in zip(lags, _EWMA_WEIGHTS):
        t = F.coalesce(lag * F.lit(float(wt)), F.lit(0.0))
        p = F.when(lag.isNotNull(), F.lit(float(wt))).otherwise(F.lit(0.0))
        num = t if num is None else num + t
        den = p if den is None else den + p
    return (
        load(spark, sf, "events")
        # NULL-ts rows are excluded SYMMETRICALLY: Spark windows order
        # NULLS FIRST, DuckDB NULLS LAST — a NULL timestamp would give
        # the two engines different lag sequences for the whole user
        .filter(F.col("ts").isNotNull())
        .select(
            F.col("event_id").cast("bigint").alias("event_id"),
            F.col("user_id").cast("bigint").alias("user_id"),
            num.alias("num"),
            den.alias("den"),
        )
        .filter(F.col("user_id") % 50 == 0)
        .select(
            "event_id",
            "user_id",
            F.when(F.col("den") > 0.0, F.col("num") / F.col("den")).alias(
                "ewma"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Integer Lloyd k-means (1-D, fixed iterations) on order totals
# ---------------------------------------------------------------------------


def _assign_sql(pts: str, cent: str, out: str) -> str:
    return f"""{out} AS (
      SELECT k, x, cid FROM (
        SELECT p.k, p.x, c.cid,
               row_number() OVER (
                 PARTITION BY p.k ORDER BY abs(p.x - c.c), c.cid
               ) AS rn
        FROM {pts} p CROSS JOIN {cent} c
      ) WHERE rn = 1
    )"""


def _update_sql(cent: str, assign: str, gout: str, out: str) -> str:
    return f"""{gout} AS (
      SELECT cid, CAST(SUM(x) AS BIGINT) AS s, CAST(count(*) AS BIGINT) AS n
      FROM {assign} GROUP BY 1
    ),
    {out} AS (
      SELECT {cent}.cid,
             CASE WHEN {gout}.n IS NOT NULL THEN {gout}.s // {gout}.n
                  ELSE {cent}.c END AS c
      FROM {cent} LEFT JOIN {gout} ON {gout}.cid = {cent}.cid
    )"""


@register(
    "kmeans_1d_totalprice",
    oracle=f"""
    WITH pts AS (
      SELECT o_orderkey AS k,
             CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS x
      FROM orders WHERE o_totalprice IS NOT NULL
    ),
    b AS (SELECT MIN(x) AS mn, MAX(x) AS mx FROM pts),
    c0 AS (
      SELECT CAST(t.i AS BIGINT) AS cid,
             mn + ((mx - mn) * t.i) // 3 AS c
      FROM b CROSS JOIN (VALUES (0), (1), (2), (3)) t(i)
    ),
    {_assign_sql("pts", "c0", "a1")},
    {_update_sql("c0", "a1", "g1", "c1")},
    {_assign_sql("pts", "c1", "a2")},
    {_update_sql("c1", "a2", "g2", "c2")}
    SELECT CAST(c2.cid AS BIGINT) AS cid,
           CAST(c2.c AS BIGINT) AS centroid,
           CAST(COALESCE(g2.n, 0) AS BIGINT) AS n_points
    FROM c2 LEFT JOIN g2 ON g2.cid = c2.cid
    """,
    doc="clustering: Lloyd k-means (k=4, 2 fixed iterations) on order "
    "totals in INTEGER cent space — the same algorithm the ANN IVF "
    "index trains its coarse quantizer with, here as a value-verified "
    "catalog entry (the float build jobs were demoted in r9 precisely "
    "because IEEE mean reductions can't hash-match; integer cents + "
    "floor-division means make every centroid exactly replayable). "
    "Deterministic everywhere: init = min + (max-min)·i/3 integer "
    "arithmetic, assignment = argmin |x-c| with centroid-id "
    "tie-break (row_number), update = SUM div COUNT floor division, "
    "empty clusters keep their previous centroid. Plan per iteration: "
    "the k centroids are pivoted to ONE wide row and broadcast, the "
    "argmin is a map-side array_min over (dist, cid) structs — the "
    "point set is NEVER shuffled or sorted for assignment (the naive "
    "per-point row_number would hash-exchange points×k rows per "
    "iteration; plan-asserted shuffle-free in tests/test_plans.py) — "
    "and the update is one k-group aggregation with map-side "
    "partials. The classic Lloyd-on-MapReduce shape that scales "
    "linearly in points; no collect anywhere, centroids stay a "
    "DataFrame end-to-end.",
)
def kmeans_1d_totalprice(spark: SparkSession, sf: str) -> DataFrame:
    K = 4
    # un-priced rows are excluded symmetrically (a NULL distance would
    # otherwise ride on engine-specific NULL ordering in the argmin)
    pts = (
        load(spark, sf, "orders")
        .filter(F.col("o_totalprice").isNotNull())
        .select(
            F.col("o_orderkey").alias("k"),
            F.floor(F.col("o_totalprice") * 100).cast("bigint").alias("x"),
        )
    )
    bounds = pts.agg(F.min("x").alias("mn"), F.max("x").alias("mx"))
    cent = (
        spark.range(K)
        .select(F.col("id").cast("bigint").alias("cid"))
        .crossJoin(F.broadcast(bounds))
        .select(
            "cid",
            F.expr(f"mn + ((mx - mn) * cid) div {K - 1}").alias("c"),
        )
    )

    def wide(c: DataFrame) -> DataFrame:
        # pivot the k centroids to ONE row so assignment can broadcast
        # a single row and stay entirely map-side
        return c.agg(
            *[
                F.max(F.when(F.col("cid") == i, F.col("c"))).alias(f"c{i}")
                for i in range(K)
            ]
        )

    def assign(cw: DataFrame) -> DataFrame:
        # map-side argmin: array_min over (dist, cid) structs — struct
        # ordering is lexicographic, so equidistant points break ties
        # toward the smaller centroid id, same as the oracle's
        # row_number ORDER BY abs(x-c), cid
        cands = F.array(
            *[
                F.struct(
                    F.abs(F.col("x") - F.col(f"c{i}")).alias("d"),
                    F.lit(i).cast("bigint").alias("cid"),
                )
                for i in range(K)
            ]
        )
        return pts.crossJoin(F.broadcast(cw)).select(
            "k", "x", F.array_min(cands).getField("cid").alias("cid")
        )

    def update(c: DataFrame, a: DataFrame) -> tuple[DataFrame, DataFrame]:
        g = a.groupBy("cid").agg(
            F.sum("x").cast("bigint").alias("s"),
            F.count(F.lit(1)).cast("bigint").alias("n"),
        )
        nxt = (
            c.join(g, "cid", "left")
            .select(
                "cid",
                F.when(
                    F.col("n").isNotNull(), F.expr("s div n")
                )
                .otherwise(F.col("c"))
                .alias("c"),
            )
        )
        return nxt, g

    a1 = assign(wide(cent))
    c1, _ = update(cent, a1)
    a2 = assign(wide(c1))
    c2, g2 = update(c1, a2)
    return (
        c2.join(g2, "cid", "left")
        .select(
            F.col("cid").cast("bigint").alias("cid"),
            F.col("c").cast("bigint").alias("centroid"),
            F.coalesce(F.col("n"), F.lit(0)).cast("bigint").alias("n_points"),
        )
    )


# ---------------------------------------------------------------------------
# Bigram-LM familiarity scoring (CCNet-style quality signal)
# ---------------------------------------------------------------------------


@register(
    "lm_bigram_familiarity",
    oracle="""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
    db AS (
      SELECT doc_id, b AS bigram
      FROM (SELECT doc_id,
                   CASE WHEN len(ts) >= 2
                        THEN [ts[i] || ' ' || ts[i+1]
                              FOR i IN range(1, len(ts))]
                        ELSE [] END AS bs
            FROM toks) t,
           unnest(t.bs) AS u(b)
    ),
    corpus AS (
      SELECT bigram, CAST(count(*) AS BIGINT) AS c FROM db GROUP BY 1
    ),
    scored AS (
      SELECT d.doc_id,
             CAST(count(*) AS BIGINT) AS n_bigrams,
             CAST(SUM(corpus.c) AS BIGINT) AS familiarity
      FROM db d JOIN corpus ON corpus.bigram = d.bigram
      GROUP BY 1
    )
    SELECT CAST(doc.doc_id AS BIGINT) AS doc_id,
           CAST(COALESCE(s.n_bigrams, 0) AS BIGINT) AS n_bigrams,
           CAST(COALESCE(s.familiarity, 0) AS BIGINT) AS familiarity
    FROM documents doc LEFT JOIN scored s ON s.doc_id = doc.doc_id
    """,
    doc="text analysis: corpus-LM familiarity scoring — the integer "
    "core of CCNet-style perplexity filtering (Wenzek et al. 2020): "
    "train a bigram count model over the corpus, score every document "
    "by the summed corpus frequency of its own bigrams (high = "
    "boilerplate/common register, low = rare or noisy text; the "
    "log-space perplexity is a monotone map of these counts that "
    "downstream thresholds can apply). Bigrams are built map-side "
    "from each doc's token array (same whitespace tokenizer as "
    "tfidf/pmi — no token-table self-join); the count model is one "
    "groupBy; scoring is one join keyed on the bigram string with "
    "map-side partial aggregation back to doc_id; docs with <2 tokens "
    "(or NULL text) score 0 via the final left join. Scale: the "
    "count table is vocabulary²-bounded and heavy-tailed — at 100 TB "
    "broadcast the top-K head and shuffle only the tail (the "
    "salted_skew_join pattern), or feature-hash the bigram key to "
    "fixed width; per-doc output keeps the result linear in docs.",
)
def lm_bigram_familiarity(spark: SparkSession, sf: str) -> DataFrame:
    docs = spread(load(spark, sf, "documents"))
    toks = docs.select("doc_id", F.split(F.col("text"), " ").alias("ts"))
    bigs = F.when(
        F.size("ts") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size("ts") - 1),
            lambda i: F.concat_ws(
                " ", F.element_at("ts", i), F.element_at("ts", i + 1)
            ),
        ),
    )  # no otherwise: null/short → explode emits nothing (oracle: ELSE [])
    db = toks.select("doc_id", F.explode(bigs).alias("bigram"))
    corpus = db.groupBy("bigram").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    scored = (
        db.join(corpus, "bigram")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
            F.sum("c").cast("bigint").alias("familiarity"),
        )
    )
    return (
        docs.select("doc_id")
        .join(scored, "doc_id", "left")
        .select(
            F.col("doc_id").cast("bigint").alias("doc_id"),
            F.coalesce(F.col("n_bigrams"), F.lit(0))
            .cast("bigint")
            .alias("n_bigrams"),
            F.coalesce(F.col("familiarity"), F.lit(0))
            .cast("bigint")
            .alias("familiarity"),
        )
    )


# ---------------------------------------------------------------------------
# SCC condensation DAG
# ---------------------------------------------------------------------------


def _condensed_edge_rows(spark: SparkSession, sf: str) -> DataFrame:
    """Original directed edges annotated with their endpoints' SCC ids,
    intra-SCC edges removed — ONE construction shared by the
    condensation entry (group for multiplicities), the DAG-layering
    entry (distinct pairs), and the fixpoint test (round-11 review:
    three hand-maintained copies had crept in). Round 12: both inputs
    come from the fingerprint-staged tables — the closure and the
    edge self-join run once per dataset, not once per entry."""
    edges = _staged_seq_edges(spark, sf)
    scc = _staged_scc_labels(spark, sf)
    s1 = scc.select(F.col("id").alias("src"), F.col("scc_id").alias("src_scc"))
    s2 = scc.select(F.col("id").alias("dst"), F.col("scc_id").alias("dst_scc"))
    return (
        edges.join(s1, "src")
        .join(s2, "dst")
        .filter(F.col("src_scc") != F.col("dst_scc"))
    )


@register(
    "scc_condensation_parts",
    oracle=f"""
    WITH edges AS MATERIALIZED ({_SEQ_EDGES_SQL}),
    nodes AS (SELECT DISTINCT src AS id FROM edges
              UNION SELECT DISTINCT dst FROM edges),
    r0 AS MATERIALIZED (SELECT src AS u, dst AS w FROM edges
                        UNION SELECT id AS u, id AS w FROM nodes),
    r1 AS {_tc_double_sql("r0")}, r2 AS {_tc_double_sql("r1")},
    r3 AS {_tc_double_sql("r2")}, r4 AS {_tc_double_sql("r3")},
    r5 AS {_tc_double_sql("r4")}, r6 AS {_tc_double_sql("r5")},
    scc AS (
      SELECT f.u AS id, MIN(f.w) AS scc_id
      FROM r6 f JOIN r6 b ON f.u = b.w AND f.w = b.u
      GROUP BY f.u
    )
    SELECT CAST(s1.scc_id AS BIGINT) AS src_scc,
           CAST(s2.scc_id AS BIGINT) AS dst_scc,
           CAST(count(*) AS BIGINT) AS n_edges
    FROM edges e
    JOIN scc s1 ON e.src = s1.id
    JOIN scc s2 ON e.dst = s2.id
    WHERE s1.scc_id <> s2.scc_id
    GROUP BY 1, 2
    """,
    doc="graph analytics: the CONDENSATION of the directed part graph "
    "— collapse every SCC to one node and emit the inter-SCC edges "
    "with their multiplicities (how many original transitions cross "
    "each condensed edge). The condensation of any digraph is a DAG "
    "(acyclicity asserted via Tarjan in tests/test_graph_algos.py) — "
    "the structure cycle-sensitive downstream passes (topological "
    "scheduling, longest-path criticality, lineage ordering) actually "
    "run on. Plan: the SCC labels join back onto the edge list twice "
    "(node-sized label table — AQE broadcasts while it fits) and one "
    "(src_scc, dst_scc) aggregation with map-side partials; the "
    "closure cost is shared with scc_parts_directed's analysis. The "
    "oracle replays the same closure + label joins in SQL.",
)
def scc_condensation_parts(spark: SparkSession, sf: str) -> DataFrame:
    return (
        _condensed_edge_rows(spark, sf)
        .groupBy("src_scc", "dst_scc")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_edges"))
        .select(
            F.col("src_scc").cast("bigint").alias("src_scc"),
            F.col("dst_scc").cast("bigint").alias("dst_scc"),
            "n_edges",
        )
    )


# ---------------------------------------------------------------------------
# Robust outliers: median / MAD via the exact multipass selection kernel
# ---------------------------------------------------------------------------


@register(
    "mad_outlier_events",
    oracle="""
    WITH b AS (
      SELECT event_type AS k,
             CAST(FLOOR(value * 1000000) AS BIGINT) AS x
      FROM events WHERE value IS NOT NULL
    ),
    r AS (
      SELECT k, x,
             row_number() OVER (PARTITION BY k ORDER BY x) AS rn,
             count(*) OVER (PARTITION BY k) AS n
      FROM b
    ),
    med AS (SELECT k, x AS med FROM r WHERE rn = (n * 50 + 99) // 100),
    d AS (
      SELECT b.k, abs(b.x - med.med) AS dev, med.med AS med
      FROM b JOIN med ON b.k = med.k
    ),
    r2 AS (
      SELECT k, dev,
             row_number() OVER (PARTITION BY k ORDER BY dev) AS rn,
             count(*) OVER (PARTITION BY k) AS n
      FROM d
    ),
    mad AS (SELECT k, dev AS mad FROM r2 WHERE rn = (n * 50 + 99) // 100)
    SELECT d.k AS event_type,
           CAST(MIN(d.med) AS BIGINT) AS median_micros,
           CAST(MIN(mad.mad) AS BIGINT) AS mad_micros,
           CAST(count(*) FILTER (WHERE d.dev > 3 * mad.mad) AS BIGINT)
             AS n_outliers
    FROM d JOIN mad ON d.k = mad.k
    GROUP BY 1
    """,
    doc="robust statistics: median/MAD outlier detection per event "
    "type — the robust complement of zscore_outlier_events (mean/"
    "stddev break down exactly when outliers are present; median and "
    "median-absolute-deviation have a 50% breakdown point). Values "
    "are scaled to integer micro-units (FLOOR(value*1e6) — identical "
    "IEEE multiply+floor in both engines), both medians are lower "
    "ceil-rank medians (rank ⌈n/2⌉ — deterministic under ties), and "
    "the outlier rule dev > 3·MAD is an integer comparison. Spark "
    "side: TWO invocations of the factored multipass selection kernel "
    "(pipeline/percentiles.py — per pass one map-side-combinable "
    "≤1024-bucket histogram per group, candidate range pushed to the "
    "scan, raw rows never sort or shuffle; the same kernel "
    "exact_percentile_multipass value-verifies), then one broadcast "
    "join + conditional agg. The oracle is the straightforward rank "
    "window, so the gate verifies exactness of the whole "
    "median→MAD→flag chain. At 100 TB: O(log₁₀₂₄ range) scans per "
    "selection and a 5-row broadcast — no per-group global sort "
    "(few-types groups make a partition-sorted window a skew cliff).",
)
def mad_outlier_events(spark: SparkSession, sf: str) -> DataFrame:
    from ..pipeline.percentiles import exact_group_rank_value

    # ONE materialization of the (k, x) projection feeds every pass
    # (round-17 optimization; the kernel used to persist per call, so
    # the MAD call and the final readout each re-derived their input
    # from the parquet scan — three scans of events per invocation).
    # The medians/MADs come back as driver dicts either way, so the
    # broadcast-join lookup is replaced by a literal CASE (same inner
    # join semantics: keys are exactly b's non-null groups) and the
    # ≤|event_type| result rows are computed eagerly so the caches can
    # be dropped before returning — no block-manager leak per call.
    b = (
        load(spark, sf, "events")
        .filter(F.col("value").isNotNull() & F.col("event_type").isNotNull())
        .select(
            F.col("event_type").alias("k"),
            F.floor(F.col("value") * 1000000).cast("bigint").alias("x"),
        )
        .persist()
    )
    try:
        med = exact_group_rank_value(b, "k", "x", 50, persisted=True)
        if not med:  # no non-null rows: same empty frame the join gave
            return local_rel(
                spark,
                [],
                "event_type string, median_micros bigint, "
                "mad_micros bigint, n_outliers bigint",
            )

        def lookup(mapping: dict) -> F.Column:
            expr = None
            for key, val in sorted(mapping.items()):
                cond = F.col("k") == F.lit(key)
                expr = (
                    F.when(cond, F.lit(val))
                    if expr is None
                    else expr.when(cond, F.lit(val))
                )
            return expr.cast("bigint")

        d = b.filter(
            F.col("k").isin([k for k in sorted(med)])
        ).select(
            "k",
            lookup(med).alias("med"),
            F.abs(F.col("x") - lookup(med)).alias("dev"),
        ).persist()
        try:
            mad = exact_group_rank_value(d, "k", "dev", 50, persisted=True)
            rows = (
                d.select("k", "med", "dev", lookup(mad).alias("mad"))
                .groupBy("k")
                .agg(
                    F.min("med").cast("bigint").alias("median_micros"),
                    F.min("mad").cast("bigint").alias("mad_micros"),
                    F.sum(
                        F.when(F.col("dev") > 3 * F.col("mad"), 1).otherwise(0)
                    )
                    .cast("bigint")
                    .alias("n_outliers"),
                )
                .collect()
            )
        finally:
            d.unpersist()
    finally:
        b.unpersist()
    out = sorted(
        (
            r["k"],
            int(r["median_micros"]),
            int(r["mad_micros"]),
            int(r["n_outliers"]),
        )
        for r in rows
    )
    return local_rel(
        spark,
        out,
        "event_type string, median_micros bigint, mad_micros bigint, "
        "n_outliers bigint",
    )


# ---------------------------------------------------------------------------
# Streaming EWMA: watermark-ordered stateful replay of the batch window
# ---------------------------------------------------------------------------


_EWMA_WM_MINUTES = 10  # watermark delay — shared by the replay contract
_EWMA_STRAG_MINUTES = 5  # straggler margin; must stay < the delay
_EWMA_SENT_DAYS = (10, 20)  # flush-sentinel offsets past max real ts

# END-OF-STREAM FLUSH CONTRACT, checked at IMPORT (round-13 review
# pass 2: inside the cold-build closure it never ran on machines with
# a warm staged dir): sentinel #1 must advance the watermark strictly
# past every real event (release is strictly below the watermark), and
# stragglers must be in-watermark late, not watermark-late. These are
# the constants the stream is built from — changing one without the
# others fails every import, warm stage or not (the staged fingerprint
# does NOT cover these constants; bump the staging kind when changing
# them).
assert _EWMA_SENT_DAYS[0] * 24 * 60 > _EWMA_WM_MINUTES, (
    "flush sentinel #1 must exceed max real event time + delay"
)
assert _EWMA_STRAG_MINUTES < _EWMA_WM_MINUTES, (
    "stragglers must arrive within the watermark delay"
)


@register(
    "streaming_ewma_users",
    oracle=_ewma_oracle(),
    doc="Structured Streaming: per-event truncated EWMA via a custom "
    "WATERMARK-ORDERED stateful operator (applyInPandasWithState, "
    "streaming/stateful.py:stateful_ewma) — lag-window semantics that "
    "Spark's built-in streaming windows cannot express (no N-ROWS "
    "look-back across micro-batches, and eager emission is wrong "
    "under out-of-order arrival). Rows buffer per user until the "
    "event-time watermark guarantees nothing older can arrive, then "
    "emit in exact event-time order against a persistent ≤7-value "
    "tail; state = bounded buffer + O(1) tail per key. The replay "
    "stages THREE chronological arrival phases with deliberate "
    "cross-batch stragglers (in-watermark late rows from phase 1 "
    "carried into phase 2's batch — the structure under test) plus "
    "two far-future flush sentinels; sentinel #1 shares phase 3's "
    "staged file (the interval-join grouping trick, round-12 verdict "
    "#4: the watermark it advances applies in the NEXT batch either "
    "way, so 4 micro-batches replay emission-identically to the old "
    "5) — and the oracle "
    "is the SAME batch lag-window SQL as ewma_user_value, so the "
    "driver gate verifies the streaming emission equals the batch "
    "window BIT-FOR-BIT on doubles (the strongest claim a stateful "
    "streaming operator can make; the dyadic-weight determinism "
    "carries over because the fold's Python floats are IEEE doubles "
    "evaluated in the same order).",
)
def streaming_ewma_users(spark: SparkSession, sf: str) -> DataFrame:
    from ..streaming.stateful import stateful_ewma
    from .python_ops import (
        _SENTINEL_USER,
        _replay_shuffle_partitions,
        _stage_ordered_batches,
    )

    events = (
        load(spark, sf, "events")
        .filter((F.col("user_id") % 50 == 0) & F.col("ts").isNotNull())
        .select("event_id", "ts", "user_id", "value")
    )

    def with_batches():
        import datetime as dt

        lo, hi = events.agg(F.min("ts"), F.max("ts")).first()
        third = (hi - lo) / 3
        t1, t2 = lo + third, lo + 2 * third
        margin = dt.timedelta(minutes=_EWMA_STRAG_MINUTES)
        strag = (
            (F.col("ts") >= F.lit(t1 - margin))
            & (F.col("ts") < F.lit(t1))
            & (F.col("event_id") % 7 == 0)
        )
        b1 = events.filter((F.col("ts") < F.lit(t1)) & ~strag)
        b2 = events.filter(
            ((F.col("ts") >= F.lit(t1)) & (F.col("ts") < F.lit(t2))) | strag
        )
        b3 = events.filter(F.col("ts") >= F.lit(t2))
        sents = [
            spark.sql(
                f"SELECT CAST({10**15 + days} AS BIGINT) AS event_id, "
                f"timestamp'{hi}' + INTERVAL {days} DAYS AS ts, "
                f"CAST({_SENTINEL_USER} AS BIGINT) AS user_id, "
                "CAST(0.0 AS DOUBLE) AS value"
            )
            for days in _EWMA_SENT_DAYS
        ]
        # (the end-of-stream flush contract on these constants is
        # asserted at module import — see the constants above)
        # sentinel #1 rides phase 3's file: the watermark it advances
        # only applies in the NEXT batch regardless of which batch
        # carries it, so [b1][b2][b3+s1][s2] is emission-identical to
        # [b1][b2][b3][s1][s2] with one fewer micro-batch (s1's own row
        # stays buffered at stream end in BOTH schemes — it is never
        # part of the result; the sink filter drops sentinels anyway).
        return [b1, b2, b3.unionByName(sents[0]), sents[1]]

    src = _stage_ordered_batches(
        with_batches, sf, "ewma_replay_v2", retired_kinds=("ewma_replay",)
    )
    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    name = "streaming_ewma_out"
    with _replay_shuffle_partitions(spark):
        q = (
            stateful_ewma(stream, watermark=f"{_EWMA_WM_MINUTES} minutes")
            .writeStream.outputMode("append")
            .format("memory")
            .queryName(name)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    # explicit sentinel drop FIRST (round-11 advice): the %50 output
    # filter happens to exclude _SENTINEL_USER only because its residue
    # is 49 — if the shared constant ever became a multiple of 50,
    # sentinel rows would silently leak into the oracle-gated result
    return (
        spark.table(name)
        .filter(~F.col("user_id").eqNullSafe(F.lit(_SENTINEL_USER)))
        .filter(F.col("user_id") % 50 == 0)
    )


# ---------------------------------------------------------------------------
# DAG longest-path layering over the SCC condensation
# ---------------------------------------------------------------------------


def _maxplus_double_sql(prev: str) -> str:
    """One MAX-PLUS doubling round (tropical semiring: compose sums
    lengths, aggregate keeps the max per pair) as a DuckDB CTE body."""
    return f"""MATERIALIZED (
      SELECT u, w, MAX(len) AS len FROM (
        SELECT a.u AS u, b.w AS w, a.len + b.len AS len
        FROM {prev} a JOIN {prev} b ON a.w = b.u
        UNION ALL SELECT u, w, len FROM {prev}
      ) GROUP BY u, w)"""


@register(
    "dag_layers_parts",
    oracle=f"""
    WITH edges AS MATERIALIZED ({_SEQ_EDGES_SQL}),
    nodes AS (SELECT DISTINCT src AS id FROM edges
              UNION SELECT DISTINCT dst FROM edges),
    r0 AS MATERIALIZED (SELECT src AS u, dst AS w FROM edges
                        UNION SELECT id AS u, id AS w FROM nodes),
    r1 AS {_tc_double_sql("r0")}, r2 AS {_tc_double_sql("r1")},
    r3 AS {_tc_double_sql("r2")}, r4 AS {_tc_double_sql("r3")},
    r5 AS {_tc_double_sql("r4")}, r6 AS {_tc_double_sql("r5")},
    scc AS MATERIALIZED (
      SELECT f.u AS id, MIN(f.w) AS scc_id
      FROM r6 f JOIN r6 b ON f.u = b.w AND f.w = b.u
      GROUP BY f.u
    ),
    cedges AS MATERIALIZED (
      SELECT DISTINCT s1.scc_id AS src, s2.scc_id AS dst
      FROM edges e
      JOIN scc s1 ON e.src = s1.id
      JOIN scc s2 ON e.dst = s2.id
      WHERE s1.scc_id <> s2.scc_id
    ),
    cnodes AS (SELECT DISTINCT src AS id FROM cedges
               UNION SELECT DISTINCT dst FROM cedges),
    m0 AS MATERIALIZED (
      SELECT src AS u, dst AS w, CAST(1 AS BIGINT) AS len FROM cedges
      UNION ALL SELECT id AS u, id AS w, CAST(0 AS BIGINT) AS len FROM cnodes
    ),
    m1 AS {_maxplus_double_sql("m0")}, m2 AS {_maxplus_double_sql("m1")},
    m3 AS {_maxplus_double_sql("m2")}, m4 AS {_maxplus_double_sql("m3")},
    m5 AS {_maxplus_double_sql("m4")}, m6 AS {_maxplus_double_sql("m5")}
    SELECT CAST(w AS BIGINT) AS id, CAST(MAX(len) AS BIGINT) AS layer
    FROM m6 GROUP BY w
    """,
    doc="graph analytics: LONGEST-PATH LAYERING of the SCC "
    "condensation — per condensed node, the maximum number of edges "
    "on any path ending there (sources = layer 0): the critical-path "
    "/ topological-depth quantity dependency schedulers ask of a DAG, "
    "and the downstream pass the condensation entry exists to enable "
    "(cycles would make longest-path undefined; the condensation is "
    "acyclic by construction, Tarjan-asserted). Algorithm: MAX-PLUS "
    "reachability doubling (graph_algos.dag_longest_paths — the "
    "tropical-semiring twin of the SCC boolean closure; 6 squarings "
    "cover 64-edge paths ≥ the 38-node condensation depth bound; "
    "fixpoint asserted in tests). The oracle replays closure → SCC → "
    "condensation → max-plus doubling in one CTE chain. Scale: same "
    "O(n²)-pairs envelope as the closure (exact for bounded "
    "subgraphs); the billion-node path is topological peeling "
    "(k_core's per-round shape). Differential-tested against a "
    "pure-Python topological DP on random DAGs.",
)
def dag_layers_parts(spark: SparkSession, sf: str) -> DataFrame:
    from ..graph_algos import dag_longest_paths

    cond = (
        _condensed_edge_rows(spark, sf)
        .select(
            F.col("src_scc").alias("src"), F.col("dst_scc").alias("dst")
        )
        .distinct()
    )
    return dag_longest_paths(cond, doublings=6).select(
        F.col("id").cast("bigint").alias("id"),
        F.col("layer").cast("bigint").alias("layer"),
    )


# ---------------------------------------------------------------------------
# Stream-stream FULL OUTER interval join (completes the join family)
# ---------------------------------------------------------------------------


@register(
    "streaming_interval_join_full",
    oracle="""
    SELECT COALESCE(p.user_id, c.user_id) AS user_id,
           p.ts AS purchase_ts, c.ts AS click_ts
    FROM (SELECT user_id, ts FROM events WHERE event_type = 'purchase') p
    FULL JOIN (SELECT user_id, ts FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id
     AND c.ts > p.ts - INTERVAL 5 MINUTE AND c.ts <= p.ts
    """,
    doc="Structured Streaming: stream-stream FULL OUTER interval join "
    "— completes the inner (r2) / left-outer (r10) family: matches "
    "emit as found, an unmatched PURCHASE emits once with a NULL "
    "click side, and an unmatched CLICK emits once with a NULL "
    "purchase side, each when the watermark passes its side's "
    "eviction horizon; the key column is coalesced across sides so "
    "click-only rows keep their user. Same replay discipline as the "
    "left-outer twin (two far-future sentinel batches per side; "
    "sentinels dropped at the SINK, never inside the plan — the "
    "filter-pushdown-starves-the-watermark interaction documented "
    "there). Value-checked: emitted rows equal the DuckDB batch FULL "
    "JOIN exactly. At 100 TB state is O(events inside the "
    "interval+watermark horizon) per side — identical envelope to "
    "the inner variant; the outer flushes add no state, only "
    "eviction-time emission.",
)
def streaming_interval_join_full(spark: SparkSession, sf: str) -> DataFrame:
    from .python_ops import _interval_join_replay

    # the full join also emits sentinel-sentinel matches (both sides
    # carry the same sentinel user); the helper's sink filter drops them
    return _interval_join_replay(
        spark, sf, how="fullOuter", kind="ssjx", name="ssjf_catalog_out"
    )


# ---------------------------------------------------------------------------
# Audio resample: sample-rate normalization after decode
# ---------------------------------------------------------------------------


@register(
    "multimodal_audio_resample_stats",
    oracle="""
    WITH clips AS (
      SELECT doc_id AS media_id, n_chars % 600 + 10 AS n
      FROM documents WHERE n_chars IS NOT NULL
    ),
    s AS (
      SELECT media_id, n,
             [CAST((media_id * 31 + i * 17) % 65536 - 32768 AS BIGINT)
              FOR i IN range(0, n)] AS samples
      FROM clips
    ),
    res AS (
      SELECT media_id, n,
             [ ((samples[(2*k) // 3 + 1] + 32768) * (3 - (2*k) % 3)
                + (samples[least((2*k) // 3 + 2, n)] + 32768) * ((2*k) % 3)
               ) // 3 - 32768
               FOR k IN range(0, (3 * (n - 1)) // 2 + 1) ] AS rs
      FROM s
    )
    SELECT media_id,
           CAST(len(rs) AS BIGINT) AS n_out,
           CAST(24000 AS BIGINT) AS out_rate,
           CAST(list_sum([x * x FOR x IN rs]) AS BIGINT) AS sum_sq,
           CAST(list_min(rs) AS BIGINT) AS min_s,
           CAST(list_max(rs) AS BIGINT) AS max_s
    FROM res
    """,
    doc="multimodal: AUDIO SAMPLE-RATE NORMALIZATION — the step every "
    "audio training pipeline runs right after decode (mixed-rate "
    "corpora must land on one rate before feature extraction). Per "
    "document: synthesize the same deterministic 16-bit PCM clip as "
    "multimodal_wav_decode_stats, round-trip it through the REAL "
    "RIFF/WAVE encode+parse (the decode is exercised, not assumed), "
    "then resample 16 kHz -> 24 kHz by integer linear interpolation "
    "(pipeline/multimodal.py:resample_linear_pcm16 — output sample k "
    "at source position 2k/3; samples biased unsigned before the one "
    "floor division because Python // floors while DuckDB // "
    "truncates, and they only agree on non-negative operands) and "
    "emit exact-integer stats of the RESAMPLED signal. The oracle "
    "replays generation + interpolation straight from the formula, so "
    "the gate certifies decode -> resample end to end. Map-only Arrow "
    "pass; bytes never shuffle (the multimodal prime directive).",
)
def multimodal_audio_resample_stats(spark: SparkSession, sf: str) -> DataFrame:
    from ..pipeline.multimodal import (
        decode_wav_pcm,
        encode_wav_pcm16,
        resample_linear_pcm16,
        synth_pcm16,
    )

    clips = spread(
        load(spark, sf, "documents").filter(F.col("n_chars").isNotNull())
    ).select(
        F.col("doc_id").alias("media_id"),
        (F.col("n_chars") % 600 + 10).cast("int").alias("n"),
    )

    def run(batches):
        import pandas as pd

        for pdf in batches:
            out = {
                "media_id": [],
                "n_out": [],
                "out_rate": [],
                "sum_sq": [],
                "min_s": [],
                "max_s": [],
            }
            for media_id, n in zip(pdf["media_id"], pdf["n"]):
                samples = synth_pcm16(media_id, n)
                wav = encode_wav_pcm16(samples, sample_rate=16000)
                channels, rate, decoded = decode_wav_pcm(wav)
                assert channels == 1 and rate == 16000
                rs = resample_linear_pcm16(decoded, up=3, down=2)
                out["media_id"].append(media_id)
                out["n_out"].append(len(rs))
                out["out_rate"].append(24000)
                out["sum_sq"].append(sum(x * x for x in rs))
                out["min_s"].append(min(rs))
                out["max_s"].append(max(rs))
            yield pd.DataFrame(
                {k: pd.Series(v, dtype="int64") for k, v in out.items()}
            )

    return clips.mapInPandas(
        run,
        "media_id long, n_out long, out_rate long, "
        "sum_sq long, min_s long, max_s long",
    )


# ---------------------------------------------------------------------------
# Cypher variable-length traversal: -[*1..3]-> with min-hop semantics
# ---------------------------------------------------------------------------


@register(
    "varlength_reach_parts",
    oracle=f"""
    WITH edges AS MATERIALIZED ({_SEQ_EDGES_SQL}),
    h1 AS MATERIALIZED (
      SELECT src, dst FROM edges WHERE src <> dst
    ),
    h2 AS MATERIALIZED (
      SELECT DISTINCT a.src, b.dst
      FROM h1 a JOIN edges b ON a.dst = b.src
      WHERE a.src <> b.dst
        AND NOT EXISTS (SELECT 1 FROM h1 p
                        WHERE p.src = a.src AND p.dst = b.dst)
    ),
    h3 AS (
      SELECT DISTINCT a.src, b.dst
      FROM h2 a JOIN edges b ON a.dst = b.src
      WHERE a.src <> b.dst
        AND NOT EXISTS (SELECT 1 FROM h1 p
                        WHERE p.src = a.src AND p.dst = b.dst)
        AND NOT EXISTS (SELECT 1 FROM h2 p
                        WHERE p.src = a.src AND p.dst = b.dst)
    )
    SELECT CAST(src AS BIGINT) AS src, CAST(dst AS BIGINT) AS dst,
           CAST(1 AS BIGINT) AS hops FROM h1
    UNION ALL
    SELECT CAST(src AS BIGINT), CAST(dst AS BIGINT), CAST(2 AS BIGINT) FROM h2
    UNION ALL
    SELECT CAST(src AS BIGINT), CAST(dst AS BIGINT), CAST(3 AS BIGINT) FROM h3
    """,
    doc="Cypher surface parity: VARIABLE-LENGTH traversal "
    "`-[*1..3]->` (Neo4j's bounded var-length pattern — the reference "
    "dialect's one traversal form the fixed 1/2/3-hop entries don't "
    "cover) with shortest-match semantics: every ordered pair "
    "connected by a directed path of ≤3 edges, tagged with its "
    "MINIMUM hop count; self-pairs excluded. "
    "graph_algos.varlength_min_hops expands a frontier per hop and "
    "anti-joins the accumulated pair set, so pairs emit exactly once "
    "at their first (= minimum) distance; the oracle replays the "
    "per-hop NOT EXISTS chain. Scale: k chained equi-joins + "
    "anti-joins on the node key — the fixed-hop envelope, plus the "
    "hop distance the fixed joins lose. Differential-tested against "
    "per-source BFS on random digraphs.",
)
def varlength_reach_parts(spark: SparkSession, sf: str) -> DataFrame:
    from ..graph_algos import varlength_min_hops

    return varlength_min_hops(_staged_seq_edges(spark, sf), max_hops=3).select(
        F.col("src").cast("bigint").alias("src"),
        F.col("dst").cast("bigint").alias("dst"),
        F.col("hops").cast("bigint").alias("hops"),
    )


# ---------------------------------------------------------------------------
# Batch perceptron: distributed linear-classifier training, integer-exact
# ---------------------------------------------------------------------------


def _perceptron_round_sql(w_prev: str, g: str, w_out: str) -> str:
    """One unrolled batch-perceptron round: sum y·x over the rows the
    previous weights misclassify (margin ≤ 0), add to the weights."""
    return f"""{g} AS (
      SELECT
        CAST(COALESCE(SUM(y * x0) FILTER (
          WHERE y * ({w_prev}.a * x0 + {w_prev}.b * x1 + {w_prev}.c * x2) <= 0
        ), 0) AS BIGINT) AS sa,
        CAST(COALESCE(SUM(y * x1) FILTER (
          WHERE y * ({w_prev}.a * x0 + {w_prev}.b * x1 + {w_prev}.c * x2) <= 0
        ), 0) AS BIGINT) AS sb,
        CAST(COALESCE(SUM(y * x2) FILTER (
          WHERE y * ({w_prev}.a * x0 + {w_prev}.b * x1 + {w_prev}.c * x2) <= 0
        ), 0) AS BIGINT) AS sc,
        CAST(COUNT(*) FILTER (
          WHERE y * ({w_prev}.a * x0 + {w_prev}.b * x1 + {w_prev}.c * x2) <= 0
        ) AS BIGINT) AS n
      FROM pts, {w_prev}
    ),
    {w_out} AS (
      SELECT {w_prev}.a + {g}.sa AS a, {w_prev}.b + {g}.sb AS b,
             {w_prev}.c + {g}.sc AS c
      FROM {w_prev}, {g}
    )"""


@register(
    "perceptron_priority_orders",
    oracle=f"""
    WITH pts AS (
      SELECT CAST(1 AS BIGINT) AS x0,
             CAST(FLOOR(o_totalprice) AS BIGINT) // 1000 AS x1,
             CAST(o_custkey % 97 AS BIGINT) AS x2,
             CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                  THEN 1 ELSE -1 END AS y
      FROM orders WHERE o_totalprice IS NOT NULL
    ),
    w0 AS (SELECT CAST(0 AS BIGINT) AS a, CAST(0 AS BIGINT) AS b,
                  CAST(0 AS BIGINT) AS c),
    {_perceptron_round_sql("w0", "g1", "w1")},
    {_perceptron_round_sql("w1", "g2", "w2")},
    {_perceptron_round_sql("w2", "g3", "w3")}
    SELECT CAST(1 AS BIGINT) AS round, w1.a AS w_bias, w1.b AS w_price,
           w1.c AS w_cust, g1.n AS n_misclassified FROM w1, g1
    UNION ALL
    SELECT CAST(2 AS BIGINT), w2.a, w2.b, w2.c, g2.n FROM w2, g2
    UNION ALL
    SELECT CAST(3 AS BIGINT), w3.a, w3.b, w3.c, g3.n FROM w3, g3
    """,
    doc="distributed ML training, exactly replayable: BATCH PERCEPTRON "
    "(3 unrolled rounds) classifying urgent/high-priority orders from "
    "integer features (scaled price, customer-key residue, bias). The "
    "batch variant is the distributable one — each round is ONE "
    "map-side margin test against the broadcast 1-row weight vector "
    "plus one global aggregation of Σ y·x over the misclassified set "
    "(map-side partials; no per-sample sequential updates, no "
    "collect) — and because features, labels, and updates are all "
    "integers, every round's weights are bit-replayable by the "
    "oracle's unrolled CTEs (the kmeans/regression determinism "
    "discipline applied to a training LOOP). Emits per-round weights "
    "+ misclassification counts — the learning-curve trace. At 100 "
    "TB: rounds × (one scan + one 1-row broadcast + one scalar agg); "
    "the weight vector is O(features), never data-sized.",
)
def perceptron_priority_orders(spark: SparkSession, sf: str) -> DataFrame:
    pts = (
        load(spark, sf, "orders")
        .filter(F.col("o_totalprice").isNotNull())
        .select(
            F.lit(1).cast("bigint").alias("x0"),
            F.expr("CAST(FLOOR(o_totalprice) AS BIGINT) div 1000").alias("x1"),
            (F.col("o_custkey") % 97).cast("bigint").alias("x2"),
            F.when(
                F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1
            )
            .otherwise(-1)
            .cast("bigint")
            .alias("y"),
        )
    )
    # round-18 (_best_local discipline): the weight vector is THREE
    # EXACT INTEGERS — keep it as driver literals instead of a 1-row
    # frame threaded through crossJoin broadcasts. Each round is still
    # ONE full-scan Spark aggregation (the computation), but its 1-row
    # result is collected (the same job the former eager checkpoint
    # ran) and the next round's misclassification predicate compiles
    # the weights in as literals — the per-round broadcast-build jobs
    # and the checkpointed-RDD readout plan disappear; the readout is
    # a LocalRelation of exactly the computed integers.
    a = b = c = 0
    out_rows: "list[tuple[int, int, int, int, int]]" = []
    for rnd in (1, 2, 3):
        mis = F.col("y") * (
            F.lit(a) * F.col("x0")
            + F.lit(b) * F.col("x1")
            + F.lit(c) * F.col("x2")
        ) <= 0
        g = pts.agg(
            F.coalesce(F.sum(F.when(mis, F.col("y") * F.col("x0"))), F.lit(0))
            .cast("bigint")
            .alias("sa"),
            F.coalesce(F.sum(F.when(mis, F.col("y") * F.col("x1"))), F.lit(0))
            .cast("bigint")
            .alias("sb"),
            F.coalesce(F.sum(F.when(mis, F.col("y") * F.col("x2"))), F.lit(0))
            .cast("bigint")
            .alias("sc"),
            # coalesced like sa/sb/sc: a zero-row input must yield 0,
            # matching the oracle's COUNT(*) FILTER, not NULL
            F.coalesce(F.sum(F.when(mis, 1).otherwise(0)), F.lit(0))
            .cast("bigint")
            .alias("n"),
        ).collect()[0]
        a, b, c = a + g["sa"], b + g["sb"], c + g["sc"]
        out_rows.append((rnd, a, b, c, g["n"]))
    return local_rel(
        spark,
        out_rows,
        "round bigint, w_bias bigint, w_price bigint, w_cust bigint, "
        "n_misclassified bigint",
    )


# ---------------------------------------------------------------------------
# Temporal (time-respecting) reachability
# ---------------------------------------------------------------------------

# Directed part transitions stamped with their order's month index —
# a temporal edge (u, v, t) is traversable only at time t, and a
# time-respecting path must have nondecreasing times. Sparsified with
# the same integer-arithmetic trick as the SCC graph.
_TEMPORAL_EDGES_SQL = """
      SELECT DISTINCT (a.l_partkey % 48) AS src, (b.l_partkey % 48) AS dst,
             CAST(datediff('month', DATE '1992-01-01', o.o_orderdate)
                  AS BIGINT) AS t
      FROM lineitem a
      JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND b.l_linenumber = a.l_linenumber + 1
      JOIN orders o ON o.o_orderkey = a.l_orderkey
      WHERE (a.l_partkey % 48) <> (b.l_partkey % 48)
        AND ((a.l_partkey % 48) * 31 + (b.l_partkey % 48)) % 5 = 0
"""


def _temporal_relax_sql(prev: str, out: str) -> str:
    """One earliest-arrival relaxation: traverse any edge whose time is
    at or after the arrival at its source, keep the per-node minimum."""
    return f"""{out} AS (
      SELECT node, MIN(arr) AS arr FROM (
        SELECT node, arr FROM {prev}
        UNION ALL
        SELECT e.dst AS node, e.t AS arr
        FROM {prev} d JOIN edges e ON d.node = e.src AND e.t >= d.arr
      ) GROUP BY node
    )"""


@register(
    "temporal_reach_parts",
    oracle=f"""
    WITH edges AS MATERIALIZED ({_TEMPORAL_EDGES_SQL}),
    nodes AS (SELECT DISTINCT src AS id FROM edges
              UNION SELECT DISTINCT dst FROM edges),
    a0 AS (SELECT id AS node, CAST(0 AS BIGINT) AS arr FROM nodes
           WHERE id % 7 = 0),
    {_temporal_relax_sql("a0", "a1")},
    {_temporal_relax_sql("a1", "a2")},
    {_temporal_relax_sql("a2", "a3")},
    {_temporal_relax_sql("a3", "a4")}
    SELECT CAST(node AS BIGINT) AS id, CAST(arr AS BIGINT) AS earliest_arrival
    FROM a4
    """,
    doc="TEMPORAL graph analytics: earliest-arrival reachability over "
    "a time-stamped edge stream — a path is valid only if its edge "
    "times are nondecreasing (you cannot traverse an edge that fired "
    "before you arrived), the semantics static reachability entries "
    "cannot express (an edge set that is connected when flattened may "
    "be temporally unreachable). Edges are part transitions stamped "
    "with their order's month index; seeds (id %% 7 = 0) start at "
    "time 0; four unrolled relaxations cover time-respecting paths of "
    "≤4 edges — each round is one frontier⋈edges join with the "
    "time-feasibility predicate (e.t >= arr) fused into the join "
    "condition, plus a per-node MIN (map-side partials): exactly "
    "Bellman-Ford's shape with min-plus replaced by the temporal "
    "earliest-arrival semiring, so the oracle unrolls the same rounds "
    "in SQL (the bellman_ford_4relax discipline). Scale: state is "
    "O(nodes), the stamped edge list never mutates, and the "
    "feasibility predicate prunes the join INSIDE the shuffle — no "
    "post-filter blowup. Differential-tested against a pure-Python "
    "temporal Dijkstra in tests/test_graph_algos.py.",
)
def temporal_reach_parts(spark: SparkSession, sf: str) -> DataFrame:
    from ..graph_algos import temporal_earliest_arrival

    orders = load(spark, sf, "orders").select(
        "o_orderkey",
        F.expr(
            "CAST(months_between(date_trunc('MONTH', o_orderdate), "
            "DATE '1992-01-01') AS BIGINT)"
        ).alias("t"),
    )
    s_, d_ = F.col("src"), F.col("dst")
    # checkpoint the built edge set ONCE: the helper reuses it per
    # relaxation round AND the seed derivation below reads it — without
    # this the lineitem self-join + orders join would re-execute just
    # to produce ~48 seed ids (round-11 review)
    edges = (
        _part_transitions(spark, sf)
        .join(orders, F.col("l_orderkey") == orders.o_orderkey)
        .filter((s_ * 31 + d_) % 5 == 0)
        .select("src", "dst", "t")
        .distinct()
        .localCheckpoint(eager=True)
    )
    seeds = (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .distinct()
        .filter(F.col("id") % 7 == 0)
    )
    return temporal_earliest_arrival(edges, seeds, rounds=4, pinned=True).select(
        F.col("node").cast("bigint").alias("id"),
        F.col("arr").cast("bigint").alias("earliest_arrival"),
    )


# ---------------------------------------------------------------------------
# Decision stump: exhaustive 1-D threshold search, two-phase cumsum
# ---------------------------------------------------------------------------


@register(
    "decision_stump_orders",
    oracle="""
    WITH pts AS (
      SELECT CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS x,
             CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                  THEN 1 ELSE 0 END AS y
      FROM orders WHERE o_totalprice IS NOT NULL
    ),
    g AS (
      SELECT x, CAST(SUM(y) AS BIGINT) AS np,
             CAST(COUNT(*) - SUM(y) AS BIGINT) AS nn
      FROM pts GROUP BY x
    ),
    tot AS (SELECT CAST(SUM(np) AS BIGINT) AS p,
                   CAST(SUM(nn) AS BIGINT) AS n FROM g),
    c AS (
      SELECT x, SUM(np) OVER (ORDER BY x) AS cp,
             SUM(nn) OVER (ORDER BY x) AS cn
      FROM g
    ),
    cand AS (
      SELECT x AS thr, CAST(0 AS BIGINT) AS polarity,
             CAST(cp + (n - cn) AS BIGINT) AS n_correct
      FROM c, tot
      UNION ALL
      SELECT x, CAST(1 AS BIGINT), CAST((p - cp) + cn AS BIGINT)
      FROM c, tot
    )
    SELECT CAST(thr AS BIGINT) AS thr_cents, polarity, n_correct,
           CAST(p + n AS BIGINT) AS n_total
    FROM cand, tot
    ORDER BY n_correct DESC, polarity ASC, thr ASC LIMIT 1
    """,
    doc="ML training: DECISION STUMP — exhaustive 1-D threshold search "
    "(the weak learner boosting stacks; also the split-finding "
    "primitive inside every distributed tree trainer) over order "
    "totals vs urgent/high priority. Every distinct value is a "
    "candidate threshold with both polarities (predict-positive-below "
    "and -above); accuracy comes from prefix sums of per-value "
    "positive/negative counts, computed with ranks.global_cumsum's "
    "two-phase range-partition + offset-broadcast (NO single-partition "
    "global window — the classic split-finding scale cliff), and the "
    "argmax is one TakeOrdered with a total tie-break (accuracy desc, "
    "polarity, threshold). All counts integer-exact; the oracle "
    "replays the same prefix-sum scan with a rank window. At 100 TB: "
    "one groupBy per feature + two cumsum shuffles over DISTINCT "
    "values + a k=1 TakeOrdered — per-feature work is independent, so "
    "a full tree level fans out trivially.",
)
def decision_stump_orders(spark: SparkSession, sf: str) -> DataFrame:
    from ..ranks import grouped_cumsums

    pts = (
        load(spark, sf, "orders")
        .filter(F.col("o_totalprice").isNotNull())
        .select(
            F.floor(F.col("o_totalprice") * 100).cast("bigint").alias("x"),
            F.when(
                F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1
            )
            .otherwise(0)
            .cast("bigint")
            .alias("y"),
        )
    )
    g = pts.groupBy("x").agg(
        F.sum("y").cast("bigint").alias("np"),
        (F.count(F.lit(1)) - F.sum("y")).cast("bigint").alias("nn"),
    )
    # bucketed deterministic-hash cumsum, the _split_counts shape
    # (round-18; was ranks.global_cumsums): the range form paid a
    # boundary-sampling job plus an eager pin job per invocation and a
    # SECOND full aggregation for the totals — the bucketed form is
    # one lazy plan (order_bits=32: price cents ≤ ~5·10⁷ <
    # 2^31 at any tested SF — same declared-narrow domain as the tree
    # features) with the (p, n) totals read off its bucket frame. The
    # per-value histogram g has a single downstream consumer chain
    # here (one action), so no pin is needed at all.
    c, tot = grouped_cumsums(
        g.withColumn("_g", F.lit(0)),
        ["_g"],
        "x",
        {"cp": F.col("np"), "cn": F.col("nn")},
        order_bits=32,
        totals={"p": "cp", "n": "cn"},
    )
    c = c.join(F.broadcast(tot), "_g")
    # both polarities from ONE pass via explode (the _split_candidates
    # trick — a unionByName of two selects over c would duplicate the
    # whole cumsum subtree in the lazy plan)
    cand = c.select(
        F.col("x").alias("thr"),
        (F.col("p") + F.col("n")).cast("bigint").alias("n_total"),
        F.explode(
            F.array(
                F.struct(
                    F.lit(0).cast("bigint").alias("polarity"),
                    (F.col("cp") + (F.col("n") - F.col("cn")))
                    .cast("bigint")
                    .alias("n_correct"),
                ),
                F.struct(
                    F.lit(1).cast("bigint").alias("polarity"),
                    ((F.col("p") - F.col("cp")) + F.col("cn"))
                    .cast("bigint")
                    .alias("n_correct"),
                ),
            )
        ).alias("cd"),
    ).select(
        "thr",
        F.col("cd.polarity").alias("polarity"),
        F.col("cd.n_correct").alias("n_correct"),
        "n_total",
    )
    return (
        cand.orderBy(
            F.desc("n_correct"), F.asc("polarity"), F.asc("thr")
        )
        .limit(1)
        .select(
            F.col("thr").alias("thr_cents"),
            "polarity",
            "n_correct",
            "n_total",
        )
    )
