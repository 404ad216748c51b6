"""NULL-text oracle parity (round-7 review): the shipped testdata has
zero NULL-text rows, so engine divergences on NULL documents were
latent — but the catalog docstrings claim NULL parity and a testdata
regen could introduce NULLs at any round. This suite runs the
text-kernel entries over a synthetic documents table WITH NULL, empty,
duplicate, and short texts and compares Spark against the SAME DuckDB
oracle the driver uses, value-exactly."""

from __future__ import annotations

import pytest

ENTRIES = [
    "dedup_exact",  # round 8: \x0b normalization class pinned cross-engine
    "heavy_hitter_tokens",
    "dedup_minhash_lsh_pairs",
    "dedup_canonicalize",
    "dedup_substring_spans",
    "text_winnowing",
    "repetition_ratio_filter",
    "pack_sequences",
    "boilerplate_strip_rebuild",
    "bloom_decontaminate_stats",  # round 8: NULL docs must drop from fps
    "chunk_documents",  # round 8: NULL text must drop, not crash the kernel
    # round 8: codec kernels must DROP NULL-n_chars docs (NaN dims
    # crashed the Arrow kernels while the oracles silently dropped);
    # image_stats must emit NULL n_features for a NULL doc like Spark
    "multimodal_image_stats",
    "multimodal_wav_decode_stats",
    "multimodal_bmp_decode_stats",
    "multimodal_png_decode_stats",
    "multimodal_avi_frame_stats",
    "multimodal_jpeg_decode_stats",
    "multimodal_jpeg420_decode_stats",
    # round 10: the MJPEG container+codec kernel joins the suite — the
    # NULL-n_chars doc must drop on BOTH sides before frame synthesis
    "multimodal_mjpeg_frame_stats",
    "multimodal_h264_frame_stats",
    # round 11: NULL/empty/short texts produce zero bigrams in both
    # engines and must still appear with 0-scores via the left join
    "lm_bigram_familiarity",
    # round 11: NULL-n_chars docs drop symmetrically before the
    # decode->resample chain (same contract as the other codec kernels)
    "multimodal_audio_resample_stats",
]


@pytest.fixture(scope="module")
def null_sf_dir(tmp_path_factory):
    import pyarrow as pa
    import pyarrow.parquet as pq

    root = tmp_path_factory.mktemp("null_sf")
    dup = "alpha beta gamma delta epsilon zeta eta theta"
    vt = "alpha\x0bbeta  gamma"  # vertical tab + double space: the
    # whitespace-class parity trap (Java \s includes \x0b, RE2 not)
    rows = {
        "doc_id": [0, 1, 2, 3, 4, 5, 6, 7, 8],
        "text": [
            dup,
            dup,  # exact dup pair -> real LSH/substring signal
            None,
            None,  # TWO null docs: the bucketing trap
            "",  # empty string: distinct from NULL in both engines
            "one two",  # < 3 tokens: whole-text shingle branch
            "x x x x x x x x x x x x",  # heavy repetition
            "unique words only here appear once each time",
            vt,
        ],
        "n_chars": [len(dup), len(dup), None, None, 0, 7, 23, 44, len(vt)],
        "source": ["s1"] * 9,
        "lang": ["en"] * 9,
    }
    pq.write_table(pa.table(rows), str(root / "documents.parquet"))
    # a tiny embeddings table so index-driven entries (hybrid search)
    # can run over the SAME null-text corpus: deterministic nonzero
    # vectors, one per doc
    import random

    rng = random.Random(3)
    emb = {
        "vec_id": rows["doc_id"],
        "embedding": [
            [rng.uniform(0.1, 1.0) for _ in range(8)] for _ in rows["doc_id"]
        ],
    }
    pq.write_table(
        pa.table(
            emb,
            schema=pa.schema(
                [("vec_id", pa.int64()), ("embedding", pa.list_(pa.float32()))]
            ),
        ),
        str(root / "embeddings.parquet"),
    )
    return str(root)


@pytest.mark.parametrize("name", ENTRIES)
def test_null_text_oracle_parity(spark, null_sf_dir, name):
    import duckdb

    from news_graph_rag_spark.queries import registry

    q = registry()[name]
    # None-safe sort key: a NULL group key (dedup_exact's NULL-text
    # bucket) makes plain tuple sorting raise TypeError
    key = lambda t: tuple((v is None, str(v)) for v in t)  # noqa: E731
    got = sorted(
        (
            tuple(None if v is None else v for v in r)
            for r in q.fn(spark, null_sf_dir).collect()
        ),
        key=key,
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{null_sf_dir}/documents.parquet'"
    )
    want = sorted((tuple(r) for r in con.execute(q.oracle).fetchall()), key=key)
    assert got == want, f"{name}: spark {got[:6]} vs oracle {want[:6]}"


def test_hybrid_indexed_null_text_parity(spark, null_sf_dir):
    """The round-8 token-index kernel (array_distinct(split) postings +
    df cap) meets NULL documents: a NULL text must produce NO postings
    in both engines (explode(NULL) vs unnest(NULL)), yet its doc can
    still arrive as a VECTOR candidate, putting a NULL kw_hits through
    the fusion's greatest() — this asserts the full entry stays
    value-exact on that corpus."""
    import duckdb

    from news_graph_rag_spark.queries import registry

    q = registry()["hybrid_search_indexed"]
    got = sorted(
        tuple(None if v is None else v for v in r)
        for r in q.fn(spark, null_sf_dir).collect()
    )
    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{null_sf_dir}/{t}.parquet'"
        )
    want = sorted(tuple(r) for r in con.execute(q.oracle).fetchall())
    assert got == want, f"spark {got[:6]} vs oracle {want[:6]}"


def test_motif_null_uid_edges_parity(spark):
    """Round-10 kernel NULL discipline (VERDICT r9 #6): edge rows with
    NULL uids through the motif compiler. Labeled patterns must match
    the SQL-join twin exactly — equi-joins (positive AND the negated
    NOT EXISTS) never match NULL keys in either engine — and the
    negated term must KEEP positive rows whose anti probe finds no
    match, including when the negated edge table itself carries NULL
    keys."""
    import duckdb
    import pandas as pd

    from news_graph_rag_spark.motif import MotifGraph

    nodes_pd = pd.DataFrame({"uid": pd.array([1, 2, 3, None], dtype="Int64")})
    e_pd = pd.DataFrame(
        {
            "src_uid": pd.array([1, 2, None, 3], dtype="Int64"),
            "dst_uid": pd.array([2, None, 3, 1], dtype="Int64"),
        }
    )
    b_pd = pd.DataFrame(
        {
            "src_uid": pd.array([1, None], dtype="Int64"),
            "dst_uid": pd.array([2, 3], dtype="Int64"),
        }
    )
    g = MotifGraph(
        nodes={"N": spark.createDataFrame(nodes_pd)},
        edges={
            "E": spark.createDataFrame(e_pd),
            "B": spark.createDataFrame(b_pd),
        },
    )
    got = sorted(
        (r["a"]["uid"], r["b"]["uid"])
        for r in g.find("(a:N)-[:E]->(b:N); !(a)-[:B]->(b)").collect()
    )
    con = duckdb.connect()
    con.register("nodes", nodes_pd)
    con.register("e", e_pd)
    con.register("b", b_pd)
    want = sorted(
        tuple(r)
        for r in con.execute(
            """
            SELECT a.uid, bb.uid FROM e
            JOIN nodes a ON e.src_uid = a.uid
            JOIN nodes bb ON e.dst_uid = bb.uid
            WHERE NOT EXISTS (
              SELECT 1 FROM b
              WHERE b.src_uid = e.src_uid AND b.dst_uid = e.dst_uid
            )
            """
        ).fetchall()
    )
    assert got == want == [(3, 1)]


def test_ann_batch_search_empty_probe_list(spark, null_sf_dir):
    """Round-10 NULL/empty-input discipline (VERDICT r9 #6): the
    recall-telemetry shape with ZERO probes must return an empty frame
    with the stable schema — not crash on the empty isin / empty
    createDataFrame — and the recall aggregation over it must be empty,
    not a row of zeros."""
    from pyspark.sql import functions as F

    from news_graph_rag_spark.pipeline.ann_index import (
        batch_search,
        ensure_index,
    )

    path = ensure_index(spark, null_sf_dir, widen_reps=None, n_centroids=2, iters=1)
    approx = batch_search(spark, path, [], k=10, nprobe=1).select(
        "probe_id", "vec_id", F.lit(1).alias("hit")
    )
    exact = batch_search(spark, path, [], k=10, nprobe=2).select(
        "probe_id", "vec_id"
    )
    recall = (
        exact.join(approx, ["probe_id", "vec_id"], "left")
        .groupBy("probe_id")
        .agg(F.count("hit").alias("n_hits"))
    )
    assert approx.columns == ["probe_id", "vec_id", "hit"]
    assert recall.collect() == []


def test_ewma_and_kmeans_null_value_parity(spark, tmp_path):
    """Round-11 kernels over NULL-bearing numeric tables: EWMA must
    renormalize around NULL values identically in both engines and
    drop NULL-ts rows symmetrically (Spark windows order NULLS FIRST,
    DuckDB NULLS LAST — the entry pins the semantics with an explicit
    filter); k-means must exclude un-priced rows symmetrically (a NULL
    distance would ride on engine-specific NULL ordering)."""
    import datetime as dt

    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from news_graph_rag_spark.queries import registry

    t0 = dt.datetime(2024, 1, 1)
    ts = [t0 + dt.timedelta(minutes=i) for i in range(10)]
    events = {
        # user 0 (%50==0, selected): NULL value mid-stream + a NULL ts
        # row; user 50 selected with all-NULL values; user 7 filtered out
        "event_id": list(range(12)),
        "ts": ts[:5] + [None] + ts[5:8] + ts[:3],
        "user_id": [0, 0, 0, 0, 0, 0, 50, 50, 50, 7, 7, 7],
        "event_type": ["view"] * 12,
        "value": [1.0, None, 3.0, 4.0, None, 9.9, None, None, None, 1.0, 2.0, 3.0],
        "props": ["{}"] * 12,
    }
    pq.write_table(pa.table(events), str(tmp_path / "events.parquet"))
    orders = {
        "o_orderkey": [1, 2, 3, 4, 5, 6],
        "o_custkey": [1] * 6,
        "o_orderstatus": ["O"] * 6,
        "o_totalprice": [10.0, 20.0, None, 10000.5, 9999.49, None],
        "o_orderdate": [t0] * 6,
        "o_orderpriority": ["1-URGENT"] * 6,
    }
    pq.write_table(pa.table(orders), str(tmp_path / "orders.parquet"))

    reg = registry()
    con = duckdb.connect()
    for t in ("events", "orders"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{tmp_path}/{t}.parquet'")
    key = lambda t: tuple((v is None, str(v)) for v in t)  # noqa: E731
    for name in ("ewma_user_value", "kmeans_1d_totalprice"):
        q = reg[name]
        got = sorted(
            (
                tuple(None if v is None else v for v in r)
                for r in q.fn(spark, str(tmp_path)).collect()
            ),
            key=key,
        )
        want = sorted(
            (tuple(r) for r in con.execute(q.oracle).fetchall()), key=key
        )
        assert got == want, f"{name}: spark {got[:8]} vs oracle {want[:8]}"
    # the all-NULL-value user's rows must surface with NULL ewma (den=0)
    ew = dict()
    for r in reg["ewma_user_value"].fn(spark, str(tmp_path)).collect():
        ew[r["event_id"]] = r["ewma"]
    assert ew[6] is None and ew[7] is None and ew[8] is None
    assert 5 not in ew  # the NULL-ts row dropped
    assert 9 not in ew  # user 7 filtered by %50


def test_round12_training_kernels_null_orders_parity(spark, tmp_path):
    """Round-12 task #7: NULL o_totalprice / o_custkey / o_orderdate /
    o_orderpriority through the training kernels (perceptron, stump,
    tree-level split). Each entry's docstring claims the NULL rows are
    filtered or zero-labeled SYMMETRICALLY with its oracle — pin it
    with a synthetic orders table that actually contains them."""
    import datetime as dt

    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from news_graph_rag_spark.queries import registry

    t0 = dt.datetime(1993, 6, 1)
    orders = {
        "o_orderkey": [1, 2, 3, 4, 5, 6, 7, 8],
        "o_custkey": [1, 2, None, 4, 5, 6, 7, 8],
        "o_orderstatus": ["O"] * 8,
        "o_totalprice": [10.0, 20.5, 30.0, None, 9999.49, 1.0, None, 55.5],
        "o_orderdate": [t0, t0, None, t0, t0, t0, t0, t0],
        "o_orderpriority": [
            "1-URGENT",
            "2-HIGH",
            "3-MEDIUM",
            "1-URGENT",
            None,  # NULL priority must label y=0/-1 in both engines
            "5-LOW",
            "2-HIGH",
            "4-NOT SPECIFIED",
        ],
    }
    pq.write_table(pa.table(orders), str(tmp_path / "orders.parquet"))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW orders AS SELECT * FROM '{tmp_path}/orders.parquet'")
    key = lambda t: tuple((v is None, str(v)) for v in t)  # noqa: E731
    reg = registry()
    for name in (
        "perceptron_priority_orders",
        "decision_stump_orders",
        "tree_level_split_orders",
    ):
        q = reg[name]
        got = sorted(
            (
                tuple(None if v is None else v for v in r)
                for r in q.fn(spark, str(tmp_path)).collect()
            ),
            key=key,
        )
        want = sorted(
            (tuple(r) for r in con.execute(q.oracle).fetchall()), key=key
        )
        assert got == want, f"{name}: spark {got[:6]} vs oracle {want[:6]}"
    # the filters are real: 6 priced rows for the stump, 5 fully-non-NULL
    # rows for the tree level (custkey AND orderdate must also be set)
    stump = reg["decision_stump_orders"].fn(spark, str(tmp_path)).first()
    assert stump["n_total"] == 6
    level = reg["tree_level_split_orders"].fn(spark, str(tmp_path)).collect()
    assert {r["fid"] for r in level} == {0, 1, 2}
    assert all(r["n_total"] == 5 for r in level)


def _write_temporal_tables(tmp_path, partkey_pairs, dates):
    """Minimal lineitem/orders parquet for the temporal entry: one
    2-line order per (src, dst) partkey pair, order date from
    ``dates`` (None allowed — the NULL-t edge case)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    li = {"l_orderkey": [], "l_linenumber": [], "l_partkey": []}
    orders = {"o_orderkey": [], "o_orderdate": []}
    for i, ((s, d), date) in enumerate(zip(partkey_pairs, dates), start=1):
        li["l_orderkey"] += [i, i]
        li["l_linenumber"] += [1, 2]
        li["l_partkey"] += [s, d]
        orders["o_orderkey"].append(i)
        orders["o_orderdate"].append(date)
    pq.write_table(pa.table(li), str(tmp_path / "lineitem.parquet"))
    pq.write_table(pa.table(orders), str(tmp_path / "orders.parquet"))


def test_temporal_reach_null_date_parity(spark, tmp_path):
    """Round-12 task #7: a NULL o_orderdate stamps its edge with NULL t.
    The traversal predicate e.t >= arr is NULL -> never traversed in
    EITHER engine, but the edge's endpoints still enter the node set
    (and thus the seed set) symmetrically."""
    import datetime as dt

    import duckdb

    from news_graph_rag_spark.queries import registry

    d = lambda m: dt.datetime(1992, 1 + m, 15)  # noqa: E731
    # (s+d)%5==0 passes the sparsifier; seeds are id%7==0 (7, 21)
    _write_temporal_tables(
        tmp_path,
        [(7, 3), (3, 2), (2, 8), (21, 4), (1, 4)],
        [d(0), d(1), d(2), None, d(3)],
    )
    q = registry()["temporal_reach_parts"]
    got = sorted(tuple(r) for r in q.fn(spark, str(tmp_path)).collect())
    con = duckdb.connect()
    for t in ("lineitem", "orders"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{tmp_path}/{t}.parquet'")
    want = sorted(tuple(r) for r in con.execute(q.oracle).fetchall())
    assert got == want
    res = dict(got)
    # 21's only edge is the NULL-t one: it is a seed (arr 0) that can
    # never traverse; 4 is reachable only via the real 1->4 edge, and 1
    # is not a seed, so 4 must NOT appear
    assert res[21] == 0 and 4 not in res
    assert res == {7: 0, 3: 0, 2: 1, 8: 2, 21: 0}


def test_temporal_reach_empty_seed_parity(spark, tmp_path):
    """Round-12 task #7: no node id is divisible by 7 -> the seed set
    is EMPTY and both engines must return zero rows (the relaxation
    loop over an empty frontier must not crash)."""
    import datetime as dt

    import duckdb

    from news_graph_rag_spark.queries import registry

    _write_temporal_tables(
        tmp_path,
        [(1, 4), (2, 3), (6, 9), (4, 6)],
        [dt.datetime(1992, 3, 15)] * 4,
    )
    q = registry()["temporal_reach_parts"]
    assert q.fn(spark, str(tmp_path)).count() == 0
    con = duckdb.connect()
    for t in ("lineitem", "orders"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{tmp_path}/{t}.parquet'")
    assert con.execute(q.oracle).fetchall() == []


def test_exact_group_rank_value_all_null_group(spark):
    """Round-12 task #7: exact_group_rank_value's round-11 NULL
    discipline, pinned at the kernel level — an all-NULL-value group
    and a NULL group key both vanish from the answer dict (callers'
    SQL oracles drop the same rows via equality joins / NOT NULL),
    instead of crashing the histogram passes."""
    from pyspark.sql import functions as F  # noqa: F401

    from news_graph_rag_spark.pipeline.percentiles import (
        exact_group_rank_value,
    )

    rows = (
        [("a", v) for v in (5, 1, 3, 2, 4)]
        + [("b", None)] * 3  # all-NULL group: no rank target exists
        + [(None, 7)] * 2  # NULL key: can never match a ranges join
    )
    b = spark.createDataFrame(rows, "k string, x long")
    assert exact_group_rank_value(b, "k", "x", 50) == {"a": 3}
