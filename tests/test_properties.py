"""Property-based tests (hypothesis): invariants of the order-sensitive
text folds (L2-L4) and the MERGE upsert (D8) that example-based tests
can't sweep. The reference functions are quirky (drop-remainder,
drop-trigger-sentence) — properties pin the quirks down for ALL inputs,
not just goldens."""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from news_graph_rag_spark.ingest.chunker import (
    MAX_PARAGRAPH_LEN,
    combine_sentences,
    ensure_max_len,
    get_chunks_from_body,
    split_into_sentences,
)

texts = st.text(
    alphabet=st.characters(codec="utf-8", exclude_categories=("Cs",)),
    max_size=4000,
)
sentences_lists = st.lists(st.text(max_size=200), max_size=50)


@given(texts)
@settings(max_examples=200, deadline=None)
def test_split_sentences_no_delimiters_and_stripped(t):
    for s in split_into_sentences(t):
        assert not re.search(r"[.:;?!]", s)
        assert s == s.strip()
        assert len(s) > 1


@given(sentences_lists, st.integers(min_value=1, max_value=2000))
@settings(max_examples=200, deadline=None)
def test_combine_sentences_reference_quirks(sents, target):
    out = combine_sentences(sents, target)
    # every emitted group reached the target before flushing
    for group in out:
        assert len(group.replace(".", "")) >= 0  # structural sanity
    # emitted content is a subsequence of the input joined by '.' —
    # nothing is invented
    joined_in = ".".join(sents)
    for group in out:
        for part in group.split("."):
            assert part in joined_in or part == ""
    # quirk: if the inputs never reach the target, NOTHING is emitted
    if sum(len(s) for s in sents) < target:
        assert out == []


@given(st.lists(st.text(max_size=3000), max_size=10))
@settings(max_examples=100, deadline=None)
def test_ensure_max_len_bounds_every_output(texts_in):
    for t in ensure_max_len(texts_in):
        # short texts pass through; split pieces are sentence-combines
        # whose length is bounded by target + one sentence ≤ 2·max
        assert len(t) < MAX_PARAGRAPH_LEN or len(t) <= 2 * MAX_PARAGRAPH_LEN


@given(
    st.lists(st.text(max_size=100), max_size=4),
    st.lists(
        st.fixed_dictionaries(
            {
                "headline": st.lists(st.text(max_size=100), max_size=3),
                "paragraphs": st.lists(st.text(max_size=100), max_size=5),
            }
        ),
        max_size=4,
    ),
)
@settings(max_examples=100, deadline=None)
def test_get_chunks_positions_are_dense_and_sections_ordered(summary, sections):
    chunks = get_chunks_from_body(summary, sections)
    assert [c["position"] for c in chunks] == list(range(len(chunks)))
    # section ids never decrease in position order
    secs = [c["section"] for c in chunks]
    assert secs == sorted(secs)
    # summaries only in section 0; all summary chunks precede the rest
    cats = [c["category"] for c in chunks]
    if "summary" in cats:
        last_summary = max(i for i, c in enumerate(cats) if c == "summary")
        assert all(c == "summary" for c in cats[: last_summary + 1])


def test_merge_into_properties(spark):
    """D8 invariants, swept over randomized batches: idempotent,
    insert-only-on-miss, existing rows win."""
    import random

    from news_graph_rag_spark.ingest.upserts import merge_into

    rng = random.Random(7)
    for trial in range(5):
        existing_rows = [
            (f"k{i}", f"old{i}") for i in rng.sample(range(30), rng.randint(0, 15))
        ]
        update_rows = [
            (f"k{i}", f"new{i}") for i in rng.sample(range(30), rng.randint(0, 15))
        ]
        existing = spark.createDataFrame(
            existing_rows or [("_sentinel", "_x")], "uid string, val string"
        )
        if not existing_rows:
            existing = existing.filter("uid != uid")  # empty, schema kept
        updates = spark.createDataFrame(
            update_rows or [("_sentinel", "_x")], "uid string, val string"
        )
        if not update_rows:
            updates = updates.filter("uid != uid")

        merged = merge_into(existing, updates, ["uid"]).cache()
        got = {r["uid"]: r["val"] for r in merged.collect()}

        expect = {k: v for k, v in update_rows}
        expect.update({k: v for k, v in existing_rows})  # existing wins
        assert got == expect, f"trial {trial}"

        # idempotent: merging the same updates again changes nothing
        again = {r["uid"]: r["val"] for r in merge_into(merged, updates, ["uid"]).collect()}
        assert again == got, f"trial {trial} (idempotency)"


@given(
    st.lists(
        st.text(
            alphabet=st.sampled_from(list("ab .")), min_size=0, max_size=40
        ),
        min_size=1,
        max_size=8,
    )
)
@settings(max_examples=50, deadline=None)
def test_shingle_kernel_matches_catalyst_semantics(texts):
    """The Arrow shingle kernel (decontaminate hot path) must emit
    exactly the distinct (doc_id, shingle) set of the Catalyst
    ``explode(array_distinct(shingle_array(text)))`` form it replaced
    (BENCH_NOTES r06), for arbitrary texts including empties, repeated
    tokens, and consecutive spaces (empty tokens kept by split)."""
    import pandas as pd

    from news_graph_rag_spark.queries.pipeline_queries import (
        _shingle_rows_kernel,
    )

    pdf = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    got = set()
    for out in _shingle_rows_kernel(iter([pdf])):
        got |= {(int(r.doc_id), r.shingle) for r in out.itertuples(index=False)}

    expected = set()
    for i, text in enumerate(texts):
        toks = text.split(" ")
        if len(toks) >= 3:
            shs = {" ".join(toks[j : j + 3]) for j in range(len(toks) - 2)}
        else:
            shs = {text}
        expected |= {(i, s) for s in shs}
    assert got == expected


def test_shingle_kernel_matches_catalyst_operator(spark):
    """Same check against the REAL Catalyst expression (not a Python
    re-statement): run both operator forms through Spark on edge-case
    rows and compare the (doc_id, shingle) sets."""
    from pyspark.sql import functions as F

    from news_graph_rag_spark.queries.pipeline_queries import (
        _shingle_rows_kernel,
        shingle_array,
    )

    rows = [
        (0, "a b c d e"),
        (1, "one two"),          # < 3 tokens -> whole text
        (2, ""),                 # empty -> [''] single shingle
        (3, "x  y  z"),          # double spaces -> empty tokens kept
        (4, "a a a a"),          # repeats -> distinct shingles
        (5, None),               # NULL -> nothing (kernel) / NULL row
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    kernel = {
        (r["doc_id"], r["shingle"])
        for r in df.mapInPandas(
            _shingle_rows_kernel, "doc_id long, shingle string"
        ).collect()
    }
    catalyst = {
        (r["doc_id"], r["shingle"])
        for r in df.select(
            "doc_id",
            F.explode(F.array_distinct(shingle_array(F.col("text")))).alias(
                "shingle"
            ),
        ).collect()
        if r["shingle"] is not None  # NULL shingle joins/groups with nothing
    }
    assert kernel == catalyst


def test_upsert_into_vs_merge_into_semantics(spark):
    """SCD1 upsert_into takes the UPDATE version for matched keys;
    merge_into keeps the EXISTING version (reference MERGE ... ON
    CREATE SET). Both append unmatched rows, both are idempotent on
    re-application of the same batch."""
    from news_graph_rag_spark.ingest.upserts import merge_into, upsert_into

    existing = spark.createDataFrame(
        [(1, "old1"), (2, "old2")], "id long, v string"
    )
    updates = spark.createDataFrame(
        [(2, "new2"), (3, "new3"), (3, "new3dup")], "id long, v string"
    )
    up = {(r.id, r.v) for r in upsert_into(existing, updates, ["id"]).collect()}
    mg = {(r.id, r.v) for r in merge_into(existing, updates, ["id"]).collect()}
    assert (1, "old1") in up and (1, "old1") in mg
    assert (2, "new2") in up and (2, "old2") in mg
    assert len([t for t in up if t[0] == 3]) == 1  # dedup on key first
    assert len([t for t in mg if t[0] == 3]) == 1
    # idempotent: re-applying the same batch changes nothing
    again = upsert_into(
        upsert_into(existing, updates, ["id"]), updates, ["id"]
    )
    assert {(r.id, r.v) for r in again.collect()} == up


def test_upsert_into_order_col_last_writer_deterministic(spark):
    """With an ordering column, upsert_into picks the max-version row
    per key deterministically — 'last writer' is defined by data, not
    by dropDuplicates' arbitrary partition order (ADVICE r6)."""
    from news_graph_rag_spark.ingest.upserts import upsert_into

    existing = spark.createDataFrame(
        [(1, "old1", 0), (2, "old2", 0)], "id long, v string, ver long"
    )
    updates = spark.createDataFrame(
        [(2, "v-at-5", 5), (2, "v-at-9", 9), (3, "n-at-1", 1), (3, "n-at-7", 7)],
        "id long, v string, ver long",
    )
    for n_parts in (1, 7):  # result independent of physical partitioning
        got = {
            (r.id, r.v, r.ver)
            for r in upsert_into(
                existing, updates.repartition(n_parts), ["id"], order_col="ver"
            ).collect()
        }
        assert got == {(1, "old1", 0), (2, "v-at-9", 9), (3, "n-at-7", 7)}


def test_upsert_into_null_swapped_ties_deterministic(spark):
    """Round-7 advice #2: Spark's xxhash64 SKIPS null inputs, so
    distinct tied rows like (a=NULL, b='x') and (a='x', b=NULL) hashed
    identically under the old tiebreak and the winner depended on
    partition order. With per-column NULL markers, the winner is the
    same row under every physical partitioning AND input order."""
    from news_graph_rag_spark.ingest.upserts import upsert_into

    existing = spark.createDataFrame(
        [(9, "z", "z", 0)], "id long, a string, b string, ver long"
    )
    rows = [(1, None, "x", 5), (1, "x", None, 5)]  # NULL-swapped tie
    winners = set()
    for order in (rows, rows[::-1]):
        for n_parts in (1, 5):
            updates = spark.createDataFrame(
                order, "id long, a string, b string, ver long"
            ).repartition(n_parts)
            got = {
                (r.id, r.a, r.b)
                for r in upsert_into(
                    existing, updates, ["id"], order_col="ver"
                ).collect()
                if r.id == 1
            }
            assert len(got) == 1
            winners |= got
    assert len(winners) == 1, f"winner varied across runs: {winners}"


def test_quantize_query_matches_index_kernel(spark):
    """The driver-side query quantizer (search_by_vector's first step)
    must produce bit-identical int8 vectors and norms to the index
    build's Arrow kernel for ANY float input — including negatives,
    subnormal-ish magnitudes, all-zero vectors, and widened variants —
    or an external query would score in a different domain than the
    index it probes."""
    import random

    from news_graph_rag_spark.pipeline.ann_index import (
        quantize_query,
        quantized_vectors,
    )

    rng = random.Random(77)
    rows = [
        (0, [0.0] * 8),
        (1, [rng.uniform(-1e-30, 1e-30) for _ in range(8)]),
        (2, [rng.gauss(0, 100) for _ in range(8)]),
        (3, [-127.0, 127.0, 0.5, -0.5, 1e6, -1e6, 3.25, -0.125]),
    ] + [(4 + i, [rng.gauss(0, 1) for _ in range(8)]) for i in range(20)]
    for reps in (None, 3):
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        kernel = {
            r["vec_id"]: (list(r["q8"]), r["nrm"])
            for r in quantized_vectors(df, widen_reps=reps).collect()
        }
        for vid, vec in rows:
            q = quantize_query(vec, widen_reps=reps)
            assert q == kernel[vid][0], (vid, reps)
            assert sum(x * x for x in q) == kernel[vid][1], (vid, reps)


def test_upsert_into_order_col_not_in_stored_schema(spark):
    """The ordering column may exist only on the update batch (an event
    timestamp the table doesn't persist) — winners are picked before
    the projection drops it (round-7 review)."""
    from news_graph_rag_spark.ingest.upserts import upsert_into

    existing = spark.createDataFrame([(1, "old")], "id long, v string")
    updates = spark.createDataFrame(
        [(1, "at5", 5), (1, "at9", 9), (2, "n1", 1)],
        "id long, v string, event_ts long",
    )
    got = {
        (r.id, r.v)
        for r in upsert_into(existing, updates, ["id"], order_col="event_ts").collect()
    }
    assert got == {(1, "at9"), (2, "n1")}


# ---- round 10: H.264 I_PCM codec, LPA, motif negation -------------------


@given(
    st.integers(min_value=1, max_value=3),
    st.integers(min_value=1, max_value=3),
    st.integers(min_value=1, max_value=3),
    st.randoms(use_true_random=False),
)
@settings(max_examples=40, deadline=None)
def test_h264_ipcm_roundtrip_property(wmb, hmb, nf, rnd):
    """For ANY whole-macroblock geometry and ANY sample bytes (zero
    runs included — the emulation-prevention worst case), encode→decode
    is the identity. This is the property the catalog oracle's closed
    form relies on."""
    from news_graph_rag_spark.pipeline.h264_codec import (
        decode_h264_ipcm,
        encode_h264_ipcm,
    )

    W, H = 16 * wmb, 16 * hmb
    frames = []
    for _ in range(nf):
        pick = rnd.random()
        if pick < 0.3:  # biased toward pathological zero planes
            y = [0] * (W * H)
            cb = [0] * ((W // 2) * (H // 2))
        else:
            y = [rnd.randrange(256) for _ in range(W * H)]
            cb = [rnd.randrange(4) for _ in range((W // 2) * (H // 2))]
        cr = [rnd.randrange(256) for _ in range((W // 2) * (H // 2))]
        frames.append((y, cb, cr))
    dw, dh, dec = decode_h264_ipcm(encode_h264_ipcm(W, H, frames))
    assert (dw, dh, len(dec)) == (W, H, nf)
    for (y, cb, cr), (y2, cb2, cr2) in zip(frames, dec):
        assert y == list(y2) and cb == list(cb2) and cr == list(cr2)


def _lpa_reference(edges, rounds):
    """Pure-python synchronous min-tie-break LPA (the spec the Spark
    implementation and the unrolled SQL oracle must both follow)."""
    from collections import Counter, defaultdict

    adj = defaultdict(set)
    for s, d in edges:
        if s != d:
            adj[s].add(d)
            adj[d].add(s)
    labels = {n: n for n in adj}
    for _ in range(rounds):
        new = {}
        for n, nbrs in adj.items():
            counts = Counter(labels[m] for m in nbrs)
            best = max(counts.items(), key=lambda kv: (kv[1], -kv[0]))
            new[n] = best[0]
        labels = new
    return labels


def test_label_propagation_matches_reference_on_random_graphs(spark):
    """Randomized differential test: Spark LPA vs the pure-python
    reference over random graphs (one session, many graphs — the
    hypothesis-per-example pattern is too slow with a JVM in the
    loop)."""
    import random

    from news_graph_rag_spark.graph_algos import label_propagation

    rng = random.Random(20241015)
    for trial in range(8):
        n = rng.randint(3, 14)
        m = rng.randint(2, 3 * n)
        edges = sorted(
            {
                (a, b)
                for a, b in (
                    sorted(rng.sample(range(n), 2)) for _ in range(m)
                )
            }
        )
        if not edges:
            continue
        rounds = rng.randint(1, 4)
        want = _lpa_reference(edges, rounds)
        e = spark.createDataFrame(edges, "src bigint, dst bigint")
        got = {
            r["id"]: r["label"]
            for r in label_propagation(e, rounds=rounds).collect()
        }
        assert got == want, (trial, edges, rounds)


def test_motif_negation_matches_duckdb_on_random_graphs(spark):
    """Randomized differential test: the motif compiler's negated-term
    semantics vs DuckDB NOT EXISTS over random edge sets, including
    self-loop edges (the round-10 confirmed-bug class)."""
    import random

    import duckdb
    import pandas as pd

    from news_graph_rag_spark.motif import MotifGraph

    rng = random.Random(77)
    for trial in range(6):
        n = rng.randint(2, 6)
        nodes_pd = pd.DataFrame({"uid": list(range(n))})
        mk = lambda m: pd.DataFrame(  # noqa: E731
            sorted(
                {
                    (rng.randrange(n), rng.randrange(n))
                    for _ in range(m)
                }
            ),
            columns=["src_uid", "dst_uid"],
        )
        e_pd, b_pd = mk(rng.randint(1, 9)), mk(rng.randint(0, 5))
        if b_pd.empty:
            b_pd = pd.DataFrame({"src_uid": [99], "dst_uid": [99]})
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
        assert got == want, (trial, e_pd.values.tolist(), b_pd.values.tolist())
        # self-loop negation: compare against explicit self-loop set
        got_sl = sorted(
            (r["a"]["uid"], r["b"]["uid"])
            for r in g.find("(a:N)-[:E]->(b:N); !(a)-[:B]->(a)").collect()
        )
        want_sl = sorted(
            tuple(r)
            for r in con.execute(
                """
                SELECT a.uid, bb.uid FROM e
                JOIN nodes a ON e.src_uid = a.uid
                JOIN nodes bb ON e.dst_uid = bb.uid
                WHERE NOT EXISTS (
                  SELECT 1 FROM b
                  WHERE b.src_uid = a.uid AND b.dst_uid = a.uid
                )
                """
            ).fetchall()
        )
        assert got_sl == want_sl, (trial,)


def test_ewma_matches_pure_python_on_random_events(spark, tmp_path):
    """Round-11 differential: the ewma_user_value entry vs a pure-Python
    reference implementing the same truncated dyadic EWMA with the same
    left-associative float order (Python floats ARE IEEE doubles, so
    equality here is bit-for-bit, no tolerance)."""
    import datetime as dt
    import random

    import pyarrow as pa
    import pyarrow.parquet as pq

    from news_graph_rag_spark.queries import registry

    rng = random.Random(11)
    t0 = dt.datetime(2024, 3, 1)
    rows = []
    eid = 0
    for user in (0, 50, 100, 3):
        for i in range(rng.randint(1, 20)):
            rows.append(
                (
                    eid,
                    t0 + dt.timedelta(seconds=rng.randint(0, 500)),
                    user,
                    "view",
                    None if rng.random() < 0.2 else rng.uniform(-5, 5),
                    "{}",
                )
            )
            eid += 1
    cols = list(zip(*rows))
    pq.write_table(
        pa.table(
            {
                "event_id": list(cols[0]),
                "ts": list(cols[1]),
                "user_id": list(cols[2]),
                "event_type": list(cols[3]),
                "value": list(cols[4]),
                "props": list(cols[5]),
            }
        ),
        str(tmp_path / "events.parquet"),
    )

    weights = [2.0 ** -(i + 1) for i in range(8)]

    def ref():
        out = {}
        by_user = {}
        for r in rows:
            by_user.setdefault(r[2], []).append(r)
        for user, urows in by_user.items():
            if user % 50 != 0:
                continue
            urows.sort(key=lambda r: (r[1], r[0]))
            vals = [r[4] for r in urows]
            for n, r in enumerate(urows):
                num, den = 0.0, 0.0
                for i, w in enumerate(weights):
                    if n - i < 0:
                        num = num + 0.0
                        den = den + 0.0
                    else:
                        x = vals[n - i]
                        num = num + (0.0 if x is None else x * w)
                        den = den + (w if x is not None else 0.0)
                out[r[0]] = (num / den) if den > 0.0 else None
        return out

    got = {
        r["event_id"]: r["ewma"]
        for r in registry()["ewma_user_value"]
        .fn(spark, str(tmp_path))
        .collect()
    }
    assert got == ref()


def test_kmeans_matches_pure_python_on_random_orders(spark, tmp_path):
    """Round-11 differential: the integer Lloyd entry vs a pure-Python
    replay of the same init/assign/update rules — exact centroid and
    count equality on random order totals, including duplicate and
    extreme values."""
    import datetime as dt
    import random

    import pyarrow as pa
    import pyarrow.parquet as pq

    from news_graph_rag_spark.queries import registry

    rng = random.Random(7)
    prices = (
        [rng.uniform(900, 510000) for _ in range(200)]
        + [1000.0] * 5  # duplicates
        + [900.0, 510000.0]  # extremes
    )
    n = len(prices)
    t0 = dt.datetime(2024, 1, 1)
    pq.write_table(
        pa.table(
            {
                "o_orderkey": list(range(1, n + 1)),
                "o_custkey": [1] * n,
                "o_orderstatus": ["O"] * n,
                "o_totalprice": prices,
                "o_orderdate": [t0] * n,
                "o_orderpriority": ["1-URGENT"] * n,
            }
        ),
        str(tmp_path / "orders.parquet"),
    )

    import math

    xs = [int(math.floor(p * 100)) for p in prices]

    def ref():
        mn, mx = min(xs), max(xs)
        cents = [mn + ((mx - mn) * i) // 3 for i in range(4)]
        g = {}
        for _ in range(2):
            g = {}
            for x in xs:
                cid = min(range(4), key=lambda i: (abs(x - cents[i]), i))
                s, c = g.get(cid, (0, 0))
                g[cid] = (s + x, c + 1)
            cents = [
                (g[i][0] // g[i][1]) if i in g else cents[i] for i in range(4)
            ]
        return {
            i: (cents[i], g[i][1] if i in g else 0) for i in range(4)
        }

    got = {
        r["cid"]: (r["centroid"], r["n_points"])
        for r in registry()["kmeans_1d_totalprice"]
        .fn(spark, str(tmp_path))
        .collect()
    }
    assert got == ref()


def test_percentile_kernel_ignores_null_values_and_keys(spark):
    """Round-11 review regressions: a NULL value must not inflate the
    target rank past the populated buckets (crash), and a NULL group
    key must be excluded rather than never matching the per-pass
    ranges join (crash) — both symmetric with the callers' oracles,
    whose equality joins / NOT NULL filters drop the same rows."""
    from news_graph_rag_spark.pipeline.percentiles import (
        exact_group_rank_value,
    )

    df = spark.createDataFrame(
        [
            ("a", 1000),
            ("a", 2000),
            ("a", None),  # NULL value: must not count toward n
            (None, 5),  # NULL key: must be excluded entirely
            (None, 9),
            ("b", 7),
        ],
        "k string, x long",
    )
    got = exact_group_rank_value(df, "k", "x", 95)
    assert got == {"a": 2000, "b": 7}


def test_resample_linear_pcm16_properties():
    """Round-11 resampler invariants: identity at 1:1, exact
    subsampling at 1:2, endpoint preservation, output bounded by the
    input range (linear interpolation can't overshoot), and the
    documented length formula — across random seeded clips including
    full-scale negative samples (the floor-division portability case)."""
    import random

    from news_graph_rag_spark.pipeline.multimodal import resample_linear_pcm16

    rng = random.Random(1111)
    assert resample_linear_pcm16([]) == []
    assert resample_linear_pcm16([5]) == [5]
    for _ in range(20):
        n = rng.randint(1, 200)
        xs = [rng.randint(-32768, 32767) for _ in range(n)]
        assert resample_linear_pcm16(xs, up=1, down=1) == xs
        assert resample_linear_pcm16(xs, up=1, down=2) == xs[::2]
        out = resample_linear_pcm16(xs, up=3, down=2)
        assert len(out) == ((n - 1) * 3) // 2 + 1
        assert out[0] == xs[0]
        if (n - 1) % 2 == 0:  # last output lands exactly on the last input
            assert out[-1] == xs[-1]
        assert min(xs) <= min(out) and max(out) <= max(xs)


def test_perceptron_matches_pure_python_on_random_orders(spark, tmp_path):
    """Round-11 differential: the batch-perceptron entry vs a
    pure-Python replay of the same integer update rule — exact weight
    and misclassification-count equality per round."""
    import datetime as dt
    import math
    import random

    import pyarrow as pa
    import pyarrow.parquet as pq

    from news_graph_rag_spark.queries import registry

    rng = random.Random(42)
    n = 300
    prices = [rng.uniform(900, 510000) for _ in range(n)]
    custs = [rng.randrange(1, 5000) for _ in range(n)]
    prios = [
        rng.choice(["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"])
        for _ in range(n)
    ]
    t0 = dt.datetime(2024, 1, 1)
    pq.write_table(
        pa.table(
            {
                "o_orderkey": list(range(1, n + 1)),
                "o_custkey": custs,
                "o_orderstatus": ["O"] * n,
                "o_totalprice": prices,
                "o_orderdate": [t0] * n,
                "o_orderpriority": prios,
            }
        ),
        str(tmp_path / "orders.parquet"),
    )
    pts = [
        (
            1,
            int(math.floor(p)) // 1000,
            c % 97,
            1 if pr in ("1-URGENT", "2-HIGH") else -1,
        )
        for p, c, pr in zip(prices, custs, prios)
    ]
    want = []
    w = [0, 0, 0]
    for rnd in range(1, 4):
        sa = sb = sc = cnt = 0
        for x0, x1, x2, y in pts:
            if y * (w[0] * x0 + w[1] * x1 + w[2] * x2) <= 0:
                sa += y * x0
                sb += y * x1
                sc += y * x2
                cnt += 1
        w = [w[0] + sa, w[1] + sb, w[2] + sc]
        want.append((rnd, w[0], w[1], w[2], cnt))
    got = sorted(
        tuple(r)
        for r in registry()["perceptron_priority_orders"]
        .fn(spark, str(tmp_path))
        .collect()
    )
    assert got == want


def test_decision_stump_matches_exhaustive_python(spark, tmp_path):
    """Round-11 differential: the stump entry vs a brute-force Python
    search over every threshold and polarity with the same tie-break
    (accuracy desc, polarity asc, threshold asc)."""
    import datetime as dt
    import math
    import random

    import pyarrow as pa
    import pyarrow.parquet as pq

    from news_graph_rag_spark.queries import registry

    rng = random.Random(9)
    n = 250
    prices = [rng.uniform(900, 510000) for _ in range(n)] + [1000.0] * 4
    prios = [
        rng.choice(["1-URGENT", "2-HIGH", "3-MEDIUM", "5-LOW"])
        for _ in range(len(prices))
    ]
    m = len(prices)
    t0 = dt.datetime(2024, 1, 1)
    pq.write_table(
        pa.table(
            {
                "o_orderkey": list(range(1, m + 1)),
                "o_custkey": [1] * m,
                "o_orderstatus": ["O"] * m,
                "o_totalprice": prices,
                "o_orderdate": [t0] * m,
                "o_orderpriority": prios,
            }
        ),
        str(tmp_path / "orders.parquet"),
    )
    pts = [
        (int(math.floor(p * 100)), 1 if pr in ("1-URGENT", "2-HIGH") else 0)
        for p, pr in zip(prices, prios)
    ]
    best = None
    for thr in sorted({x for x, _ in pts}):
        for pol in (0, 1):
            correct = sum(
                1
                for x, y in pts
                if (y == 1) == ((x <= thr) if pol == 0 else (x > thr))
            )
            key = (-correct, pol, thr)
            if best is None or key < best:
                best = key
    want = (best[2], best[1], -best[0], m)
    row = (
        registry()["decision_stump_orders"]
        .fn(spark, str(tmp_path))
        .collect()[0]
    )
    assert (
        row["thr_cents"],
        row["polarity"],
        row["n_correct"],
        row["n_total"],
    ) == want


def test_tree_level_split_matches_exhaustive_python(spark, tmp_path):
    """Round-12 differential: the multi-feature split entry vs a
    brute-force Python search per feature over every threshold and
    polarity with the same tie-break (accuracy desc, polarity asc,
    threshold asc) — the stump differential, fanned out to D=3."""
    import datetime as dt
    import math
    import random

    import pyarrow as pa
    import pyarrow.parquet as pq

    from news_graph_rag_spark.queries import registry

    rng = random.Random(21)
    n = 220
    prices = [rng.uniform(900, 510000) for _ in range(n)] + [2500.0] * 5
    m = len(prices)
    custs = [rng.randrange(1, 5000) for _ in range(m)]
    dates = [
        dt.datetime(1992 + rng.randrange(0, 6), rng.randrange(1, 13), 7)
        for _ in range(m)
    ]
    prios = [
        rng.choice(["1-URGENT", "2-HIGH", "3-MEDIUM", "5-LOW"])
        for _ in range(m)
    ]
    pq.write_table(
        pa.table(
            {
                "o_orderkey": list(range(1, m + 1)),
                "o_custkey": custs,
                "o_orderstatus": ["O"] * m,
                "o_totalprice": prices,
                "o_orderdate": dates,
                "o_orderpriority": prios,
            }
        ),
        str(tmp_path / "orders.parquet"),
    )
    feats = [
        [int(math.floor(p * 100)) for p in prices],
        [c % 97 for c in custs],
        [(d.year - 1992) * 12 + d.month - 1 for d in dates],
    ]
    ys = [1 if pr in ("1-URGENT", "2-HIGH") else 0 for pr in prios]
    want = {}
    for fid, xs in enumerate(feats):
        best = None
        for thr in sorted(set(xs)):
            for pol in (0, 1):
                correct = sum(
                    1
                    for x, y in zip(xs, ys)
                    if (y == 1) == ((x <= thr) if pol == 0 else (x > thr))
                )
                key = (-correct, pol, thr)
                if best is None or key < best:
                    best = key
        want[fid] = (best[2], best[1], -best[0], m)
    got = {
        r["fid"]: (r["thr"], r["polarity"], r["n_correct"], r["n_total"])
        for r in registry()["tree_level_split_orders"]
        .fn(spark, str(tmp_path))
        .collect()
    }
    assert got == want


def test_epoch_shuffle_manifest_matches_python(spark, tmp_path):
    """Round-12 differential: the epoch-shuffle manifest vs a
    brute-force Python replay of the LCG mix + sort + equal-width
    sharding — and the structural invariants a trainer relies on
    (ranks partition 1..T, shard sizes within 1 of each other)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from news_graph_rag_spark.queries import registry
    from news_graph_rag_spark.queries.round12 import (
        _CHECKSUM_MOD,
        _EPOCH,
        _N_SHARDS,
    )

    doc_ids = [3, 17, 1, 999, 42, 8, 300, 5, 77, 123, 456, 789, 1011]
    pq.write_table(
        pa.table({"doc_id": doc_ids}), str(tmp_path / "documents.parquet")
    )
    mix = lambda d: (  # noqa: E731
        (((d % 2147483648) * 1103515245 + 12345 + _EPOCH * 7919) % 2147483648)
        * 69069
        + 1
    ) % 2147483648
    order = sorted(doc_ids, key=lambda d: (mix(d), d))
    t = len(order)
    want: dict = {}
    for rnk, d in enumerate(order, start=1):
        sid = (rnk - 1) * _N_SHARDS // t
        s = want.setdefault(sid, [0, rnk, rnk, 0])
        s[0] += 1
        s[2] = rnk
        s[3] += (mix(d) + d) % _CHECKSUM_MOD
    got = {
        r["shard_id"]: [r["n_rows"], r["min_rank"], r["max_rank"], r["checksum"]]
        for r in registry()["epoch_shuffle_shards"]
        .fn(spark, str(tmp_path))
        .collect()
    }
    assert got == {k: list(v) for k, v in want.items()}
    sizes = [v[0] for v in got.values()]
    assert max(sizes) - min(sizes) <= 1
    assert sorted(
        r for v in got.values() for r in range(v[1], v[2] + 1)
    ) == list(range(1, t + 1))


def test_tree_depth2_matches_exhaustive_python(spark, tmp_path):
    """Round-12 differential: depth-2 induction vs a brute-force
    two-level Python search — root split (same tie-break), partition
    by feature <= thr, then per-leaf exhaustive search."""
    import datetime as dt
    import math
    import random

    import pyarrow as pa
    import pyarrow.parquet as pq

    from news_graph_rag_spark.queries import registry

    rng = random.Random(33)
    n = 180
    prices = [rng.uniform(900, 510000) for _ in range(n)] + [4200.0] * 4
    m = len(prices)
    custs = [rng.randrange(1, 4000) for _ in range(m)]
    dates = [
        dt.datetime(1992 + rng.randrange(0, 5), rng.randrange(1, 13), 3)
        for _ in range(m)
    ]
    prios = [
        rng.choice(["1-URGENT", "2-HIGH", "3-MEDIUM", "5-LOW"])
        for _ in range(m)
    ]
    pq.write_table(
        pa.table(
            {
                "o_orderkey": list(range(1, m + 1)),
                "o_custkey": custs,
                "o_orderstatus": ["O"] * m,
                "o_totalprice": prices,
                "o_orderdate": dates,
                "o_orderpriority": prios,
            }
        ),
        str(tmp_path / "orders.parquet"),
    )
    rows = [
        (
            int(math.floor(p * 100)),
            c % 97,
            (d.year - 1992) * 12 + d.month - 1,
            1 if pr in ("1-URGENT", "2-HIGH") else 0,
        )
        for p, c, d, pr in zip(prices, custs, dates, prios)
    ]

    def best_split(subset):
        best = None
        for fid in range(3):
            xs = [r[fid] for r in subset]
            for thr in sorted(set(xs)):
                for pol in (0, 1):
                    correct = sum(
                        1
                        for r in subset
                        if (r[3] == 1)
                        == ((r[fid] <= thr) if pol == 0 else (r[fid] > thr))
                    )
                    key = (-correct, fid, pol, thr)
                    if best is None or key < best:
                        best = key
        return best  # (-n_correct, fid, polarity, thr)

    rb = best_split(rows)
    want = {0: (rb[1], rb[3], rb[2], -rb[0], m)}
    left = [r for r in rows if r[rb[1]] <= rb[3]]
    right = [r for r in rows if r[rb[1]] > rb[3]]
    for node, subset in ((1, left), (2, right)):
        b = best_split(subset)
        want[node] = (b[1], b[3], b[2], -b[0], len(subset))
    got = {
        r["node"]: (r["fid"], r["thr"], r["polarity"], r["n_correct"], r["n_node"])
        for r in registry()["tree_depth2_orders"]
        .fn(spark, str(tmp_path))
        .collect()
    }
    assert got == want


def test_tree_depth3_matches_exhaustive_python(spark, tmp_path):
    """Round-13 differential: depth-3 Gini induction vs a brute-force
    three-level Python trainer using the SAME gain arithmetic
    (float(S)**2 / float(lt*rt) — Python floats are IEEE doubles, so
    the key is bit-identical to the entry's), with a Fraction-exact
    guard asserting no distinct-gain pair of candidates collides in
    double on this fixture — i.e. the differential is insensitive to
    double rounding here."""
    import datetime as dt
    import math
    import random
    from fractions import Fraction

    import pyarrow as pa
    import pyarrow.parquet as pq

    from news_graph_rag_spark.queries import registry

    rng = random.Random(47)
    n = 200
    prices = [rng.uniform(900, 510000) for _ in range(n)] + [3100.0] * 4
    m = len(prices)
    custs = [rng.randrange(1, 4000) for _ in range(m)]
    dates = [
        dt.datetime(1992 + rng.randrange(0, 5), rng.randrange(1, 13), 9)
        for _ in range(m)
    ]
    prios = [
        rng.choice(["1-URGENT", "2-HIGH", "3-MEDIUM", "5-LOW"])
        for _ in range(m)
    ]
    pq.write_table(
        pa.table(
            {
                "o_orderkey": list(range(1, m + 1)),
                "o_custkey": custs,
                "o_orderstatus": ["O"] * m,
                "o_totalprice": prices,
                "o_orderdate": dates,
                "o_orderpriority": prios,
            }
        ),
        str(tmp_path / "orders.parquet"),
    )
    rows = [
        (
            int(math.floor(p * 100)),
            c % 97,
            (d.year - 1992) * 12 + d.month - 1,
            1 if pr in ("1-URGENT", "2-HIGH") else 0,
        )
        for p, c, d, pr in zip(prices, custs, dates, prios)
    ]

    def best_split(subset):
        p = sum(r[3] for r in subset)
        nn = len(subset) - p
        best, seen = None, {}
        for fid in range(3):
            xs = sorted(set(r[fid] for r in subset))
            for thr in xs:
                cp = sum(1 for r in subset if r[fid] <= thr and r[3] == 1)
                cn = sum(1 for r in subset if r[fid] <= thr and r[3] == 0)
                lt, rt = cp + cn, (p + nn) - (cp + cn)
                if rt == 0:
                    continue
                s = cp * nn - cn * p
                gain = float(s) * float(s) / float(lt * rt)
                seen[Fraction(s * s, lt * rt)] = gain
                key = (-gain, fid, thr)
                if best is None or key < best:
                    best = (*key, lt, rt, s)
        # no two distinct exact gains collide in double on this fixture
        assert len(seen) == len(set(seen.values()))
        return best  # (-gain, fid, thr, lt, rt, s)

    want = {}
    nodes = {1: rows}
    for level in range(3):
        nxt = {}
        for node, subset in sorted(nodes.items()):
            b = best_split(subset)
            if b is None:
                continue
            want[node] = (b[1], b[2], b[3], b[4], b[5])
            if level < 2:
                fid, thr = b[1], b[2]
                nxt[2 * node] = [r for r in subset if r[fid] <= thr]
                nxt[2 * node + 1] = [r for r in subset if r[fid] > thr]
        nodes = {k: v for k, v in nxt.items() if v}
    got = {
        r["node"]: (r["fid"], r["thr"], r["n_left"], r["n_right"], r["s_cross"])
        for r in registry()["tree_depth3_orders"]
        .fn(spark, str(tmp_path))
        .collect()
    }
    assert got == want


def test_tree_depth2_one_leaf_empty_parity(spark, tmp_path):
    """Round-13 edge (VERDICT r12 #7): a root split that sends EVERY
    row to leaf 1 (all features single-valued, so the only threshold is
    the max — nothing lands above it). Leaf 2 then has no rows and must
    be ABSENT from the output on both engines, not NULL-filled."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from news_graph_rag_spark.queries import registry

    m = 6
    pq.write_table(
        pa.table(
            {
                "o_orderkey": list(range(1, m + 1)),
                "o_custkey": [97] * m,  # f1 = 0 for every row
                "o_orderstatus": ["O"] * m,
                "o_totalprice": [1000.0] * m,  # f0 single-valued
                "o_orderdate": [__import__("datetime").datetime(1992, 1, 5)]
                * m,  # f2 single-valued
                "o_orderpriority": ["1-URGENT", "5-LOW"] * (m // 2),
            }
        ),
        str(tmp_path / "orders.parquet"),
    )
    reg = registry()["tree_depth2_orders"]
    got = sorted(
        (r["node"], r["fid"], r["thr"], r["n_correct"], r["n_node"])
        for r in reg.fn(spark, str(tmp_path)).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM '{tmp_path}/orders.parquet'"
    )
    want = sorted(
        (r[0], r[1], r[2], r[4], r[5])
        for r in con.execute(reg.oracle).fetchall()
    )
    assert got == want
    assert [r[0] for r in got] == [0, 1]  # root + leaf 1 only; leaf 2 empty


def test_epoch_shuffle_h2_collision_tiebreak(spark, tmp_path):
    """Round-13 edge (VERDICT r12 #7): doc_ids that differ by exactly
    2^31 collide in the LCG mix (the reduction is mod 2^31 by design),
    so their permuted order is decided ONLY by the doc_id tie-break —
    pin that it is ascending and engine-identical, against both the
    DuckDB oracle and a Python replay."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from news_graph_rag_spark.queries import registry
    from news_graph_rag_spark.queries.round12 import (
        _CHECKSUM_MOD,
        _EPOCH,
        _N_SHARDS,
    )

    base = [5, 17, 101, 999]
    doc_ids = base + [d + 2**31 for d in base] + [d + 2**32 for d in base]
    pq.write_table(
        pa.table({"doc_id": doc_ids}), str(tmp_path / "documents.parquet")
    )
    mix = lambda d: (  # noqa: E731
        (((d % 2147483648) * 1103515245 + 12345 + _EPOCH * 7919) % 2147483648)
        * 69069
        + 1
    ) % 2147483648
    for d in base:
        assert mix(d) == mix(d + 2**31) == mix(d + 2**32)  # real collisions
    order = sorted(doc_ids, key=lambda d: (mix(d), d))
    t = len(order)
    want: dict = {}
    for rnk, d in enumerate(order, start=1):
        sid = (rnk - 1) * _N_SHARDS // t
        s = want.setdefault(sid, [0, rnk, rnk, 0])
        s[0] += 1
        s[2] = rnk
        s[3] += (mix(d) + d) % _CHECKSUM_MOD
    reg = registry()["epoch_shuffle_shards"]
    got = {
        r["shard_id"]: [r["n_rows"], r["min_rank"], r["max_rank"], r["checksum"]]
        for r in reg.fn(spark, str(tmp_path)).collect()
    }
    assert got == {k: list(v) for k, v in want.items()}
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{tmp_path}/documents.parquet'"
    )
    oracle = {
        r[0]: [r[1], r[2], r[3], r[4]]
        for r in con.execute(reg.oracle).fetchall()
    }
    assert got == oracle


def test_tokenize_pack_export_composes_pieces(spark, tmp_path):
    """Round-13 differential (VERDICT r12 #2): the end-to-end export
    manifest must equal a Python replay built from the PIECES — real
    apply_bpe per-doc token counts, the pack_sequences binning rule,
    and the round-12 epoch-shuffle mix — plus the trainer invariants
    (shard sizes within 1, rank ranges partition 1..T, token total
    conserved)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from news_graph_rag_spark.pipeline.bpe import apply_bpe
    from news_graph_rag_spark.queries import registry
    from news_graph_rag_spark.queries.round12 import _CHECKSUM_MOD, _EPOCH
    from news_graph_rag_spark.queries.round13 import (
        _EXPORT_MERGES,
        _TPE_BUDGET,
        _TPE_SHARDS,
    )

    texts = {
        1: "the slower window order flow went lower",
        2: "fast fast fast aggregation over every order " * 40,
        3: None,
        4: "",
        5: "erst erster lowest snow flower " * 25,
        6: "a b c d e f g h i j k l m n o p q r s t u v w x y z " * 10,
        7: "partition pruning keeps the scan narrow " * 30,
    }
    pq.write_table(
        pa.table(
            {
                "doc_id": list(texts),
                "text": [texts[d] for d in texts],
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    docs = spark.read.parquet(str(tmp_path / "documents.parquet"))
    # piece 1: the REAL tokenizer's per-doc counts
    counts = {
        r["doc_id"]: r["n_tokens"]
        for r in apply_bpe(docs, _EXPORT_MERGES).collect()
    }
    # piece 2: pack_sequences' exclusive-cumsum binning rule
    bins: dict = {}
    run = 0
    for d in sorted(counts):
        b = run // _TPE_BUDGET
        s = bins.setdefault(b, [0, 0])
        s[0] += 1
        s[1] += counts[d]
        run += counts[d]
    # piece 3: the round-12 shuffle mix over bins
    mix = lambda v: (  # noqa: E731
        (((v % 2147483648) * 1103515245 + 12345 + _EPOCH * 7919) % 2147483648)
        * 69069
        + 1
    ) % 2147483648
    order = sorted(bins, key=lambda b: (mix(b), b))
    t = len(order)
    want: dict = {}
    for rnk, b in enumerate(order, start=1):
        sid = (rnk - 1) * _TPE_SHARDS // t
        s = want.setdefault(sid, [0, 0, 0, 0])
        s[0] += 1
        s[1] += bins[b][0]
        s[2] += bins[b][1]
        s[3] += (mix(b) + b) % _CHECKSUM_MOD
    got = {
        r["shard_id"]: [r["n_sequences"], r["n_docs"], r["n_tokens"], r["checksum"]]
        for r in registry()["tokenize_pack_export"]
        .fn(spark, str(tmp_path))
        .collect()
    }
    assert got == {k: list(v) for k, v in want.items()}
    assert sum(v[1] for v in got.values()) == len(texts)
    assert sum(v[2] for v in got.values()) == sum(counts.values())
    sizes = [v[0] for v in got.values()]
    assert max(sizes) - min(sizes) <= 1


def test_gbt_2round_matches_exhaustive_python(spark, tmp_path):
    """Round-14 differential (VERDICT r13 #3): one boosting round —
    depth-2 Gini tree A on y, exact-integer residual classes
    rA = y·nA − pA, depth-2 Gini tree B on (rA > 0) — vs a brute-force
    two-tree Python trainer using the SAME gain arithmetic, compared
    on the combined (node_a, node_b) readout. The Fraction guard from
    the depth-3 differential carries over: no distinct-gain candidate
    pair collides in double on this fixture."""
    import datetime as dt
    import math
    import random
    from fractions import Fraction

    import pyarrow as pa
    import pyarrow.parquet as pq

    from news_graph_rag_spark.queries import registry

    rng = random.Random(31)
    n = 220
    prices = [rng.uniform(900, 510000) for _ in range(n)] + [4100.0] * 4
    m = len(prices)
    custs = [rng.randrange(1, 4000) for _ in range(m)]
    dates = [
        dt.datetime(1992 + rng.randrange(0, 5), rng.randrange(1, 13), 9)
        for _ in range(m)
    ]
    prios = [
        rng.choice(["1-URGENT", "2-HIGH", "3-MEDIUM", "5-LOW"])
        for _ in range(m)
    ]
    pq.write_table(
        pa.table(
            {
                "o_orderkey": list(range(1, m + 1)),
                "o_custkey": custs,
                "o_orderstatus": ["O"] * m,
                "o_totalprice": prices,
                "o_orderdate": dates,
                "o_orderpriority": prios,
            }
        ),
        str(tmp_path / "orders.parquet"),
    )
    rows = [
        (
            int(math.floor(p * 100)),
            c % 97,
            (d.year - 1992) * 12 + d.month - 1,
            1 if pr in ("1-URGENT", "2-HIGH") else 0,
        )
        for p, c, d, pr in zip(prices, custs, dates, prios)
    ]

    def best_split(subset):
        p = sum(r[3] for r in subset)
        nn = len(subset) - p
        best, seen = None, {}
        for fid in range(3):
            xs = sorted(set(r[fid] for r in subset))
            for thr in xs:
                cp = sum(1 for r in subset if r[fid] <= thr and r[3] == 1)
                cn = sum(1 for r in subset if r[fid] <= thr and r[3] == 0)
                lt, rt = cp + cn, (p + nn) - (cp + cn)
                if rt == 0:
                    continue
                s = cp * nn - cn * p
                gain = float(s) * float(s) / float(lt * rt)
                seen[Fraction(s * s, lt * rt)] = gain
                key = (-gain, fid, thr)
                if best is None or key < best:
                    best = key
        if best is not None:
            assert len(seen) == len(set(seen.values()))
        return best  # (-gain, fid, thr) or None

    def train_depth2(rows_in):
        """leaf -> rows, with the engine's inner-join drop semantics
        (rows of a node with no candidates vanish)."""
        nodes = {1: list(rows_in)}
        for _ in range(2):
            nxt: dict = {}
            for node, subset in sorted(nodes.items()):
                b = best_split(subset)
                if b is None:
                    continue
                fid, thr = b[1], b[2]
                nxt[2 * node] = [r for r in subset if r[fid] <= thr]
                nxt[2 * node + 1] = [r for r in subset if r[fid] > thr]
            nodes = {k: v for k, v in nxt.items() if v}
        return nodes

    # boosting round 1
    leaves_a = train_depth2(rows)
    # exact-integer residuals -> sign classes, tagged with provenance
    rows_b = []
    for node_a, subset in leaves_a.items():
        n_a, p_a = len(subset), sum(r[3] for r in subset)
        for r in subset:
            ra = r[3] * n_a - p_a
            rows_b.append(
                (r[0], r[1], r[2], 1 if ra > 0 else 0, node_a, r[3], ra)
            )
    # boosting round 2 (label = index 3, the residual class)
    leaves_b = train_depth2(rows_b)
    want: dict = {}
    for node_b, subset in leaves_b.items():
        for r in subset:
            key = (r[4], node_b)
            s = want.setdefault(key, [0, 0, 0, 0])
            s[0] += 1
            s[1] += r[5]
            s[2] += r[6]
            s[3] += r[3]
    got = {
        (r["node_a"], r["node_b"]): [
            r["n_rows"],
            r["n_pos"],
            r["resid_num"],
            r["n_resid_pos"],
        ]
        for r in registry()["gbt_2round_orders"]
        .fn(spark, str(tmp_path))
        .collect()
    }
    assert got == {k: list(v) for k, v in want.items()}
    # conservation: every surviving row lands in exactly one cell
    assert sum(v[0] for v in got.values()) == sum(
        len(s) for s in leaves_b.values()
    )


def test_tokenize_export_readback_matches_python_and_prewrite(spark, tmp_path):
    """Round-14 (VERDICT r13 #2): the token-id shards WRITTEN to disk
    must carry the real ids — the readback entry's manifest is checked
    against (a) a pure-Python replay of tokenize → vocab → encode →
    pack → shuffle → shard built from apply_bpe's own token arrays,
    and (b) the PRE-WRITE frame's manifest computed directly (write →
    read round-trip loses nothing). Also pins the physical layout:
    one shard_id=N directory per shard."""
    import glob
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from news_graph_rag_spark.pipeline.bpe import apply_bpe
    from news_graph_rag_spark.queries import registry
    from news_graph_rag_spark.queries.round12 import _CHECKSUM_MOD, _EPOCH
    from news_graph_rag_spark.queries.round13 import (
        _EXPORT_MERGES,
        _TPE_BUDGET,
        _TPE_SHARDS,
    )
    from news_graph_rag_spark.queries.round14 import (
        _staged_token_shards,
        _tpe_ids,
    )

    texts = {
        1: "the slower window order flow went lower",
        2: "fast fast fast aggregation over every order " * 40,
        3: None,
        4: "",
        5: "erst erster lowest snow flower " * 25,
        6: "a b c d e f g h i j k l m n o p q r s t u v w x y z " * 10,
        7: "partition pruning keeps the scan narrow " * 30,
    }
    pq.write_table(
        pa.table(
            {"doc_id": list(texts), "text": [texts[d] for d in texts]}
        ),
        str(tmp_path / "documents.parquet"),
    )
    docs = spark.read.parquet(str(tmp_path / "documents.parquet"))
    toks = {
        r["doc_id"]: list(r["tokens"])
        for r in apply_bpe(docs, _EXPORT_MERGES).collect()
    }
    vocab = {t: i for i, t in enumerate(sorted({t for v in toks.values() for t in v}))}
    ids = {d: [vocab[t] for t in v] for d, v in toks.items()}
    # pack (exclusive cumsum in doc_id order), per bin: docs/tokens/idsum
    bins: dict = {}
    run = 0
    for d in sorted(ids):
        b = run // _TPE_BUDGET
        s = bins.setdefault(b, [0, 0, 0])
        s[0] += 1
        s[1] += len(ids[d])
        s[2] += sum(ids[d])
        run += len(ids[d])
    mix = lambda v: (  # noqa: E731
        (((v % 2147483648) * 1103515245 + 12345 + _EPOCH * 7919) % 2147483648)
        * 69069
        + 1
    ) % 2147483648
    order = sorted(bins, key=lambda b: (mix(b), b))
    t = len(order)
    want: dict = {}
    for rnk, b in enumerate(order, start=1):
        sid = (rnk - 1) * _TPE_SHARDS // t
        s = want.setdefault(sid, [0, 0, 0, 0])
        s[0] += 1
        s[1] += bins[b][0]
        s[2] += bins[b][1]
        s[3] += bins[b][2] % _CHECKSUM_MOD
    got = {
        r["shard_id"]: [
            r["n_sequences"],
            r["n_docs"],
            r["n_tokens"],
            r["id_checksum"],
        ]
        for r in registry()["tokenize_export_readback"]
        .fn(spark, str(tmp_path))
        .collect()
    }
    assert got == {k: list(v) for k, v in want.items()}
    assert sum(v[2] for v in got.values()) == sum(len(v) for v in ids.values())

    # (b) readback == pre-write manifest, computed from the frame that
    # was written (the round-trip itself is what this pins)
    pre = _tpe_ids(spark, str(tmp_path))
    pre_manifest = {
        r["shard_id"]: [
            r["n_sequences"],
            r["n_docs"],
            r["n_tokens"],
            r["id_checksum"],
        ]
        for r in pre.groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_sequences"),
            F.sum("n_docs").cast("bigint").alias("n_docs"),
            F.sum(F.size("seq")).cast("bigint").alias("n_tokens"),
            F.sum(
                F.aggregate(
                    "seq", F.lit(0).cast("bigint"), lambda a, x: a + x
                )
                % _CHECKSUM_MOD
            )
            .cast("bigint")
            .alias("id_checksum"),
        )
        .collect()
    }
    assert got == pre_manifest
    # packing invariant on the pre-write frame: the stored count column
    # equals the stored array's length on every sequence
    bad = pre.filter(F.size("seq") != F.col("n_tokens")).count()
    assert bad == 0
    # physical layout: one shard_id=N dir per shard
    stage = _staged_token_shards(spark, str(tmp_path))
    dirs = sorted(
        int(os.path.basename(p).split("=")[1])
        for p in glob.glob(os.path.join(stage, "shard_id=*"))
    )
    assert dirs == sorted(got)


def test_gbt_3round_holdout_matches_exhaustive_python(spark, tmp_path):
    """Round-16 differential (VERDICT r15 #6): R=3 boosting rounds on
    the md5 TRAIN bucket — round 1 a depth-2 Gini tree on y, rounds
    2-3 on the sign of the exact composite-cell residual — then every
    HOLDOUT row walked through all recorded splits and scored against
    the train cell majorities, vs a brute-force Python trainer using
    the same gain arithmetic, drop semantics, and split rule. The
    Fraction guard from the depth-3 differential carries over."""
    import datetime as dt
    import hashlib
    import math
    import random
    from fractions import Fraction

    import pyarrow as pa
    import pyarrow.parquet as pq

    from news_graph_rag_spark.queries import registry

    rng = random.Random(47)
    n = 260
    prices = [rng.uniform(900, 510000) for _ in range(n)] + [7300.0] * 4
    m = len(prices)
    custs = [rng.randrange(1, 4000) for _ in range(m)]
    dates = [
        dt.datetime(1992 + rng.randrange(0, 5), rng.randrange(1, 13), 9)
        for _ in range(m)
    ]
    prios = [
        rng.choice(["1-URGENT", "2-HIGH", "3-MEDIUM", "5-LOW"])
        for _ in range(m)
    ]
    pq.write_table(
        pa.table(
            {
                "o_orderkey": list(range(1, m + 1)),
                "o_custkey": custs,
                "o_orderstatus": ["O"] * m,
                "o_totalprice": prices,
                "o_orderdate": dates,
                "o_orderpriority": prios,
            }
        ),
        str(tmp_path / "orders.parquet"),
    )
    feats = [
        (
            int(math.floor(p * 100)),
            c % 97,
            (d.year - 1992) * 12 + d.month - 1,
            1 if pr in ("1-URGENT", "2-HIGH") else 0,
        )
        for p, c, d, pr in zip(prices, custs, dates, prios)
    ]
    is_train = [
        hashlib.md5(str(k).encode()).hexdigest()[0] <= "b"
        for k in range(1, m + 1)
    ]

    def best_split(subset, label):
        p = sum(r[label] for r in subset)
        nn = len(subset) - p
        best, seen = None, {}
        for fid in range(3):
            for thr in sorted(set(r[fid] for r in subset)):
                cp = sum(1 for r in subset if r[fid] <= thr and r[label] == 1)
                cn = sum(1 for r in subset if r[fid] <= thr and r[label] == 0)
                lt, rt = cp + cn, (p + nn) - (cp + cn)
                if rt == 0:
                    continue
                s = cp * nn - cn * p
                gain = float(s) * float(s) / float(lt * rt)
                seen[Fraction(s * s, lt * rt)] = gain
                key = (-gain, fid, thr)
                if best is None or key < best:
                    best = key
        if best is not None:
            assert len(seen) == len(set(seen.values()))
        return best

    def train_depth2(rows_in, label):
        """node -> rows, engine drop semantics; also returns the split
        map {node: (fid, thr)} for the holdout walk."""
        nodes, splits = {1: list(rows_in)}, {}
        for _ in range(2):
            nxt: dict = {}
            for node, subset in sorted(nodes.items()):
                b = best_split(subset, label)
                if b is None:
                    continue
                splits[node] = (b[1], b[2])
                fid, thr = b[1], b[2]
                nxt[2 * node] = [r for r in subset if r[fid] <= thr]
                nxt[2 * node + 1] = [r for r in subset if r[fid] > thr]
            nodes = {k: v for k, v in nxt.items() if v}
        return nodes, splits

    # ----- R=3 rounds on the train bucket, composite-cell recursion
    train_rows = [
        list(f) + [f[3]] for f, t in zip(feats, is_train) if t
    ]  # [f0, f1, f2, y_target, y0]; cells appended per round
    split_maps = []
    for rnd in range(3):
        leaves, smap = train_depth2([tuple(r) for r in train_rows], 3)
        split_maps.append(smap)
        survivors = []
        assign = {}
        for node, subset in leaves.items():
            for r in subset:
                assign[r] = node
        nxt_rows = []
        for r in train_rows:
            node = assign.get(tuple(r))
            if node is None:
                continue  # inner-join drop
            nxt_rows.append(r + [node])
        train_rows = nxt_rows
        # composite cells over (n0..n_rnd) on y0, new residual target
        cells: dict = {}
        for r in train_rows:
            key = tuple(r[5 : 6 + rnd])
            s = cells.setdefault(key, [0, 0])
            s[0] += 1
            s[1] += r[4]
        if rnd < 2:
            for r in train_rows:
                nc, pc = cells[tuple(r[5 : 6 + rnd])]
                r[3] = 1 if r[4] * nc - pc > 0 else 0
    cell_stats = cells  # final (n0, n1, n2) -> [n_cell, p_cell]

    # ----- holdout walk through the recorded splits
    want: dict = {}
    for f, t in zip(feats, is_train):
        if t:
            continue
        cell = []
        dropped = False
        for smap in split_maps:
            node = 1
            for _ in range(2):
                if node not in smap:
                    dropped = True
                    break
                fid, thr = smap[node]
                node = 2 * node + (0 if f[fid] <= thr else 1)
            if dropped:
                break
            cell.append(node)
        if dropped or tuple(cell) not in cell_stats:
            continue
        s = want.setdefault(tuple(cell), [0, 0])
        s[0] += 1
        s[1] += f[3]
    expect = {}
    for cell, (n_hold, n_pos) in want.items():
        nc, pc = cell_stats[cell]
        predict = 1 if 2 * pc > nc else 0
        expect[cell] = [
            n_hold,
            n_pos,
            predict,
            n_pos if predict else n_hold - n_pos,
        ]
    got = {
        (r["n0"], r["n1"], r["n2"]): [
            r["n_hold"],
            r["n_hold_pos"],
            r["predict"],
            r["n_correct"],
        ]
        for r in registry()["gbt_3round_holdout_stats"]
        .fn(spark, str(tmp_path))
        .collect()
    }
    assert got == {k: list(v) for k, v in expect.items()} and got
