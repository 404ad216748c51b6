"""Ingestion (D1-D8) tests: graph shape, uid determinism, idempotency
(the Cypher MERGE guarantee), and the golden 2-hop exemplar query from
the reference LLM prompt (chat.py:25), run as DataFrame AND spark.sql."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from news_graph_rag_spark.graph_store import GraphStore
from news_graph_rag_spark.ingest.embedder import HashEmbedder
from news_graph_rag_spark.ingest.ner import GazetteerModel
from news_graph_rag_spark.ingest.upserts import ingest_articles

from fixtures import GAZETTEER, raw_articles_df


@pytest.fixture(scope="module")
def store(spark):
    raw = raw_articles_df(spark)
    s = ingest_articles(
        GraphStore.empty(spark),
        raw,
        ner_model_factory=lambda: GazetteerModel(GAZETTEER),
        encoder_factory=lambda: HashEmbedder(dim=32),
    )
    # materialize all tables once
    s.tables = {k: v.cache() for k, v in s.tables.items()}
    for df in s.tables.values():
        df.count()
    return s


def _table_fingerprint(store):
    out = {}
    for name, df in sorted(store.tables.items()):
        rows = sorted(map(str, df.collect()))
        out[name] = rows
    return out


def test_graph_shape(store):
    assert store["article"].count() == 3
    assert store["source"].count() == 2  # Example News reused by a1+a3
    assert store["published"].count() == 3
    # authors: Alice, Bob, fallback 'World Wire' (a2 has none)
    names = {r["name"] for r in store["person"].collect()}
    assert {"Alice Writer", "Bob Reporter", "World Wire"} <= names
    # NER found gazetteer entities
    assert {r["name"] for r in store["organization"].collect()} >= {
        "European Union",
        "BRICS",
        "NATO",
    }
    assert {r["name"] for r in store["location"].collect()} >= {"France", "Berlin"}
    # every chunk belongs to exactly one article
    chunks = store["chunk"].count()
    assert store["contains"].count() == chunks
    # embeddings attached and sized
    dims = store["chunk"].select(F.size("embedding").alias("d")).distinct().collect()
    assert [r["d"] for r in dims] == [32]


def test_uniqueness_constraints(store):
    for table in ("article", "chunk", "person", "organization", "location",
                  "source", "topic", "contains", "mentions", "authored",
                  "has_topic", "published"):
        store.assert_unique(table)


def test_idempotent_reingest(spark, store):
    raw = raw_articles_df(spark)
    again = ingest_articles(
        store,
        raw,
        ner_model_factory=lambda: GazetteerModel(GAZETTEER),
        encoder_factory=lambda: HashEmbedder(dim=32),
    )
    assert _table_fingerprint(again) == _table_fingerprint(store)


EXPECTED_TITLES = {
    "EU summit: von der Leyen outlines budget",
    "France and Macron: a profile",
}


def test_golden_2hop_exemplar_dataframe(store):
    """chat.py:25: DISTINCT titles of articles whose chunks mention
    Emmanuel Macron (Person), LIMIT 10."""
    a = store["article"].alias("a")
    c = store["contains"].alias("c")
    m = store["mentions"].alias("m")
    p = (
        store["person"]
        .filter(F.col("name").isin("Emmanuel Macron", "E. Macron"))
        .alias("p")
    )
    hits = (
        a.join(c, F.col("a.uid") == F.col("c.src_uid"))
        .join(m, F.col("c.dst_uid") == F.col("m.src_uid"))
        .join(F.broadcast(p), F.col("m.dst_uid") == F.col("p.uid"))
        .select("a.title")
        .distinct()
        .limit(10)
    )
    assert {r["title"] for r in hits.collect()} == EXPECTED_TITLES


def test_golden_2hop_exemplar_sql(store):
    store.register_views()
    got = store.spark.sql(
        """
        SELECT DISTINCT a.title
        FROM article a
        JOIN contains c ON a.uid = c.src_uid
        JOIN mentions m ON c.dst_uid = m.src_uid
        JOIN person p ON m.dst_uid = p.uid
        WHERE p.name IN ('Emmanuel Macron', 'E. Macron')
        LIMIT 10
        """
    ).collect()
    assert {r["title"] for r in got} == EXPECTED_TITLES


def test_schema_string_renders(store):
    s = store.schema_string()
    assert "article (:Article)" in s
    assert "(:Chunk)-[:MENTIONS]->(:Person|Organization|Location)" in s


def test_save_load_roundtrip(tmp_path, spark, store):
    root = str(tmp_path / "graph")
    store.save(root)
    loaded = GraphStore.load(spark, root)
    assert loaded["article"].count() == store["article"].count()
    assert set(loaded["chunk"].columns) == set(store["chunk"].columns)


# ---- S1 jsonl source + S5 quarantine ------------------------------------


def test_jsonl_source_and_quarantine(spark, tmp_path):
    import json

    from news_graph_rag_spark.ingest.quarantine import (
        read_raw_articles_jsonl,
        validate_raw_articles,
        write_rejected,
    )

    lines = [
        {  # valid
            "url": "https://n.example/ok",
            "title": "Fine article",
            "publishing_date": "2024-05-01T12:00:00",
            "language": "en",
            "summary": ["s"],
            "sections": [{"headline": ["h"], "paragraphs": ["p"]}],
            "topics": [],
            "authors": ["A"],
            "source_name": "N",
            "source_type": "site",
            "source_url": "https://n.example",
        },
        {  # missing url + title
            "url": "",
            "title": None,
            "language": "en",
            "summary": ["s"],
            "sections": [],
        },
        {  # no content + bad language
            "url": "https://n.example/empty",
            "title": "Empty",
            "language": "english",
            "summary": [],
            "sections": [],
        },
    ]
    src = tmp_path / "dump.jsonl"
    src.write_text("\n".join(json.dumps(x) for x in lines) + "\nNOT JSON AT ALL\n")

    raw = read_raw_articles_jsonl(spark, str(src))
    assert raw.count() == 4  # corrupt line kept, not dropped

    valid, rejected = validate_raw_articles(raw)
    assert valid.count() == 1
    rej = {r["url"]: set(r["reject_reasons"]) for r in rejected.collect()}
    assert rej[""] == {"missing_url", "missing_title"}
    assert rej["https://n.example/empty"] == {"no_content", "bad_language"}
    assert set(rej[None]) >= {"missing_url", "missing_title", "no_content"}

    write_rejected(rejected, str(tmp_path))
    back = spark.read.parquet(str(tmp_path / "_rejected"))
    assert back.count() == 3
    assert "rejected_at" in back.columns
    # the valid side flows into the normal ingest unchanged
    from news_graph_rag_spark.graph_store import GraphStore
    from news_graph_rag_spark.ingest.upserts import ingest_articles

    store = ingest_articles(GraphStore.empty(spark), valid)
    assert store["article"].count() == 1


def test_random_uid_shape_and_nondeterminism(spark):
    """random_uid reproduces the reference's 'Label:12char' uid shape
    AND its urlsafe-b64 alphabet (utils.py:10-11: b64-encoded uuid
    bytes, so A-Za-z0-9-_ — ~72 bits over 12 chars) and is random per
    row — the documented non-idempotent alternative to content_uid."""
    import re

    from news_graph_rag_spark.graph_store import random_uid

    df = spark.range(200).select(random_uid("Article").alias("uid"))
    uids = [r["uid"] for r in df.collect()]
    assert all(re.fullmatch(r"Article:[A-Za-z0-9_-]{12}", u) for u in uids)
    assert len(set(uids)) == 200  # random per row
    # the alphabet is genuinely wider than hex: over 200 uids some char
    # outside [0-9a-f] must appear (P(miss) < 1e-40 for b64 uuids)
    assert any(re.search(r"[^0-9a-f:]", u.split(":")[1]) for u in uids)


# ---------------------------------------------------------------------------
# Exactly-once commit protocol (VERDICT r6 #6): version-dir + atomic
# pointer replace. Readers see a complete committed store or the
# complete previous one — never a torn multi-table mix.
# ---------------------------------------------------------------------------


def _mini_store(spark, texts):
    from news_graph_rag_spark.graph_store import ALL_TABLES, GraphStore

    s = GraphStore.empty(spark)
    s.tables = dict(s.tables)
    s["article"] = spark.createDataFrame(
        [(f"Article:{i:012x}", t, None, "en", f"u{i}") for i, t in enumerate(texts)],
        ALL_TABLES["article"],
    )
    return s


def test_save_atomic_crash_before_publish_leaves_old_store(spark, tmp_path, monkeypatch):
    """Kill the writer between staging the new version and the pointer
    replace: readers still load the complete OLD store (no partial
    table, no mixed versions), and a replayed save converges."""
    import os

    from news_graph_rag_spark import graph_store as gs

    root = str(tmp_path / "store")
    _mini_store(spark, ["one"]).save_atomic(root)
    assert GraphStore.load(spark, root)["article"].count() == 1

    real_replace = os.replace

    def exploding_replace(src, dst):
        if dst.endswith(gs.GraphStore._POINTER):
            raise RuntimeError("simulated crash between stage and swap")
        return real_replace(src, dst)

    monkeypatch.setattr(gs.os, "replace", exploding_replace)
    with pytest.raises(RuntimeError):
        _mini_store(spark, ["one", "two", "three"]).save_atomic(root)
    # reader sees the old committed state, fully intact
    loaded = GraphStore.load(spark, root)
    assert loaded["article"].count() == 1
    assert [r["title"] for r in loaded["article"].collect()] == ["one"]

    # replay (idempotent writer) converges once the fault clears
    monkeypatch.setattr(gs.os, "replace", real_replace)
    _mini_store(spark, ["one", "two", "three"]).save_atomic(root)
    assert GraphStore.load(spark, root)["article"].count() == 3


def test_save_atomic_crash_mid_table_write_leaves_old_store(spark, tmp_path):
    """Kill the writer while a TABLE is being staged (before any
    publish): the old store stays fully visible and the aborted
    version dir is cleaned up."""
    import os

    from news_graph_rag_spark.graph_store import ALL_TABLES

    root = str(tmp_path / "store2")
    _mini_store(spark, ["base"]).save_atomic(root)

    bad = _mini_store(spark, ["base", "next"])

    # a table whose WRITE JOB fails at execution time (mid-save crash)
    def boom(batches):
        raise RuntimeError("simulated mid-write crash")
        yield  # pragma: no cover

    schema = ALL_TABLES["chunk"]
    bad["chunk"] = spark.createDataFrame(
        [("Chunk:x", "t", "paragraph", 0, 0, None)], schema
    ).mapInPandas(boom, schema)
    with pytest.raises(Exception):
        bad.save_atomic(root)
    loaded = GraphStore.load(spark, root)
    assert [r["title"] for r in loaded["article"].collect()] == ["base"]
    # the aborted version dir was cleaned: the only v_* left is the one
    # the (still-valid) pointer names; no pointer-staging litter either
    with open(os.path.join(root, "_CURRENT")) as f:
        committed = f.read().strip()
    vdirs = [d for d in os.listdir(root) if d.startswith("v_")]
    assert vdirs == [committed]
    assert [d for d in os.listdir(root) if d.startswith("_CURRENT.tmp")] == []


def test_save_atomic_versions_gc_and_predecessor_survives(spark, tmp_path):
    """Each commit keeps exactly current + predecessor version dirs, so
    a reader that resolved the pointer just before a swap still finds
    its files; older versions are garbage-collected."""
    import os

    root = str(tmp_path / "store3")
    for i in range(4):
        _mini_store(spark, [f"t{j}" for j in range(i + 1)]).save_atomic(root)
    vdirs = sorted(d for d in os.listdir(root) if d.startswith("v_"))
    assert len(vdirs) == 2  # current + predecessor only
    assert GraphStore.load(spark, root)["article"].count() == 4


def test_save_atomic_time_travel_predecessor_readable(spark, tmp_path):
    """The retained predecessor version is time-travel readable while
    the pointer serves the new commit — and list_versions orders them."""
    from news_graph_rag_spark.graph_store import GraphStore

    root = str(tmp_path / "tt")
    _mini_store(spark, ["v1-only"]).save_atomic(root)
    _mini_store(spark, ["v1-only", "v2-added"]).save_atomic(root)

    versions = GraphStore.list_versions(root)
    assert len(versions) == 2
    old = GraphStore.load_version(spark, root, versions[0])
    new = GraphStore.load(spark, root)
    assert [r["title"] for r in old["article"].collect()] == ["v1-only"]
    assert new["article"].count() == 2
    with pytest.raises(FileNotFoundError):
        GraphStore.load_version(spark, root, "v_000000000099_dead")


def test_save_atomic_random_crash_retry_converges(spark, tmp_path, monkeypatch):
    """System-level exactly-once sweep: inject a failure at a random
    protocol stage (a table's write job, the pointer fsync, the pointer
    replace) on every other attempt, retrying after each crash. At all
    times load() must return a complete previously-committed state, and
    the final retry must converge to the intended data."""
    import os
    import random

    from news_graph_rag_spark import graph_store as gs
    from news_graph_rag_spark.graph_store import ALL_TABLES

    root = str(tmp_path / "sweep")
    rng = random.Random(13)
    real_replace, real_fsync = os.replace, os.fsync
    committed_titles = None  # what load() must show at every point

    def boom_kernel(batches):
        raise RuntimeError("injected table-write crash")
        yield  # pragma: no cover

    for step in range(1, 6):
        titles = [f"t{j}" for j in range(step)]
        target = _mini_store(spark, titles)
        fail = rng.choice(["table", "fsync", "replace", None])
        if fail == "table":
            schema = ALL_TABLES["chunk"]
            target["chunk"] = spark.createDataFrame(
                [("Chunk:x", "t", "paragraph", 0, 0, None)], schema
            ).mapInPandas(boom_kernel, schema)
        elif fail == "fsync":
            monkeypatch.setattr(
                gs.os, "fsync", lambda fd: (_ for _ in ()).throw(OSError("ENOSPC"))
            )
        elif fail == "replace":
            def exploding(src, dst):
                if dst.endswith(gs.GraphStore._POINTER):
                    raise RuntimeError("crash at publish")
                return real_replace(src, dst)

            monkeypatch.setattr(gs.os, "replace", exploding)

        try:
            target.save_atomic(root)
            committed_titles = titles
        except Exception:
            pass  # crashed attempt: commit state must be unchanged
        finally:
            monkeypatch.setattr(gs.os, "replace", real_replace)
            monkeypatch.setattr(gs.os, "fsync", real_fsync)

        loaded = sorted(
            r["title"] for r in GraphStore.load(spark, root)["article"].collect()
        ) if committed_titles is not None else None
        if committed_titles is not None:
            assert loaded == sorted(committed_titles), f"step {step} ({fail})"

        if fail is not None:  # retry cleanly — must converge
            _mini_store(spark, titles).save_atomic(root)
            committed_titles = titles
            got = sorted(
                r["title"]
                for r in GraphStore.load(spark, root)["article"].collect()
            )
            assert got == sorted(titles), f"retry after {fail} at step {step}"


def test_detach_delete_removes_nodes_edges_and_index(spark, tmp_path):
    """Cypher DETACH DELETE semantics (round 8): deleting uids drops
    the nodes, every edge touching them in either direction, leaves
    the rest intact, and (with index_path) tombstones the uids in the
    persistent ANN index so they stop being vector-searchable."""
    import fixtures

    from news_graph_rag_spark.graph_store import GraphStore
    from news_graph_rag_spark.ingest.embedder import HashEmbedder
    from news_graph_rag_spark.ingest.upserts import ingest_articles
    from news_graph_rag_spark.pipeline import ann_index
    from pyspark.sql import functions as F

    store = ingest_articles(
        GraphStore.empty(spark),
        fixtures.raw_articles_df(spark),
        encoder_factory=lambda: HashEmbedder(dim=16),
    )
    idx = str(tmp_path / "chunk_idx")
    chunks = store["chunk"].filter(F.col("embedding").isNotNull()).select(
        "uid", "embedding"
    )
    ann_index.build_uid_index(chunks, idx, n_centroids=2, iters=1)

    victim_chunk = store["contains"].orderBy("dst_uid").first()["dst_uid"]
    victim_article = store["published"].orderBy("dst_uid").first()["dst_uid"]
    before_counts = {n: store[n].count() for n in store.tables}
    touched_edges = {
        n: store[n]
        .filter(
            (F.col("src_uid").isin(victim_chunk, victim_article))
            | (F.col("dst_uid").isin(victim_chunk, victim_article))
        )
        .count()
        for n in ("contains", "mentions", "published", "authored", "has_topic")
    }
    assert touched_edges["contains"] > 0 and touched_edges["published"] > 0

    purged = store.detach_delete([victim_chunk, victim_article], index_path=idx)

    assert purged["chunk"].filter(F.col("uid") == victim_chunk).count() == 0
    assert purged["article"].filter(F.col("uid") == victim_article).count() == 0
    for n, n_touched in touched_edges.items():
        assert purged[n].count() == before_counts[n] - n_touched, n
        assert (
            purged[n]
            .filter(
                (F.col("src_uid").isin(victim_chunk, victim_article))
                | (F.col("dst_uid").isin(victim_chunk, victim_article))
            )
            .count()
            == 0
        )
    # untouched node tables keep their counts minus exactly the victims
    assert purged["chunk"].count() == before_counts["chunk"] - 1
    assert purged["article"].count() == before_counts["article"] - 1
    assert purged["person"].count() == before_counts["person"]

    # the purged chunk is no longer vector-searchable
    probe = chunks.filter(F.col("uid") == victim_chunk).first()["embedding"]
    served = [
        r["uid"]
        for r in ann_index.search_uids_by_vector(
            spark, idx, [float(x) for x in probe], k=10, nprobe=2
        ).collect()
    ]
    assert victim_chunk not in served


def test_merge_adjacent_entities_overlap_pinned():
    """Round-15 (VERDICT r14 #5): the ONE semantic divergence from the
    reference's span merge is a pinned DECISION, not an accident. The
    reference (ner.py:41) merges only exact adjacency (next.start ==
    current.end or current.end + 1); this repo's `<=` also merges
    OVERLAPPING same-label spans into the covering span — asserted
    here on an overlapping pair, alongside the shared adjacency /
    gap / label-mismatch behaviors both implementations agree on."""
    from news_graph_rag_spark.ingest.ner import merge_adjacent_entities

    text = "Deutsche Bank AG"
    overlapping = [
        {"text": "Deutsche Bank", "label": "organization", "start": 0, "end": 13},
        {"text": "Bank AG", "label": "organization", "start": 9, "end": 16},
    ]
    got = merge_adjacent_entities(text, overlapping)
    assert len(got) == 1  # the reference would return BOTH spans here
    assert got[0]["text"] == "Deutsche Bank AG"
    assert (got[0]["start"], got[0]["end"]) == (0, 16)

    # behaviors shared with the reference:
    text2 = "New York City hosts Acme Corp"
    adjacent = [
        {"text": "New York", "label": "location", "start": 0, "end": 8},
        {"text": "City", "label": "location", "start": 9, "end": 13},
    ]
    got2 = merge_adjacent_entities(text2, adjacent)
    assert len(got2) == 1 and got2[0]["text"] == "New York City"

    gapped = [
        {"text": "New York", "label": "location", "start": 0, "end": 8},
        {"text": "Acme Corp", "label": "organization", "start": 20, "end": 29},
    ]
    assert len(merge_adjacent_entities(text2, gapped)) == 2

    mixed_label = [
        {"text": "New York", "label": "location", "start": 0, "end": 8},
        {"text": "City", "label": "organization", "start": 9, "end": 13},
    ]
    assert len(merge_adjacent_entities(text2, mixed_label)) == 2


def test_merge_adjacent_entities_contained_span_never_truncates():
    """Round-15 review: a same-label span fully CONTAINED in the
    current one must not shrink the covering span's end — the merge
    invariant is 'the single covering span', so end only grows."""
    from news_graph_rag_spark.ingest.ner import merge_adjacent_entities

    text = "Deutsche Bank AG"
    contained = [
        {"text": "Deutsche Bank AG", "label": "organization", "start": 0, "end": 16},
        {"text": "Bank", "label": "organization", "start": 9, "end": 13},
    ]
    got = merge_adjacent_entities(text, contained)
    assert len(got) == 1
    assert got[0]["text"] == "Deutsche Bank AG"
    assert (got[0]["start"], got[0]["end"]) == (0, 16)


def test_merge_adjacent_entities_strict_adjacency_compat():
    """Round-16 (ADVICE r15 #4): ``strict_adjacency=True`` is the
    byte-parity compatibility mode with the reference's literal rule
    (ner.py:41 — merge ONLY next.start == current.end or current.end
    + 1): overlapping same-label spans pass through unmerged (the
    upstream quirk, reproduced on request), while exact adjacency
    still merges identically in both modes."""
    from news_graph_rag_spark.ingest.ner import merge_adjacent_entities

    text = "Deutsche Bank AG"
    overlapping = [
        {"text": "Deutsche Bank", "label": "organization", "start": 0, "end": 13},
        {"text": "Bank AG", "label": "organization", "start": 9, "end": 16},
    ]
    # default mode merges; strict mode reproduces the reference: both
    # spans survive, texts double-counting the overlap
    assert len(merge_adjacent_entities(text, overlapping)) == 1
    strict = merge_adjacent_entities(text, overlapping, strict_adjacency=True)
    assert [(s["start"], s["end"]) for s in strict] == [(0, 13), (9, 16)]

    # exact adjacency merges in BOTH modes (the agreed behavior)
    text2 = "New York City"
    adjacent = [
        {"text": "New York", "label": "location", "start": 0, "end": 8},
        {"text": "City", "label": "location", "start": 9, "end": 13},
    ]
    got = merge_adjacent_entities(text2, adjacent, strict_adjacency=True)
    assert len(got) == 1 and got[0]["text"] == "New York City"

    # a contained span does not merge under strict adjacency either
    contained = [
        {"text": "Deutsche Bank AG", "label": "organization", "start": 0, "end": 16},
        {"text": "Bank", "label": "organization", "start": 9, "end": 13},
    ]
    strict2 = merge_adjacent_entities(text, contained, strict_adjacency=True)
    assert [(s["start"], s["end"]) for s in strict2] == [(0, 16), (9, 13)]
