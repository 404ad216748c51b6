"""Tests for the live-crawl adapter (ingest/crawler.py) and the chat
app surface (app.py), driven entirely by duck-typed fakes — neither
fundus nor streamlit is installed in CI."""

from __future__ import annotations

import datetime as dt
import json
from dataclasses import dataclass, field

import pytest

from news_graph_rag_spark.app import ask, build_chat
from news_graph_rag_spark.graph_store import GraphStore
from news_graph_rag_spark.ingest.crawler import (
    HAVE_FUNDUS,
    article_to_row,
    articles_to_dataframe,
    crawl,
    crawl_and_ingest,
    dump_articles_jsonl,
)
from news_graph_rag_spark.ingest.quarantine import read_raw_articles_jsonl
from news_graph_rag_spark.llm import FakeLLM


# ---------------------------------------------------------------------------
# fundus-shaped fakes (attribute names follow reference crawler.py:26-45)
# ---------------------------------------------------------------------------


@dataclass
class FakeSection:
    headline: list
    paragraphs: list


@dataclass
class FakeBody:
    summary: list
    sections: list


@dataclass
class FakeSourceInfo:
    publisher: str
    type: str
    url: str


@dataclass
class FakeHTML:
    requested_url: str
    source_info: FakeSourceInfo


@dataclass
class FakeArticle:
    html: FakeHTML
    title: str
    body: FakeBody
    lang: str = "en"
    publishing_date: dt.datetime = field(
        default_factory=lambda: dt.datetime(2024, 6, 1, 12, 0, 0)
    )
    topics: list = field(default_factory=list)
    authors: list = field(default_factory=list)


def make_article(i: int, title: str | None = "T") -> FakeArticle:
    return FakeArticle(
        html=FakeHTML(
            requested_url=f"https://ex.com/a{i}",
            source_info=FakeSourceInfo("Example News", "news", "https://ex.com"),
        ),
        title=f"{title} {i}" if title else None,
        body=FakeBody(
            summary=[f"Summary {i}."],
            sections=[FakeSection(["H"], [f"Paragraph one of {i}.", "More text."])],
        ),
        topics=["politics"],
        authors=["Alice Writer"],
    )


def test_article_to_row_maps_all_fields():
    row = article_to_row(make_article(1))
    assert row["url"] == "https://ex.com/a1"
    assert row["title"] == "T 1"
    assert row["language"] == "en"
    assert row["summary"] == ["Summary 1."]
    assert row["sections"][0]["paragraphs"][0] == "Paragraph one of 1."
    assert row["source_name"] == "Example News"
    assert row["authors"] == ["Alice Writer"]


def test_article_to_row_normalizes_tz_aware_dates():
    a = make_article(2)
    a.publishing_date = dt.datetime(
        2024, 6, 1, 14, 0, 0, tzinfo=dt.timezone(dt.timedelta(hours=2))
    )
    row = article_to_row(a)
    assert row["publishing_date"] == dt.datetime(2024, 6, 1, 12, 0, 0)


def test_articles_to_dataframe_schema(spark):
    df = articles_to_dataframe(spark, [make_article(i) for i in range(3)])
    assert df.count() == 3
    assert "sections" in df.columns and "source_url" in df.columns
    assert df.schema["publishing_date"].dataType.typeName() == "timestamp"


def test_crawl_requires_fundus():
    if HAVE_FUNDUS:  # pragma: no cover - fundus absent in CI
        pytest.skip("fundus installed")
    with pytest.raises(RuntimeError, match="fundus"):
        next(crawl())


def test_crawl_and_ingest_quarantines_bad_articles(spark):
    good = [make_article(i) for i in range(4)]
    bad = make_article(99, title=None)  # missing_title -> quarantine
    store = GraphStore.empty(spark)
    store, n_valid, n_rejected = crawl_and_ingest(
        store, good + [bad], batch_size=2
    )
    assert (n_valid, n_rejected) == (4, 1)
    assert store["article"].count() == 4
    # re-ingest is idempotent (MERGE semantics): same counts
    store2, _, _ = crawl_and_ingest(store, good, batch_size=3)
    assert store2["article"].count() == 4
    assert store2["contains"].count() == store["contains"].count()


def test_dump_jsonl_roundtrips_through_distributed_reader(spark, tmp_path):
    path = str(tmp_path / "crawl.jsonl")
    n = dump_articles_jsonl([make_article(i) for i in range(5)], path)
    assert n == 5
    with open(path) as f:
        first = json.loads(f.readline())
    assert first["publishing_date"] == "2024-06-01T12:00:00"
    df = read_raw_articles_jsonl(spark, path)
    assert df.count() == 5
    rows = df.select("url", "publishing_date").orderBy("url").collect()
    assert rows[0]["publishing_date"] == dt.datetime(2024, 6, 1, 12, 0, 0)


# ---------------------------------------------------------------------------
# app surface
# ---------------------------------------------------------------------------


def test_build_chat_and_ask(spark, tmp_path):
    store = GraphStore.empty(spark)
    store, _, _ = crawl_and_ingest(store, [make_article(i) for i in range(3)])
    root = str(tmp_path / "graph")
    store.save_atomic(root)
    llm = FakeLLM(fallback="SELECT title FROM article LIMIT 10")
    chat = build_chat(spark=spark, graph_root=root, llm=llm)
    sql, answer = ask(chat, "List article titles")
    assert sql == "SELECT title FROM article LIMIT 10"
    assert answer  # FakeLLM echoes something non-empty for the answer turn
    assert len(chat.last["records"]) == 3


def test_build_chat_requires_root(spark, monkeypatch):
    monkeypatch.delenv("NEWS_GRAPH_ROOT", raising=False)
    with pytest.raises(ValueError, match="graph_root"):
        build_chat(spark=spark)


def test_run_streamlit_gated():
    from news_graph_rag_spark.app import run_streamlit

    try:
        import streamlit  # noqa: F401

        pytest.skip("streamlit installed")  # pragma: no cover
    except ImportError:
        pass
    with pytest.raises(RuntimeError, match="streamlit"):
        run_streamlit(chat=object())


def test_build_chat_default_llm_runs_offline(spark, tmp_path):
    """With no LLM supplied the app still answers end-to-end (canned
    valid SQL), the documented offline default."""
    store = GraphStore.empty(spark)
    store, _, _ = crawl_and_ingest(store, [make_article(7)])
    root = str(tmp_path / "g2")
    store.save_atomic(root)
    chat = build_chat(spark=spark, graph_root=root)
    sql, _ = ask(chat, "Anything?")
    assert sql.startswith("SELECT")
    assert len(chat.last["records"]) == 1


def test_crawl_uses_fundus_when_present(monkeypatch):
    """With a (fake) fundus module installed, crawl() wires the
    reference's publisher set and max_articles through to
    fundus.Crawler(...).crawl(...) (reference crawler.py:19-22)."""
    import types

    from news_graph_rag_spark.ingest import crawler as mod

    calls = {}

    class FakeCrawler:
        def __init__(self, *publishers):
            calls["publishers"] = publishers

        def crawl(self, max_articles):
            calls["max_articles"] = max_articles
            yield from (make_article(i) for i in range(3))

    fake = types.SimpleNamespace(
        Crawler=FakeCrawler,
        PublisherCollection=types.SimpleNamespace(de="DE", uk="UK"),
    )
    monkeypatch.setattr(mod, "fundus", fake)
    monkeypatch.setattr(mod, "HAVE_FUNDUS", True)
    out = list(crawl(max_articles=3))
    assert len(out) == 3
    assert calls["publishers"] == ("DE", "UK")
    assert calls["max_articles"] == 3


def test_crawl_and_ingest_releases_all_caches(spark):
    """Round-7 review finding: the crawl loop's docstring promises
    bounded cached blocks, but ingest_articles caches three
    intermediates per batch (raw, chunks, NER hits) that only the
    pending_caches hand-off releases. Assert the promise directly: no
    NEW persistent RDDs survive a multi-batch crawl."""
    jsc = spark.sparkContext._jsc.sc()
    # other module-scoped fixtures may hold caches — measure the delta
    before = jsc.getPersistentRDDs().size()
    store = GraphStore.empty(spark)
    store, n_valid, _ = crawl_and_ingest(
        store,
        [make_article(100 + i) for i in range(6)],
        batch_size=2,
        checkpoint_every=2,
    )
    assert n_valid == 6 and store["article"].count() == 6
    after = jsc.getPersistentRDDs().size()
    # the only surviving blocks are the LIVE store's own checkpointed
    # tables (one generation) — batch caches, ingest intermediates, and
    # superseded checkpoint generations are all gone
    residual = after - before
    assert residual <= len(store.tables), f"crawl leaked {residual} cached RDD(s)"

    # and the residual does not grow with crawl length: a second,
    # longer crawl leaves the same one-generation footprint
    store2, n2, _ = crawl_and_ingest(
        GraphStore.empty(spark),
        [make_article(200 + i) for i in range(10)],
        batch_size=2,
        checkpoint_every=2,
    )
    assert n2 == 10
    residual2 = jsc.getPersistentRDDs().size() - after
    assert residual2 <= len(store2.tables), f"longer crawl leaked {residual2}"


def test_index_cli_build_stats_search(spark, tmp_path, capsys):
    """The ops CLI drives the persistent chunk index end-to-end: build
    over a saved store's Chunk.embedding, print list stats, and search
    by an indexed chunk uid — the searched chunk comes back rank 1."""
    from news_graph_rag_spark.app import _index_main
    from news_graph_rag_spark.ingest.embedder import HashEmbedder
    from news_graph_rag_spark.ingest.upserts import ingest_articles

    import fixtures

    store = ingest_articles(
        GraphStore.empty(spark),
        fixtures.raw_articles_df(spark),
        encoder_factory=lambda: HashEmbedder(dim=16),
    )
    root = str(tmp_path / "graph")
    store.save_atomic(root)
    idx = str(tmp_path / "chunk_idx")

    assert _index_main(["build", root, idx], spark=spark) == 0
    out = capsys.readouterr().out
    assert "ivf-int8" in out and idx in out

    assert _index_main(["stats", idx], spark=spark) == 0
    out = capsys.readouterr().out
    assert "list " in out and "dim=16" in out

    some_uid = store["chunk"].orderBy("uid").first()["uid"]
    assert _index_main(["search", idx, some_uid, "3"], spark=spark) == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 3 and all("Chunk:" in line for line in out)

    assert _index_main([], spark=spark) == 2  # usage
    capsys.readouterr()

    # round 8: the delete half through the same CLI — tombstone the
    # top hit, it vanishes from search; compact folds it in physically
    top_uid = None
    assert _index_main(["search", idx, some_uid, "3"], spark=spark) == 0
    top_uid = capsys.readouterr().out.strip().splitlines()[0].split()[1]
    assert _index_main(["delete", idx, top_uid], spark=spark) == 0
    assert "tombstoned 1" in capsys.readouterr().out
    assert _index_main(["stats", idx], spark=spark) == 0
    assert "tombstones=1" in capsys.readouterr().out
    assert _index_main(["search", idx, some_uid, "3"], spark=spark) == 0
    masked = capsys.readouterr().out
    assert top_uid not in masked
    assert _index_main(["compact", idx], spark=spark) == 0
    assert "1 rows removed" in capsys.readouterr().out
    assert _index_main(["search", idx, some_uid, "3"], spark=spark) == 0
    assert capsys.readouterr().out == masked  # identical post-fold


def test_index_cli_split(spark, tmp_path, capsys):
    """Round-16: the ops CLI exposes split_list — 'index split <path>'
    splits the hottest list (max occupancy, ties to the smallest id),
    stats then show one more list, every vector still present."""
    from news_graph_rag_spark.app import _index_main
    from news_graph_rag_spark.ingest.embedder import HashEmbedder
    from news_graph_rag_spark.ingest.upserts import ingest_articles

    import fixtures

    store = ingest_articles(
        GraphStore.empty(spark),
        fixtures.raw_articles_df(spark),
        encoder_factory=lambda: HashEmbedder(dim=16),
    )
    root = str(tmp_path / "graph")
    store.save_atomic(root)
    idx = str(tmp_path / "chunk_idx_split")
    assert _index_main(["build", root, idx], spark=spark) == 0
    n_before = int(
        [w for w in capsys.readouterr().out.split() if w.isdigit()][0]
    )
    assert _index_main(["stats", idx], spark=spark) == 0
    lists_before = capsys.readouterr().out.count("list ")

    assert _index_main(["split", idx], spark=spark) == 0
    out = capsys.readouterr().out
    assert "new child list" in out

    assert _index_main(["stats", idx], spark=spark) == 0
    stats = capsys.readouterr().out
    assert stats.count("list ") == lists_before + 1
    n_after = sum(
        int(line.split()[2])  # "list {cid}: {count} vectors"
        for line in stats.strip().splitlines()
        if line.startswith("list ")
    )
    assert n_after == n_before  # every vector conserved across the split


def test_index_cli_retrain_and_compact_files(spark, tmp_path, capsys):
    """Round-17 ops verbs: `index retrain` republishes the same-count
    index with retrain history and identical search semantics on a
    uid index (the uid map carries the swap); `index compact-files`
    reports 0 on an already-compact index and reduces files after
    fragmented appends."""
    import json
    import os

    from news_graph_rag_spark.app import _index_main
    from news_graph_rag_spark.ingest.embedder import HashEmbedder
    from news_graph_rag_spark.ingest.upserts import ingest_articles
    from news_graph_rag_spark.pipeline import ann_index as ai

    import fixtures

    store = ingest_articles(
        GraphStore.empty(spark),
        fixtures.raw_articles_df(spark),
        encoder_factory=lambda: HashEmbedder(dim=16),
    )
    root = str(tmp_path / "graph")
    store.save_atomic(root)
    idx = str(tmp_path / "chunk_idx")
    assert _index_main(["build", root, idx], spark=spark) == 0
    capsys.readouterr()

    some_uid = store["chunk"].orderBy("uid").first()["uid"]
    assert _index_main(["search", idx, some_uid, "3"], spark=spark) == 0
    before = capsys.readouterr().out.strip().splitlines()

    assert _index_main(["retrain", idx], spark=spark) == 0
    out = capsys.readouterr().out
    assert "retrained" in out
    hist = json.load(open(os.path.join(idx, "meta.json")))["retrain_history"]
    assert hist and hist[-1]["rows"] > 0

    # searches still serve and translate uids through the carried map
    # (retrain ≡ rebuild equivalence itself is pinned on real data in
    # tests/test_pipeline.py — this tiny fixture sits in the
    # degenerate fewer-rows-than-centroids regime)
    assert _index_main(["search", idx, some_uid, "3"], spark=spark) == 0
    after = capsys.readouterr().out.strip().splitlines()
    assert len(after) == len(before) == 3
    assert all("Chunk:" in line for line in after)

    # already-compact: clean 0-file report
    assert _index_main(["compact-files", idx], spark=spark) == 0
    out = capsys.readouterr().out
    assert "0 files removed" in out
