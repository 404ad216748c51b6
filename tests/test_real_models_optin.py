"""Opt-in smoke test for the REAL model loaders (VERDICT r8 #5).

The container has no gliner / sentence-transformers wheels, so these
tests SKIP here — they exist so that on any machine where the real
packages ARE installed, the loader adapters (reference ner.py:21-32,
embedding.py:16-18) are proven against the genuine libraries at least
once, end-to-end through ``ingest_articles``: 3 articles →
chunk → real embeddings → real NER → 7-table store. Assertions are
shape/invariant only (dims consistent, spans inside their chunk text,
scores in range) — never golden values, since real model outputs vary
by version.

Run explicitly with:  pytest tests/test_real_models_optin.py -m realmodel
(also included in a plain run when the packages are importable).
"""

from __future__ import annotations

import pytest

from news_graph_rag_spark.graph_store import GraphStore
from news_graph_rag_spark.ingest.embedder import load_sentence_transformer
from news_graph_rag_spark.ingest.ner import load_gliner_model
from news_graph_rag_spark.ingest.upserts import ingest_articles

from fixtures import raw_articles_df

pytestmark = pytest.mark.realmodel


@pytest.fixture(scope="module")
def real_encoder():
    pytest.importorskip("sentence_transformers")
    fn = load_sentence_transformer()
    if fn is None:  # installed but failed to load (no weights / offline)
        pytest.skip("sentence_transformers present but model load failed")
    return fn


@pytest.fixture(scope="module")
def real_ner():
    pytest.importorskip("gliner")
    fn = load_gliner_model()
    if fn is None:
        pytest.skip("gliner present but model load failed")
    return fn


def test_real_encoder_shapes(real_encoder):
    vecs = real_encoder(["Ein kurzer Satz.", "Noch einer."])
    assert len(vecs) == 2
    dims = {len(v) for v in vecs}
    assert len(dims) == 1 and dims.pop() > 0
    assert all(isinstance(x, float) for v in vecs for x in v)


def test_real_ner_span_invariants(real_ner):
    text = "Emmanuel Macron met Olaf Scholz in Berlin."
    spans = real_ner(text, ["person", "location"], 0.3)
    for s in spans:
        assert 0 <= s["start"] < s["end"] <= len(text)
        assert text[s["start"] : s["end"]] == s["text"]
        assert 0.0 <= s["score"] <= 1.0
        assert s["label"] in ("person", "location")


def test_real_models_through_ingest(spark, real_encoder, real_ner):
    """The full reference pipeline shape with the real models plugged
    into the same factories the fakes use."""
    store = ingest_articles(
        GraphStore.empty(spark),
        raw_articles_df(spark).limit(3),
        ner_model_factory=lambda: real_ner,
        encoder_factory=lambda: real_encoder,
    )
    chunks = store["chunk"].collect()
    assert chunks, "chunking produced no rows"
    dims = {len(r["embedding"]) for r in chunks}
    assert len(dims) == 1 and dims.pop() > 0, "embedding dims inconsistent"
    # MENTIONS endpoints must resolve to entity rows
    mentions = store["mentions"]
    ents = (
        store["person"]
        .select("uid")
        .unionByName(store["organization"].select("uid"))
        .unionByName(store["location"].select("uid"))
    )
    dangling = mentions.join(
        ents, mentions.dst_uid == ents.uid, "left_anti"
    ).count()
    assert dangling == 0
