"""Interface-contract smoke tests for the real-model loader paths.

GLiNER and sentence-transformers are not installed in this container,
so ``load_gliner_model`` / ``load_sentence_transformer`` normally take
their import-failure branch. These tests inject mock modules that mimic
the REAL libraries' shapes (reference ner.py:6-8, embedding.py:9-18) so
the loader code paths — from_pretrained, predict_entities kwargs,
encode output conversion — are actually executed and their adapters
verified against the pluggable-model contracts.
"""

from __future__ import annotations

import sys
import types

import pytest


@pytest.fixture()
def fake_gliner(monkeypatch):
    mod = types.ModuleType("gliner")

    class GLiNER:
        loaded_with = None

        @classmethod
        def from_pretrained(cls, name):
            cls.loaded_with = name
            return cls()

        def predict_entities(self, text, labels, threshold=0.5):
            # real GLiNER returns dicts with these exact keys
            out = []
            for label in labels:
                probe = {"person": "Ada", "location": "Paris"}.get(label)
                if probe and probe in text:
                    start = text.index(probe)
                    out.append(
                        {
                            "text": probe,
                            "label": label,
                            "start": start,
                            "end": start + len(probe),
                            "score": 0.9,
                        }
                    )
            return [s for s in out if s["score"] >= threshold]

    mod.GLiNER = GLiNER
    monkeypatch.setitem(sys.modules, "gliner", mod)
    return GLiNER


@pytest.fixture()
def fake_sentence_transformers(monkeypatch):
    import numpy as np

    mod = types.ModuleType("sentence_transformers")

    class SentenceTransformer:
        loaded_with = None

        def __init__(self, name, trust_remote_code=False):
            type(self).loaded_with = (name, trust_remote_code)

        def encode(self, texts):
            # real encoder returns a 2-D numpy array of float32
            return np.stack(
                [np.full(4, float(len(t) % 7), dtype="float32") for t in texts]
            )

    mod.SentenceTransformer = SentenceTransformer
    monkeypatch.setitem(sys.modules, "sentence_transformers", mod)
    return SentenceTransformer


def test_load_gliner_model_adapts_real_interface(fake_gliner):
    from news_graph_rag_spark.ingest.ner import EntityFinder, load_gliner_model

    fn = load_gliner_model()
    assert fn is not None
    assert fake_gliner.loaded_with == "urchade/gliner_multi-v2.1"
    spans = fn("Ada went to Paris", ["person", "location"], 0.5)
    assert {(s["text"], s["label"]) for s in spans} == {
        ("Ada", "person"),
        ("Paris", "location"),
    }
    # the adapter plugs into the same EntityFinder as the gazetteer
    finder = EntityFinder(fn, labels=("person", "location"))
    assert ("Ada", "person") in finder.find("Ada went to Paris")


def test_load_gliner_model_absent_returns_none(monkeypatch):
    monkeypatch.setitem(sys.modules, "gliner", None)  # import raises
    from news_graph_rag_spark.ingest.ner import load_gliner_model

    assert load_gliner_model() is None


def test_load_sentence_transformer_adapts_real_interface(
    fake_sentence_transformers,
):
    from news_graph_rag_spark.ingest.embedder import load_sentence_transformer

    fn = load_sentence_transformer()
    assert fn is not None
    assert fake_sentence_transformers.loaded_with == (
        "jinaai/jina-embeddings-v2-base-de",
        True,
    )
    vecs = fn(["abc", "abcd"])
    # numpy output converted to plain python floats (Arrow-serializable)
    assert isinstance(vecs, list) and isinstance(vecs[0], list)
    assert all(isinstance(x, float) for v in vecs for x in v)
    assert vecs[0] == [3.0, 3.0, 3.0, 3.0]


def test_load_sentence_transformer_absent_returns_none(monkeypatch):
    monkeypatch.setitem(sys.modules, "sentence_transformers", None)
    from news_graph_rag_spark.ingest.embedder import load_sentence_transformer

    assert load_sentence_transformer() is None


def test_mock_encoder_through_spark_operator(spark, fake_sentence_transformers):
    """The loader's adapted encoder runs through the real embed_texts
    mapInPandas operator (Arrow batches). The adapter is captured
    driver-side: the mock module only exists in the driver process, and
    cloudpickle ships the closure to the Python workers."""
    from news_graph_rag_spark.ingest.embedder import (
        embed_texts,
        load_sentence_transformer,
    )

    enc = load_sentence_transformer()
    df = spark.createDataFrame([(1, "abc"), (2, "abcde")], "id long, text string")
    out = embed_texts(df, lambda: enc, batch_size=1)
    rows = {r["id"]: r["embedding"] for r in out.collect()}
    assert rows[1] == [3.0, 3.0, 3.0, 3.0]
    assert rows[2] == [5.0, 5.0, 5.0, 5.0]
