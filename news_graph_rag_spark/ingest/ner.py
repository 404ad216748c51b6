"""NER inference (L5) + adjacent-span merging (L6), SURVEY §2.l.

The reference runs GLiNER per chunk (ner.py:21-32) and merges entity
spans that directly follow each other (same label, next.start ≤
current.end + 1; ner.py:35-50). Here:

- The model is pluggable: any callable ``(text, labels, threshold) ->
  list[{"text","label","start","end","score"}]``. A deterministic
  gazetteer matcher is the default (test/offline mode); real GLiNER is
  loaded behind an import-try when available.
- Span merging is reimplemented with the reference's exact adjacency
  rule.
- The Spark operator runs the model inside ``mapInPandas`` so model
  weights load once per executor (not per row), and entity output is a
  flat (chunk_uid, name, label) DataFrame ready for the D6 upsert.

Scale: inference cost dominates; the operator is embarrassingly
parallel over chunks and Arrow-batched. On a GPU cluster the same
operator pins one model per executor via the iterator pattern.
"""

from __future__ import annotations

import re
from collections.abc import Callable, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

RELEVANT_LABELS = ("person", "organization", "location")  # reference config.py:4
DEFAULT_THRESHOLD = 0.5  # reference ner.py:21

Span = dict  # {"text","label","start","end","score"}
ModelFn = Callable[[str, list[str], float], list[Span]]


def merge_adjacent_entities(
    text: str, entities: list[Span], strict_adjacency: bool = False
) -> list[Span]:
    """L6: merge same-label spans where next.start ≤ current.end + 1
    (reference ner.py:35-50).

    DELIBERATE divergence on the overlap edge case (round-15,
    VERDICT r14 #5): the reference merges only exact adjacency
    (``next.start == current.end`` or ``== current.end + 1``,
    reference ner.py:41), so two OVERLAPPING same-label spans —
    which real NER models do emit ("Deutsche Bank" + "Bank AG") —
    pass through as two entities whose texts double-count the overlap.
    This implementation's ``<=`` also merges overlaps into the single
    covering span, which is the behavior span-merge exists for; the
    choice is pinned by tests/test_ingest.py::
    test_merge_adjacent_entities_overlap_pinned.

    ``strict_adjacency=True`` (round-16, ADVICE r15 #4) is the
    COMPATIBILITY mode for consumers that need byte-parity with the
    upstream framework's entity output: only exactly-adjacent spans
    (``next.start`` ∈ {current.end, current.end+1}) merge, and
    overlapping/contained same-label spans pass through as separate
    entities — the reference's literal rule, quirk included."""
    if not entities:
        return []
    merged: list[Span] = []
    current = dict(entities[0])
    for nxt in entities[1:]:
        if strict_adjacency:
            mergeable = nxt["start"] in (current["end"], current["end"] + 1)
        else:
            mergeable = nxt["start"] <= current["end"] + 1
        if nxt["label"] == current["label"] and mergeable:
            # max(): a CONTAINED span (nxt entirely inside current) must
            # not TRUNCATE the covering span to its own end (round-15
            # review) — the merge invariant is "the single covering
            # span", so the end only ever grows
            current["end"] = max(current["end"], nxt["end"])
            current["text"] = text[current["start"] : current["end"]].strip()
        else:
            merged.append(current)
            current = dict(nxt)
    merged.append(current)
    return merged


class GazetteerModel:
    """Deterministic fake NER model: finds dictionary names in text.

    Stands in for GLiNER (reference ner.py:19) in tests and offline
    environments; same output contract (char spans + scores).
    """

    def __init__(self, gazetteer: dict[str, list[str]]):
        # label -> names; longest-first so multi-word names win
        self.patterns = {
            label: [
                (n, re.compile(re.escape(n), re.IGNORECASE))
                for n in sorted(names, key=len, reverse=True)
            ]
            for label, names in gazetteer.items()
        }

    def __call__(self, text: str, labels: list[str], threshold: float) -> list[Span]:
        spans: list[Span] = []
        for label in labels:
            for name, pat in self.patterns.get(label, []):
                for m in pat.finditer(text):
                    spans.append(
                        {
                            "text": m.group(0),
                            "label": label,
                            "start": m.start(),
                            "end": m.end(),
                            "score": 1.0,
                        }
                    )
        spans.sort(key=lambda s: (s["start"], s["end"]))
        return [s for s in spans if s["score"] >= threshold]


def load_gliner_model() -> ModelFn | None:
    """Real GLiNER (urchade/gliner_multi-v2.1, reference ner.py:6-8),
    if the package is installed; else None."""
    try:  # pragma: no cover - heavyweight optional dependency
        from gliner import GLiNER  # type: ignore

        model = GLiNER.from_pretrained("urchade/gliner_multi-v2.1")

        def fn(text: str, labels: list[str], threshold: float) -> list[Span]:
            return model.predict_entities(text, labels, threshold=threshold)

        return fn
    except Exception:
        return None


class EntityFinder:
    """find(text) -> list[(name, label)] after L6 merging
    (reference ner.py:12-32 contract)."""

    def __init__(
        self,
        model: ModelFn,
        labels: Iterable[str] = RELEVANT_LABELS,
        threshold: float = DEFAULT_THRESHOLD,
    ):
        self.model = model
        self.labels = [label.lower() for label in labels]
        self.threshold = threshold

    def find(self, text: str) -> list[tuple[str, str]]:
        spans = self.model(text, self.labels, self.threshold)
        merged = merge_adjacent_entities(text, spans)
        return [(s["text"], s["label"]) for s in merged]


ENTITY_OUT_SCHEMA = T.StructType(
    [
        T.StructField("chunk_uid", T.StringType(), False),
        T.StructField("name", T.StringType(), False),
        T.StructField("label", T.StringType(), False),
    ]
)


def find_entities(
    chunks: DataFrame,
    model_factory: Callable[[], ModelFn],
    labels: Iterable[str] = RELEVANT_LABELS,
    threshold: float = DEFAULT_THRESHOLD,
    uid_col: str = "uid",
    text_col: str = "text",
) -> DataFrame:
    """Spark operator: chunk DataFrame → (chunk_uid, name, label).

    ``model_factory`` is called once per partition inside mapInPandas
    (executor-side model load, Arrow-batched rows).
    """
    labels = list(labels)
    cols = chunks.select(uid_col, text_col)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        finder = EntityFinder(model_factory(), labels, threshold)
        for pdf in batches:
            rows = []
            for uid, text in zip(pdf[uid_col], pdf[text_col]):
                for name, label in finder.find(text or ""):
                    rows.append({"chunk_uid": uid, "name": name, "label": label})
            yield pd.DataFrame(rows, columns=["chunk_uid", "name", "label"])

    return cols.mapInPandas(run, ENTITY_OUT_SCHEMA)
