"""R1 / I3: fuzzy fulltext entity linking without Lucene.

The reference links NER-found entities to graph nodes with a Lucene
fuzzy query ``word~0.8 AND word~0.8`` against per-label fulltext indexes
on ``name`` (graph.py:140-166, 197-209; query built in utils.py:51-61).
Exact Lucene BM25 scores are unspecifiable (SURVEY §7 risks), so this
module defines a documented equivalent:

- candidate match: every query token must fuzzy-match some name token
  (AND semantics) with edit budget ``floor((1 - 0.8) * len(token))``
  — Lucene's ``~0.8`` similarity.
- score: normalized fuzzy token overlap = matched_tokens / total query
  tokens, tie-broken by total edit distance then name; top-k per query
  entity (k = per_entity_limit = 10, graph.py:140).

Index analog (I3): a precomputed token table (label, name_token, uid)
maintained at ingest. Entity-name corpora are tiny relative to chunks
(dimension tables), so the token table is broadcast into the fuzzy
join — no shuffle at any corpus scale.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..localrel import local_rel

from ..graph_store import GraphStore

LUCENE_SPECIAL = r'[-+&|!(){}\[\]\^"~*?:\\\\]'  # reference utils.py:8
DEFAULT_FUZZY = 0.8  # reference utils.py:51
PER_ENTITY_LIMIT = 10  # reference graph.py:140

ENTITY_TABLES = ("person", "organization", "location", "source", "topic")
_LABELS = {
    "person": "Person",
    "organization": "Organization",
    "location": "Location",
    "source": "Source",
    "topic": "Topic",
}


def _clean(col: F.Column) -> F.Column:
    """Strip Lucene special chars (utils.py:46-48) and lowercase."""
    return F.lower(F.trim(F.regexp_replace(col, LUCENE_SPECIAL, " ")))


def build_token_index(store: GraphStore, tables: tuple[str, ...] = ENTITY_TABLES) -> DataFrame:
    """I3: (label, uid, name, token) rows for all entity-name tables."""
    parts = []
    for t in tables:
        df = store.tables.get(t)
        if df is None:
            continue
        parts.append(
            df.select(
                F.lit(_LABELS[t]).alias("label"),
                "uid",
                "name",
                F.explode(F.split(_clean(F.col("name")), r"\s+")).alias("token"),
            ).filter(F.col("token") != "")
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def fuzzy_entity_candidates(
    token_index: DataFrame,
    probes: DataFrame,
    threshold: float = DEFAULT_FUZZY,
    per_entity_limit: int = PER_ENTITY_LIMIT,
) -> DataFrame:
    """Fuzzy-link each probe (column ``probe``) to entity candidates.

    Returns (probe, uid, name, label, score, rnk) — top-k per probe,
    AND-combined fuzzy token match (utils.py:51-61 semantics).
    """
    ptoks = probes.select(
        "probe",
        F.posexplode(F.split(_clean(F.col("probe")), r"\s+")).alias("pt_pos", "ptoken"),
    ).filter(F.col("ptoken") != "")
    n_ptoks = ptoks.groupBy("probe").agg(F.count_distinct("pt_pos").alias("n_query_tokens"))

    # fuzzy join: probe token ↔ name token within the edit budget.
    # token_index is dimension-sized → broadcast; the comparison is
    # bounded by a cheap length prefilter before levenshtein.
    # Lucene's ~0.8 gives floor(0.2·len) edits, which is 0 for tokens
    # shorter than 5 chars; we grant a minimum budget of 1 edit so short
    # name tokens still fuzzy-link (documented deviation for recall —
    # the reference's own exemplar "Ursula v. d. Leyn" needs it)
    budget = F.greatest(
        F.lit(1), F.floor(F.length(F.col("ptoken")) * (1.0 - threshold)).cast("int")
    )
    joined = ptoks.join(
        F.broadcast(token_index),
        (F.abs(F.length(F.col("ptoken")) - F.length(F.col("token"))) <= budget)
        & (F.levenshtein(F.col("ptoken"), F.col("token")) <= budget),
    ).withColumn("edit_dist", F.levenshtein(F.col("ptoken"), F.col("token")))

    per_tok = joined.groupBy("probe", "uid", "name", "label", "pt_pos").agg(
        F.min("edit_dist").alias("best_dist")
    )
    agg = per_tok.groupBy("probe", "uid", "name", "label").agg(
        F.count(F.lit(1)).alias("matched_tokens"),
        F.sum("best_dist").alias("total_dist"),
    )
    scored = (
        agg.join(n_ptoks, "probe")
        # AND semantics: all query tokens must match
        .filter(F.col("matched_tokens") == F.col("n_query_tokens"))
        # AND semantics already guarantees matched_tokens == n_query_tokens,
        # so the score reduces to edit-distance decay in (0, 1]
        .withColumn("score", F.lit(1.0) / (F.lit(1.0) + F.col("total_dist")))
    )
    w = Window.partitionBy("probe").orderBy(
        F.desc("score"), F.asc("total_dist"), F.asc("name"), F.asc("uid")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= per_entity_limit)
        .select("probe", "uid", "name", "label", "score", "rnk")
    )


def lookup_entities(
    store: GraphStore,
    names: list[str],
    threshold: float = DEFAULT_FUZZY,
    per_entity_limit: int = PER_ENTITY_LIMIT,
) -> DataFrame:
    """graph.py:140-146 analog: link a list of entity names."""
    probes = local_rel(store.spark, [(n,) for n in names], "probe string")
    idx = build_token_index(store)
    return fuzzy_entity_candidates(idx, probes, threshold, per_entity_limit)
