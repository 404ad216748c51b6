"""Round-16 catalog extensions.

ANN serving: the LAST open cells of the serving surface — two-tier
rerank for EXTERNAL query vectors (``ann_ivfpq_rerank_by_vector_topk``
— batch of query embeddings → PQ shortlist → exact int8 rerank through
the shared cores; VERDICT r15 #1) — plus the coarse tier's first
MAINTENANCE ACTION (``ann_ivf_split_list_roundtrip`` — split a hot
inverted list with a deterministic 2-means, the action the skew
telemetry exists to trigger; VERDICT r15 #2), the streaming → ANN
integration (``streaming_ann_ingest_search`` — foreachBatch micro-
batches quantize+assign+append into BOTH serving tiers, a last-batch
embedding servable immediately; VERDICT r15 #3), and BATCH hybrid
retrieval (``hybrid_batch_indexed_topk`` — Q concurrent queries, one
token-index scan + one assignments scan; VERDICT r15 #4). ML: the GBT
generalized over R rounds with a train/holdout split and a
holdout-accuracy readout (``gbt_3round_holdout_stats``; VERDICT r15
#6). Governance: the GDPR purge composed END TO END across subsystems
(``gdpr_purge_cascade_ann`` — one forget-set cascading through the
relational chain AND tombstoning its vectors with a model-level PQ
retrain; VERDICT r15 #7).

Appended as the LAST module in queries/__init__.py's pinned
``_ROUND_MODULES`` order (first-50 driver prefix + full-order manifest
both test-frozen).

Determinism per catalog.py's rules: every output column is an exact
integer; the non-integer comparisons (ADC/cosine rank scores) are IEEE
doubles produced by identical expression trees on exact integers in
both engines with total integer tie-breaks; the holdout prediction is
the same CROSS-MULTIPLIED integer comparison as the round-15 staged
model.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import load, register, stage_parquet
from .round13 import _PQ_KS, _PQ_M
from .round14 import _ivfpq_batch_rerank_oracle

# ---------------------------------------------------------------------------
# Two-tier rerank for EXTERNAL query vectors (VERDICT r15 #1)
# ---------------------------------------------------------------------------

#: source rows whose RAW float embeddings form the external query
#: batch — disjoint from every other ANN exhibit's probe set (by-id PQ
#: batch 0/7/19, PQ by-vec batch 2/11/23, int8 by-vec 5/12/31, int8
#: by-id 0..4) so the rerank exercises its own probed-list union
_PQ_RRBV_SRC_IDS = (3, 14, 27)
_PQ_RRBV_K = 5
_PQ_RRBV_NPROBE = 4
_PQ_RRBV_MULT = 4


@register(
    "ann_ivfpq_rerank_by_vector_topk",
    oracle=_ivfpq_batch_rerank_oracle(
        _PQ_RRBV_SRC_IDS,
        k=_PQ_RRBV_K,
        nprobe=_PQ_RRBV_NPROBE,
        cand_mult=_PQ_RRBV_MULT,
        exclude_probe=False,
        by_position=True,
    ),
    doc="the SERVING SURFACE CLOSED (VERDICT r15 #1 — the {by-vector} "
    "× {rerank} cells were the last open part): the literal production "
    "RAG request end to end — a BATCH of EXTERNAL query embeddings → "
    "PQ shortlist → exact int8 rerank, in ONE job "
    "(vector_index.ipynb raw 65: similarity_search always serves an "
    "external embedding, and the rerank tier is what production "
    "serves it from). Each query quantizes driver-side with the "
    "index's own scheme (_quantize_query_batch — batch positions as "
    "synthetic probe_ids, loud zero guard); the SHARED "
    "_search_pq_batch_core produces every query's k·4 shortlist off "
    "ONE partition-pruned codes scan with NO self-exclusion; the "
    "SHARED _rerank_exact_core re-scores ONLY the shortlisted "
    "(probe, vec) pairs off ONE pruned assignments scan (broadcast "
    "pair join — point lookups) and re-ranks per probe. Composition "
    "of two already-verified cores, no forked readout; each probe's "
    "rank-1 hit is its own source row (the quantization-consistency "
    "property riding the result). VALUE-VERIFIED: the oracle uses the "
    "stored q8 of each source row (equal by construction to "
    "quantize_query of the raw embedding) numbered by batch position, "
    "keeps probe rows in their candidate sets, and replays build + PQ "
    "train + encode + batch ADC shortlist + exact rerank end to end.",
)
def ann_ivfpq_rerank_by_vector_topk(spark: SparkSession, sf: str) -> DataFrame:
    from ..pipeline.ann_index import ensure_pq, search_pq_rerank_by_vectors

    path = ensure_pq(spark, sf, m=_PQ_M, ks=_PQ_KS)
    emb = {
        int(r["vec_id"]): [float(x) for x in r["embedding"]]
        for r in load(spark, sf, "embeddings")
        .filter(F.col("vec_id").isin(list(_PQ_RRBV_SRC_IDS)))
        .select("vec_id", "embedding")
        .collect()
    }
    qvs = [emb[i] for i in _PQ_RRBV_SRC_IDS]
    return search_pq_rerank_by_vectors(
        spark,
        path,
        qvs,
        k=_PQ_RRBV_K,
        nprobe=_PQ_RRBV_NPROBE,
        cand_mult=_PQ_RRBV_MULT,
        m=_PQ_M,
        ks=_PQ_KS,
    )


# ---------------------------------------------------------------------------
# Coarse-tier rebalance: split the hot list (VERDICT r15 #2)
# ---------------------------------------------------------------------------

_SPLIT_VARIANT = "splitdemo-v1"


def _ivf_split_oracle(k: int, nprobe: int, probe_id: int) -> str:
    """Replay the WHOLE lifecycle the entry runs: base-subset build
    (the shared ``_ivf_int8_build_cte``), frozen-quantizer assign of
    the md5-bucket incoming batch, union append, hot-list pick (max
    count, ties to the smallest cid), the deterministic 2-means SPLIT
    of that list (seeds = its 2 smallest vec_ids, the shared cosine
    assignment rule, ONE integer Lloyd round with the same
    double-division floor, final child assignment; child A keeps the
    parent's cid, child B = max(cid) + 1), and a search over the
    post-split centroid table + assignments."""
    from .retrieval_queries import (
        _ivf_int8_build_cte,
        _IVF_DOT,
        _IVF_INCR_BASE,
        _IVF_SCORE,
    )

    dot, score = _IVF_DOT, _IVF_SCORE
    base = _IVF_INCR_BASE.format(t="VARCHAR")
    return f"""
    {_ivf_int8_build_cte(8, base_where=base)},
    newa AS (  -- frozen-quantizer assignment of the incoming batch
      SELECT vec_id, q8, nrm, cid FROM (
        SELECT l.vec_id, l.q8, l.nrm, c.cid,
               {score.format(a="l.q8", b="c.c8", n="c.cnrm")} AS score
        FROM (SELECT * FROM live WHERE NOT ({base})) l CROSS JOIN c1n c
      ) QUALIFY row_number() OVER (PARTITION BY vec_id
                                   ORDER BY score DESC, cid) = 1
    ),
    ball AS MATERIALIZED (  -- the appended index: base ∪ incoming
      SELECT vec_id, q8, nrm, cid FROM b1
      UNION ALL
      SELECT vec_id, q8, nrm, cid FROM newa
    ),
    hot AS (  -- the hot list: max occupancy, ties to the smallest cid
      SELECT cid FROM (SELECT cid, COUNT(*) AS n FROM ball GROUP BY cid)
      ORDER BY n DESC, cid LIMIT 1
    ),
    sl AS MATERIALIZED (
      SELECT * FROM ball WHERE cid = (SELECT cid FROM hot)
    ),
    sseed AS (  -- 2-means seeds: the list's 2 smallest vec_ids
      SELECT CAST(row_number() OVER (ORDER BY vec_id) AS INT) AS scid,
             q8 AS c8, nrm AS cnrm
      FROM sl ORDER BY vec_id LIMIT 2
    ),
    sb0 AS (  -- seed assignment: the family's shared cosine rule
      SELECT vec_id, q8, scid FROM (
        SELECT l.vec_id, l.q8, s.scid,
               {score.format(a="l.q8", b="s.c8", n="s.cnrm")} AS score
        FROM sl l CROSS JOIN sseed s
      ) QUALIFY row_number() OVER (PARTITION BY vec_id
                                   ORDER BY score DESC, scid) = 1
    ),
    sel AS (  -- one INTEGER Lloyd round over the list's own rows
      SELECT scid, u.i AS i, q8[u.i] AS v
      FROM sb0, unnest(range(1, len(q8) + 1)) AS u(i)
    ),
    ssums AS (
      SELECT scid, i, CAST(SUM(v) AS BIGINT) AS s,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM sel GROUP BY scid, i
    ),
    sc1 AS (
      SELECT scid,
             list(CAST(floor(CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) AS INT)
                  ORDER BY i) AS c8
      FROM ssums GROUP BY scid
    ),
    sc1n AS (
      SELECT * FROM (
        SELECT scid, c8, {dot.format(a="c8", b="c8")} AS cnrm FROM sc1
      ) WHERE cnrm > 0
    ),
    sb1 AS (  -- final child assignment; A keeps the cid, B = max+1
      SELECT vec_id, q8, nrm,
             CASE WHEN scid = 1 THEN (SELECT cid FROM hot)
                  ELSE (SELECT MAX(cid) FROM c1n) + 1 END AS cid
      FROM (
        SELECT l.vec_id, l.q8, l.nrm, s.scid,
               {score.format(a="l.q8", b="s.c8", n="s.cnrm")} AS score
        FROM sl l CROSS JOIN sc1n s
      ) QUALIFY row_number() OVER (PARTITION BY vec_id
                                   ORDER BY score DESC, scid) = 1
    ),
    c2 AS (  -- post-split centroid table
      SELECT cid, c8, cnrm FROM c1n WHERE cid <> (SELECT cid FROM hot)
      UNION ALL
      SELECT CASE WHEN scid = 1 THEN (SELECT cid FROM hot)
                  ELSE (SELECT MAX(cid) FROM c1n) + 1 END AS cid, c8, cnrm
      FROM sc1n
    ),
    b2 AS (  -- post-split assignments
      SELECT vec_id, q8, nrm, cid FROM ball
      WHERE cid <> (SELECT cid FROM hot)
      UNION ALL
      SELECT vec_id, q8, nrm, cid FROM sb1
    ),
    probe AS (SELECT q8 FROM ball WHERE vec_id = {probe_id}),
    pc AS (
      SELECT cid FROM (
        SELECT c.cid, {score.format(a="p.q8", b="c.c8", n="c.cnrm")} AS score
        FROM c2 c CROSS JOIN probe p
      ) ORDER BY score DESC, cid LIMIT {nprobe}
    ),
    cand AS (
      SELECT b.vec_id, b.q8, b.nrm FROM b2 b JOIN pc ON b.cid = pc.cid
      WHERE b.vec_id <> {probe_id}
    ),
    sscored AS (
      SELECT c.vec_id,
             {dot.format(a="c.q8", b="p.q8")} AS dot,
             {score.format(a="c.q8", b="p.q8", n="c.nrm")} AS score
      FROM cand c CROSS JOIN probe p
    )
    SELECT CAST(row_number() OVER (ORDER BY score DESC, vec_id) AS INT)
             AS rnk,
           vec_id, dot
    FROM sscored ORDER BY score DESC, vec_id LIMIT {k}
    """


@register(
    "ann_ivf_split_list_roundtrip",
    oracle=_ivf_split_oracle(k=10, nprobe=4, probe_id=0),
    doc="the COARSE tier's first MAINTENANCE ACTION (VERDICT r15 #2 — "
    "the skew telemetry finally gets its lever): after heavy appends "
    "a frozen quantizer keeps routing new rows to the same hot lists "
    "and probe cost grows with the largest probed list forever; "
    "split_list rebalances. The full lifecycle in one entry: a "
    "PRIVATE variant index builds over the md5-bucket base subset, "
    "the incoming bucket APPENDS against the frozen quantizer "
    "(append_vectors, claim-gated like every non-idempotent append), "
    "the HOT list (max occupancy, ties to the smallest cid — read "
    "from the same counts ann_ivf_index_stats serves) SPLITS via the "
    "family's own deterministic discipline (seeds = the list's 2 "
    "smallest vec_ids, shared cosine assignment, ONE integer Lloyd "
    "round, child A keeps the parent cid, child B = max+1), and the "
    "search serves from the post-split 9-centroid table. The publish "
    "is retrain_pq's staging + atomic-swap lifted to the whole index "
    "dir, with untouched lists carried as HARDLINKS — at 100 TB the "
    "split costs IO proportional to ONE list, never the index; a PQ "
    "layer, when trained, moves in the same swap (split rows "
    "re-encoded against their child centroid with the parent's "
    "inherited codebook — pytest-pinned). VALUE-VERIFIED: the oracle "
    "replays base build + frozen assign + append + hot-list pick + "
    "2-means split + post-split search end to end; pytest also pins "
    "that probes whose probed lists avoid the split are bit-unchanged.",
)
def ann_ivf_split_list_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    import json

    from ..pipeline.ann_index import (
        _CENTROID_CACHE,
        _retire_dir,
        _try_claim,
        append_vectors,
        ensure_index,
        search_by_id,
        split_list,
    )
    from .retrieval_queries import _IVF_INCR_BASE

    pred = _IVF_INCR_BASE.format(t="string")
    not_base = ~F.expr(pred)

    def ensure():
        return ensure_index(
            spark, sf, n_centroids=8, iters=1,
            variant=_SPLIT_VARIANT, subset_pred=pred,
        )

    path = ensure()
    incoming = load(spark, sf, "embeddings").filter(not_base)
    expected = incoming.filter(
        F.exists("embedding", lambda x: x != 0)
    ).count()
    assign_dir = os.path.join(path, "assignments.parquet")
    n_appended = spark.read.parquet(assign_dir).filter(not_base).count()
    if n_appended not in (0, expected):
        # torn append (crash inside the multi-file write): retire +
        # rebuild — the round-15 insert entry's heal, same append path
        _retire_dir(path)
        _CENTROID_CACHE.pop(path, None)
        path = ensure()
        assign_dir = os.path.join(path, "assignments.parquet")
        n_appended = 0
    if n_appended == 0:
        if _try_claim(path, "_append_claim"):
            try:
                append_vectors(spark, path, incoming)
            finally:
                try:
                    os.unlink(os.path.join(path, "_append_claim"))
                except OSError:
                    pass
        else:
            import time

            deadline = time.time() + 180.0
            while time.time() < deadline:
                if (
                    spark.read.parquet(assign_dir).filter(not_base).count()
                    == expected
                ):
                    break
                time.sleep(1.0)
            else:
                raise RuntimeError(
                    "concurrent append_vectors holder did not commit in 180s"
                )

    def already_split() -> bool:
        with open(os.path.join(path, "meta.json")) as f:
            return bool(json.load(f).get("split_history"))

    if not already_split():
        if _try_claim(path, "_split_claim"):
            try:
                if not already_split():  # re-check under the claim
                    counts = (
                        spark.read.parquet(assign_dir)
                        .groupBy("centroid_id")
                        .agg(F.count(F.lit(1)).alias("n"))
                        .collect()
                    )
                    hot = min(
                        int(r["centroid_id"])
                        for r in counts
                        if int(r["n"]) == max(int(x["n"]) for x in counts)
                    )
                    split_list(spark, path, hot)
            finally:
                try:
                    os.unlink(os.path.join(path, "_split_claim"))
                except OSError:
                    pass
        else:
            import time

            deadline = time.time() + 180.0
            while time.time() < deadline:
                if already_split():
                    break
                time.sleep(1.0)
            else:
                raise RuntimeError(
                    "concurrent split_list holder did not commit in 180s"
                )
    return search_by_id(spark, path, probe_vec_id=0, k=10, nprobe=4)
