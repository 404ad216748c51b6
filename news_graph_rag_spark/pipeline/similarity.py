"""Similarity search over embedding columns (array<float>).

Three tiers, by corpus size:
- ``brute_force_top_k``: exact cosine scan + distributed TakeOrdered.
  O(n·d) per query — the baseline and the correctness oracle.
- ``lsh_bucket_top_k``: random-hyperplane (sign) LSH — deterministic
  hyperplanes derived from md5 so plans are reproducible; probes only
  the query's bucket ring. Approximate, tunable via n_planes.
- ``ivf_build`` / ``ivf_search``: IVF coarse quantizer via k-means-lite
  (seeded initial centroids + a few Lloyd iterations, all DataFrame
  ops), then search probes the ``nprobe`` nearest centroids' inverted
  lists. This is the 10^9+-vector scale path: the scan shrinks by
  ~n_centroids/nprobe ×.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..localrel import local_rel

from ..retrieval.vector import cosine


def _qv_lit(query_vector: list[float]) -> F.Column:
    return F.array(*[F.lit(float(x)) for x in query_vector]).cast("array<float>")


def brute_force_top_k(
    df: DataFrame,
    query_vector: list[float],
    k: int = 10,
    embedding_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    scored = df.withColumn("score", cosine(F.col(embedding_col), _qv_lit(query_vector)))
    return scored.orderBy(F.desc("score"), F.asc(id_col)).limit(k)


# ---------------------------------------------------------------------------
# Sign-LSH: deterministic hyperplanes from md5 (reproducible plans)
# ---------------------------------------------------------------------------


def _hyperplanes(dim: int, n_planes: int) -> list[list[float]]:
    planes = []
    for p in range(n_planes):
        vals: list[float] = []
        i = 0
        while len(vals) < dim:
            h = hashlib.md5(f"plane:{p}:{i}".encode()).digest()
            vals.extend(b / 127.5 - 1.0 for b in h)
            i += 1
        planes.append(vals[:dim])
    return planes


def _sign_key(emb: F.Column, planes: list[list[float]]) -> F.Column:
    bits = [
        F.when(
            F.aggregate(
                F.zip_with(
                    emb,
                    F.array(*[F.lit(w) for w in plane]).cast("array<float>"),
                    lambda x, y: x * y,
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            >= 0,
            F.lit("1"),
        ).otherwise(F.lit("0"))
        for plane in planes
    ]
    return F.concat(*bits)


def lsh_bucket_top_k(
    df: DataFrame,
    query_vector: list[float],
    k: int = 10,
    n_planes: int = 8,
    embedding_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Approximate top-k: scan only rows whose sign-LSH key is within
    hamming distance 1 of the query's key (bucket ring)."""
    dim = len(query_vector)
    planes = _hyperplanes(dim, n_planes)
    qkey = "".join(
        "1" if sum(w * x for w, x in zip(plane, query_vector)) >= 0 else "0"
        for plane in planes
    )
    ring = [qkey] + [
        qkey[:i] + ("0" if qkey[i] == "1" else "1") + qkey[i + 1 :]
        for i in range(n_planes)
    ]
    keyed = df.withColumn("_lsh", _sign_key(F.col(embedding_col), planes))
    cand = keyed.filter(F.col("_lsh").isin(ring))
    return (
        cand.withColumn("score", cosine(F.col(embedding_col), _qv_lit(query_vector)))
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
        .drop("_lsh")
    )


# ---------------------------------------------------------------------------
# IVF: coarse quantizer + inverted lists
# ---------------------------------------------------------------------------


def _localize(spark, rows) -> DataFrame:
    """Rebuild a k-row centroid table as a LocalRelation.

    The centroid table is driver-small by construction (k rows). A
    LocalRelation beats localCheckpoint(eager=True) here: no job, no
    block-manager round-trip, and every later consumer (the packed
    broadcast in ``_assign``, the ``collect`` in ``_assign_arrow`` /
    ``ivf_search``'s probe ranking) reads it without touching the
    cluster. Each r5 checkpoint cost a full scheduled job; three of
    them per ivf_build call were most of the ann_ivf_topk bench
    regression."""
    data = [(int(r[0]), [float(x) for x in r[1]]) for r in rows]
    return local_rel(spark, data, "centroid_id int, centroid array<float>")


def ivf_build(
    df: DataFrame,
    n_centroids: int = 16,
    iters: int = 2,
    embedding_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Returns (assignments, centroids).

    centroids: (centroid_id, centroid array<float>) — k-means with
    deterministic seeding (first n ids as initial centers, a few Lloyd
    rounds, all DataFrame ops; centroids table stays driver-small and
    is localized after every round).
    assignments: df + centroid_id.

    Pass ``dim`` (length of the embedding arrays) when the caller
    already knows it — e.g. from the query vector it just fetched — to
    skip the one-row probe job.
    """
    spark = df.sparkSession
    if dim is None:
        # dim lookup: one 1-row job so the Lloyd update can aggregate
        # per-dimension columns instead of exploding n×d rows
        dim = df.select(F.size(embedding_col).alias("d")).first()["d"]
    init = (
        df.select(F.col(id_col), F.col(embedding_col))
        .orderBy(id_col)
        .limit(n_centroids)
        .collect()
    )
    centers = _localize(spark, [(i + 1, r[1]) for i, r in enumerate(init)])
    for _ in range(iters):
        assigned = _assign(df, centers, embedding_col, id_col, dim=dim)
        centers = _localize(
            spark,
            _lloyd_update(assigned, dim, embedding_col)
            .orderBy("centroid_id")
            .collect(),
        )
    assignments = _assign(df, centers, embedding_col, id_col, dim=dim)
    return assignments, centers


# Above this dimensionality the per-dim-column Lloyd update would emit
# one aggregate expression per dimension. The wall is not execution but
# PLAN COMPILE: d SUM(element_at) aggregates cost ~40ms of Catalyst +
# Janino work per column per invocation (measured 2.7s at d=64, round-6
# profile — the whole ann_ivf_topk regression after testdata regen
# bumped embedding dim), and past ~100 fields wholestage codegen falls
# back to interpreted anyway. The Arrow partial-sum path is a flat
# ~0.3s warm regardless of d, so switch early.
_WIDE_DIM = 32


def _lloyd_update(assigned: DataFrame, dim: int, embedding_col: str) -> DataFrame:
    """One k-means centroid update: element-wise mean per centroid_id.

    Narrow vectors (d <= _WIDE_DIM): d codegen'd SUM columns — partial
    (map-side) aggregation reduces each task's contribution to k×d
    doubles, so the shuffle is O(k·d·partitions).

    Wide vectors (d > _WIDE_DIM, e.g. the reference's 768-d embeddings,
    config.py:6): d aggregate columns would blow past the codegen field
    limit, so compute per-Arrow-batch partial sums in numpy
    (mapInPandas: one (centroid_id, n, sums[d]) row per centroid per
    batch) and merge the k×batches partials with a single array-valued
    zip_with fold. Shuffle stays O(k·d·batches); the n×d vectors never
    leave their partitions.
    """
    if dim <= _WIDE_DIM:
        sums = assigned.groupBy("centroid_id").agg(
            F.count(F.lit(1)).alias("_n"),
            *[
                F.sum(F.element_at(F.col(embedding_col), i + 1)).alias(f"_s{i}")
                for i in range(dim)
            ],
        )
        return sums.select(
            "centroid_id",
            F.array(
                *[(F.col(f"_s{i}") / F.col("_n")).cast("float") for i in range(dim)]
            ).alias("centroid"),
        )

    def _partial_sums(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if pdf.empty:
                continue
            out = []
            for cid, grp in pdf.groupby("centroid_id"):
                mat = np.asarray(grp[embedding_col].tolist(), dtype=np.float64)
                out.append((int(cid), int(len(grp)), mat.sum(axis=0).tolist()))
            yield pd.DataFrame(out, columns=["centroid_id", "_n", "_sums"])

    partials = assigned.select("centroid_id", embedding_col).mapInPandas(
        _partial_sums,
        "centroid_id int, _n bigint, _sums array<double>",
    )
    zero = F.array_repeat(F.lit(0.0), dim)
    merged = partials.groupBy("centroid_id").agg(
        F.sum("_n").alias("_n"),
        F.aggregate(
            F.collect_list("_sums"),
            zero,
            lambda acc, x: F.zip_with(acc, x, lambda a, b: a + b),
        ).alias("_sums"),
    )
    return merged.select(
        "centroid_id",
        F.transform(F.col("_sums"), lambda s: (s / F.col("_n")).cast("float")).alias(
            "centroid"
        ),
    )


def _assign(
    df: DataFrame,
    centers: DataFrame,
    embedding_col: str,
    id_col: str,
    dim: int | None = None,
) -> DataFrame:
    """Nearest-centroid assignment as ONE map-side expression.

    The (small) centroid table is packed into a single array<struct>
    row, broadcast, and argmax-folded per input row — zero shuffle of
    the vectors per Lloyd round. (The previous crossJoin + per-id
    row_number window hash-shuffled all n×k scored rows every round.)
    Ties break to the smallest centroid_id, matching the old window
    order and keeping assignments deterministic regardless of
    collect_list order.

    Wide vectors (dim > _WIDE_DIM): Catalyst higher-order functions are
    interpreted (not codegen'd), so the k×d per-row cosine fold pays a
    per-element dispatch that dominates at d=768 (measured: the 768-d
    catalog entry spent ~20s at sf0.1, mostly here). The wide path runs
    the same argmax as one numpy matmul per Arrow batch — the k×d
    centroid matrix ships to executors inside the closure (driver
    collect of k rows, same data the JVM path broadcasts), still zero
    shuffle.
    """
    if dim is not None and dim > _WIDE_DIM:
        return _assign_arrow(df, centers, embedding_col)
    packed = centers.agg(
        F.collect_list(F.struct("centroid_id", "centroid")).alias("_cents")
    )
    sims = F.transform(
        F.col("_cents"),
        lambda c: F.struct(
            cosine(F.col(embedding_col), c["centroid"]).alias("sim"),
            c["centroid_id"].alias("cid"),
        ),
    )
    init = F.struct(
        F.lit(-2.0).cast("double").alias("sim"), F.lit(None).cast("int").alias("cid")
    )
    best = F.aggregate(
        sims,
        init,
        lambda acc, s: F.when(
            (s["sim"] > acc["sim"])
            | ((s["sim"] == acc["sim"]) & (s["cid"] < acc["cid"])),
            s,
        ).otherwise(acc),
    )
    return (
        df.crossJoin(F.broadcast(packed))
        .withColumn("centroid_id", best["cid"])
        .drop("_cents")
    )


def _assign_arrow(
    df: DataFrame, centers: DataFrame, embedding_col: str
) -> DataFrame:
    """Wide-dim nearest-centroid assignment: one numpy matmul per Arrow
    batch. Ties break to the smallest centroid_id (centroid rows sorted
    by id, argmax returns the first maximum); zero-norm vectors score
    -1.0 per the ``cosine`` guard convention."""
    rows = sorted(
        centers.collect(), key=lambda r: r["centroid_id"]
    )  # k rows — driver-small by construction
    cids = [int(r["centroid_id"]) for r in rows]
    cmat = [[float(x) for x in r["centroid"]] for r in rows]
    out_fields = df.schema.fields
    out_schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in out_fields)
    out_schema += ", centroid_id int"

    def run(batches):
        import numpy as np

        c = np.asarray(cmat, dtype=np.float64)
        cn = np.linalg.norm(c, axis=1)
        cn[cn == 0] = 1.0
        ids = np.asarray(cids)
        for pdf in batches:
            if pdf.empty:
                pdf["centroid_id"] = []
                yield pdf
                continue
            x = np.asarray(pdf[embedding_col].tolist(), dtype=np.float64)
            xn = np.linalg.norm(x, axis=1)
            zero = xn == 0
            xn[zero] = 1.0
            sims = (x @ c.T) / (xn[:, None] * cn[None, :])
            sims[zero, :] = -1.0
            pdf = pdf.copy()
            pdf["centroid_id"] = ids[np.argmax(sims, axis=1)]
            yield pdf

    return df.mapInPandas(run, out_schema)


def ivf_search(
    assignments: DataFrame,
    centroids: DataFrame,
    query_vector: list[float],
    k: int = 10,
    nprobe: int = 4,
    embedding_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Probe the nprobe nearest centroids' lists, exact-rank inside."""
    qv = _qv_lit(query_vector)
    probe_ids = [
        r["centroid_id"]
        for r in centroids.withColumn("_sim", cosine(F.col("centroid"), qv))
        .orderBy(F.desc("_sim"), F.asc("centroid_id"))
        .limit(nprobe)
        .collect()
    ]
    cand = assignments.filter(F.col("centroid_id").isin(probe_ids))
    return (
        cand.withColumn("score", cosine(F.col(embedding_col), qv))
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
    )
