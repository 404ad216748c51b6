"""Exact distributed selection (percentile-by-rank) WITHOUT a global
sort: iterative histogram refinement, factored out of the
``exact_percentile_multipass`` catalog entry (round 11) so robust-stats
operators (median/MAD) can reuse the same scale-safe kernel.

Algorithm (classic selection-by-partition, Spark-first): each pass
buckets every group's live candidate range into ≤1024 equi-width
integer buckets with ONE map-side-combinable aggregate (the
candidate-range filter pushes to the scan), the driver walks the
≤1024-row histogram to find the bucket containing the target ceil
rank, and the range narrows 1024× per pass → O(log₁₀₂₄ range) passes.
Raw rows never shuffle; the driver only ever sees bucket counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def exact_group_rank_value(
    b: DataFrame, key_col: str, val_col: str, pct: int
) -> dict:
    """Exact per-group ceil-rank percentile of an INTEGER column.

    Returns {key: value at 1-based rank ⌈n·pct/100⌉ in sorted order}
    (ties make the rank's VALUE deterministic regardless of tie order).
    ``b`` is persisted for the passes and unpersisted before returning;
    the number of groups must be driver-bounded (each pass collects
    ≤1024 buckets per group) and the group key must be a STRING column
    (the per-pass candidate-range table is built with a string key).
    """
    spark = b.sparkSession
    # NULL discipline (round-11 review): a NULL value must not count
    # toward n (min/max and the histogram passes can't see it — the
    # target rank would overshoot the populated buckets and crash),
    # and a NULL group key can never match the per-pass ranges join
    # (SQL NULL equality) — both are excluded here, symmetrically with
    # every caller's SQL oracle (equality joins / NOT NULL filters
    # drop the same rows).
    b = b.select(F.col(key_col).alias("k"), F.col(val_col).alias("x")).filter(
        F.col("k").isNotNull() & F.col("x").isNotNull()
    )
    b = b.persist()
    try:
        init = (
            b.groupBy("k")
            .agg(
                F.min("x").alias("lo"),
                F.max("x").alias("hi"),
                F.count(F.lit(1)).alias("n"),
            )
            .collect()
        )
        state = {
            r["k"]: {
                "lo": int(r["lo"]),
                "hi": int(r["hi"]),
                "k": (int(r["n"]) * pct + 99) // 100,  # ceil rank, 1-based
            }
            for r in init
        }
        answers: dict = {}
        while True:
            live = {p: s for p, s in state.items() if p not in answers}
            for p, s in list(live.items()):
                if s["lo"] == s["hi"]:
                    answers[p] = s["lo"]
                    del live[p]
            if not live:
                break
            ranges = spark.createDataFrame(
                [
                    (
                        p,
                        s["lo"],
                        s["hi"],
                        max(1, (s["hi"] - s["lo"] + 1 + 1023) // 1024),
                    )
                    for p, s in live.items()
                ],
                "k string, lo long, hi long, w long",
            )
            counts = (
                b.join(F.broadcast(ranges), "k")
                .filter(F.col("x").between(F.col("lo"), F.col("hi")))
                .select("k", F.expr("(x - lo) div w").alias("bucket"))
                .groupBy("k", "bucket")
                .agg(F.count(F.lit(1)).alias("n"))
                .collect()
            )
            per_key: dict = {}
            for r in counts:
                per_key.setdefault(r["k"], {})[int(r["bucket"])] = int(r["n"])
            for p, s in live.items():
                w = max(1, (s["hi"] - s["lo"] + 1 + 1023) // 1024)
                k = s["k"]
                for bkt in sorted(per_key.get(p, {})):
                    n = per_key[p][bkt]
                    if k <= n:
                        s["lo"], s["hi"] = (
                            s["lo"] + bkt * w,
                            min(s["hi"], s["lo"] + (bkt + 1) * w - 1),
                        )
                        s["k"] = k
                        break
                    k -= n
                else:  # pragma: no cover — rank beyond range is impossible
                    raise AssertionError("target rank not found in any bucket")
    finally:
        b.unpersist()
    return answers
