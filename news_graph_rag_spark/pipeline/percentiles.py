"""Exact distributed selection (percentile-by-rank) WITHOUT a global
sort: iterative histogram refinement, factored out of the
``exact_percentile_multipass`` catalog entry (round 11) so robust-stats
operators (median/MAD) can reuse the same scale-safe kernel.

Algorithm (classic selection-by-partition, Spark-first): each pass
buckets every group's live candidate range into ≤``_B`` equi-width
integer buckets with ONE map-side-combinable aggregate (the
candidate-range filter pushes to the scan), the driver walks the
≤``_B``-row histogram to find the bucket containing the target ceil
rank, and the range narrows ``_B``× per pass → O(log_B range) passes.
Raw rows never shuffle; the driver only ever sees bucket counts.

``_B`` = 65536 (round-17 optimization, was 1024): each sequential
pass is a full aggregate job over the (persisted) input, so pass
count — not per-pass width — dominates wall-clock; 65536² ≈ 4.3e9
covers every integer-scaled domain in the catalog (micro-scaled
values ≤ ~1e9, price cents ≤ ~5e7) in TWO passes instead of three.
The driver-side bound is still groups × _B count rows per pass
(≈ 8 MB at 5 groups — corpus-size-independent, so the 100 TB story
is unchanged: raw rows never move, only bounded bucket counts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: histogram width per pass (driver sees ≤ groups × _B count rows)
_B = 65536


def exact_group_rank_value(
    b: DataFrame,
    key_col: str,
    val_col: str,
    pct: int,
    persisted: bool = False,
) -> dict:
    """Exact per-group ceil-rank percentile of an INTEGER column.

    Returns {key: value at 1-based rank ⌈n·pct/100⌉ in sorted order}
    (ties make the rank's VALUE deterministic regardless of tie order).
    ``b`` is persisted for the passes and unpersisted before returning;
    the number of groups must be driver-bounded (each pass collects
    ≤``_B`` buckets per group, and the per-pass candidate ranges are
    compiled into literal CASE expressions sized by the group count)
    and the group key must be a STRING column.

    ``persisted=True`` (round-17 optimization): the caller has already
    persisted ``b`` (e.g. to share ONE materialization across a
    median pass, a MAD pass, and a final readout — mad_outlier_events'
    shape); the kernel then skips its own persist/unpersist so the
    caller's cache survives the call and every pass still reads
    memory, not the source scan.
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
    if not persisted:
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
            # per-pass candidate ranges as LITERAL expressions (round-17
            # optimization: the broadcast-joined ranges table cost a
            # broadcast-build sub-job per pass; the group count is
            # driver-bounded by contract, so a CASE chain is small) —
            # one filter predicate plus one bucket expression per group
            pred = None
            bucket_expr = None
            for p, s in live.items():
                w = max(1, (s["hi"] - s["lo"] + 1 + _B - 1) // _B)
                cond = (
                    (F.col("k") == F.lit(p))
                    & F.col("x").between(F.lit(s["lo"]), F.lit(s["hi"]))
                )
                pred = cond if pred is None else (pred | cond)
                # integer div, never float: an IEEE quotient landing on
                # a bucket boundary could floor off by one
                bexpr = F.expr(f"(x - {s['lo']}L) div {w}L")
                bucket_expr = (
                    F.when(F.col("k") == F.lit(p), bexpr)
                    if bucket_expr is None
                    else bucket_expr.when(F.col("k") == F.lit(p), bexpr)
                )
            counts = (
                b.filter(pred)
                .select("k", bucket_expr.cast("long").alias("bucket"))
                .groupBy("k", "bucket")
                .agg(F.count(F.lit(1)).alias("n"))
                .collect()
            )
            per_key: dict = {}
            for r in counts:
                per_key.setdefault(r["k"], {})[int(r["bucket"])] = int(r["n"])
            for p, s in live.items():
                w = max(1, (s["hi"] - s["lo"] + 1 + _B - 1) // _B)
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
        if not persisted:
            b.unpersist()
    return answers
