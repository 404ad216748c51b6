"""Custom stateful streaming operator: gap-based sessionization with
``applyInPandasWithState`` (the driver brief's named API for stateful
ops Spark's built-in windows can't express).

Semantics match the batch ``sessionize`` catalog query (30-min gap,
sessions ordered by ts): per user, events more than ``gap`` apart start
a new session; a session is EMITTED when the event-time watermark
passes its close (last_ts + gap), i.e. no in-order event can extend it
anymore. State per key is three longs — O(1) regardless of stream
length — and is dropped on emit, so total state is bounded by the
number of concurrently-open sessions, the minimum any sessionizer needs.

Scale notes: state is hash-partitioned by user_id (one shuffle);
skewed users cost one state row like everyone else (the fold is O(batch
rows)). Arrow batches move rows Python-side once per trigger; at 100 TB
this operator's bottleneck is the state-store checkpoint, not compute —
RocksDB state store is the production config
(`spark.sql.streaming.stateStore.providerClass`).

Out-of-order data WITHIN a micro-batch is handled (rows are sorted
before the fold); an in-watermark late event arriving in a LATER batch
merges into the open session via min/max bounds (never moves the
session end backwards). Rows arriving later than ``gap`` after their
session closed would start a spurious session — that's inherent to
incremental sessionization and bounded by the watermark, which drops
rows later than ``delay``.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("session_start", T.TimestampType(), True),
        T.StructField("session_end", T.TimestampType(), True),
        T.StructField("n_events", T.LongType(), False),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType(), False),
        T.StructField("last_us", T.LongType(), False),
        T.StructField("n", T.LongType(), False),
    ]
)

_EMPTY = {
    "user_id": pd.Series(dtype="int64"),
    "session_start": pd.Series(dtype="datetime64[us]"),
    "session_end": pd.Series(dtype="datetime64[us]"),
    "n_events": pd.Series(dtype="int64"),
}


def _session_row(user_id: int, start_us: int, last_us: int, n: int) -> dict[str, Any]:
    return {
        "user_id": user_id,
        "session_start": pd.Timestamp(start_us, unit="us"),
        "session_end": pd.Timestamp(last_us, unit="us"),
        "n_events": n,
    }


def stateful_sessionize(
    events: DataFrame,
    gap_seconds: int = 1800,
    watermark: str = "10 minutes",
    ts_col: str = "ts",
    key_col: str = "user_id",
) -> DataFrame:
    """Streaming gap-sessionization: one output row per CLOSED session.

    ``events`` must be a streaming DataFrame with an event-time column.
    Emission is watermark-driven (EventTimeTimeout): a session appears
    in the sink once the watermark passes ``session_end + gap``.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_us = gap_seconds * 1_000_000

    def fold(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        user_id = key[0]
        out: list[dict[str, Any]] = []

        if state.hasTimedOut:
            start_us, last_us, n = state.get
            out.append(_session_row(user_id, start_us, last_us, n))
            state.remove()
            yield pd.DataFrame(out)
            return

        ts_us: list[int] = []
        for pdf in pdfs:
            # datetime64 → integer microseconds (exact; normalize to ns
            # first so the unit is known regardless of pandas version)
            ns = pdf[ts_col].astype("datetime64[ns]").astype("int64")
            ts_us.extend(int(v) // 1_000 for v in ns.tolist())
        ts_us.sort()

        if state.exists:
            start_us, last_us, n = state.get
        else:
            start_us, last_us, n = ts_us[0], ts_us[0] - gap_us - 1, 0

        for t in ts_us:
            if t - last_us > gap_us:
                if n > 0:
                    out.append(_session_row(user_id, start_us, last_us, n))
                start_us, last_us, n = t, t, 1
            else:
                # min/max, not assignment: an in-watermark late event in
                # a later batch (t < last_us) must not move the session
                # end backwards or shorten its timeout
                start_us = min(start_us, t)
                last_us = max(last_us, t)
                n += 1

        state.update((start_us, last_us, n))
        # flush once no in-order event can extend the session; a session
        # built entirely from watermark-late rows would put this in the
        # past, so clamp — it then flushes at the next watermark advance
        timeout_ms = max(
            (last_us + gap_us) // 1_000 + 1, state.getCurrentWatermarkMs() + 1
        )
        state.setTimeoutTimestamp(timeout_ms)
        yield pd.DataFrame(out) if out else pd.DataFrame(_EMPTY)

    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(key_col)
        .applyInPandasWithState(
            fold,
            outputStructType=SESSION_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


# ---------------------------------------------------------------------------
# Watermark-ordered stateful EWMA (round 11)
# ---------------------------------------------------------------------------

EWMA_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), False),
        T.StructField("user_id", T.LongType(), False),
        T.StructField("ewma", T.DoubleType(), True),
    ]
)

# buffer: in-watermark rows not yet safe to emit (out-of-order arrivals
# may still precede them); tail: the ≤(len(weights)-1) most recent
# EMITTED values in event-time order — exactly the lag state the batch
# window needs. NULL values occupy a lag slot, so they are carried as a
# (value, present) pair instead of a NaN-ambiguous double.
EWMA_STATE_SCHEMA = T.StructType(
    [
        T.StructField("buf_ts", T.ArrayType(T.LongType()), False),
        T.StructField("buf_eid", T.ArrayType(T.LongType()), False),
        T.StructField("buf_val", T.ArrayType(T.DoubleType()), False),
        T.StructField("buf_has", T.ArrayType(T.BooleanType()), False),
        T.StructField("tail_val", T.ArrayType(T.DoubleType()), False),
        T.StructField("tail_has", T.ArrayType(T.BooleanType()), False),
    ]
)

EWMA_WEIGHTS = tuple(2.0 ** -(i + 1) for i in range(8))

_EWMA_EMPTY = {
    "event_id": pd.Series(dtype="int64"),
    "user_id": pd.Series(dtype="int64"),
    "ewma": pd.Series(dtype="float64"),
}


def _ewma_value(vals, has, weights=EWMA_WEIGHTS):
    """Truncated renormalized EWMA over (newest-first) lag slots.

    Bit-for-bit the batch expression: terms accumulate in lag order
    with left-associative float adds (Python floats ARE IEEE doubles),
    so the streaming emission equals the batch window exactly —
    verified by the oracle on the catalog entry and the pure-Python
    differential in tests/test_properties.py.
    """
    num, den = None, None
    for i, w in enumerate(weights):
        if i < len(vals) and has[i]:
            t, p = vals[i] * w, w
        else:
            t, p = 0.0, 0.0
        num = t if num is None else num + t
        den = p if den is None else den + p
    return (num / den) if den > 0.0 else None


def stateful_ewma(
    events: DataFrame,
    watermark: str = "10 minutes",
    ts_col: str = "ts",
    key_col: str = "user_id",
    id_col: str = "event_id",
    val_col: str = "value",
) -> DataFrame:
    """Streaming per-event truncated EWMA: one output row per event,
    emitted once the event-time watermark guarantees nothing older can
    still arrive — a WATERMARK-ORDERED REPLAY operator (buffer rows,
    release them in exact event-time order when the watermark passes,
    keep only the ≤7-value tail the next emission needs).

    This is the stateful shape lag-window semantics need on a stream:
    Spark's built-in windows can't look back N ROWS across micro-batch
    boundaries, and eager emission would be wrong under out-of-order
    arrival. State per key = the in-flight buffer (bounded by rows per
    watermark delay) + an O(1) lag tail; the buffer is dropped as it
    drains while the tail PERSISTS (any future row's window includes
    the emitted history — the same unbounded-key-lifetime contract a
    batch lag window over the full table has).

    Late-data policy: applyInPandasWithState does NOT auto-drop rows
    older than the watermark (unlike built-in streaming aggregations),
    so a beyond-watermark straggler is emitted BEST-EFFORT against the
    tail as it stands — correct when its true position is after all
    emitted rows (the common case), approximate when it isn't;
    re-slotting into already-emitted history is impossible for any
    incremental operator. Within the watermark the emission equals the
    batch lag window bit-for-bit (unit-tested, and the catalog entry's
    DuckDB oracle IS the batch SQL).

    Stream-end caveat (round-12 review): release is STRICTLY below the
    watermark (Spark only guarantees no more arrivals strictly older
    than it), so a row stamped EXACTLY at the final watermark stays
    buffered until some later batch advances it. A finite replay whose
    last flush batch lands the watermark exactly on a buffered row's
    event time would end with that row unemitted — stage the final
    sentinel strictly later than every real event plus the delay (the
    catalog replay's far-future sentinels satisfy this by days).
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def fold(key, pdfs, state: GroupState):
        user_id = key[0]
        buf: list[tuple[int, int, float, bool]] = []
        if state.exists:
            b_ts, b_eid, b_val, b_has, t_val, t_has = state.get
            buf = list(zip(b_ts, b_eid, b_val, b_has))
            tail = list(zip(t_val, t_has))
        else:
            tail = []

        if not state.hasTimedOut:
            for pdf in pdfs:
                ns = pdf[ts_col].astype("datetime64[ns]").astype("int64")
                vals = pdf[val_col]
                eids = pdf[id_col]
                for t_ns, eid, v in zip(ns.tolist(), eids.tolist(), vals.tolist()):
                    has = v == v and v is not None  # NaN/None → absent
                    buf.append(
                        (int(t_ns) // 1_000, int(eid), float(v) if has else 0.0, bool(has))
                    )

        wm_us = state.getCurrentWatermarkMs() * 1_000
        buf.sort(key=lambda r: (r[0], r[1]))
        out: list[dict] = []
        keep: list[tuple[int, int, float, bool]] = []
        for row in buf:
            # STRICTLY below the watermark: Spark only guarantees no
            # further arrivals with event time < watermark, so a row
            # stamped exactly AT it may still gain an equal-timestamp,
            # smaller-event_id peer in a later batch — emitting it now
            # could break the exact (ts, event_id) emission order the
            # batch-parity claim rests on (round-11 advice). Equal-ts
            # rows wait one more watermark advance.
            if row[0] < wm_us:
                # emission order is exact event-time order: compute from
                # the tail (newest first), then push onto it
                lag_vals = [row[2]] + [tv for tv, _ in tail]
                lag_has = [row[3]] + [th for _, th in tail]
                out.append(
                    {
                        "event_id": row[1],
                        "user_id": user_id,
                        "ewma": _ewma_value(lag_vals, lag_has),
                    }
                )
                tail.insert(0, (row[2], row[3]))
                del tail[len(EWMA_WEIGHTS) - 1 :]
            else:
                keep.append(row)

        if keep:
            state.update(
                (
                    [r[0] for r in keep],
                    [r[1] for r in keep],
                    [r[2] for r in keep],
                    [r[3] for r in keep],
                    [tv for tv, _ in tail],
                    [th for _, th in tail],
                )
            )
            # re-fire as soon as the watermark can release the oldest
            # buffered row (must be strictly above the current watermark)
            state.setTimeoutTimestamp(
                max(keep[0][0] // 1_000 + 1, state.getCurrentWatermarkMs() + 1)
            )
        elif tail:
            # buffer drained but the tail must PERSIST (no timeout): any
            # future row's lag window includes the emitted history, so
            # dropping it would diverge from the batch window. O(1) per
            # key, and unbounded key lifetime is inherent to "last N
            # events ever" semantics — the same contract a batch lag
            # window over the full table has.
            state.update(
                ([], [], [], [], [tv for tv, _ in tail], [th for _, th in tail])
            )
        else:
            state.remove()

        if out:
            yield pd.DataFrame(out)
        else:
            yield pd.DataFrame(_EWMA_EMPTY)

    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(key_col)
        .applyInPandasWithState(
            fold,
            outputStructType=EWMA_SCHEMA,
            stateStructType=EWMA_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
