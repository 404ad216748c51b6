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
