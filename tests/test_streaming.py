"""Structured Streaming surface: windowed aggregation on a file stream
and foreachBatch graph ingest (idempotent across replays)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from news_graph_rag_spark.graph_store import GraphStore
from news_graph_rag_spark.streaming import streaming_ingest, windowed_event_counts

from fixtures import RAW_SCHEMA, raw_articles_df


def test_windowed_counts_batch_equals_stream(spark, sf_dir, tmp_path):
    from news_graph_rag_spark.queries.catalog import load

    events = load(spark, sf_dir, "events")
    batch = windowed_event_counts(events, "1 hour").cache()

    # same data replayed as a file stream
    src = str(tmp_path / "events_src")
    events.write.parquet(src)
    stream = (
        spark.readStream.schema(events.schema).parquet(src)
    )
    agg = windowed_event_counts(stream, "1 hour")
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("win_counts")
        .start()
    )
    try:
        q.processAllAvailable()
        got = spark.sql("SELECT * FROM win_counts")
        b = {(str(r["window"]), r["event_type"]): (r["n"], r["sum_value"])
             for r in batch.collect()}
        s = {(str(r["window"]), r["event_type"]): (r["n"], r["sum_value"])
             for r in got.collect()}
        assert b == s
    finally:
        q.stop()


def test_streaming_ingest_foreachbatch(spark, tmp_path):
    raw_dir = str(tmp_path / "raw")
    store_root = str(tmp_path / "graph")
    ckpt = str(tmp_path / "ckpt")
    raw_articles_df(spark).write.parquet(raw_dir)

    stream = spark.readStream.schema(RAW_SCHEMA).parquet(raw_dir)

    def make_store() -> GraphStore:
        import os

        if os.path.exists(store_root):
            return GraphStore.load(spark, store_root)
        return GraphStore.empty(spark)

    q = streaming_ingest(stream, store_root, make_store, ckpt)
    q.awaitTermination(120)

    loaded = GraphStore.load(spark, store_root)
    assert loaded["article"].count() == 3
    assert loaded["published"].count() == 3
    # second run over the same source: checkpoint skips processed files,
    # and even a forced re-ingest is idempotent by key
    stream2 = spark.readStream.schema(RAW_SCHEMA).parquet(raw_dir)
    q2 = streaming_ingest(stream2, store_root, make_store, ckpt)
    q2.awaitTermination(60)
    again = GraphStore.load(spark, store_root)
    assert again["article"].count() == 3


def test_streaming_ingest_second_batch_against_existing_store(spark, tmp_path):
    """A micro-batch that starts from a non-empty store must not
    overwrite the parquet paths its own lazy plan still reads
    (regression: plain save raised 'Cannot overwrite a path that is
    also being read from' / corrupted data on every batch after the
    first)."""
    import pyspark.sql as psql

    raw_dir = str(tmp_path / "raw")
    store_root = str(tmp_path / "graph")
    ckpt = str(tmp_path / "ckpt")

    full = raw_articles_df(spark)
    first_two = full.limit(2)
    third = full.subtract(first_two)
    first_two.write.parquet(raw_dir)

    def make_store() -> GraphStore:
        import os

        if os.path.exists(store_root):
            return GraphStore.load(spark, store_root)
        return GraphStore.empty(spark)

    stream = spark.readStream.schema(RAW_SCHEMA).parquet(raw_dir)
    q = streaming_ingest(stream, store_root, make_store, ckpt)
    q.awaitTermination(120)
    assert GraphStore.load(spark, store_root)["article"].count() == 2

    # new file lands; same checkpoint → only the new file is a batch,
    # processed against the EXISTING store (the load-then-save path)
    third.write.mode("append").parquet(raw_dir)
    stream2 = spark.readStream.schema(RAW_SCHEMA).parquet(raw_dir)
    q2 = streaming_ingest(stream2, store_root, make_store, ckpt)
    q2.awaitTermination(120)
    if q2.exception() is not None:
        raise AssertionError(f"second micro-batch failed: {q2.exception()}")

    loaded = GraphStore.load(spark, store_root)
    assert loaded["article"].count() == 3
    assert loaded["published"].count() == 3
    # earlier batch's nodes survived the swap
    assert loaded["source"].count() == 2


def test_stateful_sessionize_matches_batch(spark, sf_dir, tmp_path):
    """applyInPandasWithState sessionizer == batch lag/sum sessionizer.

    Replay: real events (one batch), then two far-future sentinel files
    (separate batches) so the event-time watermark advances past every
    real session's close and EventTimeTimeout flushes them all.
    """
    import os
    import time

    from pyspark.sql import Window
    from news_graph_rag_spark.queries.catalog import load
    from news_graph_rag_spark.streaming.stateful import stateful_sessionize

    GAP_S = 1800
    events = (
        load(spark, sf_dir, "events")
        .filter(F.col("user_id") < 20)
        .select("user_id", "ts")
    )

    # expected: batch gap-sessionization (same rule as the `sessionize`
    # catalog query), shaped as (user, start, end, n)
    w = Window.partitionBy("user_id").orderBy("ts")
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    run = Window.partitionBy("user_id").orderBy("ts").rowsBetween(
        Window.unboundedPreceding, 0
    )
    expected = {
        (r["user_id"], str(r["s"]), str(r["e"]), r["n"])
        for r in (
            events.withColumn(
                "new_s",
                F.when(gap_us.isNull() | (gap_us > GAP_S * 1_000_000), 1).otherwise(0),
            )
            .withColumn("sid", F.sum("new_s").over(run))
            .groupBy("user_id", "sid")
            .agg(
                F.min("ts").alias("s"),
                F.max("ts").alias("e"),
                F.count(F.lit(1)).alias("n"),
            )
            .collect()
        )
    }

    # stage: real data, then two sentinel batches to drive the watermark.
    # Each stage is one deterministically-named file with ascending mtime
    # so FileStreamSource replays them in order.
    import glob
    import shutil

    src = str(tmp_path / "sess_src")
    os.makedirs(src)
    max_ts = events.agg(F.max("ts")).first()[0]
    stages = [events]
    for days in (10, 20):
        stages.append(
            spark.sql(
                f"SELECT CAST(999999 AS BIGINT) AS user_id, "
                f"timestamp'{max_ts}' + INTERVAL {days} DAYS AS ts"
            )
        )
    now = time.time()
    for i, df in enumerate(stages):
        tmp_out = str(tmp_path / f"stage_{i}")
        df.coalesce(1).write.parquet(tmp_out)
        dest = os.path.join(src, f"{i:03d}.parquet")
        shutil.copy(glob.glob(f"{tmp_out}/part-*.parquet")[0], dest)
        os.utime(dest, (now + i * 10, now + i * 10))

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    sessions = stateful_sessionize(stream, gap_seconds=GAP_S, watermark="10 minutes")
    q = (
        sessions.writeStream.outputMode("append")
        .format("memory")
        .queryName("stateful_sessions")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r["user_id"], str(r["session_start"]), str(r["session_end"]), r["n_events"])
            for r in spark.sql(
                "SELECT * FROM stateful_sessions WHERE user_id < 20"
            ).collect()
        }
        assert got == expected
    finally:
        q.stop()


def test_stateful_sessionize_in_watermark_late_event(spark, tmp_path):
    """An in-watermark late event arriving in a LATER micro-batch must
    merge into the open session without moving its end backwards
    (regression: unconditional last_us = t emitted session_end <
    session_start and could close the session prematurely)."""
    import glob
    import os
    import shutil
    import time

    from news_graph_rag_spark.streaming.stateful import stateful_sessionize

    def df_at(uid, *ts_strs):
        return spark.sql(
            f"SELECT CAST({uid} AS BIGINT) AS user_id, ts FROM VALUES "
            + ", ".join(f"(timestamp'{t}')" for t in ts_strs)
            + " AS v(ts)"
        )

    stages = [
        df_at(1, "2024-01-01 12:00:00", "2024-01-01 12:01:00"),
        df_at(1, "2024-01-01 12:00:30"),  # late, within 10-min watermark
        df_at(999999, "2024-02-01 00:00:00"),  # sentinel: advance watermark
        df_at(999999, "2024-03-01 00:00:00"),  # sentinel: flush timed-out state
    ]
    src = str(tmp_path / "late_src")
    os.makedirs(src)
    now = time.time()
    for i, df in enumerate(stages):
        tmp_out = str(tmp_path / f"late_stage_{i}")
        df.coalesce(1).write.parquet(tmp_out)
        dest = os.path.join(src, f"{i:03d}.parquet")
        shutil.copy(glob.glob(f"{tmp_out}/part-*.parquet")[0], dest)
        os.utime(dest, (now + i * 10, now + i * 10))

    stream = (
        spark.readStream.schema("user_id long, ts timestamp")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    sessions = stateful_sessionize(stream, gap_seconds=1800, watermark="10 minutes")
    q = (
        sessions.writeStream.outputMode("append")
        .format("memory")
        .queryName("late_sessions")
        .start()
    )
    try:
        q.processAllAvailable()
        got = [
            (str(r["session_start"]), str(r["session_end"]), r["n_events"])
            for r in spark.sql(
                "SELECT * FROM late_sessions WHERE user_id = 1"
            ).collect()
        ]
        assert got == [("2024-01-01 12:00:00", "2024-01-01 12:01:00", 3)]
    finally:
        q.stop()


def test_streaming_dedup_matches_batch_distinct(spark, sf_dir, tmp_path):
    """dropDuplicatesWithinWatermark over a replayed stream with planted
    duplicates == batch distinct on the key (bounded state: one entry
    per key per watermark window)."""
    from news_graph_rag_spark.queries.catalog import load
    from news_graph_rag_spark.streaming import streaming_dedup

    ev = (
        load(spark, sf_dir, "events")
        .filter(F.col("user_id") < 50)
        .select("user_id", "ts", "event_type")
    )
    doubled = ev.union(ev)  # every row duplicated
    src = str(tmp_path / "dedup_src")
    doubled.write.parquet(src)

    expected = set(
        (r["user_id"], str(r["ts"]), r["event_type"]) for r in ev.distinct().collect()
    )

    stream = spark.readStream.schema(doubled.schema).parquet(src)
    deduped = streaming_dedup(
        stream, key_cols=("user_id", "ts", "event_type"), watermark="1 hour"
    )
    q = (
        deduped.writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_out")
        .start()
    )
    try:
        q.processAllAvailable()
        got = set(
            (r["user_id"], str(r["ts"]), r["event_type"])
            for r in spark.table("dedup_out").collect()
        )
        assert got == expected
    finally:
        q.stop()


def test_compact_parquet_reduces_files_preserves_data(spark, sf_dir, tmp_path):
    from news_graph_rag_spark.maintenance import (
        compact_parquet,
        parquet_bytes,
        parquet_file_count,
    )
    from news_graph_rag_spark.queries.catalog import load

    path = str(tmp_path / "frag")
    ev = load(spark, sf_dir, "events").select("user_id", "ts", "event_type", "value")
    ev.repartition(40).write.parquet(path)
    assert parquet_file_count(path) == 40
    before = sorted(
        (r["user_id"], str(r["ts"]), r["event_type"], r["value"])
        for r in spark.read.parquet(path).collect()
    )

    target = max(1, parquet_bytes(path) // 3)
    n_after = compact_parquet(spark, path, target_file_bytes=target)
    assert n_after < 40
    assert parquet_file_count(path) == n_after
    after = sorted(
        (r["user_id"], str(r["ts"]), r["event_type"], r["value"])
        for r in spark.read.parquet(path).collect()
    )
    assert before == after
    # a target smaller than any file → would need MORE files → no-op
    assert compact_parquet(spark, path, target_file_bytes=1) == parquet_file_count(
        path
    )


def test_stream_stream_interval_join_matches_batch(spark, sf_dir, tmp_path):
    """Stream-stream interval join == batch inequality join on the same
    events (inner joins emit on match, so a plain replay suffices)."""
    from news_graph_rag_spark.queries.catalog import load
    from news_graph_rag_spark.streaming.ingest_stream import (
        stream_stream_interval_join,
    )

    ev = load(spark, sf_dir, "events").filter(F.col("user_id") < 30)
    purchases = ev.filter(F.col("event_type") == "purchase").select("user_id", "ts")
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts")

    expected = {
        (r["user_id"], str(r["purchase_ts"]), str(r["click_ts"]))
        for r in purchases.alias("p")
        .join(
            clicks.alias("c"),
            F.expr(
                "p.user_id = c.user_id "
                "AND c.ts > p.ts - INTERVAL 300 SECONDS AND c.ts <= p.ts"
            ),
        )
        .select(
            F.col("p.user_id").alias("user_id"),
            F.col("p.ts").alias("purchase_ts"),
            F.col("c.ts").alias("click_ts"),
        )
        .collect()
    }
    assert expected  # non-trivial fixture

    p_dir, c_dir = str(tmp_path / "p"), str(tmp_path / "c")
    purchases.write.parquet(p_dir)
    clicks.write.parquet(c_dir)
    ps = spark.readStream.schema(purchases.schema).parquet(p_dir)
    cs = spark.readStream.schema(clicks.schema).parquet(c_dir)
    joined = stream_stream_interval_join(ps, cs, interval_seconds=300)
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName("ssj_out")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r["user_id"], str(r["purchase_ts"]), str(r["click_ts"]))
            for r in spark.table("ssj_out").collect()
        }
        assert got == expected
    finally:
        q.stop()


def test_streaming_index_append_searchable(spark, tmp_path):
    """Streaming half of ANN maintenance (round 8): a file stream of
    new embeddings appends into the persistent index via foreachBatch;
    after the stream drains, the appended vectors are searchable with
    exact scores and the quantizer is untouched."""
    from news_graph_rag_spark.pipeline import ann_index
    from news_graph_rag_spark.streaming.ingest_stream import (
        streaming_index_append,
    )

    base = [(i, [float((i % 4) + 1), float((i * 3) % 7 + 1)]) for i in range(20)]
    df = spark.createDataFrame(base, "vec_id long, embedding array<float>")
    idx = str(tmp_path / "stream_idx")
    ann_index.build_and_save(df, idx, n_centroids=2, iters=1)
    cents = sorted(tuple(r) for r in ann_index.load_index(spark, idx)[1].collect())

    # new arrivals: exact clones of vectors 0 and 1 under fresh ids
    new_dir = str(tmp_path / "incoming")
    spark.createDataFrame(
        [(100, base[0][1]), (101, base[1][1])],
        "vec_id long, embedding array<float>",
    ).write.parquet(new_dir)
    stream = spark.readStream.schema("vec_id long, embedding array<float>").parquet(
        new_dir
    )
    q = streaming_index_append(stream, idx, str(tmp_path / "ckpt"))
    q.awaitTermination(120)

    assignments, centroids, _ = ann_index.load_index(spark, idx)
    assert assignments.count() == 22
    assert sorted(tuple(r) for r in centroids.collect()) == cents  # frozen
    hits = {r["vec_id"]: r["dot"] for r in
            ann_index.search_by_id(spark, idx, 0, 22, 2).collect()}
    assert 100 in hits
    assert hits[100] == max(hits.values())  # clone of the probe ties max


def test_streaming_hll_registers_match_batch(spark, sf_dir, tmp_path):
    """The streaming HLL register state after draining a replayed
    events stream must EQUAL the batch entry's registers — sketch
    states merge by max, so micro-batch order cannot matter."""
    from news_graph_rag_spark.queries import registry
    from news_graph_rag_spark.streaming.ingest_stream import (
        streaming_hll_registers,
    )

    batch = {
        (r["event_type"], r["register_idx"]): r["max_rho"]
        for r in registry()["hll_registers_users"].fn(spark, sf_dir).collect()
    }

    from news_graph_rag_spark.queries.catalog import load

    # replay in several files so register maxes really merge across
    # micro-batches
    src = str(tmp_path / "events_src")
    load(spark, sf_dir, "events").select("event_type", "user_id").repartition(
        4
    ).write.parquet(src)
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    q = (
        streaming_hll_registers(stream)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("hll_regs")
        .start()
    )
    try:
        q.processAllAvailable()
        streamed = {
            (r["key"], r["register_idx"]): r["max_rho"]
            for r in spark.sql("SELECT * FROM hll_regs").collect()
        }
    finally:
        q.stop()
    assert streamed == batch


def test_stream_stream_left_outer_join_evicts_unmatched(spark, tmp_path):
    """Left-outer stream-stream interval join (round 10): a purchase
    with no click in its window must emit exactly once with NULL click
    — but ONLY after the watermark passes its eviction horizon, which
    sentinel batches drive. Also pins the pushdown hazard: filtering
    sentinels INSIDE the streaming plan reaches the file scans and
    starves the watermark, so the filter must live on the sink table."""
    import datetime as dt
    import glob
    import os
    import shutil
    import tempfile
    import time

    from news_graph_rag_spark.streaming.ingest_stream import (
        stream_stream_interval_join,
    )

    def stage(dfs, name):
        root = str(tmp_path / name)
        os.makedirs(root)
        now = time.time()
        for i, df in enumerate(dfs):
            t = tempfile.mkdtemp()
            df.coalesce(1).write.mode("overwrite").parquet(t)
            dest = os.path.join(root, f"{i:03d}.parquet")
            shutil.copy(glob.glob(f"{t}/part-*.parquet")[0], dest)
            os.utime(dest, (now + i * 10, now + i * 10))
            shutil.rmtree(t, ignore_errors=True)
        return root

    mk = lambda rows: spark.createDataFrame(  # noqa: E731
        rows, "user_id bigint, ts timestamp"
    )
    t0 = dt.datetime(2024, 1, 1)
    real_p = mk([(1, t0), (2, t0 + dt.timedelta(minutes=90))])
    real_c = mk([(1, t0)])  # user 1 matches; user 2 has no click
    sents = [mk([(999, t0 + dt.timedelta(days=d))]) for d in (10, 20, 30)]
    p_dir = stage([real_p] + sents, "p")
    c_dir = stage([real_c] + sents, "c")
    ps = (
        spark.readStream.schema(real_p.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(p_dir)
    )
    cs = (
        spark.readStream.schema(real_c.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(c_dir)
    )
    q = (
        stream_stream_interval_join(
            ps, cs, interval_seconds=300, how="leftOuter"
        )
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("ssjo_test")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = sorted(
        (r["user_id"], r["click_ts"] is None)
        for r in spark.table("ssjo_test")
        .filter(F.col("user_id") != 999)
        .collect()
    )
    # user 1 matched (click_ts NOT null); user 2 evicted as unmatched
    assert got == [(1, False), (2, True)]


def test_stateful_ewma_tail_persists_and_orders_late_rows(spark, tmp_path):
    """Round-11 watermark-ordered EWMA: (a) an in-watermark late row
    arriving in a LATER batch must slot into its true event-time
    position before emission; (b) the per-user lag tail must PERSIST
    after the buffer drains, so an event arriving much later still
    sees the full history; (c) NULL values occupy a lag slot but are
    renormalized out."""
    import glob
    import os
    import shutil
    import time

    from news_graph_rag_spark.streaming.stateful import stateful_ewma

    def df_rows(*rows):
        return spark.sql(
            "SELECT * FROM VALUES "
            + ", ".join(
                f"(CAST({eid} AS BIGINT), timestamp'{ts}', "
                f"CAST({uid} AS BIGINT), "
                + (f"CAST({v} AS DOUBLE)" if v is not None else "CAST(NULL AS DOUBLE)")
                + ")"
                for eid, ts, uid, v in rows
            )
            + " AS v(event_id, ts, user_id, value)"
        )

    stages = [
        df_rows(
            (1, "2024-01-01 12:00:00", 1, 8.0),
            (3, "2024-01-01 12:02:00", 1, 2.0),
        ),
        # event 2 is LATE (between 1 and 3) but inside the 10-min
        # watermark; NULL value occupies a lag slot
        df_rows((2, "2024-01-01 12:01:00", 1, None)),
        # sentinel advances the watermark far enough to flush 1..3 and
        # DRAIN the buffer (tail must survive the drain)
        df_rows((90, "2024-01-01 13:00:00", 999, 0.0)),
        # much later event for the same user: lags must include 8.0/2.0
        df_rows((4, "2024-01-01 12:30:00", 1, 4.0)),
        df_rows((91, "2024-02-01 00:00:00", 999, 0.0)),
        df_rows((92, "2024-03-01 00:00:00", 999, 0.0)),
    ]
    src = str(tmp_path / "ewma_src")
    os.makedirs(src)
    now = time.time()
    for i, df in enumerate(stages):
        tmp_out = str(tmp_path / f"ewma_stage_{i}")
        df.coalesce(1).write.parquet(tmp_out)
        dest = os.path.join(src, f"{i:03d}.parquet")
        shutil.copy(glob.glob(f"{tmp_out}/part-*.parquet")[0], dest)
        os.utime(dest, (now + i * 10, now + i * 10))

    stream = (
        spark.readStream.schema("event_id long, ts timestamp, user_id long, value double")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = (
        stateful_ewma(stream, watermark="10 minutes")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("ewma_unit_out")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            r["event_id"]: r["ewma"]
            for r in spark.sql(
                "SELECT * FROM ewma_unit_out WHERE user_id = 1"
            ).collect()
        }
    finally:
        q.stop()
    # event 1: only itself -> 8.0
    assert got[1] == 8.0
    # event 2 (late, NULL value): lags = [NULL, 8.0] -> 8*0.25/0.25 = 8.0
    assert got[2] == 8.0
    # event 3: lags = [2.0, NULL, 8.0] -> (2*0.5 + 8*0.125)/(0.5+0.125)
    assert got[3] == (2.0 * 0.5 + 8.0 * 0.125) / (0.5 + 0.125)
    # event 4 arrives BEYOND the watermark (wm=12:50 after the 13:00
    # sentinel): applyInPandasWithState does not auto-drop it, and the
    # operator emits it best-effort against the persisted tail — exact
    # here because its true position is after all emitted rows
    assert got[4] == (4.0 * 0.5 + 2.0 * 0.25 + 8.0 * 0.0625) / (0.5 + 0.25 + 0.0625)
    assert set(got) == {1, 2, 3, 4}


def test_stream_stream_left_anti_join_eviction_only(spark, tmp_path):
    """Left-anti stream-stream interval join (round 14): a purchase
    with NO click in its window emits exactly once — and ONLY at
    watermark eviction (sentinel-driven), because until the window
    closes a match could still arrive; a MATCHED purchase never emits
    at all. Also pins that the NULL-click filter composes ABOVE the
    join (output schema carries only the purchase side)."""
    import datetime as dt
    import glob
    import os
    import shutil
    import tempfile
    import time

    from news_graph_rag_spark.streaming.ingest_stream import (
        stream_stream_interval_join,
    )

    def stage(dfs, name):
        root = str(tmp_path / name)
        os.makedirs(root)
        now = time.time()
        for i, df in enumerate(dfs):
            t = tempfile.mkdtemp()
            df.coalesce(1).write.mode("overwrite").parquet(t)
            dest = os.path.join(root, f"{i:03d}.parquet")
            shutil.copy(glob.glob(f"{t}/part-*.parquet")[0], dest)
            os.utime(dest, (now + i * 10, now + i * 10))
            shutil.rmtree(t, ignore_errors=True)
        return root

    mk = lambda rows: spark.createDataFrame(  # noqa: E731
        rows, "user_id bigint, ts timestamp"
    )
    t0 = dt.datetime(2024, 1, 1)
    real_p = mk([(1, t0), (2, t0 + dt.timedelta(minutes=90))])
    real_c = mk([(1, t0)])  # user 1 matches; user 2 has no click
    sents = [mk([(999, t0 + dt.timedelta(days=d))]) for d in (10, 20, 30)]

    # phase 1: NO sentinels — the watermark never passes any eviction
    # horizon, so the anti join must emit NOTHING (not even user 2)
    p1 = stage([real_p], "p1")
    c1 = stage([real_c], "c1")
    ps = (
        spark.readStream.schema(real_p.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(p1)
    )
    cs = (
        spark.readStream.schema(real_c.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(c1)
    )
    joined = stream_stream_interval_join(
        ps, cs, interval_seconds=300, how="leftAnti"
    )
    assert joined.columns == ["user_id", "purchase_ts"]
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName("ssja_phase1")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert spark.table("ssja_phase1").count() == 0

    # phase 2: sentinel batches drive the watermark past the horizon —
    # user 2 evicts as the single anti row; user 1 (matched) never emits
    p2 = stage([real_p] + sents, "p2")
    c2 = stage([real_c] + sents, "c2")
    ps2 = (
        spark.readStream.schema(real_p.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(p2)
    )
    cs2 = (
        spark.readStream.schema(real_c.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(c2)
    )
    q2 = (
        stream_stream_interval_join(
            ps2, cs2, interval_seconds=300, how="leftAnti"
        )
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("ssja_phase2")
        .start()
    )
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    got = [
        (r["user_id"], str(r["purchase_ts"]))
        for r in spark.table("ssja_phase2")
        .filter(F.col("user_id") != 999)
        .collect()
    ]
    assert got == [(2, str(t0 + dt.timedelta(minutes=90)))]


def test_streaming_codes_append_both_tiers_and_torn_heal(spark, sf_dir):
    """Round-16 (VERDICT r15 #3): the foreachBatch → append_codes sink
    lands every micro-batch in BOTH serving tiers, the last batch's
    vectors are immediately servable, and a TORN append (assignments
    landed, codes missing — the detectable crash shape) heals through
    the entry's retire + rebuild on the next invocation."""
    import glob
    import os
    import shutil

    from pyspark.sql import functions as F

    from news_graph_rag_spark.pipeline import ann_index as ai
    from news_graph_rag_spark.queries import registry
    from news_graph_rag_spark.queries.retrieval_queries import _IVF_INCR_BASE
    from news_graph_rag_spark.queries.round13 import _PQ_KS, _PQ_M
    from news_graph_rag_spark.queries.round16 import _STREAMINS_VARIANT

    entry = registry()["streaming_ann_ingest_search"].fn
    first = [tuple(r) for r in entry(spark, sf_dir).collect()]
    assert len(first) == 10

    pred = _IVF_INCR_BASE.format(t="string")
    path = ai.ensure_pq(
        spark, sf_dir, m=_PQ_M, ks=_PQ_KS,
        variant=_STREAMINS_VARIANT, subset_pred=pred,
    )
    codes_dir = os.path.join(ai._pq_dir(path, _PQ_M, _PQ_KS), "codes.parquet")
    apath = os.path.join(path, "assignments.parquet")
    not_base = ~F.expr(pred)
    n_codes = spark.read.parquet(codes_dir).filter(not_base).count()
    n_assign = spark.read.parquet(apath).filter(not_base).count()
    assert n_codes == n_assign > 0  # both tiers carry the streamed rows

    # tear the state: drop one appended code file (codes < assignments)
    appended = sorted(
        f
        for f in glob.glob(os.path.join(codes_dir, "centroid_id=*/*.parquet"))
        if os.path.getmtime(f)
        > os.path.getmtime(os.path.join(path, "meta.json"))
    )
    assert appended, "streamed code files should postdate the base build"
    os.unlink(appended[0])
    torn = spark.read.parquet(codes_dir).filter(not_base).count()
    assert torn < n_codes

    # next invocation detects the torn tier pair and heals by
    # retire + rebuild + re-stream — same values as the first run
    healed = [tuple(r) for r in entry(spark, sf_dir).collect()]
    assert healed == first
    shutil.rmtree(ai.ensure_pq(
        spark, sf_dir, m=_PQ_M, ks=_PQ_KS,
        variant=_STREAMINS_VARIANT, subset_pred=pred,
    ), ignore_errors=True)
