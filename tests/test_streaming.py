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
