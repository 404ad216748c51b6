"""Benchmark harness: runs the headline catalog queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:
``{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}``.

Each query is timed end-to-end (plan + execute + collect-to-count).
A warmup pass first runs every headline query at sf0.001 so JVM/codegen
startup (whole-stage codegen compilation is per plan shape) is absorbed
and per-query numbers reflect steady-state throughput at the target SF.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from news_graph_rag_spark.queries import registry  # noqa: E402
from news_graph_rag_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WARMUP_DIR = os.environ.get("SPARK_GRAFT_WARMUP_DIR", "/root/testdata/sf0.001")

# headline set: covers joins, wide agg, windows, retrieval, dedup
HEADLINE = [
    "pricing_summary",
    "graph_2hop_filter_in",
    "graph_3hop_count_distinct",
    "composite_key_join",
    "window_topk_per_group",
    "sessionize",
    "tumbling_hourly",
    "topk_orders",
    "explode_tokens",
    "dedup_exact",
    "dedup_minhash_lsh_pairs",
    "dedup_simhash",
    "dedup_canonicalize",
    "vector_topk_cosine",
    "hybrid_search_rrf",
    "hybrid_search_maxnorm",
    "knn_classify",
    "ann_ivf_topk",
    "fuzzy_entity_lookup",
    "bm25_keyword_topk",
    # advanced relational + graph analytics
    "asof_join_purchase_click",
    "range_join_click_window",
    "rollup_revenue",
    "window_running_total",
    "pagerank_nations",
    "connected_components_parts",
    "text_quality_score",
    "text_lang_id",
    # round-2 additions: late-r1 entries + skew join
    "bucketed_join_revenue",
    "intersect_except_customers",
    "partitioned_scan_pruning",
    "streaming_interval_join",
    "multimodal_frame_sample",
    "salted_skew_join",
    # training-pipeline ops (decontamination, packing, capping, quality)
    "decontaminate_train_test",
    "pack_sequences",
    "cap_per_source",
    "repetition_ratio_filter",
    "tfidf_top_terms",
    "pmi_bigrams_topk",
    "scd2_user_state",
    "bfs_hop_distance_parts",
    "multimodal_audio_windows",
    "text_winnowing",
    "text_pii_redact",
    "importance_weighted_sample",
    "dedup_substring_spans",
    "embedding_quantize_int8",
    "ann_quantized_topk",
    "near_dup_canonicalize_embedding",
    "boilerplate_strip_rebuild",
    "incremental_rollup_merge",
    # round-5 additions: verified bucketed near-dup + wide-dim IVF,
    # SymSpell fuzzy join, k-core, Z-order layout, session windows
    "near_dup_lsh_banded",
    "ann_ivf_wide_topk",
    "fuzzy_join_ed1",
    "kcore_parts",
    "zorder_layout_stats",
    "streaming_session_window",
    # product/privacy analytics: funnel, cohorts, LOCF gap-fill, Markov
    # transitions, map-side heavy hitters, GDPR cascade
    "funnel_view_click_purchase",
    "retention_cohorts",
    "gapfill_locf_hourly",
    "markov_transitions",
    "heavy_hitter_tokens",
    "purge_user_cascade",
    "bellman_ford_4relax",
    "item_item_cosine_topk",
    "table_checksums",
    "pareto_frontier_orders",
    "zscore_outlier_events",
    "nearest_click_join",
    "point_in_time_join",
    "feature_hashing_sparse",
    "join_key_skew_report",
    # end-to-end ingest throughput (chunk + NER + embed + D1-D8 upserts)
    "graph_ingest_roundtrip",
]


def main() -> None:
    spark = get_spark("bench")
    reg = registry()
    warmup_dir = WARMUP_DIR if os.path.isdir(WARMUP_DIR) else SF_DIR

    times: dict[str, float] = {}
    for name in HEADLINE:
        # warm THIS plan shape at the smallest SF immediately before timing
        # it (generated classes are cache-bounded, so a single up-front
        # warmup pass gets evicted by later plans): the timed run then
        # measures steady-state execution, not per-shape JIT/codegen
        reg[name].fn(spark, warmup_dir).count()
        # GC between queries: isolate each timing from the previous
        # query's allocation debris (broadcasts, shuffle buffers)
        spark.sparkContext._jvm.System.gc()
        t0 = time.perf_counter()
        n = reg[name].fn(spark, SF_DIR).count()
        times[name] = round(time.perf_counter() - t0, 3)
        print(f"# {name}: {times[name]:.3f}s ({n} rows)", file=sys.stderr)

    total = round(sum(times.values()), 3)
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
