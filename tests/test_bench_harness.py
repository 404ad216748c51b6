"""Spark-free unit tests for the bench harness helpers: family
partitioning must cover the headline set exactly, every headline name
must exist in the registry, and the stats helpers must be total."""

from __future__ import annotations

import importlib.util
import os

import pytest


@pytest.fixture(scope="module")
def bench():
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "bench_under_test", os.path.join(here, "bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_families_partition_headline_exactly(bench):
    fams = bench._families()
    flat = [n for fam in fams for n in fam]
    assert flat == bench.HEADLINE  # order-preserving, no dups, no gaps
    assert all(fam for fam in fams)
    assert len(fams) <= bench.N_FAMILIES


def test_headline_names_all_registered(bench):
    from news_graph_rag_spark.queries import registry

    reg = registry()
    missing = [n for n in bench.HEADLINE if n not in reg]
    assert missing == []
    assert len(set(bench.HEADLINE)) == len(bench.HEADLINE)  # no dup entries


def test_median_helper(bench):
    assert bench._median([3.0]) == 3.0
    assert bench._median([1.0, 9.0, 2.0]) == 2.0
    assert bench._median([4.0, 1.0]) == 2.5


def test_data_stats_shape(bench):
    stats = bench._data_stats("/root/testdata/sf0.001")
    if stats:  # duckdb present in this environment
        assert stats["documents_rows"] > 0
        assert stats["documents_text_bytes"] > 0
    assert bench._data_stats("/nonexistent") == {}
