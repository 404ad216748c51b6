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


def test_families_partition_headline_exactly(bench, monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_BENCH_FAMILIES", raising=False)
    fams = bench._families()
    flat = [n for fam in fams for n in fam]
    assert flat == bench.HEADLINE  # order-preserving, no dups, no gaps
    assert all(fam for fam in fams)
    assert all(len(fam) == bench.FAMILY_CHUNK for fam in fams[:-1])


def test_family_assignment_invariant_under_appends(bench, monkeypatch):
    """VERDICT r14 #7: appending new HEADLINE entries must never move
    an existing query to a different family or change its
    within-family predecessors — the fixed-chunk pin that makes
    cross-round per-entry comparisons compare like cohorts (the old
    ceil(len/8) sizing reshuffled every boundary on growth)."""
    monkeypatch.delenv("SPARK_GRAFT_BENCH_FAMILIES", raising=False)

    def fam_of(names):
        out = {}
        size = bench.FAMILY_CHUNK
        for i, n in enumerate(names):
            out[n] = (i // size, i % size)
        return out

    base = fam_of(bench.HEADLINE)
    grown = fam_of(bench.HEADLINE + [f"__new_{i}" for i in range(40)])
    assert all(grown[n] == base[n] for n in bench.HEADLINE)
    # and the live _families() agrees with the fixed-chunk assignment
    fams = bench._families()
    live = {n: (fi, pi) for fi, fam in enumerate(fams) for pi, n in enumerate(fam)}
    assert live == base


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


def _write_driver_doc(tmp_path, round_no, line, keep=2000):
    """Mimic the driver: archive only the LAST `keep` chars of stdout."""
    import json

    doc = {"n": round_no, "rc": 0, "sf": 0.1, "tail": line[-keep:]}
    (tmp_path / f"BENCH_r{round_no:02d}.json").write_text(json.dumps(doc))


def _synthetic_bench_line(queries, spread):
    """Reproduce the emitter's key order: "queries" LAST (r7 lesson)."""
    import json

    return json.dumps(
        {
            "metric": "headline_queries_total",
            "value": round(sum(queries.values()), 3),
            "unit": "sec",
            "spread": spread,
            "data": {"documents_rows": 60000, "documents_text_bytes": 1.0e8},
            "sf": 0.1,
            "queries": queries,
        }
    )


def test_truncated_tail_recovers_times_not_spreads(bench, tmp_path, monkeypatch):
    """VERDICT r7 #1: a 2000-char suffix truncation must still recover
    per-query SECONDS. With "queries" emitted last, the tail keeps the
    marker + times even when the front (metric/value/spread) is gone."""
    queries = {f"q{i:03d}_{'x' * 20}": 1.0 + i / 100 for i in range(90)}
    spread = {k: 1.1 for k in queries}
    line = _synthetic_bench_line(queries, spread)
    assert len(line) > 2000  # truncation actually bites
    _write_driver_doc(tmp_path, 42, line)
    monkeypatch.setattr(bench, "__file__", str(tmp_path / "bench.py"))
    path, sf, times = bench._previous_round_times()
    assert path.endswith("BENCH_r42.json")
    assert sf == 0.1
    # every query whose pair survived the cut parses back as its TIME
    assert times, "no times recovered from truncated tail"
    for k, v in times.items():
        assert v == queries[k], f"{k}: scraped {v}, emitted {queries[k]}"
    # the fully-survived suffix should recover the vast majority
    assert len(times) > len(queries) * 0.5


def test_spread_only_tail_yields_no_times(bench, tmp_path, monkeypatch):
    """The r7 artifact: tail truncated inside the spread dict, no
    '"queries"' marker anywhere. The scraper must NOT feed those
    spread values (~1.0-1.3) to the guard as seconds."""
    import json

    # emulate the poisoned r7 shape: tail is mid-spread-dict onward,
    # with data/sf after it and no "queries" marker at all
    spread_frag = ", ".join(f'"q{i:03d}": 1.1' for i in range(60))
    tail = spread_frag + '}, "data": {"documents_rows": 60000}, "sf": 0.1}'
    doc = {"n": 7, "rc": 0, "sf": 0.1, "tail": tail[-2000:]}
    (tmp_path / "BENCH_r07.json").write_text(json.dumps(doc))
    monkeypatch.setattr(bench, "__file__", str(tmp_path / "bench.py"))
    _, _, times = bench._previous_round_times()
    assert times == {}  # guard silently skips; never false-flags


def test_guard_skips_untrusted_high_spread(bench, monkeypatch, capsys):
    """VERDICT r7 #6: a query whose CURRENT spread exceeds 1.3 is the
    harness's own 'do not trust this timing' signal — the guard reports
    it as info, not as a REGRESSION."""
    monkeypatch.setattr(
        bench,
        "_previous_round_times",
        lambda: ("BENCH_r07.json", 0.1, {"fast": 1.0, "noisy": 1.0}),
    )
    monkeypatch.setattr(bench, "SF_DIR", "/root/testdata/sf0.1")
    bench._regression_guard(
        {"fast": 2.0, "noisy": 2.0}, {"fast": 1.05, "noisy": 2.5}
    )
    err = capsys.readouterr().err
    assert "REGRESSION fast" in err  # trusted timing still flagged
    assert "REGRESSION noisy" not in err  # untrusted timing softened
    assert "timing untrusted" in err


def test_data_stats_shape(bench):
    stats = bench._data_stats("/root/testdata/sf0.001")
    if stats:  # duckdb present in this environment
        assert stats["documents_rows"] > 0
        assert stats["documents_text_bytes"] > 0
    assert bench._data_stats("/nonexistent") == {}
