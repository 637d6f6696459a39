"""Unit contract for bench.py's best-of-N pass merge.

The merged artifact is the official per-round benchmark record
(BENCH_r{N}.json), so its semantics are pinned here: wall-clock fields
take the fastest pass, throughput fields (``*_per_s``, ``*speedup*``)
take the best pass — NOT the worst, even though they also end in
``_s``.
"""
from __future__ import annotations

import importlib.util
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_bench():
    spec = importlib.util.spec_from_file_location(
        "bench_mod", os.path.join(_REPO, "bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["bench_mod"] = mod
    spec.loader.exec_module(mod)
    return mod


def _pass(walls_fast: bool) -> dict:
    # one pass fast, one slow; derived throughput tracks its own wall
    wall = 5.0 if walls_fast else 10.0
    return {
        "metric": "headline_queries_total",
        "value": 0.0,
        "unit": "sec",
        "queries": {"q1": wall},
        "kernels": {"k1_ms": wall},
        "dedupe": {
            "records": 100,
            "sim_throughput_wall_s": wall,
            "sim_throughput_pairs_per_s": 1000.0 / wall,
            "staged_speedup_vs_exact_match": 2.0 if walls_fast else 1.5,
            "f1": 1.0,
        },
        "load_avg": {"start_1m": 1.0},
        "sf": 0.001,
    }


def test_merge_takes_min_wall_and_max_throughput():
    bench = _load_bench()
    merged = bench._merge_passes([_pass(False), _pass(True)])
    d = merged["dedupe"]
    assert d["sim_throughput_wall_s"] == 5.0
    # regression: *_per_s used to hit the endswith("_s") min branch and
    # keep the WORST pass (100.0)
    assert d["sim_throughput_pairs_per_s"] == 200.0
    assert d["staged_speedup_vs_exact_match"] == 2.0
    # wall and throughput stay mutually consistent (same best pass)
    assert abs(1000.0 / d["sim_throughput_wall_s"]
               - d["sim_throughput_pairs_per_s"]) < 1e-9
    assert merged["queries"]["q1"] == 5.0
    assert merged["kernels"]["k1_ms"] == 5.0
    assert merged["passes"] == 2
    assert merged["load_avg_per_pass"] == [{"start_1m": 1.0}] * 2


def test_merge_single_pass_identity():
    bench = _load_bench()
    merged = bench._merge_passes([_pass(True)])
    assert merged["dedupe"]["sim_throughput_pairs_per_s"] == 200.0
    assert merged["passes"] == 1
