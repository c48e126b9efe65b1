"""Bench orchestrator invariants that need no SparkSession: the child
protocol round-trips, budgets cover exactly the benched set, and the
query names are real suite entries (a typo here would silently bench
nothing)."""

from __future__ import annotations

import importlib.util
import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_bench():
    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(ROOT, "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_budgets_cover_exactly_the_benched_set():
    b = _load_bench()
    budget_keys = set(b.BUDGETS_SF01)
    bench_keys = set(b.BENCH_QUERIES) | {"q01_cache_miss", "q01_cache_hit"}
    assert budget_keys == bench_keys, (
        budget_keys ^ bench_keys,
        "every benched entry needs a budget and vice versa",
    )


def test_bench_names_are_real_suite_queries():
    sys.path.insert(0, ROOT)
    from elusion_spark.suite import QUERIES

    b = _load_bench()
    missing = [n for n in b.BENCH_QUERIES + b.SF1_QUERIES
               if n not in QUERIES]
    assert not missing, missing


def test_groups_partition_the_query_list():
    b = _load_bench()
    groups = [b.BENCH_QUERIES[i:i + b.GROUP_SIZE]
              for i in range(0, len(b.BENCH_QUERIES), b.GROUP_SIZE)]
    flat = [q for g in groups for q in g]
    assert flat == b.BENCH_QUERIES
    assert all(len(g) <= b.GROUP_SIZE for g in groups)


def test_child_sentinel_parsing(monkeypatch):
    b = _load_bench()

    class FakeProc:
        returncode = 0
        stderr = ""
        stdout = ("some spark INFO noise\n"
                  + b._SENTINEL + json.dumps({"times": {"q": 1.0}}) + "\n")

    monkeypatch.setattr(b.subprocess, "run",
                        lambda *a, **k: FakeProc())
    assert b._spawn({"queries": ["q"], "sf_dir": "x"}) == {
        "times": {"q": 1.0}}

    class DeadProc:
        returncode = 1
        stderr = "boom"
        stdout = "no sentinel here"

    monkeypatch.setattr(b.subprocess, "run",
                        lambda *a, **k: DeadProc())
    import pytest

    with pytest.raises(RuntimeError, match="boom"):
        b._spawn({"queries": ["q"], "sf_dir": "x"})
