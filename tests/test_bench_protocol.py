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


# ---------------------------------------------------------------------
# Contention guard (VERDICT r6 ask #1): synthetic-contention scenarios
# against the parent-side decision logic — a uniformly slowed group is
# flagged for rerun and its violations carry the canary evidence; a
# single-query regression is NOT rerun and survives annotation as a
# real violation.
# ---------------------------------------------------------------------

_BUDGETS = {"qa": 1.0, "qb": 1.0, "qc": 1.0, "qd": 1.0}


def test_group_drift_computation():
    b = _load_bench()
    # idle host: canary at/below floor -> clamped to 1.0
    assert b._group_drift({"start": b.CANARY_FLOOR * 0.8,
                           "end": b.CANARY_FLOOR}) == 1.0
    # contended host: 1.8x slowed canary -> drift ~1.8
    d = b._group_drift({"start": b.CANARY_FLOOR * 1.8,
                        "end": b.CANARY_FLOOR * 1.8})
    assert abs(d - 1.8) < 0.01
    # missing canary (old child / dead parse) degrades to no adjustment
    assert b._group_drift(None) == 1.0
    # the round-7 blind spot: CPU canary idle but the SHUFFLE canary
    # caught IO/scheduler interference -> the worse drift wins
    d = b._group_drift({
        "start": b.CANARY_FLOOR * 0.6, "end": b.CANARY_FLOOR * 0.6,
        "shuffle_start": b.SHUFFLE_CANARY_FLOOR * 1.7,
        "shuffle_end": b.SHUFFLE_CANARY_FLOOR * 1.7,
    })
    assert abs(d - 1.7) < 0.01
    # both idle -> clamp holds with the shuffle keys present
    assert b._group_drift({
        "start": b.CANARY_FLOOR * 0.6, "end": b.CANARY_FLOOR * 0.6,
        "shuffle_start": b.SHUFFLE_CANARY_FLOOR * 0.9,
        "shuffle_end": b.SHUFFLE_CANARY_FLOOR,
    }) == 1.0
    # the round-8 closure of the last blind spot: CPU and shuffle
    # canaries idle, write-fsync IO canary caught disk writeback
    d = b._group_drift({
        "start": b.CANARY_FLOOR * 0.6, "end": b.CANARY_FLOOR * 0.6,
        "shuffle_start": b.SHUFFLE_CANARY_FLOOR * 0.8,
        "shuffle_end": b.SHUFFLE_CANARY_FLOOR * 0.8,
        "io_start": b.IO_CANARY_FLOOR * 2.2,
        "io_end": b.IO_CANARY_FLOOR * 2.2,
    })
    assert abs(d - 2.2) < 0.01
    # all three idle -> clamp still holds
    assert b._group_drift({
        "start": b.CANARY_FLOOR, "end": b.CANARY_FLOOR,
        "shuffle_start": b.SHUFFLE_CANARY_FLOOR,
        "shuffle_end": b.SHUFFLE_CANARY_FLOOR,
        "io_start": b.IO_CANARY_FLOOR * 0.9,
        "io_end": b.IO_CANARY_FLOOR,
    }) == 1.0


def test_synthetic_contention_triggers_group_rerun():
    b = _load_bench()
    # the BENCH_r06 pattern: every entry in the group ~1.8x its budget
    contended = {n: 1.8 for n in _BUDGETS}
    assert b._should_rerun(contended, budgets=_BUDGETS)
    # a single regressed query does NOT look like contention
    one_bad = {"qa": 5.0, "qb": 0.5, "qc": 0.5, "qd": 0.5}
    assert not b._should_rerun(one_bad, budgets=_BUDGETS)
    # exactly half violating is the boundary: rerun (>= fraction)
    half = {"qa": 1.5, "qb": 1.5, "qc": 0.5, "qd": 0.5}
    assert b._should_rerun(half, budgets=_BUDGETS)
    # a group with <2 budgeted entries can't establish a pattern
    assert not b._should_rerun({"qa": 9.9}, budgets=_BUDGETS)
    # round 8: a single violation WITH canary drift is host-attributed
    # -> re-measure instead of shipping an annotated number
    one_bad = {"qa": 5.0, "qb": 0.5, "qc": 0.5, "qd": 0.5}
    assert b._should_rerun(one_bad, budgets=_BUDGETS,
                           drift=b.RERUN_DRIFT + 0.1)
    # ...but drifted canaries with ZERO violations never rerun
    clean = {n: 0.5 for n in _BUDGETS}
    assert not b._should_rerun(clean, budgets=_BUDGETS, drift=2.0)
    # and the single-entry group rule is overridden by drift+violation
    assert b._should_rerun({"qa": 9.9}, budgets=_BUDGETS, drift=2.0)


def test_io_canary_runs_and_is_fast():
    """The IO canary is a real write+fsync (non-negative wall, file
    cleaned up) — smoke, not a timing assertion."""
    import glob

    b = _load_bench()
    t = b._canary_io_time()
    assert t >= 0.0
    assert not glob.glob("/tmp/bench_io_canary_*")


def test_merge_min_keeps_best_pass():
    b = _load_bench()
    first = {"qa": 1.8, "qb": 1.9}
    second = {"qa": 0.7, "qb": 2.5}
    assert b._merge_min(first, second) == {"qa": 0.7, "qb": 1.9}
    # a query missing from the rerun keeps its first-pass time
    assert b._merge_min({"qa": 1.0}, {}) == {"qa": 1.0}


def test_violation_annotation_separates_contention_from_regression():
    b = _load_bench()
    times = {"qa": 1.8, "qb": 0.5, "qc": 3.0}
    group_of = {"qa": 0, "qb": 0, "qc": 1}
    drifts = {0: 1.9, 1: 1.0}   # group 0 contended, group 1 idle
    v = b._annotate_violations(times, group_of, drifts, budgets=_BUDGETS)
    # qa violates raw but its drift-adjusted wall is within budget
    assert v["qa"]["contention_suspect"] is True
    assert v["qa"]["canary_drift"] == 1.9
    assert v["qa"]["adjusted_sec"] == round(1.8 / 1.9, 3)
    # qb is under budget: no entry
    assert "qb" not in v
    # qc violates on an idle group: a REAL regression, not suspect
    assert v["qc"]["contention_suspect"] is False
    assert v["qc"]["canary_drift"] == 1.0


def test_floor_bound_annotation():
    b = _load_bench()
    budgets = {"q77_containment_pairs": 1.0, "qa": 1.0}
    v = b._annotate_violations(
        {"q77_containment_pairs": 1.5, "qa": 1.5},
        {"q77_containment_pairs": 0, "qa": 0}, {0: 1.0}, budgets=budgets)
    assert v["q77_containment_pairs"]["floor_bound"] is True
    assert v["qa"]["floor_bound"] is False


def test_slim_stdout_keeps_contract_and_drops_provenance():
    """Round 11 (VERDICT r10 ask #1/#3): stdout must stay short enough
    to survive the driver's line capture — the contract keys and the
    violation/scaling evidence stay, the per-run provenance / canary
    brackets / methodology prose move to BENCH_local.json only."""
    b = _load_bench()
    full = {
        "metric": "suite_seconds", "value": 1.5, "unit": "sec",
        "queries": {"q01": 1.0, "sf1_q01": 0.5}, "sf": 0.1,
        "methodology": {"isolation": "x"},
        "canaries": {"group_0": {"start": 0.1}},
        "provenance": {"group_0": {"runs": []}},
        "cache_stats": {"hits": 2, "misses": 1},
        "budget_violations": {"q01": {"sec": 1.0, "budget": 0.9}},
        "sf1": {"queries": {"q01": 0.5}, "total": 0.5,
                "canary": {"drift": 1.3, "start": 0.2}, "note": "long"},
        "floor_bound_10x": {"queries": {"q77": 1.9}, "violations": {},
                            "canary": {"drift": 1.0},
                            "provenance": {"runs": []}, "note": "long"},
    }
    slim = b._slim_stdout(full)
    # contract keys intact (the driver parses these)
    assert slim["metric"] == "suite_seconds" and slim["unit"] == "sec"
    assert slim["queries"] == full["queries"] and slim["sf"] == 0.1
    assert slim["budget_violations"] == full["budget_violations"]
    assert slim["cache_stats"] == full["cache_stats"]
    # scaling blocks keep queries+drift, shed notes/canary brackets
    assert slim["sf1"] == {"queries": {"q01": 0.5}, "total": 0.5,
                           "drift": 1.3}
    assert slim["floor_bound_10x"] == {"queries": {"q77": 1.9},
                                       "violations": {}, "drift": 1.0}
    # the bulk (what truncated BENCH_r09) is gone from stdout
    for k in ("methodology", "canaries", "provenance"):
        assert k not in slim
    # a failed sf1 block still reports its error compactly
    slim2 = b._slim_stdout({**full, "sf1": {"error": "boom"}})
    assert slim2["sf1"] == {"error": "boom"}


def test_methodology_string_matches_timed_passes():
    """ADVICE r6: the emitted protocol description must match the
    actual pass count (r6 said 'min of 2' while running 3)."""
    b = _load_bench()
    import inspect

    src = inspect.getsource(b._run_group)
    assert f"range(TIMED_PASSES)" in src
    # the parent derives the string from the same constant
    main_src = inspect.getsource(b.main)
    assert 'f"min of {TIMED_PASSES} timed passes"' in main_src
