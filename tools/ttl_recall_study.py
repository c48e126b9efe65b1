#!/usr/bin/env python
"""Streaming near-dup state-TTL recall study (VERDICT r6 ask #3).

``near_dup_candidates_stream(state_ttl_ms=...)`` bounds per-band bucket
state for unbounded streams by evicting buckets untouched for the TTL
(processing-time timers, renewed on every arrival).  The eviction is
correctness-pinned (stream==batch parity holds when nothing expires) but
its RECALL cost was unmeasured: a duplicate arriving after its anchor's
bucket expired re-seeds the bucket instead of pairing with the anchor.

This harness measures that trade on a wave fixture where true near-dup
pairs deliberately straddle quiet periods:

  wave 0  ──gap──  wave 1 (unrelated traffic)  ──gap──  wave 2
  anchors                                                late duplicates

(the live trigger's empty batches fire expired timers during each gap;
wave 1 is realistic intervening traffic, not the eviction mechanism)

Three pair populations are scored by union-find over ALL emitted
candidate edges:

  within_recall     — anchor+duplicate in the SAME wave (control; state
                      never needs to survive a gap).
  cross_recall      — wave-0 anchor ↔ wave-2 duplicate: the pair a TTL
                      shorter than the quiet period must lose.
  post_gap_cohesion — the two wave-2 duplicates of each straddling
                      family land in one component: eviction degrades
                      cross-PERIOD linking, but the re-seeded bucket
                      still dedups everything inside the new period.

Run:  python tools/ttl_recall_study.py          (writes one JSON line)

The wave runner keeps ONE live micro-batch query running against a
growing source directory: append a wave's file, processAllAvailable(),
sleep the quiet period.  The live trigger's empty batches are what fire
the processing-time timers during the sleep (an availableNow run is the
wrong harness here — ProcessingTimeTimeout makes the stateful operator
request a batch every trigger, so it never self-terminates).
Results feed the SCALE.md table; the qualitative
shape (within 1.0 everywhere; cross 1.0 with TTL=None or TTL>gap, 0.0
with TTL<gap; cohesion 1.0 everywhere) is pinned by
tests/test_streaming.py::test_near_dup_stream_ttl_recall_trade.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_waves(n_cross: int = 8, n_within: int = 4, n_filler: int = 12):
    """Three waves of (doc_id, text) rows.

    ids are longs increasing with wave so the batch anchor rule (bucket
    min) makes the wave-0 member the family anchor.  Every family body
    is unique to that family; duplicates are EXACT copies so candidate
    emission depends only on state survival, never on LSH luck.
    """
    waves: list[list[tuple[int, str]]] = [[], [], []]
    truth = {"within": [], "cross": []}
    nid = 0

    def nxt() -> int:
        nonlocal nid
        nid += 1
        return nid

    def fam_text(tag: str, i: int) -> str:
        return (f"family {tag}{i} shares this exact body of prose about "
                f"topic number {i * 17} repeated verbatim by each member "
                f"of the family and by nobody else in the corpus")

    for i in range(n_cross):
        a = nxt()
        d1, d2 = nxt() + 10_000, nxt() + 10_000  # wave-2 ids sort later
        waves[0].append((a, fam_text("x", i)))
        waves[2].append((d1, fam_text("x", i)))
        waves[2].append((d2, fam_text("x", i)))
        truth["cross"].append((a, d1, d2))
    for w in (0, 2):
        for i in range(n_within):
            a, d = nxt() + w * 10_000, nxt() + w * 10_000
            waves[w].append((a, fam_text(f"w{w}-", i)))
            waves[w].append((d, fam_text(f"w{w}-", i)))
            truth["within"].append((a, d))
    for w in range(3):
        for i in range(n_filler):
            u = nxt() + w * 10_000
            waves[w].append(
                (u, f"wholly unique filler document {u} wave {w} with "
                    f"its own words {u * 7} {u * 13} {u * 29}"))
    return waves, truth


def _await_file_log_offset(q, offset: int, timeout_s: float = 120.0) -> None:
    """Block until the query has COMMITTED a batch whose file-source
    endOffset reached ``offset`` (the file-stream log index grows by one
    per batch that discovered new files).  Neither processAllAvailable
    nor an availableNow trigger can drive a ProcessingTimeTimeout
    stream — the stateful operator requests a batch on every trigger,
    so the engine's no-new-data idle flag is never set — polling the
    committed source offset is the reliable wave barrier."""
    import re

    t0 = time.time()
    while time.time() - t0 < timeout_s:
        p = q.lastProgress
        if p and p.get("sources"):
            eo = p["sources"][0].get("endOffset")
            # a dict in some Spark versions, a "{'logOffset': N}" string
            # (single quotes — NOT json) in others
            m = re.search(r"logOffset\D*(\d+)", str(eo))
            if m and int(m.group(1)) >= offset:
                return
        time.sleep(0.1)
    raise TimeoutError(f"file-source logOffset {offset} not reached "
                       f"within {timeout_s}s")


def run_config(spark, waves, tmp_dir: str, state_ttl_ms: int | None,
               gap_s: float, num_hashes: int = 32, bands: int = 16):
    """Drive the waves through ONE live checkpointed stream: append a
    wave's file, await the batch that ingests it, sleep the quiet
    period (the live trigger's empty batches fire expired timers during
    it), repeat.  Returns the set of undirected candidate edges."""
    from elusion_spark.streaming import core as ST

    tag = "none" if state_ttl_ms is None else str(state_ttl_ms)
    src = os.path.join(tmp_dir, f"src_{tag}")
    ckpt = os.path.join(tmp_dir, f"ckpt_{tag}")
    schema = "doc_id long, text string"
    spark.createDataFrame(waves[0], schema).coalesce(1).write.parquet(
        os.path.join(src, "wave=0"))
    stream = spark.readStream.schema(
        spark.read.parquet(os.path.join(src, "wave=0")).schema
    ).parquet(src)
    cand = ST.near_dup_candidates_stream(
        stream, "doc_id", "text", num_hashes=num_hashes, bands=bands,
        shingle_k=3, state_ttl_ms=state_ttl_ms)
    q, rows = ST.start_update_collect(cand, ckpt)
    try:
        # the batch ingesting wave w commits file-log offset w (0-based)
        _await_file_log_offset(q, 0)
        for w in range(1, len(waves)):
            time.sleep(gap_s)
            spark.createDataFrame(waves[w], schema).coalesce(1) \
                .write.parquet(os.path.join(src, f"wave={w}"))
            _await_file_log_offset(q, w)
    finally:
        q.stop()
    edges: set[tuple[int, int]] = set()
    for r in rows:
        a, b = int(r["anchor_id"]), int(r["doc_id"])
        edges.add((min(a, b), max(a, b)))
    return edges


def score(edges: set[tuple[int, int]], truth: dict) -> dict:
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent[find(a)] = find(b)

    def linked(a: int, b: int) -> bool:
        return a in parent and b in parent and find(a) == find(b)

    nw = len(truth["within"]) or 1
    nc = len(truth["cross"]) or 1
    return {
        "within_recall": round(
            sum(linked(a, d) for a, d in truth["within"]) / nw, 3),
        "cross_recall": round(
            sum(linked(a, d1) and linked(a, d2)
                for a, d1, d2 in truth["cross"]) / nc, 3),
        "post_gap_cohesion": round(
            sum(linked(d1, d2) for _, d1, d2 in truth["cross"]) / nc, 3),
        "edges": len(edges),
    }


def main() -> None:
    import tempfile

    from elusion_spark.session import get_spark

    gap_s = float(os.environ.get("TTL_STUDY_GAP_S", "3.0"))
    spark = get_spark("ttl_recall_study")
    waves, truth = build_waves()
    configs = [None, int(gap_s * 10_000), int(gap_s * 1000 / 3)]
    out = {"gap_s": gap_s, "waves": 3,
           "true_pairs": {k: len(v) for k, v in truth.items()},
           "configs": []}
    with tempfile.TemporaryDirectory(prefix="ttl_study_",
                                     ignore_cleanup_errors=True) as td:
        for ttl in configs:
            res = score(run_config(spark, waves, td, ttl, gap_s), truth)
            out["configs"].append({"state_ttl_ms": ttl, **res})
    print(json.dumps(out))


if __name__ == "__main__":
    main()
