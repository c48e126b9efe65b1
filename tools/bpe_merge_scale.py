#!/usr/bin/env python
"""BPE batched-merge scale measurement (VERDICT r6 ask #5).

A real tokenizer wants 10k-30k merges; exact Sennrich order costs one
vocab-sized counting aggregation PER merge — 30k Spark jobs.
``bpe_fit(merges_per_round=N)`` applies the top-N non-overlapping pairs
per counting pass.  This harness measures, on the sf0.1 documents
corpus (word counts computed once and shared):

1. job count + wall for 256 merges at merges_per_round = 1 / 8 / 16
   (the ask's bar: >= 256 merges in <= 30 jobs);
2. the DIVERGENCE from strict Sennrich order, characterized as
   merge-SET overlap and first-divergence rank at 64 merges — batched
   rounds rank pairs 2..N by pre-round counts, so order can differ
   where consecutive merges interact textually.

Run on an idle machine: python tools/bpe_merge_scale.py
Prints one JSON line; numbers go to SCALE.md round 7.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _jobs_for(spark, group: str, fn):
    sc = spark.sparkContext
    sc.setJobGroup(group, group)
    try:
        out = fn()
    finally:
        sc.setJobGroup(f"{group}_done", f"{group}_done")
    return out, len(sc.statusTracker().getJobIdsForGroup(group))


def main() -> None:
    from elusion_spark.operators.bpe import bpe_fit, bpe_word_counts
    from elusion_spark.session import get_spark

    spark = get_spark("bpe_merge_scale")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    wc = bpe_word_counts(docs, "text").persist()
    n_vocab = wc.count()

    out = {"sf_dir": SF_DIR, "vocab_words": n_vocab, "runs": []}

    # 1) cost at 256 merges
    for mpr in (1, 8, 16):
        t0 = time.perf_counter()
        merges, jobs = _jobs_for(
            spark, f"bpe_mpr{mpr}",
            lambda _m=mpr: bpe_fit(docs, "text", num_merges=256,
                                   word_counts=wc, merges_per_round=_m))
        out["runs"].append({
            "merges_per_round": mpr, "num_merges": len(merges),
            "jobs": jobs, "wall_sec": round(time.perf_counter() - t0, 2),
        })

    # 2) divergence characterization at 64 merges
    exact = bpe_fit(docs, "text", num_merges=64, word_counts=wc,
                    merges_per_round=1)
    exact_seq = [(m["lft"], m["rgt"]) for m in exact]
    div = {}
    for mpr in (8, 16):
        b = bpe_fit(docs, "text", num_merges=64, word_counts=wc,
                    merges_per_round=mpr)
        bseq = [(m["lft"], m["rgt"]) for m in b]
        first_div = next(
            (i for i, (x, y) in enumerate(zip(exact_seq, bseq)) if x != y),
            min(len(exact_seq), len(bseq)))
        inter = len(set(exact_seq) & set(bseq))
        div[f"mpr{mpr}"] = {
            "set_overlap_at_64": round(inter / 64, 4),
            "first_order_divergence_rank": first_div,
        }
    out["divergence_vs_exact_at_64"] = div
    wc.unpersist()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
