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


def _zipf_word_counts(spark, n_words: int = 20_000, seed: int = 17):
    """A deterministic Zipf-frequency vocabulary with natural-language
    letter statistics — the REALISTIC fixture.  The sf0.1 documents
    table has only 31 distinct words (its vocabulary is query-plan
    jargon), which saturates BPE at ~90 merges and makes consecutive
    merges interact maximally (every top pair shares symbols with the
    next) — measured below as the adversarial small-vocab datapoint,
    not the expected regime."""
    import numpy as np

    rng = np.random.default_rng(seed)
    letters = np.array(list("etaoinshrdlcumwfgypbvkjxqz"))
    lp = np.array([12, 9, 8, 7.5, 7, 6.7, 6.3, 6, 6, 4.3, 4, 2.8, 2.8,
                   2.4, 2.4, 2.2, 2, 2, 1.9, 1.5, 1, 0.8, 0.2, 0.2,
                   0.1, 0.1])
    lp = lp / lp.sum()
    words, seen = [], set()
    while len(words) < n_words:
        ln = int(rng.integers(3, 12))
        w = "".join(rng.choice(letters, size=ln, p=lp))
        if w not in seen:
            seen.add(w)
            words.append(w)
    freqs = (1.0 / np.arange(1, n_words + 1)) ** 1.1 * 1_000_000
    rows = [(w, int(max(1, f))) for w, f in zip(words, freqs)]
    return spark.createDataFrame(rows, "word string, freq bigint")


def main() -> None:
    from elusion_spark.operators.bpe import bpe_fit, bpe_word_counts
    from elusion_spark.session import get_spark

    spark = get_spark("bpe_merge_scale")
    out = {"sf_dir": SF_DIR, "fixtures": {}}

    fixtures = {
        "zipf_20k_words": _zipf_word_counts(spark).persist(),
        "sf_documents_31_words": bpe_word_counts(
            spark.read.parquet(f"{SF_DIR}/documents.parquet"),
            "text").persist(),
    }
    for fname, wc in fixtures.items():
        n_vocab = wc.count()
        res = {"vocab_words": n_vocab, "runs": []}
        # 1) cost at 256 merges (checkpoint cadence matched to round
        #    size so lineage depth, not job count, stays the binding
        #    constraint)
        for mpr, ckpt, frac in ((1, 16, 0.0), (16, 64, 0.0),
                                (32, 64, 0.0), (16, 64, 0.5),
                                (32, 64, 0.5)):
            t0 = time.perf_counter()
            merges, jobs = _jobs_for(
                spark, f"bpe_{fname}_mpr{mpr}_f{frac}",
                lambda _m=mpr, _c=ckpt, _f=frac, _w=wc: bpe_fit(
                    None, "text", num_merges=256, word_counts=_w,
                    merges_per_round=_m, checkpoint_every=_c,
                    min_round_count_frac=_f))
            res["runs"].append({
                "merges_per_round": mpr, "count_frac_guard": frac,
                "num_merges": len(merges), "jobs": jobs,
                "wall_sec": round(time.perf_counter() - t0, 2),
            })
        # 2) divergence characterization at 64 merges (unguarded vs
        #    the frac=0.5 adaptive guard)
        exact = bpe_fit(None, "text", num_merges=64, word_counts=wc,
                        merges_per_round=1)
        exact_seq = [(m["lft"], m["rgt"]) for m in exact]
        div = {}
        for mpr, frac in ((8, 0.0), (16, 0.0), (8, 0.5), (16, 0.5)):
            b = bpe_fit(None, "text", num_merges=64, word_counts=wc,
                        merges_per_round=mpr, min_round_count_frac=frac)
            bseq = [(m["lft"], m["rgt"]) for m in b]
            first_div = next(
                (i for i, (x, y) in enumerate(zip(exact_seq, bseq))
                 if x != y),
                min(len(exact_seq), len(bseq)))
            inter = len(set(exact_seq) & set(bseq))
            div[f"mpr{mpr}_f{frac}"] = {
                "set_overlap_at_64": round(inter / max(len(bseq), 1), 4),
                "first_order_divergence_rank": first_div,
            }
        res["divergence_vs_exact_at_64"] = div
        out["fixtures"][fname] = res
        wc.unpersist()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
