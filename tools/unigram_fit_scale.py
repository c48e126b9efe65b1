#!/usr/bin/env python
"""Unigram-LM FIT at a realistic vocabulary (VERDICT r8 ask #6): the
EM fit was previously measured at fixture scale only; this harness
puts one SCALE.md point at a 32k-piece vocabulary over the 20k-word
Zipf corpus (tools/bpe_encode_scale.py's realistic distinct-word
regime).

What the numbers attribute:

- the one corpus-sized job (``bpe_word_counts``, shared with BPE);
- the seed-candidate collect (bounded by ``seed_size`` = 4x
  vocab_size by default — the knob that guards the driver; this run
  collects 128k (piece, cnt) rows, a few MB);
- each EM iteration = ONE vocab-sized ``mapInPandas`` E-step (the
  128k-piece prob table rides the closure) + one piece-sized decimal
  agg collect + a driver prune — so total job count is
  ``2 + em_iters``, independent of corpus size;
- total wall for vocab_size=32_000, em_iters=2.

Run on an idle machine: python tools/unigram_fit_scale.py
Prints one JSON line; numbers go to SCALE.md round 9.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.bpe_encode_scale import _zipf_corpus_df  # noqa: E402


def _job_count(spark, group, fn):
    sc = spark.sparkContext
    sc.setJobGroup(group, group)
    try:
        out = fn()
    finally:
        sc.setJobGroup(f"{group}_done", f"{group}_done")
    return out, len(sc.statusTracker().getJobIdsForGroup(group))


def main() -> None:
    from elusion_spark.operators.bpe import bpe_word_counts
    from elusion_spark.operators.unigram_lm import (_seed_candidates,
                                                    unigram_lm_fit)
    from elusion_spark.session import get_spark

    spark = get_spark("unigram_fit_scale")
    zipf = _zipf_corpus_df(spark).persist()
    zipf.count()
    out: dict = {"corpus": "zipf_5k_docs_20k_vocab",
                 "vocab_size": 32_000, "em_iters": 2}

    t0 = time.perf_counter()
    wc = bpe_word_counts(zipf, "text").persist()
    out["vocab_rows"] = int(wc.count())
    out["word_count_job_sec"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    seeds = _seed_candidates(wc, max_piece_len=8,
                             seed_size=4 * 32_000).collect()
    out["seed_collect_sec"] = round(time.perf_counter() - t0, 2)
    out["seed_rows"] = len(seeds)

    t0 = time.perf_counter()
    model, jobs = _job_count(
        spark, "ufit32k",
        lambda: unigram_lm_fit(None, vocab_size=32_000, em_iters=2,
                               word_counts=wc))
    out["fit_wall_sec"] = round(time.perf_counter() - t0, 2)
    out["fit_spark_jobs"] = jobs
    out["model_pieces"] = len(model)

    # per-iteration attribution: 0 vs 2 EM iterations
    t0 = time.perf_counter()
    unigram_lm_fit(None, vocab_size=32_000, em_iters=0, word_counts=wc)
    out["fit_wall_sec_em0"] = round(time.perf_counter() - t0, 2)
    out["per_em_iter_sec"] = round(
        (out["fit_wall_sec"] - out["fit_wall_sec_em0"]) / 2, 2)

    wc.unpersist()
    zipf.unpersist()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
