#!/usr/bin/env python
"""Recall@10 vs speed for the compressed-ANN path (VERDICT r5 ask #7):
PQ-ADC and IVF-PQ measured against brute-force ground truth, so the
storage/speed claims in SCALE.md carry their accuracy cost.

Fixture: 200k UNIQUE 64-dim gaussian vectors (seeded, /tmp/recall_emb).
The 200k/2M SCALE fixtures are key-shift REPLICAS — fine for throughput,
degenerate for recall (every true top-k is 100 copies of one base
vector) — so accuracy is measured on unique vectors and throughput
numbers stay with the replica fixtures.

Prints one markdown table (for SCALE.md) + one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N, DIM, K, NQ = 200_000, 64, 10, 20
FIX = "/tmp/recall_emb"


def _build_fixture(spark):
    import numpy as np

    if os.path.exists(f"{FIX}/_SUCCESS"):
        return
    rng = np.random.default_rng(11)
    # unit-normalized gaussians: L2 ranking == cosine ranking, matching
    # the ADC l2 metric and the brute-force cosine baseline alike
    v = rng.standard_normal((N, DIM))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    rows = [(i, [float(x) for x in v[i]]) for i in range(N)]
    spark.createDataFrame(rows, "vec_id long, v array<double>") \
        .repartition(32).write.mode("overwrite").parquet(FIX)


def _queries():
    import numpy as np

    rng = np.random.default_rng(12)
    q = rng.standard_normal((NQ, DIM))
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    return [[float(x) for x in q[i]] for i in range(NQ)]


def main() -> None:
    from pyspark import StorageLevel
    from pyspark.sql import functions as F

    from elusion_spark.operators.similarity import (
        assign_clusters_col, dot_expr, ivf_pq_search, kmeans_fit,
        pq_adc_topk, pq_encode_expr, pq_fit)
    from elusion_spark.session import get_spark

    spark = get_spark("recall_curves")
    _build_fixture(spark)
    df = spark.read.parquet(FIX).persist(StorageLevel.MEMORY_AND_DISK)
    df.count()
    queries = _queries()

    # exact ground truth: unit vectors, so argmin L2 == argmax dot
    def exact_topk(q):
        return [r["vec_id"] for r in
                df.select("vec_id", dot_expr("v", q).alias("d"))
                .orderBy(F.desc("d"), "vec_id").limit(K).collect()]

    t0 = time.perf_counter()
    truth = {i: set(exact_topk(q)) for i, q in enumerate(queries)}
    brute_sec = (time.perf_counter() - t0) / NQ

    results = []

    def eval_scan(label, scan_fn, extra):
        # warm once (codegen for this lut shape), then time all queries
        scan_fn(queries[0]).collect()
        hits, t0 = 0, time.perf_counter()
        for i, q in enumerate(queries):
            got = {r[0] for r in scan_fn(q).collect()}
            hits += len(got & truth[i])
        sec = (time.perf_counter() - t0) / NQ
        rec = hits / (K * NQ)
        results.append({"config": label, "recall_at_10": round(rec, 4),
                        "sec_per_query": round(sec, 4), **extra})

    for m, k, iters in [(8, 16, 3), (16, 64, 2), (8, 256, 2)]:
        model = pq_fit(df, "v", dim=DIM, m=m, k=k, iters=iters,
                       sample_fraction=min(1.0, 100_000 / N))
        enc = df.select("vec_id", pq_encode_expr("v", model).alias("codes")) \
            .persist(StorageLevel.MEMORY_AND_DISK)
        enc.count()
        bits = m * max(1, (k - 1).bit_length())
        eval_scan(
            f"PQ-ADC m={m} k={k}",
            lambda q, _e=enc, _m=model: pq_adc_topk(_e, "vec_id", "codes",
                                                    q, _m, k=K),
            {"code_bits": bits, "compression_vs_f32":
             round(DIM * 32 / bits, 1)},
        )
        if (m, k) == (16, 64):
            cents = kmeans_fit(df, "v", dim=DIM, k=64, iters=3,
                               sample_fraction=min(1.0, 100_000 / N)
                               ).centroids
            ivf = enc.join(
                df.select("vec_id",
                          assign_clusters_col("v", cents).alias(
                              "cluster_id")), "vec_id") \
                .persist(StorageLevel.MEMORY_AND_DISK)
            ivf.count()
            for nprobe in (1, 4, 8, 16):
                eval_scan(
                    f"IVF-PQ nlist=64 nprobe={nprobe} (m=16 k=64)",
                    lambda q, _np=nprobe: ivf_pq_search(
                        ivf, cents, model, "vec_id", "codes", q,
                        k=K, nprobe=_np),
                    {"cells_scanned_frac": round(nprobe / 64, 3)},
                )
            ivf.unpersist()
        enc.unpersist()

    print(f"\nbrute-force exact (dot codegen, {N} rows): "
          f"{brute_sec:.4f} s/query\n")
    print("| config | recall@10 | s/query | notes |")
    print("|---|---|---|---|")
    for r in results:
        note = (f"{r['compression_vs_f32']}x vs f32"
                if "compression_vs_f32" in r
                else f"{r['cells_scanned_frac']} of cells")
        print(f"| {r['config']} | {r['recall_at_10']} | "
              f"{r['sec_per_query']} | {note} |")
    print()
    print(json.dumps({"n": N, "dim": DIM, "k": K, "n_queries": NQ,
                      "brute_sec_per_query": round(brute_sec, 4),
                      "results": results}))


if __name__ == "__main__":
    main()
