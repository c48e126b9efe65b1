#!/usr/bin/env python
"""Recall@10 vs speed for the compressed-ANN path (VERDICT r5 ask #7):
PQ-ADC, IVF-PQ, and the two-stage refine (ADC shortlist -> exact
rerank) measured against brute-force ground truth, so the
storage/speed claims in SCALE.md carry their accuracy cost.

Two fixtures, both 200k x 64-dim unit vectors, both UNIQUE rows:
- ``random``: isotropic gaussians — PQ's worst case (no manifold
  structure; all pairwise distances concentrate), the honest lower
  bound.
- ``clustered``: a 200-center gaussian mixture (sigma=0.15 before
  normalization) — the low-intrinsic-dimension shape real embedding
  models produce, where coarse+fine quantization actually has
  structure to exploit.

(The 200k/2M SCALE fixtures are key-shift REPLICAS — fine for
throughput, degenerate for recall, so accuracy is measured here and
throughput numbers stay with the replica fixtures.)

Prints one markdown table per fixture (for SCALE.md) + one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N, DIM, K, NQ = 200_000, 64, 10, 20


def _unit(m):
    import numpy as np

    return m / np.linalg.norm(m, axis=1, keepdims=True)


def _build_fixture(spark, kind: str, path: str):
    import numpy as np

    if os.path.exists(f"{path}/_SUCCESS"):
        return
    rng = np.random.default_rng(11 if kind == "random" else 13)
    if kind == "random":
        v = rng.standard_normal((N, DIM))
    else:
        centers = _unit(rng.standard_normal((200, DIM)))
        assign = rng.integers(0, 200, size=N)
        v = centers[assign] + 0.15 * rng.standard_normal((N, DIM))
    v = _unit(v)
    rows = [(i, [float(x) for x in v[i]]) for i in range(N)]
    spark.createDataFrame(rows, "vec_id long, v array<double>") \
        .repartition(32).write.mode("overwrite").parquet(path)


def _queries(kind: str):
    import numpy as np

    rng = np.random.default_rng(12)
    if kind == "random":
        q = rng.standard_normal((NQ, DIM))
    else:
        crng = np.random.default_rng(13)
        centers = _unit(crng.standard_normal((200, DIM)))
        q = centers[rng.integers(0, 200, size=NQ)] \
            + 0.15 * rng.standard_normal((NQ, DIM))
    return [[float(x) for x in r] for r in _unit(q)]


def run_fixture(spark, kind: str, results: list) -> float:
    from pyspark import StorageLevel
    from pyspark.sql import functions as F

    from elusion_spark.operators.similarity import (
        assign_clusters_col, dot_expr, ivf_pq_search, ivf_residual_expr,
        kmeans_fit, pq_adc_topk, pq_encode_expr, pq_fit, pq_refine_topk)

    path = f"/tmp/recall_emb_{kind}"
    _build_fixture(spark, kind, path)
    df = spark.read.parquet(path).persist(StorageLevel.MEMORY_AND_DISK)
    df.count()
    queries = _queries(kind)

    # exact ground truth: unit vectors, so argmin L2 == argmax dot
    def exact_topk(q):
        return [r["vec_id"] for r in
                df.select("vec_id", dot_expr("v", q).alias("d"))
                .orderBy(F.desc("d"), "vec_id").limit(K).collect()]

    t0 = time.perf_counter()
    truth = {i: set(exact_topk(q)) for i, q in enumerate(queries)}
    brute_sec = (time.perf_counter() - t0) / NQ

    def eval_scan(label, scan_fn, extra):
        scan_fn(queries[0]).collect()  # warm this lut shape
        hits, t0 = 0, time.perf_counter()
        for i, q in enumerate(queries):
            got = {r[0] for r in scan_fn(q).collect()}
            hits += len(got & truth[i])
        sec = (time.perf_counter() - t0) / NQ
        results.append({"fixture": kind, "config": label,
                        "recall_at_10": round(hits / (K * NQ), 4),
                        "sec_per_query": round(sec, 4), **extra})

    # coarse quantizer shared by every IVF config (raw AND residual)
    cents = kmeans_fit(df, "v", dim=DIM, k=64, iters=3,
                       sample_fraction=min(1.0, 100_000 / N)).centroids
    assigned = df.select(
        "vec_id", "v", assign_clusters_col("v", cents).alias("cluster_id"))

    for m, k, iters in [(16, 64, 2), (32, 256, 2)]:
        model = pq_fit(df, "v", dim=DIM, m=m, k=k, iters=iters,
                       sample_fraction=min(1.0, 100_000 / N))
        enc = df.select("vec_id", pq_encode_expr("v", model).alias("codes")) \
            .persist(StorageLevel.MEMORY_AND_DISK)
        enc.count()
        bits = m * max(1, (k - 1).bit_length())
        comp = round(DIM * 32 / bits, 1)
        eval_scan(
            f"PQ-ADC m={m} k={k}",
            lambda q, _e=enc, _m=model: pq_adc_topk(
                _e, "vec_id", "codes", q, _m, k=K),
            {"code_bits": bits, "compression_vs_f32": comp},
        )
        for cand in (100, 400):
            eval_scan(
                f"PQ-ADC m={m} k={k} + exact rerank C={cand}",
                lambda q, _e=enc, _m=model, _c=cand: pq_refine_topk(
                    _e, df, "vec_id", "codes", "v", q, _m, k=K,
                    candidates=_c),
                {"code_bits": bits, "compression_vs_f32": comp},
            )
        if (m, k) == (32, 256):
            ivf = enc.join(
                assigned.select("vec_id", "cluster_id"), "vec_id") \
                .persist(StorageLevel.MEMORY_AND_DISK)
            ivf.count()
            for nprobe in (4, 16):
                eval_scan(
                    f"IVF-PQ nlist=64 nprobe={nprobe} (m=32 k=256)",
                    lambda q, _np=nprobe: ivf_pq_search(
                        ivf, cents, model, "vec_id", "codes", q,
                        k=K, nprobe=_np),
                    {"cells_scanned_frac": round(nprobe / 64, 3)},
                )
            eval_scan(
                "IVF-PQ nprobe=16 + exact rerank C=100 (m=32 k=256)",
                lambda q: pq_refine_topk(
                    ivf, df, "vec_id", "codes", "v", q, model, k=K,
                    candidates=100, centroids=cents, nprobe=16),
                {"cells_scanned_frac": 0.25},
            )
            ivf.unpersist()
        enc.unpersist()

        # residual-encoded IVF-PQ (FAISS by_residual, VERDICT r6 ask
        # #4): same coarse cells, the PQ trained/encoded on
        # v - centroid[cell] so the code budget describes the
        # within-cell displacement instead of re-describing the coarse
        # structure the cell id already captures
        rdf = assigned.select(
            "vec_id", "cluster_id",
            ivf_residual_expr("v", "cluster_id", cents).alias("r")) \
            .persist(StorageLevel.MEMORY_AND_DISK)
        rdf.count()
        rmodel = pq_fit(rdf, "r", dim=DIM, m=m, k=k, iters=iters,
                        sample_fraction=min(1.0, 100_000 / N))
        renc = rdf.select(
            "vec_id", "cluster_id",
            pq_encode_expr("r", rmodel).alias("codes")) \
            .persist(StorageLevel.MEMORY_AND_DISK)
        renc.count()
        rdf.unpersist()
        for nprobe in (4, 16):
            eval_scan(
                f"IVF-PQ RESIDUAL nlist=64 nprobe={nprobe} (m={m} k={k})",
                lambda q, _np=nprobe: ivf_pq_search(
                    renc, cents, rmodel, "vec_id", "codes", q,
                    k=K, nprobe=_np, residuals_of=cents),
                {"cells_scanned_frac": round(nprobe / 64, 3)},
            )
        eval_scan(
            f"IVF-PQ RESIDUAL nprobe=16 + exact rerank C=100 (m={m} k={k})",
            lambda q: pq_refine_topk(
                renc, df, "vec_id", "codes", "v", q, rmodel, k=K,
                candidates=100, centroids=cents, nprobe=16,
                residuals_of=cents),
            {"cells_scanned_frac": 0.25},
        )
        renc.unpersist()
    df.unpersist()
    return brute_sec


def main() -> None:
    from elusion_spark.session import get_spark

    spark = get_spark("recall_curves")
    results: list = []
    brute = {}
    for kind in ("random", "clustered"):
        brute[kind] = round(run_fixture(spark, kind, results), 4)

    for kind in ("random", "clustered"):
        print(f"\n### {kind} fixture ({N} x {DIM}-dim unit vectors; "
              f"brute-force exact {brute[kind]} s/query)\n")
        print("| config | recall@10 | s/query | notes |")
        print("|---|---|---|---|")
        for r in results:
            if r["fixture"] != kind:
                continue
            note = (f"{r['compression_vs_f32']}x vs f32"
                    if "compression_vs_f32" in r
                    else f"{r['cells_scanned_frac']} of cells")
            print(f"| {r['config']} | {r['recall_at_10']} | "
                  f"{r['sec_per_query']} | {note} |")
    print()
    print(json.dumps({"n": N, "dim": DIM, "k": K, "n_queries": NQ,
                      "brute_sec_per_query": brute, "results": results}))


if __name__ == "__main__":
    main()
