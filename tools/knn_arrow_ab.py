#!/usr/bin/env python
"""Fresh-JVM interleaved A/B for the r10 knn_join cogroup rewrite:
old (applyInPandas, per-row ndarray boxing) vs new (applyInArrow,
contiguous buffer view) on a synthetic 120k x 64 corpus with 2k
queries in exact block mode — the benched q73 fixture (2k rows at
sf0.1) is scheduling-floor-bound, so the boundary cost must be
measured at a scale where the python stage carries real rows.
3 JVMs per mode in A/B/B/A/A/B order, 2 warms + min-of-3 per JVM,
CPU canary bracketing.  Usage: python tools/knn_arrow_ab.py"""
import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, sys, time
sys.path.insert(0, %(here)r)
mode = sys.argv[1]
import numpy as np
import pandas as pd
from pyspark.sql import Window
from pyspark.sql import functions as F
from elusion_spark.session import get_spark
spark = get_spark()
from elusion_spark.operators.similarity import knn_join, norm_expr

N_CORPUS, N_Q, DIM, K, N_BLOCKS = 120_000, 2_000, 64, 10, 15

def canary():
    t0 = time.perf_counter()
    spark.range(0, 25_000_000, 1, 8).selectExpr(
        "CAST(xxhash64(id) AS DOUBLE) AS h").groupBy().sum(
        "h").write.format("noop").mode("overwrite").save()
    return round(time.perf_counter() - t0, 3)

def corpus(n):
    return spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.expr(
            "transform(sequence(0, %%d), i -> "
            "CAST(sin(CAST(id * %%d + i AS DOUBLE)) AS FLOAT))"
            %% (DIM - 1, DIM)
        ).alias("embedding"),
    )

def old_knn(queries, corp, k, n_blocks):  # the pre-r10 stage, verbatim
    qn = queries.select(F.col("vec_id").alias("__qid"),
                        F.col("embedding").alias("__qv"),
                        norm_expr("embedding").alias("__qn"))
    cn = corp.select(F.col("vec_id").alias("__cid"),
                     F.col("embedding").alias("__cv"),
                     norm_expr("embedding").alias("__cn"))
    blocks = spark.range(n_blocks).select(
        F.col("id").cast("int").alias("__key"))
    qk = qn.crossJoin(F.broadcast(blocks))
    ck = cn.withColumn(
        "__key", F.pmod(F.xxhash64("__cid"), F.lit(n_blocks)).cast("int"))
    round_digits, local_k = 4, k

    def _topk(qpdf, cpdf):
        if qpdf.empty or cpdf.empty:
            return pd.DataFrame(
                {"query_id": pd.Series(dtype="int64"),
                 "neighbor_id": pd.Series(dtype="int64"),
                 "cosine": pd.Series(dtype="float64")})
        Q = np.asarray(
            [np.asarray(v, dtype=np.float64) for v in qpdf["__qv"]])
        Cv = np.asarray(
            [np.asarray(v, dtype=np.float64) for v in cpdf["__cv"]])
        sims = (Q @ Cv.T) / np.outer(
            qpdf["__qn"].to_numpy(dtype=np.float64),
            cpdf["__cn"].to_numpy(dtype=np.float64))
        sims = np.round(sims, round_digits)
        qids = qpdf["__qid"].to_numpy()
        cids = cpdf["__cid"].to_numpy()
        cut = min(local_k, sims.shape[1])
        out_q, out_c, out_s = [], [], []
        for i in range(sims.shape[0]):
            order = np.lexsort((cids, -sims[i]))[:cut]
            out_q.append(np.full(len(order), qids[i]))
            out_c.append(cids[order])
            out_s.append(sims[i][order])
        return pd.DataFrame(
            {"query_id": np.concatenate(out_q),
             "neighbor_id": np.concatenate(out_c),
             "cosine": np.concatenate(out_s)})

    cand = (qk.groupBy("__key").cogroup(ck.groupBy("__key"))
            .applyInPandas(
                _topk, "query_id long, neighbor_id long, cosine double"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id"))
    return (cand.withColumn("rank", F.row_number().over(w).cast("bigint"))
            .filter(F.col("rank") <= k))

def build(n):
    corp = corpus(n)
    queries = corp.filter(F.col("vec_id") < N_Q)
    if mode == "new":
        return knn_join(queries, corp, k=K, n_blocks=N_BLOCKS)
    return old_knn(queries, corp, K, N_BLOCKS)

canary()
c0 = min(canary(), canary())
for n in (5_000, N_CORPUS):
    build(n).write.format("noop").mode("overwrite").save()
walls = []
for p in range(3):
    t0 = time.perf_counter()
    build(N_CORPUS).write.format("noop").mode("overwrite").save()
    walls.append(round(time.perf_counter() - t0, 3))
c1 = min(canary(), canary())
print("RESULT" + json.dumps({"mode": mode, "walls": walls,
                             "canary": [c0, c1]}))
"""


def run(mode: str) -> dict:
    script = CHILD % {"here": HERE}
    r = subprocess.run([sys.executable, "-c", script, mode],
                       capture_output=True, text=True, timeout=1800,
                       cwd=HERE)
    for line in r.stdout.splitlines():
        if line.startswith("RESULT"):
            return json.loads(line[len("RESULT"):])
    print(r.stdout[-2000:], r.stderr[-2000:])
    raise SystemExit(f"child for {mode} produced no RESULT")


def main() -> None:
    order = ["old", "new", "new", "old", "old", "new"]
    by = {"old": [], "new": []}
    for i, mode in enumerate(order):
        res = run(mode)
        res["slot"] = i
        print(json.dumps(res))
        by[mode].append(min(res["walls"]))
    print(f"\nmin-of-3-JVMs: old {min(by['old']):.3f}  "
          f"new {min(by['new']):.3f}")


if __name__ == "__main__":
    main()
