#!/usr/bin/env python
"""Fresh-JVM interleaved A/B for the q32 mapInArrow rewrite: old
(pandas_udf + posexplode) vs new (mapInArrow) bucket stage, 3 JVMs
each in A/B/B/A/A/B order, 2 warms + min-of-3 per JVM, CPU canary
bracketing.  Usage: python tools/q32_ab.py"""
import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, sys, time
sys.path.insert(0, %(here)r)
mode = sys.argv[1]
from pyspark import StorageLevel
from pyspark.sql import functions as F
from elusion_spark.session import get_spark
spark = get_spark()
from elusion_spark.operators import similarity as S
from elusion_spark.operators.dedup import _id_out
from elusion_spark.suite import QUERIES, _t, EMB_DIM

def canary():
    t0 = time.perf_counter()
    spark.range(0, 25_000_000, 1, 8).selectExpr(
        "CAST(xxhash64(id) AS DOUBLE) AS h").groupBy().sum(
        "h").write.format("noop").mode("overwrite").save()
    return round(time.perf_counter() - t0, 3)

def old_pairs(df, id_col, vec_col, dim, cosine_threshold, n_planes,
              n_tables, seed=42):
    oc = _id_out(df, id_col)
    nb = S._norm_buckets_udf(dim, n_planes, n_tables, seed)
    b = (S._ensure_parallelism(df)
         .select(F.col(id_col).alias("__id"), F.col(vec_col).alias("__v"),
                 nb(F.col(vec_col)).alias("__nb"))
         .select("__id", "__v", F.col("__nb.norm").alias("__norm"),
                 F.posexplode("__nb.buckets").alias("__t", "__bucket"))
         .persist(StorageLevel.MEMORY_AND_DISK))
    l = b.select(F.col("__id").alias("id_a"), F.col("__v").alias("va"),
                 F.col("__norm").alias("na"), "__t", "__bucket")
    r = b.select(F.col("__id").alias("id_b"), F.col("__v").alias("vb"),
                 F.col("__norm").alias("nb"), "__t", "__bucket")
    return (l.join(r, ["__t", "__bucket"])
            .filter(F.col("id_a") < F.col("id_b"))
            .dropDuplicates(["id_a", "id_b"])
            .withColumn("cosine", F.expr(
                "aggregate(zip_with(va, vb, (x, y) -> CAST(x AS DOUBLE) "
                "* CAST(y AS DOUBLE)), CAST(0 AS DOUBLE), (a, v) -> a + v)"
                " / (na * nb)"))
            .filter(F.col("cosine") >= cosine_threshold)
            .select(oc("id_a"), oc("id_b"), "cosine"))

sf = "/root/testdata/sf0.1"

def build(d):
    if mode == "new":
        return QUERIES["q32_embedding_near_dup"](spark, d)
    e = _t(spark, d, "embeddings", "e").df
    pert = e.select((F.col("vec_id") + 1_000_000).alias("vec_id"),
        F.expr("transform(embedding, (x, i) -> CAST(x + 0.01d * "
               "sin(CAST(vec_id * 31 + i AS DOUBLE)) AS FLOAT))"
               ).alias("embedding"), "label")
    both = e.unionByName(pert)
    return old_pairs(both, "vec_id", "embedding", EMB_DIM, 0.99, 12, 8
                     ).select("id_a", "id_b")

canary()
c0 = min(canary(), canary())
for d in ("/root/testdata/sf0.001", sf):
    build(d).write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()
walls = []
for p in range(3):
    t0 = time.perf_counter()
    build(sf).write.format("noop").mode("overwrite").save()
    walls.append(round(time.perf_counter() - t0, 3))
    spark.catalog.clearCache()
c1 = min(canary(), canary())
print("RESULT" + json.dumps({"mode": mode, "walls": walls,
                             "canary": [c0, c1]}))
"""


def run(mode: str) -> dict:
    script = CHILD % {"here": HERE}
    r = subprocess.run([sys.executable, "-c", script, mode],
                       capture_output=True, text=True, timeout=900,
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
