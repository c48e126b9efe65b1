#!/usr/bin/env python
"""Shuffle-codec A/B (guide §2.3): lz4 (default) vs zstd for
spark.io.compression.codec, measured on the shuffle-heaviest suite
queries.  Fresh JVM per (codec, rep), interleaved A/B/B/A/A/B order so
host drift cancels; each child also times a 25M-xxhash CPU canary so
the readings can be drift-normalized the same way bench.py does.

Usage: python tools/codec_ab.py
"""
import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, %(here)r)
codec = sys.argv[1]

from elusion_spark.session import get_spark
spark = get_spark(extra_conf={"spark.io.compression.codec": codec})

def canary():
    # same probe as bench.py _canary_time: 25M xxhash64 fold, pure codegen
    t0 = time.perf_counter()
    spark.range(0, 25_000_000, 1, 8).selectExpr(
        "CAST(xxhash64(id) AS DOUBLE) AS h").groupBy().sum(
        "h").write.format("noop").mode("overwrite").save()
    return round(time.perf_counter() - t0, 3)

canary()
c0 = min(canary(), canary())
from elusion_spark.suite import QUERIES
names = %(names)r
out = {}
for name in names:
    for d in ("/root/testdata/sf0.001", "/root/testdata/sf0.1"):
        QUERIES[name](spark, d).write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()
    walls = []
    for p in range(3):
        t0 = time.perf_counter()
        QUERIES[name](spark, "/root/testdata/sf0.1").write.format(
            "noop").mode("overwrite").save()
        walls.append(time.perf_counter() - t0)
        spark.catalog.clearCache()
    out[name] = round(min(walls), 3)
c1 = min(canary(), canary())
print("RESULT" + json.dumps({"codec": codec, "walls": out,
                             "canary": [c0, c1]}))
"""

NAMES = ["q101_batched_hybrid", "q30_minhash_pairs",
         "q148_pmi_collocations", "q46_training_corpus"]


def run(codec: str) -> dict:
    script = CHILD % {"here": HERE, "names": NAMES}
    r = subprocess.run([sys.executable, "-c", script, codec],
                       capture_output=True, text=True, timeout=900,
                       cwd=HERE)
    for line in r.stdout.splitlines():
        if line.startswith("RESULT"):
            return json.loads(line[len("RESULT"):])
    print(r.stdout[-2000:], r.stderr[-2000:])
    raise SystemExit(f"child for {codec} produced no RESULT")


def main() -> None:
    order = ["lz4", "zstd", "zstd", "lz4", "lz4", "zstd"]
    results = []
    for i, codec in enumerate(order):
        res = run(codec)
        res["slot"] = i
        results.append(res)
        print(json.dumps(res))
    by = {"lz4": {}, "zstd": {}}
    for res in results:
        for name, w in res["walls"].items():
            by[res["codec"]].setdefault(name, []).append(w)
    print("\nper-query min across reps (3 fresh JVMs each):")
    for name in NAMES:
        a, b = min(by["lz4"][name]), min(by["zstd"][name])
        print(f"  {name}: lz4 {a:.3f}  zstd {b:.3f}  "
              f"({(b - a) / a * 100:+.1f}%)")


if __name__ == "__main__":
    main()
