#!/usr/bin/env python
"""Fresh-JVM single-pass timer for one suite query (noop sink) — used
interleaved (A,B,A,B, min per variant) to A/B the q140 encode
parallelism fix on this contention-prone host.

Usage: python tools/q140_ab.py <query_name> [sf_dir]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    name = sys.argv[1]
    sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    from elusion_spark.session import get_spark
    from elusion_spark.suite import QUERIES

    spark = get_spark("q_ab")
    # warm the JVM/codegen on the small SF, untimed
    QUERIES[name](spark, "/root/testdata/sf0.001").write.format(
        "noop").mode("overwrite").save()
    walls = []
    for _ in range(3):
        t0 = time.perf_counter()
        QUERIES[name](spark, sf).write.format("noop").mode(
            "overwrite").save()
        walls.append(round(time.perf_counter() - t0, 3))
    print(f"{name}: min={min(walls)} walls={walls}")


if __name__ == "__main__":
    main()
