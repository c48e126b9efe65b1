#!/usr/bin/env python
"""A/B the q31 md5-SimHash signature stage: the pandas_udf per-doc loop
(current) vs a pure-JVM codegen form (explode distinct tokens -> md5 +
conv built-ins -> 60 codegen'd aggregate votes -> bit pack).

Bit-identity is asserted on the full sf0.1 corpus before timing.
Fresh process per invocation; run interleaved per the house discipline.

Usage: python tools/q31_sig_ab.py {udf|jvm|check} [sf_dir]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def jvm_signatures(df, id_col, text_col, bits):
    """(id, sig) via JVM built-ins only: explode distinct tokens,
    md5+conv per occurrence (codegen), 60 aggregate votes, bit pack."""
    toks = df.select(
        F.col(id_col).alias("__id"),
        F.explode(F.expr(
            f"array_distinct(split(lower(trim({text_col})), ' +'))"
        )).alias("__tok"),
    )
    hashed = toks.select(
        "__id",
        F.expr("cast(conv(substr(md5(__tok), 1, 15), 16, 10) as bigint)"
               ).alias("__h"),
    )
    votes = hashed.groupBy("__id").agg(*[
        F.expr(
            f"sum(CASE WHEN (shiftright(__h, {j}) & 1) = 1 "
            f"THEN 1 ELSE -1 END)").alias(f"v{j}")
        for j in range(bits)
    ])
    pack = " + ".join(
        f"(CASE WHEN v{j} > 0 THEN shiftleft(1L, {j}) ELSE 0L END)"
        for j in range(bits))
    return votes.select("__id", F.expr(pack).alias("__sim"))


def main() -> None:
    mode = sys.argv[1]
    sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    from elusion_spark.session import get_spark
    from elusion_spark.operators.dedup import _simhash_md5_udf

    spark = get_spark("q31_sig_ab")
    d = spark.read.parquet(f"{sf}/documents.parquet")

    def udf_sig():
        return d.select("doc_id",
                        _simhash_md5_udf(60)(F.col("text")).alias("__sim"))

    def jvm_sig():
        return jvm_signatures(d, "doc_id", "text", 60)

    if mode == "check":
        a = {r[0]: r[1] for r in udf_sig().collect()}
        b = {r[0]: r[1] for r in jvm_sig().collect()}
        assert a == b, {k: (a[k], b.get(k)) for k in list(a)[:5]}
        print(f"bit-identical on {len(a)} docs")
        return

    fn = udf_sig if mode == "udf" else jvm_sig
    # warm (codegen+workers), then min-of-5 timed
    for _ in range(2):
        fn().write.format("noop").mode("overwrite").save()
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        fn().write.format("noop").mode("overwrite").save()
        times.append(round(time.perf_counter() - t0, 3))
    print(f"{mode}: min {min(times)} times {times}")


if __name__ == "__main__":
    main()
