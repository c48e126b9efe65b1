"""Round-5 surface: contamination-proof eval splits and explicit
runtime row-level filtering.

- ``leakage_safe_split`` assigns train/val/test so that every member of
  a duplicate cluster (exact md5 families here; near-dup pair edges or
  precomputed clusters also accepted) lands on the SAME side — the
  benchmark-contamination guard a per-row hash split cannot give.
- ``build_bloom`` / ``bloom_prefilter`` build a Bloom filter over a key
  set with one distinct + bit_or aggregation and prefilter a fact scan
  with a pure codegen bit-test conjunction: no false negatives, ~fpp
  leak (removed by the exact join after), 10x less shuffle input at the
  sf1 measurement.  ``prebuilt=`` reuses one build across many queries.

Run: python examples/12_leakage_safe_eval_and_bloom.py [sf_dir]
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F

from elusion_spark import (
    bloom_prefilter,
    build_bloom,
    get_spark,
    leakage_safe_split,
)

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
spark = get_spark()

# --- leakage-safe split on a corpus with planted duplicates ----------
docs = spark.read.parquet(f"{sf}/documents.parquet").select("doc_id", "text")
# plant duplicates: every doc exists again under a shifted id
corpus = docs.unionByName(
    docs.select((F.col("doc_id") + 1_000_000).alias("doc_id"), "text"))

split = leakage_safe_split(
    corpus, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1},
    text_col="text", key_col="family")
split.groupBy("split").count().orderBy("split").show()

# both copies of a text always share a side:
straddlers = (
    split.groupBy("family")
    .agg(F.countDistinct("split").alias("sides"))
    .filter("sides > 1").count()
)
print(f"duplicate families straddling splits: {straddlers} (must be 0)")

# --- Bloom prefilter: big fact vs non-broadcastable key set ----------
li = spark.read.parquet(f"{sf}/lineitem.parquet")
keys = (
    spark.read.parquet(f"{sf}/orders.parquet")
    .filter("o_orderpriority = '1-URGENT'")
    .select("o_orderkey")
)
bf = build_bloom(keys, "o_orderkey")        # build ONCE ...
pre = bloom_prefilter(li, None, "l_orderkey", prebuilt=bf)  # ... reuse
print(f"fact rows: {li.count()}, after prefilter: {pre.count()}")

exact = pre.join(keys.withColumnRenamed("o_orderkey", "l_orderkey"),
                 "l_orderkey", "semi")
exact.groupBy("l_returnflag").agg(
    F.round(F.sum("l_extendedprice"), 2).alias("urgent_revenue")
).orderBy("l_returnflag").show()
