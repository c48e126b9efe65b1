"""Quantized ANN + second-generation lake ops walkthrough.

Four capabilities added in round 3 (continued), at toy scale:

1. SQ8 scalar quantization: fit per-dimension 8-bit quantizers, encode
   the embedding table (4-8x smaller), search with the exact
   decode-then-dot ranking AND the billion-code ADC scan — and measure
   how little recall the quantization costs vs full-precision search;
2. Z-order compaction: lay a two-column table on a Morton curve and
   read back the parquet footer stats to SEE both columns prune;
3. SCD2 dimension maintenance: attribute changes close the live row
   and insert a dated version;
4. the mergeable rollup store: per-batch partial aggregates folded
   into a metrics table no rescan ever touches.

Run: python examples/09_quantization_and_lake_ops.py [sf_dir]
"""
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F

from elusion_spark import (
    cluster_by_zorder,
    get_spark,
    read_rollup,
    scd2_merge,
    sq_adc_topk,
    sq_encode_expr,
    sq_fit,
    sq_norm_expr,
    sq_topk,
    update_rollup,
)
from elusion_spark.operators.similarity import cosine_topk

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
spark = get_spark()
root = tempfile.mkdtemp()

# ------------------------------------------------------------- 1. SQ8 ANN
emb = spark.read.parquet(f"{sf}/embeddings.parquet")
dim = len(emb.first()["embedding"])
mins, spans = sq_fit(emb, "embedding", dim)
enc = emb.select(
    "vec_id",
    sq_encode_expr("embedding", mins, spans).alias("code"),
).withColumn("nrm", sq_norm_expr("code", mins, spans))

query = [((i * 37) % 97) / 97.0 for i in range(dim)]
full = [r["vec_id"] for r in cosine_topk(emb, "embedding", "vec_id", query, 10).collect()]
sq = [r["vec_id"] for r in sq_topk(enc, "vec_id", "code", mins, spans, query, 10).collect()]
adc = [r["vec_id"] for r in sq_adc_topk(enc, "vec_id", "code", "nrm", mins, spans, query, 10).collect()]
print(f"SQ8 top-10 recall vs full precision: {len(set(full) & set(sq))}/10 "
      f"(ADC scan agrees with decode-then-dot: {sq == adc})")

# ------------------------------------------------------- 2. Z-order layout
tbl = spark.range(0, 50_000).selectExpr(
    "CAST(pmod(xxhash64(id, 1), 10000) AS DOUBLE) AS x",
    "CAST(pmod(xxhash64(id, 2), 10000) AS DOUBLE) AS y",
)
zdir = f"{root}/zorder"
cluster_by_zorder(tbl, ["x", "y"], n_partitions=16).write.parquet(zdir)

import pyarrow.parquet as pq

hits = {"x": 0, "y": 0}
tot = 0
for f in os.listdir(zdir):
    if not f.endswith(".parquet"):
        continue
    md = pq.ParquetFile(os.path.join(zdir, f)).metadata
    for rg in range(md.num_row_groups):
        rgm = md.row_group(rg)
        tot += 1
        for i in range(rgm.num_columns):
            c = rgm.column(i)
            if c.path_in_schema in hits:
                st = c.statistics
                if st.min <= 1000 and st.max >= 0:
                    hits[c.path_in_schema] += 1
print(f"Z-order: a 10% range touches {hits['x']}/{tot} row groups on x "
      f"and {hits['y']}/{tot} on y (unclustered would touch all)")

# ------------------------------------------------------------ 3. SCD2 dim
dimp = f"{root}/dim_supplier"
snap1 = spark.read.parquet(f"{sf}/supplier.parquet").select(
    "s_suppkey", "s_name", "s_acctbal")
print("SCD2 bootstrap:", scd2_merge(
    spark, dimp, snap1, ["s_suppkey"], ["s_name", "s_acctbal"], "2026-01-01"))
snap2 = snap1.withColumn(
    "s_acctbal",
    F.when(F.col("s_suppkey") % 10 == 0, F.col("s_acctbal") + 100.0)
    .otherwise(F.col("s_acctbal")),
)
print("SCD2 after re-scored snapshot:", scd2_merge(
    spark, dimp, snap2, ["s_suppkey"], ["s_name", "s_acctbal"], "2026-02-01"))

# -------------------------------------------------------- 4. rollup store
store = f"{root}/daily_metrics"
orders = spark.read.parquet(f"{sf}/orders.parquet")
spec = {"n": ("count", None), "gross": ("sum", "o_totalprice"),
        "buyers": ("hll", "o_custkey")}
for month in ("1995-01", "1995-02", "1995-03"):
    batch = orders.filter(f"date_format(o_orderdate, 'yyyy-MM') = '{month}'")
    update_rollup(spark, store, batch, ["o_orderstatus"], spec)
read_rollup(spark, store, spec).select(
    "o_orderstatus", "n", F.round("gross", 2).alias("gross"),
    F.round("buyers_estimate", 0).alias("buyers_est"),
).orderBy("o_orderstatus").show()
print("rollup store rows:", spark.read.parquet(store).count(),
      "(one per status — no month is ever rescanned)")
