"""Round-5 surface: the compressed-ANN retrieval stack.

Two-stage retrieval the way a 100 TB vector corpus actually runs:

1. ``rp_project`` sketches 64-dim embeddings to 8 dims with a
   md5-derived ±1 matrix folded straight into codegen (zero shuffle,
   no model artifact — any engine can rebuild the matrix from the
   seed).
2. ``pq_fit`` trains m=8 k=16 codebooks — ONE aggregation job per
   Lloyd iteration for ALL subspaces — and ``pq_encode_expr`` packs
   each vector into 8 small ints (16-64x smaller than the floats).
3. ``pq_adc_topk`` scans the codes with a query-built lookup table —
   TakeOrderedAndProject, no shuffle, reads 1/16th the bytes of the
   brute-force scan — to produce a candidate shortlist.
4. The shortlist is exact-reranked with full-precision cosine, and
   ``recall_at_k`` scores the whole pipeline against the brute-force
   ground truth.

Run: python examples/13_compressed_ann_retrieval.py [sf_dir]
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F

from elusion_spark import (
    get_spark,
    l2_normalize_expr,
    pq_adc_topk,
    pq_encode_expr,
    pq_fit,
    recall_at_k,
    rp_project,
)
from elusion_spark.operators.similarity import cosine_topk

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
spark = get_spark()

# L2-normalize once at ingest: ADC uses squared-L2, and on unit
# vectors L2 ranking IS cosine ranking — the standard trick that lets
# one compressed index serve both metrics.
emb = spark.read.parquet(f"{sf}/embeddings.parquet").select(
    "vec_id", l2_normalize_expr("embedding").alias("v")
)
_q = [float((i * 37 % 13) - 6) / 7.0 for i in range(64)]
_qn = sum(x * x for x in _q) ** 0.5
query = [x / _qn for x in _q]

# -- 1. JL sketch: 64 -> 8 dims, pure codegen --------------------------
sk = rp_project(emb, "v", in_dim=64, out_dim=8, seed=0)
print("sketch sample:")
sk.select("vec_id", "rp").show(3, truncate=60)

# -- 2. PQ codebooks + encode ------------------------------------------
model = pq_fit(emb, "v", dim=64, m=8, k=16, iters=3)
enc = emb.withColumn("codes", pq_encode_expr("v", model))
print("codes sample (8 ints replace 64 floats):")
enc.select("vec_id", "codes").show(3, truncate=60)

# -- 3. ADC shortlist (compressed scan), then exact rerank -------------
# random synthetic vectors are PQ's worst case (no cluster structure
# to quantize toward) — the shortlist knob trades scan depth for
# recall; real embedding corpora saturate much earlier
SHORTLIST, K = 120, 10
short = pq_adc_topk(enc, "vec_id", "codes", query, model, k=SHORTLIST)
rerank = (
    emb.join(short.select("vec_id"), "vec_id")
    .select("vec_id", "v")
)
approx = cosine_topk(rerank, "v", "vec_id", query, k=K).withColumn(
    "query_id", F.lit(0)
)

# -- 4. score vs brute-force ground truth ------------------------------
truth = cosine_topk(emb, "v", "vec_id", query, k=K).withColumn(
    "query_id", F.lit(0)
)
rec = recall_at_k(
    approx.select("query_id", F.col("vec_id").alias("neighbor_id")),
    truth.select("query_id", F.col("vec_id").alias("neighbor_id")),
)
rec.show()
print("two-stage plan is shuffle-free up to the rerank join; the ADC")
print("scan reads PQ codes only (16x fewer bytes than the baseline).")
