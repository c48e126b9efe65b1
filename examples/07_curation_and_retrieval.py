"""Curation endgame: perplexity-style quality scoring -> deterministic
train/val/test split -> retrieval-eval k-NN join over embeddings.

The three round-3 operators compose with the earlier pipeline stages:
``lm_score`` ranks documents by how typical they are of the corpus
(CCNet keeps the low-cross-entropy head), ``train_val_test_split``
assigns content-stable splits (membership survives re-runs, engine
swaps and repartitioning — randomSplit's does not), and ``knn_join``
answers "nearest corpus item for EVERY query" in one distributed pass
(retrieval evals, hard-negative mining, RAG index QA).

Run: python examples/07_curation_and_retrieval.py [sf_dir]
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F

from elusion_spark import get_spark, knn_join, lm_score, train_val_test_split
from elusion_spark.operators.similarity import ivf_build

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
spark = get_spark()

docs = spark.read.parquet(f"{sf}/documents.parquet")

# 1. Unigram-LM cross-entropy: lower = more typical of the corpus.
scored = lm_score(docs, "doc_id", "text")
head = scored.orderBy("xent").limit(int(scored.count() * 0.8))
print("kept low-perplexity head:", head.count(), "docs")

# 2. Content-stable splits on the kept head. Same doc -> same split on
#    every engine, every run, any partitioning.
splits = train_val_test_split(
    head, "doc_id", weights={"train": 0.9, "val": 0.05, "test": 0.05}
)
splits.groupBy("split").count().orderBy("split").show()

# 2b. Temperature-weighted language mix: waterfilled keep-rates from
#     per-language token mass, executed as a content-stable filter.
from elusion_spark import (  # noqa: E402
    stratified_hash_sample,
    temperature_mix_rates,
    upsample_by_weight,
)
from elusion_spark.operators.text import token_count  # noqa: E402

toks = docs.select("doc_id", "lang", token_count("text").alias("n_tok"))
totals = {r["lang"]: r["t"] for r in
          toks.groupBy("lang").agg(F.sum("n_tok").alias("t")).collect()}
rates = temperature_mix_rates(totals, budget_tokens=sum(totals.values()) // 2,
                              alpha=0.6)
mixed = stratified_hash_sample(toks, "doc_id", "lang", rates)
print("mix rates:", {k: round(v, 3) for k, v in rates.items()},
      "-> sampled docs:", mixed.count())

# 2c. Quality-weighted upsampling: expected multiplicity == weight,
#     content-stable realization (weights < 1 downsample).
weighted = scored.select(
    "doc_id", (F.lit(2.0) - F.col("xent") / 10).alias("wt"))
print("upsampled rows:", upsample_by_weight(weighted, "doc_id", "wt").count(),
      "from", weighted.count())

# 3. Retrieval QA over the embedding table: every vector's 3 nearest
#    neighbours, IVF mode (probe 4 of 8 clusters — trade recall for a
#    2x cheaper candidate stage; nprobe=nlist would be exact).
emb = spark.read.parquet(f"{sf}/embeddings.parquet")
_, cents = ivf_build(emb, "embedding", 64, nlist=8,
                     sample_fraction=1.0, iters=3, seed=7)
nn = knn_join(emb, emb, k=3, centroids=cents, nprobe=4, exclude_self=True)
nn.orderBy("query_id", "rank").show(6)

# labels let us sanity-check retrieval quality: how often is the top-1
# neighbour from the same label class?  (On this synthetic table labels
# are independent of the vectors, so the agreement sits at the 1/|labels|
# chance floor — the point is the metric's plumbing, which on a real
# embedding table flags an index/recall regression immediately.)
lab = emb.select("vec_id", "label")
top1 = (nn.filter("rank = 1")
        .join(lab.withColumnRenamed("vec_id", "query_id")
                 .withColumnRenamed("label", "q_label"), "query_id")
        .join(lab.withColumnRenamed("vec_id", "neighbor_id")
                 .withColumnRenamed("label", "n_label"), "neighbor_id"))
agree = top1.select(F.avg((F.col("q_label") == F.col("n_label"))
                          .cast("double")).alias("top1_label_agreement"))
agree.show()
