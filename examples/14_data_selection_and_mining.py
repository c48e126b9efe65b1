"""Round-5 surface: target-domain data selection and corpus mining.

The selection side of a pretraining-data pipeline — after dedup and
quality filtering, WHICH documents make the mix:

1. ``dsir_importance`` scores every raw document by how much more
   likely it is under a hashed-ngram model of the TARGET domain than
   under the raw-corpus model (Xie et al. 2023 — importance
   resampling).  One (id, bucket) shuffle + a bucket-table broadcast;
   the DECIMAL fold makes scores bit-identical under any partitioning.
2. ``dsir_select`` draws k documents by Gumbel-top-k over the weights
   — sampling-without-replacement proportional to importance, fully
   deterministic given the seed (md5-derived noise).
3. ``pmi_collocations`` mines the corpus for multiword expressions
   (bigram PMI, Church & Hanks 1990) — the vocabulary the tokenizer
   and the boilerplate filters should know about.
4. ``tfidf_cosine_pairs`` closes the dedup matrix with EXACT sparse
   lexical cosine (AllPairs/PPJoin prefix + position filtering):
   MinHash answers "same set of shingles", this answers "same
   TF-IDF-weighted vocabulary" — bigram features keep the prefix
   index selective on templated corpora.

Run: python examples/14_data_selection_and_mining.py [sf_dir]
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F

from elusion_spark import (
    dsir_importance,
    dsir_select,
    get_spark,
    pmi_collocations,
    tfidf_cosine_pairs,
)

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
spark = get_spark()
docs = spark.read.parquet(os.path.join(sf, "documents.parquet"))

# 1. importance weights toward the English subcorpus
lw = dsir_importance(docs, "doc_id", "text", "lang = 'en'",
                     n_buckets=2048)
print("\n-- DSIR log-weights (top target-like) --")
lw.orderBy(F.desc("logw")).show(5, truncate=False)

# 2. deterministic importance resample: 100 docs, weight-proportional
picked = dsir_select(docs, "doc_id", "text", "lang = 'en'", k=100,
                     n_buckets=2048, seed=42)
frac_en = (
    picked.join(docs, "doc_id")
    .agg(F.avg((F.col("lang") == "en").cast("double")))
    .first()[0]
)
print(f"selected 100 docs; english fraction = {frac_en:.2f} "
      f"(corpus base rate ~0.45)")

# 3. collocation mining
print("\n-- top PMI collocations (count >= 5) --")
pmi_collocations(docs, "text", min_count=5, top_k=10).show(truncate=False)

# 4. exact lexical near-dup pairs at bigram cosine >= 0.9
pairs = tfidf_cosine_pairs(docs, "doc_id", "text",
                           threshold=0.9, ngram=2)
print(f"tfidf-cosine near-dup pairs (>=0.9 bigram): {pairs.count()}")
pairs.orderBy(F.desc("cosine")).show(5)
