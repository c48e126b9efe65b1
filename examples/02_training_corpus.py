"""Training-data pipeline: quality filter -> exact dedup -> MinHash
near-dedup with transitive clusters -> per-language stats -> partitioned
write.

Run: python examples/02_training_corpus.py [sf_dir] [out_dir]
"""
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from elusion_spark import (
    corpus_stats,
    get_spark,
    prepare_training_corpus,
    write_corpus,
)

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp() + "/corpus"
spark = get_spark()

docs = spark.read.parquet(f"{sf}/documents.parquet")
corpus = prepare_training_corpus(
    docs, min_quality=0.3, min_tokens=5, near_dup_threshold=0.6,
)
print(corpus_stats(corpus))
write_corpus(corpus, out)          # partitioned by lang — reads prune
print("written:", out)
