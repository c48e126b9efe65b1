"""Zero-install connectivity + corpus governance, all offline.

Excel roundtrip through the stdlib SpreadsheetML codec, plan-keyed
result caching, content-stable sampling with per-domain caps, and the
linear classifier quality filter.

Run: python examples/06_connectivity_and_governance.py [sf_dir]
"""
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from elusion_spark import (
    CustomDataFrame,
    cap_per_group,
    classifier_score,
    get_spark,
    hash_sample,
    load_excel,
)

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
spark = get_spark()

# --- Excel: write a query result to xlsx, read it back (no openpyxl) ----
nation = CustomDataFrame.new(f"{sf}/nation.parquet", "n", spark)
top = nation.select(["n_name", "n_regionkey"]).limit(5).elusion("top_n")
xlsx = os.path.join(tempfile.gettempdir(), "nations.xlsx")
top.write_to_excel(xlsx)
back = load_excel(xlsx, "from_excel", spark)
print("excel roundtrip rows:", back.df.count())

# --- Result cache: identical REBUILT query hits by canonical plan key --
from elusion_spark.cache import cache_stats, cached_elusion

def build():
    return (CustomDataFrame.new(f"{sf}/orders.parquet", "o", spark)
            .select(["o_orderpriority"])
            .agg(["CAST(COUNT(*) AS BIGINT) AS n"]).group_by_all())

cached_elusion(build(), "by_prio").display(3)
cached_elusion(build(), "by_prio2").display(3)     # cache hit
print("cache:", cache_stats())

# --- Governance: stable sample -> domain cap -> quality filter ---------
docs = CustomDataFrame.new(f"{sf}/documents.parquet", "d", spark).df
sampled = hash_sample(docs, "doc_id", 0.5)          # survives repartition
capped = cap_per_group(sampled, "source", "doc_id", 100)
print("docs:", docs.count(), "sampled:", sampled.count(),
      "after domain cap:", capped.count())

emb = CustomDataFrame.new(f"{sf}/embeddings.parquet", "e", spark).df
head = [((i % 7) - 3) / 10 for i in range(64)]
kept = classifier_score(emb, "embedding", head, bias=0.1, threshold=0.5)
print("classifier keeps:", kept.count(), "of", emb.count())
