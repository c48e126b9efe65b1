"""Round-4 surface: batched hybrid retrieval, event analytics, web
hygiene, and deterministic training shards.

- ``bm25_score_batched`` + ``knn_join`` + ``rrf_fuse(query_col=...)``
  answer |Q| hybrid-search queries in one distributed pass — every rank
  window partitions per query (no single-partition degradation), and
  the BM25 df-cap keeps stopword-laden queries from pairing with the
  whole corpus.
- ``funnel`` / ``cohort_retention`` / ``event_rate_anomaly`` /
  ``gap_stats`` are the event-analytics quartet (q87-q90) as callable
  operators.
- ``normalize_url`` + ``filter_urls`` canonicalize crawl URLs and drop
  blocked domains via an equality semi-join (million-domain lists are a
  join side, not a LIKE scan).
- ``assign_shards`` / ``write_training_shards`` lay a corpus out as
  one position-ordered file per shard, content-stable across re-runs.

Run: python examples/10_hybrid_search_and_events.py [sf_dir]
"""
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F

from elusion_spark import (
    assign_shards,
    bm25_score_batched,
    cohort_retention,
    event_rate_anomaly,
    filter_urls,
    funnel,
    get_spark,
    knn_join,
    normalize_url,
    rrf_fuse,
    write_training_shards,
)

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
spark = get_spark()

docs = spark.read.parquet(f"{sf}/documents.parquet")
emb = spark.read.parquet(f"{sf}/embeddings.parquet")
events = spark.read.parquet(f"{sf}/events.parquet")

# ---------------------------------------------------------- hybrid search
# Every 20th document queries the corpus: dense leg = exact k-NN over
# embeddings, sparse leg = batched BM25 over its first 8 tokens.
queries = emb.filter("vec_id % 20 = 0")
dense = knn_join(queries, emb, k=10, exclude_self=True)

qterms = docs.filter("doc_id % 20 = 0").select(
    F.col("doc_id").alias("query_id"),
    F.expr(
        "slice(filter(split(lower(trim(text)), ' +'), t -> t <> ''), 1, 8)"
    ).alias("terms"),
)
sparse = bm25_score_batched(
    docs, qterms, max_df_fraction=0.2
).filter("doc_id <> query_id")

fused = rrf_fuse(
    [(dense, "neighbor_id", "cosine"), (sparse, "doc_id", "score")],
    query_col="query_id",
)
print("-- hybrid top hits (per-query fusion) --")
fused.orderBy(F.desc("rrf_score")).show(5, truncate=False)

# --------------------------------------------------------- event analytics
print("-- funnel view -> click -> purchase --")
funnel(events, ["view", "click", "purchase"]).show()

print("-- weekly cohort retention (first 5 rows) --")
cohort_retention(events, grain="week").orderBy(
    "cohort_week", "week_offset"
).show(5)

print("-- hourly rate anomalies (|z| > 3) --")
event_rate_anomaly(events).filter("abs(z) > 3").show(5)

# ------------------------------------------------------------- web hygiene
urls = docs.select(
    "doc_id",
    F.expr(
        "concat('HTTPS://Site', CAST(doc_id % 9 AS STRING),"
        " '.Example.COM/p/', CAST(doc_id AS STRING),"
        " '?utm_source=feed&id=', CAST(doc_id AS STRING), '#top')"
    ).alias("raw"),
).withColumn("url", normalize_url("raw"))
clean = filter_urls(urls, "url", ["site3.example.com"])
print(f"-- urls: {urls.count()} raw -> {clean.count()} after blocklist --")
clean.select("url").show(3, truncate=False)

# ------------------------------------------------------- training shards
with tempfile.TemporaryDirectory() as tmp:
    stats = write_training_shards(
        docs.select("doc_id", "text"), f"{tmp}/shards", "doc_id", 8
    )
    print(f"-- shards written: {stats} --")
    one = spark.read.parquet(f"{tmp}/shards/shard=0")
    print(f"   shard 0: {one.count()} rows, position-ordered")

# same ids -> same shards, every run (epoch-reproducible loaders)
a = assign_shards(docs.select("doc_id"), "doc_id", 8).collect()
b = assign_shards(docs.select("doc_id"), "doc_id", 8).collect()
assert {r["doc_id"]: r["shard"] for r in a} == \
    {r["doc_id"]: r["shard"] for r in b}
print("-- shard assignment is content-stable across runs --")
