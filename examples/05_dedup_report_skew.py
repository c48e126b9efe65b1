"""Round-2 features end-to-end: oracle-grade dedup, skew-salted joins,
runtime cache config, and the interactive HTML report.

Run: python examples/05_dedup_report_skew.py [sf_dir]
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F

from elusion_spark import configure_cache, get_spark
from elusion_spark.dataframe import CustomDataFrame
from elusion_spark.functions import dashboard as DB
from elusion_spark.operators import dedup as D
from elusion_spark.operators import scale as SC
from elusion_spark.sources.loaders import load_parquet

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
spark = get_spark()

# 1. runtime cache limits (cashandview.rs parity)
print("cache config:", configure_cache(max_queries=25, ttl_seconds=600))

# 2. exact-verified MinHash near-dup pairs + transitive clusters
docs = load_parquet(f"{sf}/documents.parquet", "d", spark).df
pairs = D.minhash_dedup_pairs(docs, "doc_id", "text",
                              threshold=0.5, verify="exact")
clusters = D.connected_components(pairs)
print("near-dup pairs:", pairs.count(),
      "| docs in clusters:", clusters.count())

# 3. SimHash in cross-engine md5 mode (what the correctness gate checks)
sim = D.simhash_dedup_pairs(docs, "doc_id", "text", max_hamming=2,
                            bands=3, bits=60, hash_fn="md5")
print("simhash pairs (hamming<=2):", sim.count())

# 4. skew-salted join: 90% of rows on one key, spread over 16 sub-keys
li = load_parquet(f"{sf}/lineitem.parquet", "l", spark).df
big = li.selectExpr(
    "CASE WHEN l_partkey % 10 < 9 THEN 1 ELSE l_partkey % 1000 END AS k",
    "l_quantity")
small = (load_parquet(f"{sf}/part.parquet", "p", spark).df
         .filter("p_partkey < 1000")
         .selectExpr("p_partkey AS k", "p_retailprice"))
salted = SC.join_salted(big, small, "k", salt=16)
print("salted-join rows:", salted.count(),
      "| shuffle exchanges:", SC.explain_shuffles(salted))

# 5. interactive report: ag-grid table + cross-filterable plots + Excel
summary = (
    CustomDataFrame(li, "l")
    .select(["l_returnflag"])
    .agg(["CAST(COUNT(*) AS BIGINT) AS n",
          "CAST(SUM(CAST(l_quantity AS DECIMAL(38,9))) AS DOUBLE) AS qty"])
    .group_by_all()
    .elusion("summary")
)
daily = (
    CustomDataFrame(li, "l2")
    .select(["l_shipdate"])
    .agg(["CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,9))) AS DOUBLE) AS rev"])
    .group_by(["l_shipdate"])
    .order_by(["l_shipdate"])
    .limit(120)
    .elusion("daily")
)
path = DB.create_report(
    plots=[("Revenue over time", DB.plot_time_series(daily, "l_shipdate", "rev")),
           ("Rows by returnflag", DB.plot_bar(summary, "l_returnflag", "n"))],
    tables=[("Summary", summary)],
    report_title="Elusion-Spark round-2 demo",
    filename="/tmp/es_example05_report.html",
    table_options=DB.TableOptions(page_size=20),
)
print("interactive report written:", path)
