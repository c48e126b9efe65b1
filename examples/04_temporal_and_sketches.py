"""Temporal operators + sketches: as-of enrichment, multi-grain rollup,
sessionization, mergeable distinct counts.

Run: python examples/04_temporal_and_sketches.py [sf_dir]
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F

from elusion_spark import asof_join, get_spark, time_rollup
from elusion_spark.operators import sketches as SK
from elusion_spark.sources.loaders import load_parquet

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
spark = get_spark()
events = load_parquet(f"{sf}/events.parquet", "e", spark).df

# 1. as-of: enrich every event with the latest prior click value per user
clicks = (events.filter("event_type = 'click'")
          .groupBy("user_id", "ts").agg(F.max("value").alias("click_value")))
enriched = asof_join(events, clicks, "user_id", "ts", "ts", ["click_value"])
print("as-of sample:")
enriched.select("event_id", "user_id", "value", "click_value").show(5)

# 2. hourly + daily rollups in ONE aggregation pass
rollup = time_rollup(events, "ts",
                     aggs={"n": "count(*)", "total": "sum(value)"},
                     resolutions={"1h": 3600, "1d": 86400},
                     keys=["event_type"])
print("rollup grains:", rollup.groupBy("grain").count().collect())

# 3. per-type distinct users via mergeable HLL sketches
skt = SK.distinct_sketch_table(events, "user_id", ["event_type"])
SK.merge_sketches(skt, ["event_type"]).select(
    "event_type", "distinct_estimate").show()
