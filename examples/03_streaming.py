"""Structured Streaming: watermark windows + stream-static enrichment,
processed as one availableNow backlog run.

Run: python examples/03_streaming.py [sf_dir]
"""
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from elusion_spark import get_spark
from elusion_spark import streaming as ST
from elusion_spark.sources.loaders import load_parquet

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
spark = get_spark()

# streaming file sources need micros timestamps + explicit schema
src = tempfile.mkdtemp() + "/events"
load_parquet(f"{sf}/events.parquet", "e", spark).df.write.parquet(src)
schema = spark.read.parquet(src).schema

stream = ST.read_file_stream(spark, src, schema)
dim = spark.createDataFrame(
    [("click", "interactive"), ("view", "passive")], ["event_type", "category"]
)
enriched = ST.enrich_stream(stream, dim, "event_type")
windowed = ST.windowed_agg(
    enriched, "ts", "1 hour",
    aggs={"n": "count(*)", "total": "sum(value)"},
    keys=["category"], watermark_delay="10 minutes",
)
ST.run_available_now_to_memory(windowed, "agg").orderBy("window_start").show(10)
