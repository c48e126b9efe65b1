"""SparkSession factory tuned for this engine.

Scale stance: these defaults are the *local[32] test* profile.  On a real
cluster the same code runs unchanged — AQE handles partition coalescing and
skew joins at runtime, shuffle partitions should be sized to cluster cores
(set ``spark.sql.shuffle.partitions`` via ``extra_conf`` or spark-submit),
and Arrow is enabled for every pandas-interop boundary.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_DEFAULTS = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.ui.enabled": "false",
    # Long-lived sessions run MANY distinct query shapes (the suite alone
    # has 66).  The default 100-entry codegen class cache evicts earlier
    # queries' generated classes, so re-running one pays a multi-second
    # Janino recompile (measured: q64 4.1 s after 24 other queries, 1.7 s
    # once re-cached).  1000 entries keeps every shape compiled; the JIT
    # code cache is raised to match so compiled code isn't flushed either.
    "spark.sql.codegen.cache.maxEntries": "1000",
    "spark.driver.extraJavaOptions": "-XX:ReservedCodeCacheSize=1g",
    # Prefer shuffled-hash join over sort-merge when the per-partition
    # build side fits (guide §3.1/§9): same results, no sort pass.
    # Measured r10 on the three SMJ-carrying bench entries: q158 -8%,
    # q156 -7%, q136 flat (one of q158's two SMJs flips to SHJ; the
    # other fails the planner's size gate and stays SMJ).  Scale note:
    # SHJ builds a per-partition hash table — AQE skew splitting still
    # applies, and the planner's own size conditions keep genuinely
    # large-per-partition sides on SMJ, so this is the guide's
    # recommended default, not a local[32] tune.
    "spark.sql.join.preferSortMergeJoin": "false",
    # zstd parquet output (guide §6): measured r10 on sf0.1
    # documents+lineitem — 20% smaller files (11.3 -> 9.0 MB), write
    # wall equal-or-better (2.27 -> 2.02 s warm), read-back no slower.
    # Codec of OUTPUT files only; inputs declare their own codec.
    "spark.sql.parquet.compression.codec": "zstd",
    # parquet split size: this is the LOCAL profile — sf0.1 tables are
    # 20-100 MB single files, so 128 MB splits would serialize the whole
    # scan on one of 32 cores; 8 MB keeps every core busy.  On a real
    # cluster set 128 MB (the task-overhead sweet spot at 100 TB) via
    # extra_conf / spark-submit.
    "spark.sql.files.maxPartitionBytes": str(8 * 1024 * 1024),
}


def get_spark(
    app_name: str = "elusion_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or reuse) a session.  ``SPARK_GRAFT_CPUS`` drives local
    parallelism; shuffle partitions default to the same so a local run has
    one shuffle partition per core (not the 200 cluster default)."""
    active = SparkSession.getActiveSession()
    if active is not None:
        return active
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    b = SparkSession.builder.master(master).appName(app_name)
    conf = dict(_DEFAULTS)
    conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions or cpus)
    conf["spark.driver.memory"] = os.environ.get("SPARK_DRIVER_MEMORY", "16g")
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
