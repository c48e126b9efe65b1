"""Mergeable sketches: HyperLogLog distinct counts and count-min heavy
hitters.

Beyond-parity (SURVEY §2.5 lists approx-distinct as absent in the
reference).  The point at 100 TB is MERGEABILITY: build one sketch per
partition/day/shard, store the binary, and answer "distinct users this
quarter" by unioning 90 tiny sketches instead of rescanning 90 days of
raw data.  All functions are Spark built-ins (Apache DataSketches HLL
under the hood) — JVM-side aggregation, fixed-size state.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hll_sketch(col: str, lg_k: int = 12) -> Column:
    """HLL sketch aggregate (binary, ~2^lg_k bytes; lg_k=12 → ~1.6%
    relative standard error)."""
    return F.expr(f"hll_sketch_agg({col}, {lg_k})")


def hll_estimate(sketch_col: str) -> Column:
    return F.expr(f"hll_sketch_estimate({sketch_col})")


def distinct_sketch_table(
    df: DataFrame, value_col: str, keys: list[str], lg_k: int = 12
) -> DataFrame:
    """Per-key HLL sketch table — the incremental building block.  Write
    this per batch/partition; roll up later with ``merge_sketches``."""
    return df.groupBy(*keys).agg(
        hll_sketch(value_col, lg_k).alias("sketch"),
        F.count(value_col).alias("n_rows"),
    )


def merge_sketches(
    sketch_df: DataFrame, keys: list[str] | None = None
) -> DataFrame:
    """Union sketches (optionally regrouped by a coarser key set) and
    estimate.  Merging S sketches costs O(S · 2^lg_k) bytes — independent
    of the original data volume."""
    grouped = sketch_df.groupBy(*(keys or []))
    return grouped.agg(
        F.expr("hll_union_agg(sketch)").alias("sketch"),
        F.sum("n_rows").alias("n_rows"),
    ).withColumn("distinct_estimate", F.expr("hll_sketch_estimate(sketch)"))


def heavy_hitters(
    df: DataFrame,
    col: str,
    k: int = 10,
    by: list[str] | None = None,
) -> DataFrame:
    """Top-k most frequent values (exact, two-shuffle groupBy+top-k —
    at extreme cardinality swap in count_min_sketch probes; the exact
    path is preferable until group count itself is the bottleneck).

    Global (``by=None``) uses ``orderBy().limit(k)`` —
    TakeOrderedAndProject keeps per-partition heaps of size k, so no
    single partition ever holds all group counts; the rank window then
    runs over only k rows.  The windowed path is per-key and parallel."""
    from pyspark.sql import Window

    counts = df.groupBy(*(by or []), col).agg(F.count("*").alias("freq"))
    order = [F.col("freq").desc(), F.col(col)]
    if not by:
        top = counts.orderBy(*order).limit(k)
        return top.withColumn("rank", F.row_number().over(Window.orderBy(*order)))
    w = Window.partitionBy(*by).orderBy(*order)
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
