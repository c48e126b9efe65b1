"""Table maintenance: file compaction with clustered layout.

Small-files is THE operational failure mode of a 100 TB lake (every file
costs a task + a footer read + catalog pressure).  ``compact_files``
rewrites a parquet directory into ~``target_mb`` files, optionally
sorted within partitions on cluster keys so min/max row-group stats
become selective (poor-man's clustering — same mechanism Z-ordering
exploits, without the bit-interleaving)."""

from __future__ import annotations

import math
import os
import shutil

from pyspark.sql import SparkSession


def compact_files(
    spark: SparkSession,
    path: str,
    target_mb: int = 128,
    sort_cols: list[str] | None = None,
    partition_by: list[str] | None = None,
    zorder_by: list[str] | None = None,
) -> dict:
    """Rewrite ``path`` (parquet dir) into size-targeted files.  Returns
    {files_before, files_after, bytes}.  Atomic: writes to a sibling tmp
    dir then renames.

    ``partition_by`` preserves (or establishes) a hive partition layout
    — without it a partitioned directory would compact into a FLAT one,
    silently discarding partition pruning for every downstream read.

    ``zorder_by`` (mutually exclusive with ``sort_cols``) lays files on
    a Morton curve over several numeric columns so min/max stats prune
    on ALL of them — see ``cluster_by_zorder``."""
    def _files(p):
        return [
            os.path.join(r, f)
            for r, _d, fs in os.walk(p)
            for f in fs
            if f.endswith(".parquet")
        ]

    before = _files(path)
    total_bytes = sum(os.path.getsize(f) for f in before)
    n_out = max(1, math.ceil(total_bytes / (target_mb * 1024 * 1024)))
    df = spark.read.parquet(path)
    if zorder_by:
        out = cluster_by_zorder(df, zorder_by, n_partitions=n_out)
    elif sort_cols:
        # repartitionByRange + sortWithinPartitions: each output file
        # covers a narrow key range -> row-group min/max stats prune
        out = df.repartitionByRange(n_out, *sort_cols).sortWithinPartitions(
            *sort_cols
        )
    else:
        out = df.coalesce(n_out)
    tmp = path.rstrip("/") + ".__compact_tmp"
    w = out.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(tmp)
    back = path.rstrip("/") + ".__compact_old"
    os.rename(path, back)
    os.rename(tmp, path)
    shutil.rmtree(back)
    return {
        "files_before": len(before),
        "files_after": len(_files(path)),
        "bytes": total_bytes,
    }


def upsert_partitioned(
    spark: SparkSession,
    path: str,
    updates,
    keys: list[str],
    partition_col: str,
) -> dict:
    """Batch upsert into a partition-laid-out parquet table, rewriting
    ONLY the partitions the updates touch — the no-Delta answer to
    MERGE INTO for append-mostly corpora (daily re-crawls, corrected
    documents, re-scored quality columns).

    Mechanics: the updates' distinct partition values select the
    affected partitions (partition-pruned read — ``PartitionFilters``,
    never a full scan); existing rows there are anti-joined on ``keys``
    (last-write-wins), unioned with the updates, and written back with
    dynamic partition overwrite so untouched partitions' files are not
    rewritten.  Cost scales with the touched partitions, not the table.

    Updates MUST carry ``partition_col``; a key may move between
    partitions only if the old row's partition is also touched by some
    update (otherwise the stale copy survives — same caveat as Hive
    dynamic-partition MERGE patterns; route moves through a delete
    partition or a full rewrite).

    Returns {partitions_touched, rows_written}."""
    from pyspark.sql import functions as F

    parts = [r[0] for r in updates.select(partition_col).distinct().collect()]
    if not parts:
        return {"partitions_touched": 0, "rows_written": 0}
    existing = spark.read.parquet(path).filter(
        F.col(partition_col).isin(parts)
    )
    keep = existing.join(updates.select(*keys), keys, "left_anti")
    out = keep.unionByName(updates.select(*existing.columns))
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        n = out.count()
        out.write.mode("overwrite").partitionBy(partition_col).parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    return {"partitions_touched": len(parts), "rows_written": n}


def zorder_expr(scaled_cols: list[str], bits: int = 16):
    """Morton (Z-order) interleave of pre-scaled integer expressions:
    bit ``i`` of column ``idx`` lands at output bit ``i*n + idx``.  The
    unrolled shift/mask sum stays in whole-stage codegen — no UDF.
    Inputs must already be ints in ``[0, 2**bits)`` (see
    ``zorder_scale_expr``)."""
    from pyspark.sql import functions as F

    n = len(scaled_cols)
    terms = [
        f"shiftleft(CAST(shiftright({c}, {i}) & 1 AS BIGINT), {i * n + idx})"
        for idx, c in enumerate(scaled_cols)
        for i in range(bits)
    ]
    return F.expr("(" + " + ".join(terms) + ")")


def zorder_scale_expr(col: str, mn: float, mx: float, bits: int = 16) -> str:
    """Linear scaling of a numeric column to the ``[0, 2**bits)`` grid
    (SQL-expression string, composable into ``zorder_expr``).  Min/max
    scaling is one cheap agg pass; for heavily skewed columns substitute
    rank scaling (approxQuantile boundaries) — the interleave is
    agnostic to how the grid coordinates were produced."""
    top = (1 << bits) - 1
    if mx <= mn:
        return "0"
    return (
        f"CAST(LEAST(GREATEST((CAST({col} AS DOUBLE) - {mn!r}) / "
        f"{(mx - mn)!r} * {float(top)!r}, 0.0), {float(top)!r}) AS BIGINT)"
    )


def cluster_by_zorder(
    df,
    cols: list[str],
    bits: int = 16,
    n_partitions: int | None = None,
):
    """Re-lay a DataFrame on a Z-order curve over ``cols`` so that EVERY
    listed column's min/max file statistics become selective — the
    multi-column generalization of sort-clustering (a single-column sort
    makes one column prunable; the space-filling curve shares the
    prunability across all of them, at some per-column dilution).

    Mechanics: one agg pass collects per-column min/max (driver sees
    ``2*len(cols)`` numbers), each column scales to a ``2**bits`` grid,
    the Morton interleave becomes the range-partition + in-file sort
    key, and the key is dropped before handing the frame back.

    At 100 TB this is the difference between a needle query reading one
    file per predicate column and reading the whole table: parquet
    row-group stats prune on every Z-ordered column, and the layout
    cost is one shuffle (the range partitioner) amortized over every
    future scan."""
    from pyspark.sql import functions as F

    stats = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"__mn_{i}") for i, c in enumerate(cols)],
        *[F.max(F.col(c).cast("double")).alias(f"__mx_{i}") for i, c in enumerate(cols)],
    ).collect()[0]
    scaled = [
        zorder_scale_expr(c, float(stats[f"__mn_{i}"]), float(stats[f"__mx_{i}"]), bits)
        for i, c in enumerate(cols)
    ]
    n_out = n_partitions or df.sparkSession.sparkContext.defaultParallelism
    return (
        df.withColumn("__z", zorder_expr(scaled, bits))
        .repartitionByRange(n_out, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
    )
