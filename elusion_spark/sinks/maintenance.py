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


def _recover_swap(path: str, back: str) -> None:
    """Heal a crashed two-rename swap: a crash between rename-aside and
    rename-into-place leaves the complete previous snapshot at ``back``
    with nothing at ``path`` — restore it; a crash after the swap but
    before cleanup leaves a stale ``back`` — remove it.  Call before any
    read of ``path`` AND before starting a new swap (a leftover back
    dir would otherwise make ``os.rename(path, back)`` raise)."""
    if os.path.isdir(back):
        if not os.path.isdir(path):
            os.rename(back, path)
        else:
            shutil.rmtree(back)


def _atomic_swap(path: str, tmp: str, back: str) -> None:
    """Replace ``path`` with ``tmp`` via rename-aside; recoverable at
    every crash point through ``_recover_swap``."""
    os.rename(path, back)
    os.rename(tmp, path)
    shutil.rmtree(back)


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

    if zorder_by and sort_cols:
        raise ValueError(
            "compact_files: zorder_by and sort_cols are mutually exclusive "
            "— pass one clustering strategy, not both"
        )
    tmp = path.rstrip("/") + ".__compact_tmp"
    back = path.rstrip("/") + ".__compact_old"
    # Heal a crashed prior swap BEFORE any read of path: after a crash
    # between rename-aside and rename-into-place the snapshot lives at
    # ``back`` and ``path`` is missing — listing/reading first would
    # raise PATH_NOT_FOUND (and size the output from a missing dir).
    _recover_swap(path, back)
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
    w = out.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(tmp)
    _atomic_swap(path, tmp, back)
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
    ``zorder_scale_expr``).

    ``len(cols) * bits`` must fit in 63 bits: bit 63 would flip the
    BIGINT sign (inverting the curve's top level) and JVM shiftleft
    wraps amounts mod 64 (colliding different columns' bits) —
    ``cluster_by_zorder`` auto-shrinks ``bits`` instead."""
    from pyspark.sql import functions as F

    n = len(scaled_cols)
    if n * bits > 63:
        raise ValueError(
            f"zorder_expr: {n} cols x {bits} bits = {n * bits} exceeds the"
            f" 63 usable BIGINT bits; use bits <= {63 // n}"
        )
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
    future scan.

    ``bits`` auto-shrinks so the interleaved key fits 63 bits (4 cols →
    15 bits/col, 5 → 12, …): grid resolution dilutes gracefully instead
    of the key silently corrupting."""
    from pyspark.sql import functions as F

    bits = min(bits, 63 // max(1, len(cols)))
    stats = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"__mn_{i}") for i, c in enumerate(cols)],
        *[F.max(F.col(c).cast("double")).alias(f"__mx_{i}") for i, c in enumerate(cols)],
    ).collect()[0]
    for i, c in enumerate(cols):
        if stats[f"__mn_{i}"] is None or stats[f"__mx_{i}"] is None:
            raise ValueError(
                f"cluster_by_zorder: column {c!r} has no non-NULL values "
                "(or is empty) — min/max stats are undefined, so a Z-order "
                "key cannot be built over it"
            )
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


# --------------------------------------------------------------- SCD2 merge

def scd2_merge(
    spark: SparkSession,
    path: str,
    updates,
    keys: list[str],
    compare_cols: list[str],
    ts: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    current_flag: str = "is_current",
) -> dict:
    """Slowly-changing-dimension type 2 maintenance over a parquet dim
    table: attribute changes close the live row (``valid_to = ts``,
    ``is_current = false``) and insert a new version effective at
    ``ts``; unchanged rows are untouched; unseen keys insert fresh.
    ``updates`` carries one row per key (the latest snapshot), with
    ``keys + compare_cols`` columns.

    Change detection is null-safe per compare column.  Re-merging the
    same snapshot is a no-op (idempotent) — the changed-set is empty.

    Scale/atomicity: the merge is one full-outer join of the CURRENT
    slice against the snapshot (history rows never join), then an
    atomic tmp-dir rewrite.  Dimensions are small next to facts, so the
    rewrite is the right default; at Delta/Iceberg targets the same
    tagged frame feeds MERGE INTO instead, and for huge dims partition
    the table by ``is_current`` so only the live slice rewrites.

    Returns {closed, inserted, unchanged, total_rows}."""
    from pyspark.sql import functions as F

    scd_cols = [valid_from, valid_to, current_flag]
    back = path.rstrip("/") + ".__scd2_old"
    _recover_swap(path, back)
    exists = os.path.isdir(path) and any(
        f.endswith(".parquet") for _r, _d, fs in os.walk(path) for f in fs
    )
    if not exists:
        init = updates.select(*keys, *compare_cols).withColumns({
            valid_from: F.lit(ts).cast("string"),
            valid_to: F.lit(None).cast("string"),
            current_flag: F.lit(True),
        })
        n = init.count()
        init.write.mode("overwrite").parquet(path)
        return {"closed": 0, "inserted": n, "unchanged": 0, "total_rows": n}

    dim = spark.read.parquet(path)
    cur = dim.filter(F.col(current_flag))
    hist = dim.filter(~F.col(current_flag))
    u = updates.select(*keys, *compare_cols)
    # presence of the update side: keys may legitimately be null, so tag
    # via a constant probe column instead of key-null checks
    joined = cur.alias("c").join(
        u.withColumn("__u", F.lit(True)).alias("u"),
        [F.col(f"c.{k}").eqNullSafe(F.col(f"u.{k}")) for k in keys],
        "full_outer",
    )
    has_c = F.col(f"c.{current_flag}").isNotNull()
    has_u = F.col("u.__u").isNotNull()
    differs = F.lit(False)
    for c in compare_cols:
        differs = differs | ~F.col(f"c.{c}").eqNullSafe(F.col(f"u.{c}"))

    kept = joined.filter(has_c & (~has_u | ~differs)).select("c.*")
    closed = (
        joined.filter(has_c & has_u & differs)
        .select("c.*")
        .withColumns({valid_to: F.lit(ts).cast("string"),
                      current_flag: F.lit(False)})
    )
    inserted = (
        joined.filter(has_u & (~has_c | differs))
        .select(*[F.col(f"u.{c}") for c in keys + compare_cols])
        .withColumns({
            valid_from: F.lit(ts).cast("string"),
            valid_to: F.lit(None).cast("string"),
            current_flag: F.lit(True),
        })
    )
    out = hist.unionByName(kept).unionByName(closed).unionByName(inserted)
    stats = {
        "closed": closed.count(),
        "inserted": inserted.count(),
        "unchanged": kept.count(),
    }
    tmp = path.rstrip("/") + ".__scd2_tmp"
    out.write.mode("overwrite").parquet(tmp)
    _atomic_swap(path, tmp, back)
    stats["total_rows"] = spark.read.parquet(path).count()
    return stats


# ------------------------------------------------- mergeable rollup store

_ROLLUP_KINDS = {"count", "sum", "min", "max", "hll", "hist"}


def hist_quantile_expr(hist_col: str, q: float, lo: float, hi: float,
                       n_bins: int):
    """Linearly-interpolated quantile estimate from a fixed-bin
    histogram column (the read-time finalizer for ``hist`` rollup
    columns): walk the cumulative counts to the first bin crossing
    ``q * total`` and interpolate inside it.  Error is bounded by one
    bin width — the classic space/accuracy dial of histogram quantiles
    (more bins = tighter estimates, still an exact-merge monoid).
    Returns NULL for an empty histogram.  Pure expression, fully
    composable (no UDF, no collect)."""
    from pyspark.sql import functions as F

    width = (float(hi) - float(lo)) / int(n_bins)
    qf = float(q)
    total = f"aggregate({hist_col}, CAST(0 AS BIGINT), (a, b) -> a + b)"
    walk = (
        f"aggregate({hist_col}, "
        f"named_struct('i', 0, 'cum', CAST(0 AS BIGINT), "
        f"'pos', -1, 'before', CAST(0 AS BIGINT)), "
        f"(s, x) -> named_struct("
        f"'i', s.i + 1, "
        f"'cum', s.cum + x, "
        f"'pos', IF(s.pos >= 0, s.pos, "
        f"IF(CAST(s.cum + x AS DOUBLE) >= {qf!r} * CAST(__ht AS DOUBLE), "
        f"s.i, -1)), "
        f"'before', IF(s.pos >= 0, s.before, "
        f"IF(CAST(s.cum + x AS DOUBLE) >= {qf!r} * CAST(__ht AS DOUBLE), "
        f"s.cum, CAST(0 AS BIGINT)))))"
    )
    # bind total once via a single-element transform (lambda-let idiom)
    return F.expr(
        f"transform(array({total}), __ht -> "
        f"transform(array({walk}), s -> "
        f"IF(__ht = 0 OR s.pos < 0, CAST(NULL AS DOUBLE), "
        f"{float(lo)!r} + {width!r} * (CAST(s.pos AS DOUBLE) + "
        f"({qf!r} * CAST(__ht AS DOUBLE) - CAST(s.before AS DOUBLE)) "
        f"/ CAST(element_at({hist_col}, s.pos + 1) AS DOUBLE))))[0])[0]"
    )


def _rollup_partial(df, keys: list[str], spec: dict, lg_k: int):
    from pyspark.sql import functions as F

    aggs = []
    for alias, entry in spec.items():
        kind, col = entry[0], entry[1]
        if kind not in _ROLLUP_KINDS:
            raise ValueError(f"unknown rollup kind {kind!r} for {alias!r}")
        if kind == "count":
            aggs.append((F.count(col) if col else F.count("*")).alias(alias))
        elif kind == "sum":
            aggs.append(F.sum(col).alias(alias))
        elif kind == "min":
            aggs.append(F.min(col).alias(alias))
        elif kind == "max":
            aggs.append(F.max(col).alias(alias))
        elif kind == "hist":
            lo, hi, nb = float(entry[2]), float(entry[3]), int(entry[4])
            if not (hi > lo and nb >= 1):
                raise ValueError(
                    f"hist {alias!r} needs hi > lo and n_bins >= 1")
            width = (hi - lo) / nb
            idx = F.least(
                F.greatest(
                    F.floor((F.col(col) - F.lit(lo)) / F.lit(width)),
                    F.lit(0),
                ),
                F.lit(nb - 1),
            )
            aggs.append(
                F.array(*[
                    F.sum(
                        F.when(
                            F.col(col).isNotNull() & (idx == i), 1
                        ).otherwise(0)
                    ).cast("bigint")
                    for i in range(nb)
                ]).alias(alias)
            )
        else:
            aggs.append(F.expr(f"hll_sketch_agg({col}, {lg_k})").alias(alias))
    return df.groupBy(*keys).agg(*aggs)


def _rollup_merge(df, keys: list[str], spec: dict):
    from pyspark.sql import functions as F

    aggs = []
    for alias, entry in spec.items():
        kind = entry[0]
        if kind in ("count", "sum"):
            aggs.append(F.sum(alias).alias(alias))
        elif kind == "min":
            aggs.append(F.min(alias).alias(alias))
        elif kind == "max":
            aggs.append(F.max(alias).alias(alias))
        elif kind == "hist":
            nb = int(entry[4])
            # element-wise vector add: histograms form an exact monoid
            aggs.append(F.expr(
                f"aggregate(collect_list({alias}), "
                f"array_repeat(CAST(0 AS BIGINT), {nb}), "
                f"(acc, x) -> zip_with(acc, x, (a, b) -> a + b))"
            ).alias(alias))
        else:
            aggs.append(F.expr(f"hll_union_agg({alias})").alias(alias))
    return df.groupBy(*keys).agg(*aggs)


def update_rollup(
    spark: SparkSession,
    store_path: str,
    new_data,
    keys: list[str],
    spec: dict,
    lg_k: int = 12,
    sidecar: dict | None = None,
) -> dict:
    """Maintain a materialized rollup incrementally with MERGEABLE
    aggregate state — the no-rescan answer to "metrics over 100 TB":
    each batch contributes per-key partials (counts, sums, min/max,
    HLL distinct sketches), which fold into the stored state by pure
    state-merge.  Only ever scans the NEW data plus the store (|keys|
    rows), never the history.

    ``spec`` maps output column -> ``(kind, col)`` with kind in
    {count, sum, min, max, hll, hist} (``("count", None)`` = COUNT(*);
    ``("hist", col, lo, hi, n_bins)`` = fixed-bin histogram, out-of-
    range values clamp to the edge bins).  All kinds form commutative
    monoids, so incremental results equal the full-recompute results —
    exactly for count/sum/min/max AND hist (vector add is exact; only
    the quantile ESTIMATE read off it carries bin-width error); for
    HLL the union covers the same value set but DataSketches' union
    gadget may differ from a direct build by a fraction of the
    sketch's own error bound.  AVG = sum/count at read time — see
    ``read_rollup``, which also derives ``<name>_p50``/``<name>_p90``
    for hist columns.

    Atomic tmp-dir swap; the store is tiny (one row per key), so the
    rewrite is O(|keys|), not O(data).  ``sidecar`` maps underscore-
    prefixed filenames to text written INTO the new store snapshot
    before the swap — metadata that must commit atomically with the
    state (see ``streaming.stream_to_rollup``'s applied-batch marker);
    read it back with ``read_rollup_sidecar``."""
    partial = _rollup_partial(new_data, keys, spec, lg_k)
    back = store_path.rstrip("/") + ".__rollup_old"
    _recover_swap(store_path, back)
    exists = os.path.isdir(store_path) and any(
        f.endswith(".parquet") for _r, _d, fs in os.walk(store_path) for f in fs
    )
    if exists:
        store = spark.read.parquet(store_path)
        merged = _rollup_merge(store.unionByName(partial), keys, spec)
    else:
        merged = partial
    tmp = store_path.rstrip("/") + ".__rollup_tmp"
    merged.write.mode("overwrite").parquet(tmp)
    for name, content in (sidecar or {}).items():
        # underscore-prefixed files are invisible to Spark's parquet
        # reader; they ride the same atomic rename as the data, so
        # marker and state can never disagree (the exactly-once hook)
        if not name.startswith("_"):
            raise ValueError(f"sidecar names must start with '_': {name}")
        with open(os.path.join(tmp, name), "w") as fh:
            fh.write(content)
    if os.path.isdir(store_path):
        _atomic_swap(store_path, tmp, back)
    else:
        os.rename(tmp, store_path)
    return {"store_rows": spark.read.parquet(store_path).count()}


def read_rollup_sidecar(store_path: str, name: str) -> str | None:
    """Read a sidecar file committed with the store snapshot (None if
    absent)."""
    fp = os.path.join(store_path, name)
    if os.path.exists(fp):
        with open(fp) as fh:
            return fh.read()
    return None


def read_rollup(
    spark: SparkSession,
    store_path: str,
    spec: dict,
    avg_pairs: dict | None = None,
):
    """Finalize a rollup store for consumption: HLL state columns gain a
    ``<name>_estimate``; ``avg_pairs`` maps an output name to a
    ``(sum_alias, count_alias)`` pair already in the spec."""
    from pyspark.sql import functions as F

    df = spark.read.parquet(store_path)
    for alias, entry in spec.items():
        kind = entry[0]
        if kind == "hll":
            df = df.withColumn(
                f"{alias}_estimate", F.expr(f"hll_sketch_estimate({alias})")
            )
        elif kind == "hist":
            lo, hi, nb = float(entry[2]), float(entry[3]), int(entry[4])
            for q, name in ((0.5, "p50"), (0.9, "p90")):
                df = df.withColumn(
                    f"{alias}_{name}",
                    hist_quantile_expr(alias, q, lo, hi, nb),
                )
    for name, (s, c) in (avg_pairs or {}).items():
        df = df.withColumn(
            name, F.col(s).cast("double") / F.col(c).cast("double")
        )
    return df


def snapshot_diff(
    old_df: DataFrame,
    new_df: DataFrame,
    key_cols: list[str] | str,
    compare_cols: list[str] | None = None,
    summary: bool = False,
) -> DataFrame:
    """Version-to-version corpus diff: classify every key as ``added``
    (new only), ``removed`` (old only), ``changed`` (present in both,
    any compared column differs under null-safe equality) or
    ``unchanged`` — the governance primitive behind "what did this
    refresh actually do" (pairs with scd2_merge, which APPLIES changes;
    this one AUDITS them).

    One FULL OUTER join on the key (each side shuffles once on the key
    columns; with both snapshots bucketed by key it is co-located and
    shuffle-free).  ``compare_cols`` defaults to every shared non-key
    column.  Row-level output carries the keys + ``diff_status``;
    ``summary=True`` folds to one row per status (count) — the whole
    audit is then two exchanges end to end.
    """
    from pyspark.sql import functions as F

    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    if not keys:
        raise ValueError("key_cols must not be empty")
    if compare_cols is None:
        shared = [c for c in old_df.columns
                  if c in set(new_df.columns) and c not in keys]
        compare_cols = shared
    o = old_df.select(
        *[F.col(k).alias(f"__ok_{k}") for k in keys],
        *[F.col(c).alias(f"__oc_{c}") for c in compare_cols],
        F.lit(1).alias("__in_old"),
    )
    n = new_df.select(
        *[F.col(k).alias(f"__nk_{k}") for k in keys],
        *[F.col(c).alias(f"__nc_{c}") for c in compare_cols],
        F.lit(1).alias("__in_new"),
    )
    cond = None
    for k in keys:
        c = F.col(f"__ok_{k}") == F.col(f"__nk_{k}")
        cond = c if cond is None else (cond & c)
    joined = o.join(n, cond, "full_outer")
    same = F.lit(True)
    for c in compare_cols:
        same = same & F.col(f"__oc_{c}").eqNullSafe(F.col(f"__nc_{c}"))
    status = (
        F.when(F.col("__in_old").isNull(), F.lit("added"))
        .when(F.col("__in_new").isNull(), F.lit("removed"))
        .when(same, F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    out = joined.select(
        *[F.coalesce(F.col(f"__nk_{k}"), F.col(f"__ok_{k}")).alias(k)
          for k in keys],
        status.alias("diff_status"),
    )
    if summary:
        return out.groupBy("diff_status").agg(
            F.expr("CAST(COUNT(*) AS BIGINT)").alias("n"))
    return out
