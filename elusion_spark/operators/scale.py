"""Cluster-scale join/layout utilities.

The reference never confronts skew or co-location (single-node, in-memory
— README.md:16-18 explicitly excludes the 1 TB class).  These helpers are
the patterns a 100 TB deployment of this engine reaches for when AQE's
automatic handling isn't enough.

When to use what
----------------
- ``broadcast`` (builder ``.broadcast()``): dimension fits in executor
  memory (< ~spark.sql.autoBroadcastJoinThreshold · safety).  Zero
  shuffle of the big side.
- AQE skew-join (on by default in our session): handles skew detected at
  RUNTIME by splitting oversized partitions — works when skew is in the
  shuffle sizes.
- ``join_salted``: for *pathological* hot keys known to dwarf AQE's
  split factor (the null-key / default-value / celebrity-entity cases).
  Explicit N-way replication of the small side.
- ``write_bucketed`` / ``bucketed_table``: pre-shuffle ONCE at write
  time; every later equi-join/aggregate on the bucket key skips its
  exchange.  The right layout for fact tables joined repeatedly on the
  same key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def join_salted(
    big: DataFrame,
    small: DataFrame,
    key: str,
    how: str = "inner",
    salt: int = 16,
) -> DataFrame:
    """Skew-resistant equi-join: the big side's hot keys are spread over
    ``salt`` sub-keys (random per row); the small side is replicated
    ``salt`` times with one sub-key each.  Shuffle partitions for a hot
    key shrink by ~salt×; the small side grows salt× (it must be the
    replicable side).  Columns out = big's + small's (key deduplicated),
    same as a plain equi-join.

    Only big-side-preserving modes are allowed: for ``right``/``full``
    joins an unmatched small-side row would surface once per replica
    (``salt`` silent duplicates).  Swap the sides (make the preserved
    side the salted big side) or rely on AQE skew-join for those."""
    allowed = {"inner", "left", "left_outer", "leftouter",
               "left_semi", "leftsemi", "semi",
               "left_anti", "leftanti", "anti", "cross"}
    if how.lower() not in allowed:
        from ..errors import ElusionError

        raise ElusionError(
            f"join_salted does not support how={how!r}: unmatched "
            f"small-side rows would be emitted once per salt replica.",
            "Use inner/left/semi/anti (big side preserved), swap the "
            "sides so the preserved side is the big one, or use AQE "
            "skew-join handling for right/full outer joins.",
        )
    salted_big = big.withColumn(
        "__salt", (F.rand(seed=0) * salt).cast("int")
    )
    salted_small = small.withColumn(
        "__salt", F.explode(F.expr(f"sequence(0, {salt - 1})"))
    )
    out = salted_big.join(salted_small, [key, "__salt"], how)
    return out.drop("__salt")


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_key: str,
    num_buckets: int = 64,
    sort_by: str | None = None,
    path: str | None = None,
) -> None:
    """Persist bucketed-by-key (hive layout via saveAsTable — bucketing
    metadata lives in the catalog, so plain ``.parquet()`` can't carry
    it).  Joins/aggs between tables bucketed the same way on the same
    key run exchange-free (check ``.explain``: no Exchange above the
    scans)."""
    w = df.write.mode("overwrite").format("parquet")
    if path:
        w = w.option("path", path)
    w = w.bucketBy(num_buckets, bucket_key)
    if sort_by:
        w = w.sortBy(sort_by)
    w.saveAsTable(table)


def bucketed_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def repartition_for_join(
    left: DataFrame, right: DataFrame, key: str, partitions: int | None = None
) -> tuple[DataFrame, DataFrame]:
    """Pre-partition both sides identically on the join key so a chain of
    operations reusing that key (join → groupBy(key) → window over key)
    pays ONE exchange instead of one per op."""
    n = partitions or left.sparkSession.sparkContext.defaultParallelism
    return (
        left.repartition(n, F.col(key)),
        right.repartition(n, F.col(key)),
    )


def explain_shuffles(df: DataFrame) -> int:
    """Count SHUFFLE Exchange operators in the physical plan (broadcast
    exchanges move only the small side and don't count against the
    shuffle budget) — the per-query plan-shape check used in tests."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.count("Exchange") - plan.count("BroadcastExchange")


def plan_report(df: DataFrame) -> dict:
    """One-call physical-plan audit — the checklist a 100 TB plan review
    walks: how many shuffles, which joins broadcast vs sort-merge, what
    reached the scans (pushed filters / pruned columns / partition
    filters), and how many whole-stage-codegen spans cover the plan.

    Returns a plain dict so tests can pin individual facets (the
    shuffle-budget and plan-shape gates are special cases of this) and
    humans can eyeball a query before shipping it at scale."""
    import re

    qe = df._jdf.queryExecution()
    plan = qe.executedPlan().toString()
    # AQE wraps the plan before execution, hiding WholeStageCodegen
    # markers; replan a copy with AQE off (fresh QueryExecution via
    # select("*")) purely to count the codegen spans
    sess = df.sparkSession
    prev = sess.conf.get("spark.sql.adaptive.enabled", "true")
    sess.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        formatted = df.select("*")._jdf.queryExecution().explainString(
            sess._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
    finally:
        sess.conf.set("spark.sql.adaptive.enabled", prev)
    scans = []
    for m in re.finditer(r"FileScan \w+ [^\n]*", plan):
        line = m.group(0)
        scan = {}
        pf = re.search(r"PushedFilters: \[([^\]]*)\]", line)
        rs = re.search(r"ReadSchema: ([^,\n]+)", line)
        part = re.search(r"PartitionFilters: \[([^\]]*)\]", line)
        scan["pushed_filters"] = (pf.group(1) or "") if pf else ""
        scan["read_schema"] = rs.group(1).strip() if rs else ""
        scan["partition_filters"] = (part.group(1) or "") if part else ""
        scans.append(scan)
    return {
        "shuffle_exchanges": plan.count("Exchange")
        - plan.count("BroadcastExchange"),
        "broadcast_joins": plan.count("BroadcastHashJoin")
        + plan.count("BroadcastNestedLoopJoin"),
        "sortmerge_joins": plan.count("SortMergeJoin"),
        "codegen_spans": len(
            set(re.findall(r"codegen id : (\d+)", formatted))
        ),
        "scans": scans,
        "has_cartesian": "CartesianProduct" in plan,
        "take_ordered": "TakeOrderedAndProject" in plan,
    }


def join_audit(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    approx_distinct: bool = False,
) -> DataFrame:
    """Pre-join key diagnostics — the "should I salt / broadcast /
    bucket this?" report, one row per side:

    ``side, n_rows, null_keys, distinct_keys, top_key, top_key_cnt,
    top_share, skew_ratio``

    - ``top_share`` = hottest key's fraction of the side's rows — the
      direct trigger for ``join_salted`` (AQE splits shuffle-size skew,
      not a single hot KEY's post-join blowup);
    - ``skew_ratio`` = top_key_cnt · distinct_keys / n_rows (1.0 means
      perfectly uniform keys; ≫1 means salted or filtered treatment);
    - ``null_keys`` never match in an equi-join — a large count means
      filter them BEFORE shuffling, not after.

    Cost: one aggregate + one top-1-key pass per side (the grouped
    count reuses the aggregate's exchange); nothing collects.
    ``approx_distinct=True`` swaps exact COUNT(DISTINCT) for
    approx_count_distinct at corpus scale (the report is advisory —
    ±2% on one column is the right trade there).
    """
    def _side(df: DataFrame, key: str, name: str) -> DataFrame:
        d = (f"approx_count_distinct({key})" if approx_distinct
             else f"COUNT(DISTINCT {key})")
        stats = df.selectExpr(
            f"'{name}' AS side",
            "CAST(COUNT(*) AS BIGINT) AS n_rows",
            f"CAST(SUM(CASE WHEN {key} IS NULL THEN 1 ELSE 0 END) "
            f"AS BIGINT) AS null_keys",
            f"CAST({d} AS BIGINT) AS distinct_keys",
        )
        top = (
            df.filter(F.col(key).isNotNull())
            .groupBy(F.col(key).cast("string").alias("__k"))
            .agg(F.count("*").alias("__c"))
            .orderBy(F.col("__c").desc(), F.col("__k").asc())
            .limit(1)
            .selectExpr(f"'{name}' AS side", "__k AS top_key",
                        "CAST(__c AS BIGINT) AS top_key_cnt")
        )
        return stats.join(top, "side", "left")

    out = _side(left, left_key, "left").unionByName(
        _side(right, right_key, "right"))
    return out.selectExpr(
        "side", "n_rows", "null_keys", "distinct_keys", "top_key",
        "top_key_cnt",
        "CASE WHEN n_rows > 0 THEN ROUND(CAST(top_key_cnt AS DOUBLE) "
        "/ n_rows, 7) END AS top_share",
        "CASE WHEN n_rows > 0 THEN ROUND(CAST(top_key_cnt AS DOUBLE) "
        "* distinct_keys / n_rows, 7) END AS skew_ratio",
    )


# ------------------------------------------------ bloom join prefilter

def build_bloom(
    keys: DataFrame,
    key_col: str,
    expected: int | None = None,
    fpp: float = 0.01,
) -> tuple[list[int], int, int]:
    """Distributed Bloom-filter build over a key column: ``(words, m,
    k)`` where ``words`` is the filter as ``m/64`` int64 words.

    Spark's own runtime row-level filtering injects exactly this
    structure into shuffle joins, but only when IT decides to (sizes,
    join shape) and never across queries.  This explicit build covers
    the cases the optimizer can't see: a key set computed in an earlier
    job/day, a prefilter reused by several downstream queries, or a
    semi join the planner would otherwise shuffle the full fact for.

    Build shape: one distinct pass over the keys, explode to the k hash
    positions (``xxhash64(key, seed)`` — the same hash family the probe
    expression uses, so false NEGATIVES are impossible by construction),
    one ``bit_or`` aggregation keyed by 64-bit word index.  Only the
    aggregated words reach the driver — ``m/64`` longs, e.g. 16 KiB at
    m=2^20 — the same order as a broadcast-join hash table, NOT the key
    set itself.

    Sizing: standard formulas, ``m = n * ln(fpp) / ln(2)^2`` rounded up
    to a power of two (so ``pmod`` stays cheap), ``k = m/n * ln 2``
    clamped to [1, 8].  ``expected=None`` counts the distinct keys
    first (one extra job)."""
    import math

    d = keys.select(F.col(key_col).alias("__k")).where(
        F.col("__k").isNotNull()).distinct()
    n = expected if expected is not None else d.count()
    n = max(1, n)
    m = 1 << max(6, math.ceil(math.log2(-n * math.log(fpp)
                                        / (math.log(2) ** 2))))
    k = min(8, max(1, round(m / n * math.log(2))))
    # hash the STRING form: xxhash64 is type-sensitive (INT 5 and
    # BIGINT 5 hash differently), so raw-column hashing would produce
    # false negatives when fact and key columns differ in width
    pos = [F.pmod(F.xxhash64(F.col("__k").cast("string"), F.lit(i)),
                  F.lit(m)) for i in range(k)]
    words = (
        d.select(F.explode(F.array(*pos)).alias("__p"))
        .groupBy(F.expr("CAST(__p DIV 64 AS INT)").alias("__w"))
        .agg(F.expr("bit_or(shiftleft(CAST(1 AS BIGINT), "
                    "CAST(__p % 64 AS INT)))").alias("__bits"))
        .collect()
    )
    arr = [0] * (m // 64)
    for r in words:
        arr[r["__w"]] = r["__bits"]
    return arr, m, k


def bloom_prefilter(
    fact: DataFrame,
    keys: DataFrame | None,
    fact_key: str,
    keys_key: str | None = None,
    expected: int | None = None,
    fpp: float = 0.01,
    keep_nulls: bool = False,
    prebuilt: tuple[list[int], int, int] | None = None,
) -> DataFrame:
    """Drop fact rows whose key CANNOT be in ``keys`` before any join or
    shuffle touches them.  Guarantee: no false negatives — every fact
    row whose key IS in ``keys`` survives; ~``fpp`` of the non-matching
    rows leak through (a later exact join removes them).

    The 100 TB move this encodes: a semi join against a 10M-row key set
    would shuffle the full fact; this filters at the SCAN (the probe is
    a pure codegen conjunction of k bit tests against a broadcast word
    array — one row, BroadcastNestedLoopJoin, no fact shuffle), so only
    the ~matching slice ever reaches an exchange.  Compose:
    ``bloom_prefilter(fact, keys, "k").join(keys, "k")`` — same result
    as the plain join, shuffle sized by the match rate instead of the
    fact.

    ``prebuilt=(words, m, k)`` (the ``build_bloom`` return) skips the
    build — the reuse pattern the operator exists for: build once,
    prefilter many queries/days of facts.  The build itself costs two
    small jobs over the KEY set, so for a one-shot join it only pays
    when the fact dwarfs the keys; amortized, the probe is a free
    scan-stage conjunction."""
    if prebuilt is not None:
        arr, m, k = prebuilt
    else:
        if keys is None:
            raise ValueError("bloom_prefilter needs keys or prebuilt")
        arr, m, k = build_bloom(keys, keys_key or fact_key, expected, fpp)
    spark = fact.sparkSession
    bloom = spark.createDataFrame([(arr,)], "__bloom: array<bigint>")
    kq = f"`{fact_key}`"
    out = fact.crossJoin(F.broadcast(bloom))
    # hoist the k positions into projection columns so each is hashed
    # once (word index + bit reuse the same value)
    for i in range(k):
        out = out.withColumn(
            f"__bp{i}",
            F.expr(f"pmod(xxhash64(CAST({kq} AS STRING), {i}), {m})"),
        )
    bit_checks = " AND ".join(
        f"(element_at(__bloom, CAST(__bp{i} DIV 64 AS INT) + 1) & "
        f"shiftleft(CAST(1 AS BIGINT), CAST(__bp{i} % 64 AS INT))) != 0"
        for i in range(k)
    )
    null_arm = f"{kq} IS NULL" if keep_nulls else "FALSE"
    cond = f"CASE WHEN {kq} IS NULL THEN {null_arm} ELSE {bit_checks} END"
    return out.filter(F.expr(cond)).drop(
        "__bloom", *[f"__bp{i}" for i in range(k)])
