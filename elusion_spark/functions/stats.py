"""Statistics / profiling helpers.

Parity targets: ``display_stats`` (elusion.rs:4682-4760),
``display_null_analysis`` (elusion.rs:4762-4840),
``display_correlation_matrix`` (elusion.rs:4842-4895).

Each returns the DataFrame *and* optionally prints — so they are both a
report surface and a composable operator.  All computed as single
aggregations (one pass over the data, map-side combined)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _numeric_cols(df: DataFrame) -> list[str]:
    return [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, (T.IntegerType, T.LongType, T.FloatType,
                                   T.DoubleType, T.ShortType, T.ByteType,
                                   T.DecimalType))
    ]


def column_stats(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Per-column COUNT / COUNT(col) / AVG / MIN / MAX / STDDEV — the
    reference's stats table, one row per column."""
    cols = columns or df.columns
    parts = []
    for c in cols:
        is_num = c in _numeric_cols(df)
        parts.append(
            df.select(
                F.lit(c).alias("column_name"),
                F.count(F.lit(1)).cast("bigint").alias("total_rows"),
                F.count(c).cast("bigint").alias("non_null_rows"),
                (F.avg(F.col(c).cast("double")) if is_num else F.lit(None).cast("double")).alias("mean"),
                (F.min(F.col(c).cast("double")) if is_num else F.lit(None).cast("double")).alias("min_value"),
                (F.max(F.col(c).cast("double")) if is_num else F.lit(None).cast("double")).alias("max_value"),
                (F.stddev(F.col(c).cast("double")) if is_num else F.lit(None).cast("double")).alias("std_dev"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


def null_analysis(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Per-column null counts & percentage — ONE aggregation pass for all
    columns (the reference issues one query per column; we fold them into
    a single job then unpivot)."""
    cols = columns or df.columns
    aggs = [F.count(F.lit(1)).cast("bigint").alias("__total")]
    for c in cols:
        aggs.append(
            F.sum(F.col(c).isNull().cast("bigint")).cast("bigint").alias(f"__n_{c}")
        )
    row = df.agg(*aggs)
    stack_args = ", ".join(f"'{c}', __n_{c}" for c in cols)
    return row.selectExpr(
        f"stack({len(cols)}, {stack_args}) AS (column_name, null_count)",
        "__total AS total_rows",
    ).select(
        "column_name",
        "total_rows",
        "null_count",
        (F.col("null_count") / F.col("total_rows") * 100.0).alias("null_percentage"),
    )


def correlation_matrix(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Pairwise Pearson correlations of numeric columns, one row per pair
    (elusion.rs:4842-4895) — all pairs in a single aggregation."""
    cols = columns or _numeric_cols(df)
    aggs = []
    for i, a in enumerate(cols):
        for b in cols[i:]:
            aggs.append(F.corr(F.col(a).cast("double"), F.col(b).cast("double"))
                        .alias(f"{a}__{b}"))
    row = df.agg(*aggs).collect()[0]
    pairs = []
    for i, a in enumerate(cols):
        for b in cols[i:]:
            pairs.append((a, b, row[f"{a}__{b}"]))
    spark = df.sparkSession
    return spark.createDataFrame(pairs, ["col_a", "col_b", "correlation"])


def display_stats(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    out = column_stats(df, columns)
    out.show(truncate=False)
    return out


def display_null_analysis(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    out = null_analysis(df, columns)
    out.show(truncate=False)
    return out


def display_correlation_matrix(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    out = correlation_matrix(df, columns)
    out.show(truncate=False)
    return out


def mad_outliers(
    df,
    value_col: str,
    by: list[str] | None = None,
    threshold: float = 3.5,
    keep_all: bool = False,
    approx: bool = False,
    accuracy: int = 10000,
):
    """Robust outlier detection via median absolute deviation: flag rows
    where ``|0.6745 * (x - median) / MAD| > threshold`` (the modified
    z-score of Iglewicz & Hoaglin) — immune to the outliers themselves,
    unlike mean/stddev z-scores.

    Per-group medians (optional ``by`` keys) come from Spark's exact
    interpolated ``percentile``; two grouped aggregations (median, then
    MAD of residuals) + one broadcast-join of the |groups|-row
    stats back onto the rows.  ``approx=True`` is the 100 TB path: it
    swaps both medians for ``approx_percentile`` (bounded-memory
    Greenwald-Khanna sketch, rank error <= 1/``accuracy``) — fixed
    aggregation state instead of the exact percentile's per-group
    value buffer; the flag logic is unchanged and z-scores shift by at
    most the sketch's rank error mapped through the local density.

    Returns the input plus ``robust_z`` (NULL when MAD = 0) and
    ``is_outlier``; ``keep_all=False`` returns only the outliers."""
    from pyspark.sql import functions as F

    keys = by or []
    pct = (
        f"approx_percentile({{0}}, 0.5, {int(accuracy)})" if approx
        else "percentile({0}, 0.5)"
    )
    med = df.groupBy(*keys).agg(
        F.expr(pct.format(value_col)).alias("__med")
    )
    joined = (
        df.join(F.broadcast(med), keys) if keys
        else df.crossJoin(F.broadcast(med))
    )
    mad = joined.groupBy(*keys).agg(
        F.expr(pct.format(f"abs({value_col} - __med)")).alias("__mad")
    )
    full = (
        joined.join(F.broadcast(mad), keys) if keys
        else joined.crossJoin(F.broadcast(mad))
    )
    z = F.when(
        F.col("__mad") > 0,
        F.lit(0.6745) * (F.col(value_col) - F.col("__med")) / F.col("__mad"),
    )
    out = full.withColumn("robust_z", z).withColumn(
        "is_outlier", F.abs(F.col("robust_z")) > threshold
    ).drop("__med", "__mad")
    return out if keep_all else out.filter(F.col("is_outlier"))
