"""Temporal joins Spark lacks as built-ins: as-of and range joins.

Both are compositions of existing DataFrame ops (the preferred strategy
before reaching for applyInPandas — prompt §custom operators):

- ``asof_join``: for each left row, the latest right row with
  ``right.ts <= left.ts`` per key.  Implemented as union-tag → one
  window sort per key → filter: ONE shuffle+sort on (key, ts), no
  row-explosion, no per-key driver loops.  This is the classic
  distributed as-of pattern (beats the naive join+filter+row_number
  which builds |L|x|R| intermediates per key).
- ``range_join``: equi-join on a coarse time bucket (+neighbor buckets)
  followed by the exact range predicate — turns an unbounded theta-join
  into a bounded equi-join whose fan-out is governed by bucket width.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str] | None = None,
    tolerance_seconds: float | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """Left as-of join: every left row gains the columns of the LATEST
    right row whose timestamp is <= the left timestamp, matched per
    ``on`` key.  Rows with no prior right row keep nulls.

    ``tolerance_seconds`` optionally rejects matches older than the
    window (market-data semantics).  Output: all left columns + selected
    right columns (suffixed on collision)."""
    rcols = right_cols or [c for c in right.columns if c not in (on, right_ts)]
    out_names = {
        c: (c + suffix if c in left.columns else c) for c in rcols
    }

    l_tagged = left.withColumn("__is_l", F.lit(1)).withColumn(
        "__ts", F.col(left_ts).cast("timestamp")
    )
    # the raw right_ts column doesn't survive the union — __ts carries it.
    # A value column sharing a name with a left column unions naturally:
    # the carry below only reads it on right-tagged rows.
    r_tagged = (
        right.select(*dict.fromkeys([on, right_ts, *rcols]))
        .withColumn("__is_l", F.lit(0))
        .withColumn("__ts", F.col(right_ts).cast("timestamp"))
    )
    if right_ts not in rcols and right_ts not in left.columns:
        r_tagged = r_tagged.drop(right_ts)
    # align schemas for the union: left lacks right's value cols & vice versa
    cols = list(dict.fromkeys(
        [on, "__ts", "__is_l"]
        + [c for c in left.columns if c != on]
        + rcols
    ))
    for c in cols:
        if c not in r_tagged.columns:
            r_tagged = r_tagged.withColumn(c, F.lit(None))
        if c not in l_tagged.columns:
            l_tagged = l_tagged.withColumn(c, F.lit(None))
    unioned = l_tagged.select(*cols).unionByName(r_tagged.select(*cols))

    # right rows sort BEFORE left rows at the same timestamp so a tick at
    # exactly t matches a probe at t (<= semantics, DuckDB ASOF-compatible)
    w = (
        Window.partitionBy(on)
        .orderBy(F.col("__ts"), F.col("__is_l"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = unioned
    carried = []
    for c in rcols:
        src = F.when(F.col("__is_l") == 0, F.col(c))
        filled = filled.withColumn(
            f"__carr_{c}", F.last(src, ignorenulls=True).over(w)
        )
        carried.append(c)
    filled = filled.withColumn(
        "__match_ts", F.last(
            F.when(F.col("__is_l") == 0, F.col("__ts")), ignorenulls=True
        ).over(w),
    )

    out = filled.filter(F.col("__is_l") == 1)
    if tolerance_seconds is not None:
        in_window = (
            F.col("__match_ts").isNotNull()
            & (F.unix_timestamp("__ts") - F.unix_timestamp("__match_ts")
               <= F.lit(float(tolerance_seconds)))
        )
        for c in carried:
            out = out.withColumn(
                f"__carr_{c}", F.when(in_window, F.col(f"__carr_{c}"))
            )
    proj = [F.col(c) for c in left.columns]
    proj += [F.col(f"__carr_{c}").alias(out_names[c]) for c in carried]
    return out.select(*proj)


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    lower_seconds: float,
    upper_seconds: float,
    on: str | None = None,
    bucket_seconds: float | None = None,
) -> DataFrame:
    """Interval join: pairs where ``right_ts - left_ts ∈ [lower, upper]``
    (seconds), optionally also equi-matched on ``on``.

    Plan shape: each left row explodes into the COARSE time buckets its
    window can reach (⌈range/bucket⌉+1 rows, default bucket = window
    width → ≤2), the right side gets one bucket, the join is a plain
    equi-join on (key?, bucket), and the exact predicate filters.  This
    bounds fan-out where a raw theta-join would go cartesian per key."""
    width = float(upper_seconds - lower_seconds)
    if width < 0:
        raise ValueError("upper_seconds must be >= lower_seconds")
    bucket = float(bucket_seconds or max(width, 1.0))

    l = left.withColumn("__lts", F.unix_timestamp(F.col(left_ts).cast("timestamp")))
    r = right.withColumn("__rts", F.unix_timestamp(F.col(right_ts).cast("timestamp")))
    lo_bucket = F.floor((F.col("__lts") + F.lit(lower_seconds)) / bucket)
    hi_bucket = F.floor((F.col("__lts") + F.lit(upper_seconds)) / bucket)
    l = l.withColumn("__b", F.explode(F.sequence(lo_bucket, hi_bucket)))
    r = r.withColumn("__b", F.floor(F.col("__rts") / bucket))

    keys = ["__b"] if on is None else [on, "__b"]
    joined = l.join(r, keys)
    diff = F.col("__rts") - F.col("__lts")
    return (
        joined.filter((diff >= F.lit(float(lower_seconds)))
                      & (diff <= F.lit(float(upper_seconds))))
        .drop("__b", "__lts", "__rts")
    )


def time_rollup(
    df: DataFrame,
    ts_col: str,
    aggs: dict[str, str],
    resolutions: dict[str, int],
    keys: list[str] | None = None,
) -> DataFrame:
    """Hypertable-style multi-resolution rollup: one pass produces the
    stacked aggregates for every grain (e.g. {"1m": 60, "1h": 3600,
    "1d": 86400}) — output columns: grain, bucket_start, keys…, aggs….

    Plan shape: each row explodes into |resolutions| (grain, bucket)
    tags (narrow), then ONE shuffle groups (grain, bucket, keys) — the
    multi-grain answer costs the same single aggregation a one-grain
    rollup would, instead of |resolutions| scans.  At 100 TB feed it a
    day partition at a time and append to a grain-partitioned table."""
    grain_expr = F.array(*[
        F.struct(
            F.lit(name).alias("grain"),
            (F.floor(F.unix_timestamp(F.col(ts_col).cast("timestamp")) / secs)
             .cast("bigint") * secs).alias("epoch"),
        )
        for name, secs in resolutions.items()
    ])
    tagged = df.withColumn("__g", F.explode(grain_expr))
    grouped = tagged.groupBy(
        F.col("__g.grain").alias("grain"),
        F.timestamp_seconds(F.col("__g.epoch")).alias("bucket_start"),
        *[F.col(k) for k in (keys or [])],
    )
    return grouped.agg(
        *[F.expr(expr).alias(alias) for alias, expr in aggs.items()]
    )


_GRAIN_INTERVAL = {
    "minute": "interval 1 minute",
    "hour": "interval 1 hour",
    "day": "interval 1 day",
    "week": "interval 7 day",
}


def ohlc_resample(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    grain: str = "hour",
    by: list[str] | None = None,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Open/high/low/close/count per time bucket (per optional series
    keys) — the candlestick/downsampling rollup every time-series store
    ships (TimescaleDB ``time_bucket`` + first/last, kdb ``xbar``).

    open/close are ``min_by``/``max_by`` over a ``(ts, tiebreak)``
    struct — ONE aggregation pass, no window, no self-join; pass a
    unique ``tiebreak_col`` to make simultaneous events deterministic.
    Output: ``(*by, bucket_<grain>, open, high, low, close, n)``.  One
    shuffle (the bucket agg), payload never moves twice."""
    if grain not in _GRAIN_INTERVAL:
        raise ValueError(
            f"grain must be one of {sorted(_GRAIN_INTERVAL)}, got {grain!r}")
    keys = list(by or [])
    order = (
        F.struct(F.col(ts_col), F.col(tiebreak_col)) if tiebreak_col
        else F.struct(F.col(ts_col))
    )
    return df.groupBy(
        *keys, F.date_trunc(grain, F.col(ts_col)).alias(f"bucket_{grain}")
    ).agg(
        F.min_by(F.col(value_col), order).alias("open"),
        F.max(value_col).alias("high"),
        F.min(value_col).alias("low"),
        F.max_by(F.col(value_col), order).alias("close"),
        F.count("*").cast("bigint").alias("n"),
    )


def gapfill_resample(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    grain: str = "hour",
    by: list[str] | None = None,
    method: str = "locf",
    round_digits: int = 6,
) -> DataFrame:
    """Dense per-series time grid with gap filling — TimescaleDB's
    ``time_bucket_gapfill`` + ``locf``/``interpolate`` as one operator:
    bucket the series (DECIMAL-folded mean per bucket), generate EVERY
    bucket between each series' first and last, and fill the holes.

    ``method='locf'`` carries the last observed bucket mean forward
    (leading gaps stay NULL); ``method='linear'`` interpolates interior
    gaps between the surrounding observed buckets on the epoch-seconds
    axis (leading/trailing gaps stay NULL).  Output: ``(*by,
    bucket_<grain>, value, is_gap)``.

    Scale shape: the dense grid generates per SERIES via one
    ``sequence()`` explode (len = series span / grain — bounded by
    retention, not row count), the fill is per-series windows over the
    grid, and nothing ever touches the raw-event grain again after the
    first bucket agg.  Shuffles: bucket agg + span agg + one grid join
    + the fill window — all keyed by the series."""
    if grain not in _GRAIN_INTERVAL:
        raise ValueError(
            f"grain must be one of {sorted(_GRAIN_INTERVAL)}, got {grain!r}")
    if method not in ("locf", "linear"):
        raise ValueError(f"method must be locf/linear, got {method!r}")
    keys = list(by or [])
    bcol = f"bucket_{grain}"
    bucketed = df.groupBy(
        *keys, F.date_trunc(grain, F.col(ts_col)).alias(bcol)
    ).agg(
        F.expr(
            f"CAST(SUM(CAST({value_col} AS DECIMAL(38,9))) AS DOUBLE)"
            f" / CAST(COUNT(*) AS DOUBLE)"
        ).alias("__v")
    )
    span = bucketed.groupBy(*keys).agg(
        F.min(bcol).alias("__mn"), F.max(bcol).alias("__mx")
    )
    grid = span.select(
        *keys,
        F.explode(
            F.expr(f"sequence(__mn, __mx, {_GRAIN_INTERVAL[grain]})")
        ).alias(bcol),
    )
    joined = grid.join(bucketed, [*keys, bcol], "left")
    w = Window.partitionBy(*keys).orderBy(bcol) if keys else \
        Window.orderBy(bcol)
    prev = w.rowsBetween(Window.unboundedPreceding, 0)
    nxt = w.rowsBetween(0, Window.unboundedFollowing)
    if method == "locf":
        filled = F.round(
            F.last("__v", ignorenulls=True).over(prev), round_digits
        )
    else:
        ep = f"CAST(unix_timestamp({bcol}) AS DOUBLE)"
        pv = F.last("__v", ignorenulls=True).over(prev)
        pb = F.last(
            F.when(F.col("__v").isNotNull(), F.col(bcol)), ignorenulls=True
        ).over(prev)
        nv = F.first("__v", ignorenulls=True).over(nxt)
        nb = F.first(
            F.when(F.col("__v").isNotNull(), F.col(bcol)), ignorenulls=True
        ).over(nxt)
        frac = (
            (F.expr(ep) - F.expr(f"CAST(unix_timestamp(__pb) AS DOUBLE)"))
            / (F.expr("CAST(unix_timestamp(__nb) AS DOUBLE)")
               - F.expr("CAST(unix_timestamp(__pb) AS DOUBLE)"))
        )
        joined = (
            joined.withColumn("__pv", pv).withColumn("__pb", pb)
            .withColumn("__nv", nv).withColumn("__nb", nb)
        )
        filled = F.round(
            F.when(F.col("__v").isNotNull(), F.col("__v")).otherwise(
                F.col("__pv")
                + (F.col("__nv") - F.col("__pv")) * frac
            ),
            round_digits,
        )
    out = joined.withColumn("value", filled).withColumn(
        "is_gap", F.col("__v").isNull()
    )
    return out.select(*keys, bcol, "value", "is_gap")
