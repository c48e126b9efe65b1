"""Declarative data-quality constraints (deequ/dbt-test style).

A training-data lake needs machine-checkable contracts at ingest
boundaries: key uniqueness, null budgets, accepted value domains,
numeric ranges, referential integrity against dimensions, freshness.
``check_constraints`` compiles a rule list into ONE conditional-
aggregation pass (plus one small join per referential rule) and returns
a violations report — no per-rule scan, no collect of row data.

100 TB design
-------------
- All row-local rules (not_null / accepted_values / in_range / matches)
  fold into a single partial->final aggregate over one scan: adding a
  rule adds a counter column, not a pass.
- ``unique`` rules need a distinct count — computed in the same pass as
  ``COUNT(*) - COUNT(DISTINCT ...)`` (exact) or via HLL when
  ``approx=True`` (fixed-size state, the 100 TB default).
- ``ref`` (foreign-key) rules anti-join the probe side's DISTINCT keys
  against the dimension — dims broadcast; violation count is the sum of
  orphaned keys' occurrences.
- The report is |rules| rows; the driver never sees data rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _sql_str(v: str) -> str:
    """SQL string literal with embedded quotes doubled — rule values and
    patterns are config-shaped (YAML/JSON) and may contain ``'``."""
    return "'" + str(v).replace("'", "''") + "'"


def _qid(name: str) -> str:
    """Backtick-quoted SQL identifier with embedded backticks doubled —
    column names are config input too (YAML/JSON rules), and a name with
    a space, hyphen, dot, or reserved word would otherwise break the
    single-pass aggregate with a parse error."""
    return "`" + str(name).replace("`", "``") + "`"


def _rule_condition(rule: dict) -> str:
    """SQL predicate that is TRUE when a row VIOLATES the rule."""
    kind, col = rule["kind"], _qid(rule["col"]) if rule.get("col") else None
    if kind == "not_null":
        return f"{col} IS NULL"
    if kind == "accepted_values":
        for v in rule["values"]:
            if v is None or not isinstance(v, (str, int, float, bool)):
                raise ValueError(
                    f"accepted_values entries must be str/number/bool, "
                    f"got {v!r} (use a not_null rule for null policy)"
                )
        vals = ", ".join(
            _sql_str(v) if isinstance(v, str) else repr(v)
            for v in rule["values"]
        )
        return f"{col} IS NULL OR {col} NOT IN ({vals})"
    if kind == "in_range":
        lo, hi = rule.get("min"), rule.get("max")
        parts = [f"{col} IS NULL"]
        if lo is not None:
            parts.append(f"{col} < {lo!r}")
        if hi is not None:
            parts.append(f"{col} > {hi!r}")
        return " OR ".join(parts)
    if kind == "matches":
        return f"{col} IS NULL OR NOT ({col} RLIKE {_sql_str(rule['pattern'])})"
    if kind == "custom":
        return f"NOT ({rule['predicate']})"
    raise ValueError(f"unknown row-local rule kind {kind!r}")


def check_constraints(
    df: DataFrame,
    rules: list[dict],
    approx: bool = False,
) -> DataFrame:
    """Evaluate ``rules`` and return a report DataFrame
    ``(rule, kind, violations, total, pass)``.

    Rule dicts::

        {"name": ..., "kind": "not_null",        "col": c}
        {"name": ..., "kind": "accepted_values", "col": c, "values": [...]}
        {"name": ..., "kind": "in_range",  "col": c, "min": x, "max": y}
        {"name": ..., "kind": "matches",   "col": c, "pattern": regex}
        {"name": ..., "kind": "custom",    "predicate": sql_bool}
        {"name": ..., "kind": "unique",    "col": c}       # or cols=[...]
        {"name": ..., "kind": "ref", "col": c, "dim": DataFrame, "dim_col": d}
        {"name": ..., "kind": "freshness", "col": ts,
         "max_age_days": n, "as_of": dt_or_iso}   # as_of default: utcnow

    Semantics notes (SQL-constraint conventions):

    - ``unique`` ignores rows with a NULL in any key column (SQL UNIQUE
      semantics — pair with ``not_null`` to forbid them);
    - ``ref`` ignores NULL foreign keys (SQL FK semantics — nullable
      FKs are legitimate; again pair with ``not_null`` to forbid);
    - ``freshness`` is DATASET-level (deequ-style): the table passes
      when ``MAX(col) >= as_of - max_age_days`` — one extra column in
      the same single aggregation pass, reported as 0/1 violations;
    - ``approx=True`` swaps the exact distinct count in ``unique``
      rules for an HLL estimate (fixed-size aggregation state) and
      passes when the duplicate estimate is within the sketch's own
      error (~2% of the estimate) — it detects BULK duplication at
      100 TB scale, not individual duplicate rows."""
    spark = df.sparkSession
    row_local = [r for r in rules
                 if r["kind"] not in ("unique", "ref", "freshness")]
    uniques = [r for r in rules if r["kind"] == "unique"]
    refs = [r for r in rules if r["kind"] == "ref"]
    fresh = [r for r in rules if r["kind"] == "freshness"]

    aggs = [F.count(F.lit(1)).alias("__total")]
    for i, r in enumerate(row_local):
        cond = _rule_condition(r)
        aggs.append(
            F.sum(F.expr(f"CASE WHEN {cond} THEN 1 ELSE 0 END")).alias(f"__v{i}")
        )
    for i, r in enumerate(uniques):
        cols = r.get("cols") or [r["col"]]
        tup = ", ".join(_qid(c) for c in cols)
        nonnull = " AND ".join(f"{_qid(c)} IS NOT NULL" for c in cols)
        # duplicates among FULLY NON-NULL key tuples only (SQL UNIQUE
        # semantics): countDistinct drops null tuples, so the minuend
        # must too, or every null-keyed row reads as a duplicate
        nn_count = F.sum(F.expr(f"CASE WHEN {nonnull} THEN 1 ELSE 0 END"))
        if approx:
            aggs.append(F.expr(
                f"named_struct("
                f"'dups', sum(CASE WHEN {nonnull} THEN 1 ELSE 0 END)"
                f" - hll_sketch_estimate(hll_sketch_agg("
                f"CASE WHEN {nonnull} THEN xxhash64({tup}) END)), "
                f"'est', hll_sketch_estimate(hll_sketch_agg("
                f"CASE WHEN {nonnull} THEN xxhash64({tup}) END)))"
            ).alias(f"__u{i}"))
        else:
            aggs.append(
                (nn_count - F.countDistinct(*[df[c] for c in cols])).alias(
                    f"__u{i}"
                )
            )
    for i, r in enumerate(fresh):
        # the whole comparison runs IN-ENGINE: both MAX(col) and the
        # anchor are evaluated in the same session timezone, so a
        # non-UTC spark.sql.session.timeZone cannot skew the result
        # (collecting MAX as a naive driver datetime and comparing it
        # to naive utcnow was off by the tz offset near the boundary)
        import datetime as _dt

        secs = float(r["max_age_days"]) * 86400.0
        ao = r.get("as_of")
        if ao is None:
            anchor = "current_timestamp()"
        else:
            if isinstance(ao, str):
                ao = _dt.datetime.fromisoformat(ao)
            if isinstance(ao, _dt.date) and not isinstance(ao, _dt.datetime):
                ao = _dt.datetime.combine(ao, _dt.time())
            # isoformat keeps a tz offset when as_of is aware; Spark
            # timestamp literals accept it, naive stays session-local
            anchor = f"TIMESTAMP '{ao.isoformat(sep=' ')}'"
        aggs.append(F.expr(
            f"max({_qid(r['col'])}) >= {anchor}"
            f" - make_dt_interval(0, 0, 0, {secs!r})"
        ).alias(f"__f{i}"))
    head = df.agg(*aggs).collect()[0]
    total = int(head["__total"])

    rows = []
    for i, r in enumerate(row_local):
        v = int(head[f"__v{i}"] or 0)
        rows.append((r["name"], r["kind"], v, total, v == 0))
    for i, r in enumerate(uniques):
        if approx:
            cell = head[f"__u{i}"]
            v = max(0, int(cell["dups"] or 0))
            tol = max(2.0, 0.02 * float(cell["est"] or 0))
            rows.append((r["name"], "unique", v, total, v <= tol))
        else:
            v = int(head[f"__u{i}"] or 0)
            rows.append((r["name"], "unique", v, total, v == 0))
    for i, r in enumerate(fresh):
        # dataset-level rule: 1 violation = the whole table is stale;
        # NULL (all-NULL column) compares to NULL in-engine -> stale
        ok = head[f"__f{i}"]
        stale = not bool(ok) if ok is not None else True
        rows.append((r["name"], "freshness", int(stale), total, not stale))
    for r in refs:
        dim_keys = F.broadcast(
            r["dim"].select(r["dim"][r["dim_col"]].alias("__k")).distinct()
        )
        v = (
            df.select(df[r["col"]].alias("__k"))
            .filter(F.col("__k").isNotNull())  # SQL FK: NULL FK is legal
            .join(dim_keys, "__k", "left_anti")
            .count()
        )
        rows.append((r["name"], "ref", int(v), total, v == 0))

    return spark.createDataFrame(
        rows, "rule string, kind string, violations long, total long, pass boolean"
    )


def assert_constraints(df: DataFrame, rules: list[dict], approx: bool = False):
    """Raise ``ValueError`` listing every failed rule (gate form for
    pipelines); returns the report when all pass."""
    report = check_constraints(df, rules, approx=approx)
    failed = [r for r in report.collect() if not r["pass"]]
    if failed:
        detail = "; ".join(
            f"{r['rule']}({r['kind']}): {r['violations']}/{r['total']}"
            for r in failed
        )
        raise ValueError(f"data-quality constraints failed: {detail}")
    return report
