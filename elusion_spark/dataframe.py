"""The central clause-accumulator DataFrame.

Parity target: ``CustomDataFrame`` (/root/reference/src/elusion.rs:157-188)
— a builder whose methods may arrive in ANY order (README.md:24-27); the
query is assembled only at ``.elusion(alias)``.  The reference assembles a
SQL string for DataFusion; we assemble a *lazy PySpark DataFrame chain*
(joins → filter → groupBy/agg → having → windows → project → orderBy →
limit → queued cleaning ops) and let Catalyst plan it.  No eager
materialization: where the reference collects into a MemTable at every
``.elusion()`` (elusion.rs:3844-3943), we stay lazy and expose
``.cache()`` / ``elusion_with_cache`` for explicit reuse.

Scale notes (100 TB stance):
- joins/aggs are plain shuffles on their keys; small dimensions should be
  broadcast — ``.broadcast()`` marks a frame so every join uses a
  broadcast hint, and AQE converts eligible joins automatically anyway.
- nothing here collects to the driver except explicitly driver-sided APIs
  (``display``, ``tail``, pivot's distinct-value discovery — the same
  2-phase design Spark's own ``pivot()`` uses).
- the fill_down / skip_rows family depends on row order; they take an
  explicit order column when one exists, else fall back to
  ``monotonically_increasing_id()`` over a single window partition —
  documented as the only deliberately non-scalable fidelity shims
  (SURVEY §7.4).
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from functools import reduce
from typing import Callable, Iterable, Sequence

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import normalize as N
from .errors import ElusionError, GroupByAllError, InvalidOperation


@dataclass
class _Join:
    other: "CustomDataFrame"
    conditions: list[str]
    how: str


_JOIN_TYPES = {
    "INNER": "inner",
    "LEFT": "left",
    "RIGHT": "right",
    "FULL": "full",
    "LEFT SEMI": "left_semi",
    "LEFT ANTI": "left_anti",
    "RIGHT SEMI": "right_semi",
    "RIGHT ANTI": "right_anti",
    "LEFT MARK": "left_mark",
}


def _as_list(x) -> list:
    if x is None:
        return []
    if isinstance(x, (list, tuple)):
        return list(x)
    return [x]


def _mark_join_equi_keys(
    conditions: list[str], right_alias: str
) -> tuple[list[str], list[str]] | None:
    """Classify a LEFT MARK join's conditions: when EVERY condition is a
    single ``left_expr = right_expr`` equality whose right side is
    qualified by ``right_alias``, return (left_exprs, right_exprs) so the
    join can run as one pass against a distinct key projection; any
    non-equi / OR / ambiguous condition returns None (caller falls back
    to the exact semi ∪ anti emulation)."""
    lefts: list[str] = []
    rights: list[str] = []
    prefix = right_alias.lower() + "."
    for c in conditions:
        low = c.lower()
        if any(op in low for op in ("<=", ">=", "!=", "<>", "<", ">", " or ", " in ")):
            return None
        parts = c.split("=")
        if len(parts) != 2:
            return None
        a, b = parts[0].strip(), parts[1].strip()
        a_right = a.lower().startswith(prefix)
        b_right = b.lower().startswith(prefix)
        if a_right == b_right:  # both or neither on the right side
            return None
        left, right = (b, a) if a_right else (a, b)
        if prefix in left.lower():  # left expr still references the right table
            return None
        lefts.append(left)
        rights.append(right)
    return lefts, rights


class CustomDataFrame:
    """Order-insensitive query builder over a lazy Spark DataFrame."""

    def __init__(self, df: DataFrame, alias: str = "tbl"):
        self.df = df
        self.table_alias = alias
        self._broadcast = False
        self._reset_state()

    # ------------------------------------------------------------------ state

    def _reset_state(self) -> None:
        self.selected: list[str] = []
        self.aggregations: list[str] = []
        self.window_fns: list[str] = []
        self.group_by_cols: list[str] = []
        self.group_by_all_flag = False
        self.group_mode = "groupby"  # groupby | rollup | cube
        self.filters: list[str] = []
        self.havings: list[str] = []
        self.order_bys: list[tuple[str, bool]] = []
        self.limit_n: int | None = None
        self.joins: list[_Join] = []
        self.set_ops: list[tuple[str, object]] = []
        self.ctes: list[str] = []

    def _clone(self) -> "CustomDataFrame":
        c = CustomDataFrame(self.df, self.table_alias)
        c._broadcast = self._broadcast
        c.selected = list(self.selected)
        c.aggregations = list(self.aggregations)
        c.window_fns = list(self.window_fns)
        c.group_by_cols = list(self.group_by_cols)
        c.group_by_all_flag = self.group_by_all_flag
        c.group_mode = self.group_mode
        c.filters = list(self.filters)
        c.havings = list(self.havings)
        c.order_bys = list(self.order_bys)
        c.limit_n = self.limit_n
        c.joins = list(self.joins)
        c.set_ops = list(self.set_ops)
        c.ctes = list(self.ctes)
        return c

    # ------------------------------------------------------------ constructors

    @classmethod
    def from_spark(cls, df: DataFrame, alias: str) -> "CustomDataFrame":
        """Wrap an existing Spark DataFrame (column names normalized the way
        every reference loader does — elusion.rs:6724)."""
        return cls(N.normalize_columns(df), alias)

    @classmethod
    def new(cls, path: str, alias: str, spark: SparkSession | None = None,
            **options) -> "CustomDataFrame":
        """Extension-dispatch loader (elusion.rs:282-318, 6716-6760)."""
        from .sources.loaders import load

        return load(path, alias, spark=spark, **options)

    @classmethod
    def new_with_schema(cls, path: str, file_schema, alias: str,
                        spark: SparkSession | None = None) -> "CustomDataFrame":
        """Load with a predefined schema (elusion.rs:415-452;
        with_schema.rs:90-136).  ``file_schema`` is a ``FileSchema``, a
        ``SchemaBuilder`` (built implicitly), or a plain StructType."""
        from .sources.loaders import load_with_schema

        return load_with_schema(path, file_schema, alias, spark)

    @classmethod
    def empty(cls, spark: SparkSession | None = None) -> "CustomDataFrame":
        """1-row dummy frame used as a scalar-expression host
        (elusion.rs:322-367: ``SELECT 1 AS dummy``)."""
        spark = spark or SparkSession.getActiveSession()
        return cls(spark.range(1).select(F.lit(1).alias("dummy")), "empty")

    # ------------------------------------------------------------ builder api

    def select(self, columns: Sequence[str] | str, *more: str) -> "CustomDataFrame":
        """Add projection items; aggregates found here are routed to the
        aggregation slot like the reference's classifier (elusion.rs:2972-3070).
        Supports ``*`` and ``alias.*`` with duplicate-base-name dedup."""
        c = self._clone()
        for item in _as_list(columns) + list(more):
            body, _ = N.split_alias(item)
            if N.is_window_expression(body):
                c.window_fns.append(item)
            elif N.is_aggregate_expression(body):
                c.aggregations.append(item)
            else:
                c.selected.append(item)
        return c

    select_vec = select

    def agg(self, aggregations: Sequence[str] | str, *more: str) -> "CustomDataFrame":
        c = self._clone()
        items = _as_list(aggregations) + list(more)
        for item in items:
            body, _ = N.split_alias(item)
            if not N.is_aggregate_expression(body):
                raise InvalidOperation(
                    f"agg() item is not an aggregate expression: {item!r}",
                    "Use one of the whitelisted aggregate functions "
                    "(SUM/AVG/MIN/MAX/COUNT/... — SURVEY §2.5).",
                )
        c.aggregations.extend(items)
        return c

    def filter(self, condition: str) -> "CustomDataFrame":
        c = self._clone()
        c.filters.append(condition)
        return c

    def filter_many(self, conditions: Sequence[str]) -> "CustomDataFrame":
        c = self._clone()
        c.filters.extend(_as_list(conditions))
        return c

    def having(self, condition: str) -> "CustomDataFrame":
        c = self._clone()
        c.havings.append(condition)
        return c

    def having_many(self, conditions: Sequence[str]) -> "CustomDataFrame":
        c = self._clone()
        c.havings.extend(_as_list(conditions))
        return c

    def group_by(self, columns: Sequence[str] | str, *more: str) -> "CustomDataFrame":
        c = self._clone()
        c.group_by_cols.extend(_as_list(columns) + list(more))
        return c

    def group_by_all(self) -> "CustomDataFrame":
        """Auto-group on every groupable select item (elusion.rs:999-1046)."""
        c = self._clone()
        c.group_by_all_flag = True
        return c

    def group_by_rollup(self, columns: Sequence[str] | str, *more: str) -> "CustomDataFrame":
        """Hierarchical subtotals (beyond-parity: the reference whitelists
        GROUPING but has no rollup builder — SURVEY §2.5).  Runs as
        Spark's native ROLLUP (one pass, no self-union).

        ``GROUPING(col)`` / ``GROUPING_ID(col, ...)`` provenance refs
        work in ``.agg()``, ``.select()`` and ``.having()`` — the
        builder resolves them through its internal grouping aliases, so
        subtotal/grand-total rows are distinguishable from genuine NULL
        groups exactly as in raw SQL."""
        c = self.group_by(columns, *more)
        c.group_mode = "rollup"
        return c

    def group_by_cube(self, columns: Sequence[str] | str, *more: str) -> "CustomDataFrame":
        """All grouping-set combinations (beyond-parity, native CUBE)."""
        c = self.group_by(columns, *more)
        c.group_mode = "cube"
        return c

    def window(self, window_expr: str) -> "CustomDataFrame":
        """Raw ``EXPR OVER (...) AS alias`` window item (elusion.rs:1161-1165)."""
        c = self._clone()
        c.window_fns.append(window_expr)
        return c

    def string_functions(self, exprs: Sequence[str] | str, *more: str) -> "CustomDataFrame":
        """Computed scalar columns (elusion.rs:1192-1208). On Spark these are
        just projection items; they also join GROUP BY when group_by_all is
        active only if they are plain columns — computed ones stay select-only,
        matching the reference's groupability rules."""
        c = self._clone()
        c.selected.extend(_as_list(exprs) + list(more))
        return c

    datetime_functions = string_functions

    def order_by(self, columns: Sequence[str] | str, dirs: Sequence[str] | str | None = None) -> "CustomDataFrame":
        cols = _as_list(columns)
        ds = _as_list(dirs) if dirs is not None else ["ASC"] * len(cols)
        if len(ds) == 1 and len(cols) > 1:
            ds = ds * len(cols)
        if len(cols) != len(ds):
            raise InvalidOperation(
                "order_by: columns and directions length mismatch",
                "Pass one direction per column, e.g. order_by(['a','b'], ['ASC','DESC']).",
            )
        c = self._clone()
        for col, d in zip(cols, ds):
            du = str(d).strip().upper()
            if du not in ("ASC", "DESC"):
                raise InvalidOperation(
                    f"order_by: invalid direction {d!r}",
                    "Use 'ASC' or 'DESC' (elusion.rs:1103-1152).",
                )
            c.order_bys.append((col, du == "ASC"))
        return c

    def order_by_many(self, pairs: Sequence[tuple[str, str]]) -> "CustomDataFrame":
        return self.order_by([p[0] for p in pairs], [p[1] for p in pairs])

    def limit(self, n: int) -> "CustomDataFrame":
        c = self._clone()
        c.limit_n = int(n)
        return c

    def broadcast(self) -> "CustomDataFrame":
        """Mark this frame as broadcast-preferred in joins (scale knob —
        dims under ~1 GB should take this path on a 1000-executor cluster)."""
        c = self._clone()
        c._broadcast = True
        return c

    # ---------------------------------------------------------------- joins

    def join(self, other: "CustomDataFrame", conditions: Sequence[str] | str,
             join_type: str = "INNER") -> "CustomDataFrame":
        jt = str(join_type).strip().upper()
        if jt not in _JOIN_TYPES:
            raise InvalidOperation(
                f"Unknown join type {join_type!r}",
                f"Supported: {', '.join(sorted(_JOIN_TYPES))} (README.md:2752-2757).",
            )
        c = self._clone()
        c.joins.append(_Join(other, _as_list(conditions), jt))
        return c

    def join_many(self, specs: Sequence[tuple]) -> "CustomDataFrame":
        """N-way chained joins (elusion.rs:936-960): [(df, conds, type), ...]."""
        c = self
        for other, conds, jt in specs:
            c = c.join(other, conds, jt)
        return c

    # -------------------------------------------------- null/cleaning queue

    def fill_null(self, columns: Sequence[str] | None, value) -> "CustomDataFrame":
        """Queued sentinel-aware null fill (elusion.rs:2513-2640): NULL or
        any of {'', 'null', 'NA', 'N/A', 'NONE', '-', '?', 'NaN'} → value."""
        c = self._clone()
        c.set_ops.append(("FILL_NULL", (_as_list(columns) or None, value)))
        return c

    def drop_null(self, columns: Sequence[str] | None = None) -> "CustomDataFrame":
        c = self._clone()
        c.set_ops.append(("DROP_NULL", _as_list(columns) or None))
        return c

    def fill_down(self, columns: Sequence[str], order_by: str | None = None) -> "CustomDataFrame":
        """Forward-fill (elusion.rs:2169-2185, 2369-2470). The reference uses
        file order; pass ``order_by`` for a scalable deterministic ordering,
        else we fall back to ``monotonically_increasing_id()`` in a single
        window partition (fidelity shim — SURVEY §7.4)."""
        c = self._clone()
        c.set_ops.append(("FILL_DOWN", (_as_list(columns), order_by)))
        return c

    def fill_down_now(self, columns: Sequence[str], alias: str = "filled",
                      order_by: str | None = None) -> "CustomDataFrame":
        """Eager forward-fill variant (elusion.rs:2198-2349): applies the
        fill immediately and returns a fresh builder over the result."""
        filled = _fill_down(self._assemble(), _as_list(columns), order_by)
        filled.createOrReplaceTempView(alias)
        return CustomDataFrame(filled, alias)

    def skip_rows(self, n: int) -> "CustomDataFrame":
        c = self._clone()
        c.set_ops.append(("SKIP_ROWS", int(n)))
        return c

    def with_ctes(self, ctes: Sequence[str] | str, *more: str) -> "CustomDataFrame":
        """Raw CTE strings ``"name AS (SELECT …)"`` (elusion.rs:1169-1183).

        Spark-first realization: each CTE becomes a lazy temp view at
        assembly time (after the main and join frames are registered
        under their aliases, so CTE bodies may reference them).  The CTE
        names are then usable from ``execute_raw_sql``, ``from_view``,
        and subsequent loads — the same visibility the reference's
        ``WITH``-prefix gives its final SQL string."""
        c = self._clone()
        c.ctes.extend(_as_list(ctes) + list(more))
        return c

    def with_cte_single(self, cte: str) -> "CustomDataFrame":
        return self.with_ctes([cte])

    # ------------------------------------------------------------- assembly

    def _has_pending(self) -> bool:
        return bool(
            self.selected or self.aggregations or self.window_fns
            or self.group_by_cols or self.group_by_all_flag or self.filters
            or self.havings or self.order_bys or self.limit_n is not None
            or self.joins or self.set_ops or self.ctes
        )

    def _alias_map(self) -> dict[str, DataFrame]:
        m = {self.table_alias: self.df}
        for j in self.joins:
            m[j.other.table_alias] = (
                j.other._assemble() if j.other._has_pending() else j.other.df
            )
        return m

    def _expand_stars(self, item: str) -> list[str]:
        """``*`` / ``alias.*`` expansion with duplicate-base-name removal,
        main-table-first (elusion.rs:3073-3147). Explicit columns never dedup."""
        s = item.strip()
        if s == "*":
            seen: set[str] = set()
            out: list[str] = []
            for alias, df in self._alias_map().items():
                for col in df.columns:
                    if col in seen:
                        continue
                    seen.add(col)
                    out.append(f"{alias}.{col}" if self.joins else col)
            return out
        m = s.split(".")
        if len(m) == 2 and m[1] == "*":
            df = self._alias_map().get(m[0])
            if df is None:
                raise InvalidOperation(
                    f"Unknown table alias in {s!r}",
                    f"Known aliases: {', '.join(self._alias_map())}.",
                )
            return [f"{m[0]}.{c}" for c in df.columns]
        return [s]

    def _assemble(self) -> DataFrame:
        if self.ctes:
            spark = self.df.sparkSession
            for alias, df in self._alias_map().items():
                df.createOrReplaceTempView(alias)
            for cte in self.ctes:
                name, body = N.split_cte(cte)
                spark.sql(body).createOrReplaceTempView(name)
        cur = self.df.alias(self.table_alias)

        # joins — broadcast hints propagate from the marked side.  A join
        # side carrying its own pending clauses (filters, selects, …) is
        # assembled first: the reference silently ignores un-elusion()ed
        # state on the other frame (elusion.rs:4483-4512 registers the raw
        # df) — a footgun we fix rather than replicate.
        for j in self.joins:
            cond = " AND ".join(
                f"({N.normalize_expression(x)})" for x in j.conditions
            )
            how = _JOIN_TYPES[j.how]
            right_df = (
                j.other._assemble() if j.other._has_pending() else j.other.df
            )
            right = right_df.alias(j.other.table_alias)
            if j.other._broadcast:
                right = F.broadcast(right)
            if how == "right_semi":
                cur = right.join(cur, F.expr(cond), "left_semi")
            elif how == "right_anti":
                cur = right.join(cur, F.expr(cond), "left_anti")
            elif how == "left_mark":
                # Pure-equality conditions take a single-pass plan: left
                # join against the DISTINCT right-side key projection plus
                # a constant flag, then coalesce(mark, false).  Distinct
                # keys guarantee at most one match per left row, so no
                # duplication — and the (potentially huge) right side is
                # scanned once, not twice.  Non-equi / OR conditions fall
                # back to the exact semi ∪ anti emulation.
                keys = _mark_join_equi_keys(j.conditions, j.other.table_alias)
                if keys is not None:
                    lefts, rights = keys
                    rk = (
                        right_df.alias(j.other.table_alias)
                        .select(*[
                            F.expr(N.normalize_expression(r)).alias(f"__mk{i}")
                            for i, r in enumerate(rights)
                        ])
                        .distinct()
                        .withColumn("mark", F.lit(True))
                    )
                    if j.other._broadcast:
                        rk = F.broadcast(rk)
                    jcond = None
                    for i, l in enumerate(lefts):
                        c_i = (
                            F.expr(N.normalize_expression(l))
                            == F.col(f"__mk{i}")
                        )
                        jcond = c_i if jcond is None else (jcond & c_i)
                    cur = (
                        cur.join(rk, jcond, "left")
                        .withColumn("mark", F.coalesce("mark", F.lit(False)))
                        .drop(*[f"__mk{i}" for i in range(len(lefts))])
                    )
                else:
                    # exact emulation: semi ∪ anti with a boolean mark
                    matched = cur.join(right, F.expr(cond), "left_semi").withColumn(
                        "mark", F.lit(True)
                    )
                    unmatched = cur.join(right, F.expr(cond), "left_anti").withColumn(
                        "mark", F.lit(False)
                    )
                    cur = matched.unionAll(unmatched)
            else:
                cur = cur.join(right, F.expr(cond), how)

        # WHERE
        if self.filters:
            cond = " AND ".join(
                f"({N.normalize_expression(x)})" for x in self.filters
            )
            cur = cur.filter(F.expr(cond))

        # classify select items.  Star expansions dedup by BASE column
        # name across ALL stars in the list, first occurrence wins
        # (main table → join order); explicit columns never dedup
        # (README.md:1899-2089).
        sel_items: list[tuple[str, str | None]] = []
        agg_items: list[tuple[str, str]] = []
        star_bases_seen: set[str] = set()
        for raw in self.selected:
            is_star = raw.strip() == "*" or raw.strip().endswith(".*")
            for expanded in self._expand_stars(raw):
                body, al = N.split_alias(expanded)
                if is_star:
                    base = body.split(".")[-1].strip().lower()
                    if base in star_bases_seen:
                        continue
                    star_bases_seen.add(base)
                body = N.normalize_expression(body)
                sel_items.append((body, al))
        for raw in self.aggregations:
            body, al = N.split_alias(raw)
            body = N.normalize_expression(body)
            agg_items.append((body, al or N.default_alias(body)))

        win_items: list[tuple[str, str]] = []
        for raw in self.window_fns:
            body, al = N.split_alias(raw)
            body = N.normalize_expression(body)
            win_items.append((body, al or N.default_alias(body)))

        grouped = bool(agg_items) and (
            bool(self.group_by_cols) or self.group_by_all_flag or bool(sel_items)
        )
        has_agg = bool(agg_items)

        if has_agg:
            if self.group_by_all_flag:
                group_exprs = [b for b, _ in sel_items if N.is_simple_column(b)]
                bad = [b for b, _ in sel_items if not N.is_simple_column(b)]
                if bad and not group_exprs:
                    raise GroupByAllError(
                        f"group_by_all(): no groupable select columns; computed "
                        f"expressions found: {bad}",
                        "Add plain columns to .select() or use .group_by() with "
                        "explicit expressions (elusion.rs:999-1046).",
                    )
            else:
                group_exprs = [
                    N.normalize_expression(g) for g in self.group_by_cols
                ]

            # pre-flight (elusion.rs:3951-4035): under group_by_all every
            # window's PARTITION/ORDER columns must survive the grouping —
            # i.e. be a selected (grouped) column or an agg alias.  Spark
            # would fail analysis anyway; this raises the reference's
            # friendlier error with a concrete fix.
            if self.group_by_all_flag and win_items:
                visible = {N.base_name(b) for b, _ in sel_items}
                visible |= {al for _, al in sel_items if al}
                visible |= {a for _, a in agg_items}
                for body, _al in win_items:
                    for dep in N.extract_over_columns(body):
                        bare = dep.split(".")[-1]
                        if bare not in visible and dep not in visible:
                            raise GroupByAllError(
                                f"group_by_all() + window function issue: the "
                                f"window expression needs column {dep!r} but it "
                                f"is not in .select([...])",
                                f"Add {dep!r} to .select() so it is grouped, or "
                                f"use manual .group_by([...]) with the keys you "
                                f"want (elusion.rs:3995-4017).",
                            )

            gcols = [F.expr(g).alias(f"__g{i}") for i, g in enumerate(group_exprs)]
            canon_group = {
                N.canonical(g): f"__g{i}" for i, g in enumerate(group_exprs)
            }

            # GROUPING()/GROUPING_ID() provenance refs (reference
            # whitelists GROUPING — normalize.rs:43-53): the builder
            # aliases grouping columns internally, so user refs like
            # GROUPING(region) must map onto the __g{i} aliases AND the
            # aliases must exist as real child columns for the analyzer
            # to match them against the rollup/cube grouping exprs.
            grp_rewrite = None
            grp_hit: list[bool] = []
            if self.group_mode in ("rollup", "cube"):
                _grp_pat = re.compile(r"\bgrouping(_id)?\s*\(", re.I)

                def _resolve(arg: str) -> str:
                    key = N.canonical(N.normalize_expression(arg))
                    alias = canon_group.get(key)
                    if alias is None:
                        raise GroupByAllError(
                            f"GROUPING() argument {arg!r} is not a "
                            f"{self.group_mode} grouping column",
                            f"Arguments to GROUPING/GROUPING_ID must be "
                            f"among the group_by_{self.group_mode}() "
                            f"columns: {self.group_by_cols}.",
                        )
                    grp_hit.append(True)
                    return alias

                def grp_rewrite(body: str) -> str:
                    if not _grp_pat.search(body):
                        return body
                    return N.rewrite_grouping_refs(body, _resolve)

                agg_items = [(grp_rewrite(b), a) for b, a in agg_items]
                # GROUPING in .select() is legal SQL; it is an aggregate,
                # so such items move to the aggregation list
                moved = [
                    (grp_rewrite(b), al or N.default_alias(b))
                    for b, al in sel_items if _grp_pat.search(b)
                ]
                if moved:
                    sel_items = [
                        (b, al) for b, al in sel_items
                        if not _grp_pat.search(b)
                    ]
                    agg_items = agg_items + moved

            # HAVING: alias refs pass through; raw agg calls become hidden aggs
            hidden: list[tuple[str, str]] = []
            havings: list[str] = []
            known_aggs = {N.canonical(b): a for b, a in agg_items}
            for h in self.havings:
                h2 = N.normalize_expression(h)
                if grp_rewrite is not None:
                    h2 = grp_rewrite(h2)
                # substitute by recorded span, right-to-left, so literals
                # containing agg-call text survive and overlapping call
                # texts can't corrupt earlier replacements (ADVICE r1)
                for start, end, call in reversed(N.extract_agg_call_spans(h2)):
                    key = N.canonical(call)
                    if key in known_aggs:
                        alias = known_aggs[key]
                    else:
                        alias = f"__h{len(hidden)}"
                        hidden.append((call, alias))
                        known_aggs[key] = alias
                    h2 = h2[:start] + alias + h2[end:]
                havings.append(h2)

            aggcols = [F.expr(b).alias(a) for b, a in agg_items]
            aggcols += [F.expr(b).alias(a) for b, a in hidden]
            if grp_hit:
                # materialize the grouping aliases as child columns so
                # GROUPING(__g{i}) resolves against the grouping exprs
                cur = cur.select(
                    "*",
                    *[F.expr(g).alias(f"__g{i}")
                      for i, g in enumerate(group_exprs)],
                )
                gcols = [F.col(f"__g{i}") for i in range(len(group_exprs))]
            if gcols:
                grouped_data = {
                    "groupby": cur.groupBy,
                    "rollup": cur.rollup,
                    "cube": cur.cube,
                }[self.group_mode](*gcols)
                cur = grouped_data.agg(*aggcols)
            else:
                cur = cur.agg(*aggcols)

            if havings:
                cur = cur.filter(F.expr(" AND ".join(f"({h})" for h in havings)))

            # windows evaluate over the grouped result (SQL semantics)
            if win_items:
                cur = cur.selectExpr("*", *[f"{b} AS {a}" for b, a in win_items])

            # final projection: aggregations first, then selected columns,
            # then window columns (build_select_parts — elusion.rs:3634-3657)
            proj: list[Column] = [F.col(a) for _, a in agg_items]
            for b, al in sel_items:
                key = N.canonical(b)
                if key in canon_group:
                    proj.append(F.col(canon_group[key]).alias(al or N.base_name(b)))
                else:
                    raise GroupByAllError(
                        f"Selected column {b!r} is neither aggregated nor in "
                        f"GROUP BY",
                        "Add it to .group_by() / make it groupable, or wrap it "
                        "in an aggregate (elusion.rs:3951-4480 validation).",
                    )
            proj += [F.col(a) for _, a in win_items]
            cur = cur.select(*proj)
        else:
            # windows first so they can reference unselected base columns
            if win_items:
                cur = cur.selectExpr("*", *[f"{b} AS {a}" for b, a in win_items])
            if sel_items:
                proj = [
                    F.expr(b).alias(al) if al else F.expr(b)
                    for b, al in sel_items
                ]
                proj += [F.col(a) for _, a in win_items]
                cur = cur.select(*proj)

        # ORDER BY / LIMIT
        if self.order_bys:
            cols = [
                F.expr(N.normalize_expression(e)).asc() if asc
                else F.expr(N.normalize_expression(e)).desc()
                for e, asc in self.order_bys
            ]
            cur = cur.orderBy(*cols)
        if self.limit_n is not None:
            cur = cur.limit(self.limit_n)

        # queued cleaning ops, in arrival order (elusion.rs:3613-3616)
        for tag, payload in self.set_ops:
            if tag == "FILL_NULL":
                cols, value = payload
                cur = _fill_null(cur, cols, value)
            elif tag == "DROP_NULL":
                cur = _drop_null(cur, payload)
            elif tag == "FILL_DOWN":
                cols, order_col = payload
                cur = _fill_down(cur, cols, order_col)
            elif tag == "SKIP_ROWS":
                cur = cur.offset(int(payload))
        return cur

    # ------------------------------------------------------------- execution

    def elusion(self, alias: str = "result") -> "CustomDataFrame":
        """Assemble pending clauses into a lazy DataFrame, register it as a
        temp view under ``alias`` and return a fresh builder over it.

        The reference eagerly materializes here (elusion.rs:3844-3943); we
        keep Catalyst lazy — analysis errors still surface at this boundary
        because assembly resolves the full plan."""
        out = self._assemble()
        out.createOrReplaceTempView(alias)
        return CustomDataFrame(out, alias)

    def elusion_with_cache(self, alias: str = "result") -> "CustomDataFrame":
        """Materialization-preserving variant (cashandview.rs:36-100): the
        assembled result is Spark-cached for reuse across actions."""
        from .cache import cached_elusion

        return cached_elusion(self, alias)

    def display(self, n: int = 20, truncate: bool = False) -> None:
        self._assemble().show(n, truncate=truncate)

    show = display

    def collect(self):
        return self._assemble().collect()

    def to_spark(self) -> DataFrame:
        return self._assemble()

    def cache(self) -> "CustomDataFrame":
        return CustomDataFrame(self._assemble().cache(), self.table_alias)

    def df_schema(self) -> list[tuple[str, str]]:
        """Name/type listing (elusion.rs:4538-4564)."""
        return [(f.name, f.dataType.simpleString()) for f in self._assemble().schema.fields]

    def display_query(self) -> str:
        """The assembled plan, analogous to the reference's generated SQL
        (elusion.rs:4567-4671)."""
        plan = self._assemble()._jdf.queryExecution().toString()
        print(plan)
        return plan

    def display_query_with_info(self) -> dict:
        """Plan + clause/shape analysis (elusion.rs:4597-4671's
        ``display_query_with_info``): prints the pending-clause summary,
        physical plan, and shuffle/scan counts; returns them as a dict."""
        info = {
            "table": self.table_alias,
            "selected": list(self.selected),
            "aggregations": list(self.aggregations),
            "group_by": list(self.group_by_cols) or (
                "ALL" if self.group_by_all_flag else []
            ),
            "filters": list(self.filters),
            "havings": list(self.havings),
            "joins": [
                (j.other.table_alias, j.how, list(j.conditions)) for j in self.joins
            ],
            "windows": list(self.window_fns),
            "order_by": list(self.order_bys),
            "limit": self.limit_n,
            "set_ops": [tag for tag, _ in self.set_ops],
            "ctes": list(self.ctes),
        }
        plan = self._assemble()._jdf.queryExecution().executedPlan().toString()
        info["shuffle_exchanges"] = plan.count("Exchange") - plan.count(
            "BroadcastExchange"
        )
        info["broadcast_joins"] = plan.count("BroadcastHashJoin")
        info["scans"] = plan.count("FileScan") + plan.count("Scan parquet")
        for k, v in info.items():
            if v:
                print(f"{k}: {v}")
        print(plan)
        info["plan"] = plan
        return info

    def elusion_streaming(self, alias: str = "stream", batch_rows: int = 1000,
                          display: bool = True, limit_batches: int | None = None):
        """The reference's incremental batch iteration (elusion.rs:
        8041-8206): stream the result through the driver in bounded
        batches via ``toLocalIterator`` (one partition in memory at a
        time), printing progress.  Yields row batches; for incremental
        FILE writing use ``sinks.writers.stream_write`` or real
        Structured Streaming (``elusion_spark.streaming``)."""
        df = self._assemble()
        batch, n_rows, n_batches = [], 0, 0
        for row in df.toLocalIterator(prefetchPartitions=True):
            batch.append(row)
            if len(batch) >= batch_rows:
                n_batches += 1
                n_rows += len(batch)
                if display:
                    print(f"[{alias}] batch {n_batches}: {n_rows} rows total")
                yield batch
                batch = []
                if limit_batches and n_batches >= limit_batches:
                    return
        if batch:
            n_batches += 1
            n_rows += len(batch)
            if display:
                print(f"[{alias}] batch {n_batches}: {n_rows} rows total")
            yield batch

    def explain(self, mode: str = "formatted") -> None:
        self._assemble().explain(mode)

    # ------------------------------------------------------------ set ops

    def _binary(self, other: "CustomDataFrame", fn: Callable[[DataFrame, DataFrame], DataFrame],
                alias: str) -> "CustomDataFrame":
        out = fn(self._assemble(), other._assemble())
        return CustomDataFrame(out, alias)

    def union(self, other: "CustomDataFrame", alias: str = "union_result") -> "CustomDataFrame":
        """Positional UNION DISTINCT (elusion.rs:1427-1497: ``SELECT DISTINCT *
        … UNION``). Positional on purpose — NOT unionByName."""
        return self._binary(other, lambda a, b: a.union(b).distinct(), alias)

    def union_many(self, others: Sequence["CustomDataFrame"], alias: str = "union_result") -> "CustomDataFrame":
        dfs = [self._assemble()] + [o._assemble() for o in others]
        return CustomDataFrame(reduce(DataFrame.union, dfs).distinct(), alias)

    def union_all(self, other: "CustomDataFrame", alias: str = "union_all_result") -> "CustomDataFrame":
        return self._binary(other, DataFrame.union, alias)

    def union_all_many(self, others: Sequence["CustomDataFrame"], alias: str = "union_all_result") -> "CustomDataFrame":
        dfs = [self._assemble()] + [o._assemble() for o in others]
        return CustomDataFrame(reduce(DataFrame.union, dfs), alias)

    def append(self, other: "CustomDataFrame", alias: str = "appended") -> "CustomDataFrame":
        """Physical concat, no dedup (elusion.rs:1254-1425) ≡ UNION ALL."""
        return self.union_all(other, alias)

    def append_many(self, others: Sequence["CustomDataFrame"], alias: str = "appended") -> "CustomDataFrame":
        return self.union_all_many(others, alias)

    def except_(self, other: "CustomDataFrame", alias: str = "except_result") -> "CustomDataFrame":
        """SQL EXCEPT = distinct semantics (elusion.rs:1739-1809)."""
        return self._binary(other, DataFrame.subtract, alias)

    def intersect(self, other: "CustomDataFrame", alias: str = "intersect_result") -> "CustomDataFrame":
        return self._binary(other, DataFrame.intersect, alias)

    @staticmethod
    def _bag_setop(fn: Callable[[DataFrame, DataFrame], DataFrame]):
        """Run a bag set op with DUPLICATE-NAMED columns tolerated:
        Spark's RewriteExceptAll/IntersectAll optimizer rule generates
        an invalid plan when a side projects the same column twice
        (PLAN_VALIDATION_FAILED_RULE_IN_BATCH, found by the set-op
        fuzzer) — positionally rename to unique temporaries, run the op,
        rename back."""
        def run(a: DataFrame, b: DataFrame) -> DataFrame:
            names = a.columns
            if len(set(names)) == len(names):
                return fn(a, b)
            tmp = [f"__c{i}" for i in range(len(names))]
            out = fn(a.toDF(*tmp), b.toDF(*tmp))
            return out.toDF(*names)
        return run

    def except_all(self, other: "CustomDataFrame", alias: str = "except_all_result") -> "CustomDataFrame":
        """SQL EXCEPT ALL — bag semantics: each row survives
        ``max(count_left - count_right, 0)`` times (beyond parity; the
        reference exposes only the DISTINCT set ops)."""
        return self._binary(other, self._bag_setop(DataFrame.exceptAll), alias)

    def intersect_all(self, other: "CustomDataFrame", alias: str = "intersect_all_result") -> "CustomDataFrame":
        """SQL INTERSECT ALL — bag semantics: each row survives
        ``min(count_left, count_right)`` times."""
        return self._binary(other, self._bag_setop(DataFrame.intersectAll), alias)

    # --------------------------------------------------------- eager helpers

    def drop_duplicates(self, alias: str = "dedup") -> "CustomDataFrame":
        """Full-row dedup (elusion.rs:3348-3540)."""
        return CustomDataFrame(self._assemble().dropDuplicates(), alias)

    def drop_duplicates_by_column(self, columns: Sequence[str], alias: str = "dedup",
                                  order_by: str | None = None) -> "CustomDataFrame":
        """Keep one row per key. The reference keeps an arbitrary row
        (``ROW_NUMBER() … ORDER BY 1`` — elusion.rs:3544-3563); pass
        ``order_by`` for a deterministic keep-first-by-ordering that stays
        correct under parallel execution."""
        df = self._assemble()
        cols = _as_list(columns)
        if order_by:
            w = Window.partitionBy(*cols).orderBy(F.expr(order_by))
            df = (
                df.withColumn("__rn", F.row_number().over(w))
                .filter(F.col("__rn") == 1)
                .drop("__rn")
            )
        else:
            df = df.dropDuplicates(cols)
        return CustomDataFrame(df, alias)

    def head(self, n: int = 5, alias: str = "head") -> "CustomDataFrame":
        return CustomDataFrame(self._assemble().limit(n), alias)

    def tail(self, n: int = 5, alias: str = "tail") -> "CustomDataFrame":
        """Last n rows in current order (elusion.rs:2818-2890 does
        COUNT(*) then LIMIT/OFFSET — same 2-phase approach)."""
        df = self._assemble()
        total = df.count()
        return CustomDataFrame(df.offset(max(total - n, 0)), alias)

    def peek(self, n: int = 5) -> None:
        self._assemble().show(n, truncate=False)

    # ---------------------------------------------------------- json columns

    def json(self, exprs: Sequence[str] | str, *more: str) -> "CustomDataFrame":
        """Extract scalar keys from a flat JSON string column.

        Reference syntax ``"col.'$Key' AS alias"`` (elusion.rs:3150-3221,
        implemented there via POSITION/SUBSTRING string surgery). Spark-first:
        ``get_json_object`` — a real JSON parser, JVM-side, and identical
        observable output."""
        c = self._clone()
        for e in _as_list(exprs) + list(more):
            body, al = N.split_alias(e)
            m = re.match(r"^(\w+(?:\.\w+)?)\s*\.\s*'\$(\w+)'$", body.strip())
            if not m:
                raise InvalidOperation(
                    f"json(): cannot parse {e!r}",
                    "Use \"column.'$Key' AS alias\" (README.md:2806-2841).",
                )
            col, key = m.groups()
            c.selected.append(
                f"get_json_object({col}, '$.{key}') AS {al or key.lower()}"
            )
        return c

    def json_array(self, exprs: Sequence[str] | str, *more: str) -> "CustomDataFrame":
        """Extract a field from a JSON array-of-objects column by matching
        another field: ``"col.'$Value:Id=Date' AS alias"``
        (elusion.rs:3224-3323 does this with regexp_match; we parse the
        array once with ``from_json`` and filter it — same output)."""
        c = self._clone()
        for e in _as_list(exprs) + list(more):
            body, al = N.split_alias(e)
            m = re.match(
                r"^(\w+(?:\.\w+)?)\s*\.\s*'\$(\w+):(\w+)=([^']+)'$", body.strip()
            )
            if not m:
                raise InvalidOperation(
                    f"json_array(): cannot parse {e!r}",
                    "Use \"column.'$Field:MatchField=MatchValue' AS alias\" "
                    "(README.md:2852-2891).",
                )
            col, want, mf, mv = m.groups()
            expr = (
                f"filter(from_json({col}, 'array<map<string,string>>'), "
                f"x -> x['{mf}'] = '{mv}')[0]['{want}']"
            )
            c.selected.append(f"{expr} AS {al or want.lower()}")
        return c

    # ------------------------------------------------------------- pivoting

    def pivot(self, row_keys: Sequence[str], pivot_col: str, value_col: str,
              agg_func: str = "SUM", alias: str = "pivoted") -> "CustomDataFrame":
        """2-phase pivot (elusion.rs:1883-2065): discover distinct pivot
        values (driver-side — same as Spark's own pivot without a value
        list), then ``groupBy(keys).pivot(col, values).agg``.  Output
        columns are named ``{pivot_col}_{value}`` with COALESCE(...,0)
        (elusion.rs:2015-2020)."""
        df = self._assemble()
        vals = [
            r[0]
            for r in df.select(pivot_col).distinct().orderBy(pivot_col).collect()
            if r[0] is not None
        ]
        p = (
            df.groupBy(*_as_list(row_keys))
            .pivot(pivot_col, vals)
            .agg(F.expr(f"{agg_func}({value_col})"))
        )
        for v in vals:
            p = p.withColumnRenamed(str(v), f"{pivot_col}_{v}")
        value_cols = [f"{pivot_col}_{v}" for v in vals]
        p = p.fillna(0, subset=value_cols)
        return CustomDataFrame(p, alias)

    def unpivot(self, id_columns: Sequence[str], value_columns: Sequence[str],
                name_column: str = "name", value_column: str = "value",
                alias: str = "unpivoted") -> "CustomDataFrame":
        """UNION-ALL-per-column semantics (elusion.rs:2068-2166) via Spark's
        native ``unpivot`` (one pass, no N× scan)."""
        df = self._assemble()
        vals = _as_list(value_columns)
        # unify value types the way implicit UNION ALL casting would
        types = {df.schema[c].dataType.simpleString() for c in vals}
        if len(types) > 1:
            num = {"int", "bigint", "smallint", "tinyint", "float", "double", "decimal"}
            target = "double" if all(
                any(t.startswith(x) for x in num) for t in types
            ) else "string"
            df = df.withColumns({c: F.col(c).cast(target) for c in vals})
        out = df.unpivot(_as_list(id_columns), vals, name_column, value_column)
        return CustomDataFrame(out, alias)

    # ------------------------------------------------------------- writers

    def write_to_parquet(self, mode: str, path: str, **opts) -> None:
        from .sinks.writers import write_to_parquet

        write_to_parquet(self._assemble(), mode, path, **opts)

    def write_to_csv(self, mode: str, path: str, options=None) -> None:
        from .sinks.writers import write_to_csv

        write_to_csv(self._assemble(), mode, path, options)

    def write_to_json(self, path: str, pretty: bool = False) -> None:
        from .sinks.writers import write_to_json

        write_to_json(self._assemble(), path, pretty)

    def write_to_delta_table(self, mode: str, path: str,
                             partition_by: Sequence[str] | None = None) -> None:
        from .sinks.writers import write_to_delta

        write_to_delta(self._assemble(), mode, path, partition_by)

    def write_to_excel(self, path: str, sheet: str = "Sheet1") -> None:
        from .sinks.writers import write_to_excel

        write_to_excel(self._assemble(), path, sheet)

    # ------------- reference-named convenience surface (README parity) --
    # Every method a user calls in the reference README exists under the
    # same name here, delegating to the module-level implementations.

    def show_head(self, n: int = 5) -> None:
        """README:1585 — display the first n rows."""
        self.display(n)

    def show_tail(self, n: int = 5) -> None:
        self.tail(n).display(n)

    def display_stats(self, columns: Sequence[str] | None = None):
        from .functions.stats import display_stats

        return display_stats(self._assemble(), list(columns or []) or None)

    def display_null_analysis(self, columns: Sequence[str] | None = None):
        from .functions.stats import display_null_analysis

        return display_null_analysis(self._assemble(),
                                     list(columns or []) or None)

    def display_correlation_matrix(self,
                                   columns: Sequence[str] | None = None):
        from .functions.stats import display_correlation_matrix

        return display_correlation_matrix(self._assemble(),
                                          list(columns or []) or None)

    # plot builders (README:3460-3560 shapes; show_markers accepted for
    # line/time-series parity — the plotly-JSON payload renders markers
    # by default, so the flag only needs to exist, not to branch)
    def plot_line(self, x, y, show_markers: bool = True, title=None):
        from .functions.dashboard import plot_line

        return plot_line(self._assemble(), x, y, title or "Line")

    def plot_time_series(self, x, y, show_markers: bool = True, title=None):
        from .functions.dashboard import plot_time_series

        return plot_time_series(self._assemble(), x, y,
                                title or "Time series")

    def plot_bar(self, x, y, title=None):
        from .functions.dashboard import plot_bar

        return plot_bar(self._assemble(), x, y, title or "Bar")

    def plot_scatter(self, x, y, marker_size=None, title=None):
        from .functions.dashboard import plot_scatter

        return plot_scatter(self._assemble(), x, y, title or "Scatter")

    def plot_histogram(self, column, title=None):
        from .functions.dashboard import plot_histogram

        return plot_histogram(self._assemble(), column,
                              title or "Histogram")

    def plot_box(self, column, title=None):
        from .functions.dashboard import plot_box

        return plot_box(self._assemble(), column, title or "Box")

    def plot_pie(self, labels, values, title=None):
        from .functions.dashboard import plot_pie

        return plot_pie(self._assemble(), labels, values, title or "Pie")

    def plot_donut(self, labels, values, title=None):
        from .functions.dashboard import plot_donut

        return plot_donut(self._assemble(), labels, values,
                          title or "Donut")

    def plot_waterfall(self, x, y, title=None):
        from .functions.dashboard import plot_waterfall

        return plot_waterfall(self._assemble(), x, y,
                              title or "Waterfall")

    def elusion_streaming_write(self, alias: str, path: str,
                                mode: str = "overwrite") -> int:
        """README:1440 — chunked single-file write, format from the path
        extension; 'overwrite' truncates, 'append' extends."""
        import os as _os

        from .sinks.writers import stream_write

        fmt = _os.path.splitext(path)[1].lstrip(".").lower() or "csv"
        return stream_write(self._assemble(), path, fmt, mode=mode)

    def elusion_with_redis_cache(self, cache, alias: str,
                                 ttl_seconds: int | None = None):
        """README:3324 — Redis-backed result cache.  ``cache`` is an
        ElusionRedisCache (or a 'host:port' string to build one)."""
        from .cache import ElusionRedisCache

        if isinstance(cache, str):
            host, _, port = cache.partition(":")
            cache = ElusionRedisCache(host, int(port or 6379),
                                      ttl_seconds or 3600)
        if ttl_seconds is not None:
            cache.ttl = ttl_seconds
        return cache.get_or_compute(self, alias)

    def write_parquet_to_azure_with_sas(self, url: str, sas_token: str,
                                        mode: str = "overwrite") -> None:
        from .sinks.writers import write_parquet_to_azure_with_sas

        write_parquet_to_azure_with_sas(self._assemble(), url, sas_token,
                                        mode)

    def write_json_to_azure_with_sas(self, url: str, sas_token: str,
                                     pretty: bool = False) -> None:
        from .sinks.writers import write_json_to_azure_with_sas

        write_json_to_azure_with_sas(self._assemble(), url, sas_token,
                                     pretty)

    def write_parquet_to_fabric(self, onelake_url: str, **auth) -> None:
        from .sinks.writers import write_parquet_to_fabric

        write_parquet_to_fabric(self._assemble(), onelake_url, **auth)

    def write_parquet_to_fabric_with_service_principal(
            self, onelake_url: str, tenant_id: str, client_id: str,
            client_secret: str) -> None:
        from .sinks.writers import write_parquet_to_fabric

        write_parquet_to_fabric(self._assemble(), onelake_url,
                                tenant_id=tenant_id, client_id=client_id,
                                client_secret=client_secret)

    def _write_format_to_ftp(self, fmt: str, server: str, username: str,
                             password: str, remote_path: str,
                             port: int = 21, secure: bool = False,
                             sheet: str | None = None) -> None:
        """README:680-712 family: serialize locally with the normal
        writer for the format, STOR the file, clean up."""
        import os as _os
        import tempfile as _tf

        from .sources.connectors import write_to_ftp

        suffix = "." + fmt
        fd, tmp = _tf.mkstemp(suffix=suffix)
        _os.close(fd)
        _os.unlink(tmp)  # writers create the file themselves
        try:
            if fmt == "parquet":
                self.write_to_parquet("overwrite", tmp)
            elif fmt == "csv":
                self.write_to_csv("overwrite", tmp)
            elif fmt == "json":
                self.write_to_json(tmp)
            else:
                self.write_to_excel(tmp, sheet or "Sheet1")
            write_to_ftp(tmp, server, username, password, remote_path,
                         port, secure)
        finally:
            if _os.path.exists(tmp):
                _os.remove(tmp)

    def write_csv_to_ftp(self, server, username, password, remote_path,
                         port: int = 21, secure: bool = False) -> None:
        self._write_format_to_ftp("csv", server, username, password,
                                  remote_path, port, secure)

    def write_parquet_to_ftp(self, server, username, password, remote_path,
                             port: int = 21, secure: bool = False) -> None:
        self._write_format_to_ftp("parquet", server, username, password,
                                  remote_path, port, secure)

    def write_json_to_ftp(self, server, username, password, remote_path,
                          port: int = 21, secure: bool = False) -> None:
        self._write_format_to_ftp("json", server, username, password,
                                  remote_path, port, secure)

    def write_excel_to_ftp(self, server, username, password, remote_path,
                           sheet: str | None = None, port: int = 21,
                           secure: bool = False) -> None:
        self._write_format_to_ftp("xlsx", server, username, password,
                                  remote_path, port, secure, sheet)


# ---------------------------------------------------------------- cleaning

def _string_sentinel_cond(col: Column) -> Column:
    """NULL-or-sentinel predicate (elusion.rs:2558-2568)."""
    t = F.trim(col)
    return col.isNull() | (t == "") | F.lower(t).isin(*N.SENTINEL_NULLS)


def _fill_null(df: DataFrame, cols: Sequence[str] | None, value) -> DataFrame:
    cols = cols or df.columns
    updates = {}
    for c in cols:
        dt = df.schema[c].dataType
        col = F.col(c)
        if isinstance(dt, T.StringType):
            updates[c] = F.when(_string_sentinel_cond(col), F.lit(value)).otherwise(col)
        else:
            updates[c] = F.when(col.isNull(), F.lit(value)).otherwise(col)
    return df.withColumns(updates)


def _drop_null(df: DataFrame, cols: Sequence[str] | None) -> DataFrame:
    cols = cols or df.columns
    cond = None
    for c in cols:
        dt = df.schema[c].dataType
        col = F.col(c)
        this = (
            ~_string_sentinel_cond(col)
            if isinstance(dt, T.StringType)
            else col.isNotNull()
        )
        cond = this if cond is None else (cond & this)
    return df.filter(cond) if cond is not None else df


def _fill_down(df: DataFrame, cols: Sequence[str], order_col: str | None) -> DataFrame:
    if order_col:
        w = Window.orderBy(F.expr(order_col))
    else:
        # fidelity shim: file order via a single global window — fine for the
        # report-sheet sizes this op targets; pass order_col at scale.
        df = df.withColumn("__mid", F.monotonically_increasing_id())
        w = Window.orderBy("__mid")
    w = w.rowsBetween(Window.unboundedPreceding, 0)
    updates = {}
    for c in cols:
        dt = df.schema[c].dataType
        col = F.col(c)
        base = (
            F.when(_string_sentinel_cond(col), F.lit(None)).otherwise(col)
            if isinstance(dt, T.StringType)
            else col
        )
        updates[c] = F.last(base, ignorenulls=True).over(w)
    out = df.withColumns(updates)
    return out.drop("__mid") if not order_col else out
