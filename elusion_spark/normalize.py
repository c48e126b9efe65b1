"""Expression & identifier normalization shims.

The reference rewrites every user expression string: quoting, lowercasing,
``::T`` → ``CAST``, function whitelists (/root/reference/src/normalizers/
normalize.rs:27-80, 175-188, 546-584, 692-721, 805-897).  On Spark we lean
on the engine instead: the SQL parser is case-insensitive, accepts ``::``
casts (3.4+), ``POSITION(x IN y)``, and nearly the whole whitelist.  What
remains here is a *light* dialect shim (type-name and function-name
differences) plus the structural helpers the clause accumulator needs
(alias splitting, aggregate detection, groupability for group_by_all).

Everything operates outside single-quoted string literals.
"""

from __future__ import annotations

import re

# Sentinel strings treated as NULL by the cleaning pipeline
# (elusion.rs:2558-2568; case-insensitive, trimmed).
SENTINEL_NULLS = ("null", "na", "n/a", "none", "-", "?", "nan")

# Aggregate-function whitelist (normalize.rs:43-53 + Spark natives we expose).
AGG_FUNCS = (
    "sum", "avg", "mean", "median", "min", "max", "count",
    "last_value", "first_value", "first", "last",
    "grouping_id", "grouping",   # longer name first: alternation order
    "string_agg", "listagg", "array_agg", "collect_list", "collect_set",
    "var", "variance", "var_pop", "var_samp",
    "stddev", "stddev_pop", "stddev_samp",
    "bit_and", "bit_or", "bit_xor", "bool_and", "bool_or",
    "approx_count_distinct", "percentile", "percentile_approx",
    "corr", "covar_pop", "covar_samp", "any_value",
)

_LITERAL_RE = re.compile(r"('(?:[^']|'')*')")


def normalize_column_name(name: str) -> str:
    """Lowercase, trim, whitespace→underscore (normalize.rs:692-721)."""
    n = name.strip().lower()
    n = re.sub(r"\s+", "_", n)
    n = re.sub(r"[^\w]", "_", n)
    return n


def normalize_columns(df):
    """Apply :func:`normalize_column_name` to every column of a Spark DF.

    Reference applies this to every loaded table (elusion.rs:6724, 6755).
    """
    new = [normalize_column_name(c) for c in df.columns]
    if new == list(df.columns):
        return df
    return df.toDF(*new)


def _map_nonliteral(expr: str, fn) -> str:
    """Apply ``fn`` to the chunks of ``expr`` outside single-quoted literals."""
    parts = _LITERAL_RE.split(expr)
    return "".join(p if i % 2 else fn(p) for i, p in enumerate(parts))


def _replace_call(segment: str, name: str, builder) -> str:
    """Replace ``name(<balanced args>)`` with ``builder(args)`` in a
    non-literal segment.  Balanced-paren scan, case-insensitive."""
    pat = re.compile(r"\b" + name + r"\s*\(", re.IGNORECASE)
    out = []
    pos = 0
    while True:
        m = pat.search(segment, pos)
        if not m:
            out.append(segment[pos:])
            break
        out.append(segment[pos : m.start()])
        depth = 1
        i = m.end()
        while i < len(segment) and depth:
            if segment[i] == "(":
                depth += 1
            elif segment[i] == ")":
                depth -= 1
            i += 1
        inner = segment[m.end() : i - 1]
        out.append(builder(inner))
        pos = i
    return "".join(out)


# (regex, replacement) applied outside literals, case-insensitive.
_SIMPLE_SHIMS = [
    (re.compile(r"::\s*text\b", re.I), "::string"),
    (re.compile(r"(\bas\s+)text\s*\)", re.I), r"\1string)"),  # CAST(x AS TEXT)
    (re.compile(r"::\s*float8\b", re.I), "::double"),
    (re.compile(r"::\s*float4\b", re.I), "::float"),
    (re.compile(r"\blen\s*\(", re.I), "length("),
    (re.compile(r"\bmid\s*\(", re.I), "substring("),
    (re.compile(r"\bstrpos\s*\(", re.I), "instr("),
    (re.compile(r"\bcharindex\s*\(", re.I), "locate("),
    (re.compile(r"\bgroup_concat\s*\(", re.I), "listagg("),
    (re.compile(r"\bstring_agg\s*\(", re.I), "listagg("),
    (re.compile(r"\btoday\s*\(\s*\)", re.I), "current_date()"),
    (re.compile(r"\bto_unixtime\s*\(", re.I), "unix_timestamp("),
    (re.compile(r"\bifnull\s*\(", re.I), "nvl("),
]


_DATE_BIN_RE = re.compile(
    r"\bDATE_BIN\s*\(\s*(?:INTERVAL\s+)?'?(\d+)\s*"
    r"(SECOND|MINUTE|HOUR|DAY)S?'?\s*,"
    r"\s*([A-Za-z_][A-Za-z0-9_.]*)\s*,\s*(?:TIMESTAMP\s+)?'([^']+)'\s*\)",
    re.IGNORECASE,
)
_UNIT_SECONDS = {"SECOND": 1, "MINUTE": 60, "HOUR": 3600, "DAY": 86400}


def _date_bin_sub(m: "re.Match") -> str:
    n, unit, col, origin = m.groups()
    w = int(n) * _UNIT_SECONDS[unit.upper()]
    o = f"unix_timestamp(TIMESTAMP '{origin}')"
    return (
        f"timestamp_seconds({o} + "
        f"CAST(floor((unix_timestamp({col}) - {o}) / {w}) AS BIGINT) * {w})"
    )


def normalize_expression(expr: str) -> str:
    """Rewrite dialect differences so the string is valid Spark SQL.

    Covers the shims SURVEY §2.9 flags: ``::TEXT`` (normalize.rs:175-188),
    LEN/MID/STRPOS/CHARINDEX aliases, STRING_AGG→LISTAGG (Spark 4.0),
    TODAY(), ISZERO(x)→((x)=0), and DATE_BIN (DataFusion signature;
    Spark has no date_bin, so it lowers to epoch-floor arithmetic —
    second resolution, simple column argument).  Everything else the
    Spark parser already accepts.
    """
    # before literal-splitting: the interval/origin args ARE literals
    expr = _DATE_BIN_RE.sub(_date_bin_sub, expr.strip())

    def fix(seg: str) -> str:
        for pat, repl in _SIMPLE_SHIMS:
            seg = pat.sub(repl, seg)
        seg = _replace_call(seg, "iszero", lambda a: f"(({a}) = 0)")
        return seg

    return _map_nonliteral(expr, fix)


def split_alias(item: str) -> tuple[str, str | None]:
    """Split ``"<expr> AS alias"`` at the *last top-level* AS.

    Mirrors the reference's alias extraction (normalize.rs:190-304) without
    the quoting machinery.  Returns (body, alias|None).
    """
    s = item.strip()
    depth = 0
    in_lit = False
    last = -1
    up = s.upper()
    i = 0
    while i < len(s):
        ch = s[i]
        if in_lit:
            if ch == "'":
                in_lit = False
        elif ch == "'":
            in_lit = True
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif depth == 0 and up[i : i + 4] == " AS " :
            last = i
        i += 1
    if last < 0:
        return s, None
    body = s[:last].strip()
    alias = s[last + 4 :].strip().strip('"').strip("`")
    # an OVER clause after the AS means it wasn't an alias split point
    if not re.fullmatch(r"[\w]+", alias):
        return s, None
    return body, alias


def default_alias(body: str) -> str:
    """Deterministic auto-alias for unaliased computed columns."""
    n = re.sub(r"[^\w]+", "_", body.strip().lower()).strip("_")
    return n[:64] or "expr"


_SIMPLE_COL_RE = re.compile(r"^[A-Za-z_]\w*(\.[A-Za-z_]\w*)?$")


def is_simple_column(body: str) -> bool:
    """Bare (possibly qualified) identifier — groupable for group_by_all
    (normalize.rs:1138-1158 excludes any computed expression)."""
    return bool(_SIMPLE_COL_RE.match(body.strip()))


def base_name(body: str) -> str:
    """Output column name for a simple (possibly qualified) column."""
    return body.strip().split(".")[-1].strip('"').strip("`").lower()


def is_window_expression(body: str) -> bool:
    def check(seg: str) -> bool:
        return bool(re.search(r"\bover\s*\(", seg, re.I))

    parts = _LITERAL_RE.split(body)
    return any(check(p) for i, p in enumerate(parts) if i % 2 == 0)


_AGG_RE = re.compile(
    r"\b(" + "|".join(AGG_FUNCS) + r")\s*\(", re.IGNORECASE
)


def is_aggregate_expression(body: str) -> bool:
    """Whitelist detection (normalize.rs:930-939); OVER(...) disqualifies."""
    if is_window_expression(body):
        return False

    def check(seg: str) -> bool:
        return bool(_AGG_RE.search(seg))

    parts = _LITERAL_RE.split(body)
    return any(check(p) for i, p in enumerate(parts) if i % 2 == 0)


def canonical(expr: str) -> str:
    """Canonical form for matching select items against group-by exprs:
    lowercase outside literals, collapse whitespace, strip quotes."""

    def fix(seg: str) -> str:
        seg = seg.lower()
        seg = seg.replace('"', "").replace("`", "")
        seg = re.sub(r"\s+", " ", seg)
        return re.sub(r"\s*([(),*/+=<>%-])\s*", r"\1", seg)

    return _map_nonliteral(expr.strip(), fix).strip()


def extract_agg_call_spans(condition: str) -> list[tuple[int, int, str]]:
    """Find full top-level aggregate calls (balanced parens) in a HAVING
    condition, returning ``(start, end, text)`` spans so callers can
    splice replacements positionally.  Plain-text ``str.replace`` would
    also rewrite matching text inside string literals (``label =
    'SUM(x)'``) and is order-sensitive for overlapping call texts
    (elusion.rs:1077-1101 lets HAVING reference raw ``SUM(x)``)."""
    spans: list[tuple[int, int, str]] = []
    s = condition
    # mask literals so parens inside strings don't confuse the scan
    masked = _LITERAL_RE.sub(lambda m: "'" + "_" * (len(m.group(0)) - 2) + "'", s)
    for m in _AGG_RE.finditer(masked):
        depth = 1
        i = m.end()
        while i < len(masked) and depth:
            if masked[i] == "(":
                depth += 1
            elif masked[i] == ")":
                depth -= 1
            i += 1
        spans.append((m.start(), i, s[m.start():i]))
    return spans


def extract_agg_calls(condition: str) -> list[str]:
    return [text for _s, _e, text in extract_agg_call_spans(condition)]


def rewrite_grouping_refs(expr: str, resolve) -> str:
    """Rewrite the ARGUMENTS of ``GROUPING(...)`` / ``GROUPING_ID(...)``
    through ``resolve`` (expression-text → replacement-text), leaving
    everything else untouched.  The builder aliases grouping columns
    internally (``__g{i}``), so user-written GROUPING(col) provenance
    refs must be mapped onto those aliases for Spark's analyzer to
    match them against the rollup/cube grouping expressions (reference
    whitelists GROUPING — normalize.rs:43-53)."""

    def _builder(name):
        def b(inner):
            args, depth, cur = [], 0, []
            for ch in inner:
                if ch == "(":
                    depth += 1
                elif ch == ")":
                    depth -= 1
                if ch == "," and depth == 0:
                    args.append("".join(cur))
                    cur = []
                else:
                    cur.append(ch)
            if cur or args:
                args.append("".join(cur))
            new = [resolve(a.strip()) for a in args if a.strip()]
            return f"{name}({', '.join(new)})"

        return b

    def seg(s: str) -> str:
        s = _replace_call(s, "grouping_id", _builder("grouping_id"))
        s = _replace_call(s, "grouping", _builder("grouping"))
        return s

    return _map_nonliteral(expr, seg)


_CTE_RE = re.compile(r"^\s*([A-Za-z_][A-Za-z0-9_]*)\s+AS\s*\((.*)\)\s*$",
                     re.IGNORECASE | re.DOTALL)


def split_cte(cte: str) -> tuple[str, str]:
    """Parse ``"name AS (SELECT …)"`` into (name, body SQL)
    (sqlbuild.rs:17-24 prepends these verbatim)."""
    m = _CTE_RE.match(cte)
    if m is None:
        raise ValueError(
            f"CTE must look like 'name AS (SELECT …)', got: {cte!r}"
        )
    return m.group(1), m.group(2)


_OVER_RE = re.compile(r"OVER\s*\((.*?)\)", re.IGNORECASE | re.DOTALL)
_OVER_KEYWORDS = {
    "PARTITION", "BY", "ORDER", "ASC", "DESC", "NULLS", "FIRST", "LAST",
    "ROWS", "RANGE", "BETWEEN", "AND", "PRECEDING", "FOLLOWING", "CURRENT",
    "ROW", "UNBOUNDED", "CAST", "AS", "INTERVAL", "GROUPS",
}


def extract_over_columns(window_expr: str) -> list[str]:
    """Bare column identifiers referenced inside OVER(...) clauses —
    used by the group_by_all pre-flight (elusion.rs:3951-4035)."""
    cols: list[str] = []
    for m in _OVER_RE.finditer(window_expr):
        inner = m.group(1)
        for tok in re.finditer(r"[A-Za-z_][A-Za-z0-9_]*(?:\.[A-Za-z_][A-Za-z0-9_]*)?", inner):
            t = tok.group(0)
            end = tok.end()
            # skip function calls: identifier immediately followed by '('
            if end < len(inner) and inner[end:end + 1].strip().startswith("("):
                continue
            if any(p.upper() in _OVER_KEYWORDS for p in t.split(".")):
                continue
            if t not in cols:
                cols.append(t)
    return cols
