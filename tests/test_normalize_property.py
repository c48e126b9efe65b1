"""Hypothesis property tests for the string-level normalizer — no Spark
session needed, so these run in milliseconds and explore the expression
space the fixed tests can't."""

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from elusion_spark import normalize as N

ident = st.from_regex(r"[a-z][a-z0-9_]{0,10}", fullmatch=True)
literal = st.from_regex(r"'[a-zA-Z0-9 ,()]{0,12}'", fullmatch=True)


@given(body=ident, alias=ident)
@settings(max_examples=200, deadline=None)
def test_split_alias_roundtrip(body, alias):
    got_body, got_alias = N.split_alias(f"{body} AS {alias}")
    assert got_body == body and got_alias == alias
    # no alias -> None
    nb, na = N.split_alias(body)
    assert nb == body and na is None


@given(lit=literal, alias=ident)
@settings(max_examples=200, deadline=None)
def test_split_alias_ignores_as_inside_literals(lit, alias):
    expr = f"concat({lit}, 'x AS y')"
    body, got = N.split_alias(f"{expr} AS {alias}")
    assert body == expr and got == alias
    # an AS inside the literal alone is NOT an alias split point
    body2, got2 = N.split_alias(f"upper('a AS b')")
    assert got2 is None and body2 == "upper('a AS b')"


@given(col=ident, lit=literal)
@settings(max_examples=200, deadline=None)
def test_normalize_preserves_literals(col, lit):
    out = N.normalize_expression(f"concat({col}, {lit})")
    assert lit in out  # literal bytes survive every shim untouched


@given(col=ident)
@settings(max_examples=100, deadline=None)
def test_cast_shims(col):
    out = N.normalize_expression(f"{col}::TEXT")
    assert "::string" in out and "TEXT" not in out.upper().replace("::STRING", "")
    out2 = N.normalize_expression(f"CAST({col} AS TEXT)")
    assert re.search(r"(?i)as\s+string\)", out2)


@given(inner=ident)
@settings(max_examples=100, deadline=None)
def test_agg_call_extraction(inner):
    cond = f"SUM({inner}) > 10 AND COUNT(*) < 5"
    calls = N.extract_agg_calls(cond)
    assert f"SUM({inner})" in calls and "COUNT(*)" in calls
    # parens inside literals never confuse the scanner
    cond2 = f"SUM({inner}) > 1 AND x = '(((' "
    assert N.extract_agg_calls(cond2) == [f"SUM({inner})"]
