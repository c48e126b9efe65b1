"""Unit tests for the normalization shims — ports the *behavior* of the
reference's normalize.rs test block (normalize.rs:1162-1643) to the Spark
dialect surface (we rewrite far less by design)."""

from elusion_spark import normalize as N


def test_normalize_column_name():
    assert N.normalize_column_name("  Order Date ") == "order_date"
    assert N.normalize_column_name("Net Värde") == "net_värde"
    assert N.normalize_column_name("a-b c") == "a_b_c"
    assert N.normalize_column_name("ALLCAPS") == "allcaps"


def test_split_alias_basic():
    assert N.split_alias("SUM(x) AS total") == ("SUM(x)", "total")
    assert N.split_alias("a.b") == ("a.b", None)
    # AS inside CAST parens must not split
    assert N.split_alias("CAST(x AS INT)") == ("CAST(x AS INT)", None)
    assert N.split_alias("CAST(x AS INT) AS xi") == ("CAST(x AS INT)", "xi")
    # literal containing ' as ' must not split
    body, alias = N.split_alias("concat(a, ' AS ', b) AS c")
    assert alias == "c"


def test_split_alias_window():
    body, alias = N.split_alias(
        "SUM(v) OVER (PARTITION BY k ORDER BY t) AS running"
    )
    assert alias == "running"
    assert body.startswith("SUM(v) OVER")


def test_cast_shims():
    assert N.normalize_expression("godina::TEXT") == "godina::string"
    assert (
        N.normalize_expression("CAST(x AS TEXT)") == "CAST(x AS string)"
    )
    assert N.normalize_expression("LEN(name)") == "length(name)"
    assert N.normalize_expression("MID(s, 1, 3)") == "substring(s, 1, 3)"
    assert N.normalize_expression("TODAY()") == "current_date()"
    assert N.normalize_expression("STRING_AGG(x, ',')") == "listagg(x, ',')"


def test_iszero_balanced():
    assert N.normalize_expression("ISZERO(a + b)") == "((a + b) = 0)"
    assert (
        N.normalize_expression("ISZERO(f(x, g(y)))") == "((f(x, g(y))) = 0)"
    )


def test_literal_protection():
    # shims must not fire inside string literals
    out = N.normalize_expression("concat('LEN(', x, ')')")
    assert "'LEN('" in out


def test_aggregate_detection():
    assert N.is_aggregate_expression("SUM(x)")
    assert N.is_aggregate_expression("CAST(SUM(CAST(x AS DECIMAL)) AS DOUBLE)")
    assert N.is_aggregate_expression("count(*)")
    assert not N.is_aggregate_expression("x + y")
    # window functions are not aggregates (elusion routes them separately)
    assert not N.is_aggregate_expression("SUM(x) OVER (PARTITION BY k)")
    # literal containing an agg name is not an aggregate
    assert not N.is_aggregate_expression("'SUM(x)'")


def test_groupable_detection():
    assert N.is_simple_column("a")
    assert N.is_simple_column("t.a")
    assert not N.is_simple_column("UPPER(a)")
    assert not N.is_simple_column("a + b")


def test_canonical():
    assert N.canonical("UPPER( a )") == N.canonical("upper(a)")
    assert N.canonical("x = 'ABC'") == N.canonical("X='ABC'")
    # literals keep their case
    assert "'ABC'" in N.canonical("x = 'ABC'")
    assert N.canonical("x = 'abc'") != N.canonical("x = 'ABC'")


def test_extract_agg_calls():
    calls = N.extract_agg_calls("SUM(CAST(x AS DECIMAL(38,9))) > 10 AND COUNT(*) < 5")
    assert calls == ["SUM(CAST(x AS DECIMAL(38,9)))", "COUNT(*)"]
