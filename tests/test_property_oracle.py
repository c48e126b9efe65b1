"""Property-style randomized oracle comparison: generate filter/agg/
order-by combinations over the customer and orders tables, run them
through the CustomDataFrame builder AND DuckDB, compare values.

Seeded RNG (not hypothesis's engine) so failures reproduce exactly and
runtime stays bounded; the generator covers the builder surface the
fixed suite can't enumerate: predicate combinations, group-key choices,
agg mixes, direction mixes."""

import random

import duckdb
import pytest

SF = "/root/testdata/sf0.001"
TABLES = {
    "customer": ["c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"],
    "orders": ["o_orderkey", "o_custkey", "o_totalprice", "o_orderdate",
               "o_orderstatus"],
}
NUMERIC = {"customer": ["c_custkey", "c_nationkey", "c_acctbal"],
           "orders": ["o_orderkey", "o_custkey", "o_totalprice"]}
CATEG = {"customer": ["c_mktsegment", "c_nationkey"],
         "orders": ["o_orderstatus"]}


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    yield con
    con.close()


def _gen_case(rng: random.Random):
    table = rng.choice(list(TABLES))
    preds = []
    for _ in range(rng.randint(0, 3)):
        col = rng.choice(NUMERIC[table])
        op = rng.choice(["<", "<=", ">", ">=", "<>"])
        if col.endswith(("custkey", "orderkey", "nationkey")):
            val = rng.randint(0, 200)
        else:
            val = round(rng.uniform(0, 5000), 2)
        preds.append(f"{col} {op} {val}")
    key = rng.choice(CATEG[table])
    aggs = rng.sample(
        [
            ("CAST(COUNT(*) AS BIGINT)", "n"),
            (f"CAST(MIN({rng.choice(NUMERIC[table])}) AS DOUBLE)", "mn"),
            (f"CAST(MAX({rng.choice(NUMERIC[table])}) AS DOUBLE)", "mx"),
            (
                f"CAST(SUM(CAST({rng.choice(NUMERIC[table])} AS DECIMAL(38,9))) AS DOUBLE)",
                "sm",
            ),
        ],
        k=rng.randint(1, 3),
    )
    return table, preds, key, aggs


def _run_case(spark, duck, seed):
    from elusion_spark.sources.loaders import load_parquet

    rng = random.Random(seed)
    table, preds, key, aggs = _gen_case(rng)

    cdf = load_parquet(f"{SF}/{table}.parquet", "t", spark)
    for p in preds:
        cdf = cdf.filter(p)
    cdf = (
        cdf.select([key])
        .agg([f"{expr} AS {al}" for expr, al in aggs])
        .group_by_all()
    )
    srows = {
        tuple(sorted(r.asDict().items()))
        for r in cdf.to_spark().collect()
    }

    where = (" WHERE " + " AND ".join(preds)) if preds else ""
    sql = (
        f"SELECT {key}, {', '.join(f'{e} AS {a}' for e, a in aggs)} "
        f"FROM {table}{where} GROUP BY {key}"
    )
    cur = duck.execute(sql)
    cols = [d[0] for d in cur.description]
    orows = {
        tuple(sorted(zip(cols, row)))
        for row in cur.fetchall()
    }
    assert srows == orows, (
        f"seed={seed} table={table} preds={preds} key={key} aggs={aggs}\n"
        f"spark-only: {list(srows - orows)[:3]}\noracle-only: {list(orows - srows)[:3]}"
    )


@pytest.mark.parametrize("seed", range(25))
def test_randomized_filter_agg_matches_oracle(spark, duck, seed):
    _run_case(spark, duck, seed)


def _run_join_case(spark, duck, seed):
    """Randomized join + group: orders x customer with random predicates."""
    from elusion_spark.sources.loaders import load_parquet

    rng = random.Random(10_000 + seed)
    o_pred = f"o_totalprice {rng.choice(['<', '>', '<='])} {round(rng.uniform(1000, 400000), 2)}"
    c_pred = f"c_nationkey {rng.choice(['<', '>=', '<>'])} {rng.randint(0, 24)}"
    how = rng.choice(["INNER", "LEFT SEMI"])

    o = load_parquet(f"{SF}/orders.parquet", "o", spark).filter(o_pred)
    c = load_parquet(f"{SF}/customer.parquet", "c", spark).filter(c_pred)
    joined = o.join(c, ["o.o_custkey = c.c_custkey"], how)
    if how == "LEFT SEMI":
        q = joined.select(["o.o_orderstatus"]).agg(
            ["CAST(COUNT(*) AS BIGINT) AS n"]
        ).group_by_all()
        sql = (
            f"SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n FROM orders "
            f"WHERE {o_pred} AND o_custkey IN "
            f"(SELECT c_custkey FROM customer WHERE {c_pred}) "
            f"GROUP BY o_orderstatus"
        )
    else:
        q = joined.select(["c.c_mktsegment"]).agg(
            ["CAST(COUNT(*) AS BIGINT) AS n",
             "CAST(SUM(CAST(o.o_totalprice AS DECIMAL(38,9))) AS DOUBLE) AS total"]
        ).group_by_all()
        sql = (
            f"SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n, "
            f"CAST(SUM(CAST(o_totalprice AS DECIMAL(38,9))) AS DOUBLE) AS total "
            f"FROM orders JOIN customer ON o_custkey = c_custkey "
            f"WHERE {o_pred} AND {c_pred} GROUP BY c_mktsegment"
        )
    srows = {tuple(sorted(r.asDict().items())) for r in q.to_spark().collect()}
    cur = duck.execute(sql)
    cols = [d[0] for d in cur.description]
    orows = {tuple(sorted(zip(cols, row))) for row in cur.fetchall()}
    assert srows == orows, f"seed={seed} how={how} o={o_pred} c={c_pred}"


@pytest.mark.parametrize("seed", range(15))
def test_randomized_join_agg_matches_oracle(spark, duck, seed):
    _run_join_case(spark, duck, seed)


def _run_window_case(spark, duck, seed):
    """Randomized window functions over events: partition/order/frame
    combos through the builder's .window() string path."""
    from elusion_spark.sources.loaders import load_parquet

    rng = random.Random(20_000 + seed)
    part = rng.choice(["user_id", "event_type"])
    frame = rng.choice([
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW",
        "ROWS BETWEEN 2 PRECEDING AND CURRENT ROW",
        "ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING",
    ])
    fn = rng.choice([
        ("CAST(ROW_NUMBER() OVER (PARTITION BY {p} ORDER BY event_id) AS BIGINT)", None),
        ("CAST(SUM(CAST(value AS DECIMAL(38,9))) OVER (PARTITION BY {p} ORDER BY event_id {f}) AS DOUBLE)", frame),
        ("CAST(MIN(value) OVER (PARTITION BY {p} ORDER BY event_id {f}) AS DOUBLE)", frame),
        ("CAST(LAG(event_id, 1, -1) OVER (PARTITION BY {p} ORDER BY event_id) AS BIGINT)", None),
        ("CAST(DENSE_RANK() OVER (PARTITION BY {p} ORDER BY value, event_id) AS BIGINT)", None),
    ])
    expr = fn[0].format(p=part, f=frame)

    e = load_parquet(f"{SF}/events.parquet", "e", spark)
    q = (
        e.filter("user_id <= 40")
        .select(["event_id"])
        .window(f"{expr} AS w")
    )
    srows = sorted((r["event_id"], r["w"]) for r in q.to_spark().collect())
    sql = (
        f"SELECT event_id, {expr} AS w FROM events WHERE user_id <= 40"
    )
    orows = sorted((a, b) for a, b in duck.execute(sql).fetchall())
    assert srows == orows, f"seed={seed} expr={expr}"


@pytest.fixture(scope="module")
def duck_events():
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{SF}/events.parquet'")
    yield con
    con.close()


@pytest.mark.parametrize("seed", range(10))
def test_randomized_window_matches_oracle(spark, duck_events, seed):
    _run_window_case(spark, duck_events, seed)


def _run_setop_case(spark, duck, seed):
    """Randomized set operations over two filtered projections of the
    same table — positional DISTINCT semantics on both engines."""
    from elusion_spark.sources.loaders import load_parquet

    rng = random.Random(30_000 + seed)
    t = rng.choice(["customer", "orders"])
    key = {"customer": "c_custkey", "orders": "o_orderkey"}[t]
    cat = {"customer": "c_nationkey", "orders": "o_custkey"}[t]
    p1 = f"{cat} < {rng.randint(5, 120)}"
    p2 = f"{cat} >= {rng.randint(3, 80)}"
    op = rng.choice(["union", "union_all", "except_", "intersect"])

    a = load_parquet(f"{SF}/{t}.parquet", "a", spark).filter(p1) \
        .select([key, cat]).elusion(f"setop_a_{seed}")
    b = load_parquet(f"{SF}/{t}.parquet", "b", spark).filter(p2) \
        .select([key, cat]).elusion(f"setop_b_{seed}")
    out = getattr(a, op)(b)
    srows = sorted(map(tuple, out.df.collect()))

    sql_op = {"union": "UNION", "union_all": "UNION ALL",
              "except_": "EXCEPT", "intersect": "INTERSECT"}[op]
    sql = (
        f"SELECT {key}, {cat} FROM {t} WHERE {p1} {sql_op} "
        f"SELECT {key}, {cat} FROM {t} WHERE {p2}"
    )
    orows = sorted(map(tuple, duck.execute(sql).fetchall()))
    assert srows == orows, f"seed={seed} t={t} op={op} p1={p1!r} p2={p2!r}"


@pytest.mark.parametrize("seed", range(12))
def test_randomized_setops_match_oracle(spark, duck, seed):
    _run_setop_case(spark, duck, seed)


# ----------------------------------------------------- HAVING fuzz

def _gen_having_case(rng: random.Random):
    """HAVING conditions mixing alias refs, raw agg calls (hidden-agg
    rewrite path), and string literals that CONTAIN agg-call text (the
    round-2 span-substitution fix)."""
    table = rng.choice(list(TABLES))
    key = rng.choice(CATEG[table])
    num = rng.choice(NUMERIC[table])
    aggs = [("CAST(COUNT(*) AS BIGINT)", "n"),
            (f"CAST(MIN({num}) AS DOUBLE)", "mn")]
    havings = []
    n_thresh = rng.randint(1, 30)
    kind = rng.randint(0, 3)
    if kind == 0:  # alias reference
        havings.append(f"n > {n_thresh}")
    elif kind == 1:  # raw agg not in select (hidden agg)
        havings.append(f"MAX({num}) > {rng.randint(0, 100)}")
    elif kind == 2:  # raw agg + literal containing agg text
        havings.append(
            f"COUNT(*) > {n_thresh} AND 'COUNT(*)' <> 'x'")
    else:  # mixed alias + raw + arithmetic
        havings.append(f"n >= {n_thresh} OR SUM({num}) < 0")
    return table, key, aggs, havings


def _run_having_case(spark, duck, seed):
    from elusion_spark.sources.loaders import load_parquet

    rng = random.Random(seed + 7000)
    table, key, aggs, havings = _gen_having_case(rng)

    cdf = (
        load_parquet(f"{SF}/{table}.parquet", "t", spark)
        .select([key])
        .agg([f"{e} AS {a}" for e, a in aggs])
        .group_by_all()
    )
    for h in havings:
        cdf = cdf.having(h)
    srows = {tuple(sorted(r.asDict().items())) for r in cdf.to_spark().collect()}

    sql = (
        f"SELECT {key}, {', '.join(f'{e} AS {a}' for e, a in aggs)} "
        f"FROM {table} GROUP BY {key} HAVING {' AND '.join(havings)}"
    )
    cur = duck.execute(sql)
    cols = [d[0] for d in cur.description]
    orows = {tuple(sorted(zip(cols, row))) for row in cur.fetchall()}
    assert srows == orows, (
        f"seed={seed} table={table} key={key} havings={havings}\n"
        f"spark-only: {list(srows - orows)[:3]}\n"
        f"oracle-only: {list(orows - srows)[:3]}"
    )


@pytest.mark.parametrize("seed", range(12))
def test_randomized_having_matches_oracle(spark, duck, seed):
    _run_having_case(spark, duck, seed)


# ------------------------------------------------- null-handling fuzz

def _run_null_case(spark, duck, seed):
    """fill_null / drop_null on randomly-nulled frames vs DuckDB
    COALESCE / IS NOT NULL."""
    from elusion_spark.dataframe import CustomDataFrame

    rng = random.Random(seed + 9000)
    rows = []
    for i in range(rng.randint(5, 40)):
        rows.append((
            i,
            None if rng.random() < 0.3 else rng.randint(0, 9),
            None if rng.random() < 0.3 else rng.choice(["a", "b", "c"]),
        ))
    df = spark.createDataFrame(rows, ["id", "num", "cat"])
    duck.execute("DROP TABLE IF EXISTS fuzz_nulls")
    duck.execute("CREATE TABLE fuzz_nulls (id BIGINT, num BIGINT, cat VARCHAR)")
    duck.executemany("INSERT INTO fuzz_nulls VALUES (?, ?, ?)", rows)

    cdf = CustomDataFrame(df, "fz")
    if rng.random() < 0.5:
        sentinel = rng.randint(90, 99)
        out = cdf.fill_null(["num"], sentinel).elusion("fz_fill")
        sql = (f"SELECT id, COALESCE(num, {sentinel}) AS num, cat "
               f"FROM fuzz_nulls")
    else:
        cols = rng.choice([["num"], ["cat"], ["num", "cat"]])
        out = cdf.drop_null(cols).elusion("fz_drop")
        conds = " AND ".join(f"{c} IS NOT NULL" for c in cols)
        sql = f"SELECT id, num, cat FROM fuzz_nulls WHERE {conds}"
    srows = {tuple(sorted(r.asDict().items())) for r in out.collect()}
    cur = duck.execute(sql)
    cols_ = [d[0] for d in cur.description]
    orows = {tuple(sorted(zip(cols_, row))) for row in cur.fetchall()}
    assert srows == orows, f"seed={seed}\nsql={sql}"


@pytest.mark.parametrize("seed", range(10))
def test_randomized_null_handling_matches_oracle(spark, duck, seed):
    _run_null_case(spark, duck, seed)


# ------------------------------------------------- order/limit/offset

def _run_order_case(spark, duck, seed):
    """Total deterministic ORDER BY (unique-key tiebreak) + LIMIT/OFFSET:
    compares the ordered row LISTS, not sets — catches direction,
    null-ordering, and offset slicing bugs the agg families can't."""
    import random as _random

    from elusion_spark.sources.loaders import load_parquet

    rng = _random.Random(7000 + seed)
    table = rng.choice(list(TABLES))
    uniq = TABLES[table][0]
    n_keys = rng.randint(1, 2)
    keys = rng.sample(NUMERIC[table] + CATEG[table], k=n_keys)
    if uniq not in keys:
        keys.append(uniq)
    dirs = [rng.choice(["ASC", "DESC"]) for _ in keys]
    limit = rng.randint(1, 40)
    offset = rng.choice([0, 0, rng.randint(1, 30)])
    cols = sorted(set(keys) | {uniq})

    # reference semantics (q27): skip_rows drops the first n rows of the
    # LIMITED result, so SQL's LIMIT m OFFSET k is limit(m+k).skip_rows(k)
    cdf = (load_parquet(f"{SF}/{table}.parquet", "t", spark)
           .select(cols)
           .order_by(keys, dirs)
           .limit(limit + offset))
    if offset:
        cdf = cdf.skip_rows(offset)
    got = [tuple(r[c] for c in cols) for r in cdf.to_spark().collect()]

    order = ", ".join(f"{k} {d}" for k, d in zip(keys, dirs))
    sql = (f"SELECT {', '.join(cols)} FROM {table} "
           f"ORDER BY {order} LIMIT {limit} OFFSET {offset}")
    want = duck.execute(sql).fetchall()
    want = [tuple(row) for row in want]
    assert got == want, f"seed={seed}\nsql={sql}"


@pytest.mark.parametrize("seed", range(12))
def test_randomized_order_limit_offset_matches_oracle(spark, duck, seed):
    _run_order_case(spark, duck, seed)


# ------------------------------------------------- scalar projections

_SCALAR_GENS = [
    lambda c, rng: f"LOWER({c})",
    lambda c, rng: f"UPPER({c})",
    lambda c, rng: f"TRIM({c})",
    lambda c, rng: f"REVERSE({c})",
    lambda c, rng: f"CAST(LENGTH({c}) AS BIGINT)",
    lambda c, rng: f"SUBSTRING({c}, 1, {rng.randint(1, 6)})",
    lambda c, rng: f"CONCAT({c}, '_{rng.randint(0, 9)}')",
    lambda c, rng: f"REPLACE({c}, 'a', '{rng.choice('xyz')}')",
]
_MATH_GENS = [
    lambda c, rng: f"CAST(ABS({c}) AS DOUBLE)",
    lambda c, rng: f"CAST(ROUND({c}, {rng.randint(0, 2)}) AS DOUBLE)",
    lambda c, rng: f"CAST(FLOOR({c}) AS DOUBLE)",
    lambda c, rng: f"CAST(CEIL({c}) AS DOUBLE)",
    lambda c, rng: f"CAST(SQRT(ABS({c})) AS DOUBLE)",
    lambda c, rng: f"CAST({c} % {rng.randint(2, 9)} AS DOUBLE)",
]


def _run_scalar_case(spark, duck, seed):
    """Random scalar-function projections through the builder/normalizer
    vs the identical ANSI text in DuckDB — exercises the whitelist
    surface (string + math) on shapes the fixed suite can't enumerate."""
    import random as _random

    from elusion_spark.sources.loaders import load_parquet

    rng = _random.Random(9000 + seed)
    table = rng.choice(list(TABLES))
    uniq = TABLES[table][0]
    strcols = {"customer": ["c_mktsegment", "c_name"],
               "orders": ["o_orderstatus"]}
    scol = rng.choice(strcols[table])
    ncol = rng.choice(NUMERIC[table])
    exprs = []
    for i, g in enumerate(rng.sample(_SCALAR_GENS, k=rng.randint(1, 3))):
        exprs.append((g(scol, rng), f"s{i}"))
    for i, g in enumerate(rng.sample(_MATH_GENS, k=rng.randint(1, 3))):
        exprs.append((g(ncol, rng), f"m{i}"))

    sel = [uniq] + [f"{e} AS {a}" for e, a in exprs]
    cdf = load_parquet(f"{SF}/{table}.parquet", "t", spark).select(sel)
    got = {tuple(sorted(r.asDict().items()))
           for r in cdf.to_spark().collect()}
    sql = (f"SELECT {uniq}, "
           + ", ".join(f"{e} AS {a}" for e, a in exprs)
           + f" FROM {table}")
    cur = duck.execute(sql)
    cols_ = [d[0] for d in cur.description]
    want = {tuple(sorted(zip(cols_, row))) for row in cur.fetchall()}
    assert got == want, f"seed={seed}\nsql={sql}"


@pytest.mark.parametrize("seed", range(12))
def test_randomized_scalar_projections_match_oracle(spark, duck, seed):
    _run_scalar_case(spark, duck, seed)


# ------------------------------------------------------------- pivot

def _run_pivot_case(spark, duck, seed):
    """Random pivot shapes vs conditional-aggregation SQL: exercises the
    2-phase distinct discovery, the {pivot_col}_{value} naming rule, and
    the COALESCE(...,0) fill on combinations with no rows."""
    import random as _random

    from elusion_spark.sources.loaders import load_parquet

    rng = _random.Random(11000 + seed)
    table, key, cat, val = rng.choice([
        ("customer", "c_nationkey", "c_mktsegment", "c_acctbal"),
        ("orders", "o_custkey", "o_orderstatus", "o_totalprice"),
    ])
    agg = rng.choice(["SUM", "MIN", "MAX", "COUNT"])

    cdf = load_parquet(f"{SF}/{table}.parquet", "t", spark).pivot(
        [key], cat, val, agg
    )
    sdf = cdf.to_spark()
    got = {tuple(sorted((k.lower(), v) for k, v in r.asDict().items()))
           for r in sdf.collect()}

    cats = [r[0] for r in duck.execute(
        f"SELECT DISTINCT {cat} FROM {table} ORDER BY 1").fetchall()]
    cases = ", ".join(
        f"COALESCE({agg}(CASE WHEN {cat} = '{c}' THEN {val} END), 0) "
        f"AS {cat}_{c}" for c in cats
    )
    sql = f"SELECT {key}, {cases} FROM {table} GROUP BY {key}"
    cur = duck.execute(sql)
    cols_ = [d[0].lower() for d in cur.description]
    want = {tuple(sorted(zip(cols_, row))) for row in cur.fetchall()}
    # float cells: compare rounded to absorb engine SUM order ulps
    def _rnd(rows):
        return {tuple((c, round(v, 4) if isinstance(v, float) else v)
                      for c, v in r) for r in rows}
    assert _rnd(got) == _rnd(want), f"seed={seed}\nsql={sql}"


@pytest.mark.parametrize("seed", range(8))
def test_randomized_pivot_matches_oracle(spark, duck, seed):
    _run_pivot_case(spark, duck, seed)


# ------------------------------------------------------- star-join family

@pytest.fixture(scope="module")
def duck_star():
    con = duckdb.connect()
    for t in ("customer", "orders", "lineitem"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    yield con
    con.close()


def _run_star_case(spark, duck_star, seed):
    """Randomized TPC-H-style star probe: customer ⋈ orders ⋈ lineitem
    with random segment/date/price predicates, random group key, and
    decimal-exact revenue — the 3-way-join assembly path under predicate
    permutation (q82/q86 are two fixed points of this family)."""
    from elusion_spark.sources.loaders import load_parquet

    rng = random.Random(77_000 + seed)
    seg = rng.choice(["BUILDING", "MACHINERY", "HOUSEHOLD", "AUTOMOBILE",
                      "FURNITURE"])
    d0 = f"199{rng.randint(5, 9)}-0{rng.randint(1, 9)}-01"
    op = rng.choice(["<", ">="])
    price = round(rng.uniform(10000, 300000), 2)
    gkey, galias = rng.choice([
        ("c.c_mktsegment", "c_mktsegment"),
        ("o.o_orderstatus", "o_orderstatus"),
        ("l.l_returnflag", "l_returnflag"),
        ("l.l_linestatus", "l_linestatus"),
    ])
    rev = "CAST(SUM(CAST(l{d}l_extendedprice * (1 - l{d}l_discount) AS DECIMAL(38,9))) AS DOUBLE)"

    c = load_parquet(f"{SF}/customer.parquet", "c", spark)
    o = load_parquet(f"{SF}/orders.parquet", "o", spark)
    li = load_parquet(f"{SF}/lineitem.parquet", "l", spark)
    q = (
        c.join_many([
            (o, ["c.c_custkey = o.o_custkey"], "INNER"),
            (li, ["o.o_orderkey = l.l_orderkey"], "INNER"),
        ])
        .filter_many([
            f"c.c_mktsegment = '{seg}'",
            f"o.o_orderdate {op} '{d0}'",
            f"o.o_totalprice < {price}",
        ])
        .select([f"{gkey} AS {galias}"])
        .agg([
            "CAST(COUNT(*) AS BIGINT) AS n",
            rev.format(d=".") + " AS revenue",
        ])
        .group_by([gkey])
    )
    sql = (
        f"SELECT {galias}, CAST(COUNT(*) AS BIGINT) AS n, "
        f"{rev.format(d='_').replace('l_l_', 'l_')} AS revenue "
        f"FROM customer JOIN orders ON c_custkey = o_custkey "
        f"JOIN lineitem ON o_orderkey = l_orderkey "
        f"WHERE c_mktsegment = '{seg}' AND o_orderdate {op} '{d0}' "
        f"AND o_totalprice < {price} GROUP BY {galias}"
    )
    srows = {tuple(sorted(r.asDict().items())) for r in q.to_spark().collect()}
    cur = duck_star.execute(sql)
    cols = [d[0] for d in cur.description]
    orows = {tuple(sorted(zip(cols, row))) for row in cur.fetchall()}
    assert srows == orows, f"seed={seed} seg={seg} {op} {d0} {price} {galias}"


@pytest.mark.parametrize("seed", range(10))
def test_randomized_star_join_matches_oracle(spark, duck_star, seed):
    _run_star_case(spark, duck_star, seed)


# ------------------------------------------- bag set-op fuzz (round 4)

def _run_bag_setop_case(spark, duck, seed):
    """EXCEPT ALL / INTERSECT ALL over low-cardinality projections —
    multiplicities (not just membership) must match the oracle."""
    import random as _random

    from elusion_spark.sources.loaders import load_parquet

    rng = _random.Random(60_000 + seed)
    t = rng.choice(["customer", "orders"])
    cat = {"customer": "c_nationkey", "orders": "o_orderstatus"}[t]
    low = {"customer": "c_mktsegment", "orders": "o_orderstatus"}[t]
    num = {"customer": "c_custkey", "orders": "o_orderkey"}[t]
    p1 = f"{num} % {rng.randint(2, 7)} <> 0"
    p2 = f"{num} % {rng.randint(2, 5)} <> 1"
    op = rng.choice(["except_all", "intersect_all"])

    a = load_parquet(f"{SF}/{t}.parquet", "a", spark).filter(p1) \
        .select([cat, low]).elusion(f"bag_a_{seed}")
    b = load_parquet(f"{SF}/{t}.parquet", "b", spark).filter(p2) \
        .select([cat, low]).elusion(f"bag_b_{seed}")
    out = getattr(a, op)(b)
    srows = sorted(map(tuple, out.df.collect()))

    sql_op = {"except_all": "EXCEPT ALL",
              "intersect_all": "INTERSECT ALL"}[op]
    sql = (
        f"SELECT {cat}, {low} FROM {t} WHERE {p1} {sql_op} "
        f"SELECT {cat}, {low} FROM {t} WHERE {p2}"
    )
    orows = sorted(map(tuple, duck.execute(sql).fetchall()))
    assert srows == orows, f"seed={seed} t={t} op={op} p1={p1!r} p2={p2!r}"


@pytest.mark.parametrize("seed", range(10))
def test_randomized_bag_setops_match_oracle(spark, duck, seed):
    _run_bag_setop_case(spark, duck, seed)


# --------------------------------- grouped top-k / latest fuzz (round 4)

def _run_topk_case(spark, duck, seed):
    """top_k_per_group / latest_by_key vs a DuckDB row_number window:
    random k, direction, and order column, id tiebreak — per-row
    membership AND rank must match."""
    import random as _random

    from elusion_spark.operators.dedup import latest_by_key
    from elusion_spark.pipeline import top_k_per_group

    rng = _random.Random(70_000 + seed)
    t = rng.choice(["customer", "orders"])
    key = {"customer": "c_mktsegment", "orders": "o_orderstatus"}[t]
    order = rng.choice(NUMERIC[t])
    uid = {"customer": "c_custkey", "orders": "o_orderkey"}[t]
    k = rng.randint(1, 7)
    asc = rng.choice([True, False])

    df = spark.read.parquet(f"{SF}/{t}.parquet")
    if rng.random() < 0.5:
        got = top_k_per_group(df, [key], [order], k, ascending=asc,
                              tiebreak_col=uid, rank_col="r")
        srows = sorted(
            (r[key], r[uid], r["r"]) for r in got.select(key, uid, "r").collect()
        )
        direction = "ASC" if asc else "DESC"
        sql = (
            f"SELECT {key}, {uid}, rn FROM ("
            f"SELECT {key}, {uid}, ROW_NUMBER() OVER (PARTITION BY {key} "
            f"ORDER BY {order} {direction}, {uid}) AS rn FROM {t}) "
            f"WHERE rn <= {k}"
        )
        orows = sorted(map(tuple, duck.execute(sql).fetchall()))
        assert srows == orows, f"seed={seed} t={t} k={k} asc={asc} o={order}"
    else:
        keep = rng.choice(["latest", "earliest"])
        got = latest_by_key(df, [key], order, tiebreak_col=uid, keep=keep)
        srows = sorted((r[key], r[uid]) for r in got.select(key, uid).collect())
        direction = "DESC" if keep == "latest" else "ASC"
        sql = (
            f"SELECT {key}, {uid} FROM ("
            f"SELECT {key}, {uid}, ROW_NUMBER() OVER (PARTITION BY {key} "
            f"ORDER BY {order} {direction}, {uid} {direction}) AS rn FROM {t}) "
            f"WHERE rn = 1"
        )
        orows = sorted(map(tuple, duck.execute(sql).fetchall()))
        assert srows == orows, f"seed={seed} t={t} keep={keep} o={order}"


@pytest.mark.parametrize("seed", range(10))
def test_randomized_grouped_topk_matches_oracle(spark, duck, seed):
    _run_topk_case(spark, duck, seed)


# ------------------------------------------------ gapfill fuzz (round 4)

def _run_gapfill_case(spark, duck_events, seed):
    """locf gap filling vs a DuckDB generate_series + IGNORE NULLS
    window, with randomized grain and with/without series keys — the
    grid membership, filled values, and is_gap flags all compare."""
    import random as _random

    from elusion_spark.operators.temporal import gapfill_resample

    rng = _random.Random(80_000 + seed)
    grain = rng.choice(["hour", "day"])
    by = rng.choice([["event_type"], None])
    df = spark.read.parquet(f"{SF}/events.parquet")
    out = gapfill_resample(df, "ts", "value", grain=grain, by=by,
                           method="locf")
    cols = ([*(by or []), f"bucket_{grain}", "value", "is_gap"])
    srows = sorted(
        tuple(r[c] for c in cols) for r in out.collect()
    )

    part = "PARTITION BY event_type" if by else ""
    key_sel = "event_type, " if by else ""
    key_grp = "event_type, " if by else ""
    iv = {"hour": "INTERVAL 1 HOUR", "day": "INTERVAL 1 DAY"}[grain]
    sql = f"""
    WITH b AS (
        SELECT {key_sel}date_trunc('{grain}', ts) AS bh,
               CAST(SUM(CAST(value AS DECIMAL(38,9))) AS DOUBLE)
                   / CAST(COUNT(*) AS DOUBLE) AS v
        FROM events GROUP BY {key_grp}date_trunc('{grain}', ts)
    ),
    span AS (SELECT {key_sel}MIN(bh) AS mn, MAX(bh) AS mx FROM b
             {'GROUP BY event_type' if by else ''}),
    grid AS (SELECT {'s.event_type, ' if by else ''}u.bh
             FROM span s, unnest(generate_series(s.mn, s.mx, {iv}))
                  AS u(bh)),
    j AS (SELECT {'g.event_type, ' if by else ''}g.bh, b.v
          FROM grid g LEFT JOIN b
          ON {'g.event_type = b.event_type AND ' if by else ''}g.bh = b.bh)
    SELECT {key_sel}bh,
           ROUND(LAST_VALUE(v IGNORE NULLS) OVER ({part} ORDER BY bh
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6)
               AS value,
           v IS NULL AS is_gap
    FROM j
    """
    orows = sorted(map(tuple, duck_events.execute(sql).fetchall()))
    assert srows == orows, f"seed={seed} grain={grain} by={by}"


@pytest.mark.parametrize("seed", range(6))
def test_randomized_gapfill_matches_oracle(spark, duck_events, seed):
    _run_gapfill_case(spark, duck_events, seed)


# ---------------------------------------------------------------------
# correlated / quantified subqueries through the raw-SQL surface
# (the q69/q70/q119-q123 shapes, randomized: Catalyst's decorrelation
# must agree with DuckDB's on arbitrary thresholds and quantifiers)
# ---------------------------------------------------------------------

def _run_subquery_case(spark, duck, seed):
    from elusion_spark.sources.loaders import execute_raw_sql, load_parquet

    rng = random.Random(10_000 + seed)
    pattern = rng.choice(["exists", "not_exists", "in", "not_in",
                          "corr_scalar", "uncorr_scalar"])
    t_price = rng.choice([50_000, 150_000, 250_000, 350_000])
    t_bal = rng.choice([-500.0, 0.0, 2_500.0, 7_500.0])
    frac = rng.choice([0.5, 1.0, 1.5])

    if pattern in ("exists", "not_exists"):
        neg = "NOT " if pattern == "not_exists" else ""
        sql = (
            "SELECT c_custkey, c_acctbal FROM customer "
            f"WHERE c_acctbal > {t_bal!r} AND {neg}EXISTS ("
            "SELECT 1 FROM orders WHERE o_custkey = c_custkey "
            f"AND o_totalprice > {t_price})"
        )
    elif pattern in ("in", "not_in"):
        neg = "NOT " if pattern == "not_in" else ""
        sql = (
            "SELECT c_custkey, c_nationkey FROM customer "
            f"WHERE c_custkey {neg}IN ("
            "SELECT o_custkey FROM orders "
            f"WHERE o_totalprice > {t_price})"
        )
    elif pattern == "corr_scalar":
        # each order vs its own customer's mean (exact-decimal mean so
        # the threshold double is engine-identical)
        sql = (
            "SELECT o_orderkey FROM orders o1 "
            f"WHERE o_totalprice > {frac!r} * ("
            "SELECT CAST(SUM(CAST(o2.o_totalprice AS DECIMAL(38,9))) "
            "AS DOUBLE) / COUNT(*) FROM orders o2 "
            "WHERE o2.o_custkey = o1.o_custkey)"
        )
    else:
        sql = (
            "SELECT c_custkey FROM customer "
            f"WHERE c_acctbal > {frac!r} * ("
            "SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(38,9))) "
            "AS DOUBLE) / COUNT(*) FROM customer c2 "
            f"WHERE c2.c_acctbal > {t_bal!r})"
        )

    c = load_parquet(f"{SF}/customer.parquet", "customer", spark)
    o = load_parquet(f"{SF}/orders.parquet", "orders", spark)
    sdf = execute_raw_sql(sql, f"subq{seed}",
                          {"customer": c, "orders": o}, spark).df
    srows = {tuple(r) for r in sdf.collect()}
    orows = {tuple(r) for r in duck.execute(sql).fetchall()}
    assert srows == orows, (
        f"seed={seed} pattern={pattern}\nsql={sql}\n"
        f"spark-only: {list(srows - orows)[:3]}\n"
        f"oracle-only: {list(orows - srows)[:3]}"
    )


@pytest.mark.parametrize("seed", range(12))
def test_randomized_subqueries_match_oracle(spark, duck, seed):
    _run_subquery_case(spark, duck, seed)


# ---------------------------------------------------------------------
# outer / anti / right-semi joins (the join-type long tail the original
# join family left out: null-extension and exclusion semantics)
# ---------------------------------------------------------------------

def _run_outer_join_case(spark, duck, seed):
    from elusion_spark.sources.loaders import load_parquet

    rng = random.Random(20_000 + seed)
    o_pred = (f"o_totalprice {rng.choice(['<', '>'])} "
              f"{round(rng.uniform(50000, 350000), 2)}")
    c_pred = f"c_nationkey {rng.choice(['<', '>='])} {rng.randint(3, 20)}"
    how = rng.choice(["LEFT ANTI", "LEFT", "FULL", "RIGHT SEMI"])

    # .elusion() materializes each filtered side as a derived table so
    # the predicates apply BEFORE the join — required for semi/anti/full
    # semantics (the builder otherwise applies filters at assembly,
    # after the join has dropped the other side's columns)
    o = (load_parquet(f"{SF}/orders.parquet", "t", spark)
         .filter(o_pred.replace("o_", "t.o_")).elusion("o"))
    c = (load_parquet(f"{SF}/customer.parquet", "u", spark)
         .filter(c_pred.replace("c_", "u.c_")).elusion("c"))
    joined = o.join(c, ["o.o_custkey = c.c_custkey"], how)

    if how == "LEFT ANTI":
        q = (joined.select(["o.o_orderstatus"])
             .agg(["CAST(COUNT(*) AS BIGINT) AS n"]).group_by_all())
        sql = (
            f"SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n "
            f"FROM orders WHERE {o_pred} AND o_custkey NOT IN "
            f"(SELECT c_custkey FROM customer WHERE {c_pred}) "
            f"GROUP BY o_orderstatus"
        )
    elif how == "RIGHT SEMI":
        q = (joined.select(["c.c_mktsegment"])
             .agg(["CAST(COUNT(*) AS BIGINT) AS n"]).group_by_all())
        sql = (
            f"SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n "
            f"FROM customer WHERE {c_pred} AND c_custkey IN "
            f"(SELECT o_custkey FROM orders WHERE {o_pred}) "
            f"GROUP BY c_mktsegment"
        )
    elif how == "LEFT":
        q = (joined.select(["o.o_orderstatus"])
             .agg(["CAST(COUNT(*) AS BIGINT) AS n",
                   "CAST(COUNT(c.c_custkey) AS BIGINT) AS matched"])
             .group_by_all())
        sql = (
            f"SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n, "
            f"CAST(COUNT(c_custkey) AS BIGINT) AS matched "
            f"FROM (SELECT * FROM orders WHERE {o_pred}) o "
            f"LEFT JOIN (SELECT * FROM customer WHERE {c_pred}) c "
            f"ON o_custkey = c_custkey GROUP BY o_orderstatus"
        )
    else:  # FULL
        q = (joined.agg([
            "CAST(COUNT(*) AS BIGINT) AS n",
            "CAST(SUM(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END)"
            " AS BIGINT) AS cust_only",
            "CAST(SUM(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END)"
            " AS BIGINT) AS order_only",
        ]).group_by_all())
        sql = (
            f"SELECT CAST(COUNT(*) AS BIGINT) AS n, "
            f"CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END)"
            f" AS BIGINT) AS cust_only, "
            f"CAST(SUM(CASE WHEN c_custkey IS NULL THEN 1 ELSE 0 END)"
            f" AS BIGINT) AS order_only "
            f"FROM (SELECT * FROM orders WHERE {o_pred}) o "
            f"FULL JOIN (SELECT * FROM customer WHERE {c_pred}) c "
            f"ON o_custkey = c_custkey"
        )

    srows = {tuple(sorted(r.asDict().items()))
             for r in q.to_spark().collect()}
    cur = duck.execute(sql)
    cols = [d[0] for d in cur.description]
    orows = {tuple(sorted(zip(cols, row))) for row in cur.fetchall()}
    assert srows == orows, (
        f"seed={seed} how={how} o={o_pred} c={c_pred}\n"
        f"spark-only: {list(srows - orows)[:3]}\n"
        f"oracle-only: {list(orows - srows)[:3]}"
    )


@pytest.mark.parametrize("seed", range(12))
def test_randomized_outer_joins_match_oracle(spark, duck, seed):
    _run_outer_join_case(spark, duck, seed)


# ---------------------------------------------------------------------
# window FRAME specs: RANGE (peer/tie semantics) and FOLLOWING-only /
# detached frames — the divergence-prone corners the ROWS-only family
# above doesn't reach
# ---------------------------------------------------------------------

def _run_frame_case(spark, duck, seed):
    from elusion_spark.sources.loaders import load_parquet

    rng = random.Random(30_000 + seed)
    k, j = rng.randint(1, 5), rng.randint(0, 4)
    pattern = rng.choice(["range_sum", "range_count", "max_following",
                          "detached_first", "last_bounded"])
    if pattern == "range_sum":
        # ORDER BY user_id has heavy ties within event_type: RANGE
        # includes ALL peers — the semantics ROWS frames never test
        expr = (f"CAST(SUM(CAST(value AS DECIMAL(38,9))) OVER ("
                f"PARTITION BY event_type ORDER BY user_id "
                f"RANGE BETWEEN {k} PRECEDING AND {j} FOLLOWING) "
                f"AS DOUBLE)")
    elif pattern == "range_count":
        expr = ("CAST(COUNT(*) OVER (PARTITION BY event_type "
                "ORDER BY user_id RANGE BETWEEN UNBOUNDED PRECEDING "
                "AND CURRENT ROW) AS BIGINT)")
    elif pattern == "max_following":
        expr = ("CAST(MAX(value) OVER (PARTITION BY user_id "
                "ORDER BY event_id ROWS BETWEEN CURRENT ROW "
                "AND UNBOUNDED FOLLOWING) AS DOUBLE)")
    elif pattern == "detached_first":
        # frame entirely before the current row: empty at partition
        # start -> NULL on both engines
        expr = (f"CAST(FIRST_VALUE(event_id) OVER (PARTITION BY user_id "
                f"ORDER BY event_id ROWS BETWEEN {k + 1} PRECEDING "
                f"AND 1 PRECEDING) AS BIGINT)")
    else:
        expr = (f"CAST(LAST_VALUE(event_id) OVER (PARTITION BY user_id "
                f"ORDER BY event_id ROWS BETWEEN CURRENT ROW "
                f"AND {j + 1} FOLLOWING) AS BIGINT)")

    e = load_parquet(f"{SF}/events.parquet", "e", spark)
    q = e.filter("user_id <= 40").select(["event_id"]).window(
        f"{expr} AS w")
    srows = sorted((r["event_id"], r["w"])
                   for r in q.to_spark().collect())
    sql = f"SELECT event_id, {expr} AS w FROM events WHERE user_id <= 40"
    orows = sorted((a, b) for a, b in duck.execute(sql).fetchall())
    assert srows == orows, f"seed={seed} expr={expr}"


@pytest.mark.parametrize("seed", range(10))
def test_randomized_window_frames_match_oracle(spark, duck_events, seed):
    _run_frame_case(spark, duck_events, seed)


# ---------------------------------------------------------------------
# rollup / cube / grouping sets: subtotal-row semantics (NULL group
# labels, GROUPING() provenance) randomized beyond fixed q47/q99
# ---------------------------------------------------------------------

def _run_rollup_case(spark, duck, seed):
    from elusion_spark.sources.loaders import load_parquet

    rng = random.Random(40_000 + seed)
    mode = rng.choice(["rollup", "cube"])
    keys = rng.sample(["c_mktsegment", "c_nationkey"], rng.randint(1, 2))
    pred = f"c_acctbal {rng.choice(['>', '<='])} {round(rng.uniform(-500, 5000), 2)}"
    agg = rng.choice([
        ("CAST(COUNT(*) AS BIGINT)", "n"),
        ("CAST(SUM(CAST(c_acctbal AS DECIMAL(38,9))) AS DOUBLE)", "s"),
    ])

    c = load_parquet(f"{SF}/customer.parquet", "t", spark).filter(
        pred.replace("c_", "t.c_"))
    keyed = [f"t.{k}" for k in keys]
    # GROUPING() provenance columns resolve THROUGH the builder (the
    # internal grouping aliases are mapped — round-5 fix); BIGINT casts
    # align Spark's tinyint grouping() with DuckDB's
    grp_aggs = [
        f"CAST(GROUPING(t.{k}) AS BIGINT) AS g{i}"
        for i, k in enumerate(keys)
    ]
    grouped = (c.select([f"{k} AS {k.split('.')[1]}" for k in keyed])
               .agg([f"{agg[0].replace('c_acctbal', 't.c_acctbal')} "
                     f"AS {agg[1]}"] + grp_aggs))
    grouped = (grouped.group_by_rollup(keyed) if mode == "rollup"
               else grouped.group_by_cube(keyed))
    srows = {tuple(sorted(r.asDict().items()))
             for r in grouped.to_spark().collect()}

    kl = ", ".join(keys)
    ogrp = ", ".join(
        f"CAST(GROUPING({k}) AS BIGINT) AS g{i}"
        for i, k in enumerate(keys)
    )
    sql = (
        f"SELECT {kl}, {agg[0]} AS {agg[1]}, {ogrp} FROM customer "
        f"WHERE {pred} GROUP BY {mode.upper()}({kl})"
    )
    cur = duck.execute(sql)
    cols = [d[0] for d in cur.description]
    orows = {tuple(sorted(zip(cols, row))) for row in cur.fetchall()}
    assert srows == orows, (
        f"seed={seed} mode={mode} keys={keys} pred={pred}\n"
        f"spark-only: {list(srows - orows)[:3]}\n"
        f"oracle-only: {list(orows - srows)[:3]}"
    )


@pytest.mark.parametrize("seed", range(10))
def test_randomized_rollup_cube_matches_oracle(spark, duck, seed):
    _run_rollup_case(spark, duck, seed)


# ------------------------------------------ round-5 op fuzz families

@pytest.mark.parametrize("seed", range(10))
def test_randomized_leakage_split_matches_oracle(spark, seed):
    """leakage_safe_split text mode vs a DuckDB replay: random family
    sizes, weights, salts, and NULL texts — per-row split + key must
    match exactly, and no family may straddle splits."""
    import pandas as pd

    from elusion_spark.pipeline import leakage_safe_split, split_cuts

    rng = random.Random(1000 + seed)
    n = rng.randint(80, 250)
    nf = rng.randint(5, max(6, n // 4))
    rows = []
    for i in range(n):
        fid = rng.randrange(nf)
        text = None if rng.random() < 0.07 else f"family text {fid}"
        rows.append((i * rng.randint(1, 3) + 7, text))
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"]).drop_duplicates(
        "doc_id")
    names = rng.sample(["train", "val", "test", "holdout"],
                       k=rng.randint(2, 4))
    weights = {nm: rng.uniform(0.1, 1.0) for nm in names}
    salt = rng.randint(0, 99)

    sdf = spark.createDataFrame(pdf)
    got = {
        r["doc_id"]: (r["split"], r["key"])
        for r in leakage_safe_split(
            sdf, "doc_id", weights, text_col="text", salt=salt,
            key_col="key").collect()
    }

    con = duckdb.connect()
    con.register("corpus", pdf)
    case = " ".join(
        f"WHEN ((k % 2147483648 + {salt}) * 2654435761) % 4294967296 "
        f"< {cut} THEN '{nm}'"
        for nm, cut in split_cuts(weights)
    )
    want = {
        int(r[0]): (r[1], int(r[2]))
        for r in con.execute(f"""
            WITH rep AS (
                SELECT doc_id,
                       CAST(MIN(doc_id) OVER (PARTITION BY
                           COALESCE(MD5(text),
                                    'null-' || CAST(doc_id AS VARCHAR)))
                           AS BIGINT) AS k
                FROM corpus)
            SELECT doc_id, CASE {case} ELSE '{list(weights)[-1]}' END, k
            FROM rep""").fetchall()
    }
    con.close()
    assert got == want, f"seed={seed} weights={weights} salt={salt}"
    by_fam = {}
    for doc_id, (split, key) in got.items():
        by_fam.setdefault(key, set()).add(split)
    assert all(len(v) == 1 for v in by_fam.values())


@pytest.mark.parametrize("seed", range(8))
def test_randomized_bloom_prefilter_lossless(spark, seed):
    """prefilter + exact semi join must equal the plain semi join for
    random key types, sizes, fpp — and never drop a true match."""
    from elusion_spark.operators.scale import bloom_prefilter

    rng = random.Random(2000 + seed)
    as_str = rng.random() < 0.5
    cast = "CAST(%s AS STRING)" if as_str else "CAST(%s AS BIGINT)"
    nk = rng.randint(20, 400)
    nf = rng.randint(500, 4000)
    fpp = rng.choice([0.001, 0.01, 0.1])
    keys = spark.range(0, nk).selectExpr(
        cast % f"id * {rng.randint(2, 9)}" + " AS k")
    fact = spark.range(0, nf).selectExpr(
        "id", cast % f"id % {rng.randint(50, 2000)}" + " AS k")
    pre = bloom_prefilter(fact, keys, "k", fpp=fpp)
    plain = fact.join(keys, "k", "semi")
    exact = pre.join(keys, "k", "semi")
    a = sorted(r["id"] for r in plain.collect())
    b = sorted(r["id"] for r in exact.collect())
    assert a == b, f"seed={seed} str={as_str} fpp={fpp}"
    # no false negatives even before the exact join
    assert plain.join(pre.select("id"), "id", "anti").count() == 0


@pytest.mark.parametrize("seed", range(8))
def test_randomized_retrieval_metrics_match_oracle(spark, seed):
    """retrieval_metrics vs a DuckDB replay on random result lists and
    (optionally graded) relevance sets — random k, overlap rates,
    score ties (broken by doc id on both sides)."""
    import pandas as pd

    from elusion_spark.operators.similarity import retrieval_metrics

    rng = random.Random(3000 + seed)
    k = rng.randint(1, 6)
    graded = rng.random() < 0.5
    nq = rng.randint(3, 12)
    res_rows, qrel_rows = [], []
    for qid in range(nq):
        docs = rng.sample(range(100), rng.randint(0, 15))
        for d in docs:
            # coarse scores force ties -> exercises the doc-id tiebreak
            res_rows.append((qid, d, round(rng.uniform(0, 1), 1)))
        for d in rng.sample(range(100), rng.randint(0, 6)):
            qrel_rows.append(
                (qid, d, float(rng.randint(1, 3)) if graded else 1.0))
    if not qrel_rows:
        qrel_rows.append((0, 1, 1.0))
    res = pd.DataFrame(res_rows, columns=["query_id", "doc_id", "score"])
    qr = pd.DataFrame(qrel_rows, columns=["query_id", "doc_id", "rel"]) \
        .drop_duplicates(["query_id", "doc_id"])

    sres = spark.createDataFrame(res) if len(res) else \
        spark.createDataFrame([], "query_id long, doc_id long, score double")
    sqr = spark.createDataFrame(qr)
    got = {
        r["query_id"]: (r["n_rel"], r["hits"],
                        round(r[f"precision_{k}"], 7),
                        round(r[f"recall_{k}"], 7),
                        round(r["mrr"], 7), round(r["ndcg"], 7))
        for r in retrieval_metrics(sres, sqr, rel_col="rel", k=k).collect()
    }

    con = duckdb.connect()
    con.register("res", res)
    con.register("qr", qr)
    want = {
        int(r[0]): (int(r[1]), int(r[2]), r[3], r[4], r[5], r[6])
        for r in con.execute(f"""
        WITH ranked AS (
            SELECT query_id, doc_id,
                   ROW_NUMBER() OVER (PARTITION BY query_id
                       ORDER BY score DESC, doc_id) AS rk
            FROM res),
        matched AS (
            SELECT r.query_id, COUNT(*) AS hits, MIN(rk) AS frk,
                   SUM((POW(2, rel) - 1) / log2(rk + 1)) AS dcg
            FROM ranked r JOIN qr USING (query_id, doc_id)
            WHERE rk <= {k} GROUP BY r.query_id),
        rel_s AS (
            SELECT query_id, COUNT(*) AS n_rel,
                   SUM(CASE WHEN irk <= {k}
                       THEN (POW(2, rel) - 1) / log2(irk + 1)
                       ELSE 0 END) AS idcg
            FROM (SELECT query_id, rel,
                         ROW_NUMBER() OVER (PARTITION BY query_id
                             ORDER BY rel DESC, doc_id) AS irk FROM qr)
            GROUP BY query_id)
        SELECT s.query_id, n_rel, COALESCE(hits, 0),
               ROUND(COALESCE(hits, 0) / {k}.0, 7),
               ROUND(CAST(COALESCE(hits, 0) AS DOUBLE) / n_rel, 7),
               ROUND(COALESCE(1.0 / frk, 0.0), 7),
               ROUND(CASE WHEN idcg > 0
                     THEN COALESCE(dcg, 0.0) / idcg ELSE 0.0 END, 7)
        FROM rel_s s LEFT JOIN matched m ON s.query_id = m.query_id
        """).fetchall()
    }
    con.close()
    assert got == want, f"seed={seed} k={k} graded={graded}"
