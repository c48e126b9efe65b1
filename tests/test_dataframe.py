"""Builder-semantics tests: star expansion dedup, order-insensitivity,
group_by_all, having hidden aggs, positional union, cleaning queue,
json ops, pivot naming — the SURVEY §7.4 'hard parts'."""

import pytest

from elusion_spark import CustomDataFrame
from elusion_spark.errors import GroupByAllError, InvalidOperation


@pytest.fixture()
def sales(spark):
    df = spark.createDataFrame(
        [(1, "a", 10.0, 1), (2, "b", 20.0, 1), (3, "a", 30.0, 2),
         (4, "c", 40.0, 2), (5, "a", 50.0, 3)],
        ["id", "cat", "amount", "region_id"],
    )
    return CustomDataFrame(df, "s")


@pytest.fixture()
def regions(spark):
    df = spark.createDataFrame(
        [(1, "north"), (2, "south"), (3, "east")], ["region_id", "region_name"]
    )
    return CustomDataFrame(df, "r")


def test_order_insensitive_clauses(sales):
    """Clauses in ANY order produce the same result (README.md:24-27)."""
    a = (
        sales.order_by(["cat"]).having("COUNT(*) > 1")
        .agg(["COUNT(*) AS n"]).select(["cat"]).group_by_all()
    )
    b = (
        sales.select(["cat"]).agg(["COUNT(*) AS n"])
        .group_by_all().having("COUNT(*) > 1").order_by(["cat"])
    )
    assert [tuple(r) for r in a.collect()] == [tuple(r) for r in b.collect()]
    assert [r["cat"] for r in a.collect()] == ["a"]


def test_star_expansion_dedup(sales, regions):
    """'*' after a join drops later duplicate base names — main table wins
    (elusion.rs:3073-3147)."""
    j = sales.join(regions, ["s.region_id = r.region_id"], "INNER").select(["*"])
    cols = j.to_spark().columns
    assert cols.count("region_id") == 1
    assert set(cols) == {"id", "cat", "amount", "region_id", "region_name"}


def test_alias_star(sales, regions):
    j = sales.join(regions, ["s.region_id = r.region_id"], "INNER").select(["r.*"])
    assert j.to_spark().columns == ["region_id", "region_name"]


def test_group_by_all_groups_plain_columns_only(sales):
    out = (
        sales.select(["cat"])
        .agg(["CAST(SUM(CAST(amount AS DECIMAL(38,9))) AS DOUBLE) AS total"])
        .group_by_all()
        .order_by(["cat"])
        .collect()
    )
    assert [(r["cat"], r["total"]) for r in out] == [
        ("a", 90.0), ("b", 20.0), ("c", 40.0)
    ]


def test_group_by_all_rejects_only_computed(sales):
    with pytest.raises(GroupByAllError):
        (
            sales.select(["UPPER(cat) || 'x' AS weird"])
            .agg(["COUNT(*) AS n"])
            .group_by_all()
            .to_spark()
        )


def test_having_with_raw_agg_not_in_select(sales):
    out = (
        sales.select(["cat"]).agg(["COUNT(*) AS n"]).group_by_all()
        .having("SUM(amount) > 50")
        .collect()
    )
    assert sorted(r["cat"] for r in out) == ["a"]
    # hidden helper column must not leak
    assert set(out[0].asDict()) == {"cat", "n"}


def test_having_agg_text_inside_string_literal_survives(spark):
    """HAVING substitution must not rewrite agg-call text that appears
    inside a string literal (ADVICE r1: plain str.replace corrupted
    ``label = 'SUM(amount)'`` into ``label = '__h0'``)."""
    df = spark.createDataFrame(
        [("a", 10.0, "SUM(amount)"), ("a", 20.0, "SUM(amount)"),
         ("b", 5.0, "other")],
        ["cat", "amount", "label"],
    )
    out = (
        CustomDataFrame(df, "t")
        .select(["cat"]).agg(["COUNT(*) AS n"]).group_by_all()
        .having("SUM(amount) > 0 AND MIN(label) = 'SUM(amount)'")
        .collect()
    )
    # only 'a' rows carry the literal label; corruption would return []
    assert [r["cat"] for r in out] == ["a"]


def test_union_is_positional(spark):
    a = CustomDataFrame(spark.createDataFrame([(1, "x")], ["k", "v"]), "a")
    b = CustomDataFrame(spark.createDataFrame([(2, "y")], ["id", "name"]), "b")
    # positional union: columns matched by POSITION not name
    # (elusion.rs:1454-1458) — unionByName would reject these frames
    out = a.union_all(b).to_spark()
    assert out.columns == ["k", "v"]
    assert sorted((r["k"], r["v"]) for r in out.collect()) == [(1, "x"), (2, "y")]


def test_union_distinct_and_append(spark):
    a = CustomDataFrame(spark.createDataFrame([(1,), (2,)], ["k"]), "a")
    b = CustomDataFrame(spark.createDataFrame([(2,), (3,)], ["k"]), "b")
    assert a.union(b).to_spark().count() == 3
    assert a.union_all(b).to_spark().count() == 4
    assert a.append(b).to_spark().count() == 4
    assert a.except_(b).to_spark().count() == 1
    assert a.intersect(b).to_spark().count() == 1
    assert a.union_many([b, b]).to_spark().count() == 3


def test_fill_null_sentinels(spark):
    df = spark.createDataFrame(
        [(1, "x"), (2, None), (3, ""), (4, "NA"), (5, " n/a "), (6, "-")],
        ["id", "v"],
    )
    out = (
        CustomDataFrame(df, "t").fill_null(["v"], "filled").to_spark().collect()
    )
    vals = {r["id"]: r["v"] for r in out}
    assert vals == {1: "x", 2: "filled", 3: "filled", 4: "filled",
                    5: "filled", 6: "filled"}


def test_drop_null_sentinels(spark):
    df = spark.createDataFrame(
        [(1, "x"), (2, None), (3, "null"), (4, "ok")], ["id", "v"]
    )
    out = CustomDataFrame(df, "t").drop_null(["v"]).to_spark().collect()
    assert sorted(r["id"] for r in out) == [1, 4]


def test_fill_down_with_order(spark):
    df = spark.createDataFrame(
        [(1, "site1"), (2, None), (3, ""), (4, "site2"), (5, None)],
        ["seq", "site"],
    )
    out = (
        CustomDataFrame(df, "t")
        .fill_down(["site"], order_by="seq")
        .to_spark()
        .orderBy("seq")
        .collect()
    )
    assert [r["site"] for r in out] == ["site1", "site1", "site1", "site2", "site2"]


def test_drop_duplicates_by_column_deterministic(spark):
    df = spark.createDataFrame(
        [(1, "a", 100), (1, "a", 50), (2, "b", 10)], ["uid", "em", "payload"]
    )
    out = (
        CustomDataFrame(df, "t")
        .drop_duplicates_by_column(["uid", "em"], order_by="payload")
        .to_spark()
        .orderBy("uid")
        .collect()
    )
    assert [(r["uid"], r["payload"]) for r in out] == [(1, 50), (2, 10)]


def test_pivot_column_naming_and_zero_fill(spark):
    df = spark.createDataFrame(
        [("x", "A", 1.0), ("x", "B", 2.0), ("y", "A", 3.0)],
        ["k", "p", "v"],
    )
    out = CustomDataFrame(df, "t").pivot(["k"], "p", "v", "SUM")
    rows = {r["k"]: r for r in out.to_spark().collect()}
    assert set(out.to_spark().columns) == {"k", "p_A", "p_B"}
    assert rows["y"]["p_B"] == 0  # COALESCE(...,0) (elusion.rs:2015-2020)


def test_unpivot_mixed_types_promote(spark):
    df = spark.createDataFrame([(1, 2, 3.5)], ["id", "a", "b"])
    out = CustomDataFrame(df, "t").unpivot(["id"], ["a", "b"], "m", "val")
    schema = {f.name: f.dataType.simpleString() for f in out.to_spark().schema.fields}
    assert schema["val"] == "double"
    assert out.to_spark().count() == 2


def test_json_and_json_array(spark):
    df = spark.createDataFrame(
        [
            (1, '{"Key1": "v1", "Key2": "2022-09-15"}',
             '[{"Id": "Date", "Value": "2022-09-15"}, {"Id": "Timeline", "Value": "1.0"}]'),
        ],
        ["id", "flat", "arr"],
    )
    t = CustomDataFrame(df, "t")
    out = t.select(["id"]).json(["flat.'$Key1' AS k1"]).to_spark().collect()[0]
    assert out["k1"] == "v1"
    out2 = (
        t.select(["id"]).json_array(["arr.'$Value:Id=Date' AS datev"])
        .to_spark().collect()[0]
    )
    assert out2["datev"] == "2022-09-15"


def test_window_can_use_unselected_columns(sales):
    out = (
        sales.select(["id"])
        .window("SUM(amount) OVER (PARTITION BY cat) AS cat_total")
        .to_spark()
    )
    assert set(out.columns) == {"id", "cat_total"}


def test_right_semi_anti(spark, sales, regions):
    semi = regions.join(sales, ["r.region_id = s.region_id"], "RIGHT SEMI")
    # RIGHT SEMI returns right-side (sales) rows that match
    assert semi.to_spark().count() == 5
    anti = regions.join(
        CustomDataFrame(sales.df.filter("region_id < 3"), "s"),
        ["r.region_id = s.region_id"], "RIGHT ANTI",
    )
    assert anti.to_spark().count() == 0


def test_head_tail_offset(sales):
    ordered = sales.order_by(["id"])
    assert [r["id"] for r in ordered.head(2).collect()] == [1, 2]
    assert [r["id"] for r in ordered.limit(5).tail(2).collect()] == [4, 5]
    assert [r["id"] for r in ordered.skip_rows(3).collect()] == [4, 5]


def test_select_varargs_and_string_functions(sales):
    out = sales.select("id", "UPPER(cat) AS cat_up").to_spark()
    assert set(out.columns) == {"id", "cat_up"}
    out2 = sales.string_functions(["INITCAP(cat) AS c2"]).select(["id"]).to_spark()
    assert set(out2.columns) == {"id", "c2"}


def test_empty_host(spark):
    out = CustomDataFrame.empty(spark).select(["dummy * 2 AS d2"]).collect()
    assert out[0]["d2"] == 2


def test_group_by_all_window_dependency_preflight(spark):
    from elusion_spark.errors import GroupByAllError
    from elusion_spark.sources.loaders import load_parquet

    c = load_parquet("/root/testdata/sf0.001/customer.parquet", "c", spark)
    q = (
        c.select(["c_mktsegment"])
        .agg(["COUNT(*) AS n"])
        .group_by_all()
        .window("ROW_NUMBER() OVER (ORDER BY c_acctbal DESC) AS rn")
    )
    with pytest.raises(GroupByAllError, match="c_acctbal"):
        q.to_spark()
    # the fix the error suggests works: select the dependency
    ok = (
        c.select(["c_mktsegment"])
        .agg(["COUNT(*) AS n"])
        .group_by_all()
        .window("ROW_NUMBER() OVER (ORDER BY n DESC) AS rn")
    )
    assert ok.to_spark().count() > 0


def test_multi_star_dedup_across_stars(spark):
    """README.md:1899-2089: s.* then c.* — shared base names keep the
    FIRST (main-table) occurrence; explicit columns never dedup."""
    from elusion_spark import CustomDataFrame

    s = CustomDataFrame.from_spark(
        spark.createDataFrame([(1, 10, "s1")], ["customerkey", "productkey", "s_only"]),
        "s",
    )
    c = CustomDataFrame.from_spark(
        spark.createDataFrame([(1, "alice")], ["customerkey", "firstname"]), "c"
    )
    out = (
        s.join(c, ["s.customerkey = c.customerkey"], "INNER")
        .select(["s.*", "c.*"])
        .to_spark()
    )
    assert out.columns == ["customerkey", "productkey", "s_only", "firstname"]

    explicit = (
        s.join(c, ["s.customerkey = c.customerkey"], "INNER")
        .select(["s.customerkey AS s_key", "c.customerkey AS c_key"])
        .to_spark()
    )
    assert explicit.columns == ["s_key", "c_key"]


def test_reference_readme_method_surface(spark):
    """Every method name a user calls in the reference README's examples
    resolves on the matching surface here (CustomDataFrame method,
    package-level function, ElusionApi or SchemaBuilder method) — the
    'switch engines without rewriting your code' checklist."""
    import elusion_spark as es
    from elusion_spark.dataframe import CustomDataFrame
    from elusion_spark.sources.connectors import ElusionApi
    from elusion_spark.sources.schema import SchemaBuilder

    on_frame = """
        select agg filter filter_many group_by group_by_all having
        having_many order_by order_by_many limit join join_many window
        string_functions datetime_functions fill_null drop_null
        drop_duplicates drop_duplicates_by_column pivot unpivot union
        union_all union_many union_all_many skip_rows json json_array
        display display_query display_query_with_info df_schema
        show_head show_tail head tail peek broadcast elusion
        elusion_streaming elusion_streaming_write elusion_with_redis_cache
        display_stats display_null_analysis display_correlation_matrix
        plot_line plot_time_series plot_bar plot_scatter plot_histogram
        plot_box plot_pie plot_donut plot_waterfall
        write_to_parquet write_to_csv write_to_json write_to_delta_table
        write_to_excel write_parquet_to_azure_with_sas
        write_json_to_azure_with_sas write_parquet_to_fabric
        write_parquet_to_fabric_with_service_principal
        write_csv_to_ftp write_parquet_to_ftp write_json_to_ftp
        write_excel_to_ftp
    """.split()
    missing = [m for m in on_frame if not hasattr(CustomDataFrame, m)]
    assert not missing, f"CustomDataFrame lacks reference methods {missing}"
    # `except` is a Python keyword; the documented spelling is except_
    assert hasattr(CustomDataFrame, "except_")

    on_api = """
        from_api from_api_with_headers from_api_with_params
        from_api_with_dates from_api_with_pagination from_api_with_sort
        from_api_with_headers_and_sort from_api_with_params_and_headers
    """.split()
    missing = [m for m in on_api if not hasattr(ElusionApi, m)]
    assert not missing, f"ElusionApi lacks {missing}"

    at_root = """
        from_postgres from_mysql from_azure_with_sas_token from_fabric
        load_from_sharepoint from_ftp from_ftps ftp_list_files load_excel
        write_to_excel copy_data copy_file_to_parquet copy_file_to_csv
        copy_file_to_fabric compact_files
    """.split()
    missing = [m for m in at_root if not hasattr(es, m)]
    assert not missing, f"package root lacks {missing}"
    assert hasattr(SchemaBuilder, "build")

    # shims actually run: plots return plotly payloads, show_head prints
    df = es.CustomDataFrame(
        spark.createDataFrame([("a", 1.0), ("b", 2.0)], ["k", "v"]), "p")
    fig = df.plot_bar("k", "v", title="T")
    assert fig["layout"]["title"] == {"text": "T"} and fig["data"]
    assert df.plot_time_series("k", "v", True, "TS")["data"]
    stats = df.display_stats()
    assert stats.count() >= 1
    df.show_head(1)
    df.show_tail(1)


def test_grouping_provenance_through_builder(spark):
    """GROUPING()/GROUPING_ID() resolve through group_by_rollup /
    group_by_cube in agg, select and having position (round-5 fix:
    previously the internal grouping aliases broke resolution and the
    only path was raw SQL)."""
    import pytest

    from elusion_spark import CustomDataFrame
    from elusion_spark.errors import GroupByAllError

    df = CustomDataFrame(
        spark.createDataFrame(
            [("a", "x", 1.0), ("a", "y", 2.0), ("b", "x", 4.0)],
            ["k1", "k2", "v"],
        ),
        "t",
    )
    # agg position + grouping_id
    out = {
        (r["k1"], r["k2"]): (r["n"], r["g1"], r["gid"])
        for r in (
            df.select(["k1", "k2"])
            .agg(["COUNT(*) AS n",
                  "CAST(GROUPING(k1) AS INT) AS g1",
                  "CAST(GROUPING_ID(k1, k2) AS INT) AS gid"])
            .group_by_rollup(["k1", "k2"])
            .elusion("g1x").df.collect()
        )
    }
    assert out[("a", "x")] == (1, 0, 0)
    assert out[("a", None)] == (2, 0, 1)     # k2 subtotal
    assert out[(None, None)] == (3, 1, 3)    # grand total
    # select position + having filter to the subtotal band
    sub = (
        df.select(["k1", "CAST(GROUPING(k1) AS INT) AS gk"])
        .agg(["COUNT(*) AS n"])
        .group_by_cube(["k1"])
        .having("GROUPING(k1) = 0")
        .elusion("g2x").df.collect()
    )
    assert sorted((r["k1"], r["gk"], r["n"]) for r in sub) == [
        ("a", 0, 2), ("b", 0, 1)]
    # non-grouping argument raises the friendly error
    with pytest.raises(GroupByAllError, match="not a rollup grouping"):
        (df.select(["k1"]).agg(["GROUPING(k2) AS g"])
         .group_by_rollup(["k1"]).elusion("g3x"))
