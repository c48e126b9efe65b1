"""CSV smart-typing classifier tests — the F6 dirty-CSV corpus from
FIXTURES.md, mirroring the reference's csv.rs test block (csv.rs:830-1974)."""

from elusion_spark.sources.csv_inference import classify_column, classify_value


def test_classify_ints():
    assert classify_value("42") == "int"
    assert classify_value("-7") == "int"
    assert classify_value("+13") == "int"


def test_classify_floats():
    assert classify_value("1234.56") == "float_us"
    assert classify_value("-0.5") == "float_us"
    assert classify_value("1234,56") == "float_eu"


def test_classify_thousands():
    assert classify_value("1,234.56") == "thousands_us"
    assert classify_value("12,345,678.90") == "thousands_us"
    assert classify_value("1.234,56") == "thousands_eu"


def test_classify_percent_currency():
    assert classify_value("15%") == "percent"
    assert classify_value("3,5%") == "percent"
    assert classify_value("$1,234.56") == "currency"
    assert classify_value("1234 €") == "currency"


def test_classify_booleans():
    for v in ("true", "false", "yes", "no", "da", "ne"):
        assert classify_value(v) == "boolean", v
    # 1/0 are NOT booleans (csv.rs boolean set excludes them)
    assert classify_value("1") == "int"


def test_classify_dates_stay_string():
    assert classify_value("2024-01-15") == "date"
    assert classify_value("15.01.2024") == "date"
    assert classify_value("12:30:45") == "date"
    assert classify_column(["2024-01-15"] * 100) == "string"


def test_version_numbers_stay_string():
    assert classify_value("1.2.3") == "string"
    assert classify_value("999.999.999") == "string"


def test_email_stays_string():
    assert classify_value("a@b.com") == "string"


def test_null_sentinels():
    for v in ("", "NULL", "null", "N/A", "n/a", "-", None):
        assert classify_value(v) == "null", v


def test_majority_vote():
    # 70% ints + 30% words → below 0.8 → string
    vals = ["1"] * 70 + ["word"] * 30
    assert classify_column(vals) == "string"
    # 90% ints + nulls don't count against the vote
    vals = ["1"] * 90 + [None] * 10
    assert classify_column(vals) == "int"
    # mixed int+float → numeric family, dominant shape float
    vals = ["1"] * 40 + ["1.5"] * 60
    assert classify_column(vals) == "float_us"


def test_cast_pipeline(spark, tmp_path):
    """End-to-end: dirty CSV loads with correct types and values."""
    p = tmp_path / "dirty.csv"
    rows = ["clean_int,eu_float,thousands_eu,percent,currency,flag,version"]
    for i in range(20):
        rows.append(f"{i},12{i},34,1.2{i}4,56,{i}5%,$1\"\",\"\"23{i}.50,da,1.2.{i}")
    # simpler: write a clean controlled file
    p.write_text(
        "clean_int;eu_float;thousands_eu;percent;currency;flag;version\n"
        + "\n".join(
            f"{i};12{i},34;1.23{i % 10},56;{i}5%;${i}234.50;da;1.22.{i}"
            for i in range(20)
        )
    )
    from elusion_spark.sources.loaders import load_csv

    cdf = load_csv(str(p), "dirty", spark)
    schema = {f.name: f.dataType.simpleString() for f in cdf.df.schema.fields}
    assert schema["clean_int"] == "bigint"
    assert schema["eu_float"] == "double"
    assert schema["thousands_eu"] == "double"
    assert schema["percent"] == "double"
    assert schema["currency"] == "double"
    assert schema["flag"] == "boolean"
    assert schema["version"] == "string"
    row = cdf.df.orderBy("clean_int").collect()[1]
    assert row["clean_int"] == 1
    assert abs(row["eu_float"] - 121.34) < 1e-9
    assert abs(row["thousands_eu"] - 1231.56) < 1e-9
    assert abs(row["percent"] - 0.15) < 1e-9
    assert abs(row["currency"] - 1234.50) < 1e-9
    assert row["flag"] is True
    assert row["version"] == "1.22.1"


def test_delimiter_sniffing(tmp_path):
    from elusion_spark.sources.loaders import sniff_delimiter

    for sep in (",", ";", "\t", "|"):
        p = tmp_path / f"sniff_{ord(sep)}.csv"
        p.write_text(
            f"a{sep}b{sep}c\n" + "\n".join(f"1{sep}2{sep}3" for _ in range(5))
        )
        assert sniff_delimiter(str(p)) == sep


# ------------------------------------------------- xlsx codec properties

def test_xlsx_lite_property_roundtrip(tmp_path):
    """Property: any grid of supported cell values survives
    write_xlsx -> read_xlsx byte-exactly (strings incl. XML-hostile
    control chars / lone _xHHHH_ literals via OOXML escaping; ints;
    repr-exact floats; bools; None; dates; millisecond datetimes)."""
    import datetime as dt

    from hypothesis import given, settings, strategies as st

    from elusion_spark.sources.xlsx_lite import read_xlsx, write_xlsx

    cell = st.one_of(
        st.none(),
        st.booleans(),
        st.integers(min_value=-2**53, max_value=2**53),
        st.floats(allow_nan=False, allow_infinity=False, width=64),
        st.text(max_size=40),
        st.just("_x0041_literal"),   # must NOT unescape to 'A'
        st.dates(min_value=dt.date(1901, 1, 1),
                 max_value=dt.date(2200, 1, 1)),
        st.datetimes(min_value=dt.datetime(1901, 1, 1),
                     max_value=dt.datetime(2200, 1, 1)).map(
            lambda d: d.replace(microsecond=(d.microsecond // 1000) * 1000)),
    )

    @settings(max_examples=40, deadline=None)
    @given(st.lists(st.lists(cell, min_size=1, max_size=5), min_size=1,
                    max_size=6), st.integers(min_value=0, max_value=1 << 30))
    def run(rows, salt):
        width = max(len(r) for r in rows)
        rows = [r + [None] * (width - len(r)) for r in rows]
        header = [f"c{i}" for i in range(width)]
        p = str(tmp_path / f"prop_{salt}.xlsx")
        write_xlsx(p, header, rows)
        got = read_xlsx(p)
        assert got[0] == header
        for want_row, got_row in zip(rows, got[1:]):
            for want, got_v in zip(want_row, got_row):
                if isinstance(want, float):
                    assert isinstance(got_v, float) and (
                        got_v == want or repr(got_v) == repr(want))
                else:
                    assert got_v == want, (want, got_v)

    run()
