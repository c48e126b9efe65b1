"""Date-dimension (calendar) tables.

Parity target: ``create_date_range_table`` /
``create_formatted_date_range_table`` (features/calendar.rs:44-370, 376+;
golden column list README.md:1484-1529).  The reference builds rows one by
one with chrono; Spark-first this is one ``explode(sequence(...))`` over a
literal range — fully distributed, no driver loop.

Column semantics (all computed with Spark built-ins):
- day_of_week follows Spark's ``dayofweek``: 1=Sunday … 7=Saturday.
- week_num is ISO week (``weekofyear``).
- week_start honours the Mon/Sun convention parameter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def create_date_range_table(
    spark: SparkSession,
    start_date: str,
    end_date: str,
    alias: str = "date_table",
    week_start: str = "mon",
):
    """14-column calendar dimension (README.md:1484-1497)."""
    from ..dataframe import CustomDataFrame

    base = spark.sql(
        f"SELECT explode(sequence(to_date('{start_date}'), "
        f"to_date('{end_date}'), interval 1 day)) AS date"
    )
    if week_start.lower().startswith("mon"):
        week_offset = "(dayofweek(date) + 5) % 7"  # days since Monday
    else:
        week_offset = "dayofweek(date) - 1"  # days since Sunday
    df = base.select(
        "date",
        F.expr("CAST(year(date) AS BIGINT) AS year"),
        F.expr("CAST(month(date) AS BIGINT) AS month"),
        F.expr("CAST(day(date) AS BIGINT) AS day"),
        F.expr("CAST(quarter(date) AS BIGINT) AS quarter"),
        F.expr("CAST(weekofyear(date) AS BIGINT) AS week_num"),
        F.expr("CAST(dayofweek(date) AS BIGINT) AS day_of_week"),
        F.expr("date_format(date, 'EEEE') AS day_of_week_name"),
        F.expr("CAST(dayofyear(date) AS BIGINT) AS day_of_year"),
        F.expr(f"date_sub(date, {week_offset}) AS week_start"),
        F.expr("CAST(date_trunc('month', date) AS DATE) AS month_start"),
        F.expr("CAST(date_trunc('quarter', date) AS DATE) AS quarter_start"),
        F.expr("CAST(date_trunc('year', date) AS DATE) AS year_start"),
        F.expr("dayofweek(date) IN (1, 7) AS is_weekend"),
    )
    return CustomDataFrame(df, alias)


def create_formatted_date_range_table(
    spark: SparkSession,
    start_date: str,
    end_date: str,
    alias: str = "date_table",
    date_format: str = "yyyy-MM-dd",
    week_start: str = "mon",
):
    """Formatted variant (calendar.rs:44-370): adds *_end period columns
    and a formatted date string with the requested pattern."""
    cdf = create_date_range_table(spark, start_date, end_date, alias, week_start)
    df = cdf.df
    df = df.withColumns(
        {
            "date_formatted": F.date_format("date", date_format),
            "week_end": F.expr("date_add(week_start, 6)"),
            "month_end": F.expr("last_day(date)"),
            "quarter_end": F.expr(
                "date_sub(CAST(date_trunc('quarter', add_months(date, 3)) AS DATE), 1)"
            ),
            "year_end": F.expr(
                "date_sub(CAST(date_trunc('year', add_months(date, 12)) AS DATE), 1)"
            ),
        }
    )
    from ..dataframe import CustomDataFrame

    return CustomDataFrame(df, alias)
