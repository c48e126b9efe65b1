"""Scalar/row extraction helpers — parity with
helper_funcs/extrac_val_from_df.rs:1-66 and extrac_row_from_df.rs:1-69
(used by the reference to feed query results into API parameters).

Driver-side by design; bounded by ``limit(row+1)`` so only the needed
prefix ever crosses to the driver."""

from __future__ import annotations


def _df(obj):
    from ..dataframe import CustomDataFrame

    return obj._assemble() if isinstance(obj, CustomDataFrame) else obj


def extract_value_from_df(df, column: str, row: int = 0):
    """Single cell (extrac_val_from_df.rs). Returns None when the row
    doesn't exist — matching the reference's Option-style behavior."""
    rows = _df(df).select(column).limit(row + 1).collect()
    if len(rows) <= row:
        return None
    return rows[row][0]


def extract_row_from_df(df, row: int = 0) -> dict | None:
    """Whole row as a dict (extrac_row_from_df.rs)."""
    rows = _df(df).limit(row + 1).collect()
    if len(rows) <= row:
        return None
    return rows[row].asDict()
