from .loaders import (
    load,
    load_csv,
    load_json,
    load_parquet,
    load_delta,
    load_folder,
    execute_raw_sql,
)

__all__ = [
    "load",
    "load_csv",
    "load_json",
    "load_parquet",
    "load_delta",
    "load_folder",
    "execute_raw_sql",
]
