from .writers import (
    CsvWriteOptions,
    write_to_parquet,
    write_to_csv,
    write_to_excel,
    write_to_json,
    write_to_delta,
    stream_write,
)

__all__ = [
    "CsvWriteOptions",
    "write_to_parquet",
    "write_to_csv",
    "write_to_excel",
    "write_to_json",
    "write_to_delta",
    "stream_write",
]
