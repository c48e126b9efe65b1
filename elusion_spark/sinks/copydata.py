"""File→file format conversion — parity with ``copy_data`` /
``copy_file_to_parquet`` / ``copy_file_to_csv``
(features/copydata.rs:39-174 config, 285-920 engine, 925-1100 APIs).

The reference hand-rolls a batched out-of-core copy loop (batch_size
10k-500k rows).  Spark IS that engine: ``spark.read.X → df.write.Y``
streams partition-by-partition with no driver materialization, so the
whole module reduces to reader/writer plumbing — batch_size is accepted
for API parity but only influences ``maxRecordsPerFile``."""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import SparkSession


@dataclass
class CopyConfig:
    """copydata.rs:39-174 knobs."""

    batch_size: int = 10_000  # → maxRecordsPerFile
    compression: str = "snappy"  # parquet: snappy|uncompressed|zstd|gzip
    delimiter: str = ","  # csv source/sink
    header: bool = True
    reader_options: dict = field(default_factory=dict)
    writer_options: dict = field(default_factory=dict)


def copy_data(
    source: str,
    dest: str,
    config: CopyConfig | None = None,
    spark: SparkSession | None = None,
) -> int:
    """Copy ``source`` (csv/json/parquet by extension) to ``dest``
    (likewise).  Returns rows copied.  Distributed end-to-end: the only
    driver work is the count."""
    from ..sources.loaders import load

    cfg = config or CopyConfig()
    spark = spark or SparkSession.getActiveSession()
    df = load(
        source, "copy_src", spark,
        **({"delimiter": cfg.delimiter} if source.lower().endswith(".csv") else {}),
    ).df
    fmt = os.path.splitext(dest)[1].lower().lstrip(".")
    if fmt not in ("parquet", "csv", "json"):
        raise ValueError(f"copy_data: unsupported destination format {fmt!r}")
    writer = df.write.mode("overwrite").option(
        "maxRecordsPerFile", cfg.batch_size
    )
    if fmt == "parquet":
        writer = writer.option("compression", cfg.compression)
    if fmt == "csv":
        writer = writer.option("header", cfg.header).option("sep", cfg.delimiter)
    for k, v in cfg.writer_options.items():
        writer = writer.option(k, v)
    writer.format(fmt).save(dest)
    return df.count()


def copy_file_to_parquet(source: str, dest: str,
                         config: CopyConfig | None = None,
                         spark: SparkSession | None = None) -> int:
    """copydata.rs:925-1000."""
    if not dest.lower().endswith(".parquet"):
        dest = dest + ".parquet"
    return copy_data(source, dest, config, spark)


def copy_file_to_csv(source: str, dest: str,
                     config: CopyConfig | None = None,
                     spark: SparkSession | None = None) -> int:
    """copydata.rs:1000-1100."""
    if not dest.lower().endswith(".csv"):
        dest = dest + ".csv"
    return copy_data(source, dest, config, spark)


def copy_file_to_fabric(source: str, onelake_url: str,
                        config: CopyConfig | None = None,
                        spark: SparkSession | None = None, **auth) -> int:
    """copydata.rs:925-1100 family — file → OneLake (Fabric) copy: the
    source file's BYTES are shipped as-is via the ADLS create/append/
    flush sequence with a service-principal token (a faithful file copy
    — no format conversion, matching the reference's fabric copy).  For
    distributed copies of big datasets use hadoop-azure + copy_data to
    an abfss:// destination instead."""
    from ..errors import FeatureNotAvailable
    from ..sources.connectors import _ms_token, _require_sp_creds
    from .writers import _onelake_upload

    tenant, cid, secret = _require_sp_creds(auth, "OneLake (Fabric) copies")
    with open(source, "rb") as f:
        data = f.read()
    try:
        token = _ms_token(tenant, cid, secret,
                          "https://storage.azure.com/.default")
        _onelake_upload(onelake_url, token, data)
    except OSError as e:
        raise FeatureNotAvailable(
            f"OneLake endpoint unreachable ({e})",
            "Check egress to onelake.dfs.fabric.microsoft.com; for "
            "distributed copies use hadoop-azure + copy_data to "
            "abfss:// (copydata.rs:925-1100 parity).",
        )
    return len(data)
