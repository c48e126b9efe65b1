"""Writers.

Parity targets: write_to_parquet overwrite/append (elusion.rs:5182-5374),
write_to_csv with CsvWriteOptions (elusion.rs:5377-5723), write_to_json
array-form (elusion.rs:5013-5180), Delta writes (elusion.rs:5725-5765),
streaming chunked write (elusion.rs:8235-8467).

Fidelity vs scale: the reference writes ONE file at ``path``.  When the
target path looks like a single file (has an extension) we coalesce(1)
and rename the part file — correct for the report-sized outputs this API
targets.  When the target is a directory we use Spark's native
distributed write (the 100 TB path: one file per task, no driver
bottleneck).  Append for parquet is Spark-native — no read+UNION+rewrite
like the reference (elusion.rs:5317-5321), same observable result.
"""

from __future__ import annotations

import os
import shutil
import tempfile
from dataclasses import dataclass

from pyspark.sql import DataFrame

from ..errors import WriterError


@dataclass
class CsvWriteOptions:
    """csvwrite/csvwriteops.rs options surface."""

    delimiter: str = ","
    quote: str = '"'
    escape: str = '"'
    null_value: str = ""
    header: bool = True


def _is_single_file(path: str) -> bool:
    return bool(os.path.splitext(path)[1])


def _write_single_file(df: DataFrame, path: str, fmt: str, options: dict,
                       append: bool = False) -> None:
    """coalesce(1) → temp dir → atomic move of the part file (the same
    write-temp-then-rename the reference does at elusion.rs:5322-5370)."""
    tmp = tempfile.mkdtemp(prefix="elusion_write_")
    try:
        (df.coalesce(1).write.format(fmt).options(**options).mode("overwrite")
         .save(os.path.join(tmp, "out")))
        part = None
        for f in os.listdir(os.path.join(tmp, "out")):
            if f.startswith("part-"):
                part = os.path.join(tmp, "out", f)
                break
        if part is None:
            raise WriterError(f"No part file produced for {path}")
        if append and os.path.exists(path) and fmt == "csv":
            with open(path, "a") as dst, open(part) as src:
                first = True
                for line in src:
                    if first and options.get("header") == "true":
                        first = False
                        continue  # don't repeat the header on append
                    first = False
                    dst.write(line)
        else:
            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
            shutil.move(part, path)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def write_to_parquet(df: DataFrame, mode: str, path: str,
                     single_file: bool | None = None) -> None:
    mode = mode.lower()
    if mode not in ("overwrite", "append"):
        raise WriterError(
            f"Invalid write mode {mode!r}",
            "Use 'overwrite' or 'append' (elusion.rs:5182-5374).",
        )
    single = _is_single_file(path) if single_file is None else single_file
    if not single:
        df.write.mode(mode).parquet(path)
        return
    if mode == "append" and os.path.exists(path):
        # single-file append: read existing + union + rewrite (the
        # reference's approach, elusion.rs:5317-5321) — bounded outputs only
        spark = df.sparkSession
        existing = spark.read.parquet(path)
        if set(existing.columns) != set(df.columns):
            raise WriterError(
                "Append schema mismatch",
                f"Existing columns {existing.columns} vs new {df.columns}.",
            )
        merged = existing.select(*existing.columns).union(
            df.select(*existing.columns)
        )
        tmp_path = path + ".tmp.parquet"
        _write_single_file(merged, tmp_path, "parquet", {})
        os.replace(tmp_path, path)
        return
    _write_single_file(df, path, "parquet", {})


def write_to_csv(df: DataFrame, mode: str, path: str,
                 options: CsvWriteOptions | None = None) -> None:
    opts = options or CsvWriteOptions()
    spark_opts = {
        "sep": opts.delimiter,
        "quote": opts.quote,
        "escape": opts.escape,
        "nullValue": opts.null_value,
        # header on overwrite, not append (elusion.rs:5377-5723)
        "header": "true" if (opts.header and mode.lower() == "overwrite") or
                  (opts.header and not os.path.exists(path)) else "false",
    }
    if _is_single_file(path):
        if mode.lower() == "append" and os.path.exists(path):
            spark_opts["header"] = "true" if opts.header else "false"
            _write_single_file(df, path, "csv", spark_opts, append=True)
        else:
            _write_single_file(df, path, "csv", spark_opts)
    else:
        df.write.mode(mode.lower()).options(**spark_opts).csv(path)


def write_to_json(df: DataFrame, path: str, pretty: bool = False) -> None:
    """Overwrite-only array-form JSON (elusion.rs:5013-5180).  Directory
    targets use the distributed line-JSON writer; single-file array form
    streams row-by-row through ``toLocalIterator`` — JSON encoding stays
    JVM-side (``to_json``) and the driver holds ONE row at a time, so an
    arbitrarily large result never accumulates in driver memory."""
    if not _is_single_file(path):
        df.write.mode("overwrite").json(path)
        return
    from pyspark.sql import functions as F

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    encoded = df.select(
        F.to_json(F.struct(*[F.col(c) for c in df.columns]),
                  {"ignoreNullFields": "false"}).alias("j")
    )
    with open(path, "w") as f:
        f.write("[")
        first = True
        if pretty:
            import json

            for row in encoded.toLocalIterator():
                body = json.dumps(json.loads(row["j"]), indent=2)
                f.write(("\n  " if first else ",\n  ")
                        + body.replace("\n", "\n  "))
                first = False
            f.write("\n]" if not first else "]")
        else:
            for row in encoded.toLocalIterator():
                f.write(("" if first else ",") + row["j"])
                first = False
            f.write("]")


def write_to_delta(df: DataFrame, mode: str, path: str,
                   partition_by=None) -> None:
    """elusion.rs:5725-5765.  Uses delta-spark when the session has it;
    otherwise falls back to writing the public Delta transaction-log
    layout directly (parquet part files + _delta_log JSON actions) —
    interoperable with any Delta reader, including our ``load_delta``
    fallback."""
    try:
        w = df.write.format("delta").mode(mode.lower())
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.save(path)
        return
    except Exception as e:
        if "DATA_SOURCE_NOT_FOUND" not in str(e) and "delta" not in str(e).lower():
            raise
    _write_delta_fallback(df, mode.lower(), path, partition_by)


def _list_table_files(path: str) -> dict[str, int]:
    """Relative path -> size for every parquet data file under the table
    root (skipping the log)."""
    out: dict[str, int] = {}
    for root, _dirs, files in os.walk(path):
        if "_delta_log" in root:
            continue
        for f in files:
            if f.endswith(".parquet"):
                full = os.path.join(root, f)
                out[os.path.relpath(full, path)] = os.path.getsize(full)
    return out


def _active_delta_files(log_dir: str) -> list[str]:
    import glob as _glob
    import json as _json

    active: dict[str, bool] = {}
    for logfile in sorted(_glob.glob(os.path.join(log_dir, "*.json"))):
        with open(logfile) as f:
            for line in f:
                try:
                    action = _json.loads(line)
                except _json.JSONDecodeError:
                    continue
                if "add" in action:
                    active[action["add"]["path"]] = True
                elif "remove" in action:
                    active.pop(action["remove"]["path"], None)
    return list(active)


def _pre_claim_hook(version: int) -> None:
    """Test seam: called between the version scan and the put-if-absent
    claim so tests can inject a racing committer deterministically."""


def _write_delta_fallback(df: DataFrame, mode: str, path: str,
                          partition_by) -> None:
    """Minimal writer for the public Delta protocol: data as ordinary
    distributed parquet writes, then one commit JSON per version
    (protocol/metaData on v0, add actions, remove actions on overwrite).
    Scale: the data write is Spark-native (one file per task); only the
    commit metadata touches the driver.

    Concurrency follows the protocol's optimistic rule: the commit file
    is claimed PUT-IF-ABSENT (``os.link`` of a fully-written temp file
    — atomic, fails on EEXIST) and a lost race re-scans the log and
    retries at the next version.  A plain ``os.rename`` here would
    silently CLOBBER a concurrent writer's commit, orphaning its data
    files — the exact failure multi-writer lakes hit.  Appends never
    logically conflict, so retrying is always safe; overwrite recomputes
    its remove-set from the fresh log each attempt, so it removes
    exactly what is active at ITS commit version."""
    import json as _json
    import time as _time
    import uuid as _uuid

    if mode not in ("overwrite", "append"):
        raise WriterError(f"Delta write mode must be overwrite/append, got {mode!r}")
    log_dir = os.path.join(path, "_delta_log")

    # Each writer stages into its OWN underscore-prefixed dir (invisible
    # to parquet readers) and then moves part files into place: the
    # Hadoop committer's shared _temporary dir under a common output
    # path is NOT safe for concurrent jobs — two appends would clobber
    # each other's staging.  Unique staging + same-FS renames keeps
    # concurrent appends fully parallel; part-file names carry UUIDs so
    # moves cannot collide.
    import shutil as _shutil
    import uuid as _uuid

    stage = os.path.join(path, f"_stage_{_uuid.uuid4().hex}")
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(stage)
    new_files: dict[str, int] = {}
    for root, _dirs, files in os.walk(stage):
        for f in files:
            if not f.endswith(".parquet"):
                continue
            src = os.path.join(root, f)
            rel = os.path.relpath(src, stage)
            dst = os.path.join(path, rel)
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            os.rename(src, dst)
            new_files[rel] = os.path.getsize(dst)
    _shutil.rmtree(stage, ignore_errors=True)

    os.makedirs(log_dir, exist_ok=True)
    for _attempt in range(50):
        versions = sorted(
            int(os.path.splitext(f)[0])
            for f in os.listdir(log_dir)
            if f.endswith(".json") and os.path.splitext(f)[0].isdigit()
        )
        version = (versions[-1] + 1) if versions else 0
        removed = (
            _active_delta_files(log_dir)
            if (mode == "overwrite" and versions) else []
        )
        now_ms = int(_time.time() * 1000)
        actions: list[dict] = []
        if version == 0:
            actions.append(
                {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}})
            actions.append({
                "metaData": {
                    "id": str(_uuid.uuid4()),
                    "format": {"provider": "parquet", "options": {}},
                    "schemaString": df.schema.json(),
                    "partitionColumns": list(partition_by or []),
                    "configuration": {},
                    "createdTime": now_ms,
                }
            })
        for rel in removed:
            actions.append({
                "remove": {"path": rel, "deletionTimestamp": now_ms,
                           "dataChange": True}
            })
        for rel, size in sorted(new_files.items()):
            part_values = {
                seg.split("=", 1)[0]: seg.split("=", 1)[1]
                for seg in rel.split(os.sep)[:-1]
                if "=" in seg
            }
            actions.append({
                "add": {
                    "path": rel.replace(os.sep, "/"),
                    "partitionValues": part_values,
                    "size": size,
                    "modificationTime": now_ms,
                    "dataChange": True,
                }
            })
        actions.append({
            "commitInfo": {"timestamp": now_ms, "operation": "WRITE",
                           "operationParameters": {"mode": mode}}
        })
        commit = os.path.join(log_dir, f"{version:020d}.json")
        tmp = commit + f".{_uuid.uuid4().hex}.tmp"
        with open(tmp, "w") as f:
            for a in actions:
                f.write(_json.dumps(a) + "\n")
        _pre_claim_hook(version)
        try:
            os.link(tmp, commit)  # put-if-absent: atomic, EEXIST on race
            os.unlink(tmp)
            return
        except FileExistsError:
            os.unlink(tmp)  # lost the race — rescan the log and retry
    raise WriterError(
        f"Delta commit contention: gave up after 50 attempts at {path}")


def write_to_excel(df: DataFrame, path: str, sheet: str = "Sheet1",
                   max_rows: int = 1_000_000) -> None:
    """elusion.rs:5767-5783 (rust_xlsxwriter; overwrite only).  Excel is a
    driver-sided bounded-result sink by nature (the format caps at ~1M
    rows).  openpyxl/pandas when importable, else the stdlib
    SpreadsheetML writer (sources/xlsx_lite.py) — which streams rows via
    ``toLocalIterator`` so only one partition is driver-resident."""
    try:
        import openpyxl  # noqa: F401

        df.limit(max_rows).toPandas().to_excel(path, sheet_name=sheet,
                                               index=False)
    except ImportError:
        from ..sources import xlsx_lite

        bounded = df.limit(max_rows)
        xlsx_lite.write_xlsx(
            path, bounded.columns,
            (tuple(r) for r in bounded.toLocalIterator()),
            sheet_name=sheet,
        )


def stream_write(df: DataFrame, path: str, fmt: str = "csv",
                 batch_rows: int = 50_000,
                 options: CsvWriteOptions | None = None,
                 mode: str = "overwrite") -> int:
    """``elusion_streaming_write`` parity (elusion.rs:8235-8467): iterate
    result batches, append to one file incrementally (parquet buffered at
    50k rows like the reference).  Uses ``toLocalIterator`` so only one
    partition is resident driver-side at a time.  Returns rows written.
    ``mode='append'`` extends an existing file (csv skips the repeated
    header; parquet rewrites the single file with the prior row groups
    first — this is the bounded single-file fidelity path by design).

    Scale note: this exists for single-file fidelity; the distributed path
    is plain ``df.write`` which already streams per task.
    """
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    appending = mode == "append" and os.path.exists(path)
    total = 0
    if fmt == "parquet":
        prior = pq.read_table(path) if appending else None
        schema = pa.schema(
            [pa.field(f.name, _arrow_type(f.dataType)) for f in df.schema.fields]
        )
        writer = pq.ParquetWriter(path, schema, compression="zstd")
        buf: list[dict] = []
        try:
            if prior is not None:
                writer.write_table(prior.cast(schema))
            for row in df.toLocalIterator():
                buf.append(row.asDict())
                if len(buf) >= batch_rows:
                    writer.write_table(pa.Table.from_pylist(buf, schema=schema))
                    total += len(buf)
                    buf = []
            if buf:
                writer.write_table(pa.Table.from_pylist(buf, schema=schema))
                total += len(buf)
        finally:
            writer.close()
        return total
    opts = options or CsvWriteOptions()
    import csv as _csv
    import json as _json

    with open(path, "a" if appending else "w", newline="") as f:
        if fmt == "csv":
            w = _csv.writer(f, delimiter=opts.delimiter, quotechar=opts.quote)
            if opts.header and not appending:
                w.writerow(df.columns)
            for row in df.toLocalIterator():
                w.writerow(list(row))
                total += 1
        elif fmt == "json":
            for row in df.toLocalIterator():
                f.write(_json.dumps(row.asDict(), default=str) + "\n")
                total += 1
        else:
            raise WriterError(f"Unsupported stream format {fmt!r}")
    return total


def _arrow_type(dt):
    import pyarrow as pa
    from pyspark.sql import types as T

    mapping = {
        T.StringType: pa.string(),
        T.LongType: pa.int64(),
        T.IntegerType: pa.int32(),
        T.DoubleType: pa.float64(),
        T.FloatType: pa.float32(),
        T.BooleanType: pa.bool_(),
        T.DateType: pa.date32(),
        T.TimestampType: pa.timestamp("us", tz="UTC"),
    }
    for k, v in mapping.items():
        if isinstance(dt, k):
            return v
    return pa.string()


# ------------------------------------------------------------ cloud gates

_AZURE_WRITE_HELP = (
    "Native path: hadoop-azure on the classpath + SAS/key in "
    "spark.conf, then df.write.parquet('abfss://container@account."
    "dfs.core.windows.net/path') — a fully distributed write "
    "(elusion.rs:5785-5824 parity)."
)


def _azure_put(url: str, data: bytes, content_type: str) -> None:
    """Azure Put Blob: one HTTPS PUT with the SAS in the query string and
    the BlockBlob marker header — the whole auth story, no SDK.
    Module-level so tests can stub the transport."""
    import urllib.request

    req = urllib.request.Request(
        url, data=data, method="PUT",
        headers={"x-ms-blob-type": "BlockBlob",
                 "Content-Type": content_type,
                 "Content-Length": str(len(data))})
    with urllib.request.urlopen(req, timeout=120) as resp:
        if resp.status not in (200, 201):
            raise OSError(f"Put Blob returned HTTP {resp.status}")


def _azure_write(url: str, sas_token: str, data: bytes,
                 content_type: str) -> None:
    from ..errors import FeatureNotAvailable
    from ..sources.connectors import _validate_azure_url

    _validate_azure_url(url)
    try:
        _azure_put(f"{url}?{sas_token.lstrip('?')}", data, content_type)
    except OSError as e:
        raise FeatureNotAvailable(
            f"Azure Blob endpoint unreachable ({e})", _AZURE_WRITE_HELP)


def write_parquet_to_azure_with_sas(df: DataFrame, url: str, sas_token: str,
                                    mode: str = "overwrite",
                                    compression: str = "snappy") -> None:
    """elusion.rs:5785-5804: the reference serializes the WHOLE result to
    a parquet buffer driver-side and uploads one blob — same here
    (bounded-result sink; use hadoop-azure abfss:// for distributed
    writes of big frames).  Default codec stays snappy to match the
    reference's pinned Compression::SNAPPY for these externally-visible
    cloud files (ADVICE r10) — pass ``compression='zstd'`` for the ~20%
    smaller blobs when every downstream reader handles it."""
    import io

    import pyarrow as pa
    import pyarrow.parquet as pq

    table = pa.Table.from_pandas(df.toPandas())
    sink = io.BytesIO()
    pq.write_table(table, sink, compression=compression)
    _azure_write(url, sas_token, sink.getvalue(),
                 "application/octet-stream")


def write_json_to_azure_with_sas(df: DataFrame, url: str, sas_token: str,
                                 pretty: bool = False) -> None:
    """azure.rs:487-607: JSON ARRAY body (same format as the local
    ``write_to_json``, which this reuses via a temp file), '.json'
    extension enforced, buffer uploaded as one blob."""
    import os as _os
    import tempfile

    if not url.split("?")[0].endswith(".json"):
        raise ValueError("Invalid file extension. JSON files must end "
                         "with '.json'")
    fd, tmp = tempfile.mkstemp(suffix=".json")
    _os.close(fd)
    try:
        write_to_json(df, tmp, pretty)
        with open(tmp, "rb") as f:
            buf = f.read()
    finally:
        _os.unlink(tmp)
    _azure_write(url, sas_token, buf, "application/json")


def _onelake_upload(url: str, token: str, data: bytes) -> None:
    """ADLS Gen2 three-step upload (create → append → flush) with a
    bearer token — what the reference's reqwest client does against the
    same endpoints (fabric.rs:372-520).  Module-level so tests can stub
    the transport."""
    import urllib.request

    def _req(u, method, body=b"", headers=None):
        req = urllib.request.Request(u, data=body, method=method,
                                     headers={"Authorization":
                                              f"Bearer {token}",
                                              **(headers or {})})
        with urllib.request.urlopen(req, timeout=120) as resp:
            if resp.status >= 300:
                raise OSError(f"OneLake {method} returned {resp.status}")

    _req(f"{url}?resource=file", "PUT")
    _req(f"{url}?action=append&position=0", "PATCH", data,
         {"Content-Length": str(len(data))})
    _req(f"{url}?action=flush&position={len(data)}", "PATCH")


def write_parquet_to_fabric(df: DataFrame, onelake_url: str,
                            compression: str = "snappy", **auth) -> None:
    """fabric.rs:372-430 write path: whole-result parquet buffer →
    OneLake file via the ADLS create/append/flush sequence, service-
    principal bearer auth, stdlib HTTPS (bounded-result sink; use
    hadoop-azure abfss:// for distributed writes).  Default codec stays
    snappy to match the reference's pinned Compression::SNAPPY for
    these externally-visible cloud files (ADVICE r10)."""
    import io

    import pyarrow as pa
    import pyarrow.parquet as pq

    from ..errors import FeatureNotAvailable
    from ..sources.connectors import _ms_token, _require_sp_creds

    tenant, cid, secret = _require_sp_creds(auth, "OneLake writes")
    table = pa.Table.from_pandas(df.toPandas())
    sink = io.BytesIO()
    pq.write_table(table, sink, compression=compression)
    try:
        token = _ms_token(tenant, cid, secret,
                          "https://storage.azure.com/.default")
        _onelake_upload(onelake_url, token, sink.getvalue())
    except OSError as e:
        raise FeatureNotAvailable(
            f"OneLake endpoint unreachable ({e})", _AZURE_WRITE_HELP)
