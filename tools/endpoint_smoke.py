#!/usr/bin/env python
"""Real-endpoint smoke for the 5 cloud-gated connector rows.

The Azure/Fabric/SharePoint paths are code-complete and stub-transport
tested (tests/test_connectors.py), but this sandbox has no egress or
credentials, so VERDICT grades them `partial`.  The day an environment
CAN reach the real endpoints, this script flips them to verified with
one command — it exercises the exact public functions the suite ships,
round-tripping real uploads and downloads.

Usage (each block runs only if its env vars are set; unset blocks are
reported SKIPPED so a partial credential set still smokes what it can):

  # Azure Blob (SAS): needs a container URL + SAS with rwl
  export ES_AZURE_ENDPOINT="https://acct.blob.core.windows.net/container"
  export ES_AZURE_SAS="sv=...&sig=..."

  # Microsoft Fabric OneLake (service principal with Storage access)
  export ES_FABRIC_URL="https://onelake.dfs.fabric.microsoft.com/ws/lake.Lakehouse/Files/smoke.csv"
  export ES_FABRIC_ABFSS="abfss://ws@onelake.dfs.fabric.microsoft.com/lake.Lakehouse/Files"

  # SharePoint (service principal with Sites.Read.All)
  export ES_SP_SITE="https://tenant.sharepoint.com/sites/team"
  export ES_SP_FILE="Shared Documents/smoke.csv"
  export ES_SP_FOLDER="Shared Documents"

  # Shared service-principal credentials (Fabric + SharePoint)
  export ES_TENANT_ID=... ES_CLIENT_ID=... ES_CLIENT_SECRET=...

  python tools/endpoint_smoke.py

Exit code 0 = every attempted block passed; 2 = nothing attempted
(no credentials); 1 = at least one attempted block failed.
"""
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RESULTS: list[tuple[str, str, str]] = []  # (name, status, detail)


def _run(name: str, needed: list[str], fn) -> None:
    missing = [v for v in needed if not os.environ.get(v)]
    if missing:
        RESULTS.append((name, "SKIPPED", f"unset: {','.join(missing)}"))
        return
    try:
        detail = fn() or "ok"
        RESULTS.append((name, "PASS", detail))
    except Exception as e:  # smoke harness: report, keep going
        traceback.print_exc()
        RESULTS.append((name, "FAIL", f"{type(e).__name__}: {e}"))


def main() -> int:
    from elusion_spark.session import get_spark

    spark = get_spark()
    probe = spark.createDataFrame(
        [(1, "alpha"), (2, "beta"), (3, "gamma")], ["id", "name"])

    sp_creds = dict(
        tenant_id=os.environ.get("ES_TENANT_ID", ""),
        client_id=os.environ.get("ES_CLIENT_ID", ""),
        client_secret=os.environ.get("ES_CLIENT_SECRET", ""),
    )
    _SP_VARS = ["ES_TENANT_ID", "ES_CLIENT_ID", "ES_CLIENT_SECRET"]

    def azure_roundtrip():
        from elusion_spark.sinks.writers import (
            write_json_to_azure_with_sas, write_parquet_to_azure_with_sas)
        from elusion_spark.sources.connectors import from_azure_with_sas_token

        base = os.environ["ES_AZURE_ENDPOINT"].rstrip("/")
        sas = os.environ["ES_AZURE_SAS"]
        write_json_to_azure_with_sas(probe, f"{base}/es_smoke.json", sas)
        write_parquet_to_azure_with_sas(probe, f"{base}/es_smoke.parquet", sas)
        got = from_azure_with_sas_token(base, sas, "es_smoke.json", "smoke")
        n = got.df.count()
        assert n == 3, f"blob read-back: {n} rows, wanted 3"
        return "json+parquet upload, listing read-back 3 rows"

    def fabric_roundtrip():
        from elusion_spark.sinks.writers import write_parquet_to_fabric
        from elusion_spark.sources.connectors import (
            from_fabric, from_fabric_with_service_principal)

        url = os.environ["ES_FABRIC_URL"]
        write_parquet_to_fabric(
            probe, os.path.splitext(url)[0] + ".parquet", **sp_creds)
        got = from_fabric(url, "smoke", **sp_creds)
        n = got.df.count()
        abfss = os.environ.get("ES_FABRIC_ABFSS")
        if abfss:
            fname = url.rsplit("/Files/", 1)[1]
            got2 = from_fabric_with_service_principal(
                sp_creds["tenant_id"], sp_creds["client_id"],
                sp_creds["client_secret"], abfss, fname, "smoke2")
            assert got2.df.count() == n, "abfss-form read disagrees"
        return f"OneLake write + read {n} rows"

    def sharepoint_single():
        from elusion_spark.sources.connectors import (
            load_from_sharepoint, load_from_sharepoint_with_service_principal)

        site, path = os.environ["ES_SP_SITE"], os.environ["ES_SP_FILE"]
        a = load_from_sharepoint(site, path, "sp_smoke", **sp_creds)
        b = load_from_sharepoint_with_service_principal(
            sp_creds["tenant_id"], sp_creds["client_id"],
            sp_creds["client_secret"], site, path, "sp_smoke2")
        na, nb = a.df.count(), b.df.count()
        assert na == nb, f"keyword vs positional forms disagree: {na} != {nb}"
        return f"Graph download {na} rows (both signature forms)"

    def sharepoint_folder():
        from elusion_spark.sources.connectors import load_folder_from_sharepoint

        got = load_folder_from_sharepoint(
            os.environ["ES_SP_SITE"], os.environ["ES_SP_FOLDER"],
            ["csv", "xlsx", "json"], "sp_folder_smoke", **sp_creds)
        return f"folder listing loaded {got.df.count()} rows"

    _run("azure_sas_roundtrip", ["ES_AZURE_ENDPOINT", "ES_AZURE_SAS"],
         azure_roundtrip)
    _run("fabric_roundtrip", ["ES_FABRIC_URL"] + _SP_VARS, fabric_roundtrip)
    _run("sharepoint_single", ["ES_SP_SITE", "ES_SP_FILE"] + _SP_VARS,
         sharepoint_single)
    _run("sharepoint_folder", ["ES_SP_SITE", "ES_SP_FOLDER"] + _SP_VARS,
         sharepoint_folder)

    width = max(len(n) for n, _, _ in RESULTS)
    for name, status, detail in RESULTS:
        print(f"{name:<{width}}  {status:<7}  {detail}")
    attempted = [r for r in RESULTS if r[1] != "SKIPPED"]
    if not attempted:
        print("nothing attempted — set the env vars documented in --help")
        return 2
    return 0 if all(r[1] == "PASS" for r in attempted) else 1


if __name__ == "__main__":
    if "--help" in sys.argv or "-h" in sys.argv:
        print(__doc__)
        sys.exit(0)
    sys.exit(main())
