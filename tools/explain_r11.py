#!/usr/bin/env python
"""Capture .explain("formatted") for benched queries into plans/r11/.

Usage:
    python tools/explain_r11.py before [query ...]
    python tools/explain_r11.py after  [query ...]

With no query names, captures every BENCH_QUERIES entry.  Plans are
captured at sf0.1 (the driver's bench scale) so join-strategy choices
and exchange counts match what the bench times.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import BENCH_QUERIES  # noqa: E402
from elusion_spark.session import get_spark  # noqa: E402
from elusion_spark.suite import QUERIES  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or [n for n in BENCH_QUERIES if n in QUERIES]
    outdir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", "r11")
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark()
    for name in names:
        try:
            df = QUERIES[name](spark, SF)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode
                .fromString("formatted"))
        except Exception as e:  # noqa: BLE001
            plan = f"ERROR: {e}"
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(plan)
        print(name, "ok" if not plan.startswith("ERROR") else plan[:120])


if __name__ == "__main__":
    main()
