#!/usr/bin/env python
"""Per-query empirical profiler (guide §1.1): run suite queries with the
Spark UI enabled and pull per-job / per-stage wall, shuffle bytes and
task counts from the REST API, so optimization targets the stage the
time actually goes to.

Usage: python tools/profile_query.py q46_training_corpus [q73_knn_join ...]
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), PASSES (default 3)
"""
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PASSES = int(os.environ.get("PASSES", "3"))


def _rest(base, path):
    with urllib.request.urlopen(base + path, timeout=10) as r:
        return json.loads(r.read())


def main() -> None:
    names = sys.argv[1:]
    from elusion_spark.session import get_spark
    from elusion_spark.suite import QUERIES

    spark = get_spark(extra_conf={"spark.ui.enabled": "true",
                                  "spark.ui.port": "4050"})
    sc = spark.sparkContext
    base = f"http://localhost:{sc.uiWebUrl.rsplit(':', 1)[-1]}/api/v1/applications/{sc.applicationId}"

    for name in names:
        # warm: sf0.001 then one untimed target pass
        for d in ("/root/testdata/sf0.001", SF):
            try:
                QUERIES[name](spark, d).write.format("noop").mode(
                    "overwrite").save()
            except Exception as e:  # noqa: BLE001
                print(f"{name}: warm error {e}")
        spark.catalog.clearCache()
        walls = []
        first_job = None
        for p in range(PASSES):
            jobs_before = {j["jobId"] for j in _rest(base, "/jobs")}
            sc.setJobDescription(f"profile:{name}:pass{p}")
            t0 = time.perf_counter()
            QUERIES[name](spark, SF).write.format("noop").mode(
                "overwrite").save()
            walls.append(round(time.perf_counter() - t0, 3))
            sc.setJobDescription(None)
            if p == PASSES - 1:
                jobs = [j for j in _rest(base, "/jobs")
                        if j["jobId"] not in jobs_before]
                first_job = jobs
            spark.catalog.clearCache()
        print(f"\n=== {name}: walls {walls} (min {min(walls)}) — "
              f"{len(first_job)} jobs in last pass ===")
        total_stage_ms = 0
        for j in sorted(first_job, key=lambda x: x["jobId"]):
            sids = j.get("stageIds", [])
            stage_info = []
            for sid in sids:
                try:
                    ss = _rest(base, f"/stages/{sid}")
                    for s in ss:
                        if s["status"] in ("COMPLETE", "SKIPPED"):
                            ms = s.get("executorRunTime", 0)
                            sh_r = s.get("shuffleReadBytes", 0)
                            sh_w = s.get("shuffleWriteBytes", 0)
                            nt = s.get("numCompleteTasks", 0)
                            if s["status"] == "COMPLETE":
                                total_stage_ms += ms
                            stage_info.append(
                                f"s{sid}[{s['status'][:4]} t={nt} "
                                f"run={ms}ms shR={sh_r} shW={sh_w}]")
                except Exception:  # noqa: BLE001
                    pass
            dur = ""
            try:
                from datetime import datetime
                st = datetime.strptime(j["submissionTime"][:23],
                                       "%Y-%m-%dT%H:%M:%S.%f")
                ct = datetime.strptime(j["completionTime"][:23],
                                       "%Y-%m-%dT%H:%M:%S.%f")
                dur = f" wall={round((ct - st).total_seconds(), 3)}s"
            except Exception:  # noqa: BLE001
                pass
            print(f"  job {j['jobId']}{dur} "
                  f"[{j.get('description') or j.get('name', '')[:60]}]")
            for si in stage_info:
                print(f"    {si}")
        print(f"  total executorRunTime over complete stages: "
              f"{total_stage_ms} ms")


if __name__ == "__main__":
    main()
