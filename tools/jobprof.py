"""Per-job time attribution for one query: run it once (after a warmup)
and dump every Spark job the run launched, with duration and the stage
names, from the driver's REST status API.  This is the guide-§1 "where
is the time actually going" step for driver-loop operators whose cost
is spread over many small jobs (EM rounds, star rounds, broadcast
builds) that a single wall-clock number cannot attribute.

Usage: python tools/jobprof.py [--sf-dir DIR] [-r 1] name
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sql2all_spark import registry  # noqa: E402
from sql2all_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    spark = get_spark("jobprof", extra_confs={"spark.ui.enabled": "true"})
    spark.sparkContext.setLogLevel("ERROR")
    specs = registry.all_specs()
    ui = spark.sparkContext.uiWebUrl

    def run(name: str) -> float:
        t0 = time.perf_counter()
        df = specs[name].builder(spark, args.sf_dir)
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    run("q1_pricing_summary")  # warmup
    spark.catalog.clearCache()

    app_id = spark.sparkContext.applicationId
    for name in args.names:
        with urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/jobs") as r:
            before_ids = {j["jobId"] for j in json.load(r)}
        spark.sparkContext.setJobDescription(f"prof:{name}")
        wall = run(name)
        spark.sparkContext.setJobDescription(None)
        spark.catalog.clearCache()
        with urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/jobs") as r:
            jobs = [j for j in json.load(r) if j["jobId"] not in before_ids]
        jobs.sort(key=lambda j: j["jobId"])
        total = 0.0
        print(f"\n=== {name}: wall {wall:.2f}s, {len(jobs)} jobs ===")
        for j in jobs:
            t0 = time.strptime(j["submissionTime"][:19], "%Y-%m-%dT%H:%M:%S")
            t1 = time.strptime(j["completionTime"][:19], "%Y-%m-%dT%H:%M:%S")
            # sub-second precision from the GMT strings' millis
            ms0 = float(j["submissionTime"][20:23] or 0) / 1000
            ms1 = float(j["completionTime"][20:23] or 0) / 1000
            dur = (time.mktime(t1) + ms1) - (time.mktime(t0) + ms0)
            total += dur
            desc = (j.get("description") or j["name"])[:110]
            print(
                f"  job {j['jobId']:>4}  {dur:6.2f}s  stages={len(j['stageIds']):>2}"
                f" tasks={j['numTasks']:>4}  {desc}"
            )
        print(f"  sum-of-jobs {total:.2f}s (gaps = driver/planning time)")
    spark.stop()


if __name__ == "__main__":
    main()
