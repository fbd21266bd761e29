"""Stage-level attribution for one query: run it once (after a warmup)
and dump every Spark STAGE the run launched — duration, task count, and
the stage name (the operator scope whose physical node heads the
stage).  jobprof.py answers "which jobs are slow"; this answers "which
plan subtree do those jobs keep re-executing", which is the §1 step for
diagnosing repeated lineage recomputation (a persisted frame whose
cache is not being hit shows up as the same scan-headed stage name
dozens of times).

Usage: python tools/stageprof.py [--sf-dir DIR] name
"""

from __future__ import annotations

import argparse
import calendar
import json
import os
import re
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sql2all_spark import registry  # noqa: E402
from sql2all_spark.session import get_spark  # noqa: E402


def _epoch(ts: str) -> float:
    """REST-API GMT timestamp -> epoch seconds.  Tolerates a missing
    millisecond part and interprets the stamp as GMT (ADVICE r16: the
    old fixed-offset slice raised on milli-less stamps and mktime read
    GMT stamps in the local zone)."""
    t = time.strptime(ts[:19], "%Y-%m-%dT%H:%M:%S")
    m = re.search(r"\.(\d{1,3})", ts[19:])
    ms = float(m.group(1)) / 10 ** len(m.group(1)) if m else 0.0
    return calendar.timegm(t) + ms


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    spark = get_spark("stageprof", extra_confs={"spark.ui.enabled": "true"})
    spark.sparkContext.setLogLevel("ERROR")
    specs = registry.all_specs()
    ui = spark.sparkContext.uiWebUrl
    if ui is None:
        # getOrCreate reused a JVM where the spark.ui.enabled static conf
        # did not apply (ADVICE r16) — fail with the cause, not a urlopen
        # crash on "None/api/...".
        sys.exit(
            "stageprof: no Spark UI on this session (static conf"
            " spark.ui.enabled could not be applied to a reused JVM);"
            " run stageprof in a fresh process"
        )

    def run(name: str) -> float:
        t0 = time.perf_counter()
        df = specs[name].builder(spark, args.sf_dir)
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    run("q1_pricing_summary")  # warmup
    spark.catalog.clearCache()

    app_id = spark.sparkContext.applicationId
    for name in args.names:
        with urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app_id}/stages"
        ) as r:
            before_ids = {s["stageId"] for s in json.load(r)}
        spark.sparkContext.setJobDescription(f"prof:{name}")
        wall = run(name)
        spark.sparkContext.setJobDescription(None)
        spark.catalog.clearCache()
        with urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app_id}/stages"
        ) as r:
            stages = [
                s for s in json.load(r) if s["stageId"] not in before_ids
            ]
        stages.sort(key=lambda s: s["stageId"])
        total = 0.0
        agg: dict[str, list[float]] = {}
        print(f"\n=== {name}: wall {wall:.2f}s, {len(stages)} stages ===")
        for s in stages:
            if s.get("status") == "SKIPPED":
                continue
            sub = s.get("submissionTime")
            comp = s.get("completionTime")
            if not sub or not comp:
                continue
            dur = _epoch(comp) - _epoch(sub)
            total += dur
            key = f"{s['name'].split(' at ')[0]:<30} tasks={s['numTasks']:>4}"
            agg.setdefault(key, []).append(dur)
        for key, durs in sorted(
            agg.items(), key=lambda kv: -sum(kv[1])
        ):
            print(
                f"  {sum(durs):7.2f}s  n={len(durs):>3}  {key}"
            )
        print(f"  sum-of-stage-durations {total:.2f}s (stages overlap)")
    spark.stop()


if __name__ == "__main__":
    main()
