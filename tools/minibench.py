"""Isolated per-query timing for optimization A/B work.

Runs the named queries R times each (default 3) in one fresh session at
sf0.1 on local[$SPARK_GRAFT_CPUS], bench.py methodology (noop sink,
clearCache between runs, one q1 warmup), and prints min/median per
query.  The exclusive full-suite runs showed transient multi-second
host stalls hitting random queries (OPTIMIZATION_r16.md "Inherited
state"), so single-shot numbers are unreliable; min-of-3 in an
otherwise idle session is the comparison basis for before/after claims.

Usage: python tools/minibench.py [-r 3] [--sf-dir DIR] name [name ...]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sql2all_spark import registry  # noqa: E402
from sql2all_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("-r", "--reps", type=int, default=3)
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    spark = get_spark("minibench")
    spark.sparkContext.setLogLevel("ERROR")
    specs = registry.all_specs()

    def run(name: str) -> float:
        df = specs[name].builder(spark, args.sf_dir)
        df.write.format("noop").mode("overwrite").save()
        return 0.0

    # warmup
    t0 = time.perf_counter()
    run("q1_pricing_summary")
    print(f"warmup q1: {time.perf_counter() - t0:.2f}s", flush=True)
    spark.catalog.clearCache()

    out = {}
    for name in args.names:
        ts = []
        for _ in range(args.reps):
            spark.sparkContext.setJobDescription(f"minibench:{name}")
            t0 = time.perf_counter()
            run(name)
            ts.append(round(time.perf_counter() - t0, 3))
            spark.catalog.clearCache()
        out[name] = {
            "min": min(ts),
            "med": round(statistics.median(ts), 3),
            "all": ts,
        }
        print(f"{name}: min={min(ts):.2f} med={out[name]['med']:.2f} {ts}",
              flush=True)
    print("MINIBENCH " + json.dumps(out, separators=(",", ":")))
    spark.stop()


if __name__ == "__main__":
    main()
