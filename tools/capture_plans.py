"""Capture `.explain("formatted")` output for named queries.

Usage:
  python tools/capture_plans.py --tag before --out plans/r16 name [name ...]

Writes plans/r16/<name>_<tag>.txt for each query.  Building a query may
run driver-loop jobs (iterative operators execute their convergence
loops at build time); the captured plan is the FINAL returned frame's
physical plan, which is what the noop sink executes.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sql2all_spark import registry  # noqa: E402
from sql2all_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--tag", default="before")
    ap.add_argument("--out", default="plans/r16")
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    spark = get_spark("capture_plans")
    spark.sparkContext.setLogLevel("ERROR")
    specs = registry.all_specs()
    os.makedirs(args.out, exist_ok=True)
    for name in args.names:
        df = specs[name].builder(spark, args.sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(args.out, f"{name}_{args.tag}.txt")
        with open(path, "w") as f:
            f.write(txt)
        spark.catalog.clearCache()
        print(f"wrote {path} ({len(txt)} chars)", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
