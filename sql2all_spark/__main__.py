"""CLI entry point — flag-for-flag parity with the reference binary.

Reference (``src/main.rs:10-22``): ``sql2all -u <database-url> -q <sql>
-o <output-file>``, with ``-u`` optional (defaulting to an empty string
that then fails scheme dispatch, ``src/main.rs:13,27``) — we keep the
optional flag but fail with the same kind of clear error.

Usage::

    python -m sql2all_spark -u parquet:///data/orders.parquet \
        -q "SELECT * FROM src" -o /tmp/out.csv

Extra (beyond the reference): ``--partition-by``, ``--cluster-by``,
``--single-file``, ``--master`` for the write/layout controls a
distributed engine adds.
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(
        prog="sql2all_spark",
        description="Export a SQL query result to Parquet/CSV/NDJSON/ORC/"
        "Arrow (format from the output extension).",
    )
    # reference flags (src/main.rs:10-22)
    ap.add_argument("-u", "--url", default="", help="source database/file url")
    ap.add_argument("-q", "--query", required=True, help="SQL to execute")
    ap.add_argument("-o", "--output", required=True, help="output file path")
    # spark-native extras
    ap.add_argument("--master", default=None, help="spark master (default local[$SPARK_GRAFT_CPUS])")
    ap.add_argument("--partition-by", nargs="*", default=None)
    ap.add_argument("--cluster-by", nargs="*", default=None)
    ap.add_argument("--single-file", action="store_true")
    args = ap.parse_args(argv)

    from sql2all_spark.export import export
    from sql2all_spark.session import get_spark

    spark = get_spark("sql2all-cli", master=args.master)
    try:
        df = export(
            spark,
            args.url,
            args.query,
            args.output,
            partition_by=args.partition_by,
            cluster_by=args.cluster_by,
            single_file=args.single_file,
        )
    except ValueError as e:
        print(f"error: {e}", file=sys.stderr)
        return 1
    print(f"wrote {df.count()} rows to {args.output}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
