"""Source dispatch + export API: the reference's CLI contract end-to-end.

Covers URL-scheme dispatch (``src/lib.rs:47-65``), whole-query SQL against
file sources, the arrow IPC source (parity with the arrow sink), and the
JDBC URL assembly path (no DB server in the container, so JDBC coverage is
the dispatch/URL layer, not a live connection).
"""

from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

from sql2all_spark.export import export
from sql2all_spark.sinks import write_output
from sql2all_spark.sources import read_source, split_scheme


def test_scheme_split():
    assert split_scheme("parquet:///a/b.parquet") == ("parquet", "a/b.parquet")
    assert split_scheme("mysql://host/db") == ("mysql", "host/db")
    with pytest.raises(ValueError, match="unsupported database url"):
        split_scheme("no-scheme-here")


def test_unknown_scheme_raises(spark):
    with pytest.raises(ValueError, match="unsupported database url scheme"):
        read_source(spark, "bogus://x", "SELECT 1")


def test_file_source_runs_query(spark, sf_dir):
    df = read_source(
        spark,
        f"parquet://{sf_dir}/orders.parquet",
        "SELECT o_orderstatus, COUNT(*) AS n FROM src GROUP BY o_orderstatus",
    )
    rows = {r.o_orderstatus: r.n for r in df.collect()}
    assert sum(rows.values()) == 1500


def test_arrow_source_roundtrip(spark, tmp_path):
    src = spark.createDataFrame(
        [(1, "a"), (2, "b")], "id long, name string"
    )
    path = str(tmp_path / "t.arrow")
    write_output(src, path)
    df = read_source(
        spark, f"arrow://{path}", "SELECT id, name FROM src WHERE id = 2"
    )
    assert [tuple(r) for r in df.collect()] == [(2, "b")]


def test_export_end_to_end(spark, sf_dir, tmp_path):
    out = str(tmp_path / "regions.csv")
    df = export(
        spark,
        f"parquet://{sf_dir}/region.parquet",
        "SELECT r_regionkey, r_name FROM src ORDER BY r_regionkey NULLS FIRST",
        out,
    )
    assert df.count() == 5
    back = spark.read.option("header", "true").csv(out)
    assert back.count() == 5
    assert set(back.columns) == {"r_regionkey", "r_name"}


def test_jdbc_url_assembly(spark):
    # no DB server in this container: assert the JDBC path is taken and the
    # url reaches the driver layer (which then fails to find a driver class)
    with pytest.raises(Exception) as exc_info:
        read_source(spark, "postgresql://localhost:1/nope", "SELECT 1").collect()
    msg = str(exc_info.value)
    assert "driver" in msg.lower() or "connection" in msg.lower()


def test_cli_entry_parity(spark, sf_dir, tmp_path):
    """Reference CLI parity (src/main.rs:10-22): -u/-q/-o flags through
    python -m sql2all_spark.main() (reusing this process's session)."""
    from sql2all_spark.__main__ import main

    out = str(tmp_path / "cli_nation.ndjson")
    rc = main(
        [
            "-u",
            f"parquet://{sf_dir}/nation.parquet",
            "-q",
            "SELECT n_nationkey, n_name FROM src",
            "-o",
            out,
        ]
    )
    assert rc == 0
    assert spark.read.json(out).count() == 25
    # url defaults to '' like the reference (main.rs:13) and fails dispatch
    rc = main(["-q", "SELECT 1", "-o", str(tmp_path / "x.csv")])
    assert rc == 1
