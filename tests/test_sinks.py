"""Sink round-trips: every output format writes and reads back the same
rows.  Generalizes the reference's only executing test — a parquet read-back
row count (``src/db/mysql.rs:159-176``) — to all formats with full value
assertions, plus the error paths for bad scheme/extension.
"""

from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

from sql2all_spark.sinks import format_from_extension, write_output


@pytest.fixture()
def sample(spark):
    return spark.createDataFrame(
        [(1, "a", 1.5), (2, None, -0.25), (3, "c", None)],
        "id long, name string, score double",
    )


def _rows(df):
    return sorted(tuple(str(v) for v in r) for r in df.collect())


@pytest.mark.parametrize("ext", ["parquet", "orc"])
def test_roundtrip_binary_formats(spark, sample, tmp_path, ext):
    out = str(tmp_path / f"out.{ext}")
    write_output(sample, out)
    got = spark.read.format(ext).load(out)
    assert _rows(got) == _rows(sample)


def test_roundtrip_csv_header(spark, sample, tmp_path):
    out = str(tmp_path / "out.csv")
    write_output(sample, out)
    got = spark.read.option("header", "true").schema(sample.schema).csv(out)
    assert _rows(got) == _rows(sample)


def test_ndjson_explicit_nulls(spark, sample, tmp_path):
    """Reference writes ``"k":null`` explicitly (with_explicit_nulls(true),
    src/lib.rs:128); our JSON sink must keep null fields."""
    out = str(tmp_path / "out.ndjson")
    write_output(sample, out)
    lines = [r.value for r in spark.read.text(out).collect()]
    assert any('"name":null' in ln for ln in lines)
    got = spark.read.schema(sample.schema).json(out)
    assert _rows(got) == _rows(sample)


def test_arrow_ipc_roundtrip(spark, sample, tmp_path):
    """The reference declares Arrow output but panics on it (lib.rs:138);
    we implement it — distributed per-partition writer by default."""
    import glob
    import json

    import pyarrow as pa
    import pyarrow.ipc as ipc

    out = str(tmp_path / "out.arrow")
    write_output(sample, out)
    parts = sorted(glob.glob(out + "/part-*.arrow"))
    assert parts, "distributed writer must produce part files"
    tbl = pa.concat_tables([ipc.open_file(p).read_all() for p in parts])
    assert tbl.num_rows == 3
    assert sorted(tbl.column_names) == ["id", "name", "score"]
    manifest = json.load(open(out + "/_manifest.json"))
    assert manifest["total_rows"] == 3
    assert [c["name"] for c in manifest["schema"]] == ["id", "name", "score"]


def test_arrow_ipc_distributed_multifile(spark, tmp_path):
    """Multi-partition frames write one IPC file per partition from the
    executors (no driver materialization); empty frames still produce a
    schema-carrying partition-0 file."""
    import glob

    import pyarrow.ipc as ipc

    out = str(tmp_path / "multi.arrow")
    df = spark.range(0, 1000).repartition(4)
    write_output(df, out)
    parts = sorted(glob.glob(out + "/part-*.arrow"))
    assert len(parts) == 4
    total = sum(ipc.open_file(p).read_all().num_rows for p in parts)
    assert total == 1000

    empty_out = str(tmp_path / "empty.arrow")
    write_output(df.filter("id < 0"), empty_out)
    eparts = glob.glob(empty_out + "/part-*.arrow")
    assert len(eparts) == 1  # schema-only partition-0 file
    etbl = ipc.open_file(eparts[0]).read_all()
    assert etbl.num_rows == 0 and etbl.column_names == ["id"]


def test_arrow_ipc_single_file(spark, sample, tmp_path):
    """single_file=True keeps the reference-style one-file layout."""
    import pyarrow.ipc as ipc

    out = str(tmp_path / "single.arrow")
    write_output(sample, out, single_file=True)
    with ipc.open_file(out) as reader:
        tbl = reader.read_all()
    assert tbl.num_rows == 3
    assert tbl.column_names == ["id", "name", "score"]


def test_bad_extension_raises():
    with pytest.raises(ValueError, match="unsupported output format"):
        format_from_extension("/tmp/out.xyz")


def test_no_extension_raises():
    with pytest.raises(ValueError, match="no extension"):
        format_from_extension("/tmp/outfile")


def test_partitioned_write_prunes(spark, tmp_path):
    import os

    df = spark.createDataFrame(
        [(1, "en", "x"), (2, "en", "y"), (3, "fr", "z")],
        "id long, lang string, text string",
    )
    out = str(tmp_path / "part.parquet")
    write_output(df, out, partition_by=["lang"])
    assert sorted(
        d for d in os.listdir(out) if d.startswith("lang=")
    ) == ["lang=en", "lang=fr"]
    got = spark.read.parquet(out)
    assert got.count() == 3
    # partition filter must prune to one directory, visible in the scan
    plan = (
        got.filter(got.lang == "en")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PartitionFilters: [isnotnull(lang" in plan


def test_clustered_write_produces_disjoint_file_ranges(spark, sf_dir, tmp_path):
    from pyspark.sql import functions as F

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_shipdate", "l_quantity"
    )
    out = str(tmp_path / "clustered.parquet")
    write_output(li, out, cluster_by=["l_shipdate"], cluster_partitions=4)
    per_file = (
        spark.read.parquet(out)
        .groupBy(F.input_file_name().alias("f"))
        .agg(F.min("l_shipdate").alias("lo"), F.max("l_shipdate").alias("hi"))
        .collect()
    )
    ranges = sorted((r.lo, r.hi) for r in per_file)
    assert len(ranges) > 1, "expected multiple range-partitioned files"
    for (_, prev_hi), (next_lo, _) in zip(ranges, ranges[1:]):
        assert prev_hi <= next_lo, "file key ranges must be disjoint"


def test_lance_gated_without_package(spark, sample, tmp_path):
    try:
        import lance  # noqa: F401

        have_lance = True
    except ImportError:
        have_lance = False
    out = str(tmp_path / "out.lance")
    if have_lance:
        write_output(sample, out)
        import lance as l2

        assert l2.dataset(out).count_rows() == 3
    else:
        with pytest.raises(ValueError, match="pylance"):
            write_output(sample, out)


def test_schema_evolution_merge(spark, tmp_path):
    """Appends with a widened schema must stay readable: mergeSchema
    reconciles v1 (2 cols) and v2 (3 cols) footers into the superset."""
    out = str(tmp_path / "evolving.parquet")
    v1 = spark.createDataFrame([(1, "a")], "id long, name string")
    v2 = spark.createDataFrame(
        [(2, "b", 0.5)], "id long, name string, score double"
    )
    v1.write.mode("overwrite").parquet(out)
    v2.write.mode("append").parquet(out)
    got = spark.read.option("mergeSchema", "true").parquet(out)
    assert set(got.columns) == {"id", "name", "score"}
    rows = {r.id: (r.name, r.score) for r in got.collect()}
    assert rows == {1: ("a", None), 2: ("b", 0.5)}


def test_hll_rollup_within_error(spark, sf_dir):
    from sql2all_spark.registry import all_specs
    from sql2all_spark.tables import load_table

    row = all_specs()["agg_hll_sketch_rollup"].builder(spark, sf_dir).collect()[0]
    exact = load_table(spark, sf_dir, "events").select("user_id").distinct().count()
    assert row.exact_monthly == exact
    assert row.est_within_bound == 1  # merged sketch inside the 3σ envelope
    assert row.sum_of_daily_exact >= exact  # daily overlap double-counts


def test_avro_roundtrip_rich_types(spark, tmp_path):
    """Avro is roadmap in the reference (README.md:26-31) and an external
    jar in Spark; the self-contained container-file writer makes `.avro`
    outputs real offline.  Round-trips every supported type incl. nulls,
    logical date/timestamp-micros/decimal, and arrays."""
    import datetime
    from decimal import Decimal

    df = spark.createDataFrame(
        [
            (
                1,
                7,
                "hello",
                1.5,
                2.25,
                True,
                b"\x00\xff",
                datetime.date(2024, 2, 29),
                datetime.datetime(2024, 2, 29, 12, 34, 56, 789012),
                Decimal("12345.67"),
                [1, 2, None],
            ),
            (2, None, None, None, None, None, None, None, None, None, None),
        ],
        "id long, n int, s string, d double, f float, b boolean,"
        " raw binary, dt date, ts timestamp, dec decimal(10,2),"
        " arr array<int>",
    )
    out = str(tmp_path / "out.avro")
    write_output(df, out)
    from sql2all_spark.sinks.avro_io import read_avro

    got = read_avro(spark, out)
    assert got.schema == df.schema
    a, b_ = sorted(got.collect()), sorted(df.collect())
    assert a == b_


def test_avro_mode_honored(spark, sample, tmp_path):
    out = str(tmp_path / "m.avro")
    write_output(sample, out)
    with pytest.raises(ValueError, match="append"):
        write_output(sample, out, mode="append")
    with pytest.raises(ValueError, match="already exists"):
        write_output(sample, out, mode="error")
    write_output(sample, out, mode="ignore")  # no-op, no error
    write_output(sample, out, mode="overwrite")


def test_avro_export_from_testdata(spark, sf_dir, tmp_path):
    from sql2all_spark.export import export
    from sql2all_spark.sinks.avro_io import read_avro

    out = str(tmp_path / "nations.avro")
    df = export(
        spark,
        f"parquet://{sf_dir}/nation.parquet",
        "SELECT n_nationkey, n_name FROM src",
        out,
    )
    got = read_avro(spark, out)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, df.collect()))


def test_avro_write_never_collects_input_rows(spark, sf_dir, tmp_path):
    """The fallback Avro sink must be executor-side (ADVICE/VERDICT r8):
    rows are encoded in mapInArrow tasks and merged as raw block bytes,
    so the INPUT DataFrame is never collect()ed on the driver.  Pin it by
    sabotaging the instance's collect — the write must still succeed, and
    with >1 partition the merge must still produce one valid container
    file in partition order."""
    from sql2all_spark.sinks.avro_io import read_avro, write_avro
    from sql2all_spark.tables import load_table

    df = (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .repartition(4)
    )
    expected = sorted(map(tuple, df.collect()))

    def _no_collect(*a, **k):
        raise AssertionError("avro sink collected the input on the driver")

    df.collect = _no_collect  # instance-level: the summary DF is unaffected
    out = str(tmp_path / "orders.avro")
    write_avro(df, out)
    got = read_avro(spark, out)
    assert sorted(map(tuple, got.collect())) == expected


def test_avro_empty_result_schema_only_file(spark, sf_dir, tmp_path):
    from sql2all_spark.sinks.avro_io import read_avro, write_avro
    from sql2all_spark.tables import load_table

    df = load_table(spark, sf_dir, "nation").filter("n_nationkey < 0")
    out = str(tmp_path / "empty.avro")
    write_avro(df, out)
    got = read_avro(spark, out)
    assert got.count() == 0
    assert [f.name for f in got.schema.fields] == df.columns
