from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")


def test_entry_returns_rows(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "sum_qty" in df.columns


def test_every_query_has_registry_entry(spark):
    import __spark_entry__ as e

    qs = e.queries()
    oracles = e.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) >= 6


def test_events_ts_session_timezone_independent(spark, sf_dir):
    """ADVICE r5: to_utc_timestamp on an NTZ column silently shifted the
    instant with the session timezone.  The convert_timezone-based
    normalization in tables.normalize_events_ts must yield identical
    unix_micros under any session timezone (load_table targets
    driver-provided sessions it didn't configure)."""
    import pyspark.sql.functions as F

    from sql2all_spark.tables import load_table

    orig = spark.conf.get("spark.sql.session.timeZone")
    seen = set()
    try:
        for tz in ["UTC", "America/New_York", "Asia/Tokyo"]:
            spark.conf.set("spark.sql.session.timeZone", tz)
            df = load_table(spark, sf_dir, "events")
            assert dict(df.dtypes)["ts"] == "timestamp"
            row = df.select(
                F.sum(F.expr("unix_micros(ts)")).alias("s"),
                F.min(F.expr("unix_micros(ts)")).alias("mn"),
            ).collect()[0]
            seen.add((row.s, row.mn))
    finally:
        spark.conf.set("spark.sql.session.timeZone", orig)
    assert len(seen) == 1, f"ts instants drift with session tz: {seen}"
