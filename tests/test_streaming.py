"""Streaming ≡ batch-twin equivalence (SURVEY.md §5: streaming state tests
compare against batch twins, never wall-clock)."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from sql2all_spark.streaming import jobs
from sql2all_spark.streaming.batch_twins import (
    stream_dedup_watermark,
    stream_session_window,
    stream_tumbling_window,
)


def _rows(df):
    return sorted(tuple(str(v) for v in r) for r in df.collect())


def test_tumbling_stream_matches_batch_twin(spark, sf_dir):
    stream = jobs.events_stream(spark, sf_dir)
    name, q = jobs.run_to_memory(jobs.tumbling_counts(stream), output_mode="complete")
    got = spark.table(name)
    want = stream_tumbling_window(spark, sf_dir)
    assert _rows(got) == _rows(want)


def test_session_stream_matches_batch_twin(spark, sf_dir):
    stream = jobs.events_stream(spark, sf_dir)
    name, q = jobs.run_to_memory(jobs.session_values(stream), output_mode="complete")
    got = spark.table(name)
    want = stream_session_window(spark, sf_dir)
    assert _rows(got) == _rows(want)


def test_dedup_stream_matches_batch_twin(spark, sf_dir):
    stream = jobs.events_stream(spark, sf_dir)
    name, q = jobs.run_to_memory(jobs.dedup_stream(stream), output_mode="append")
    got = spark.table(name)
    want = stream_dedup_watermark(spark, sf_dir)
    # single ordered input file + availableNow ⇒ stream keeps exactly the
    # batch twin's first-per-key rows
    assert _rows(got) == _rows(want)
