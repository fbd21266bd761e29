"""Structured Streaming slice over the events table.

The reference has no streaming support at all (its only pipeline is a
batch cursor → file writer, ``src/lib.rs:92-141``); this package adds the
streaming surface a Spark-native engine owes its users: windowed
aggregations with watermarks, streaming dedup, and file-stream sources.

Layout:
- :mod:`sql2all_spark.streaming.jobs`        — readStream/writeStream jobs
- :mod:`sql2all_spark.streaming.batch_twins` — batch-semantics twins of each
  streaming query, registered as oracle-checked ``queries()`` entries.  The
  streaming run is asserted against its batch twin in tests (timing-free
  determinism), per SURVEY.md §5.
"""
