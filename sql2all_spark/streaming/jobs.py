"""Structured Streaming jobs over the events table.

Each job reads the events parquet as a *file stream* (``readStream`` with
``maxFilesPerTrigger``), applies a watermark, and aggregates into an
in-memory sink for tests (production would target kafka/delta/parquet
sinks via ``writeStream``).  ``trigger(availableNow=True)`` drains all
available input then stops — deterministic end-state, no timing races —
and tests assert the end-state equals the batch twin from
:mod:`sql2all_spark.streaming.batch_twins`.

Scale notes: streaming aggregation state lives in the state store keyed by
(window, group); the watermark bounds state size — without it, a 100 TB/day
stream grows state monotonically.  Watermark delay (10 min) is the
late-data tolerance; events later than that are dropped, which is the
documented trade.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sql2all_spark.functions.exact import dsum, floor_div_sql
from sql2all_spark.streaming.batch_twins import SESSION_GAP_MIN
from sql2all_spark.tables import load_table, normalize_events_ts, table_path

WATERMARK = "10 minutes"


def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet as a micro-batched file stream.

    File streams need an explicit schema; reuse the batch loader's (which
    already normalizes the nanos ts to a proper timestamp column).
    """
    batch = load_table(spark, sf_dir, "events")
    raw_schema = spark.read.parquet(table_path(sf_dir, "events")).schema
    # FileStreamSource force-sets basePath to the source path when it is not
    # a glob, and basePath must be a directory — so a single-file path always
    # fails.  A glob (matching exactly events.parquet) skips that branch.
    # Production would point at a landing *directory* of arriving files.
    glob = table_path(sf_dir, "events").replace("events.parquet", "events*.parquet")
    stream = (
        spark.readStream.schema(raw_schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(glob)
    )
    # identical ts normalization to tables.load_table (shared helper — the
    # batch and streaming read paths must stay in lockstep)
    stream = normalize_events_ts(stream)
    assert stream.schema == batch.schema
    return stream


def tumbling_counts(stream: DataFrame) -> DataFrame:
    """Watermarked tumbling 1-hour counts — streaming form of the
    ``stream_tumbling_window`` batch twin."""
    return (
        stream.withWatermark("ts", WATERMARK)
        .groupBy(F.window("ts", "1 hour").start.alias("window_start"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum(F.col("value")).alias("total_value"),
        )
    )


def session_values(stream: DataFrame) -> DataFrame:
    """Watermarked session windows — streaming form of
    ``stream_session_window``."""
    return (
        stream.withWatermark("ts", WATERMARK)
        .groupBy("user_id", F.session_window("ts", f"{SESSION_GAP_MIN} minutes"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum(F.col("value")).alias("session_value"),
        )
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
            "session_value",
        )
    )


def dedup_stream(stream: DataFrame) -> DataFrame:
    """Streaming dedup on (user, type, minute) within the watermark —
    streaming form of ``stream_dedup_watermark`` (state is dropped once the
    watermark passes each key's minute)."""
    keyed = stream.withColumn(
        "minute", F.expr(floor_div_sql("unix_micros(ts)", 60000000))
    )
    return (
        keyed.withWatermark("ts", WATERMARK)
        .dropDuplicatesWithinWatermark(["user_id", "event_type", "minute"])
        .select("event_id", "user_id", "event_type", "ts")
    )


def sliding_counts(stream: DataFrame) -> DataFrame:
    """Watermarked sliding 10-min/5-min windows — streaming form of the
    ``stream_sliding_window`` batch twin (each event lands in 2 windows)."""
    return (
        stream.withWatermark("ts", WATERMARK)
        .groupBy(F.window("ts", "10 minutes", "5 minutes").start.alias("window_start"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.approx_count_distinct("user_id").alias("n_users_approx"),
        )
    )


def stateful_user_stats(stream: DataFrame) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: per-user
    running event count + value total held in explicit state.

    This is the escape hatch for stateful logic Spark's built-in windows
    can't express (per-key models, custom eviction, cross-batch counters).
    State is one (long, double) pair per user — bounded by key cardinality,
    not stream length.  Emits the updated totals for each user seen in the
    micro-batch (output mode: update).
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs, state: GroupState):
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        import pandas as pd

        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_value": [round(total, 2)],
            }
        )

    return stream.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id long, n_events long, total_value double",
        stateStructType="n long, total double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def enrich_with_static(stream: DataFrame, profiles: DataFrame) -> DataFrame:
    """Stream-static join: enrich each event with a batch-side dimension
    (per-user signup profile).  The static side re-resolves per micro-batch
    (so a dim refresh is picked up without restarting) and broadcasts when
    small — no streaming state is needed at all for this join type."""
    return stream.join(F.broadcast(profiles), "user_id").select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        "value",
        "first_seen",
    )


def stream_stream_attribution(purchases: DataFrame, clicks: DataFrame) -> DataFrame:
    """Stream-stream interval join: purchases matched to same-user clicks
    within the preceding hour.

    Both sides are watermarked and the join condition bounds the event-time
    gap, so Spark can expire buffered rows once the watermark passes the
    interval — without the time bound, both join buffers grow forever.
    State per side ≈ one watermark-window of rows, independent of stream
    length.
    """
    p = purchases.withWatermark("ts", WATERMARK).alias("p")
    c = clicks.withWatermark("ts", WATERMARK).alias("c")
    return p.join(
        c,
        F.expr(
            """
            p.user_id = c.user_id AND
            c.ts >= p.ts - INTERVAL 1 HOUR AND
            c.ts < p.ts
            """
        ),
    ).select(
        F.col("p.event_id").alias("purchase_id"),
        F.col("p.user_id").alias("user_id"),
        F.col("p.ts").alias("purchase_ts"),
        F.col("c.ts").alias("click_ts"),
        F.col("c.value").alias("click_value"),
    )


def stateful_tws_user_max(stream: DataFrame) -> DataFrame:
    """Per-user running (max value, event count) via transformWithState —
    the Spark 4.x stateful-processor API (successor to
    ``applyInPandasWithState``), with typed ValueState in RocksDB.

    Compared to the legacy API: named state variables with schemas, timer
    support, TTL on state — this job uses a single ValueState cell per user,
    so state size is O(distinct users) regardless of stream length.

    Environment note: the state-server protocol needs a working
    ``google.protobuf``; where it's broken/absent the query fails at start
    (the legacy ``stateful_user_stats`` above has no such dependency).
    """
    import pandas as pd_  # local: workers re-import this module
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class UserMax(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("agg", "mx double, n long")

        def handleInputRows(self, key, rows, timerValues):
            if self._state.exists():
                mx, n = self._state.get()
            else:
                mx, n = float("-inf"), 0
            for pdf in rows:
                n += len(pdf)
                mx = max(mx, float(pdf["value"].max()))
            self._state.update((mx, n))
            yield pd_.DataFrame(
                {"user_id": [key[0]], "max_value": [mx], "n_events": [n]}
            )

        def close(self) -> None:
            pass

    return stream.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=UserMax(),
        outputStructType="user_id long, max_value double, n_events long",
        outputMode="Update",
        timeMode="None",
    )


def documents_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.parquet as a micro-batched file stream — the ingestion
    shape of a continuously-landing document corpus (crawler output
    arriving as files).  Same glob workaround as ``events_stream``."""
    raw_schema = spark.read.parquet(table_path(sf_dir, "documents")).schema
    glob = table_path(sf_dir, "documents").replace(
        "documents.parquet", "documents*.parquet"
    )
    return (
        spark.readStream.schema(raw_schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(glob)
    )


def chunk_stream(stream: DataFrame) -> DataFrame:
    """Streaming document chunking: the stateless row-local
    ``chunk_windows`` transformation applied to an unbounded document
    stream — no watermark or state store needed (nothing aggregates), so
    each arriving document emits its chunks in the same micro-batch.
    Pair with ``stream_export`` for the continuous chunk-ingestion
    pipeline: land docs → chunk → batch-keyed parquet subdirs, exactly-once
    at the batch level."""
    from sql2all_spark.operators.text import chunk_windows

    return chunk_windows(stream)


def stream_export(
    df: DataFrame,
    output: str,
    checkpoint: str,
) -> object:
    """Production file-sink path: drain the stream into the extension-
    dispatched sink layer via ``foreachBatch``.

    ``foreachBatch`` hands each micro-batch to the same ``write_output``
    used by the batch ``export()`` API, so every sink format (parquet/csv/
    ndjson/orc) is also a streaming sink.  Exactly-once at the batch level:
    each micro-batch writes to a DETERMINISTIC ``batch-<id>.<ext>``
    subdirectory of ``output`` with overwrite semantics, so a batch
    replayed after a mid-batch failure rewrites the same path instead of
    appending duplicates (Spark replays the batch id from the checkpoint;
    the keyed overwrite makes the writer idempotent).

    Read the result back with
    ``spark.read.option("recursiveFileLookup", "true").parquet(output)``
    (or a ``output/batch-*.<ext>`` glob) — the per-batch subdirectories are
    not a Hive partition layout, by design: a partition column would change
    the payload schema versus the batch ``export()`` of the same query.

    ``trigger(availableNow=True)`` drains pending input and stops — the
    batch-job-over-a-stream pattern.
    """
    from sql2all_spark.sinks import format_from_extension, write_output

    ext = output.rstrip("/").rsplit(".", 1)[-1].lower()
    format_from_extension(output)  # fail fast on unsupported extensions

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        write_output(
            batch_df, f"{output}/batch-{batch_id:010d}.{ext}", mode="overwrite"
        )

    return (
        df.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def run_to_memory(
    df: DataFrame, output_mode: str = "append", name: str | None = None
) -> tuple[str, object]:
    """Drain all available input into an in-memory table and stop.

    Returns (table_name, query).  ``availableNow`` processes every pending
    file then terminates — the test harness then reads the memory table.
    """
    name = name or f"mem_{uuid.uuid4().hex[:8]}"
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return name, q


def parquet_dir_stream(
    spark: SparkSession, landing_dir: str, schema
) -> DataFrame:
    """A landing DIRECTORY of parquet files as a micro-batched stream
    (``maxFilesPerTrigger=1`` → one micro-batch per arriving file) — the
    production shape for continuously-landing corpus batches, and the
    harness the incremental-operator stream tests feed with split files."""
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(landing_dir)
    )


def screen_stream(
    doc_stream: DataFrame,
    corpus_docs: DataFrame,
    output: str,
    checkpoint: str,
) -> object:
    """Continuous-ingestion near-dup screening: every arriving micro-batch
    of documents is screened against the STANDING corpus via
    ``operators.dedup.screen_against_corpus`` — the streaming leg of the
    ``dedup_incremental_screen`` batch operator.

    The corpus is shingled once and persisted (in production: the stored
    signature table); per micro-batch cost is O(batch × collision rate),
    so the job keeps up with an unbounded stream as long as each batch
    does — no state store is needed because each doc's verdict depends
    only on (doc, corpus).  Exactly-once at the batch level by the same
    recipe as ``stream_export``: each batch writes to a deterministic
    ``batch-<id>.parquet`` subdir with overwrite semantics, so checkpoint
    replay rewrites instead of duplicating.
    """
    from sql2all_spark.operators.dedup import _shingled_docs, screen_against_corpus
    from sql2all_spark.sinks import write_output

    shingled_corpus = _shingled_docs(corpus_docs).persist()

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        verdicts = screen_against_corpus(_shingled_docs(batch_df), shingled_corpus)
        write_output(
            verdicts, f"{output}/batch-{batch_id:010d}.parquet", mode="overwrite"
        )

    return (
        doc_stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def ann_refresh_stream(
    emb_stream: DataFrame, index_path: str, checkpoint: str
) -> object:
    """Continuous ANN-index maintenance: every arriving micro-batch of
    embeddings is appended into the stored bucket-partitioned LSH index via
    ``operators.similarity.refresh_ann_index`` — the streaming leg of the
    ``sim_ann_index_refresh`` batch operator.  O(batch) writes per trigger;
    the standing index is never rewritten (the no-rewrite file audit in
    test_plans covers the underlying refresh).

    Idempotency note: ``refresh_ann_index`` APPENDS files, so a replayed
    batch would re-append.  A ``_batches/<id>`` marker under the index
    root records completed batches and the job skips already-marked ids on
    replay.  The marker lands after the append, so a crash BETWEEN append
    and marker still duplicates that one batch — closing that gap needs a
    transactional table format (staging + manifest swap), which is the
    documented production upgrade path, not something a filesystem sink
    can promise.
    """
    import os

    from sql2all_spark.operators.similarity import refresh_ann_index

    marker_dir = os.path.join(index_path, "_batches")

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        os.makedirs(marker_dir, exist_ok=True)
        marker = os.path.join(marker_dir, f"{batch_id:010d}")
        if os.path.exists(marker):
            return
        refresh_ann_index(index_path, batch_df)
        with open(marker, "w") as f:
            f.write("done")

    return (
        emb_stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def grouped_ann_stream(
    query_stream: DataFrame,
    corpus_embeddings: DataFrame,
    output: str,
    checkpoint: str,
) -> object:
    """Continuous batched ANN serving: every arriving micro-batch of query
    embeddings gets its top-k corpus neighbors via
    ``operators.ann_batch.grouped_ann`` — the streaming leg of the
    ``sim_grouped_ann`` batch operator (the RAG request-stream shape).

    The corpus projection (vectors + sign buckets) is computed once and
    persisted (in production: the stored ANN index); per micro-batch cost
    is O(batch × bucket occupancy), so the job keeps up with an unbounded
    request stream — no state store, because each answer depends only on
    (batch, corpus).  Exactly-once at the batch level by the stream_export
    recipe: deterministic ``batch-<id>.parquet`` subdirs with overwrite, so
    checkpoint replay rewrites instead of duplicating.
    """
    from sql2all_spark.operators.ann_batch import embedding_view, grouped_ann
    from sql2all_spark.sinks import write_output

    corpus_view = embedding_view(corpus_embeddings).persist()

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        answers = grouped_ann(embedding_view(batch_df), corpus_view)
        write_output(
            answers, f"{output}/batch-{batch_id:010d}.parquet", mode="overwrite"
        )

    return (
        query_stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def retention_stream(
    event_stream: DataFrame, state_dir: str, checkpoint: str
) -> object:
    """Incremental cohort-retention maintenance: every arriving
    micro-batch of events folds into a standing state from which the
    full retention matrix derives — the streaming leg of the
    ``ts_retention_cohorts`` batch operator (VERDICT r9 #6).

    State design: the matrix is a pure function of the DISTINCT
    (user_id, day) pair set (``operators.retention.user_day_pairs`` —
    first-event cohorts, cohort sizes, and every cell all derive from
    it), and that set is a SEMILATTICE under union.  So the fold is an
    O(batch) append of each batch's deduplicated pairs, and replayed or
    duplicated batches are semantically idempotent — re-unioning already-
    present pairs cannot change the derived matrix.  No exactly-once
    marker machinery is needed (contrast ``ann_refresh_stream``, whose
    append state is NOT a set).  Late events fold in like any others:
    an earlier-day arrival simply moves its user's min-day cohort at the
    next derivation — nothing in the state needs rewriting, which is the
    property that makes cohort REASSIGNMENT (the hard case for
    incremental matrix maintenance) free here.

    Per-batch cost is O(batch) (dedup + append); deriving the matrix via
    :func:`retention_matrix_from_state` is O(state) = O(users x days),
    orders of magnitude below O(events).  Production note: the appended
    pair files compact via ``incremental_file_compaction``'s policy when
    small-file count grows.
    """
    from sql2all_spark.operators.retention import user_day_pairs

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        (
            user_day_pairs(batch_df)
            .distinct()
            .write.mode("append")
            .parquet(state_dir)
        )

    return (
        event_stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def retention_matrix_from_state(spark: SparkSession, state_dir: str) -> DataFrame:
    """Derive the retention matrix from the standing pair-set state
    written by :func:`retention_stream` (matrix_from_pairs re-distincts,
    so cross-batch duplicate pairs are harmless)."""
    from sql2all_spark.operators.retention import matrix_from_pairs

    return matrix_from_pairs(spark.read.parquet(state_dir))
