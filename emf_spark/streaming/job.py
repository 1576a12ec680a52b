"""Structured Streaming front-end (SURVEY.md §2.6 W1-W4).

The reference is a streaming aggregator: fluent-bit pushes chunks, a
wall-clock ticker flushes accumulated state every aggregation_period and
resets it (task.go:29-47, aggregator.go:153-231). Two faithful Spark
mappings are provided:

1. ``run_microbatch`` — ``readStream`` + ``foreachBatch`` at a
   processing-time trigger. Each micro-batch runs the SAME batch
   aggregation (event-time tumbling windows inside the batch) and
   appends per-sink events + lineage. Because event output is keyed by
   (sink, window_start, dim_hash) and the histogram merge is
   associative, re-aggregating a window across micro-batches appends
   *partial* event rows per batch — exactly the reference's semantics
   of flushing what arrived during each interval (its groups also split
   across flushes, aggregator.go:223-227). Downstream exact merges use
   the per-sink value-count outputs, which merge by summation.

2. ``run_eventtime_counts`` — a watermarked update-mode windowed
   aggregation for the simple count/sum surface, demonstrating genuine
   cross-batch streaming state + late-data handling (the reference has
   none, W2: any record aggregates into the in-flight interval).

Checkpointing: standard Structured Streaming checkpoint dir; resume
picks up from the last committed micro-batch (W3 — strictly stronger
than the reference, whose shutdown flush is admittedly broken,
fluent-bit-emf/main.go:78-85).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from emf_spark import fixtures
from emf_spark.operators import aggregate as agg
from emf_spark.operators import enrich as enrich_op
from emf_spark.operators import output as output_op
from emf_spark.operators import parse as parse_op
from emf_spark.schema import TOKENIZED_SCHEMA
from emf_spark.tokenizer import with_payload


def _aggregate_batch(
    batch: DataFrame,
    out_dir: str,
    batch_id: int,
    lookup: DataFrame,
    window_ms: int,
    key_by_namespace: bool = False,
) -> None:
    spark = batch.sparkSession
    parsed = parse_op.parse_emf(with_payload(batch))
    valid, errors = parse_op.split_valid(parsed)
    # idempotent under micro-batch REPLAY (append-then-crash-before-
    # checkpoint-commit re-runs the same batch_id): every write is a
    # dynamic partition overwrite scoped to this batch_id, so a replay
    # overwrites its own partition instead of appending duplicates
    (
        errors.withColumn("batch_id", F.lit(batch_id))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(os.path.join(out_dir, "errors"))
    )
    windowed = agg.with_window(enrich_op.enrich(valid, lookup), window_ms)
    obs = agg.explode_observations(windowed, key_by_namespace)
    hist = agg.aggregate_histograms(obs, key_by_namespace)
    meta = agg.aggregate_metadata(windowed, key_by_namespace)
    events = output_op.events_json(
        agg.assemble_groups(hist, meta, key_by_namespace)
    ).withColumn(
        "batch_id", F.lit(batch_id)
    )
    # ALL partials are persisted, including oversize-flagged ones: the
    # events dir is the MERGE's input store, not the final sink. The
    # oversize policy applies to the MERGED final event (compact_events
    # re-renders the JSON and filters there) — silently dropping a
    # partial here made the merged final event undercount where the
    # one-shot batch run would have dropped the whole group (review
    # finding, merge.py's streaming==batch contract).
    (
        events
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id", "sink")
        .parquet(os.path.join(out_dir, "events"))
    )


def run_microbatch(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    window_ms: int = agg.WINDOW_MS,
    trigger: dict | None = None,
    lookup: DataFrame | None = None,
    key_by_namespace: bool = False,
    max_files_per_trigger: int = 8,
):
    """File-source streaming job; ``trigger`` defaults to availableNow
    (drain-and-stop, for tests); pass {'processingTime': '5 seconds'}
    for the reference's ticker behavior. ``key_by_namespace`` switches
    the per-batch aggregation to the north-rule key, same as batch."""
    lookup = lookup if lookup is not None else fixtures.lookup_df(spark)
    stream = (
        spark.readStream.schema(TOKENIZED_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )
    writer = stream.writeStream.foreachBatch(
        lambda b, i: _aggregate_batch(b, out_dir, i, lookup, window_ms, key_by_namespace)
    ).option("checkpointLocation", os.path.join(out_dir, "_checkpoint"))
    writer = writer.trigger(**(trigger or {"availableNow": True}))
    return writer.start()


def run_eventtime_counts(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    window: str = "1 minute",
    watermark: str = "30 seconds",
    max_files_per_trigger: int = 2,
    slide: str | None = None,
):
    """Cross-batch stateful windowed counts with a watermark (W2): per
    (sink-agnostic) dim_hash and event-time window, the record count and
    the count of DECLARED METRIC KEYS across records (``metric_keys`` —
    not post-parse observation counts, which would need the full value
    normalization this lightweight surface skips); late rows beyond
    the watermark are dropped
    by Spark's state eviction. Append mode emits a window once the
    watermark passes its end — windows still open when a bounded input
    drains stay in state (use update mode or a final flush for those).
    ``slide`` turns the window hopping (each event lands in
    size/slide windows — the streaming form of emf_sliding_window);
    state grows by the same factor, watermark eviction unchanged."""
    stream = (
        spark.readStream.schema(TOKENIZED_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )
    parsed = parse_op.parse_emf(with_payload(stream))
    valid = parsed.filter(F.col("valid")).withColumn(
        "event_time", F.timestamp_millis(F.col("ts"))
    )
    counts = (
        valid.withWatermark("event_time", watermark)
        .groupBy(
            F.window("event_time", window, slide or window).alias("w"),
            "dim_hash",
        )
        .agg(
            F.count(F.lit(1)).alias("records"),
            F.sum(F.size(F.map_keys(F.col("metric_raw")))).alias("metric_keys"),
        )
        .select(
            F.unix_millis(F.col("w.start")).alias("window_start"),
            "dim_hash",
            "records",
            "metric_keys",
        )
    )
    return (
        counts.writeStream.outputMode("append")
        .option("checkpointLocation", os.path.join(out_dir, "_checkpoint"))
        .trigger(availableNow=True)
        .start(path=os.path.join(out_dir, "counts"), format="parquet")
    )


def run_eventtime_sessions(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    gap: str = "30 seconds",
    watermark: str = "30 seconds",
    max_files_per_trigger: int = 2,
):
    """Watermarked SESSION windows (VERDICT r3 item 7 — the streaming
    form of ``operators/sessions.py``): per dim_hash, events separated
    by more than ``gap`` of event-time inactivity start a new session;
    Spark's ``session_window`` state merges overlapping in-flight
    sessions across micro-batches and the watermark closes a session
    once event time passes last_event + gap + watermark. Append mode
    emits each closed session exactly once; semantics (inclusive-merge
    boundary, end = last event + gap) match the batch operator, pinned
    by the parity test. Scale: state is one (key, open-session) entry
    per in-flight session — bounded by key cardinality x gap, evicted
    by the watermark, never by job restarts (checkpointed)."""
    stream = (
        spark.readStream.schema(TOKENIZED_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )
    parsed = parse_op.parse_emf(with_payload(stream))
    valid = parsed.filter(F.col("valid")).withColumn(
        "event_time", F.timestamp_millis(F.col("ts"))
    )
    sessions = (
        valid.withWatermark("event_time", watermark)
        .groupBy(F.session_window("event_time", gap).alias("sw"), "dim_hash")
        .agg(
            F.count(F.lit(1)).alias("records"),
            F.sum(F.size(F.map_keys(F.col("metric_raw")))).alias("metric_keys"),
        )
        .select(
            F.unix_millis(F.col("sw.start")).alias("session_start"),
            F.unix_millis(F.col("sw.end")).alias("session_end"),
            "dim_hash",
            "records",
            "metric_keys",
        )
    )
    return (
        sessions.writeStream.outputMode("append")
        .option("checkpointLocation", os.path.join(out_dir, "_checkpoint"))
        .trigger(availableNow=True)
        .start(path=os.path.join(out_dir, "sessions"), format="parquet")
    )
