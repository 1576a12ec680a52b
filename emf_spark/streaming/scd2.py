"""Streaming SCD2 maintenance + snapshot-diff publishing: the
stream-native siblings of datax/diff.scd2_apply and
datax/diff.snapshot_diff, for the pipeline where full snapshots of a
keyed dimension LAND AS FILES (daily partner dumps, hourly exports) and
downstream wants (a) a maintained type-2 history and (b) the
added/removed/changed delta feed — without anyone re-running batch jobs
by hand.

Both reuse streaming/cdc.py's VERSIONED-store replay contract verbatim:
micro-batch ``b`` reads the highest store version <= b and writes
version ``b+1``, so a batch replayed after a pre-commit crash re-runs
against the same predecessor it read the first time; its own partial
output lives at a higher version and is overwritten. Diff deltas
additionally land batch_id-partitioned with dynamic partition overwrite
(the repo's standard idempotent streaming write).

Input contract: EACH MICRO-BATCH IS ONE COMPLETE SNAPSHOT. Feed one
snapshot file per trigger (``maxFilesPerTrigger=1`` is the default
here, unlike the CDC merge where batches compose) — a half-delivered
snapshot would read as mass deletion, exactly like handing
scd2_apply a truncated frame. SCD2 history versions advance with the
batch id: batch ``b`` closes/opens rows at version ``b+1`` (the batch
id IS the business version of a landed dump; map it to dates
downstream via the delivery manifest if needed).

Equivalence: with in-order snapshot arrival, the streamed fold equals
applying the batch operators sequentially — pinned by parity pytests.

Scale shape per micro-batch: scd2 pays the batch operator's single
full-outer join between the OPEN slice and the snapshot (closed history
passes through around the join); diff pays one full-outer join of two
(key, hash) projections. History/previous-snapshot stores rewrite per
batch — the compacted-store cost, amortized by longer triggers, same
trade as the CDC merge.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from emf_spark.datax.diff import scd2_apply, snapshot_diff
from emf_spark.streaming.cdc import _versions


def init_history(history: DataFrame, history_dir: str) -> None:
    """Write the bootstrap SCD2 history as version 0. For a cold start
    pass an empty frame with the full history schema (keys + attrs +
    valid_from/valid_to)."""
    history.write.mode("overwrite").parquet(os.path.join(history_dir, "v=0"))


def current_history(spark: SparkSession, history_dir: str) -> DataFrame:
    vs = _versions(spark, history_dir)
    if not vs:
        raise ValueError(f"no history versions under {history_dir}")
    return spark.read.parquet(os.path.join(history_dir, f"v={vs[-1]}"))


def run_scd2_stream(
    spark: SparkSession,
    snapshot_feed_dir: str,
    history_dir: str,
    checkpoint_dir: str,
    key_cols: list[str],
    attr_cols: list[str] | None = None,
    trigger: dict | None = None,
    max_files_per_trigger: int = 1,
):
    """Stream landed full-snapshot parquet files from
    ``snapshot_feed_dir`` into the versioned SCD2 history at
    ``history_dir`` (bootstrap with init_history first). Batch ``b``
    applies scd2_apply(history<=b, batch, version=b+1) and writes
    history v=b+1. Returns the started StreamingQuery."""
    if not _versions(spark, history_dir):
        raise ValueError(
            f"bootstrap missing: call init_history before streaming "
            f"into {history_dir}"
        )
    schema = spark.read.parquet(snapshot_feed_dir).schema

    def fold(batch: DataFrame, batch_id: int) -> None:
        s = batch.sparkSession
        prev = [v for v in _versions(s, history_dir) if v <= batch_id]
        hist = s.read.parquet(os.path.join(history_dir, f"v={prev[-1]}"))
        out = scd2_apply(
            hist, batch, key_cols, version=batch_id + 1, attr_cols=attr_cols
        )
        out.write.mode("overwrite").parquet(
            os.path.join(history_dir, f"v={batch_id + 1}")
        )

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(snapshot_feed_dir)
    )
    return (
        stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(**(trigger or {"availableNow": True}))
        .start()
    )


def init_prev_snapshot(snapshot: DataFrame, store_dir: str) -> None:
    """Write the diff stream's bootstrap 'previous snapshot' as v=0."""
    snapshot.write.mode("overwrite").parquet(os.path.join(store_dir, "v=0"))


def run_snapshot_diff_stream(
    spark: SparkSession,
    snapshot_feed_dir: str,
    store_dir: str,
    delta_dir: str,
    checkpoint_dir: str,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
    trigger: dict | None = None,
    max_files_per_trigger: int = 1,
):
    """Stream landed full-snapshot parquet files and publish the
    (key..., status, batch_id) delta of each against its predecessor to
    ``delta_dir`` (batch_id-partitioned, dynamic overwrite), keeping the
    predecessor in the versioned store at ``store_dir`` (bootstrap with
    init_prev_snapshot). Returns the started StreamingQuery."""
    if not _versions(spark, store_dir):
        raise ValueError(
            f"bootstrap missing: call init_prev_snapshot before streaming "
            f"into {store_dir}"
        )
    schema = spark.read.parquet(snapshot_feed_dir).schema

    def publish(batch: DataFrame, batch_id: int) -> None:
        s = batch.sparkSession
        prev = [v for v in _versions(s, store_dir) if v <= batch_id]
        old = s.read.parquet(os.path.join(store_dir, f"v={prev[-1]}"))
        delta = snapshot_diff(old, batch, key_cols, compare_cols).withColumn(
            "batch_id", F.lit(batch_id)
        )
        (
            delta.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(delta_dir)
        )
        # the new snapshot becomes the next batch's predecessor; written
        # AFTER the delta so a crash between the writes replays cleanly
        # (delta partition is overwritten, store version is overwritten)
        batch.write.mode("overwrite").parquet(
            os.path.join(store_dir, f"v={batch_id + 1}")
        )

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(snapshot_feed_dir)
    )
    return (
        stream.writeStream.foreachBatch(publish)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(**(trigger or {"availableNow": True}))
        .start()
    )
