"""Output stage (F7/O3/P7/A10/A11): assembled groups -> EMF event JSON.

The reference's JSON has an encoding bug — ``json:",inline"`` is not a
real encoding/json option so user fields nest under ``"OtherFields"``
(common/emf.go:9-12; hidden by the mock server decoding with the same
struct, mock-cloudwatch-server/main.go:78-81). We emit spec-correct
*flattened* EMF: ``_aws`` block + metric fields + dimension fields at
the top level, and tests assert logical content (SURVEY.md §2.3 F7).

Canonicalization (O3): metric fields sorted by name, histogram values
ascending, dims in to_json map order — the reference's output order is
Go-map nondeterministic even run-to-run (seh.go:53-61).
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, functions as F

# CloudWatch Logs constants (flush/cloudwatch.go:19-23)
MAX_EVENT_BYTES = 262_144
EVENT_OVERHEAD = 26


def _metric_fragment(m: Column, scalar_collapse: bool = True) -> Column:
    """One metric's JSON value. A10: a single-distinct-value metric
    collapses to the bare scalar ``stats.Max`` — dropping its count, a
    reference quirk reproduced on purpose (aggregator.go:192-197)."""
    hist_json = F.to_json(
        F.struct(
            m["values"].alias("Values"),
            m["counts"].alias("Counts"),
            m["min"].alias("Min"),
            m["max"].alias("Max"),
            m["sum"].alias("Sum"),
        )
    )
    if not scalar_collapse:
        return hist_json
    return F.when(F.size(m["values"]) == 1, m["max"].cast("string")).otherwise(
        hist_json
    )


def events_json(groups: DataFrame, scalar_collapse: bool = True) -> DataFrame:
    """Attach ``event_json`` (one EMF object per group) and ``event_bytes``;
    apply the P7 oversize drop (flush/cloudwatch.go:77-80) keeping a
    ``dropped_oversize`` marker column instead of silently losing rows."""
    aws_json = F.to_json(
        F.struct(
            F.col("timestamp").alias("Timestamp"),
            F.col("cw_metrics").alias("CloudWatchMetrics"),
        )
    )
    metric_parts = F.concat_ws(
        "",
        F.transform(
            F.col("metrics"),
            lambda m: F.concat(
                F.lit(',"'),
                m["metric_name"],
                F.lit('":'),
                _metric_fragment(m, scalar_collapse),
            ),
        ),
    )
    dims_inner = F.when(
        F.size(F.map_keys(F.col("dimensions"))) > 0,
        F.concat(
            F.lit(","),
            F.regexp_replace(F.to_json(F.col("dimensions")), r"^\{|\}$", ""),
        ),
    ).otherwise(F.lit(""))
    df = groups.withColumn(
        "event_json",
        F.concat(F.lit('{"_aws":'), aws_json, metric_parts, dims_inner, F.lit("}")),
    )
    df = df.withColumn(
        "event_bytes", F.octet_length("event_json") + F.lit(EVENT_OVERHEAD)
    )
    return df.withColumn("dropped_oversize", F.col("event_bytes") > MAX_EVENT_BYTES)


def write_events(df: DataFrame, out_dir: str, mode: str = "overwrite") -> tuple[str, str]:
    """Per-sink event tables: parquet (structured, the 'Iceberg table'
    stand-in) + JSONL (the reference's file-sink format,
    flush/file.go:40-66). Single pass each, partitioned by sink."""
    pq_path = os.path.join(out_dir, "events")
    df.filter(~F.col("dropped_oversize")).write.mode(mode).partitionBy(
        "sink"
    ).parquet(pq_path)
    txt_path = os.path.join(out_dir, "events_jsonl")
    (
        df.filter(~F.col("dropped_oversize"))
        .select("sink", F.col("event_json").alias("value"))
        .write.mode(mode)
        .partitionBy("sink")
        .text(txt_path)
    )
    return pq_path, txt_path


# PutLogEvents batch limits (flush/cloudwatch.go:19-23)
MAX_BATCH_BYTES = 1_048_576
MAX_BATCH_EVENTS = 10_000


def plan_cw_batches(events: DataFrame, order_cols: list[str] | None = None) -> DataFrame:
    """S5 batching plan: assign every event a deterministic batch id per
    sink honoring the 1 MB / 10k-events PutLogEvents limits
    (flush/cloudwatch.go:83-103). The reference packs greedily while
    draining its in-memory slice; distributed, we use running totals over
    a deterministic order — same limits, deterministic assignment:

      batch = max(floor(cum_bytes / 1MB), floor((row_rank-1) / 10k))

    (A greedy repack would need sequential state; floor-based splitting
    over-splits only when a single event straddles a boundary, and every
    batch still respects both limits.)"""
    from pyspark.sql.window import Window

    order_cols = order_cols or ["window_start", "dim_hash"]
    w = Window.partitionBy("sink").orderBy(*order_cols)
    cum_bytes = F.sum("event_bytes").over(w)
    rank = F.row_number().over(w)
    return events.withColumn(
        "batch_id",
        F.greatest(
            F.floor((cum_bytes - F.lit(1)) / F.lit(MAX_BATCH_BYTES)),
            F.floor((rank - F.lit(1)) / F.lit(MAX_BATCH_EVENTS)),
        ).cast("int"),
    )


def compression_stats(groups_with_json: DataFrame) -> DataFrame:
    """A11 per-sink compression ratio (aggregator.go:218-221): input
    records/bytes (carried through metadata agg) vs emitted events."""
    return groups_with_json.groupBy("sink").agg(
        F.sum("records").alias("records_in"),
        F.sum("bytes_in").alias("bytes_in"),
        F.count(F.lit(1)).alias("events_out"),
        F.sum("event_bytes").alias("bytes_out"),
        F.sum(F.col("dropped_oversize").cast("long")).alias("dropped_oversize"),
    )
