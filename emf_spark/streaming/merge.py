"""Exact re-merge of per-batch PARTIAL events into final events
(streaming exact-merge mode, VERDICT r2 item 7).

``run_microbatch`` appends one partial event per (sink, window_start,
dim_hash) per micro-batch — the reference's per-flush split
(aggregator.go:223-227). Because every piece of event state is an
associative merge, the partials re-merge EXACTLY:

- value->count histogram: pair-level summation (A2); for metrics that
  crossed into SEH in a partial, the representative value round-trips
  to its own bucket (seh_bucket(seh_value_of(b)) == b — floor(b+0.5)),
  so bucket counts merge losslessly (A8's associativity).
- min/max/sum/count: merged from the partials' TRUE stats columns
  (min-of-mins, max-of-maxes, sum-of-sums, sum-of-counts) — never
  recomputed from post-SEH representatives. The double ``sum``
  accumulates in ascending-addend order (same canonicalization trick
  as aggregate_histograms' value-ordered window) so the merge is
  deterministic; across a different partial split it can still differ
  from the batch engine's ascending-v accumulation in the last ulp
  (float addition is not associative — the parity test pins exact
  equality everywhere and 1e-9 relative on sum).
- dims: identical within a dim_hash group by construction (the hash IS
  the sorted dim pairs), so first-wins is value-stable.
- timestamp last-wins = max; records/bytes_in = summation;
  CloudWatchMetrics = the same per-namespace sorted union as
  aggregate_metadata (idempotent over partial unions).

One shuffle per phase on the group keys; per-group state stays bounded
(post-SEH cardinality), so the merge scales like the aggregation
itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from emf_spark.functions import seh_bucket, seh_value_of
from emf_spark.operators import aggregate as agg
from emf_spark.operators import output as output_op


def merge_partial_events(
    events: DataFrame, key_by_namespace: bool = False
) -> DataFrame:
    """Partial event rows (the structured ``events`` parquet written by
    run_microbatch / the batch pipeline) -> one final event per
    (sink, window_start[, namespace], dim_hash), with ``event_json``
    re-rendered. Streaming-then-merge == one-shot batch aggregation."""
    keys = [
        c
        for c in ("sink", "window_start", "namespace", "dim_hash")
        if c in events.columns
    ]

    # ---- metric merge ----
    mt = events.select(*keys, F.explode("metrics").alias("m"))
    # TRUE stats merge; ascending-addend order makes the double sum
    # deterministic under any partial split
    ws = (
        Window.partitionBy(*keys, "metric_name")
        .orderBy("psum")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    stats = (
        mt.select(
            *keys,
            F.col("m.metric_name").alias("metric_name"),
            F.col("m.min").alias("pmin"),
            F.col("m.max").alias("pmax"),
            F.col("m.sum").alias("psum"),
            F.col("m.count").alias("pcount"),
        )
        .select(
            *keys,
            "metric_name",
            F.min("pmin").over(ws).alias("min"),
            F.max("pmax").over(ws).alias("max"),
            F.sum("psum").over(ws).alias("sum"),
            F.sum("pcount").over(ws).alias("count"),
        )
        .dropDuplicates(keys + ["metric_name"])
    )
    pairs = mt.select(
        *keys,
        F.col("m.metric_name").alias("metric_name"),
        F.col("m.n_distinct").alias("pnd"),
        F.explode(F.arrays_zip("m.values", "m.counts")).alias("p"),
    ).select(
        *keys,
        "metric_name",
        "pnd",
        F.col("p.values").alias("v"),
        F.col("p.counts").alias("c"),
    )
    p1 = pairs.groupBy(*keys, "metric_name", "v").agg(
        F.sum("c").alias("c"), F.max("pnd").alias("pnd")
    )
    wv = (
        Window.partitionBy(*keys, "metric_name")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    # Branch cardinality = max(merged distinct, any partial's RAW
    # distinct): a partial that already SEH'd (n_distinct >= 3) may
    # carry few representative values, and merging it with a new raw
    # value must NOT fall back to the exact branch — the batch engine
    # saw >= 3 raw distinct and buckets everything (review finding:
    # partial A={10.0,10.1,10.2} SEH'd + partial B={5.0} previously
    # emitted raw 5.0 next to A's representative).
    j = p1.withColumn(
        "n_distinct",
        F.greatest(F.count(F.lit(1)).over(wv), F.max("pnd").over(wv)),
    )
    out_v = (
        F.when(F.col("n_distinct") <= 2, F.col("v"))
        .otherwise(seh_value_of(seh_bucket(F.col("v"))))
        .alias("out_v")
    )
    p3 = (
        j.groupBy(*keys, "metric_name", out_v)
        .agg(F.sum("c").alias("c"), F.max("n_distinct").alias("n_distinct"))
        .filter((F.col("n_distinct") <= 2) | (F.col("c") > 0))
    )
    hist = (
        p3.groupBy(*keys, "metric_name")
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col("out_v").alias("v"), F.col("c").alias("c")))
            ).alias("hist"),
            F.max("n_distinct").alias("n_distinct"),
        )
        .select(
            *keys,
            "metric_name",
            F.col("hist.v").alias("values"),
            F.col("hist.c").alias("counts"),
            "n_distinct",
        )
        .join(stats, keys + ["metric_name"])
        .select(
            *keys, "metric_name", "values", "counts",
            "min", "max", "sum", "count", "n_distinct",
        )
    )

    # ---- metadata merge (same shapes as aggregate_metadata's output) ----
    meta = events.groupBy(*keys).agg(
        F.min_by("dimensions", F.struct(F.col("timestamp"))).alias("dimensions"),
        F.max("timestamp").alias("timestamp"),
        F.sum("records").alias("records"),
        F.sum("bytes_in").alias("bytes_in"),
    )
    cw = events.select(*keys, F.explode("cw_metrics").alias("p"))
    per_ns = cw.groupBy(*keys, F.col("p.Namespace").alias("proj_ns")).agg(
        F.sort_array(
            F.array_distinct(F.flatten(F.collect_list(F.col("p.Dimensions"))))
        ).alias("Dimensions"),
        F.sort_array(
            F.array_distinct(F.flatten(F.collect_list(F.col("p.Metrics"))))
        ).alias("Metrics"),
    )
    cwm = per_ns.groupBy(*keys).agg(
        F.sort_array(
            F.collect_list(
                F.struct(F.col("proj_ns").alias("Namespace"), "Dimensions", "Metrics")
            )
        ).alias("cw_metrics")
    )
    meta = meta.join(cwm, keys, "left").withColumn(
        "cw_metrics",
        F.coalesce(
            F.col("cw_metrics"),
            F.array().cast(cwm.schema["cw_metrics"].dataType.simpleString()),
        ),
    )

    assembled = agg.assemble_groups(hist, meta, key_by_namespace)
    return output_op.events_json(assembled)


def compact_events(
    spark, out_dir: str, key_by_namespace: bool = False
) -> str:
    """End-of-stream compaction: read the per-batch partial events a
    run_microbatch job appended under ``out_dir``/events, re-merge them
    exactly, and write one final event per group to
    ``out_dir``/events_final (partitioned by sink, like the batch
    pipeline's table). Returns the output path. Run it after the
    stream drains, or periodically over closed windows — merging is
    idempotent (re-merging merged events is a no-op by associativity)."""
    import os

    events = spark.read.parquet(os.path.join(out_dir, "events"))
    final = merge_partial_events(events, key_by_namespace)
    path = os.path.join(out_dir, "events_final")
    (
        final.filter(~F.col("dropped_oversize"))
        .write.mode("overwrite")
        .partitionBy("sink")
        .parquet(path)
    )
    return path
