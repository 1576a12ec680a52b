"""Aggregation core (SURVEY.md §2.5): dim-hash groups, exact value-count
histograms, cardinality-dependent SEH reduce, metadata merge.

Shuffle plan (the part that must survive 100 TB):

  obs (one row per observation pair)
    └─ groupBy(keys + value)      -> exact (value -> count) map   [shuffle 1]
       The *value* participates in the hash key, so a hot
       (dim_hash, metric) group spreads over the cluster — this IS the
       salted first phase of the two-phase aggregation (north rule), with
       the value as a semantics-free natural salt. Spark's partial
       aggregation does map-side combining before the exchange, playing
       the role of the reference's in-memory map
       (aggregator.go:96-151).
    └─ groupBy(keys)  per-group stats (n_distinct/min/max/sum/count)
                                                                  [shuffle 2]
    └─ join stats back (AQE: broadcast when small, skew-split else)
    └─ project out_value = value            (n_distinct <= 2, exact)
                         | seh_value(bucket(value))  (>= 3, seh.go)
    └─ groupBy(keys + out_value) -> merged buckets    [no exchange: the
       stats join output is already hash-partitioned by keys, which
       satisfies the ClusteredDistribution of the superset key]
    └─ groupBy(keys) collect bounded arrays           [no exchange]

Per-group state is bounded everywhere: collect_list only ever sees
post-SEH cardinality (distinct buckets), never raw observations
(SURVEY.md §7.4 "cardinality-dependent reduce" decision).

Reference semantics (citations into /root/reference/):
  - A1 group key = dimension hash only (aggregator.go:98); namespace is
    *not* part of the key — ``key_by_namespace=True`` opts into the
    north-rule key (namespace, dim_hash, window).
  - A2 exact value->count merge (histogram/histogram.go:28-37).
  - A7 reduce branches: 1-2 distinct exact, >=3 SEH
    (histogram/histogram.go:39-88). The 0-distinct -> nil branch
    surfaces as "metric absent from output".
  - A8 SEH bucket aggregation + merge (seh.go:64-80,96-108) — the merge
    is associative so partial aggregation absorbs hot keys.
  - A9 degenerate-SEH collapse is unreachable after P5 NaN filtering
    (>=3 distinct finite values => min < max), so it is subsumed by the
    exact branches.
  - A4 first-wins dims / A5 last-wins timestamp under the deterministic
    arrival order (ts, doc_id) (SURVEY.md §7.4).
  - A6 CloudWatchMetrics merge, *intended* semantics: per-namespace union
    of dimension sets and metric definitions (common/emf.go:46-79; the
    reference's by-value-slice and dropped-dim-set bugs are documented
    divergences).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from emf_spark.functions import seh_bucket, seh_value_of

WINDOW_MS = 60_000  # default aggregation_period 1m (main.go:38-41)


def with_window(df: DataFrame, window_ms: int = WINDOW_MS) -> DataFrame:
    """W1 tumbling event-time window from _aws.Timestamp (epoch ms).

    The reference flushes on a processing-time ticker (task.go:29-47);
    event-time tumbling windows are the deterministic Spark equivalent
    (SURVEY.md §2.6 W1) and what the north rule prescribes.
    """
    return df.withColumn(
        "window_start",
        (F.floor(F.col("ts") / F.lit(window_ms)) * F.lit(window_ms)).cast("bigint"),
    )


def group_keys(df: DataFrame, key_by_namespace: bool = False) -> list[str]:
    keys = []
    if "sink" in df.columns:
        keys.append("sink")
    keys.append("window_start")
    if key_by_namespace:
        keys.append("namespace")
    keys.append("dim_hash")
    return keys


def explode_observations(df: DataFrame, key_by_namespace: bool = False) -> DataFrame:
    """Fan out parsed records into one row per (metric, value, count)
    observation (A3, aggregator.go:129-150).

    The raw metric JSON fragments explode FIRST; the value-shape
    normalization (F2/P5/P6) runs once per flat (record, metric) row —
    not inside nested HOFs pre-explode — so it codegens and the persisted
    upstream stays a cheap map<string,string>. Namespace lookup only in
    north-rule keying mode. Two generators, no shuffle."""
    from emf_spark.operators.parse import _metric_pairs, namespace_of

    cols = [c for c in ("sink", "window_start", "dim_hash") if c in df.columns]
    m = df.select(
        *cols,
        *(["cwm"] if key_by_namespace else []),
        F.explode("metric_raw").alias("metric_name", "raw"),
    )
    ns = (
        namespace_of(F.col("cwm"), F.col("metric_name")).alias("namespace")
        if key_by_namespace
        else F.lit(None).cast("string").alias("namespace")
    )
    m = m.select(
        *cols, "metric_name", ns, F.explode(_metric_pairs(F.col("raw"))).alias("p")
    )
    return m.select(
        *cols,
        "metric_name",
        "namespace",
        F.col("p.v").alias("v"),
        F.col("p.c").alias("c"),
    )


def aggregate_histograms(
    obs: DataFrame, key_by_namespace: bool = False
) -> DataFrame:
    """obs -> one row per (group keys, metric) with
    (values, counts, min, max, sum, count, n_distinct)."""
    keys = group_keys(obs, key_by_namespace) + ["metric_name"]

    # Phase 1 (A2): exact sparse histogram; value in the grouping key is
    # the natural salt for hot groups.
    p1 = obs.groupBy(*keys, "v").agg(F.sum("c").alias("c"))

    # Per-(group, metric) stats — always exact (histogram.go:39-88).
    # Whole-partition window aggregates over the already-reduced p1: one
    # shuffle on the group keys, no self-join (a join here would
    # recompute the entire upstream once per side), and every following
    # groupBy reuses this partitioning (subset-key clustering) with no
    # further exchange. p1 rows are distinct values only, so the
    # per-partition sort is over post-reduction cardinality.
    from pyspark.sql.window import Window

    # Value-ordered full frame: double SUM accumulates ascending-v, so
    # the canonical Sum is identical whatever the physical layout
    # (persist vs parquet staging re-partitions reordered p1 rows and
    # flipped last-ulp digits in event_json — caught in round 2). The
    # reference itself is map-order nondeterministic here; ascending-v
    # is our documented canonicalization (O3). WindowExec sorts by
    # (partition keys, order key) anyway, so the extra key is ~free.
    w = (
        Window.partitionBy(*keys)
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    joined = p1.select(
        *keys,
        "v",
        "c",
        F.count(F.lit(1)).over(w).alias("n_distinct"),
        F.min("v").over(w).alias("min"),
        F.max("v").over(w).alias("max"),
        F.sum(F.col("v") * F.col("c")).over(w).alias("sum"),
        F.sum("c").over(w).alias("count"),
    )

    # A7 branch select: exact passthrough vs SEH representative value.
    out_v = (
        F.when(F.col("n_distinct") <= 2, F.col("v"))
        .otherwise(seh_value_of(seh_bucket(F.col("v"))))
        .alias("out_v")
    )
    p3 = joined.groupBy(*keys, out_v).agg(
        F.sum("c").alias("c"),
        F.max("n_distinct").alias("n_distinct"),
        F.max("min").alias("min"),
        F.max("max").alias("max"),
        F.max("sum").alias("sum"),
        F.max("count").alias("count"),
    )
    # SEH drops empty buckets (GetNonEmptyBuckets, seh.go:53-61); the
    # exact branch keeps zero-count values (histogram.go:43-58).
    p3 = p3.filter((F.col("n_distinct") <= 2) | (F.col("c") > 0))

    hist = p3.groupBy(*keys).agg(
        F.sort_array(
            F.collect_list(F.struct(F.col("out_v").alias("v"), F.col("c").alias("c")))
        ).alias("hist"),
        F.max("n_distinct").alias("n_distinct"),
        F.max("min").alias("min"),
        F.max("max").alias("max"),
        F.max("sum").alias("sum"),
        F.max("count").alias("count"),
    )
    # Canonical output ordering (O3): values ascending — the reference's
    # Go-map iteration order is nondeterministic even run-to-run.
    return hist.select(
        *keys,
        F.col("hist.v").alias("values"),
        F.col("hist.c").alias("counts"),
        "min",
        "max",
        "sum",
        "count",
        "n_distinct",
    )


def aggregate_metadata(df: DataFrame, key_by_namespace: bool = False) -> DataFrame:
    """Per-group metadata: A4 first-wins dims, A5 last-wins timestamp,
    A6 intended CloudWatchMetrics merge. One shuffle on the group keys
    (shared partitioning with the final event-assembly join)."""
    if key_by_namespace:
        # replicate record metadata under each DISTINCT namespace it
        # projects to (two projections sharing a namespace must not
        # double-count the record). A record with ZERO valid
        # projections keys under the empty namespace instead of
        # vanishing from explode — both modes then agree that such
        # records still flush (and count toward records/bytes_in),
        # matching the non-keyed path's coalesce-to-empty group
        # (review finding: the modes disagreed on input accounting)
        ns_list = F.array_distinct(F.col("cwm.Namespace"))
        df = df.withColumn(
            "namespace",
            F.explode(
                F.when(F.size(ns_list) > 0, ns_list).otherwise(
                    F.array(F.lit(""))
                )
            ),
        )
    keys = group_keys(df, key_by_namespace)

    ord_ = F.struct(F.col("ts"), F.col("doc_id"))
    meta = df.groupBy(*keys).agg(
        F.min_by("dims", ord_).alias("dimensions"),
        F.max("ts").alias("timestamp"),
        F.count(F.lit(1)).alias("records"),
        F.sum("n_tok").alias("bytes_in"),
    )

    # Dedupe projection lists BEFORE exploding/collecting: partial
    # aggregation collapses the per-record replication map-side, so the
    # collect below only ever sees distinct (group, projection-list)
    # combinations — bounded per-group state at any input scale.
    distinct_cwm = df.select(*keys, "cwm").distinct()
    proj = distinct_cwm.select(*keys, F.explode("cwm").alias("p"))
    if key_by_namespace:
        # a namespace-keyed group's projection metadata is only the
        # projections OF that namespace (north-rule EMF structure keyed
        # by (namespace, dim_hash, window))
        proj = proj.filter(F.col("p.Namespace") == F.col("namespace"))
    # "proj_ns" avoids a case-insensitive clash with the optional
    # "namespace" group key in north-rule keying mode
    per_ns = proj.groupBy(*keys, F.col("p.Namespace").alias("proj_ns")).agg(
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
                F.struct(
                    F.col("proj_ns").alias("Namespace"), "Dimensions", "Metrics"
                )
            )
        ).alias("cw_metrics")
    )
    joined = meta.join(cwm, keys, "left")
    # a group whose records had zero valid projections (e.g. the
    # "Dimnesions" typo slice) still flushes, with an empty projection
    # list (aggregator.go:163-207 emits per dimHash unconditionally)
    return joined.withColumn(
        "cw_metrics",
        F.coalesce(
            F.col("cw_metrics"),
            F.array().cast(cwm.schema["cw_metrics"].dataType.simpleString()),
        ),
    )


def assemble_groups(
    hist: DataFrame, meta: DataFrame, key_by_namespace: bool = False
) -> DataFrame:
    """Join per-metric histograms (as a bounded sorted array) onto group
    metadata. Groups with no surviving metrics still emit (the reference
    flushes an event per dimHash even when the metric map is empty,
    aggregator.go:163-207)."""
    keys = [c for c in hist.columns if c in ("sink", "window_start", "namespace", "dim_hash")]
    per_group = hist.groupBy(*keys).agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    "metric_name",
                    "values",
                    "counts",
                    "min",
                    "max",
                    "sum",
                    "count",
                    "n_distinct",
                )
            )
        ).alias("metrics")
    )
    return meta.join(per_group, keys, "left").withColumn(
        "metrics",
        F.coalesce(
            F.col("metrics"),
            F.array().cast(per_group.schema["metrics"].dataType.simpleString()),
        ),
    )
