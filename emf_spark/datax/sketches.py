"""Deterministic cardinality sketches.

KMV (k-minimum-values): hash every value uniformly into [0, 1); keep
the k smallest distinct hashes per group; estimate
``distinct ≈ (k - 1) / kth_min``. Standard error ~ 1/sqrt(k-2).

Why KMV here instead of HyperLogLog (`approx_count_distinct`): the
estimate is a pure deterministic function of the value set and the
hash, so an external engine (the DuckDB oracle) reproduces it
BIT-FOR-BIT — HLL implementations differ across engines and can't be
oracle-checked. Same shuffle shape as HLL: per-group state is k
values, map-side combinable (min-k of a union = min-k of min-k's).

At 100 TB: groupBy carries a bounded sort_array(collect_set)[:k]? No —
collect_set is unbounded. The bounded plan used here: distinct hashes
first (map-side combine on (group, hash)), then the k-th smallest via
window row_number — post-distinct cardinality flows through the sort,
never raw rows. For extreme-cardinality groups swap the exact distinct
for a pre-bucketed min per (group, hash % m) — not needed below 10^9
distinct per group.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

# 56-bit hash space (md5-prefix, DuckDB-portable — see dedup.portable_hash56)
_SPACE = float(1 << 56)


def kmv_distinct(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    k: int = 64,
) -> DataFrame:
    """Per-group KMV distinct-count estimate:
    (group_cols..., kmv_estimate:double, exactish:boolean).

    Groups with fewer than k distinct values report the EXACT distinct
    count (the sketch is lossless below its capacity) with
    ``exactish=true``. NULL values are excluded (COUNT DISTINCT
    semantics — and a null hash would otherwise rank NULLS FIRST in
    Spark but NULLS LAST in an external SQL engine, breaking the
    bit-for-bit oracle claim; review finding).

    Scale shape: grouped mode partitions the rank window by the group
    key. UNGROUPED mode is two-phase (VERDICT r3): phase 1 keeps the
    k smallest hashes per ``(hash % m)`` bucket (window partitioned by
    bucket — parallel), phase 2 ranks globally over the surviving
    <= m*k rows (single partition by construction, but over a BOUNDED
    frame — the same justified narrow final window as vocab_topk).
    min-k of a union == min-k of per-bucket min-k's, so the estimate is
    bit-identical to the one-window form and the oracle is unchanged."""
    from emf_spark.datax.dedup import portable_hash56

    groups = group_cols or []
    hi = portable_hash56(F.col(value_col).cast("string"))
    hashes = (
        df.filter(F.col(value_col).isNotNull())
        .select(*groups, (hi / F.lit(_SPACE)).alias("_h"), (hi % 64).alias("_b"))
        .distinct()
    )
    if groups:
        w = Window.partitionBy(*groups).orderBy("_h")
        ranked = hashes.withColumn("_r", F.row_number().over(w))
    else:
        pre = Window.partitionBy("_b").orderBy("_h")
        survivors = (
            hashes.withColumn("_pr", F.row_number().over(pre))
            .filter(F.col("_pr") <= k)
        )
        ranked = survivors.withColumn(
            "_r", F.row_number().over(Window.orderBy("_h"))
        )
    ranked = ranked.filter(F.col("_r") <= k)
    per = ranked.groupBy(*groups).agg(
        F.max("_r").alias("_n"), F.max("_h").alias("_kth")
    )
    est = (
        F.when(F.col("_n") < k, F.col("_n").cast("double"))
        .otherwise((F.lit(float(k - 1))) / F.col("_kth"))
    )
    return per.select(
        *groups,
        F.round(est, 4).alias("kmv_estimate"),
        (F.col("_n") < k).alias("exactish"),
    )


def _cms_bucket_py(term: str, d: int, width: int) -> int:
    """Python replica of the engine's CMS bucket formula (md5-derived
    portable_hash56 % width) — used only to key tiny literal probe
    frames, identical by construction to the Column expression."""
    import hashlib

    return int(hashlib.md5(f"cms{d}:{term}".encode()).hexdigest()[:14], 16) % width


def cms_build(
    df: DataFrame, value_col: str, depth: int = 4, width: int = 256
) -> DataFrame:
    """Count-min sketch of a value column: rows (d, bucket, cnt) —
    depth x width cells, cell = count of values hashing into it under
    hash function d.

    Like KMV, the whole sketch is a deterministic function of the
    multiset and the (md5-derived) hash family, so an external SQL
    engine reproduces every cell bit-for-bit — which is why this is a
    hand-rolled CMS and not a binary-blob sketch library. Scale shape:
    one explode (x depth) + one groupBy on (d, bucket) — at most
    depth*width result rows regardless of input size, and the count
    partial-aggregates map-side, so the shuffle carries at most
    depth*width rows PER TASK, not per input row."""
    from emf_spark.datax.dedup import portable_hash56

    entries = [
        F.struct(
            F.lit(d).alias("d"),
            (
                portable_hash56(
                    F.concat(F.lit(f"cms{d}:"), F.col(value_col).cast("string"))
                )
                % width
            ).alias("bucket"),
        )
        for d in range(depth)
    ]
    return (
        df.filter(F.col(value_col).isNotNull())
        .select(F.explode(F.array(*entries)).alias("s"))
        .groupBy(F.col("s.d").alias("d"), F.col("s.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    terms: list[str],
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Point-query the sketch: (term, cms_count) with
    cms_count = min over d of the term's cell — the classic
    overestimate-only bound (cms_count >= true count, equal when no
    collision). The probe frame is depth*|terms| literal rows; the
    sketch (<= depth*width rows) broadcasts, so estimation is
    shuffle-free beyond the tiny final groupBy."""
    spark = sketch.sparkSession
    probes = spark.createDataFrame(
        [(t, d, _cms_bucket_py(t, d, width)) for t in terms for d in range(depth)],
        "term string, d int, bucket bigint",
    )
    joined = probes.join(F.broadcast(sketch), ["d", "bucket"], "left")
    return joined.groupBy("term").agg(
        F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cms_count")
    )
