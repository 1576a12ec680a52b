"""Range (interval) join — match point rows to interval rows with
``start <= ts < end``, without the nested-loop plan Spark's naive
inequality join produces.

Scale shape: intervals EXPLODE into the fixed-width time buckets they
overlap; points map to their single bucket; the join is a plain
equi-join on (keys..., bucket) followed by the exact boundary refine.
Cost is |points| + |intervals| x (avg interval length / bucket width)
rows into a hash join — never |points| x |intervals|. Pick ``bucket``
near the TYPICAL interval length: too small explodes long intervals,
too large degrades the equi-join's selectivity (more refine work).
A handful of pathologically long intervals is fine (they add
length/bucket rows each); if MOST intervals are orders of magnitude
longer than the median, split tiers and union two range_joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    ts_col: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    keys: list[str] | None = None,
    bucket: float = 3600.0,
) -> DataFrame:
    """Inner join of point rows to every interval row (same ``keys``)
    with ``start <= ts < end`` (end-exclusive). Returns the point
    columns plus the interval's columns (minus its key copies)."""
    keys = keys or []
    if "_b" in points.columns or "_b" in intervals.columns:
        raise ValueError("column '_b' collides with range_join internals")
    clash = [
        c for c in intervals.columns
        if c in points.columns and c not in keys
    ]
    if clash:
        raise ValueError(
            f"interval columns {clash} collide with point columns — "
            "rename one side (the output carries both sides' columns)"
        )
    b = float(bucket)
    # an interval [s, e) covers buckets floor(s/b) .. floor((e - eps)/b);
    # empty intervals (e <= s) cover nothing and drop out here
    lo = F.floor(F.col(start_col) / b).cast("bigint")
    hi = F.floor((F.col(end_col) - F.lit(1e-9)) / b).cast("bigint")
    iv = intervals.filter(F.col(end_col) > F.col(start_col)).withColumn(
        "_b", F.explode(F.sequence(lo, hi))
    )
    pt = points.withColumn("_b", F.floor(F.col(ts_col) / b).cast("bigint"))
    on = ["_b"] + keys
    joined = pt.join(iv, on).filter(
        (F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) < F.col(end_col))
    )
    return joined.drop("_b")


def merge_intervals(
    df: DataFrame,
    start_col: str = "start",
    end_col: str = "end",
    keys: list[str] | None = None,
    min_gap: float = 0.0,
    tiebreak: str | None = None,
) -> DataFrame:
    """Coalesce overlapping intervals per key into maximal islands —
    the gaps-and-islands primitive behind uptime/coverage/visit
    stitching ("how much wall-clock does this user's activity cover").

    Two intervals on the same key merge when the later one starts at or
    before the earlier one's running max end plus ``min_gap`` (so
    touching intervals merge at ``min_gap=0``, and ``min_gap=300``
    bridges sub-5-minute holes). Output: one row per island with
    ``keys..., island_start, island_end, n_rows``.

    Plan shape: ONE exchange on ``keys``, then a linear within-key
    window scan (running ``max(end)`` one row back decides breaks, a
    running sum numbers islands) and a partial-aggregatable groupBy
    that reuses the window's partitioning. Island membership is a
    set property of the interval collection, so the result is
    insensitive to tie order among identical (start, end) rows;
    pass ``tiebreak`` (a unique column) only if you need the window
    itself replay-stable for plan-diff tooling. Per-key work is
    inherently sequential (a timeline is a chain) — a single hot key
    serializes to one task; pre-split such keys upstream if one key
    alone exceeds a task's budget.
    """
    keys = keys or []
    for c in ("_pme", "_brk", "_island"):
        if c in df.columns:
            raise ValueError(f"column '{c}' collides with merge_intervals internals")
    order = [F.col(start_col).asc(), F.col(end_col).asc()]
    if tiebreak is not None:
        order.append(F.col(tiebreak).asc())
    w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy(*order)
    prev_max_end = F.max(end_col).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    brk = F.when(
        prev_max_end.isNull()
        | (F.col(start_col) > prev_max_end + F.lit(min_gap)),
        F.lit(1),
    ).otherwise(F.lit(0))
    numbered = df.withColumn("_brk", brk).withColumn(
        "_island",
        F.sum("_brk").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        numbered.groupBy(*keys, "_island")
        .agg(
            F.min(start_col).alias("island_start"),
            F.max(end_col).alias("island_end"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .drop("_island")
    )
