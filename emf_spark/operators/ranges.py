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

from pyspark.sql import DataFrame, functions as F


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
