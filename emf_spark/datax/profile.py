"""Column profiling: the ``ANALYZE TABLE``-shaped pass every pipeline
runs before trusting a new data drop — per-column row/null/distinct
counts and min/max, as data (one row per column) rather than logs.

One scan, one aggregate: all per-column measures land in a single
``agg(...)`` (Catalyst plans the multi-``count_distinct`` via one
Expand — cols x rows map-side rows, still a single shuffle of partial
aggregates), producing ONE driver-size row that a projection explodes
into the long (column, stats) form. Nothing is collected; adding a
column adds expressions, not passes.

min/max are emitted as strings so heterogeneous column types share one
output schema — callers profiling float columns should note engine
string-rendering of doubles differs across systems (the oracle-checked
driver query profiles integer/string columns, where rendering is
universal).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def profile(df: DataFrame, cols: list[str]) -> DataFrame:
    """Rows ``(column, n_rows, n_nulls, n_distinct, min_repr,
    max_repr)`` for each named column: exact distincts (NULL excluded,
    SQL semantics), min/max cast to string, all from one aggregate
    over one scan."""
    if not cols:
        raise ValueError("cols must be non-empty")
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        aggs += [
            F.count(F.col(c)).alias(f"_nn_{c}"),
            F.countDistinct(F.col(c)).alias(f"_nd_{c}"),
            F.min(F.col(c)).cast("string").alias(f"_mn_{c}"),
            F.max(F.col(c)).cast("string").alias(f"_mx_{c}"),
        ]
    one = df.agg(*aggs)
    per_col = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col("_n").alias("n_rows"),
                (F.col("_n") - F.col(f"_nn_{c}")).alias("n_nulls"),
                F.col(f"_nd_{c}").alias("n_distinct"),
                F.col(f"_mn_{c}").alias("min_repr"),
                F.col(f"_mx_{c}").alias("max_repr"),
            )
            for c in cols
        ]
    )
    return one.select(F.explode(per_col).alias("_p")).select("_p.*")
