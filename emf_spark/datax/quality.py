"""Declarative data-quality constraint checking (Deequ-style).

A 100 TB ingest gate wants MANY assertions — completeness, uniqueness,
ranges, domain membership — evaluated in ONE pass over the data, not
one job per check (the pattern of AWS Deequ / Great Expectations,
re-expressed as a single Catalyst aggregate). Every constraint
compiles to an algebraic aggregate expression; the whole suite is one
`df.agg(...)` (count-distincts share a single Expand, like
datax/profile.py) exploded to one result row per constraint.

Exactness contract: metrics are reported as integer NUMERATOR /
DENOMINATOR pairs, never floats, and thresholds are rationals
(num, den) compared as ``metric_num * t_den >= t_num * metric_den`` in
int64 — so the pass/fail verdicts and every reported number replay
bit-for-bit in an external SQL engine.

Constraint forms (tuples, first element is the kind):
  ("completeness", col, t_num, t_den) — non-null fraction >= t
  ("unique", col)                     — distinct == non-null count
  ("range", col, lo, hi)              — every non-null value in [lo, hi]
  ("values_in", col, values)          — every non-null value in set
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def check_constraints(
    df: DataFrame, constraints: list[tuple]
) -> DataFrame:
    """Evaluate ``constraints`` in one aggregate pass. Returns one row
    per constraint: (check, column, metric_num, metric_den, passed).

    metric_num / metric_den per kind:
      completeness: non-null count / total rows
      unique:       distinct count / non-null count
      range:        in-range count / non-null count
      values_in:    member count / non-null count
    """
    if not constraints:
        raise ValueError("check_constraints needs at least one constraint")
    aggs = [F.count(F.lit(1)).alias("_n")]
    specs = []  # (check, column, num_field, den_field, pass_builder)
    for i, c in enumerate(constraints):
        kind = c[0]
        col = c[1]
        nn = f"_nn{i}"
        aggs.append(F.count(F.col(col)).alias(nn))
        if kind == "completeness":
            _, _, tn, td = c
            if not (0 <= tn and 0 < td):
                raise ValueError(f"bad threshold {tn}/{td}")
            specs.append((kind, col, nn, "_n",
                          lambda n, d, tn=tn, td=td: n * td >= tn * d))
        elif kind == "unique":
            nd = f"_nd{i}"
            aggs.append(F.countDistinct(F.col(col)).alias(nd))
            specs.append((kind, col, nd, nn, lambda n, d: n == d))
        elif kind == "range":
            _, _, lo, hi = c
            nr = f"_nr{i}"
            aggs.append(
                F.count(
                    F.when(
                        F.col(col).between(F.lit(lo), F.lit(hi)), F.lit(1)
                    )
                ).alias(nr)
            )
            specs.append((kind, col, nr, nn, lambda n, d: n == d))
        elif kind == "values_in":
            _, _, values = c
            nv = f"_nv{i}"
            aggs.append(
                F.count(F.when(F.col(col).isin(list(values)), F.lit(1))).alias(nv)
            )
            specs.append((kind, col, nv, nn, lambda n, d: n == d))
        else:
            raise ValueError(f"unknown constraint kind {kind!r}")
    one = df.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(kind).alias("check"),
                F.lit(col).alias("column"),
                F.col(num).cast("bigint").alias("metric_num"),
                F.col(den).cast("bigint").alias("metric_den"),
                ok(F.col(num), F.col(den)).alias("passed"),
            )
            for kind, col, num, den, ok in specs
        ]
    )
    return one.select(F.explode(rows).alias("_r")).select("_r.*")
