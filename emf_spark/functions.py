"""Scalar expression helpers (SURVEY.md §2.3) — all native Catalyst.

SEH (sparse exponential histogram) bucket math mirrors
``/root/reference/fluent-bit-emf/histogram/seh.go:35-45`` exactly,
including the quirk that non-positive values land in bucket 0 and thus
collide with values in ``[1, 1.1)`` (seh.go:36-38) — reproduced as-is.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, functions as F

LOG_1_1 = math.log(1.1)  # binSize = ln(1 + epsilon), seh.go:27


def seh_bucket(v: Column) -> Column:
    """value -> bucket index (seh.go:35-40)."""
    return (
        F.when(v <= 0, F.lit(0))
        .otherwise(F.floor(F.log(v) / F.lit(LOG_1_1)))
        .cast("int")
    )


def seh_value_of(bucket: Column) -> Column:
    """bucket -> geometric-midpoint representative value (seh.go:43-45)."""
    return F.exp((bucket.cast("double") + F.lit(0.5)) * F.lit(LOG_1_1))


def to_f64(v: Column) -> Column:
    """F3 ConvertToFloat64 (utils/utils.go:9-25): parse else 0."""
    return F.coalesce(v.try_cast("double"), F.lit(0.0))
