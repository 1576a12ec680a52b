"""Gap-based sessionization as a reusable engine operator (W-family
beyond the reference's tumbling flush; promoted from a driver-query-only
construct per VERDICT r2 item 5).

Semantics (probe-verified against Spark's ``session_window`` and pinned
by tests/test_sessions.py):

- Two events of the same key belong to one session iff their gap is
  <= ``gap`` — the boundary is INCLUSIVE-MERGE: events EXACTLY ``gap``
  apart merge; the split condition is ``diff > gap``, not ``>=``.
- ``session_end`` = last event timestamp + gap (Spark's convention: the
  session closes when the inactivity gap expires, not at the last
  event).

Scale shape: one shuffle on the session keys; Spark merges overlapping
per-partition windows itself (no per-key driver loop, no window
explosion). For skewed keys the shuffle partitions on (key), so a
single hot key serializes — pre-split hot keys upstream if a key can
exceed one executor's memory in a window.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def sessionize(
    df: DataFrame,
    gap: str = "30 minutes",
    ts_col: str = "ts",
    keys: list[str] | None = None,
    aggs: list[Column] | None = None,
) -> DataFrame:
    """Group ``df`` into per-``keys`` sessions separated by more than
    ``gap`` of inactivity.

    Returns one row per session: the key columns,
    ``session_start``/``session_end`` (epoch-second bigints;
    end = last event + gap), plus ``aggs`` (default: ``events`` count).
    """
    keys = keys or ["user_id"]
    aggs = aggs or [F.count(F.lit(1)).alias("events")]
    grouped = df.groupBy(F.session_window(ts_col, gap), *keys).agg(*aggs)
    agg_cols = [c for c in grouped.columns if c != "session_window" and c not in keys]
    return grouped.select(
        *keys,
        F.unix_timestamp("session_window.start").cast("bigint").alias("session_start"),
        F.unix_timestamp("session_window.end").cast("bigint").alias("session_end"),
        *agg_cols,
    )
