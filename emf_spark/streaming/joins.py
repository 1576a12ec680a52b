"""Watermarked stream-stream interval join (attribution-style).

The canonical streaming-enrichment shape a telemetry pipeline needs
beyond the broadcast lookup (operators/enrich.py): match each left
event to right events with the SAME key arriving within a bounded
event-time window after it — click-to-impression attribution, request
to downstream-error correlation, span stitching.

Why both constraints are load-bearing at scale: Spark keeps EVERY
buffered row of both streams in join state until it can prove no
future match exists. The watermark bounds how out-of-order input may
be; the time-range predicate bounds how far apart a match may be.
Together they let the state store evict rows older than
``watermark + max_delay`` — without them, state grows without bound
and a 10^12-sequence stream OOMs its executors in minutes. State is
partitioned by the join key (one shuffle per side), so hot keys
behave exactly like a batch shuffled join — same remedy (salt the key
upstream via operators/skew.py semantics if one key dominates).

Inner joins emit a match as soon as both rows have arrived; left-outer
additionally emits (left, NULL) once the watermark passes the point
where a match could still show up — so outer results are correct but
late by up to the watermark delay, the documented Structured Streaming
contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    max_delay: str = "10 minutes",
    watermark: str = "20 minutes",
    how: str = "inner",
) -> DataFrame:
    """Join streaming ``left`` to streaming ``right`` on ``on`` where
    ``left_ts <= right_ts <= left_ts + max_delay``. Works on batch
    frames too (same expression, no watermark needed) — the parity
    pytest runs both and compares.

    ``left_ts`` / ``right_ts`` must be differently named (both appear
    in the output); non-key column names must not collide.
    """
    if how not in ("inner", "leftOuter"):
        raise ValueError(f"interval_join supports inner/leftOuter, got {how!r}")
    if left_ts == right_ts:
        raise ValueError("left_ts and right_ts must be distinct column names")
    clash = [
        c for c in right.columns if c in left.columns and c not in on
    ]
    if clash:
        raise ValueError(
            f"right columns {clash} collide with left columns — rename"
        )
    lt, rt = left, right
    if lt.isStreaming:
        lt = lt.withWatermark(left_ts, watermark)
    if rt.isStreaming:
        rt = rt.withWatermark(right_ts, watermark)
    cond = None
    for c in on:
        eq = lt[c] == rt[c]
        cond = eq if cond is None else cond & eq
    cond = (
        cond
        & (rt[right_ts] >= lt[left_ts])
        & (rt[right_ts] <= lt[left_ts] + F.expr(f"INTERVAL {max_delay}"))
    )
    joined = lt.join(rt, cond, how)
    # drop the right side's key copies (kept once from the left)
    return joined.drop(*[rt[c] for c in on])
