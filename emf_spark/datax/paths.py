"""Clickstream path-transition mining — the per-session event-bigram
model behind every Sankey flow diagram, "next page" predictor, and
drop-off report a web-log pipeline ships.

The reference plugin aggregates metric streams the upstream pipeline
derives from raw access logs (see the EMF accumulate path,
``emf/aggregator.go``); path analysis is the sibling derivation those
same logs feed: order each session's events, count consecutive
``(src, dst)`` pairs, and normalize per source into a first-order
Markov transition table. This module is that stage, Spark-first.

Semantics:

* Events order within a session by ``(ts, tiebreak)`` — full-precision
  event time, ties broken by the id column, so the sequence (and hence
  every bigram) is deterministic under same-timestamp bursts.
* Every consecutive pair emits one transition ``(src, dst)``. With
  ``include_endpoints=True`` each session additionally emits
  ``('_start_', first)`` and ``(last, '_end_')`` — the Sankey entry and
  exit edges — so every session of n events contributes exactly n+1
  transitions and column sums balance (flow in == flow out per page).
* ``p_ppm = (1_000_000 * cnt) div src_total`` — the per-source
  transition probability as an integer cross-multiplied floor, so the
  table is bit-portable across engines (no float division order).
* NULL event types participate as real page states (a NULL src/dst
  groups like any other value); NULL session keys are dropped — they
  are not one session, and a window would make them one.

Scale shape: ONE per-session window (``Exchange`` on the session key +
per-partition sort) computes ``lead`` and first-row detection together;
endpoint rows ride the same pass as a literal-sized ``explode`` (1 or 2
structs per event — never a join). Transition counting is a
map-combinable hash aggregate onto the COLLAPSED ``(src, dst)`` frame —
O(distinct pages²) rows at most, millions of times smaller than the
event stream at 100 TB — and the per-source normalization window runs
on that collapsed frame, costing nothing measurable. Total: 2
Exchanges over the big data (window + agg), everything after is tiny.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

START = "_start_"
END = "_end_"


def path_transitions(
    df: DataFrame,
    session_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tiebreak_col: str = "event_id",
    include_endpoints: bool = True,
) -> DataFrame:
    """First-order Markov transition table over per-session event paths.

    Returns ``(src, dst, cnt, p_ppm)`` — one row per observed
    transition, ``p_ppm`` the integer-ppm share of ``src``'s outgoing
    flow. See the module docstring for ordering, endpoint, and NULL
    rules.
    """
    # order by the raw ts column (works for TIMESTAMP and
    # TIMESTAMP_NTZ alike) — both engines order timestamps identically
    w = Window.partitionBy(session_col).orderBy(
        F.col(ts_col), F.col(tiebreak_col)
    )
    # has_next via lead(true) — lead(type) alone cannot distinguish
    # "no next event" from "next event's type is NULL", and NULL pages
    # are real states here, not session ends
    seq = df.filter(F.col(session_col).isNotNull()).select(
        F.col(type_col).alias("src"),
        F.lead(type_col).over(w).alias("nxt"),
        F.lead(F.lit(True)).over(w).alias("has_next"),
        (F.row_number().over(w) == 1).alias("is_first"),
    )
    dst = F.when(F.col("has_next"), F.col("nxt")).otherwise(F.lit(END))
    if include_endpoints:
        # last event's lead is NULL -> becomes the exit edge; the entry
        # edge rides the SAME rows via a conditional 2-struct explode,
        # so endpoints cost zero extra passes and no join
        edges = seq.select(
            F.explode(
                F.when(
                    F.col("is_first"),
                    F.array(
                        F.struct(
                            F.lit(START).alias("src"),
                            F.col("src").alias("dst"),
                        ),
                        F.struct(
                            F.col("src").alias("src"),
                            dst.alias("dst"),
                        ),
                    ),
                ).otherwise(
                    F.array(
                        F.struct(
                            F.col("src").alias("src"),
                            dst.alias("dst"),
                        )
                    )
                )
            ).alias("e")
        ).select("e.src", "e.dst")
    else:
        edges = seq.filter(F.col("has_next")).select(
            "src", F.col("nxt").alias("dst")
        )
    counts = edges.groupBy("src", "dst").agg(F.count(F.lit(1)).alias("cnt"))
    # per-source normalization over the COLLAPSED frame (<= pages^2
    # rows) — a window here is free; on the raw stream it would not be
    return counts.withColumn(
        "p_ppm",
        F.expr("(1000000 * cnt) div sum(cnt) over (partition by src)"),
    )
