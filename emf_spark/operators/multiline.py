"""Multiline log-record assembly — fold continuation lines (stack
traces, wrapped messages, indented context) into the start line that
owns them, the batch form of Fluent Bit's multiline parser stage that
sits immediately UPSTREAM of the EMF parse the reference plugin does
(`fluent-bit-emf/main.go:65-76` consumes already-assembled records;
this operator is how a Spark pipeline gets from raw line-split text
files to those records).

Semantics (the classic ``start_state`` / ``cont`` contract):

- a line matching ``start_pattern`` BEGINS a new record;
- every non-matching line belongs to the most recent start line
  before it (in ``order_col`` order within its ``group_cols`` unit —
  one log file / one source stream);
- non-matching lines before the first start line in a group are the
  ORPHAN PREAMBLE: they form record_seq 0 (a torn record whose head
  landed in the previous file chunk). Callers stitching rotated files
  can join record 0 of chunk k+1 onto the last record of chunk k;
  dropping them silently would lose log lines.

Plan shape: ONE exchange on ``group_cols`` feeds a linear within-group
running-sum window (record numbering), then a groupBy on
``(group_cols..., record_seq)`` whose partial aggregate collapses each
record map-side before the second exchange — the shuffled unit is one
record (bounded by the longest stack trace), never a file. A million
files parallelize; one file's lines co-locate, the unavoidable unit of
sequential work for "which start line owns me" semantics. In-record
line order is restored by ``array_sort`` on ``(order, line)`` structs
inside the aggregate, so the result is independent of arrival order
and partitioning. No UDFs, no driver-side state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def assemble_multiline(
    df: DataFrame,
    line_col: str = "line",
    order_col: str = "line_no",
    group_cols: list[str] | None = None,
    start_pattern: str = r"^\d{4}-\d{2}-\d{2}",
    joiner: str = "\n",
) -> DataFrame:
    """Assemble line-split logs into multiline records.

    ``order_col`` must be unique within each ``group_cols`` unit (a
    byte offset or line number); ties would make record membership
    run-dependent, so duplicates raise at plan level via the window's
    deterministic ordering contract being unverifiable — callers own
    uniqueness (it is free from any line reader).

    Returns one row per record:
    ``group_cols..., record_seq, start_order, n_lines, record`` where
    ``record_seq`` is 1-based per group (0 = orphan preamble),
    ``start_order`` is the owning start line's ``order_col`` (the
    group's first line's for the preamble) and ``record`` is the
    lines re-joined with ``joiner``.
    """
    group_cols = group_cols or []
    for c in ("_is_start", "_rec"):
        if c in df.columns:
            raise ValueError(f"column '{c}' collides with assemble_multiline internals")
    w = (
        Window.partitionBy(*[F.col(c) for c in group_cols])
        .orderBy(F.col(order_col).asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    is_start = F.when(F.col(line_col).rlike(start_pattern), F.lit(1)).otherwise(
        F.lit(0)
    )
    numbered = df.withColumn("_is_start", is_start).withColumn(
        "_rec", F.sum("_is_start").over(w)
    )
    parts = F.array_sort(
        F.collect_list(F.struct(F.col(order_col).alias("o"), F.col(line_col).alias("l")))
    )
    return (
        numbered.groupBy(*group_cols, F.col("_rec").alias("record_seq"))
        .agg(
            F.min(order_col).alias("start_order"),
            F.count(F.lit(1)).alias("n_lines"),
            F.array_join(
                F.transform(parts, lambda s: s["l"]), joiner
            ).alias("record"),
        )
    )
