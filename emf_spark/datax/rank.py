"""Rank fusion: merging multiple retrieval orderings of the same
corpus — the step between N retrievers (BM25, ANN, recency, ...) and
one result list. Reciprocal Rank Fusion (Cormack et al., SIGIR 2009):
``score(d) = sum over rankings r of 1 / (k + rank_r(d))``.

Exactness: the reciprocal is put on an integer lattice —
``SCALE div (k + rank)`` with SCALE = 10^12 and truncating division —
so fused scores are BIGINTs any engine reproduces bit-for-bit and sums
are order-independent; ties break by id.

Scale shape: each input ranking is first cut to its top ``n`` via
``orderBy().limit(n)`` (TakeOrderedAndProject: per-partition top-k +
k-row merge, never a global sort shuffle), THEN ranked by a window
over those <= n rows — the single-partition window sits above a
bounded driver-size set, the same justified-narrow-window pattern as
vocab_topk. Fusion itself is a union + one map-side-combinable
aggregate + one more TakeOrderedAndProject.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window

RRF_SCALE = 10**12


def top_ranked(
    df: DataFrame, id_col: str, order_cols: list[Column], n: int
) -> DataFrame:
    """``(id, rank)`` for the top ``n`` rows under ``order_cols``
    (caller includes a unique tiebreak, or ranks are run-dependent).
    limit-then-rank: the global row_number window only ever sees the
    <= n surviving rows."""
    if n <= 0:
        raise ValueError("n must be positive")
    # limit() keeps the full row so the same sort expressions (which
    # may carry .desc() and so cannot be re-aliased) still resolve in
    # the bounded window below.
    cut = df.orderBy(*order_cols).limit(n)
    w = Window.orderBy(*order_cols)
    return cut.select(
        F.col(id_col).alias("id"), F.row_number().over(w).alias("rank")
    )


def rrf_fuse(
    rankings: list[DataFrame], k: int = 60, top: int | None = None
) -> DataFrame:
    """Fuse ``(id, rank)`` frames into ``(id, lists, score_units)``:
    ``lists`` = how many rankings contain the id, ``score_units`` =
    sum of ``RRF_SCALE div (k + rank)``. Ordered by score desc, id
    asc; ``top`` cuts via TakeOrderedAndProject."""
    if not rankings:
        raise ValueError("need at least one ranking")
    if k < 0:
        raise ValueError("k must be >= 0")
    u = rankings[0]
    for r in rankings[1:]:
        u = u.unionByName(r)
    contrib = (F.lit(RRF_SCALE) - F.lit(RRF_SCALE) % (F.lit(k) + F.col("rank"))) / (
        F.lit(k) + F.col("rank")
    )
    fused = (
        u.groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("lists"),
            F.sum(contrib.cast("long")).alias("score_units"),
        )
        .orderBy(F.col("score_units").desc(), F.col("id").asc())
    )
    return fused.limit(top) if top is not None else fused
