"""Snapshot diff: what changed between two versions of a keyed table.

The incremental-publish primitive of a data pipeline: given yesterday's
and today's snapshot of a keyed dataset, emit (key, status) with status
in {added, removed, changed} — the delta feed downstream consumers (or
an incremental dedup/index refresh, see dedup.minhash_incremental)
actually want, instead of a full re-read.

Scale shape: ONE full-outer shuffle join on the key (both sides shuffle
once; at 100 TB pair it with bucketed storage on the key —
operators/storage.write_bucketed — and the Exchange disappears).
Change detection hashes the compared columns to one 64-bit value per
side BEFORE the join, so the shuffle carries (key, hash), never the
full row payload.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """(key_cols..., status) for every key present in either snapshot
    whose row was added, removed, or changed; unchanged keys are
    dropped. ``compare_cols`` defaults to every non-key column both
    sides share (order-insensitive by sorted name)."""
    if compare_cols is None:
        shared = set(old.columns) & set(new.columns)
        compare_cols = sorted(shared - set(key_cols))

    def keyed(df: DataFrame, tag: str) -> DataFrame:
        # xxhash64 over the compared columns in a FIXED order. Spark's
        # hash functions SKIP null inputs (a null does not advance the
        # hash state), so (a=null,b='x') and (a='x',b=null) would
        # collide; interleaving a non-nullable is-null flag per column
        # makes the encoding injective again (pinned by pytest)
        parts: list[F.Column] = []
        for c in compare_cols:
            parts.append(F.col(c).isNull())
            parts.append(F.col(c))
        if not parts:
            # membership-only diff (no shared non-key columns):
            # xxhash64() with zero args fails analysis; a constant hash
            # makes every matched key "unchanged", leaving added/removed
            parts = [F.lit(0)]
        return df.select(*key_cols, F.xxhash64(*parts).alias(f"_h_{tag}"))

    o = keyed(old, "o")
    n = keyed(new, "n")
    j = o.join(n, key_cols, "full_outer")
    status = (
        F.when(F.col("_h_o").isNull(), F.lit("added"))
        .when(F.col("_h_n").isNull(), F.lit("removed"))
        .when(F.col("_h_o") != F.col("_h_n"), F.lit("changed"))
    )
    return (
        j.withColumn("status", status)
        .filter(F.col("status").isNotNull())
        .select(*key_cols, "status")
    )
