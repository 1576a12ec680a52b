"""Bucketed-table storage: co-located joins and re-aggregations.

At 100 TB the dominant cost of a repeated join/groupBy on the same key
is the shuffle. Spark's bucketed tables (`bucketBy` + `saveAsTable`)
persist the hash-partitioning INTO the storage layout: every reader
that joins or aggregates on the bucket key gets a shuffle-free plan
(no Exchange on the bucketed side, pinned by
tests/test_plans.py::test_bucketed_join_is_shuffle_free).

Use cases in this engine:
- per-sink event tables bucketed by ``dim_hash``: downstream
  merge_partial_events / compaction re-aggregates without a shuffle;
- the tokenized corpus bucketed by ``doc_id`` for repeated dedup
  passes (signatures, fingerprints, decontamination all groupBy id).

Bucket-count sizing: target ~128 MB per bucket file per partition;
buckets are fixed at write time, so size for the table's full scale,
not today's sample (too few buckets = giant files + stragglers).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: list[str],
    buckets: int = 64,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (optionally bucket-sorted) managed
    parquet table. Sorting within buckets lets sort-merge joins skip
    the per-task sort too."""
    w = df.write.mode(mode).format("parquet").bucketBy(buckets, *keys)
    if sort:
        w = w.sortBy(*keys)
    w.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
