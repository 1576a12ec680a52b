"""Custom stateful streaming operator via ``applyInPandasWithState``
(SURVEY.md §2.6 W4, §2.9): cross-micro-batch running EMF group state.

The reference keeps its aggregation maps alive between fluent-bit flush
calls under a mutex (aggregator.go:30-42,71-72). The Spark-native
equivalent is keyed state: per (sink, dim_hash) group we maintain
running totals — records, observation count, sum, min, max — merged
incrementally each micro-batch and emitted as an update row. State is
bounded (five scalars per group) and evicted by a processing-time
timeout, mirroring the reference's flush-and-reset lifecycle
(aggregator.go:223-227).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

STATE_SCHEMA = StructType(
    [
        StructField("records", LongType()),
        StructField("obs", LongType()),
        StructField("sum", DoubleType()),
        StructField("min", DoubleType()),
        StructField("max", DoubleType()),
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("sink", StringType()),
        StructField("dim_hash", StringType()),
        StructField("records", LongType()),
        StructField("obs", LongType()),
        StructField("sum", DoubleType()),
        StructField("min", DoubleType()),
        StructField("max", DoubleType()),
    ]
)


def _update_group(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.hasTimedOut:
        # flush-and-reset (aggregator.go:223-227 equivalent)
        state.remove()
        return
    records, obs, s, mn, mx = (
        state.get if state.exists else (0, 0, 0.0, float("inf"), float("-inf"))
    )
    for pdf in pdfs:
        records += int(pdf["records"].sum())
        obs += int(pdf["obs"].sum())
        s += float(pdf["sum"].sum())
        mn = min(mn, float(pdf["min"].min()))
        mx = max(mx, float(pdf["max"].max()))
    state.update((records, obs, s, mn, mx))
    state.setTimeoutDuration(3_600_000)
    yield pd.DataFrame(
        [
            {
                "sink": key[0],
                "dim_hash": key[1],
                "records": records,
                "obs": obs,
                "sum": s,
                # a group that has seen no observations yet has no
                # min/max (records-only rows carry null pairs stats)
                "min": mn if obs else None,
                "max": mx if obs else None,
            }
        ]
    )


def running_group_totals(parsed_stream: DataFrame) -> DataFrame:
    """Streaming DF of parsed+enriched records -> running per-(sink,
    dim_hash) totals over ALL metric observations, maintained across
    micro-batches. Input needs columns: sink, dim_hash, metric_raw.

    Each input record reduces to ONE row via in-row HOF aggregation (no
    explode in the stream), so ``records`` counts true input records —
    not observation rows (ADVICE r1) — and the per-batch shuffle carries
    one row per record instead of one per value-pair."""
    from emf_spark.operators.parse import _metric_pairs

    pairs = F.flatten(
        F.transform(F.map_values("metric_raw"), lambda r: _metric_pairs(r))
    )
    obs = (
        parsed_stream.select("sink", "dim_hash", pairs.alias("pairs"))
        # no filter: a record whose values ALL normalize away still IS
        # an input record (docstring/ADVICE r1 contract) — it
        # contributes records=1, obs=0, null min/max (review finding)
        .select(
            "sink",
            "dim_hash",
            F.lit(1).cast("long").alias("records"),
            F.aggregate(
                "pairs", F.lit(0).cast("long"), lambda acc, p: acc + p["c"]
            ).alias("obs"),
            F.aggregate(
                "pairs", F.lit(0.0), lambda acc, p: acc + p["v"] * p["c"]
            ).alias("sum"),
            F.array_min(F.transform("pairs", lambda p: p["v"])).alias("min"),
            F.array_max(F.transform("pairs", lambda p: p["v"])).alias("max"),
        )
    )
    return obs.groupBy("sink", "dim_hash").applyInPandasWithState(
        _update_group,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


def run_stateful(
    spark: SparkSession, input_dir: str, out_dir: str, max_files_per_trigger: int = 2
):
    """Wire the stateful operator onto the file stream; update-mode
    output lands one row per touched group per micro-batch."""
    import os

    from emf_spark import fixtures
    from emf_spark.operators import enrich as enrich_op
    from emf_spark.operators import parse as parse_op
    from emf_spark.schema import TOKENIZED_SCHEMA
    from emf_spark.tokenizer import with_payload

    stream = (
        spark.readStream.schema(TOKENIZED_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )
    parsed = parse_op.parse_emf(with_payload(stream)).filter(F.col("valid"))
    enriched = enrich_op.enrich(parsed, fixtures.lookup_df(spark))
    totals = running_group_totals(enriched)
    return (
        totals.writeStream.outputMode("update")
        .foreachBatch(
            lambda b, i: b.withColumn("batch_id", F.lit(i))
            .write.mode("append")
            .parquet(os.path.join(out_dir, "totals"))
        )
        .option("checkpointLocation", os.path.join(out_dir, "_checkpoint"))
        .trigger(availableNow=True)
        .start()
    )
