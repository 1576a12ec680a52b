"""Streaming data-quality gate: evaluate the one-pass constraint suite
(datax/quality.check_constraints) on every micro-batch of an ingest and
either RECORD the verdicts (monitoring) or FAIL the stream on a
violation (gating) — the continuous form of a 100 TB ingest contract:
bad data is cheapest to stop at the door, before it fans out into
downstream tables.

Per micro-batch cost is ONE aggregate over the batch (the suite
compiles to a single scan — quality.py's core promise), so the gate
adds no second pass over the ingest. Verdict rows land as
batch_id-partitioned parquet via dynamic partition overwrite, the
repo's standard replay-idempotent streaming write (streaming/job.py):
a batch replayed after a pre-commit crash overwrites its own partition
instead of duplicating history.

``fail_on_violation=True`` raises inside foreachBatch AFTER the
verdict rows are written, so the stream dies loudly (awaitTermination
surfaces StreamingQueryException) while the evidence of WHICH check
failed is already on disk — the order matters: fail-then-write would
kill the job and keep the reason only in driver logs.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession, functions as F

from emf_spark.datax.quality import check_constraints


def run_quality_monitor(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    constraints: list[tuple],
    fail_on_violation: bool = False,
    trigger: dict | None = None,
    max_files_per_trigger: int = 8,
):
    """Stream parquet files from ``input_dir``; write one verdict row
    per (constraint, micro-batch) to ``out_dir/verdicts``. Returns the
    started StreamingQuery."""
    schema = spark.read.parquet(input_dir).schema

    def gate(batch, batch_id: int) -> None:
        res = check_constraints(batch, constraints).withColumn(
            "batch_id", F.lit(batch_id)
        )
        # ONE scan of the micro-batch: collect the O(constraints)
        # verdict rows, then write them back from driver memory —
        # writing `res` directly and collecting it again would
        # re-execute the aggregate (and re-read the batch source) a
        # second time (ADVICE r4, low).
        rows = res.collect()
        (
            spark.createDataFrame(rows, res.schema)
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(os.path.join(out_dir, "verdicts"))
        )
        if fail_on_violation:
            bad = [
                f"{r['check']}({r['column']}): "
                f"{r['metric_num']}/{r['metric_den']}"
                for r in rows
                if not r["passed"]
            ]
            if bad:
                raise RuntimeError(
                    f"quality gate failed on batch {batch_id}: "
                    + "; ".join(bad)
                )

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )
    return (
        stream.writeStream.foreachBatch(gate)
        .option("checkpointLocation", os.path.join(out_dir, "_checkpoint"))
        .trigger(**(trigger or {"availableNow": True}))
        .start()
    )
