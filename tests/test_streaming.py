"""Structured Streaming front-end: micro-batch foreachBatch aggregation
(the reference's ticker semantics) and watermarked event-time counts."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from emf_spark import fixtures, pipeline
from emf_spark.streaming import job as sjob


@pytest.fixture(scope="module")
def stream_input(spark, tmp_path_factory):
    """Corpus split across several files to exercise multi-batch reads."""
    d = tmp_path_factory.mktemp("stream_in")
    df_path = str(d / "part0.parquet")
    fixtures.write_corpus(df_path, 600)
    df = spark.read.parquet(df_path)
    out = str(d / "in")
    df.repartition(6).write.mode("overwrite").parquet(out)
    return out


def test_microbatch_matches_batch_counts(spark, stream_input, tmp_path):
    out = str(tmp_path / "stream_out")
    q = sjob.run_microbatch(spark, stream_input, out)
    q.awaitTermination(300)

    ev = spark.read.parquet(f"{out}/events")
    # associative merge invariant: per-(sink, window, dim_hash, metric)
    # total observation counts equal the batch pipeline's
    stream_counts = (
        ev.select("sink", "window_start", "dim_hash", F.explode("metrics").alias("m"))
        .groupBy("sink", "window_start", "dim_hash", F.col("m.metric_name").alias("mn"))
        .agg(F.sum("m.count").alias("cnt"))
    )
    batch_out = str(tmp_path / "batch_out")
    res = pipeline.run(spark, stream_input, batch_out, write_routed=False)
    bev = spark.read.parquet(f"{batch_out}/events")
    batch_counts = (
        bev.select("sink", "window_start", "dim_hash", F.explode("metrics").alias("m"))
        .groupBy("sink", "window_start", "dim_hash", F.col("m.metric_name").alias("mn"))
        .agg(F.sum("m.count").alias("cnt"))
    )
    diff = stream_counts.join(
        batch_counts, ["sink", "window_start", "dim_hash", "mn"], "full"
    ).filter(
        ~F.coalesce(stream_counts["cnt"], F.lit(-1)).eqNullSafe(
            F.coalesce(batch_counts["cnt"], F.lit(-1))
        )
    )
    assert diff.count() == 0


def test_microbatch_checkpoint_resume_noop(spark, stream_input, tmp_path):
    out = str(tmp_path / "stream_resume")
    q = sjob.run_microbatch(spark, stream_input, out)
    q.awaitTermination(300)
    n1 = spark.read.parquet(f"{out}/events").count()
    # restart against the same checkpoint: no new files -> no new output
    q2 = sjob.run_microbatch(spark, stream_input, out)
    q2.awaitTermination(300)
    n2 = spark.read.parquet(f"{out}/events").count()
    assert n1 == n2


def test_eventtime_counts(spark, stream_input, tmp_path):
    # time-ordered input files: no artificial late data, so every
    # watermark-closed window matches the batch engine exactly
    ordered_in = str(tmp_path / "ordered_in")
    (
        spark.read.parquet(stream_input)
        .repartitionByRange(6, F.col("doc_id"))
        .write.mode("overwrite")
        .parquet(ordered_in)
    )
    # FileStreamSource orders by modification time (ties arbitrary) —
    # pin mtimes to the range order so batches arrive time-ordered
    import glob
    import os
    import time as _time

    base = _time.time() - 600
    for i, f in enumerate(sorted(glob.glob(f"{ordered_in}/part-*"))):
        os.utime(f, (base + i, base + i))
    stream_input = ordered_in
    out = str(tmp_path / "ev_counts")
    q = sjob.run_eventtime_counts(spark, stream_input, out)
    q.awaitTermination(300)
    got = spark.read.parquet(f"{out}/counts")
    # append mode only emits windows the watermark closed before the
    # bounded input drained — at least the earliest window must be out
    assert got.count() > 0
    emitted = {r["window_start"] for r in got.select("window_start").distinct().collect()}
    # per-(window, dim_hash) record counts match the batch engine for
    # every emitted window
    res = pipeline.build_events(spark, spark.read.parquet(stream_input))
    batch = (
        res.parsed.groupBy(
            (F.floor(F.col("ts") / 60000) * 60000).cast("bigint").alias("window_start"),
            "dim_hash",
        )
        .agg(F.count(F.lit(1)).alias("records"))
        .filter(F.col("window_start").isin(list(emitted)))
        .collect()
    )
    bmap = {(r["window_start"], r["dim_hash"]): r["records"] for r in batch}
    gmap = {
        (r["window_start"], r["dim_hash"]): r["records"] for r in got.collect()
    }
    assert gmap == bmap
