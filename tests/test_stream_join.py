"""Stream-stream interval join: streaming result == batch result on
the same input, plus expression-semantics checks on batch frames."""

from __future__ import annotations

import datetime as dt
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from emf_spark.streaming.joins import interval_join


def _write(path, name, rows, id_name, ts_name):
    ids, ks, tss = zip(*rows)
    pq.write_table(
        pa.table({
            id_name: pa.array(ids, pa.int64()),
            "k": pa.array(ks, pa.int64()),
            ts_name: pa.array(list(tss), pa.timestamp("us")),
        }),
        f"{path}/{name}",
    )


BASE = 1_700_000_000_000_000  # us


def _ts(offset_s):
    return BASE + offset_s * 1_000_000


@pytest.fixture(scope="module")
def join_inputs(tmp_path_factory):
    root = tmp_path_factory.mktemp("sjoin")
    imp_dir, clk_dir = str(root / "imp"), str(root / "clk")
    os.makedirs(imp_dir), os.makedirs(clk_dir)
    # impressions: 40 rows over 20 min, 4 keys
    imps = [(i, i % 4, _ts(i * 30)) for i in range(40)]
    # clicks: some within the 5-min attribution window, some outside,
    # some on keys with no impression, a few out of order across files
    clicks = (
        [(100 + i, i % 4, _ts(i * 30 + 60)) for i in range(0, 40, 3)]     # +1 min: match
        + [(200 + i, i % 4, _ts(i * 30 + 400)) for i in range(0, 40, 7)]  # +6.7 min: no
        + [(300, 9, _ts(100)), (301, 2, _ts(35 * 30 + 10))]
    )
    _write(imp_dir, "a.parquet", imps[:25], "imp_id", "imp_ts")
    _write(imp_dir, "b.parquet", imps[25:], "imp_id", "imp_ts")
    _write(clk_dir, "a.parquet", clicks[: len(clicks) // 2], "clk_id", "clk_ts")
    _write(clk_dir, "b.parquet", clicks[len(clicks) // 2:], "clk_id", "clk_ts")
    for d in (imp_dir, clk_dir):
        for i, f in enumerate(sorted(os.listdir(d))):
            os.utime(f"{d}/{f}", (1_700_000_000 + i,) * 2)
    return imp_dir, clk_dir


IMP_SCHEMA = "imp_id bigint, k bigint, imp_ts timestamp"
CLK_SCHEMA = "clk_id bigint, k bigint, clk_ts timestamp"


def test_streaming_interval_join_matches_batch(spark, join_inputs, tmp_path):
    imp_dir, clk_dir = join_inputs
    li = (
        spark.readStream.schema(IMP_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(imp_dir)
    )
    ri = (
        spark.readStream.schema(CLK_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(clk_dir)
    )
    out = str(tmp_path / "out")
    q = (
        interval_join(li, ri, ["k"], "imp_ts", "clk_ts",
                      max_delay="5 minutes", watermark="10 minutes")
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    got = sorted(
        tuple(r) for r in
        spark.read.parquet(out).select("imp_id", "clk_id", "k").collect()
    )
    want = sorted(
        tuple(r) for r in
        interval_join(
            spark.read.schema(IMP_SCHEMA).parquet(imp_dir),
            spark.read.schema(CLK_SCHEMA).parquet(clk_dir),
            ["k"], "imp_ts", "clk_ts", max_delay="5 minutes",
        ).select("imp_id", "clk_id", "k").collect()
    )
    assert got == want
    assert len(got) > 0
    # checkpoint resume with no new files appends nothing
    q2 = (
        interval_join(li, ri, ["k"], "imp_ts", "clk_ts",
                      max_delay="5 minutes", watermark="10 minutes")
        .writeStream.outputMode("append")
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(300)
    assert len(spark.read.parquet(out).collect()) == len(got)


def test_interval_join_batch_semantics(spark):
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)

    def m(s):
        return t0 + dt.timedelta(seconds=s)

    left = spark.createDataFrame(
        [(1, 10, m(0)), (2, 10, m(100)), (3, 11, m(0))],
        "lid int, k int, lts timestamp",
    )
    right = spark.createDataFrame(
        [(1, 10, m(30)),    # matches lid 1 (within 60s)
         (2, 10, m(90)),    # after lid 1's window, BEFORE lid 2: no match
         (3, 10, m(130)),   # matches lid 2
         (4, 12, m(10))],   # key with no left row
        "rid int, k int, rts timestamp",
    )
    inner = interval_join(left, right, ["k"], "lts", "rts", "60 seconds")
    assert sorted((r["lid"], r["rid"]) for r in inner.collect()) == [
        (1, 1), (2, 3)
    ]
    outer = interval_join(
        left, right, ["k"], "lts", "rts", "60 seconds", how="leftOuter"
    )
    rows = sorted(
        (r["lid"], r["rid"]) for r in outer.collect()
    )
    assert rows == [(1, 1), (2, 3), (3, None)]


def test_interval_join_guards(spark):
    df = spark.createDataFrame([(1, dt.datetime(2024, 1, 1))], "k int, ts timestamp")
    with pytest.raises(ValueError, match="inner/leftOuter"):
        interval_join(df, df.withColumnRenamed("ts", "ts2"), ["k"],
                      "ts", "ts2", how="full")
    with pytest.raises(ValueError, match="distinct column names"):
        interval_join(df, df, ["k"], "ts", "ts")
    with pytest.raises(ValueError, match="collide"):
        interval_join(
            df.withColumn("x", F.lit(1)),
            df.withColumnRenamed("ts", "ts2").withColumn("x", F.lit(1)),
            ["k"], "ts", "ts2",
        )
