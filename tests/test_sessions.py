"""Boundary semantics of the sessionize operator (VERDICT r2 item 5:
the inclusive-gap merge rule lived only in oracle SQL before)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from emf_spark.operators import sessions

T0 = dt.datetime(2025, 1, 1, 12, 0, 0)


def _ev(spark, offsets_ms, user=1):
    rows = [
        (user, T0 + dt.timedelta(milliseconds=ms), float(i))
        for i, ms in enumerate(offsets_ms)
    ]
    return spark.createDataFrame(rows, "user_id bigint, ts timestamp, value double")


def test_events_exactly_gap_apart_merge(spark):
    # gap = 10s; events at 0s and exactly 10s -> ONE session
    out = sessions.sessionize(_ev(spark, [0, 10_000]), gap="10 seconds").collect()
    assert len(out) == 1
    r = out[0]
    assert r["events"] == 2
    # end = last event + gap
    assert r["session_end"] - r["session_start"] == 20


def test_events_one_ms_past_gap_split(spark):
    # 10s gap; second event at 10.001s -> TWO sessions
    out = sessions.sessionize(_ev(spark, [0, 10_001]), gap="10 seconds").collect()
    assert len(out) == 2


def test_chained_merges_and_custom_aggs(spark):
    # 0s, 10s, 20s each exactly gap apart: one session of 3 (transitive
    # merge); 40s starts a new one
    df = _ev(spark, [0, 10_000, 20_000, 40_000])
    out = {
        r["session_start"]: r
        for r in sessions.sessionize(
            df,
            gap="10 seconds",
            aggs=[
                F.count(F.lit(1)).alias("events"),
                F.sum("value").alias("sum_value"),
            ],
        ).collect()
    }
    assert len(out) == 2
    first = out[min(out)]
    assert first["events"] == 3 and first["sum_value"] == 3.0


def test_sessions_are_per_key(spark):
    a = _ev(spark, [0, 5_000], user=1)
    b = _ev(spark, [2_000], user=2)
    out = sessions.sessionize(a.union(b), gap="10 seconds").collect()
    assert sorted((r["user_id"], r["events"]) for r in out) == [(1, 2), (2, 1)]


def test_sessionize_custom_ts_and_keys(spark):
    rows = [
        ("a", "x", T0, 1.0),
        ("a", "x", T0 + dt.timedelta(seconds=5), 2.0),
        ("a", "y", T0, 3.0),
    ]
    df = spark.createDataFrame(rows, "tenant string, shard string, t timestamp, v double")
    out = sessions.sessionize(
        df, gap="10 seconds", ts_col="t", keys=["tenant", "shard"]
    ).collect()
    got = {(r["tenant"], r["shard"]): r["events"] for r in out}
    assert got == {("a", "x"): 2, ("a", "y"): 1}
