"""plan_cw_batches invariants: every planned batch must respect BOTH
PutLogEvents limits (flush/cloudwatch.go:19-23,83-103). ADVICE r1
reproduced a 1,197,152-byte batch from the old greatest-of-two-counters
formula; these tests pin the corrected single-running-total plan."""

from __future__ import annotations

from pyspark.sql import functions as F

from emf_spark.operators.output import (
    MAX_BATCH_BYTES,
    MAX_BATCH_EVENTS,
    MAX_EVENT_BYTES,
    plan_cw_batches,
)


def _plan(spark, sizes, **kw):
    rows = [("s", i, int(sz)) for i, sz in enumerate(sizes)]
    df = spark.createDataFrame(rows, "sink string, seq int, event_bytes bigint")
    return plan_cw_batches(df, order_cols=["seq"], **kw)


def _batch_stats(planned):
    return {
        r["batch_id"]: (r["n"], r["b"])
        for r in planned.groupBy("batch_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("event_bytes").alias("b"))
        .collect()
    }


def test_adversarial_byte_sizes_respect_byte_limit(spark):
    # ADVICE r1 repro: old formula packed these 6 into a 1,197,152-byte batch
    sizes = [900_000] + [239_430] * 5
    stats = _batch_stats(_plan(spark, sizes))
    assert sum(n for n, _ in stats.values()) == 6
    for n, b in stats.values():
        assert b <= MAX_BATCH_BYTES, stats
        assert n <= MAX_BATCH_EVENTS


def test_tiny_events_respect_count_limit(spark):
    # 25k minimum-size events: byte term alone would allow ~29k per batch
    stats = _batch_stats(_plan(spark, [27] * 25_000))
    assert sum(n for n, _ in stats.values()) == 25_000
    for n, b in stats.values():
        assert n <= MAX_BATCH_EVENTS, stats
        assert b <= MAX_BATCH_BYTES


def test_mixed_sizes_both_limits_and_contiguous_ids(spark):
    # straddle both constraints: bursts of tiny events + max-size events
    sizes = ([MAX_EVENT_BYTES] * 8 + [30] * 3000) * 4
    planned = _plan(spark, sizes)
    stats = _batch_stats(planned)
    for n, b in stats.values():
        assert n <= MAX_BATCH_EVENTS and b <= MAX_BATCH_BYTES
    # with real limits each event costs < one batch of units -> ids contiguous
    ids = sorted(stats)
    assert ids == list(range(len(ids)))


def test_deterministic_and_per_sink(spark):
    rows = [(f"sink{i % 3}", i, 50_000 + (i * 37) % 10_000) for i in range(500)]
    df = spark.createDataFrame(rows, "sink string, seq int, event_bytes bigint")
    a = plan_cw_batches(df, order_cols=["seq"]).collect()
    b = plan_cw_batches(df, order_cols=["seq"]).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    per_sink = plan_cw_batches(df, order_cols=["seq"])
    stats = (
        per_sink.groupBy("sink", "batch_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("event_bytes").alias("bytes"))
        .collect()
    )
    for r in stats:
        assert r["n"] <= MAX_BATCH_EVENTS and r["bytes"] <= MAX_BATCH_BYTES


def test_scaled_down_limits_match_driver_query_shape(spark):
    # the driver query runs 4 KiB / 100 events / 1 KiB max-event
    sizes = [900] + [700] * 10 + [40] * 300
    stats = _batch_stats(
        _plan(
            spark,
            sizes,
            max_batch_bytes=4096,
            max_batch_events=100,
            max_event_bytes=1024,
        )
    )
    assert sum(n for n, _ in stats.values()) == len(sizes)
    for n, b in stats.values():
        assert n <= 100 and b <= 4096, stats


def test_property_random_sizes_respect_both_limits(spark):
    """Property test: ANY size profile (within the oversize-drop
    precondition) yields batches within both limits."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=8, deadline=None)
    @given(
        st.lists(
            st.integers(min_value=27, max_value=MAX_EVENT_BYTES),
            min_size=1,
            max_size=400,
        )
    )
    def check(sizes):
        stats = _batch_stats(_plan(spark, sizes))
        assert sum(n for n, _ in stats.values()) == len(sizes)
        for n, b in stats.values():
            assert n <= MAX_BATCH_EVENTS and b <= MAX_BATCH_BYTES, (sizes, stats)

    check()


def test_tied_order_keys_still_respect_limits(spark):
    """Rows tied on every order key (namespace-keyed events tie on
    (window_start, dim_hash)) must still split into limit-respecting
    batches — the default RANGE window frame gave all peers one
    cumulative value and packed them into a single giant batch
    (review finding)."""
    from pyspark.sql import functions as F

    from emf_spark.operators.output import plan_cw_batches

    n = 500
    ev = spark.createDataFrame(
        [("s", 0, "same", 50) for _ in range(n)],
        "sink string, window_start bigint, dim_hash string, sz bigint",
    )
    planned = plan_cw_batches(
        ev,
        order_cols=["window_start", "dim_hash"],
        max_batch_bytes=4096,
        max_batch_events=100,
        max_event_bytes=1024,
        bytes_col="sz",
    )
    per = planned.groupBy("batch_id").agg(
        F.count(F.lit(1)).alias("n"), F.sum("sz").alias("b")
    ).collect()
    assert sum(r["n"] for r in per) == n
    for r in per:
        assert r["n"] <= 100 and r["b"] <= 4096, r
