"""Histogram-reduce tests transliterating
``/root/reference/fluent-bit-emf/histogram/seh_test.go`` plus the
0/1/2/>=3-distinct branches of ``histogram/histogram.go:39-88``,
driven through the engine's aggregation plan."""

from __future__ import annotations

import math

import pytest

from emf_spark.functions import LOG_1_1
from emf_spark.operators.aggregate import aggregate_histograms

from tests import oracle

OBS_SCHEMA = (
    "window_start bigint, dim_hash string, metric_name string,"
    " namespace string, v double, c bigint"
)


def _agg(spark, pairs, metric="m"):
    rows = [(0, "h", metric, "NS", float(v), int(c)) for v, c in pairs]
    obs = spark.createDataFrame(rows, OBS_SCHEMA)
    out = aggregate_histograms(obs).collect()
    return {r["metric_name"]: r for r in out}[metric]


def test_seh_bucket_math():
    """seh.go:35-45 bucket index + representative value."""
    from emf_spark.functions import seh_bucket, seh_value_of  # noqa: F401

    assert oracle.seh_bucket(1.0) == 0
    assert oracle.seh_bucket(1.05) == 0
    assert oracle.seh_bucket(10.0) == int(math.floor(math.log(10) / LOG_1_1))
    assert oracle.seh_bucket(0.0) == 0  # non-positive collision, seh.go:36-38
    assert oracle.seh_bucket(-5.0) == 0
    assert oracle.seh_value(0) == pytest.approx(math.exp(0.5 * LOG_1_1))


def test_single_distinct_exact(spark):
    """histogram.go:43-49: 1 distinct value -> exact passthrough."""
    r = _agg(spark, [(42.0, 1), (42.0, 2), (42.0, 7)])
    assert r["values"] == [42.0]
    assert r["counts"] == [10]
    assert (r["min"], r["max"], r["sum"], r["count"]) == (42.0, 42.0, 420.0, 10)


def test_two_distinct_exact(spark):
    """histogram.go:50-58: 2 distinct values -> exact passthrough."""
    r = _agg(spark, [(1200.0, 2), (999.5, 3)])
    assert r["values"] == [999.5, 1200.0]
    assert r["counts"] == [3, 2]
    assert (r["min"], r["max"]) == (999.5, 1200.0)
    assert r["sum"] == pytest.approx(1200.0 * 2 + 999.5 * 3)


def test_three_distinct_seh_compression(spark):
    """histogram.go:59-87: >=3 distinct -> SEH buckets; 1200 and 1201
    share a bucket (README.md:23 precision example)."""
    r = _agg(spark, [(1200.0, 1), (1201.0, 1), (100.0, 5)])
    expected = oracle.reduce_histogram({1200.0: 1, 1201.0: 1, 100.0: 5})
    assert r["values"] == pytest.approx(expected["Values"])
    assert r["counts"] == expected["Counts"]
    assert len(r["values"]) == 2  # 1200+1201 merged into one bucket
    assert (r["min"], r["max"]) == (100.0, 1201.0)
    assert r["sum"] == pytest.approx(1200 + 1201 + 500)
    assert r["count"] == 7


def test_nonpositive_bucket_zero_collision(spark):
    """seh.go:36-38: values <= 0 collide with bucket 0 ([1, 1.1))."""
    r = _agg(spark, [(-1.0, 1), (0.0, 1), (0.5, 1), (1.05, 1)])
    expected = oracle.reduce_histogram({-1.0: 1, 0.0: 1, 0.5: 1, 1.05: 1})
    assert r["values"] == pytest.approx(expected["Values"])
    assert r["counts"] == expected["Counts"]
    # -1, 0 and 1.05 all collide into bucket 0; 0.5 lands in bucket -8
    assert len(r["values"]) == 2
    assert r["counts"] == [1, 3]
    assert (r["min"], r["max"]) == (-1.0, 1.05)


def test_exact_merge_weighted_counts(spark):
    """histogram.go:28-37 Add with counts: duplicates merge by sum."""
    r = _agg(spark, [(5.0, 2), (5.0, 3), (6.0, 1)])
    assert r["values"] == [5.0, 6.0]
    assert r["counts"] == [5, 1]


def test_randomized_parity_with_oracle(spark):
    """Seeded random value/count sets vs the pure-python oracle."""
    import numpy as np

    rng = np.random.default_rng(7)
    for trial in range(5):
        n = int(rng.integers(1, 40))
        vals = np.round(rng.uniform(0.1, 5000, n), 2)
        cnts = rng.integers(1, 9, n)
        pairs = list(zip(vals.tolist(), cnts.tolist()))
        vc = {}
        for v, c in pairs:
            vc[v] = vc.get(v, 0) + int(c)
        expected = oracle.reduce_histogram(vc)
        r = _agg(spark, pairs)
        assert r["values"] == pytest.approx(expected["Values"]), trial
        assert r["counts"] == expected["Counts"], trial
        assert r["min"] == min(vc) and r["max"] == max(vc)
        assert r["sum"] == pytest.approx(expected["Sum"])


def test_multiple_groups_and_metrics(spark):
    """Grouping isolation across (dim_hash, metric, window)."""
    rows = [
        (0, "a", "m1", "NS", 1.0, 1),
        (0, "a", "m2", "NS", 2.0, 1),
        (0, "b", "m1", "NS", 3.0, 1),
        (60000, "a", "m1", "NS", 4.0, 1),
    ]
    obs = spark.createDataFrame(rows, OBS_SCHEMA)
    out = aggregate_histograms(obs).collect()
    got = {(r["window_start"], r["dim_hash"], r["metric_name"]): r["values"] for r in out}
    assert got == {
        (0, "a", "m1"): [1.0],
        (0, "a", "m2"): [2.0],
        (0, "b", "m1"): [3.0],
        (60000, "a", "m1"): [4.0],
    }
