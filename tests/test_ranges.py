"""Range join: brute-force parity + equi-join (not nested-loop) plan."""

from __future__ import annotations

from emf_spark.operators.ranges import range_join


def test_range_join_matches_bruteforce(spark):
    import random

    rng = random.Random(7)
    pts = [(rng.randrange(3), float(rng.randrange(0, 500)), i) for i in range(200)]
    ivs = []
    for j in range(40):
        s = float(rng.randrange(0, 480))
        ivs.append((rng.randrange(3), s, s + float(rng.randrange(1, 120)), j))
    points = spark.createDataFrame(pts, "k bigint, ts double, pid bigint")
    intervals = spark.createDataFrame(ivs, "k bigint, start double, end double, iid bigint")
    got = {
        (r["pid"], r["iid"])
        for r in range_join(points, intervals, keys=["k"], bucket=50.0).collect()
    }
    expect = {
        (pid, iid)
        for (pk, ts, pid) in pts
        for (ik, s, e, iid) in ivs
        if pk == ik and s <= ts < e
    }
    assert got == expect


def test_range_join_boundaries_and_empty_interval(spark):
    points = spark.createDataFrame(
        [(10.0, 1), (20.0, 2), (19.999, 3)], "ts double, pid bigint"
    )
    intervals = spark.createDataFrame(
        [(10.0, 20.0, 100), (30.0, 30.0, 200)], "start double, end double, iid bigint"
    )
    got = {(r["pid"], r["iid"]) for r in range_join(points, intervals, bucket=5.0).collect()}
    # start inclusive, end exclusive; empty interval matches nothing
    assert got == {(1, 100), (3, 100)}


def test_range_join_plan_is_equi_join(spark):
    from tests.test_plans import plan_of

    points = spark.createDataFrame([(1, 1.0, 1)], "k bigint, ts double, pid bigint")
    intervals = spark.createDataFrame(
        [(1, 0.0, 2.0, 1)], "k bigint, start double, end double, iid bigint"
    )
    p = plan_of(range_join(points, intervals, keys=["k"]), "simple")
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p, p[:1500]


def test_range_join_collision_guard(spark):
    import pytest

    points = spark.createDataFrame([(1.0, 5)], "ts double, v bigint")
    intervals = spark.createDataFrame([(0.0, 2.0, 7)], "start double, end double, v bigint")
    with pytest.raises(ValueError, match="collide"):
        range_join(points, intervals)
