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


def test_merge_intervals_islands_and_min_gap(spark):
    import pytest

    from emf_spark.operators.ranges import merge_intervals

    rows = [
        # key "a": [0,10] [5,8] (contained) [10,12] (touching) -> one
        # island [0,12]; [20,25] separate
        ("a", 0.0, 10.0),
        ("a", 5.0, 8.0),
        ("a", 10.0, 12.0),
        ("a", 20.0, 25.0),
        # key "b": single interval
        ("b", 100.0, 101.0),
    ]
    df = spark.createDataFrame(rows, "k string, start double, end double")
    got = {
        (r["k"], r["island_start"], r["island_end"], r["n_rows"])
        for r in merge_intervals(df, keys=["k"]).collect()
    }
    assert got == {
        ("a", 0.0, 12.0, 3),
        ("a", 20.0, 25.0, 1),
        ("b", 100.0, 101.0, 1),
    }
    # min_gap bridges the 8-second hole between 12 and 20
    got2 = {
        (r["k"], r["island_start"], r["island_end"], r["n_rows"])
        for r in merge_intervals(df, keys=["k"], min_gap=8.0).collect()
    }
    assert got2 == {("a", 0.0, 25.0, 4), ("b", 100.0, 101.0, 1)}
    # internal-column collision guard
    with pytest.raises(ValueError, match="_island"):
        merge_intervals(df.withColumn("_island", df.start), keys=["k"])


def test_merge_intervals_running_max_not_prev_end(spark):
    """The break test must use the RUNNING max end, not the previous
    row's end: [0,100], [1,2], [3,4] is ONE island even though [3,4]
    starts after [1,2] ends."""
    from emf_spark.operators.ranges import merge_intervals

    df = spark.createDataFrame(
        [(0.0, 100.0), (1.0, 2.0), (3.0, 4.0)], "start double, end double"
    )
    out = merge_intervals(df).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["island_start"], r["island_end"], r["n_rows"]) == (0.0, 100.0, 3)
