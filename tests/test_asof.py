"""As-of join: boundary semantics + no-fanout plan."""

from __future__ import annotations

from emf_spark.operators.asof import asof_join


def test_asof_basic_and_inclusive_boundary(spark):
    left = spark.createDataFrame(
        [(1, 10.0, "a"), (1, 20.0, "b"), (1, 4.0, "early"), (2, 50.0, "c")],
        "k bigint, ts double, tag string",
    )
    right = spark.createDataFrame(
        [(1, 5.0, 100.0), (1, 20.0, 200.0), (1, 25.0, 300.0), (3, 1.0, 999.0)],
        "k bigint, ts double, rate double",
    )
    out = {
        r["tag"]: r["rate"]
        for r in asof_join(left, right, key="k").collect()
    }
    assert out["a"] == 100.0      # latest right at ts<=10 is ts=5
    assert out["b"] == 200.0      # EQUAL timestamps match (inclusive)
    assert out["early"] is None   # no right row yet
    assert out["c"] is None       # key 2 has no right rows at all


def test_asof_matches_duckdb_asof_join(spark):
    import random

    import duckdb

    rng = random.Random(3)
    lrows = [
        (rng.randrange(5), float(rng.randrange(100)), i) for i in range(300)
    ]
    rrows = [
        (rng.randrange(5), float(rng.randrange(100)), float(i)) for i in range(80)
    ]
    # de-dup (k, ts) on the right: when two right rows share the exact
    # timestamp, "the latest" is ambiguous and engines tie-break
    # differently; real rate feeds are unique per (key, ts)
    seen, rrows2 = set(), []
    for k, t, v in rrows:
        if (k, t) not in seen:
            seen.add((k, t))
            rrows2.append((k, t, v))
    left = spark.createDataFrame(lrows, "k bigint, ts double, lid bigint")
    right = spark.createDataFrame(rrows2, "k bigint, ts double, rate double")
    got = {
        r["lid"]: r["rate"] for r in asof_join(left, right, key="k").collect()
    }
    con = duckdb.connect()
    con.register("l", left.toPandas())
    con.register("r", right.toPandas())
    exp = {
        int(row[0]): row[1]
        for row in con.sql(
            "SELECT l.lid, r.rate FROM l ASOF LEFT JOIN r "
            "ON l.k = r.k AND l.ts >= r.ts"
        ).fetchall()
    }
    assert got == exp


def test_asof_plan_has_no_join(spark):
    from tests.test_plans import plan_of

    left = spark.createDataFrame([(1, 1.0, "x")], "k bigint, ts double, t string")
    right = spark.createDataFrame([(1, 1.0, 2.0)], "k bigint, ts double, v double")
    p = plan_of(asof_join(left, right, key="k"), "simple")
    for bad in ("SortMergeJoin", "BroadcastHashJoin", "CartesianProduct",
                "BroadcastNestedLoopJoin"):
        assert bad not in p, (bad, p[:1500])
    assert "Window" in p


def test_asof_collision_guard(spark):
    import pytest

    left = spark.createDataFrame([(1, 1.0, 2.0)], "k bigint, ts double, rate double")
    right = spark.createDataFrame([(1, 1.0, 3.0)], "k bigint, ts double, rate double")
    with pytest.raises(ValueError, match="collide"):
        asof_join(left, right, key="k")
    # prefix resolves it
    out = asof_join(left, right, key="k", prefix="r_").collect()
    assert out[0]["rate"] == 2.0 and out[0]["r_rate"] == 3.0


def test_asof_null_right_timestamp_never_matches(spark):
    """A right row with NULL ts sorts NULLS FIRST and used to become
    the fill value for unmatched left rows (review finding); the
    oracle semantics (l.ts >= r.ts) say no match."""
    from emf_spark.operators.asof import asof_join

    left = spark.createDataFrame([("k", 5)], "key string, ts bigint")
    right = spark.createDataFrame(
        [("k", None, 99.0)], "key string, ts bigint, px double"
    )
    got = asof_join(left, right, "key").collect()
    assert got[0]["px"] is None
