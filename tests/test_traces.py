"""Service-graph derivation from spans (operators/traces.py)."""

import pytest
from pyspark.sql import functions as F

from emf_spark.operators.traces import MISSING, ROOT, service_graph

SCHEMA = ("trace long, span long, parent long, svc string, "
          "dur long, err boolean")


def _edges(spark, rows):
    df = spark.createDataFrame(rows, SCHEMA)
    got = service_graph(df, "trace", "span", "parent", "svc",
                        duration_cents_col="dur", error_col="err")
    return {(r["client"], r["server"]): (r["calls"], r["errors"],
                                         r["duration_cents"])
            for r in got.collect()}


def test_edges_roots_missing_and_rollup(spark):
    rows = [
        # trace 1: gw -> auth, gw -> db (x2, one error), auth -> db
        (1, 10, None, "gw", 5, False),
        (1, 11, 10, "auth", 3, False),
        (1, 12, 10, "db", 7, True),
        (1, 13, 10, "db", 2, False),
        (1, 14, 11, "db", None, False),     # NULL duration adds 0
        # trace 2: torn — parent 99 absent
        (2, 20, 99, "svc2", 4, True),
        # trace 3: same span ids as trace 1 but different trace — must
        # NOT cross-resolve (join is trace-prefixed)
        (3, 11, None, "other", 1, False),
    ]
    got = _edges(spark, rows)
    assert got == {
        (ROOT, "gw"): (1, 0, 5),
        (ROOT, "other"): (1, 0, 1),
        ("gw", "auth"): (1, 0, 3),
        ("gw", "db"): (2, 1, 9),
        ("auth", "db"): (1, 0, 0),
        (MISSING, "svc2"): (1, 1, 4),
    }


def test_optional_columns_default_to_zero(spark):
    df = spark.createDataFrame(
        [(1, 10, None, "a", 1, False), (1, 11, 10, "b", 2, True)], SCHEMA)
    got = {(r["client"], r["server"]): (r["errors"], r["duration_cents"])
           for r in service_graph(df, "trace", "span", "parent", "svc").collect()}
    assert got == {(ROOT, "a"): (0, 0), ("a", "b"): (0, 0)}


def test_internal_column_collision_guard(spark):
    df = spark.createDataFrame(
        [(1, 10, None, "a", 1, False)], SCHEMA).withColumn("_sg_t", F.lit(1))
    with pytest.raises(ValueError, match="collides"):
        service_graph(df, "trace", "span", "parent", "svc")


def test_plan_no_null_keys_through_join(spark):
    """Roots bypass the join: the joined branch filters parent IS NOT
    NULL below the join, so the null-key skew partition never forms."""
    df = spark.createDataFrame(
        [(1, 10, None, "a", 1, False), (1, 11, 10, "b", 2, True)], SCHEMA)
    plan = service_graph(df, "trace", "span", "parent", "svc")\
        ._jdf.queryExecution().executedPlan().toString()
    assert "isnotnull(parent" in plan and "isnull(parent" in plan, plan
    # one join total; rollup is a partial+final hash aggregate
    assert plan.count("Join") == 1 or "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
