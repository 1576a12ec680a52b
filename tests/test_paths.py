"""Clickstream path-transition mining (datax/paths.py)."""

import re

from pyspark.sql import functions as F

from emf_spark.datax.paths import END, START, path_transitions


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string"
    ).selectExpr("event_id", "cast(ts as timestamp) ts", "user_id", "event_type")


def _table(spark, rows, **kw):
    out = path_transitions(_df(spark, rows), **kw).collect()
    return {(r["src"], r["dst"]): (r["cnt"], r["p_ppm"]) for r in out}


BASE = [
    (1, "2024-01-01 00:00:01.000001", 1, "a"),
    (2, "2024-01-01 00:00:02.000001", 1, "b"),
    (3, "2024-01-01 00:00:02.000001", 1, "c"),  # same ts as b -> id tiebreak
    (4, "2024-01-01 00:00:01.5", 2, "a"),
    (5, "2024-01-01 00:00:03", 2, "a"),  # self loop
    (6, "2024-01-01 00:00:09", 3, "z"),  # single-event session
    (7, "2024-01-01 00:00:09", None, "q"),  # NULL session: dropped
]


def test_bigrams_endpoints_and_ppm(spark):
    got = _table(spark, BASE)
    assert got[(START, "a")] == (2, 666_666)  # sessions 1 and 2 enter at a
    assert got[(START, "z")] == (1, 333_333)
    assert got[("a", "b")] == (1, 333_333)
    assert got[("b", "c")] == (1, 1_000_000)
    assert got[("c", END)] == (1, 1_000_000)
    assert got[("a", "a")] == (1, 333_333)  # self loop is a real edge
    assert got[("a", END)] == (1, 333_333)
    assert got[("z", END)] == (1, 1_000_000)  # 1-event session: entry+exit only
    assert ("q", END) not in got and (START, "q") not in got  # NULL session
    # n-event session contributes n+1 transitions: 3+1 + 2+1 + 1+1 = 9
    assert sum(c for c, _ in got.values()) == 9


def test_flow_balance(spark):
    """With endpoints, every page's inflow equals its outflow — the
    Sankey conservation law (each visit has exactly one in and one
    out edge once _start_/_end_ are materialized)."""
    got = _table(spark, BASE)
    pages = {s for s, _ in got} | {d for _, d in got}
    for p in pages - {START, END}:
        inflow = sum(c for (s, d), (c, _) in got.items() if d == p)
        outflow = sum(c for (s, d), (c, _) in got.items() if s == p)
        assert inflow == outflow, p


def test_tiebreak_is_event_id(spark):
    # swap the ids of the two same-timestamp events: the path reverses
    swapped = [
        (1, "2024-01-01 00:00:01.000001", 1, "a"),
        (3, "2024-01-01 00:00:02.000001", 1, "b"),  # id 3 now
        (2, "2024-01-01 00:00:02.000001", 1, "c"),  # id 2 now -> c before b
    ]
    got = _table(spark, swapped)
    assert ("a", "c") in got and ("c", "b") in got and ("b", END) in got
    assert ("a", "b") not in got


def test_no_endpoints_mode_and_null_type(spark):
    rows = [
        (1, "2024-01-01 00:00:01", 1, "a"),
        (2, "2024-01-01 00:00:02", 1, None),  # NULL page is a real state
        (3, "2024-01-01 00:00:03", 1, "b"),
    ]
    got = _table(spark, rows, include_endpoints=False)
    assert got == {("a", None): (1, 1_000_000), (None, "b"): (1, 1_000_000)}
    # single-event sessions vanish entirely without endpoints
    assert _table(spark, [(1, "2024-01-01 00:00:01", 9, "solo")],
                  include_endpoints=False) == {}


def test_plan_shape(spark):
    """Two Exchanges touch the event stream (session window + bigram
    agg); the p_ppm window's Exchange runs on the collapsed frame. No
    joins, no Python anywhere."""
    out = path_transitions(_df(spark, BASE))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 3, plan
    assert not re.search(r"Join|Python|Cartesian", plan), plan
