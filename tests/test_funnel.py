"""Funnel operator boundary semantics (datax/funnel.py)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from emf_spark.datax.funnel import funnel_summary, funnel_times


def _ev(spark, rows):
    return spark.createDataFrame(
        [(u, dt.datetime(2024, 1, 1, 0, 0, s), t) for u, s, t in rows],
        "user_id long, ts timestamp, event_type string",
    )


def test_strict_ordering_excludes_same_timestamp(spark):
    # click at the exact same second as view: strict drops it,
    # weak (strict=False) keeps it.
    ev = _ev(spark, [(1, 10, "view"), (1, 10, "click"), (2, 5, "view"), (2, 6, "click")])
    strict = funnel_times(ev, ["view", "click"], ["user_id"]).collect()
    by_user = {r.user_id: r for r in strict}
    assert by_user[1].t_2 is None
    assert by_user[2].t_2 is not None
    weak = funnel_times(ev, ["view", "click"], ["user_id"], strict=False).collect()
    assert {r.user_id: r.t_2 is not None for r in weak} == {1: True, 2: True}


def test_order_matters_not_mere_presence(spark):
    # purchase BEFORE the first view must not count as conversion.
    ev = _ev(spark, [(1, 5, "purchase"), (1, 10, "view"), (2, 1, "view"), (2, 2, "purchase")])
    t = funnel_times(ev, ["view", "purchase"], ["user_id"]).collect()
    by_user = {r.user_id: r for r in t}
    assert by_user[1].t_2 is None and by_user[2].t_2 is not None


def test_units_without_step1_are_absent(spark):
    ev = _ev(spark, [(1, 1, "click"), (2, 1, "view")])
    t = funnel_times(ev, ["view", "click"], ["user_id"])
    assert [r.user_id for r in t.collect()] == [2]


def test_earliest_qualifying_time_per_step(spark):
    # t_2 is the EARLIEST click after t_1, not the last.
    ev = _ev(spark, [(1, 1, "view"), (1, 3, "click"), (1, 7, "click")])
    row = funnel_times(ev, ["view", "click"], ["user_id"]).collect()[0]
    assert row.t_1.second == 1 and row.t_2.second == 3


def test_summary_long_form_and_conversion(spark):
    ev = _ev(
        spark,
        [(1, 1, "view"), (1, 2, "click"), (1, 3, "purchase"),
         (2, 1, "view"), (2, 2, "click"),
         (3, 1, "view"),
         (4, 1, "click")],  # no view: not a unit
    )
    steps = ["view", "click", "purchase"]
    s = funnel_summary(funnel_times(ev, steps, ["user_id"]), steps)
    rows = {r.step: r for r in s.collect()}
    assert [rows[i].units for i in (1, 2, 3)] == [3, 2, 1]
    assert rows[3].conv_rate == pytest.approx(1 / 3, abs=1e-6)
    assert rows[1].step_name == "view"
    assert dict(s.dtypes)["step"] == "bigint"


def test_empty_steps_raises(spark):
    ev = _ev(spark, [(1, 1, "view")])
    with pytest.raises(ValueError):
        funnel_times(ev, [], ["user_id"])


def test_bigram_lm_score_hand_model(spark):
    # model over BOTH docs: c2(a,b)=3, c2(b,a)=1, c2(b,c)=1
    # prefix counts: c1(a)=3, c1(b)=2
    # d1 "a b a b": terms p(a,b)=1, p(b,a)=.5, p(a,b)=1 -> 2.5/3
    # d2 "a b c":   terms p(a,b)=1, p(b,c)=.5          -> .75
    # d3 "z": single word, no bigrams -> absent
    from emf_spark.datax.textstats import bigram_lm_score

    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b c"), (3, "z")], "doc_id long, text string"
    )
    rows = {r.doc_id: r for r in bigram_lm_score(docs).collect()}
    assert set(rows) == {1, 2}
    assert rows[1].n_bigrams == 3 and rows[2].n_bigrams == 2
    assert rows[1].fluency == 2_500_000 / 3_000_000
    assert rows[2].fluency == 0.75


def test_attribution_report_models(spark):
    """Hand-computed three-model attribution: window is end-exclusive
    (a touch at the conversion's second gets no credit), inclusive at
    window_sec before, linear credit is integer micro floor-div."""
    from datetime import datetime

    from emf_spark.datax.funnel import attribution_report

    def ts(sec):
        return datetime.utcfromtimestamp(1_700_000_000 + sec)

    rows = [
        # user 1: click@0, view@10, purchase@20 -> first=click,
        # last=view, linear 500000 each
        (1, 1, "click", ts(0)),
        (1, 2, "view", ts(10)),
        (1, 3, "purchase", ts(20)),
        # user 2: view exactly AT the conversion second -> excluded;
        # click exactly window_sec before -> included (first=last=click)
        (2, 4, "view", ts(100)),
        (2, 5, "click", ts(100 - 50)),
        (2, 6, "purchase", ts(100)),
        # user 3: conversion with no touches in window -> contributes
        # nothing anywhere
        (3, 7, "purchase", ts(500)),
        (3, 8, "click", ts(500 - 51)),  # just outside the 50 s window
    ]
    ev = spark.createDataFrame(
        rows, "user_id bigint, event_id bigint, event_type string, ts timestamp"
    )
    out = {
        r["ttype"]: (r["first_touch"], r["last_touch"], r["linear_micro"])
        for r in attribution_report(
            ev, "purchase", ["click", "view"], window_sec=50
        ).collect()
    }
    # user 1: first=click last=view, 2 touches -> 500000 micro each;
    # user 2: click only -> first+last, 1000000 micro
    assert out == {
        "click": (2, 1, 1_500_000),
        "view": (0, 1, 500_000),
    }


def test_attribution_linear_floor_division(spark):
    """3 touches -> 333333 micro each (floor), summed per type."""
    from datetime import datetime

    from emf_spark.datax.funnel import attribution_report

    def ts(sec):
        return datetime.utcfromtimestamp(1_700_000_000 + sec)

    rows = [
        (1, 1, "click", ts(0)),
        (1, 2, "click", ts(1)),
        (1, 3, "view", ts(2)),
        (1, 4, "purchase", ts(10)),
    ]
    ev = spark.createDataFrame(
        rows, "user_id bigint, event_id bigint, event_type string, ts timestamp"
    )
    out = {
        r["ttype"]: (r["first_touch"], r["last_touch"], r["linear_micro"])
        for r in attribution_report(
            ev, "purchase", ["click", "view"], window_sec=3600
        ).collect()
    }
    assert out == {"click": (1, 0, 666_666), "view": (0, 1, 333_333)}
