"""Log-to-metrics rule compilation (operators/log2metrics.py)."""

from datetime import datetime as DT

import pytest

from emf_spark.operators.log2metrics import log_to_metrics


def _run(spark, rows, rules, window=3600, keys=()):
    df = spark.createDataFrame(
        rows, "ts timestamp, eid long, k string, record map<string,string>")
    out = log_to_metrics(df, "record", "ts", "eid", rules, window,
                         key_cols=list(keys))
    return {
        tuple([r[c] for c in keys] + [r["bucket_start"], r["metric"], r["le"]]):
            r["value"]
        for r in out.collect()
    }


T0 = DT(2024, 1, 1, 0, 0, 0)
E0 = int(T0.timestamp())


def test_counter_gauge_histogram_one_pass(spark):
    rows = [
        (T0, 1, "a", {"level": "error", "took": "120"}),
        (DT(2024, 1, 1, 0, 10), 2, "a", {"level": "info", "took": "30"}),
        (DT(2024, 1, 1, 0, 20), 3, "a", {"level": "error", "took": "bad"}),
        (DT(2024, 1, 1, 0, 30), 4, "a", {"level": "info"}),
        (DT(2024, 1, 1, 0, 40), 5, "a", None),
        (DT(2024, 1, 1, 1, 5), 6, "a", {"level": "info", "took": "60"}),
    ]
    rules = [
        {"kind": "counter", "name": "errors_total",
         "when": [("key_value_equals", "level", "error")]},
        {"kind": "gauge", "name": "took_last", "field": "took"},
        {"kind": "histogram", "name": "took_hist", "field": "took",
         "les": [50, 100, 200]},
    ]
    got = _run(spark, rows, rules)
    assert got[(E0, "errors_total", None)] == 2  # bad-field row still counts
    # gauge: eid3's "bad" is not a sample -> last valid is eid2's 30
    assert got[(E0, "took_last", None)] == 30
    assert got[(E0, "took_hist", 50)] == 1
    assert got[(E0, "took_hist", 100)] == 1
    assert got[(E0, "took_hist", 200)] == 2
    # hour 1
    assert got[(E0 + 3600, "errors_total", None)] == 0
    assert got[(E0 + 3600, "took_last", None)] == 60
    # NULL record matched nothing anywhere
    assert sum(v for (b, m, le), v in got.items()
               if m == "took_hist" and le == 200) == 3


def test_gauge_empty_window_emits_null_and_tiebreak(spark):
    rows = [
        (T0, 2, "a", {"x": "7"}),
        (T0, 1, "a", {"x": "9"}),   # same ts: higher eid wins -> 7
        (DT(2024, 1, 1, 1, 0), 3, "a", {"y": "1"}),  # no x this window
    ]
    got = _run(spark, rows, [{"kind": "gauge", "name": "g", "field": "x"}])
    assert got[(E0, "g", None)] == 7
    assert got[(E0 + 3600, "g", None)] is None


def test_key_cols_partition_metrics(spark):
    rows = [
        (T0, 1, "a", {"level": "error"}),
        (T0, 2, "b", {"level": "error"}),
        (T0, 3, "b", {"level": "info"}),
    ]
    got = _run(spark, rows, [
        {"kind": "counter", "name": "errors_total",
         "when": [("key_value_equals", "level", "error")]}], keys=("k",))
    assert got[("a", E0, "errors_total", None)] == 1
    assert got[("b", E0, "errors_total", None)] == 1


def test_rule_validation(spark):
    bad = [
        ([], "at least one rule"),
        ([{"kind": "meter", "name": "x"}], "unknown metric kind"),
        ([{"kind": "counter"}], "needs a name"),
        ([{"kind": "counter", "name": "x"},
          {"kind": "counter", "name": "x"}], "duplicate metric name"),
        ([{"kind": "gauge", "name": "x"}], "needs a field"),
        ([{"kind": "histogram", "name": "x", "field": "f",
           "les": [10, 10]}], "strictly increasing"),
        ([{"kind": "histogram", "name": "x", "field": "f",
           "les": [20, 10]}], "strictly increasing"),
        ([{"kind": "counter", "name": "x",
           "when": [("perhaps", "k")]}], "unknown condition"),
    ]
    df = spark.createDataFrame(
        [(T0, 1, "a", {"k": "v"})],
        "ts timestamp, eid long, k string, record map<string,string>")
    for rules, msg in bad:
        with pytest.raises(ValueError, match=msg):
            log_to_metrics(df, "record", "ts", "eid", rules, 3600)
    with pytest.raises(ValueError, match="window_seconds"):
        log_to_metrics(df, "record", "ts", "eid",
                       [{"kind": "counter", "name": "x"}], 0)


def test_plan_one_aggregate_no_join(spark):
    df = spark.createDataFrame(
        [(T0, 1, "a", {"k": "1"})],
        "ts timestamp, eid long, k string, record map<string,string>")
    rules = [
        {"kind": "counter", "name": "c"},
        {"kind": "gauge", "name": "g", "field": "k"},
        {"kind": "histogram", "name": "h", "field": "k", "les": [1, 2]},
    ]
    plan = log_to_metrics(df, "record", "ts", "eid", rules, 3600)\
        ._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "Join" not in plan, plan
    assert plan.count("Generate explode") == 1, plan
