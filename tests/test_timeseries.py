"""datax/timeseries: python-reference replays of the integer-lattice
telemetry operators (reset-aware counter increase, gap-fill ffill,
EWMA fold, burn-rate flags) plus guard/edge coverage. Reference
analog: these are read-side queries over the counter/gauge shapes the
EMF aggregator (fluent-bit-emf/aggregator.go) accumulates."""

from datetime import datetime as DT, timedelta as TD

import pytest
from pyspark.sql import functions as F

from emf_spark.datax import timeseries as TS


def _rows(vals, t0=DT(2024, 1, 1)):
    """(key, ts, id, value) rows: vals = {key: [v0, v1, ...]} spaced
    10 min apart, ids unique and increasing."""
    out, i = [], 0
    for k, vs in vals.items():
        for j, v in enumerate(vs):
            out.append((k, t0 + TD(minutes=10 * j), i, v))
            i += 1
    return out


def test_counter_increase_reset_semantics(spark):
    """prev->cur drop is a reset contributing cur; first sample
    contributes 0; ties on ts break by the tiebreak column."""
    rows = _rows({"a": [1.00, 3.50, 0.40, 2.40], "b": [5.00]})
    # a: +0, +250, reset(+40), +200 -> 490, 1 reset, last 240
    rows.append(("c", DT(2024, 1, 1), 100, 2.00))
    rows.append(("c", DT(2024, 1, 1), 101, 1.00))  # same ts, id-ordered
    df = spark.createDataFrame(rows, "k string, ts timestamp, eid long, value double")
    got = {r["k"]: r.asDict() for r in
           TS.counter_increase(df, ["k"], "ts", "value", "eid").collect()}
    assert got["a"]["increase_units"] == 490
    assert (got["a"]["resets"], got["a"]["last_units"]) == (1, 240)
    assert got["b"]["samples"] == 1 and got["b"]["increase_units"] == 0
    # c: 200 -> 100 is a reset (tiebreak decides order), last = 100
    assert (got["c"]["resets"], got["c"]["increase_units"],
            got["c"]["last_units"]) == (1, 100, 100)


def test_resample_ffill_grid_and_fill(spark):
    """Grid spans [first, last] observed bucket per series; in-bucket
    last-by-(ts, tiebreak) wins; gaps carry the previous value with
    filled=1."""
    t0 = DT(2024, 1, 1)
    rows = [
        ("a", t0, 1, 1.00),
        ("a", t0 + TD(seconds=30), 2, 2.00),          # same bucket, later ts
        ("a", t0 + TD(seconds=180), 3, 9.99),          # bucket 3 (gap 1,2)
        ("b", t0 + TD(seconds=60), 4, 7.00),
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, eid long, value double")
    got = sorted(
        (r["k"], r["bucket_start"], r["value_units"], r["filled"])
        for r in TS.resample_ffill(df, ["k"], "ts", "value", "eid", 60).collect()
    )
    e0 = int(t0.timestamp())
    assert got == [
        ("a", e0, 200, 0), ("a", e0 + 60, 200, 1), ("a", e0 + 120, 200, 1),
        ("a", e0 + 180, 999, 0), ("b", e0 + 60, 700, 0),
    ]
    with pytest.raises(ValueError):
        TS.resample_ffill(df, ["k"], "ts", "value", "eid", 0)


def test_ewma_matches_python_fold(spark):
    """The engine's sentinel fold must equal the sequential python
    recurrence s_t = (n*x + (d-n)*s) // d with s_0 = x_0."""
    vals = {"a": [1.23, 4.56, 0.01, 9.99, 3.33], "b": [2.00]}
    df = spark.createDataFrame(
        _rows(vals), "k string, ts timestamp, eid long, value double")
    got = {r["k"]: (r["samples"], r["ewma_units"]) for r in
           TS.ewma(df, ["k"], "ts", "value", "eid", 3, 10).collect()}
    for k, vs in vals.items():
        cents = [round(v * 100) for v in vs]
        s = cents[0]
        for x in cents[1:]:
            s = (3 * x + 7 * s) // 10
        assert got[k] == (len(vs), s)
    with pytest.raises(ValueError):
        TS.ewma(df, ["k"], "ts", "value", "eid", 10, 10)
    with pytest.raises(ValueError):
        TS.ewma(df, ["k"], "ts", "value", "eid", 0, 10)


def test_burn_rate_flags_and_guards(spark):
    """Hour vs day basis-point ratios in pure integers; the > 2x flag
    fires only where the short window really burns faster."""
    t0 = DT(2024, 1, 1)
    rows = []
    eid = 0
    # hour 0: 8 errors / 10 total (8000bp); hours 1..9: 0/10 each
    for h in range(10):
        for i in range(10):
            rows.append((t0 + TD(hours=h, minutes=i), "error" if h == 0 and i < 8 else "ok", eid))
            eid += 1
    df = spark.createDataFrame(rows, "ts timestamp, event_type string, eid long")
    out = {r["bucket_start"]: r.asDict() for r in
           TS.burn_rate(df, "ts", F.col("event_type") == "error", 3600, 86400).collect()}
    e0 = int(t0.timestamp())
    day_bp = 8 * 10000 // 100
    assert out[e0]["short_bp"] == 8000 and out[e0]["long_bp"] == day_bp
    assert out[e0]["burning"] == 1
    assert all(v["burning"] == 0 for k, v in out.items() if k != e0)
    with pytest.raises(ValueError):
        TS.burn_rate(df, "ts", F.col("event_type") == "error", 3600, 5000)


def test_mad_anomalies_matches_python(spark):
    """Median/MAD/flag replayed in python (exact half/quarter-lattice
    interpolation), plus the one-exchange plan claim: a single
    shuffle Exchange feeds window -> window -> final aggregate."""
    import statistics

    vals = {"a": [1.00, 1.10, 0.90, 1.05, 50.00, 0.95],
            "b": [2.00, 2.00, 2.00], "c": [7.77]}
    df = spark.createDataFrame(
        [(k, v) for k, vs in vals.items() for v in vs],
        "k string, value double")
    got = {r["k"]: r.asDict() for r in
           TS.mad_anomalies(df, ["k"], "value", 3).collect()}
    for k, vs in vals.items():
        cents = [round(v * 100) for v in vs]
        med = statistics.median(cents)
        devs = [abs(c - med) for c in cents]
        mad = statistics.median(devs)
        n_anom = sum(1 for d in devs if d > 3 * mad)
        assert got[k]["samples"] == len(vs)
        assert got[k]["med_units"] == float(med)
        assert got[k]["mad_units"] == float(mad)
        assert got[k]["anomalies"] == n_anom, k
    # MAD=0 series (b, c): only strictly-positive deviations flag
    assert got["b"]["anomalies"] == 0 and got["c"]["anomalies"] == 0
    assert got["a"]["anomalies"] == 1

    from tests.test_plans import plan_of
    p = plan_of(TS.mad_anomalies(df, ["k"], "value", 3), "simple")
    assert p.count("Exchange hashpartitioning") == 1, p[:2000]
    with pytest.raises(ValueError):
        TS.mad_anomalies(df, ["k"], "value", 0)


def test_ohlc_bars_picks_and_guards(spark):
    import pytest as _pytest

    from emf_spark.datax.timeseries import ohlc_bars

    from datetime import datetime as DT

    rows = [
        # one series, one hour bucket: open=first by (ts,id), close=last
        ("a", DT(2024, 1, 1, 10, 0, 5), 1, 5.0),
        ("a", DT(2024, 1, 1, 10, 0, 5), 2, 9.0),   # same second: id breaks tie
        ("a", DT(2024, 1, 1, 10, 30, 0), 3, 1.0),
        ("a", DT(2024, 1, 1, 10, 59, 59), 4, 7.0),
        ("a", DT(2024, 1, 1, 11, 0, 0), 5, 2.0),   # next bucket
    ]
    df = spark.createDataFrame(
        rows, "k string, ts timestamp, event_id bigint, value double"
    )
    out = {r["bucket_start"]: r for r in ohlc_bars(
        df, ["k"], "ts", "value", "event_id", 3600).collect()}
    b0 = [r for r in out.values() if r["n"] == 4][0]
    assert (b0["open"], b0["close"], b0["high"], b0["low"]) == (5.0, 7.0, 9.0, 1.0)
    b1 = [r for r in out.values() if r["n"] == 1][0]
    assert (b1["open"], b1["close"]) == (2.0, 2.0)
    with _pytest.raises(ValueError, match="step_seconds"):
        ohlc_bars(df, ["k"], "ts", "value", "event_id", 0)


def test_rate_limit_keeps_first_n_per_window(spark):
    import pytest as _pytest

    from emf_spark.datax.timeseries import rate_limit

    from datetime import datetime as DT

    rows = [("u", DT(2024, 1, 1, 10, 0, i), i, 1.0) for i in range(5)] + [
        ("u", DT(2024, 1, 1, 11, 0, 0), 10, 1.0),   # fresh window resets
        ("v", DT(2024, 1, 1, 10, 0, 0), 20, 1.0),   # quiet key untouched
    ]
    df = spark.createDataFrame(
        rows, "user string, ts timestamp, event_id bigint, value double"
    )
    out = {r["event_id"]: r["kept"] for r in rate_limit(
        df, ["user"], "ts", "event_id", 2, 3600).collect()}
    assert out == {0: 1, 1: 1, 2: 0, 3: 0, 4: 0, 10: 1, 20: 1}
    with _pytest.raises(ValueError, match="max_per_window"):
        rate_limit(df, ["user"], "ts", "event_id", 0, 3600)


def test_rate_limit_output_collision_guard(spark):
    import pytest as _pytest

    from datetime import datetime as DT

    from emf_spark.datax.timeseries import rate_limit

    df = spark.createDataFrame(
        [("u", DT(2024, 1, 1), 1, 1)],
        "user string, ts timestamp, event_id bigint, kept int",
    )
    with _pytest.raises(ValueError, match="collides"):
        rate_limit(df, ["user"], "ts", "event_id", 1, 60)


def test_apdex_boundaries_and_ppm(spark):
    """Hand-computed apdex: T and 4T land on the SATISFIED/TOLERATING
    sides respectively (<=), floor-div ppm, null latencies excluded,
    per-(group, hour) bucketing, and the parameter guard."""
    t0 = DT(2024, 1, 1, 10, 0, 0)
    rows = [
        # svc a, hour 10: sat(10.00), sat(exactly 30.00), tol(30.01),
        # tol(exactly 120.00), fru(120.01), null excluded
        ("a", t0, 10.00), ("a", t0, 30.00), ("a", t0, 30.01),
        ("a", t0, 120.00), ("a", t0, 120.01), ("a", t0, None),
        # svc a, hour 11: one frustrated -> apdex 0
        ("a", t0 + TD(hours=1), 300.0),
        # svc b, hour 10: all satisfied -> apdex 1e6
        ("b", t0, 1.0), ("b", t0, 2.0),
    ]
    df = spark.createDataFrame(rows, "event_type string, ts timestamp, value double")
    got = {
        (r["event_type"], r["bucket_start"]): r
        for r in TS.apdex(df, threshold_cents=3000).collect()
    }
    h10 = int(t0.timestamp()) - int(t0.timestamp()) % 3600
    a10 = got[("a", h10)]
    assert (a10["total"], a10["satisfied"], a10["tolerating"],
            a10["frustrated"]) == (5, 2, 2, 1)
    # (1e6 * (2*2 + 2)) // (2*5) = 600000
    assert a10["apdex_ppm"] == 600_000
    assert got[("a", h10 + 3600)]["apdex_ppm"] == 0
    assert got[("b", h10)]["apdex_ppm"] == 1_000_000
    assert len(got) == 3

    with pytest.raises(ValueError):
        TS.apdex(df, threshold_cents=0)
    with pytest.raises(ValueError):
        TS.apdex(df, window_seconds=0)


def _cusum_ref(xs, target, slack, threshold):
    """Textbook Page recursion, cents."""
    s_hi = s_lo = 0
    out = []
    for x in xs:
        s_hi = max(0, s_hi + (x - target - slack))
        s_lo = max(0, s_lo + (target - slack - x))
        out.append((s_hi, s_lo, int(s_hi >= threshold), int(s_lo >= threshold)))
    return out


def test_cusum_matches_textbook_recursion(spark):
    """Closed form (prefix sum - running min) == Page's recursion on a
    randomized multi-series stream, incl. resets to zero and both-side
    alarms."""
    import random

    rng = random.Random(7)
    rows = []
    expect = {}
    for k in ("a", "b", "c"):
        # drifting series: baseline 100.00 +- noise, with a +20 shift
        # in the middle third and a -20 shift at the tail
        xs = []
        for i in range(60):
            base = 100.0 + (20.0 if 20 <= i < 40 else (-20.0 if i >= 42 else 0.0))
            xs.append(round(base + rng.uniform(-3, 3), 2))
        cents = [round(x * 100) for x in xs]
        expect[k] = _cusum_ref(cents, 10000, 200, 30000)
        t0 = DT(2024, 1, 1)
        rows += [(k, t0 + TD(minutes=i), i, xs[i]) for i in range(60)]
    df = spark.createDataFrame(rows, "k string, ts timestamp, id long, value double")
    got = TS.cusum(df, ["k"], "ts", "value", "id",
                   target_cents=10000, slack_cents=200, threshold_cents=30000)
    by = {(r["k"], r["id"]): (r["cusum_hi_cents"], r["cusum_lo_cents"],
                              r["alarm_hi"], r["alarm_lo"])
          for r in got.collect()}
    for k in ("a", "b", "c"):
        for i, want in enumerate(expect[k]):
            assert by[(k, i)] == want, (k, i)
    # both shift directions actually alarmed somewhere
    assert any(v[2] for v in expect["a"])
    assert any(v[3] for v in expect["a"])


def test_cusum_nulls_excluded_and_guards(spark):
    t0 = DT(2024, 1, 1)
    rows = [("a", t0, 0, 150.0), ("a", t0 + TD(minutes=1), 1, None),
            ("a", t0 + TD(minutes=2), 2, 150.0)]
    df = spark.createDataFrame(rows, "k string, ts timestamp, id long, value double")
    got = TS.cusum(df, ["k"], "ts", "value", "id", 10000, 0, 9000)
    rows = sorted(got.collect(), key=lambda r: r["id"])
    assert [r["id"] for r in rows] == [0, 2]  # null sample dropped
    # 5000 after row 0, 10000 after row 2 (null did not reset anything)
    assert [r["cusum_hi_cents"] for r in rows] == [5000, 10000]
    assert [r["alarm_hi"] for r in rows] == [0, 1]

    with pytest.raises(ValueError, match="threshold"):
        TS.cusum(df, ["k"], "ts", "value", "id", 10000, 0, 0)
    with pytest.raises(ValueError, match="slack"):
        TS.cusum(df, ["k"], "ts", "value", "id", 10000, -1, 100)
    with pytest.raises(ValueError, match="collides"):
        TS.cusum(df.withColumn("alarm_hi", F.lit(1)),
                 ["k"], "ts", "value", "id", 10000, 0, 100)


def test_cusum_plan_single_exchange(spark):
    """Both running aggregates ride ONE hash Exchange on the series
    key (the two Window nodes share partitioning+ordering, so the
    second requires no new shuffle or sort)."""
    df = spark.createDataFrame(
        [("a", DT(2024, 1, 1), 0, 1.0)],
        "k string, ts timestamp, id long, value double")
    plan = TS.cusum(df, ["k"], "ts", "value", "id", 100, 0, 100)\
        ._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert plan.count("Sort ") <= 1, plan


def _hq_ref(buckets, q_num, q_den):
    """PromQL histogram_quantile reference on (le, cum) pairs sorted by
    le, integer micro-units."""
    total = max(c for _, c in buckets)
    ple, pcum = 0, 0
    for le, cum in sorted(buckets):
        if cum * q_den >= q_num * total:
            return (le, ple * 1_000_000
                    + ((le - ple) * 1_000_000 * (q_num * total - q_den * pcum))
                    // (q_den * (cum - pcum)))
        ple, pcum = le, cum
    return None


def _hq_run(spark, rows, q_num, q_den):
    df = spark.createDataFrame(rows, "k string, le long, cum long")
    got = TS.histogram_quantile(df, ["k"], "le", "cum", q_num, q_den)
    return {r["k"]: (r["le"], r["quantile_micro"]) for r in got.collect()}


def test_histogram_quantile_matches_reference(spark):
    import random

    rng = random.Random(11)
    rows, expect = [], {}
    for k in ("a", "b", "c", "d"):
        les = [1000 * i for i in range(1, 11)]
        counts = [rng.randrange(0, 50) for _ in les]
        cums, acc = [], 0
        for c in counts:
            acc += c
            cums.append(acc)
        buckets = list(zip(les, cums))
        for q in ((50, 100), (95, 100), (999, 1000), (1, 1)):
            expect[(k, q)] = _hq_ref(buckets, *q)
        rows += [(k, le, cum) for le, cum in buckets]
    for q in ((50, 100), (95, 100), (999, 1000), (1, 1)):
        got = _hq_run(spark, rows, *q)
        for k in ("a", "b", "c", "d"):
            assert got[k] == expect[(k, q)], (k, q)


def test_histogram_quantile_edges(spark):
    # rank lands exactly on a bucket's cumulative count -> zero
    # interpolation remainder; first-bucket pick uses the virtual
    # (le=0, cum=0) lower bound
    got = _hq_run(spark, [("a", 100, 10), ("a", 200, 10)], 1, 1)
    assert got["a"] == (100, 100_000_000)  # q=1.0 -> top of first bucket
    got = _hq_run(spark, [("b", 100, 4), ("b", 200, 8)], 50, 100)
    assert got["b"] == (100, 100_000_000)  # rank 4 == cum of bucket 1
    # all-zero series: no bucket reaches a positive rank -> no row
    got = _hq_run(spark, [("z", 100, 0), ("z", 200, 0)], 95, 100)
    assert "z" not in got

    with pytest.raises(ValueError, match="q_num/q_den"):
        TS.histogram_quantile(
            spark.createDataFrame([("a", 1, 1)], "k string, le long, cum long"),
            ["k"], "le", "cum", 0, 100)
    with pytest.raises(ValueError, match="q_num/q_den"):
        TS.histogram_quantile(
            spark.createDataFrame([("a", 1, 1)], "k string, le long, cum long"),
            ["k"], "le", "cum", 101, 100)


def test_histogram_quantile_monotonicity_guard(spark):
    df = spark.createDataFrame(
        [("a", 100, 10), ("a", 200, 5)], "k string, le long, cum long")
    with pytest.raises(Exception, match="cumulative counts decrease"):
        TS.histogram_quantile(df, ["k"], "le", "cum", 50, 100).collect()


def test_histogram_quantile_plan_single_exchange(spark):
    df = spark.createDataFrame(
        [("a", 100, 10), ("a", 200, 20)], "k string, le long, cum long")
    plan = TS.histogram_quantile(df, ["k"], "le", "cum", 95, 100)\
        ._jdf.queryExecution().executedPlan().toString()
    # lag window + partition-max share the series partitioning; the
    # final argpick aggregate adds its own exchange at most once
    assert plan.count("Exchange hashpartitioning") <= 2, plan
    assert "Join" not in plan, plan


def test_seasonal_baseline_slots_and_ratio(spark):
    """Same-slot-only comparison: hour-10 buckets across days baseline
    each other, never hour-11; ratio is the cross-multiplied integer
    mean; thin history never alarms."""
    t0 = DT(2024, 1, 1, 10, 0, 0)
    rows = []
    eid = 0
    # series 'a', hour-10 slot across 4 days: 10, 10, 10, 40 events
    for day, cnt in enumerate((10, 10, 10, 40)):
        for _ in range(cnt):
            rows.append(("a", t0 + TD(days=day)))
    # hour-11 same days: constant 100 — must not contaminate hour-10
    for day in range(4):
        for _ in range(100):
            rows.append(("a", t0 + TD(days=day, hours=1)))
    df = spark.createDataFrame(rows, "k string, ts timestamp")
    got = {(r["k"], r["bucket_start"]): r for r in TS.seasonal_baseline(
        df, ["k"], "ts", 3600, 86400, threshold_ppm=2_000_000,
        min_history=2).collect()}
    e0 = int(t0.timestamp())
    day = 86400
    # day 0: no history
    r0 = got[("a", e0)]
    assert (r0["baseline_n"], r0["ratio_ppm"], r0["anomalous"]) == (0, None, 0)
    # day 1: 1 prior (10) -> ratio 1.0 but min_history=2 blocks alarm
    r1 = got[("a", e0 + day)]
    assert (r1["baseline_n"], r1["ratio_ppm"], r1["anomalous"]) == (1, 1_000_000, 0)
    # day 3: priors 10,10,10 -> 40/10 = 4x -> alarm
    r3 = got[("a", e0 + 3 * day)]
    assert (r3["baseline_n"], r3["ratio_ppm"], r3["anomalous"]) == (3, 4_000_000, 1)
    # hour-11 buckets: steady 100s, never anomalous, own slot
    r11 = got[("a", e0 + 3 * day + 3600)]
    assert (r11["n"], r11["baseline_n"], r11["ratio_ppm"], r11["anomalous"]) == (
        100, 3, 1_000_000, 0)
    assert all(v["slot"] == (k[1] % 86400) for k, v in got.items())


def test_seasonal_baseline_guards(spark):
    df = spark.createDataFrame([("a", DT(2024, 1, 1))], "k string, ts timestamp")
    with pytest.raises(ValueError, match="step_seconds"):
        TS.seasonal_baseline(df, ["k"], "ts", 0, 86400, 1)
    with pytest.raises(ValueError, match="multiple"):
        TS.seasonal_baseline(df, ["k"], "ts", 3600, 5000, 1)
    with pytest.raises(ValueError, match="threshold_ppm"):
        TS.seasonal_baseline(df, ["k"], "ts", 3600, 86400, 0)


def test_seasonal_baseline_plan_two_exchanges_no_join(spark):
    df = spark.createDataFrame([("a", DT(2024, 1, 1))], "k string, ts timestamp")
    plan = TS.seasonal_baseline(df, ["k"], "ts", 3600, 86400, 1_000_000)\
        ._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") <= 2, plan
    assert "Join" not in plan, plan


def test_flag_episodes_runs_and_boundaries(spark):
    t0 = DT(2024, 1, 1)
    rows = [
        # series a: 1 1 0 1 None 1 1 -> episodes [0,1], [3,3], [5,6]
        # (NULL flag breaks a run like a 0)
        ("a", t0 + TD(minutes=0), 0, 1), ("a", t0 + TD(minutes=1), 1, 1),
        ("a", t0 + TD(minutes=2), 2, 0), ("a", t0 + TD(minutes=3), 3, 1),
        ("a", t0 + TD(minutes=4), 4, None), ("a", t0 + TD(minutes=5), 5, 1),
        ("a", t0 + TD(minutes=6), 6, 1),
        # series b: never flagged -> no rows
        ("b", t0, 10, 0),
        # series c: same-second ties order by tiebreak: 20 then 21
        ("c", t0, 21, 1), ("c", t0, 20, 1),
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, id long, flag int")
    got = {(r["k"], r["episode"]): (r["n_samples"], r["start_tie"],
                                    r["end_tie"], r["start_ts"], r["end_ts"])
           for r in TS.flag_episodes(df, ["k"], "ts", "id", "flag").collect()}
    e0 = int(t0.timestamp())
    assert got[("a", 1)] == (2, 0, 1, e0, e0 + 60)
    assert got[("a", 2)] == (1, 3, 3, e0 + 180, e0 + 180)
    assert got[("a", 3)] == (2, 5, 6, e0 + 300, e0 + 360)
    assert not any(k == "b" for k, _ in got)
    assert got[("c", 1)] == (2, 20, 21, e0, e0)
    assert len(got) == 4


def test_flag_episodes_plan_single_exchange(spark):
    df = spark.createDataFrame(
        [("a", DT(2024, 1, 1), 0, 1)], "k string, ts timestamp, id long, flag int")
    plan = TS.flag_episodes(df, ["k"], "ts", "id", "flag")\
        ._jdf.queryExecution().executedPlan().toString()
    # lag + running sum share one (series, order) window partitioning;
    # the final per-episode aggregate may add one more
    assert plan.count("Exchange hashpartitioning") <= 2, plan
    assert "Join" not in plan, plan
