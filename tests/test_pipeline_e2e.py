"""End-to-end parity: full pipeline over the adversarial fixture corpus
vs the pure-python oracle (FIXTURES.md §6), mirroring the reference's
integration checks (mock-cloudwatch-server/main.go:142-172) plus the
north-rule invariants: per-sink aggregate counts, merged histogram
value-counts, token-array equality on every routed row."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from emf_spark import fixtures, pipeline

from tests import oracle

N = 2000
SINK_OF = {r[0]: r[1] for r in fixtures.SOURCE_LOOKUP_ROWS}


@pytest.fixture(scope="module")
def run(spark, corpus_path, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("out"))
    res = pipeline.run(spark, corpus_path, out)
    return res, out


@pytest.fixture(scope="module")
def oracle_events():
    recs = [
        (doc_id, js, SINK_OF[src])
        for doc_id, js, src, _ts in fixtures.gen_records(N)
    ]
    groups = oracle.aggregate(recs)
    return groups, oracle.reduced_events(groups)


def test_routed_token_equality(spark, run, corpus_path):
    """North rule: routed rows carry the exact input token arrays."""
    _res, out = run
    routed = spark.read.parquet(f"{out}/routed")
    inp = spark.read.parquet(corpus_path).select(
        "doc_id", F.col("tokens").alias("tokens_in")
    )
    joined = routed.join(inp, "doc_id")
    assert joined.count() == routed.count()
    mismatches = joined.filter(F.col("tokens") != F.col("tokens_in")).count()
    assert mismatches == 0


def test_routed_sink_assignment(spark, run):
    _res, out = run
    routed = spark.read.parquet(f"{out}/routed")
    bad = routed.filter(
        F.col("sink")
        != F.when(F.col("source") == "app-a", "cloudwatch")
        .when(F.col("source") == "app-b", "cloudwatch")
        .when(F.col("source") == "app-c", "file")
        .otherwise("archive")
    ).count()
    assert bad == 0


def test_error_side_output(spark, run):
    """P1 malformed slice: 2% of corpus, all three reject reasons."""
    _res, out = run
    errors = spark.read.parquet(f"{out}/errors")
    reasons = {r["error"]: r["cnt"] for r in errors.groupBy("error").agg(F.count("*").alias("cnt")).collect()}
    assert sum(reasons.values()) == 2 * N // 100
    assert len(reasons) == 3


def test_group_keys_match_oracle(spark, run, oracle_events):
    _res, out = run
    groups, _events = oracle_events
    ev = spark.read.parquet(f"{out}/events")
    got = {
        (r["sink"], r["window_start"], r["dim_hash"])
        for r in ev.select("sink", "window_start", "dim_hash").collect()
    }
    assert got == set(groups)


def test_histograms_match_oracle(spark, run, oracle_events):
    """Merged value-count parity per (sink, window, dim_hash, metric)."""
    _res, out = run
    groups, events = oracle_events
    ev = spark.read.parquet(f"{out}/events").collect()
    checked = 0
    for row in ev:
        key = (row["sink"], row["window_start"], row["dim_hash"])
        exp = events[key]
        got_metrics = {m["metric_name"]: m for m in row["metrics"]}
        exp_fields = exp["metrics"]
        assert set(got_metrics) == set(exp_fields), key
        for name, stats in exp_fields.items():
            g = got_metrics[name]
            if isinstance(stats, dict):
                assert g["values"] == pytest.approx(stats["Values"]), (key, name)
                assert list(g["counts"]) == stats["Counts"], (key, name)
                assert g["min"] == pytest.approx(stats["Min"])
                assert g["max"] == pytest.approx(stats["Max"])
                assert g["sum"] == pytest.approx(stats["Sum"])
            else:  # A10 single-value scalar
                assert list(g["values"]) == pytest.approx([stats]), (key, name)
            checked += 1
    assert checked > 50


def test_metadata_match_oracle(spark, run, oracle_events):
    """A4 first-wins dims, A5 last-wins ts, A6 intended CWM union."""
    _res, out = run
    groups, events = oracle_events
    ev = spark.read.parquet(f"{out}/events").collect()
    for row in ev:
        key = (row["sink"], row["window_start"], row["dim_hash"])
        exp = events[key]
        assert dict(row["dimensions"]) == exp["dimensions"], key
        assert row["timestamp"] == exp["timestamp"], key
        got_cwm = [
            {
                "Namespace": p["Namespace"],
                "Dimensions": [list(s) for s in p["Dimensions"]],
                "Metrics": [{"Name": m["Name"], "Unit": m["Unit"]} for m in p["Metrics"]],
            }
            for p in (row["cw_metrics"] or [])
        ]
        assert got_cwm == exp["cw_metrics"], key


def test_event_json_shape(spark, run, oracle_events):
    """F7 spec-correct flattened EMF + A10 scalar collapse in JSON."""
    _res, out = run
    ev = spark.read.parquet(f"{out}/events").limit(500).collect()
    for row in ev:
        obj = json.loads(row["event_json"])
        assert "_aws" in obj and "Timestamp" in obj["_aws"]
        # mock-server-style check (mock-cloudwatch-server/main.go:142-172):
        # every referenced dimension is present as a field
        for p in obj["_aws"]["CloudWatchMetrics"]:
            for dset in p["Dimensions"]:
                for d in dset:
                    assert d in obj, (row["dim_hash"], d)
        for m in row["metrics"]:
            v = obj[m["metric_name"]]
            if len(m["values"]) == 1:
                assert isinstance(v, (int, float))  # A10 bare scalar
            else:
                assert set(v) == {"Values", "Counts", "Min", "Max", "Sum"}


def test_per_sink_compression_stats(spark, run, oracle_events):
    """A11: per-sink input record counts vs oracle."""
    res, _out = run
    groups, _events = oracle_events
    stats = {r["sink"]: r for r in res.stats.collect()}
    exp_records = {}
    for (sink, _w, _h), g in groups.items():
        exp_records[sink] = exp_records.get(sink, 0) + g["records"]
    for sink, r in stats.items():
        assert r["records_in"] == exp_records[sink], sink
        assert r["events_out"] < r["records_in"]  # it actually aggregates


def test_namespace_keyed_mode_matches_oracle(spark, corpus_path):
    """North-rule keying ((sink, window, namespace, dim_hash)) over the
    full adversarial corpus vs the python oracle in the same mode
    (VERDICT r1 item 6): group keys, per-metric value-count maps,
    record counts, and per-namespace cw_metrics all agree."""
    tok = spark.read.parquet(corpus_path)
    res = pipeline.build_events(spark, tok, key_by_namespace=True)
    ev = res.events.collect()

    recs = [
        (doc_id, js, SINK_OF[src])
        for doc_id, js, src, _ts in fixtures.gen_records(N)
    ]
    groups = oracle.aggregate(recs, key_by_namespace=True)

    got = {
        (r["sink"], r["window_start"], r["namespace"], r["dim_hash"]): r
        for r in ev
    }
    assert set(got) == set(groups)
    for key, g in groups.items():
        r = got[key]
        assert r["records"] == g["records"], key
        assert dict(r["dimensions"]) == g["dimensions"], key
        # per-metric exact value->count maps (pre-reduce invariant)
        exp_names = sorted(n for n, vc in g["metrics"].items() if vc)
        got_names = sorted(m["metric_name"] for m in r["metrics"])
        assert got_names == exp_names, key
        # cw_metrics carry ONLY the key namespace's projections
        for p in r["cw_metrics"]:
            assert p["Namespace"] == key[2], key
        exp_ns = {p["Namespace"] for p in g["cw_metrics"]}
        assert {p["Namespace"] for p in r["cw_metrics"]} == exp_ns, key


def test_namespace_keyed_histograms_match_oracle(spark, corpus_path):
    """Pre-reduce exact (value -> count) maps agree per namespace-keyed
    group and metric."""
    from emf_spark.operators import aggregate as agg, parse as parse_op
    from emf_spark.operators import enrich as enrich_op
    from emf_spark.tokenizer import with_payload

    tok = spark.read.parquet(corpus_path)
    parsed = parse_op.parse_emf(with_payload(tok)).filter(F.col("valid"))
    enriched = enrich_op.enrich(parsed, fixtures.lookup_df(spark))
    windowed = agg.with_window(enriched)
    obs = agg.explode_observations(windowed, key_by_namespace=True)
    p1 = obs.groupBy(
        "sink", "window_start", "namespace", "dim_hash", "metric_name", "v"
    ).agg(F.sum("c").alias("c"))
    got = {}
    for r in p1.collect():
        key = (r["sink"], r["window_start"], r["namespace"], r["dim_hash"])
        got.setdefault(key, {}).setdefault(r["metric_name"], {})[r["v"]] = r["c"]

    recs = [
        (doc_id, js, SINK_OF[src])
        for doc_id, js, src, _ts in fixtures.gen_records(N)
    ]
    groups = oracle.aggregate(recs, key_by_namespace=True)
    exp = {
        key: {n: dict(vc) for n, vc in g["metrics"].items() if vc}
        for key, g in groups.items()
    }
    exp = {k: v for k, v in exp.items() if v}
    assert got == exp


def test_singlepass_staging_matches_parquet_staging(spark, corpus_path, tmp_path):
    """staging='persist' (run-once mode, VERDICT r1 item 8) must produce
    identical events to the default parquet checkpoint."""
    a = pipeline.run(spark, corpus_path, str(tmp_path / "pq"), staging="parquet")
    b = pipeline.run(spark, corpus_path, str(tmp_path / "sp"), staging="persist")
    ea = spark.read.parquet(f"{tmp_path}/pq/events").select(
        "sink", "window_start", "dim_hash", "event_json")
    eb = spark.read.parquet(f"{tmp_path}/sp/events").select(
        "sink", "window_start", "dim_hash", "event_json")
    assert ea.count() == eb.count()
    assert ea.exceptAll(eb).count() == 0 and eb.exceptAll(ea).count() == 0
    # resume checkpoint only exists in parquet mode
    import os
    assert os.path.exists(f"{tmp_path}/pq/staged")
    assert not os.path.exists(f"{tmp_path}/sp/staged")
