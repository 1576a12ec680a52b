"""Strict-reference-parity matrix (SURVEY.md §7.4).

The reference has several outright bugs. This engine implements the
evident INTENT; each divergence is pinned here with a test that (a)
documents the reference behavior at its file:line and (b) asserts our
deterministic replacement. Inputs that do NOT trigger the bugs — which
includes the reference's whole integration corpus — produce identical
results (tests/test_pipeline_e2e.py oracle parity).
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from emf_spark import fixtures, pipeline
from emf_spark.operators.parse import parse_emf, with_parsed_metrics
from emf_spark.tokenizer import tokenize_bytes, with_payload


def _parse(spark, recs: list[dict]):
    rows = []
    for i, rec in enumerate(recs):
        js = json.dumps(rec, separators=(",", ":"))
        rows.append((f"d{i:04d}", tokenize_bytes(js), len(js), "app-a"))
    df = spark.createDataFrame(
        rows, "doc_id string, tokens array<int>, n_tok int, source string"
    )
    return with_parsed_metrics(parse_emf(with_payload(df)))


AWS = {
    "Timestamp": 1,
    "CloudWatchMetrics": [
        {
            "Namespace": "NS",
            "Dimensions": [["D"]],
            "Metrics": [{"Name": "M", "Unit": "Count"}],
        }
    ],
}


def test_p6_min_max_pointer_bug_divergence(spark):
    """Reference: `value.Min == value.Max` compares POINTERS
    (emf/aggregator.go:139) and Min/Max get distinct allocations
    (emf/metric.go:199-206), so the degenerate branch never fires and
    Min==Max-only values are ALWAYS dropped. Intent (and our behavior):
    a Min==Max-by-value record with a Count contributes (Max, Count)."""
    rec = {"_aws": AWS, "M": {"Min": 4.0, "Max": 4.0, "Count": 3}, "D": "x"}
    row = _parse(spark, [rec]).collect()[0]
    m = {m["name"]: m for m in row["metrics"]}
    assert m["M"]["pairs"] == [(4.0, 3)]  # intent; reference drops


def test_a6_merge_noop_bug_divergence(spark):
    """Reference: AWSMetadata.Merge appends to a by-value slice header so
    merged metric definitions are DISCARDED (common/emf.go:30-44), and a
    subset-merge drops the new projection's extra dimension sets
    (common/emf.go:46-79). Intent (and our behavior): per-namespace union
    of dimension sets and metric definitions."""
    rec1 = {
        "_aws": {
            "Timestamp": 1,
            "CloudWatchMetrics": [
                {
                    "Namespace": "NS",
                    "Dimensions": [["D"]],
                    "Metrics": [{"Name": "M1", "Unit": "Count"}],
                }
            ],
        },
        "M1": 1,
        "D": "x",
    }
    rec2 = {
        "_aws": {
            "Timestamp": 70_000,  # second window? no — same group, later ts
            "CloudWatchMetrics": [
                {
                    "Namespace": "NS",
                    "Dimensions": [["D"], ["D", "E"]],
                    "Metrics": [{"Name": "M2", "Unit": "Bytes"}],
                }
            ],
        },
        "M2": 2,
        "D": "x",
    }
    rec2["_aws"]["Timestamp"] = 2  # keep both in one window
    df = spark.createDataFrame(
        [
            (f"d{i}", tokenize_bytes(json.dumps(r, separators=(",", ":"))),
             10, "app-a")
            for i, r in enumerate([rec1, rec2])
        ],
        "doc_id string, tokens array<int>, n_tok int, source string",
    )
    res = pipeline.build_events(spark, df)
    ev = res.events.collect()
    assert len(ev) == 1
    cwm = ev[0]["cw_metrics"]
    assert len(cwm) == 1 and cwm[0]["Namespace"] == "NS"
    # union keeps BOTH metric defs (reference discards M2's def) and
    # BOTH dimension sets (reference would drop ["D","E"])
    assert [list(m) for m in cwm[0]["Metrics"]] == [["M1", "Count"], ["M2", "Bytes"]]
    assert [list(s) for s in cwm[0]["Dimensions"]] == [["D"], ["D", "E"]]


def test_f7_inline_serialization_divergence(spark):
    """Reference: `json:",inline"` is not a real encoding/json option, so
    user fields nest under "OtherFields" (common/emf.go:9-12) — hidden by
    the mock server decoding with the same struct. We emit spec-correct
    flattened EMF: metric + dimension fields at the top level."""
    rec = {"_aws": AWS, "M": 5, "D": "x"}
    df = spark.createDataFrame(
        [("d0", tokenize_bytes(json.dumps(rec)), 10, "app-a")],
        "doc_id string, tokens array<int>, n_tok int, source string",
    )
    obj = json.loads(pipeline.build_events(spark, df).events.collect()[0]["event_json"])
    assert "OtherFields" not in obj
    assert obj["M"] == 5.0 and obj["D"] == "x" and "_aws" in obj


def test_a10_scalar_collapse_quirk_reproduced(spark):
    """Reference quirk REPRODUCED (not a divergence): a single-distinct-
    value metric flushes as the bare scalar stats.Max, silently dropping
    its count (aggregator.go:192-197)."""
    recs = [{"_aws": AWS, "M": 7.5, "D": "x"} for _ in range(3)]
    df = _parse(spark, recs)  # reuse parse path for tokens
    tok = spark.createDataFrame(
        [
            (f"d{i}", tokenize_bytes(json.dumps(r, separators=(",", ":"))),
             10, "app-a")
            for i, r in enumerate(recs)
        ],
        "doc_id string, tokens array<int>, n_tok int, source string",
    )
    obj = json.loads(
        pipeline.build_events(spark, tok).events.collect()[0]["event_json"]
    )
    assert obj["M"] == 7.5  # bare scalar, count 3 dropped — as reference


def test_o3_canonical_ordering_divergence(spark):
    """Reference output order is Go-map nondeterministic even run-to-run
    (histogram/seh.go:53-61, aggregator.go:165). We canonicalize: values
    ascending within a histogram, metrics sorted by name."""
    recs = [
        {"_aws": {**AWS, "CloudWatchMetrics": [
            {"Namespace": "NS", "Dimensions": [["D"]],
             "Metrics": [{"Name": "M", "Unit": "Count"}]}]},
         "M": v, "D": "x"}
        for v in (5.0, 1.0, 3.0)
    ]
    tok = spark.createDataFrame(
        [
            (f"d{i}", tokenize_bytes(json.dumps(r, separators=(",", ":"))),
             10, "app-a")
            for i, r in enumerate(recs)
        ],
        "doc_id string, tokens array<int>, n_tok int, source string",
    )
    ev = pipeline.build_events(spark, tok).events.collect()[0]
    m = ev["metrics"][0]
    assert list(m["values"]) == sorted(m["values"])


def test_namespace_keyed_mode(spark):
    """North-rule keying (namespace, dim_hash, window): a record whose
    projections span two namespaces lands in BOTH namespace groups; the
    reference merges them into one dimHash group (aggregator.go:98)."""
    rec = {
        "_aws": {
            "Timestamp": 1,
            "CloudWatchMetrics": [
                {"Namespace": "NS1", "Dimensions": [["D"]],
                 "Metrics": [{"Name": "M1", "Unit": "Count"}]},
                {"Namespace": "NS2", "Dimensions": [["D"]],
                 "Metrics": [{"Name": "M2", "Unit": "Count"}]},
            ],
        },
        "M1": 1,
        "M2": 2,
        "D": "x",
    }
    tok = spark.createDataFrame(
        [("d0", tokenize_bytes(json.dumps(rec, separators=(",", ":"))), 9, "app-a")],
        "doc_id string, tokens array<int>, n_tok int, source string",
    )
    ref = pipeline.build_events(spark, tok, key_by_namespace=False).events.collect()
    assert len(ref) == 1  # reference-parity: one group per dim_hash

    north = pipeline.build_events(spark, tok, key_by_namespace=True).events.collect()
    by_ns = {e["namespace"]: e for e in north}
    assert set(by_ns) == {"NS1", "NS2"}
    m1 = {m["metric_name"] for m in by_ns["NS1"]["metrics"]}
    m2 = {m["metric_name"] for m in by_ns["NS2"]["metrics"]}
    assert m1 == {"M1"} and m2 == {"M2"}


def test_nan_inf_insert_filter_divergence(spark):
    """Reference: scalar NaN values pass Histogram.Add unchecked
    (histogram.go:28-37 has no NaN guard; only SEH filters, seh.go:65-67)
    and would crash Go's json.Marshal at flush. We filter NaN/Inf at
    insert uniformly — the only serializable interpretation."""
    recs = [
        {"_aws": AWS, "M": "NaN", "D": "x"},
        {"_aws": AWS, "M": 2.0, "D": "x"},
    ]
    tok = spark.createDataFrame(
        [
            (f"d{i}", tokenize_bytes(json.dumps(r, separators=(",", ":"))),
             9, "app-a")
            for i, r in enumerate(recs)
        ],
        "doc_id string, tokens array<int>, n_tok int, source string",
    )
    ev = pipeline.build_events(spark, tok).events.collect()[0]
    m = {m["metric_name"]: m for m in ev["metrics"]}
    assert list(m["M"]["values"]) == [2.0]
    assert m["M"]["count"] == 1


def test_metric_name_json_escaping(spark):
    """F7: metric names are arbitrary user input; quotes/backslashes must
    be JSON-escaped in event_json (the reference escapes via json.Marshal;
    ADVICE r1 found our raw splice produced malformed JSON)."""
    weird = 'M"q\\b'
    rec = {
        "_aws": {
            "Timestamp": 1,
            "CloudWatchMetrics": [
                {
                    "Namespace": "NS",
                    "Dimensions": [["D"]],
                    "Metrics": [{"Name": weird, "Unit": "Count"}],
                }
            ],
        },
        weird: 5,
        "D": "x",
    }
    tok = spark.createDataFrame(
        [("d0", tokenize_bytes(json.dumps(rec, separators=(",", ":"))), 9, "app-a")],
        "doc_id string, tokens array<int>, n_tok int, source string",
    )
    raw = pipeline.build_events(spark, tok).events.collect()[0]["event_json"]
    obj = json.loads(raw)  # malformed JSON raises here pre-fix
    assert obj[weird] == 5.0


def test_partially_valid_projection_still_names_dimensions(spark):
    """Reference accumulates emf.DimensionSet from the Dimensions leg and
    only then skips on a bad/missing Metrics field (metric.go:80-124), so
    a partially-valid projection still turns record keys into dimensions
    (changes dims map and dim_hash). ADVICE r1."""
    rec = {
        "_aws": {
            "Timestamp": 1,
            "CloudWatchMetrics": [
                # valid projection referencing D1
                {"Namespace": "NS", "Dimensions": [["D1"]],
                 "Metrics": [{"Name": "M", "Unit": "Count"}]},
                # Metrics MISSING: dims leg must still register D2
                {"Namespace": "NS2", "Dimensions": [["D2"]]},
                # Metrics non-array: dims leg must still register D3
                {"Namespace": "NS3", "Dimensions": [["D3"]], "Metrics": 5},
                # Dimensions non-array: projection skipped entirely, D4 NOT a dim
                {"Namespace": "NS4", "Dimensions": "D4",
                 "Metrics": [{"Name": "M2", "Unit": "Count"}]},
            ],
        },
        "M": 1.5, "D1": "a", "D2": "b", "D3": "c", "D4": "d",
    }
    row = _parse(spark, [rec]).collect()[0]
    assert sorted(row["dim_names"]) == ["D1", "D2", "D3"]
    assert dict(row["dims"]) == {"D1": "a", "D2": "b", "D3": "c"}
    # only fully-valid projections are emitted as cwm
    assert [p["Namespace"] for p in row["cwm"]] == ["NS"]
    # oracle agrees
    from tests import oracle as orc
    ts, cwm, dims, pairs = orc.parse_record(rec)
    assert dims == {"D1": "a", "D2": "b", "D3": "c"}
    assert [p["Namespace"] for p in cwm] == ["NS"]


def test_timestamp_type_strictness(spark):
    """Reference accepts only Go integer types for Timestamp and rejects
    floats/strings/bools (metric.go:48-65, type switch). Our
    from_json(..., Timestamp:bigint) nulls exactly those (VERDICT r1
    item 7: probed — 1.5, 1738022400000.0, "1738022400000", true all
    parse to null under Spark 4)."""
    mk = lambda ts: {"_aws": {"Timestamp": ts, "CloudWatchMetrics": [
        {"Namespace": "NS", "Dimensions": [["D"]],
         "Metrics": [{"Name": "M", "Unit": "Count"}]}]}, "M": 1, "D": "x"}
    recs = [mk(1738022400000), mk(1.5), mk(1738022400000.0), mk("1738022400000"), mk(True)]
    rows = {}
    for i, rec in enumerate(recs):
        js = json.dumps(rec, separators=(",", ":"))
        rows[i] = (f"d{i}", tokenize_bytes(js), len(js), "app-a")
    df = spark.createDataFrame(
        list(rows.values()), "doc_id string, tokens array<int>, n_tok int, source string"
    )
    out = {r["doc_id"]: (r["valid"], r["error"])
           for r in parse_emf(with_payload(df)).select("doc_id", "valid", "error").collect()}
    assert out["d0"] == (True, None)
    for d in ["d1", "d2", "d3", "d4"]:
        assert out[d] == (False, "no timestamp found in aws data"), (d, out[d])
    # oracle agrees record-by-record
    from tests import oracle as orc
    for i, rec in enumerate(recs):
        try:
            orc.parse_record(rec)
            ok = True
        except ValueError:
            ok = False
        assert ok == out[f"d{i}"][0], i
