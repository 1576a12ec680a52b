"""Seeded structural fuzz: adversarial EMF record shapes through the
engine parse vs the pure-python oracle, one DataFrame pass.

Shapes cover the parser's documented decision table
(emf/metric.go:32-222 + SURVEY.md intent notes): wrong-typed
timestamps, non-array CloudWatchMetrics, skipped projections, non-array
dimension sets, scalar/string/structured metric values, unicode names,
shadowed names, unknown extra keys.
"""

from __future__ import annotations

import json
import math
import random

from emf_spark.operators.parse import parse_emf, split_valid, with_parsed_metrics
from emf_spark.tokenizer import tokenize_bytes, with_payload

from tests import oracle

random.seed(1234)

NAMES = ["Latency", "Größe", "rate:p99", "m.dot", "空間", "a b"]
DIMS = ["Service", "Région", "op name", "Z"]


def _rand_value(rng):
    r = rng.random()
    if r < 0.25:
        return round(rng.uniform(-10, 5000), 3)
    if r < 0.4:
        return rng.randrange(0, 100000)
    if r < 0.5:
        return str(round(rng.uniform(0, 100), 2))  # numeric string
    if r < 0.6:
        return rng.choice(["junk", "NaN", "-Infinity", ""])  # coercions
    if r < 0.8:
        n = rng.randrange(1, 4)
        vals = [round(rng.uniform(0, 100), 2) for _ in range(n)]
        return {
            "Values": vals,
            "Counts": [rng.randrange(1, 5) for _ in range(n)],
            "Min": min(vals),
            "Max": max(vals),
            "Sum": sum(vals),
            "Count": n,
        }
    if r < 0.9:
        return {"Min": 3.0, "Max": 3.0, "Count": 2}  # degenerate (intent keep)
    return {"Min": 1.0, "Max": 2.0}  # invalid -> dropped


def _rand_record(rng) -> dict:
    kind = rng.random()
    if kind < 0.08:  # malformed variants
        return rng.choice(
            [
                {"x": 1},
                {"_aws": 5},
                {"_aws": {"CloudWatchMetrics": []}},
                {"_aws": {"Timestamp": "123", "CloudWatchMetrics": []}},
                {"_aws": {"Timestamp": 1.5, "CloudWatchMetrics": []}},
                {"_aws": {"Timestamp": 5, "CloudWatchMetrics": {"not": "arr"}}},
            ]
        )
    n_proj = rng.randrange(1, 3)
    projections = []
    for _ in range(n_proj):
        if rng.random() < 0.1:
            projections.append({"Namespace": "NS"})  # skipped: no dims/metrics
            continue
        dims_sets = []
        for _ in range(rng.randrange(0, 3)):
            if rng.random() < 0.1:
                dims_sets.append("not-a-list")  # skipped set
            else:
                dims_sets.append(
                    rng.sample(DIMS, rng.randrange(0, len(DIMS)))
                )
        metrics = [
            {"Name": rng.choice(NAMES), "Unit": rng.choice(["Count", "Bytes"])}
            for _ in range(rng.randrange(1, 4))
        ]
        projections.append(
            {
                "Namespace": rng.choice(["NS1", "NS2"]),
                "Dimensions": dims_sets,
                "Metrics": metrics,
            }
        )
    rec = {
        "_aws": {
            "Timestamp": rng.randrange(1_700_000_000_000, 1_700_000_300_000),
            "CloudWatchMetrics": projections,
        }
    }
    for name in set(rng.sample(NAMES, rng.randrange(0, len(NAMES)))):
        rec[name] = _rand_value(rng)
    for d in set(rng.sample(DIMS, rng.randrange(0, len(DIMS)))):
        rec[d] = rng.choice(["a", "b", 42, True])
    rec["ExtraNoise"] = "dropped"
    return rec


def test_fuzz_parse_matches_oracle(spark):
    rng = random.Random(99)
    recs = [_rand_record(rng) for _ in range(300)]
    rows = []
    for i, rec in enumerate(recs):
        js = json.dumps(rec, separators=(",", ":"), ensure_ascii=False)
        rows.append((f"d{i:04d}", tokenize_bytes(js), len(js), "app-a"))
    df = spark.createDataFrame(
        rows, "doc_id string, tokens array<int>, n_tok int, source string"
    )
    parsed = with_parsed_metrics(parse_emf(with_payload(df))).collect()
    by_id = {r["doc_id"]: r for r in parsed}

    n_valid = 0
    for i, rec in enumerate(recs):
        row = by_id[f"d{i:04d}"]
        try:
            ts, cwm, dims, pairs = oracle.parse_record(rec)
            expect_valid = True
        except ValueError:
            expect_valid = False
        assert row["valid"] == expect_valid, (i, rec)
        if not expect_valid:
            continue
        n_valid += 1
        assert row["ts"] == ts, (i, rec)
        # dims: engine stringifies booleans as JSON text ('true'),
        # oracle mirrors via str() -> normalize both for compare
        got_dims = dict(row["dims"])
        norm = lambda d: {
            k: v.lower() if v in ("True", "False") else v for k, v in d.items()
        }
        assert norm(got_dims) == norm(dims), (i, rec)
        assert row["dim_hash"] == oracle.dim_hash(got_dims)
        # metric pair multisets match
        got_pairs = {
            m["name"]: sorted((p["v"], p["c"]) for p in m["pairs"])
            for m in row["metrics"]
        }
        exp_pairs = {k: sorted(v) for k, v in pairs.items()}
        for k in set(exp_pairs) | set(got_pairs):
            g, e = got_pairs.get(k, []), exp_pairs.get(k, [])
            assert len(g) == len(e), (i, k, g, e)
            for (gv, gc), (ev, ec) in zip(g, e):
                assert gc == ec and math.isclose(gv, ev, rel_tol=1e-12), (i, k)
        # projection metadata
        got_cwm = [
            {
                "Namespace": p["Namespace"],
                "Dimensions": [list(s) for s in p["Dimensions"]],
                "Metrics": [
                    {"Name": m["Name"], "Unit": m["Unit"]} for m in p["Metrics"]
                ],
            }
            for p in row["cwm"]
        ]
        assert got_cwm == cwm, (i, rec)
    assert n_valid > 150  # the mix is mostly valid records
