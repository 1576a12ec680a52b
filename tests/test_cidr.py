"""CIDR longest-prefix-match enrichment (operators/cidr.py).

Brute-force parity: a nested/duplicated/host-bit-dirty block fixture
against a pure-Python routing-table LPM over every probe address,
including block boundaries, gaps between siblings, NULL, and the
extremes of the address space.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row, functions as F

from emf_spark.operators.cidr import cidr_enrich, flatten_cidrs

# (net, prefix_len, name) — deliberately laminar-but-deep:
#   10.0.0.0/8 ⊃ 10.1.0.0/16 ⊃ 10.1.32.0/20 ⊃ 10.1.32.0/24
# plus a sibling /16, a block given with HOST BITS SET (canonicalizes
# to 10.2.0.0/16), an exact duplicate block with a different attr (the
# deterministic max-attr tie), and a detached /30 island.
def _ip(a, b, c, d):
    return (a << 24) | (b << 16) | (c << 8) | d


BLOCKS = [
    (_ip(10, 0, 0, 0), 8, "ten-eight"),
    (_ip(10, 1, 0, 0), 16, "ten-one"),
    (_ip(10, 1, 32, 0), 20, "ten-one-32-20"),
    (_ip(10, 1, 32, 0), 24, "ten-one-32-24"),
    (_ip(10, 3, 0, 0), 16, "ten-three"),
    (_ip(10, 2, 7, 9), 16, "ten-two-dirty"),  # host bits set
    (_ip(10, 3, 0, 0), 16, "ten-three-dup"),  # duplicate block, attr tie
    (_ip(192, 168, 5, 4), 30, "island-30"),
]


def _brute_lpm(ip):
    best = None
    for net, p, name in BLOCKS:
        size = 1 << (32 - p)
        lo = net - net % size
        if lo <= ip <= lo + size - 1:
            key = (p, lo, name)
            if best is None or key > best:
                best = key
    return (best[2], best[0]) if best else (None, None)


def _cidr_df(spark):
    return spark.createDataFrame(
        [Row(net=n, prefix_len=p, block_name=s) for n, p, s in BLOCKS]
    )


PROBES = [
    _ip(10, 1, 32, 0),        # /24 lo boundary — deepest wins
    _ip(10, 1, 32, 255),      # /24 hi boundary
    _ip(10, 1, 32, 256) - 1,  # same, spelled as arithmetic
    _ip(10, 1, 33, 0),        # inside /20 but past the /24
    _ip(10, 1, 47, 255),      # /20 hi boundary
    _ip(10, 1, 48, 0),        # just past the /20 — falls to /16
    _ip(10, 1, 200, 9),       # /16 body
    _ip(10, 0, 0, 0),         # /8 lo boundary
    _ip(10, 255, 255, 255),   # /8 hi boundary
    _ip(10, 2, 0, 0),         # canonicalized dirty block lo
    _ip(10, 2, 255, 255),     # canonicalized dirty block hi
    _ip(10, 3, 4, 4),         # duplicate blocks — attr tie
    _ip(11, 0, 0, 0),         # just past the /8 — no match
    _ip(9, 255, 255, 255),    # just before the /8 — no match
    _ip(192, 168, 5, 4),      # /30 island lo
    _ip(192, 168, 5, 7),      # /30 island hi
    _ip(192, 168, 5, 8),      # past the island
    0,                        # address-space floor
    (1 << 32) - 1,            # address-space ceiling
]


def test_lpm_matches_bruteforce(spark):
    facts = spark.createDataFrame(
        [Row(rid=i, ip=ip) for i, ip in enumerate(PROBES)]
    )
    got = {
        r["rid"]: (r["block_name"], r["matched_prefix_len"])
        for r in cidr_enrich(facts, _cidr_df(spark)).collect()
    }
    assert len(got) == len(PROBES)  # left semantics: no row lost, none duped
    for i, ip in enumerate(PROBES):
        name, p = _brute_lpm(ip)
        assert got[i] == (name, p), (i, ip, got[i], (name, p))


def test_null_ip_and_empty_blocks(spark):
    facts = spark.createDataFrame(
        [Row(rid=0, ip=None), Row(rid=1, ip=_ip(10, 1, 1, 1))]
    )
    out = {r["rid"]: r["block_name"] for r in cidr_enrich(facts, _cidr_df(spark)).collect()}
    assert out[0] is None and out[1] == "ten-one"

    empty = spark.createDataFrame([], "net long, prefix_len int, block_name string")
    rows = cidr_enrich(facts, empty).collect()
    assert sorted((r["rid"], r["block_name"]) for r in rows) == [(0, None), (1, None)]


def test_duplicate_block_tie_is_deterministic(spark):
    facts = spark.createDataFrame([Row(rid=0, ip=_ip(10, 3, 9, 9))])
    r = cidr_enrich(facts, _cidr_df(spark)).collect()[0]
    # max(struct(..., attrs)) — 'ten-three-dup' > 'ten-three'
    assert r["block_name"] == "ten-three-dup"


def test_flatten_is_disjoint_and_covers_exactly(spark):
    flat = flatten_cidrs(_cidr_df(spark)).collect()
    ivs = sorted((r["_cidr_lo"], r["_cidr_hi"]) for r in flat)
    for (al, ah), (bl, bh) in zip(ivs, ivs[1:]):
        assert ah < bl, "intervals overlap"
    covered = sum(h - l + 1 for l, h in ivs)
    # union of blocks = the /8 (all 10.x nest inside it) + the /30
    assert covered == (1 << 24) + 4
    # winner attribution: each interval's name equals brute LPM at its lo
    for r in flat:
        assert r["block_name"] == _brute_lpm(r["_cidr_lo"])[0]


def test_guards(spark):
    facts = spark.createDataFrame([Row(rid=0, ip=1 << 32)])
    with pytest.raises(Exception, match="ip out of"):
        cidr_enrich(facts, _cidr_df(spark)).collect()

    bad = spark.createDataFrame([Row(net=0, prefix_len=33, block_name="x")])
    with pytest.raises(Exception, match="prefix_len out of"):
        cidr_enrich(spark.createDataFrame([Row(rid=0, ip=5)]), bad).collect()

    clash = spark.createDataFrame([Row(net=0, prefix_len=8, rid="x")])
    with pytest.raises(ValueError, match="collide"):
        cidr_enrich(spark.createDataFrame([Row(rid=0, ip=5)]), clash)


def test_fact_side_plan_is_single_broadcast_join(spark):
    facts = spark.createDataFrame([Row(rid=0, ip=_ip(10, 1, 1, 1))])
    plan = cidr_enrich(facts, _cidr_df(spark))._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftOuter" in plan
    for bad in ("SortMergeJoin", "CartesianProduct", "BroadcastNestedLoopJoin"):
        assert bad not in plan, bad
