"""Physical-plan regression tests (SURVEY.md §4): the plans that make
the pipeline scale must stay that way — broadcast enrichment, bounded
shuffle count in the histogram aggregation, Arrow (not row-at-a-time)
Python, and column pruning through the staged checkpoint."""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from emf_spark import fixtures, pipeline
from emf_spark.operators import aggregate as agg, enrich as enrich_op, parse as parse_op
from emf_spark.tokenizer import with_payload


def plan_of(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


@pytest.fixture(scope="module")
def parsed(spark, corpus_path):
    df = spark.read.parquet(corpus_path)
    valid, _ = parse_op.split_valid(parse_op.parse_emf(with_payload(df)))
    return agg.with_window(
        enrich_op.enrich(valid, fixtures.lookup_df(spark)), 60_000
    )


def test_enrich_is_broadcast_join(parsed):
    plan = plan_of(parsed)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_detokenize_is_arrow_batched(parsed):
    plan = plan_of(parsed)
    assert "ArrowEvalPython" in plan  # vectorized, not BatchEvalPython
    assert "BatchEvalPython" not in plan


def test_observation_explode_has_no_shuffle(parsed):
    obs = agg.explode_observations(parsed.drop("tokens", "payload"))
    plan = plan_of(obs, "simple")
    # narrow fan-out: no shuffle (the broadcast exchange from the
    # upstream enrich join is not a shuffle)
    assert "Exchange hashpartitioning" not in plan


def test_histogram_agg_shuffle_count(parsed):
    """Exactly two exchanges: (keys+value) partial/final agg, then the
    window-function repartition on the group keys. Everything after
    reuses that partitioning (subset-key clustering)."""
    obs = agg.explode_observations(parsed.drop("tokens", "payload"))
    hist = agg.aggregate_histograms(obs)
    plan = plan_of(hist, "simple")
    n_exchanges = plan.count("Exchange hashpartitioning")
    assert n_exchanges == 2, plan[:2000]


def test_staged_scan_prunes_columns(spark, corpus_path, tmp_path):
    """The events path must never read tokens back from the staged
    checkpoint (ReadSchema excludes them by construction), and the
    validity filter must push down to the parquet scan."""
    out = str(tmp_path / "plans_out")
    pipeline.run(spark, corpus_path, out, write_routed=False)
    staged = spark.read.parquet(f"{out}/staged")
    assert "tokens" not in staged.columns  # never staged at all
    q = staged.filter(F.col("valid")).select("dim_hash", "metric_raw")
    plan = plan_of(q)
    assert "PushedFilters: [IsNotNull(valid), EqualTo(valid,true)]" in plan or (
        "valid" in plan.split("PushedFilters")[1].split("]")[0]
    )
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "dims" not in read_schema and "cwm" not in read_schema


def test_partial_aggregation_before_shuffle(parsed):
    """Map-side combine (the reference's in-memory map equivalent): the
    value-count groupBy must show a partial HashAggregate below the
    exchange."""
    obs = agg.explode_observations(parsed.drop("tokens", "payload"))
    keys = agg.group_keys(obs) + ["metric_name", "v"]
    p1 = obs.groupBy(*keys).agg(F.sum("c").alias("c"))
    plan = plan_of(p1, "simple")
    # partial_sum appears below the exchange, final above
    assert plan.count("HashAggregate") >= 2
    assert "partial_sum" in plan


def test_minhash_signatures_single_shuffle(spark):
    """shingle_hash_rows windows by id and the signature groupBy reuses
    that partitioning: exactly ONE hash exchange end to end."""
    from emf_spark.datax import dedup

    df = spark.createDataFrame(
        [(i, f"w{i} w{i+1} w{i+2} w{i+3}") for i in range(20)],
        "doc_id bigint, text string",
    )
    sigs = dedup.minhash_signatures(df, num_perm=8)
    plan = plan_of(sigs, "simple")
    assert plan.count("Exchange hashpartitioning") == 1, plan[:2000]


def test_datax_pair_joins_never_cartesian(spark):
    """No pair-generating path may plan a cartesian/nested-loop join."""
    from emf_spark.datax import dedup, similarity

    docs = spark.createDataFrame(
        [(i, f"some text number {i} with words") for i in range(10)],
        "doc_id bigint, text string",
    )
    vecs = spark.createDataFrame(
        [(i, [float(i), 1.0, 2.0, 3.0]) for i in range(10)],
        "vec_id bigint, embedding array<float>",
    )
    plans = [
        plan_of(dedup.minhash_near_duplicates(docs, num_perm=8, bands=4), "simple"),
        plan_of(dedup.simhash_near_duplicates(docs), "simple"),
        plan_of(
            similarity.embedding_near_duplicates(vecs, dim=4, threshold=0.5),
            "simple",
        ),
        plan_of(similarity.pairwise_topk_per_row(vecs, k=2, n_planes=3), "simple"),
        plan_of(dedup.jaccard_threshold_pairs(docs, threshold=0.6), "simple"),
        plan_of(dedup.containment_pairs(docs, threshold=0.7), "simple"),
    ]
    for p in plans:
        assert "CartesianProduct" not in p, p[:1500]
        assert "BroadcastNestedLoopJoin" not in p, p[:1500]


def test_lsh_bucketed_probe_is_partition_pruned(spark, tmp_path):
    """materialize_buckets + lsh_topk(bucketed_path=...): the probe scan
    must carry a non-empty PartitionFilters on _bucket (planning-time
    pruning) and read only the hamming-ball partitions — and return the
    exact same rows as the on-the-fly bucket path."""
    import numpy as np

    from emf_spark.datax import similarity

    rng = np.random.default_rng(3)
    vecs = [(i, [float(x) for x in rng.standard_normal(8)]) for i in range(200)]
    df = spark.createDataFrame(vecs, "vec_id bigint, embedding array<float>")
    path = str(tmp_path / "buckets")
    qvec = vecs[0][1]
    corpus = df.filter(F.col("vec_id") != 0)
    similarity.materialize_buckets(corpus, path, n_planes=4, seed=7)
    got = similarity.lsh_topk(
        corpus, qvec, k=5, n_planes=4, seed=7, probe_hamming=1,
        bucketed_path=path,
    )
    plan = plan_of(got)
    scan = plan[plan.index("PartitionFilters"):]
    head = scan[: scan.index("\n")]
    assert "_bucket" in head and "PartitionFilters: []" not in head, head
    # pruned probe == on-the-fly probe, row for row
    flying = similarity.lsh_topk(
        corpus, qvec, k=5, n_planes=4, seed=7, probe_hamming=1
    )
    assert [tuple(r) for r in got.collect()] == [tuple(r) for r in flying.collect()]


def test_bucketed_join_is_shuffle_free(spark, tmp_path):
    """Two tables bucketed on the join key: the join plan must contain
    NO Exchange (the storage layout carries the partitioning), and a
    groupBy on the bucket key must also be exchange-free."""
    from emf_spark.operators import storage

    a = spark.range(0, 1000).selectExpr("id AS k", "id * 2 AS va")
    b = spark.range(0, 1000).selectExpr("id AS k", "id * 3 AS vb")
    storage.write_bucketed(a, "bj_a", ["k"], buckets=8)
    storage.write_bucketed(b, "bj_b", ["k"], buckets=8)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    # disable broadcast so the planner actually exercises the bucketed
    # layout (at real scale neither side fits a broadcast)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        ta, tb = storage.read_table(spark, "bj_a"), storage.read_table(spark, "bj_b")
        joined = ta.join(tb, "k")
        plan = plan_of(joined, "simple")
        assert "Exchange" not in plan, plan[:2000]
        assert "Bucketed: true" in plan, plan[:2000]
        assert joined.count() == 1000
        aggp = plan_of(ta.groupBy("k").count(), "simple")
        assert "Exchange" not in aggp, aggp[:2000]
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS bj_a")
        spark.sql("DROP TABLE IF EXISTS bj_b")


def test_write_table_seam_probes_and_falls_back(spark):
    """operators/storage.write_table: no Iceberg catalog in this
    sandbox, so the probe must return None and the write must land as
    a partitioned parquet managed table readable via spark.table; a
    catalog CONFIGURED but with an unloadable class must also fail the
    probe (config alone is not capability)."""
    import pytest

    from emf_spark.operators import storage

    assert storage.iceberg_catalog(spark) is None
    df = spark.range(20).selectExpr("id", "id % 3 AS p")
    try:
        path = storage.write_table(df, "wt_demo", partition_cols=["p"])
        assert path == "parquet"
        got = spark.table("wt_demo")
        assert got.count() == 20
        # the partition column survives as a real partition (pruned scan)
        plan = plan_of(got.filter("p = 1"), "simple")
        assert "PartitionFilters: [isnotnull(p#" in plan or "p)" in plan
        # append mode goes through the same seam
        assert storage.write_table(df, "wt_demo", partition_cols=["p"],
                                   mode="append") == "parquet"
        assert spark.table("wt_demo").count() == 40
        with pytest.raises(ValueError, match="overwrite/append"):
            storage.write_table(df, "wt_demo", mode="ignore")
    finally:
        spark.sql("DROP TABLE IF EXISTS wt_demo")
    # probe rejects a configured-but-unloadable catalog class: simulate
    # by checking the class-load guard directly (conf is immutable on a
    # live session, so exercise the loop's contract on the JVM check)
    with pytest.raises(Exception):
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog")


def test_tpch_join_queries_push_filters_and_broadcast_dims(spark):
    """Q3/Q5 shapes: date/segment predicates must reach the parquet
    scans (PushedFilters) and the dimension sides must broadcast (no
    cartesian, no nested-loop)."""
    from emf_spark import driver_queries as dq

    SF = "/root/testdata/sf0.001"
    for name in ("tpch_shipping_priority", "tpch_local_supplier_volume"):
        p = plan_of(dq.QUERIES[name](spark, SF))
        assert "BroadcastHashJoin" in p
        assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p
        assert "LessThan(o_orderdate" in p or "LessThanOrEqual(o_orderdate" in p, name


def test_zorder_key_is_morton_order(spark):
    """2-bit 2D Z-curve must visit the canonical Morton sequence."""
    from emf_spark.operators import storage

    rows = [(x, y) for y in range(4) for x in range(4)]
    df = spark.createDataFrame(rows, "x bigint, y bigint")
    got = [
        (r["x"], r["y"])
        for r in df.withColumn("z", storage.zorder_key(["x", "y"], bits=2))
        .orderBy("z").collect()
    ]
    morton = sorted(rows, key=lambda p: sum(
        (((p[0] >> b) & 1) << (2 * b)) | (((p[1] >> b) & 1) << (2 * b + 1))
        for b in range(2)
    ))
    assert got == morton
    # first steps of the classic Z curve
    assert got[:4] == [(0, 0), (1, 0), (0, 1), (1, 1)]


def test_write_zordered_roundtrip_and_locality(spark, tmp_path):
    import itertools

    from emf_spark.operators import storage

    rows = [(x, y, x * 100 + y) for x, y in itertools.product(range(32), range(32))]
    df = spark.createDataFrame(rows, "x bigint, y bigint, v bigint")
    path = str(tmp_path / "zz")
    storage.write_zordered(df, path, ["x", "y"], bits=5, partitions=4)
    back = spark.read.parquet(path)
    assert back.count() == 1024
    got = {
        (r["x"], r["y"])
        for r in back.filter(
            (F.col("x").between(4, 7)) & (F.col("y").between(4, 7))
        ).collect()
    }
    assert got == {(x, y) for x in range(4, 8) for y in range(4, 8)}


def test_zorder_key_width_guard(spark):
    import pytest

    from emf_spark.operators import storage

    with pytest.raises(ValueError, match="<= 63"):
        storage.zorder_key(["a", "b", "c", "d"], bits=16)


def test_pii_scrub_is_map_only(spark):
    """The scrubber must stay a pure narrow map over the scan: no
    Exchange, no Python eval — regexes inside whole-stage codegen."""
    from emf_spark.datax.pii import pii_scrub

    df = spark.createDataFrame([("a@b.co x",)], ["text"])
    p = plan_of(pii_scrub(df), "simple")
    assert "Exchange" not in p
    assert "Python" not in p


def test_vocab_topk_windows_after_aggregation(spark):
    """The single-partition rank window must sit ABOVE the token-count
    aggregate (vocab cardinality), never over the raw exploded tokens
    (corpus cardinality)."""
    from emf_spark.datax.textstats import vocab_topk

    df = spark.createDataFrame([("a b c",)], ["text"])
    p = plan_of(vocab_topk(df), "formatted")
    assert p.index("Window") < p.index("HashAggregate")  # formatted prints top-down


def test_percentiles_hist_windows_above_histogram(spark):
    """The histogram-path percentile's cumulative/rank windows must sit
    ABOVE the (group, value)->count aggregate — the plan never sorts
    raw rows per group, only histogram rows (distinct-value
    cardinality)."""
    from emf_spark import driver_queries as dq

    p = plan_of(dq.QUERIES["emf_percentiles_hist"](spark, "/root/testdata/sf0.001"))
    # formatted prints top-down: the deepest (first-executed) node is
    # printed last — the histogram HashAggregate must appear BELOW
    # (after, in print order) every Window
    assert "Window" in p and "HashAggregate" in p
    assert p.rindex("HashAggregate") > p.rindex("Window")


def test_tpch_forecast_revenue_pushes_all_predicates(spark):
    """Q6 is the pushdown poster child: shipdate range AND quantity
    bound must reach the parquet scan, and the scan must not read
    columns beyond the 4 used."""
    from emf_spark import driver_queries as dq

    p = plan_of(dq.QUERIES["tpch_forecast_revenue"](spark, "/root/testdata/sf0.001"))
    assert "GreaterThanOrEqual(l_shipdate" in p
    assert "LessThan(l_quantity,24.0)" in p.replace(" ", "")
    import re

    read = re.search(r"ReadSchema: struct<([^>]*)>", p).group(1)
    cols = {c.split(":")[0] for c in read.split(",")}
    assert cols == {"l_shipdate", "l_quantity", "l_extendedprice", "l_discount"}


def test_tpch_order_priority_is_semi_join(spark):
    from emf_spark import driver_queries as dq

    p = plan_of(dq.QUERIES["tpch_order_priority_check"](spark, "/root/testdata/sf0.001"))
    assert "LeftSemi" in p
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p


def test_tpch_disjunctive_predicate_stays_equi_join(spark):
    """Q19 shape: the OR-of-ANDs must ride as a post-join filter on the
    partkey equi-join (BroadcastHashJoin), never force a nested loop."""
    from emf_spark import driver_queries as dq

    p = plan_of(dq.QUERIES["tpch_discounted_revenue"](spark, "/root/testdata/sf0.001"))
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p


def test_funnel_and_new_tpch_shapes_never_nested_loop(spark):
    """Funnel steps and the Q2/Q7/Q13/Q18 shapes must stay equi-joins;
    anti/left joins must not degrade to nested loops."""
    from emf_spark import driver_queries as dq

    SF = "/root/testdata/sf0.001"
    for name in (
        "events_funnel",
        "tpch_order_distribution",
        "tpch_large_volume_customer",
        "tpch_min_cost_supplier",
        "tpch_volume_shipping",
        "tpch_waiting_suppliers",
        "text_lm_fluency",
        # round-4 shapes: Q17 decorrelated avg, Q20 nested semi,
        # Q8 share, Q15 max-equality, Q16 NOT IN, Q9 5-way, CUBE
        "tpch_small_qty_revenue",
        "tpch_potential_promotion",
        "tpch_market_share",
        "tpch_top_supplier",
        "tpch_supplier_relationship",
        "tpch_product_profit",
        "tpch_cube_revenue",
    ):
        p = plan_of(dq.QUERIES[name](spark, SF))
        assert "CartesianProduct" not in p, name
        assert "BroadcastNestedLoopJoin" not in p, name


def test_kmv_global_two_phase_window(spark):
    """Ungrouped KMV must NOT funnel the full distinct-hash stream
    through one window partition (VERDICT r3): phase 1's rank window is
    partitioned by the (hash % 64) bucket — a parallel exchange — and
    only the bounded <= 64*k survivors reach the final global rank."""
    from emf_spark.datax import sketches

    ev = spark.range(0, 10_000).select(
        (F.col("id") % 997).cast("string").alias("v")
    )
    p = plan_of(sketches.kmv_distinct(ev, "v", None, k=64))
    # phase-1 exchange on the bucket column (parallel rank)
    assert "hashpartitioning(_b" in p
    # the final global rank is over <= 64*k survivors; Catalyst further
    # rewrites row_number<=k over that bounded frame into
    # TakeOrderedAndProject (per-partition top-k + merge) — either that
    # or a narrow SinglePartition window is acceptable, a full-stream
    # global sort is not
    assert "TakeOrderedAndProject" in p or "SinglePartition" in p
    # grouped mode keeps its one group-partitioned window (no change)
    g = plan_of(sketches.kmv_distinct(
        spark.range(0, 1000).select(
            (F.col("id") % 3).cast("string").alias("grp"),
            (F.col("id") % 97).cast("string").alias("v"),
        ),
        "v", ["grp"], k=8,
    ))
    assert "hashpartitioning(grp" in g and "hashpartitioning(_b" not in g


def test_scalar_broadcast_queries_have_one_row_build_side(spark):
    """Q11/Q22's only nested-loop is the sanctioned scalar shape: the
    build side is a single global aggregate row (no grouping keys), so
    the 'nested loop' is a constant broadcast, not a pair generator."""
    from emf_spark import driver_queries as dq

    SF = "/root/testdata/sf0.001"
    for name in (
        "tpch_important_parts",
        "tpch_global_sales_opportunity",
        "text_keywords",
        "data_drift",
    ):
        p = plan_of(dq.QUERIES[name](spark, SF))
        assert "CartesianProduct" not in p, name
        # every aggregate feeding the BNLJ build side must be global
        # (grouping-key-free): its partial/final pair appears with
        # empty grouping "keys=[]"
        if "BroadcastNestedLoopJoin" in p:
            assert "Keys: []" in p or "keys=[]" in p, name


def test_collocations_plan_posture(spark):
    """collocations' pairing is an EQUI-join on (doc, position) — the
    only nested-loop in the plan is the sanctioned 1-row corpus-total
    broadcast (global aggregate build side), never a pair generator."""
    from emf_spark import driver_queries as dq

    p = plan_of(dq.QUERIES["text_collocations"](spark, "/root/testdata/sf0.001"))
    assert "CartesianProduct" not in p
    if "BroadcastNestedLoopJoin" in p:
        assert "Keys: []" in p or "keys=[]" in p, p[:1500]
    # the (doc, pos) pairing itself must be a hash/sort-merge equi-join
    assert "SortMergeJoin" in p or "BroadcastHashJoin" in p or (
        "ShuffledHashJoin" in p)


def test_fourth_session_queries_plan_posture(spark):
    """The session's additions keep the repo's plan rules: no nested
    loops/cartesians anywhere; line_dedup and SNM never globally sort
    (no rangepartitioning Exchange — their orderings come from keyed
    windows / value-range bucketing); apply_changes carries exactly
    one full-outer shuffle join; quality checks stay a single
    aggregate over one scan."""
    from emf_spark import driver_queries as dq

    SF = "/root/testdata/sf0.001"
    for name in (
        "dedup_line_boilerplate",
        "dedup_semantic",
        "data_quality_checks",
        "data_apply_changes",
        "entity_snm_pairs",
    ):
        p = plan_of(dq.QUERIES[name](spark, SF))
        assert "CartesianProduct" not in p, name
        assert "BroadcastNestedLoopJoin" not in p, name

    p = plan_of(dq.QUERIES["dedup_line_boilerplate"](spark, SF))
    assert "rangepartitioning" not in p.lower(), p[:1500]
    p = plan_of(dq.QUERIES["entity_snm_pairs"](spark, SF))
    assert "rangepartitioning" not in p.lower(), p[:1500]
    # optimized logical plan: nodes appear once (formatted physical
    # plans repeat each node in the details section)
    lp = (dq.QUERIES["data_apply_changes"](spark, SF)
          ._jdf.queryExecution().optimizedPlan().toString())
    assert lp.count("Join FullOuter") == 1, lp[:2000]
    # one scan only: the suite compiles to a single aggregate pass
    lp = (dq.QUERIES["data_quality_checks"](spark, SF)
          ._jdf.queryExecution().optimizedPlan().toString())
    assert lp.count("Relation [") == 1, lp[:2000]


def test_unique_key_join_guards_fanout(spark):
    import pytest
    from pyspark.sql import functions as F

    from emf_spark.operators.enrich import unique_key_join

    facts = spark.createDataFrame(
        [(i, "s%d" % (i % 3)) for i in range(30)], "id bigint, source string"
    )
    dim = spark.createDataFrame(
        [("s0", "a"), ("s1", "b"), ("s2", "c")], "source string, sink string"
    )
    out = unique_key_join(facts, dim, "source")
    assert out.count() == 30
    # equals the plain join when the dim is clean
    plain = facts.join(dim, "source", "left")
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, plain.collect()))

    dup = dim.unionByName(spark.createDataFrame(
        [("s1", "ROGUE")], "source string, sink string"))
    with pytest.raises(Exception, match="duplicate right-side key"):
        unique_key_join(facts, dup, "source").count()
    # and the guard survives aggressive pruning: a query touching only
    # fact columns must STILL fail (the raise_error rides the join key)
    with pytest.raises(Exception, match="duplicate right-side key"):
        unique_key_join(facts, dup, "source").select(F.sum("id")).collect()

    # NULL right-side keys never match the equi-join, so >=2 of them is
    # NOT a fan-out — must not raise (ADVICE r4, low)
    dim_nulls = dim.unionByName(spark.createDataFrame(
        [(None, "x"), (None, "y")], "source string, sink string"))
    out_n = unique_key_join(facts, dim_nulls, "source")
    assert out_n.count() == 30
    plain_n = facts.join(dim_nulls, "source", "left")
    assert sorted(map(tuple, out_n.collect())) == \
        sorted(map(tuple, plain_n.collect()))
    # a real duplicate alongside the NULLs still fails loudly
    with pytest.raises(Exception, match="duplicate right-side key"):
        unique_key_join(facts, dim_nulls.unionByName(spark.createDataFrame(
            [("s2", "ROGUE")], "source string, sink string")), "source").count()
