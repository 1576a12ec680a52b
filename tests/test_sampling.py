"""datax.sampling: deterministic splits, stratified keep, packing."""

from __future__ import annotations

from pyspark.sql import functions as F

from emf_spark.datax import sampling


def _docs(spark, n=400):
    rows = [(i, ["en", "es", "de", "fr"][i % 4], 50 + (i * 37) % 300) for i in range(n)]
    return spark.createDataFrame(rows, "doc_id bigint, lang string, n_chars int")


def test_hash_split_deterministic_and_calibrated(spark):
    d = _docs(spark, 2000)
    a = {r["doc_id"]: r["split"] for r in sampling.hash_split(d).collect()}
    b = {r["doc_id"]: r["split"] for r in sampling.hash_split(d).collect()}
    assert a == b  # no RNG state
    from collections import Counter

    c = Counter(a.values())
    assert 0.06 < c["val"] / 2000 < 0.14
    assert 0.06 < c["test"] / 2000 < 0.14
    # different salt -> different assignment
    s2 = {r["doc_id"]: r["split"] for r in sampling.hash_split(d, salt="other").collect()}
    assert s2 != a


def test_stratified_fractions(spark):
    d = _docs(spark, 2000)
    kept = sampling.stratified_fractions(d, {"es": 0.5, "de": 0.1})
    counts = {
        r["lang"]: r["n"]
        for r in kept.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert counts["en"] == 500 and counts["fr"] == 500  # untouched strata
    assert 200 <= counts["es"] <= 300  # ~0.5 of 500
    assert 25 <= counts["de"] <= 80  # ~0.1 of 500
    # idempotent: same rows kept on re-run
    again = sampling.stratified_fractions(d, {"es": 0.5, "de": 0.1})
    assert kept.exceptAll(again).count() == 0


def test_pack_sequences_invariants(spark):
    d = _docs(spark, 1000).union(
        # genuine oversize rows (the base fixture tops out at 349 chars)
        _docs(spark, 1000).limit(5).select(
            (F.col("doc_id") + 10_000).alias("doc_id"), "lang",
            (F.col("n_chars") + 600).alias("n_chars"),
        )
    )
    packed = sampling.pack_sequences(
        d, max_tokens=1000, tokens_col="n_chars", order_cols=["doc_id"],
        group_col="lang", max_seq_tokens=500,
    )
    stats = (
        packed.filter(F.col("pack_id") >= 0)
        .groupBy("lang", "pack_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("n_chars").alias("toks"))
        .collect()
    )
    assert stats
    for r in stats:
        assert r["toks"] <= 1000, r
    # every non-oversize sequence assigned; oversize flagged -1
    assert packed.filter(F.col("pack_id").isNull()).count() == 0
    over = packed.filter(F.col("n_chars") > 500)
    assert over.count() == over.filter(F.col("pack_id") == -1).count()


def test_pack_sequences_max_seqs_cap(spark):
    d = spark.createDataFrame(
        [(i, "en", 1) for i in range(100)], "doc_id bigint, lang string, n_chars int"
    )
    packed = sampling.pack_sequences(
        d, max_tokens=10_000, tokens_col="n_chars", order_cols=["doc_id"],
        group_col="lang", max_seqs=10, max_seq_tokens=100,
    )
    sizes = [
        r["n"]
        for r in packed.groupBy("pack_id").agg(F.count(F.lit(1)).alias("n")).collect()
    ]
    assert max(sizes) <= 10 and sum(sizes) == 100


def test_balanced_sample_caps_heads_keeps_tails(spark):
    from emf_spark.datax.sampling import balanced_sample

    rows = [(i, "head") for i in range(100)] + [(1000 + i, "tail") for i in range(3)]
    df = spark.createDataFrame(rows, ["doc_id", "cls"])
    got = balanced_sample(df, "cls", 10, salt="t").groupBy("cls").count().collect()
    counts = {r["cls"]: r["count"] for r in got}
    assert counts == {"head": 10, "tail": 3}
    # partition-layout independence: same rows whatever the input split
    a = {r["doc_id"] for r in balanced_sample(df.repartition(13), "cls", 10, salt="t").collect()}
    b = {r["doc_id"] for r in balanced_sample(df.coalesce(1), "cls", 10, salt="t").collect()}
    assert a == b and len(a) == 13


def test_balanced_sample_est_counts_gate_row_identical(spark):
    """The head-class hash-gate (VERDICT r3 item 5) must produce output
    row-identical to the plain exact-rank path — with accurate,
    over-, and under-estimated class counts — and must appear in the
    plan as a pre-window filter."""
    from emf_spark.datax.sampling import balanced_sample

    rows = (
        [(i, "head") for i in range(5000)]
        + [(100_000 + i, "mid") for i in range(60)]
        + [(200_000 + i, "tail") for i in range(3)]
    )
    df = spark.createDataFrame(rows, ["doc_id", "cls"])
    plain = sorted(
        (r["doc_id"], r["cls"])
        for r in balanced_sample(df, "cls", 10, salt="g").collect()
    )
    for est in (
        {"head": 5000, "mid": 60},          # accurate
        {"head": 10_000},                   # 2x over-estimate (contract edge)
        {"head": 2000, "tail": 2},          # under-estimate + tiny class
    ):
        gated = sorted(
            (r["doc_id"], r["cls"])
            for r in balanced_sample(
                df, "cls", 10, salt="g", est_counts=est
            ).collect()
        )
        assert gated == plain, est
    # the gate is in the plan: pre-window Filter carrying the 4n/est
    # threshold (4*10/5000 = 0.008) on the hash fraction
    gp = balanced_sample(
        df, "cls", 10, salt="g", est_counts={"head": 5000}
    )._jdf.queryExecution().executedPlan().toString()
    assert "0.008" in gp
    # classes under the 4n threshold never gate (no filter planned)
    np_ = balanced_sample(
        df, "cls", 10, salt="g", est_counts={"tail": 3}
    )._jdf.queryExecution().executedPlan().toString()
    assert "0.008" not in np_ and "13.3" not in np_


def test_balanced_sample_gate_keeps_null_class_rows(spark):
    """Gate predicate must be NULL-safe: rows whose class is NULL are
    their own window partition in the plain path and must survive the
    est_counts pre-filter identically (review finding: ~NULL filter
    silently dropped them)."""
    from emf_spark.datax.sampling import balanced_sample

    rows = [(i, "head") for i in range(300)] + [
        (10_000 + i, None) for i in range(5)
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, cls string")
    plain = sorted(
        (r["doc_id"], r["cls"])
        for r in balanced_sample(df, "cls", 10, salt="n").collect()
    )
    gated = sorted(
        (r["doc_id"], r["cls"])
        for r in balanced_sample(
            df, "cls", 10, salt="n", est_counts={"head": 300}
        ).collect()
    )
    assert gated == plain
    assert sum(1 for _, c in gated if c is None) == 5


def test_tail_sample_keeps_whole_interesting_traces(spark):
    """A trace with ANY error keeps ALL its rows tagged 'interesting';
    base_rate=0 keeps nothing else; NULL aggregate verdicts (all-NULL
    latency) count as not-interesting; NULL trace keys still group."""
    from pyspark.sql import functions as F

    from emf_spark.datax.sampling import tail_sample

    rows = [
        (1, 10, "ok", 1.0),
        (2, 10, "error", 2.0),   # trace 10: interesting via error
        (3, 20, "ok", 150.0),    # trace 20: interesting via latency
        (4, 20, "ok", 1.0),
        (5, 30, "ok", None),     # trace 30: NULL latency max -> boring
        (6, None, "ok", 1.0),    # NULL trace key groups + joins
        (7, None, "error", 1.0),
    ]
    df = spark.createDataFrame(rows, "event_id bigint, trace bigint, status string, lat double")
    interesting = (
        F.max(F.when(F.col("status") == "error", 1).otherwise(0)) == 1
    ) | (F.max(F.round(F.col("lat") * 100).cast("long")) >= 10_000)
    kept = tail_sample(df, ["trace"], interesting, base_rate=0.0).collect()
    got = {r["event_id"]: (r["trace"], r["keep_reason"]) for r in kept}
    assert got == {
        1: (10, "interesting"),
        2: (10, "interesting"),
        3: (20, "interesting"),
        4: (20, "interesting"),
        6: (None, "interesting"),
        7: (None, "interesting"),
    }

    # base_rate=1.0 keeps every trace; boring ones tagged 'sampled'
    all_kept = tail_sample(df, ["trace"], interesting, base_rate=1.0).collect()
    reasons = {r["event_id"]: r["keep_reason"] for r in all_kept}
    assert len(all_kept) == 7 and reasons[5] == "sampled"

    import pytest as _pytest

    with _pytest.raises(ValueError, match="base_rate"):
        tail_sample(df, ["trace"], interesting, base_rate=1.5)
    with _pytest.raises(ValueError, match="trace_cols"):
        tail_sample(df, [], interesting)
    with _pytest.raises(ValueError, match="collides"):
        tail_sample(df.withColumn("keep_reason", F.lit("x")), ["trace"], interesting)


def test_tail_sample_fraction_is_deterministic_and_trace_atomic(spark):
    """The sampled subset is a pure function of (trace key, salt): two
    runs agree, a different salt differs somewhere, and every sampled
    trace is kept atomically (all rows or none)."""
    from pyspark.sql import functions as F

    from emf_spark.datax.sampling import tail_sample

    rows = [(i, i // 3, "ok", 1.0) for i in range(300)]
    df = spark.createDataFrame(rows, "event_id bigint, trace bigint, status string, lat double")
    boring = F.max(F.when(F.col("status") == "error", 1).otherwise(0)) == 1

    def kept_ids(salt):
        return sorted(
            r["event_id"]
            for r in tail_sample(df, ["trace"], boring, 0.3, salt=salt).collect()
        )

    a, b = kept_ids("s1"), kept_ids("s1")
    assert a == b and 0 < len(a) < 300
    assert kept_ids("s2") != a
    traces = {}
    for e in a:
        traces.setdefault(e // 3, []).append(e)
    assert all(len(v) == 3 for v in traces.values())
