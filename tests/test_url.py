"""URL normalization + domain-suffix LPM enrichment (operators/url.py)."""

import pytest
from pyspark.sql import functions as F

from emf_spark.operators.url import suffix_enrich, url_normalize


def _norm(spark, u, **kw):
    df = spark.createDataFrame([(u,)], "u string")
    return df.select(url_normalize(F.col("u"), **kw).alias("n")).collect()[0]["n"]


def test_normalize_case_port_fragment_tracking_sort(spark):
    got = _norm(
        spark,
        "HTTPS://WWW.Example.COM:443/Path/X?utm_source=a&b=2&a=1&fbclid=z#frag",
    )
    assert got == "https://example.com/Path/X?a=1&b=2"  # path case KEPT


def test_normalize_fragment_question_mark_not_a_query(spark):
    # '?' INSIDE the fragment is not a query: the fragment is stripped
    # first, so no query resurfaces (r5 advisory)
    assert _norm(spark, "https://h.example/p#f?x=1") == "https://h.example/p"
    assert _norm(spark, "https://h.example/#/route?x=1") == "https://h.example/"
    # real query + fragment-with-? keeps only the real query
    assert _norm(spark, "https://h.example/p?a=1#f?x=2") == "https://h.example/p?a=1"


def test_normalize_edges(spark):
    # trailing root dot + default http port + empty path -> '/'
    assert _norm(spark, "http://Host.:80") == "http://host/"
    # non-default port kept; empty query pieces collapse; 'a=' kept
    assert _norm(spark, "http://h:8080/p?z=1&utm_x=9&&a=") == "http://h:8080/p?a=&z=1"
    # https on port 80 is NOT default -> kept
    assert _norm(spark, "https://h:80/") == "https://h:80/"
    # query params sort byte-wise, duplicates kept
    assert _norm(spark, "http://h/?b=1&a=2&a=1") == "http://h/?a=1&a=2&b=1"
    # www kept when strip_www=False
    assert _norm(spark, "http://www.h/", strip_www=False) == "http://www.h/"
    # scheme-less / NULL -> NULL
    assert _norm(spark, "not a url") is None
    assert _norm(spark, None) is None


def _dim(spark):
    return spark.createDataFrame(
        [(".Example.COM", "blocked", 1), ("ads.example.com", "ads", 2),
         ("ads.example.com", "ads-dup", 9), ("org", "tld", 3)],
        "sfx string, label string, pri int")


def test_suffix_lpm_and_label_boundaries(spark):
    facts = spark.createDataFrame(
        [("x.ads.example.com",), ("EXAMPLE.COM.",), ("notexample.com",),
         ("a.org",), ("org",), (None,), ("deep.a.b.c.ads.example.com",)],
        "host string")
    got = {r["host"]: (r["matched_suffix"], r["label"], r["pri"])
           for r in suffix_enrich(facts, "host", _dim(spark), "sfx",
                                  ["label", "pri"], max_labels=6).collect()}
    assert got["x.ads.example.com"] == ("ads.example.com", "ads", 2)  # longest + dup-min
    assert got["EXAMPLE.COM."] == ("example.com", "blocked", 1)  # case + root dot + leading-dot dim
    assert got["notexample.com"] == (None, None, None)  # label boundary, no substring match
    assert got["a.org"] == ("org", "tld", 3)
    assert got["org"] == ("org", "tld", 3)  # exact == suffix
    assert got[None] == (None, None, None)
    assert got["deep.a.b.c.ads.example.com"] == ("ads.example.com", "ads", 2)


def test_suffix_guards(spark):
    facts = spark.createDataFrame([("a.b",)], "host string")
    deep = spark.createDataFrame([("a.b.c.d", "x", 1)], "sfx string, label string, pri int")
    with pytest.raises(Exception, match="deeper than max_labels"):
        suffix_enrich(facts, "host", deep, "sfx", ["label", "pri"],
                      max_labels=3).collect()
    with pytest.raises(ValueError, match="max_labels"):
        suffix_enrich(facts, "host", deep, "sfx", ["label", "pri"], max_labels=0)
    with pytest.raises(ValueError, match="collides"):
        suffix_enrich(facts.withColumn("label", F.lit("x")), "host",
                      deep, "sfx", ["label", "pri"])


def test_suffix_plan_zero_fact_shuffle(spark):
    """All joins broadcast; the fact side never exchanges (every
    Exchange in the plan belongs to a dim-sized aggregate)."""
    dim = spark.createDataFrame([("a.b", "x", 1)], "sfx string, label string, pri int")
    facts = spark.range(10).selectExpr("concat('h', id, '.a.b') as host")
    plan = suffix_enrich(facts, "host", dim, "sfx", ["label", "pri"],
                         max_labels=3)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") == 3, plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    # fact lineage (Range -> joins -> project) crosses no Exchange:
    # every Exchange in the plan sits under a BroadcastExchange subtree
    for seg in plan.split("BroadcastExchange")[:1]:
        assert "Exchange hashpartitioning" not in seg, seg


def test_normalize_plan_is_narrow(spark):
    df = spark.range(5).selectExpr("concat('http://h/', id) as u")
    plan = df.select(url_normalize(F.col("u")).alias("n"))\
        ._jdf.queryExecution().executedPlan().toString()
    for bad in ("Exchange", "Generate", "BatchEvalPython", "ArrowEvalPython"):
        assert bad not in plan, plan
