"""Grok/regex parse leg (north rule) — compiler + extraction."""

from __future__ import annotations

import pytest

from emf_spark.operators.grok import COMMON_LOG, compile_grok, grok_extract


def test_compile_grok_fields():
    regex, fields = compile_grok("%{IP:client} %{WORD:method} %{NUMBER:ms}")
    assert fields == [("client", None), ("method", None), ("ms", None)]
    import re

    m = re.fullmatch(regex, "10.0.0.1 GET 12.5")
    assert m and m.groups() == ("10.0.0.1", "GET", "12.5")


def test_compile_unknown_pattern():
    with pytest.raises(KeyError):
        compile_grok("%{NOPE:x}")


def test_grok_extract_dataframe(spark):
    lines = [
        ('10.0.0.1 - alice [12/Mar/2025:10:00:00 +0000] "GET /api/x?q=1" 200 123',),
        ('10.0.0.2 - bob [12/Mar/2025:10:00:01 +0000] "POST /api/y" 500 45',),
        ("totally unparseable garbage",),
    ]
    df = spark.createDataFrame(lines, "line string")
    out = grok_extract(df, "line", COMMON_LOG)
    rows = {r["client"]: r for r in out.collect()}
    assert set(rows) == {"10.0.0.1", "10.0.0.2"}  # garbage dropped
    assert rows["10.0.0.1"]["method"] == "GET"
    assert rows["10.0.0.1"]["path"] == "/api/x"
    assert rows["10.0.0.1"]["status"] == "200"
    assert rows["10.0.0.2"]["auth"] == "bob"


def test_grok_keep_unmatched(spark):
    df = spark.createDataFrame([("a 1",), ("junk",)], "line string")
    out = grok_extract(df, "line", "%{WORD:w} %{INT:n}", drop_unmatched=False)
    assert out.count() == 2


def test_grok_type_suffix(spark):
    df = spark.createDataFrame(
        [("GET 200 12.5",), ("POST nope 1.0",)], "line string"
    )
    out = grok_extract(
        df, "line", "%{WORD:m} %{WORD:status:int} %{NUMBER:ms:float}",
        drop_unmatched=False,
    )
    rows = {r["m"]: r for r in out.collect()}
    assert rows["GET"]["status"] == 200 and rows["GET"]["ms"] == 12.5
    assert rows["POST"]["status"] is None  # try_cast of 'nope'
    assert dict(out.dtypes)["status"] == "bigint"
    assert dict(out.dtypes)["ms"] == "double"


def test_compile_unknown_type_suffix():
    with pytest.raises(KeyError):
        compile_grok("%{INT:x:datetime}")
