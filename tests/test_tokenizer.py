"""Tokenization contract (FIXTURES.md §1): token id = UTF-8 byte,
detokenize == bytes(tokens), invertible."""

from __future__ import annotations

import json

from hypothesis import given, settings, strategies as st

from emf_spark.tokenizer import detokenize_bytes, tokenize_bytes


@given(st.text(max_size=200))
@settings(max_examples=200, deadline=None)
def test_roundtrip_property(s):
    assert detokenize_bytes(tokenize_bytes(s)) == s


def test_tokens_are_bytes():
    toks = tokenize_bytes('{"a":1}')
    assert toks == list(b'{"a":1}')
    assert all(0 <= t <= 255 for t in toks)


def test_detokenize_udf(spark):
    from emf_spark.tokenizer import with_payload

    rows = [("d1", tokenize_bytes('{"x": 1}')), ("d2", tokenize_bytes("héllo ☃"))]
    df = spark.createDataFrame(rows, "doc_id string, tokens array<int>")
    out = {r["doc_id"]: r["payload"] for r in with_payload(df).collect()}
    assert out == {"d1": '{"x": 1}', "d2": "héllo ☃"}


def test_fixture_corpus_tokens_invert(corpus_path, spark):
    df = spark.read.parquet(corpus_path)
    rows = df.limit(50).collect()
    for r in rows:
        js = detokenize_bytes(r["tokens"])
        json.loads(js)  # every payload is valid JSON text
        assert r["n_tok"] == len(r["tokens"])


def test_null_token_element_yields_empty_payload(spark):
    """A token array containing a NULL element decodes to '' (the
    malformed marker the parse stage rejects), never platform-dependent
    NaN->uint8 garbage (review finding); pure-python oracle agrees."""
    from emf_spark.operators import parse as parse_op
    from emf_spark.tokenizer import with_payload

    rows = [
        ("good", tokenize_bytes('{"x": 1}')),
        ("holed", [72, None, 105]),
        ("nullarr", None),
    ]
    df = spark.createDataFrame(rows, "doc_id string, tokens array<int>")
    out = {r["doc_id"]: r["payload"] for r in with_payload(df).collect()}
    assert out["good"] == '{"x": 1}'
    assert out["holed"] == ""
    assert out["nullarr"] is None
    assert detokenize_bytes([72, None, 105]) == ""
    # and the parse stage routes the holed row to the errors side
    parsed = parse_op.parse_emf(
        with_payload(df.filter("doc_id = 'holed'"))
    ).collect()[0]
    assert parsed["valid"] is False
