"""Multiline log-record assembly (operators/multiline.py)."""

import pytest

from emf_spark.operators.multiline import assemble_multiline


def _rows(df):
    return {
        (r["f"], r["record_seq"]): (r["start_order"], r["n_lines"], r["record"])
        for r in df.collect()
    }


def test_assemble_basic_and_orphan_preamble(spark):
    lines = [
        # file A: opens with TWO orphan continuation lines (torn record)
        ("A", 0, "    at frame_0"),
        ("A", 1, "    at frame_1"),
        ("A", 2, "2024-01-01 00:00:00 ERROR boom"),
        ("A", 3, "    at Foo.bar(Foo.java:1)"),
        ("A", 4, "    at Baz.qux(Baz.java:2)"),
        ("A", 5, "2024-01-01 00:00:01 INFO ok"),
        # file B: starts clean, single-line records only
        ("B", 0, "2024-01-01 00:00:00 INFO one"),
        ("B", 1, "2024-01-01 00:00:01 INFO two"),
    ]
    df = spark.createDataFrame(lines, "f string, line_no long, line string")
    got = _rows(assemble_multiline(df, group_cols=["f"]))
    assert got[("A", 0)] == (0, 2, "    at frame_0\n    at frame_1")
    assert got[("A", 1)] == (
        2,
        3,
        "2024-01-01 00:00:00 ERROR boom\n"
        "    at Foo.bar(Foo.java:1)\n"
        "    at Baz.qux(Baz.java:2)",
    )
    assert got[("A", 2)] == (5, 1, "2024-01-01 00:00:01 INFO ok")
    assert got[("B", 1)] == (0, 1, "2024-01-01 00:00:00 INFO one")
    assert got[("B", 2)] == (1, 1, "2024-01-01 00:00:01 INFO two")
    assert len(got) == 5  # no record_seq 0 for file B


def test_assemble_is_arrival_order_and_partitioning_invariant(spark):
    lines = [
        ("f", i, f"2024-01-0{1 + i % 3} 00:00:00 start {i}")
        if i % 4 == 0
        else ("f", i, f"    cont {i}")
        for i in range(40)
    ]
    df = spark.createDataFrame(lines, "f string, line_no long, line string")
    base = _rows(assemble_multiline(df, group_cols=["f"]))
    # reversed arrival order, scattered over many partitions
    shuffled = spark.createDataFrame(
        list(reversed(lines)), "f string, line_no long, line string"
    ).repartition(7)
    assert _rows(assemble_multiline(shuffled, group_cols=["f"])) == base
    # 40 lines, starts at 0,4,...,36 -> 10 records, no orphan preamble
    assert len(base) == 10 and ("f", 0) not in base
    assert all(n == 4 for (_, n, _r) in base.values())


def test_assemble_custom_joiner_and_pattern(spark):
    df = spark.createDataFrame(
        [("x", 1, "BEGIN a"), ("x", 2, "tail"), ("x", 3, "BEGIN b")],
        "f string, line_no long, line string",
    )
    got = _rows(
        assemble_multiline(
            df, group_cols=["f"], start_pattern=r"^BEGIN ", joiner=" | "
        )
    )
    assert got[("x", 1)] == (1, 2, "BEGIN a | tail")
    assert got[("x", 2)] == (3, 1, "BEGIN b")


def test_assemble_internal_column_collision_raises(spark):
    df = spark.createDataFrame(
        [("f", 1, "2024-01-01 x", 0)], "f string, line_no long, line string, _rec int"
    )
    with pytest.raises(ValueError, match="_rec"):
        assemble_multiline(df, group_cols=["f"])
