"""Referential-integrity audit: orphan detection + report semantics."""

import pytest

from pyspark.sql import functions as F


def test_orphan_rows_simple_and_composite(spark):
    from lakehouse.integrity import orphan_rows

    child = spark.createDataFrame(
        [(1, 10, "a"), (2, 20, "b"), (3, 99, "c"), (None, 10, "d")],
        "fk int, fk2 int, v string",
    )
    parent = spark.createDataFrame(
        [(1, 10), (2, 20), (2, 20)], "pk int, pk2 int"
    )
    # single-column key: fk=99's row would need parent pk=3 → orphan
    got = {
        r.v
        for r in orphan_rows(
            child, parent, [("fk", "pk")]
        ).collect()
    }
    assert got == {"c"}  # NULL fk excluded, not an orphan
    # composite key: (3,99) has no parent; (1,10),(2,20) do
    got2 = {
        r.v
        for r in orphan_rows(
            child, parent, [("fk", "pk"), ("fk2", "pk2")]
        ).collect()
    }
    assert got2 == {"c"}


def test_integrity_report_planted_counts(spark):
    from lakehouse.integrity import integrity_report

    child = spark.createDataFrame(
        [(i, i % 10) for i in range(100)]
        + [(100 + i, 1000 + i % 3) for i in range(6)]   # 6 orphans, 3 keys
        + [(200, None), (201, None)],                   # 2 null keys
        "id int, fk int",
    )
    parent = spark.createDataFrame([(i,) for i in range(10)], "pk int")
    rows = integrity_report(
        [
            ("c->p", child, parent, [("fk", "pk")]),
            ("self", parent, parent, [("pk", "pk")]),
        ]
    ).collect()
    by = {r.relationship: r for r in rows}
    r = by["c->p"]
    assert (r.child_rows, r.null_key_rows, r.orphan_rows, r.missing_keys) == (
        108, 2, 6, 3
    )
    s = by["self"]
    assert (s.child_rows, s.null_key_rows, s.orphan_rows, s.missing_keys) == (
        10, 0, 0, 0
    )


def test_orphan_rows_requires_keys(spark):
    from lakehouse.integrity import orphan_rows

    df = spark.createDataFrame([(1,)], "a int")
    with pytest.raises(ValueError):
        orphan_rows(df, df, [])


def test_orphan_join_is_hash_anti_join(spark):
    """The orphan probe must compile to a hash (or sort-merge) LEFT
    ANTI join — never a nested loop."""
    from lakehouse.integrity import orphan_rows

    child = spark.createDataFrame([(1, "x")], "fk int, v string")
    parent = spark.createDataFrame([(1,)], "pk int")
    plan = (
        orphan_rows(child, parent, [("fk", "pk")])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "LeftAnti" in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
