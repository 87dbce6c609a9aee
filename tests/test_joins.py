"""asof_join / range_join: semantics, plan shape, tolerance."""

import pytest

from pyspark.sql import functions as F


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_asof_backward_semantics_and_ties(spark):
    """Latest right row with rts <= lts wins; EQUAL timestamps match;
    left rows before any right row get NULLs."""
    from lakehouse.joins import asof_join

    left = spark.createDataFrame(
        [(1, 3, "a"), (1, 5, "b"), (1, 10, "c"), (2, 4, "d"), (3, 9, "e")],
        "k int, ts int, lv string",
    )
    right = spark.createDataFrame(
        [(1, 4, 40.0), (1, 5, 50.0), (1, 9, 90.0), (2, 99, 1.0)],
        "k int, ts int, rv double",
    )
    got = {
        r.lv: (r.ts_matched, r.rv)
        for r in asof_join(left, right, on="ts", by=["k"]).collect()
    }
    assert got == {
        "a": (None, None),   # before any right row
        "b": (5, 50.0),      # tie at ts=5 matches
        "c": (9, 90.0),      # latest <= 10
        "d": (None, None),   # right row is in the future
        "e": (None, None),   # key has no right rows at all
    }


def test_asof_tolerance_nulls_stale_matches(spark):
    from lakehouse.joins import asof_join

    left = spark.createDataFrame([(1, 100), (1, 109)], "k int, ts int")
    right = spark.createDataFrame([(1, 95, 9.5)], "k int, ts int, rv double")
    got = {
        r.ts: r.rv
        for r in asof_join(
            left, right, on="ts", by=["k"], tolerance=5
        ).collect()
    }
    assert got == {100: 9.5, 109: None}  # 109-95=14 > 5 → stale


def test_asof_single_shuffle_no_join_node(spark):
    """The union+window implementation must contain NO join operator
    and exactly one exchange (the per-key window shuffle)."""
    from lakehouse.joins import asof_join

    left = spark.createDataFrame([(1, 3, "a")], "k int, ts int, lv string")
    right = spark.createDataFrame([(1, 2, 1.0)], "k int, ts int, rv double")
    plan = _plan(asof_join(left, right, on="ts", by=["k"]))
    assert "Join" not in plan, plan
    n_ex = sum(
        1
        for ln in plan.splitlines()
        if ln.lstrip("*+- (0123456789)").startswith("Exchange")
    )
    assert n_ex == 1, plan


def test_asof_rejects_column_clash_without_suffix(spark):
    from lakehouse.joins import asof_join

    left = spark.createDataFrame([(1, 3, 1.0)], "k int, ts int, v double")
    right = spark.createDataFrame([(1, 2, 2.0)], "k int, ts int, v double")
    with pytest.raises(ValueError, match="right_suffix"):
        asof_join(left, right, on="ts", by=["k"])
    r = asof_join(left, right, on="ts", by=["k"], right_suffix="_r").collect()
    assert r[0].v == 1.0 and r[0].v_r == 2.0


def test_range_join_exact_and_no_bnlj(spark):
    """Bucketed interval join: results equal the naive predicate; no
    BroadcastNestedLoopJoin; degenerate/empty intervals match nothing;
    intervals spanning many buckets still match exactly once."""
    from lakehouse.joins import range_join

    pts = spark.createDataFrame(
        [(i, i * 7 % 100) for i in range(200)], "pid int, t int"
    )
    iv = spark.createDataFrame(
        [
            (0, 10, 20),    # narrow
            (1, 15, 90),    # spans many width-8 buckets
            (2, 50, 50),    # degenerate → nothing
            (3, 60, 55),    # inverted → nothing
            (4, 0, 1),      # half-open: t=0 in, t=1 out
        ],
        "iid int, s int, e int",
    )
    got = sorted(
        (r.pid, r.iid)
        for r in range_join(
            pts, iv, left_on="t", start_col="s", end_col="e", bucket_width=8
        ).collect()
    )
    want = sorted(
        (p, i)
        for p, t in [(r.pid, r.t) for r in pts.collect()]
        for i, s, e in [(r.iid, r.s, r.e) for r in iv.collect()]
        if s <= t < e
    )
    assert got == want and len(got) > 0
    plan = _plan(
        range_join(
            pts, iv, left_on="t", start_col="s", end_col="e", bucket_width=8
        )
    )
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_range_join_rejects_bad_width(spark):
    from lakehouse.joins import range_join

    df = spark.createDataFrame([(1, 1)], "a int, b int")
    with pytest.raises(ValueError):
        range_join(
            df, df, left_on="a", start_col="a", end_col="b", bucket_width=0
        )
