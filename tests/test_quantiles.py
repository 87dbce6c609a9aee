"""Exact distributed quantiles (lakehouse/quantiles.py) and the
ANALYZE histogram + selectivity layer built on them (ops/analyze.py):
rank exactness vs numpy, tie/heavy-hitter determinism, histogram
persistence, and selectivity-estimate accuracy bounds.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from lakehouse import CLIPS_SCHEMA, Table
from lakehouse.quantiles import exact_quantiles, target_ranks
from lakehouse.synth import synth_clips_pdf


def _check_exact(spark, values, buckets):
    a = np.asarray(values, dtype=float)
    df = spark.createDataFrame([(float(x),) for x in a], "v double")
    got = exact_quantiles(df, "v", buckets).collect()
    s = np.sort(a)
    n = len(a)
    assert len(got) == buckets
    for row in got:
        assert row["rank"] == (row["bucket"] * n + buckets - 1) // buckets
        assert row["value"] == s[row["rank"] - 1]


def test_exact_quantiles_matches_numpy(spark):
    rng = np.random.default_rng(7)
    _check_exact(spark, rng.normal(0, 100, 4000), 16)


def test_exact_quantiles_heavy_hitter_and_ties(spark):
    rng = np.random.default_rng(8)
    # 40% of rows share one value: its coarse bucket is huge, the
    # answer must still be rank-exact and deterministic
    a = np.concatenate(
        [rng.uniform(-10, 10, 3000), np.full(2000, 3.25)]
    )
    _check_exact(spark, a, 10)


def test_exact_quantiles_partitioning_invariant(spark):
    rng = np.random.default_rng(9)
    a = rng.integers(-500, 500, 3000).astype(float)
    df = spark.createDataFrame([(float(x),) for x in a], "v double")
    q1 = exact_quantiles(df, "v", 8).collect()
    q2 = exact_quantiles(df.repartition(17), "v", 8).collect()
    assert [(r["bucket"], r["rank"], r["value"]) for r in q1] == [
        (r["bucket"], r["rank"], r["value"]) for r in q2
    ]


def test_exact_quantiles_nulls_constant_empty(spark):
    df = spark.createDataFrame(
        [(5.0,)] * 50 + [(None,)] * 10, "v double"
    )
    got = exact_quantiles(df, "v", 4).collect()
    assert [r["value"] for r in got] == [5.0] * 4
    assert got[-1]["rank"] == 50  # nulls excluded from N
    empty = exact_quantiles(
        spark.createDataFrame([], "v double"), "v", 4
    )
    assert empty.count() == 0
    with pytest.raises(ValueError):
        exact_quantiles(
            spark.createDataFrame([("x",)], "v string"), "v", 4
        )


def test_target_ranks_integer_exact():
    assert target_ranks(10, 4) == [(1, 3), (2, 5), (3, 8), (4, 10)]
    assert target_ranks(7, 7)[-1] == (7, 7)


@pytest.fixture()
def table(spark, table_root):
    t = Table.create(spark, table_root, CLIPS_SCHEMA)
    pdf = synth_clips_pdf(range(300), seed=11, n_days=4)
    t.append(
        spark.createDataFrame(pdf, schema=CLIPS_SCHEMA),
        target_file_count=3,
    )
    return t


def test_histogram_persist_and_read(table):
    from lakehouse.ops.analyze import read_histograms

    hists = table.analyze_histograms(["dur_ms"], buckets=16, exact=True)
    h = hists["dur_ms"]
    assert h.method == "exact" and h.buckets == 16
    assert h.n_rows == 300 and h.n_nulls == 0
    assert h.bounds == sorted(h.bounds)
    sid, back = read_histograms(
        table.root, at_or_before=table.current_snapshot_id()
    )
    assert back["dur_ms"].bounds == h.bounds
    # exact bounds: bucket b's upper bound is the rank-ceil(b*N/B) value
    vals = sorted(
        r["dur_ms"] for r in table.scan().select("dur_ms").collect()
    )
    for b, ub in enumerate(h.bounds, start=1):
        assert ub == vals[(b * 300 + 15) // 16 - 1]


def test_selectivity_range_accuracy(table):
    B = 32
    table.analyze_histograms(["dur_ms"], buckets=B, exact=True)
    vals = [r["dur_ms"] for r in table.scan().select("dur_ms").collect()]
    n = len(vals)
    for op, probe in [("<=", 900), ("<=", 2000), (">", 1500), ("<", 600)]:
        est = table.estimate_selectivity("dur_ms", op, probe)
        actual = sum(
            1
            for v in vals
            if (op == "<=" and v <= probe)
            or (op == "<" and v < probe)
            or (op == ">" and v > probe)
        )
        # equi-depth bound: interpolation error is confined to one
        # bucket (plus </<= mass on the probe value itself)
        tol = n / B + sum(1 for v in vals if v == probe) + 1
        assert abs(est.est_rows - actual) <= tol, (op, probe)


def test_selectivity_equality_uses_ndv(table):
    table.analyze_histograms(["sr_hz"], buckets=8)
    table.analyze(["sr_hz"])  # persist the NDV sketch
    est = table.estimate_selectivity("sr_hz", "=", 16000)
    assert est.method.endswith("+ndv")
    ndv = table.approx_ndv("sr_hz")
    assert est.fraction == pytest.approx(1.0 / ndv)
    # out-of-range equality: zero
    assert table.estimate_selectivity("sr_hz", "=", 10).fraction == 0.0


def test_selectivity_approx_mode_close_on_uniform(spark, tmp_path):
    from pyspark.sql import types as T

    schema = T.StructType([T.StructField("v", T.LongType())])
    t = Table.create(spark, str(tmp_path / "uni"), schema)
    rng = np.random.default_rng(3)
    rows = [(int(x),) for x in rng.integers(0, 10_000, 5000)]
    t.append(spark.createDataFrame(rows, schema), target_file_count=2)
    t.analyze_histograms(["v"], buckets=32)  # approx path
    est = t.estimate_selectivity("v", "<=", 2500)
    actual = sum(1 for (x,) in rows if x <= 2500)
    assert abs(est.est_rows - actual) <= 5000 * 2 / 32

    with pytest.raises(ValueError):
        t.estimate_selectivity("missing_col", "<=", 1)
