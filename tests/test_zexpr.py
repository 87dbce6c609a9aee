"""JVM curve-key expressions vs the numpy reference — bit parity.

The clustering op computes BOTH curves (Z-order and Hilbert) as pure
Catalyst expressions since round 2; this pins each JVM implementation
to the vectorized numpy reference (curves.py) bit-for-bit so either
path produces the same physical layout.
"""

import datetime as dt

import numpy as np
import pandas as pd
import pytest

from lakehouse.curves import (
    bits_per_dim,
    curve_index,
    normalize_to_uint,
    zorder_index,
)
from lakehouse.zexpr import with_hilbert_key, zorder_key_expr


def _reference_keys(pdf, columns, col_types, bounds, bits, curve="zorder"):
    coords = []
    for c in columns:
        lo, hi = bounds[c]
        series = pdf[c]
        if col_types[c] == "ts":
            series = pd.to_datetime(series).astype("int64") // 1000
            lo = pd.Timestamp(lo).value // 1000 if lo is not None else None
            hi = pd.Timestamp(hi).value // 1000 if hi is not None else None
        coords.append(
            normalize_to_uint(
                series, lo, hi, bits, is_string=col_types[c] == "str"
            )
        )
    return (curve_index(coords, bits, curve) >> np.uint64(1)).astype("int64")


def test_jvm_zkey_matches_numpy_reference(spark):
    from pyspark.sql import types as T

    rows = []
    base = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
    for i in range(257):
        rows.append(
            (
                f"clip-{i:05d}" if i % 17 else None,
                (i * 7919) % 100_000,
                base + dt.timedelta(seconds=i * 3571, microseconds=i * 137),
            )
        )
    schema = T.StructType(
        [
            T.StructField("s", T.StringType()),
            T.StructField("x", T.LongType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )
    df = spark.createDataFrame(rows, schema)
    col_types = {f.name: f.dataType for f in schema.fields}
    bounds = {
        "s": ("clip-00000", "clip-00256"),
        "x": (0, 99_999),
        "ts": (
            "2024-01-01 00:00:00",
            (base + dt.timedelta(seconds=256 * 3571, microseconds=256 * 137))
            .replace(tzinfo=None)
            .isoformat(sep=" "),
        ),
    }
    for columns in (["s", "x"], ["x", "ts"], ["s", "x", "ts"], ["x"]):
        bits = bits_per_dim(len(columns))
        expr = zorder_key_expr(columns, col_types, bounds, bits)
        got = [
            r.z
            for r in df.select(expr.alias("z")).collect()
        ]
        pdf = pd.DataFrame(
            {
                "s": [r[0] for r in rows],
                "x": [r[1] for r in rows],
                "ts": [r[2].replace(tzinfo=None) for r in rows],
            }
        )
        kinds = {"s": "str", "x": "num", "ts": "ts"}
        want = _reference_keys(
            pdf, columns, kinds, bounds, bits
        )
        mismatches = [
            (i, g, w) for i, (g, w) in enumerate(zip(got, want)) if g != w
        ]
        assert not mismatches, (columns, mismatches[:5])


def test_jvm_hilbert_matches_numpy_reference(spark):
    from pyspark.sql import types as T

    rows = []
    base = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
    for i in range(257):
        rows.append(
            (
                f"clip-{i:05d}" if i % 17 else None,
                (i * 7919) % 100_000,
                base + dt.timedelta(seconds=i * 3571, microseconds=i * 137),
            )
        )
    schema = T.StructType(
        [
            T.StructField("s", T.StringType()),
            T.StructField("x", T.LongType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )
    df = spark.createDataFrame(rows, schema)
    col_types = {f.name: f.dataType for f in schema.fields}
    bounds = {
        "s": ("clip-00000", "clip-00256"),
        "x": (0, 99_999),
        "ts": (
            "2024-01-01 00:00:00",
            (base + dt.timedelta(seconds=256 * 3571, microseconds=256 * 137))
            .replace(tzinfo=None)
            .isoformat(sep=" "),
        ),
    }
    pdf = pd.DataFrame(
        {
            "s": [r[0] for r in rows],
            "x": [r[1] for r in rows],
            "ts": [r[2].replace(tzinfo=None) for r in rows],
        }
    )
    kinds = {"s": "str", "x": "num", "ts": "ts"}
    for columns in (["s", "x"], ["x", "ts"], ["s", "x", "ts"], ["x"]):
        bits = bits_per_dim(len(columns))
        out = with_hilbert_key(df, columns, col_types, bounds, bits, "hk")
        got = [r.hk for r in out.select("hk").collect()]
        want = _reference_keys(pdf, columns, kinds, bounds, bits, "hilbert")
        mismatches = [
            (i, g, w) for i, (g, w) in enumerate(zip(got, want)) if g != w
        ]
        assert not mismatches, (columns, mismatches[:5])


def test_jvm_zkey_degenerate_bounds(spark):
    from pyspark.sql import types as T

    df = spark.createDataFrame(
        [("a", 1)], "s string, x long"
    )
    col_types = {"s": T.StringType(), "x": T.LongType()}
    # lo == hi and missing bounds both collapse to key 0
    for bounds in (
        {"s": ("a", "a"), "x": (1, 1)},
        {"s": (None, None), "x": (None, None)},
    ):
        expr = zorder_key_expr(["s", "x"], col_types, bounds, 32)
        assert df.select(expr.alias("z")).collect()[0].z == 0
