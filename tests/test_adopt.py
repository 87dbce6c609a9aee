"""Metadata-only parquet adoption (Iceberg add_files) — ops/adopt.py.

Covers: zero-copy linking (shared inodes), footer-only stats + pruning,
hive-layout fills (Spark partitionBy drops the partition column from
data pages), fill application across every reader (native scan, lazy
scan, datasource, MoR), fill age-out under compaction, and the schema
safety gates.
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest

from pyspark.sql import functions as F
from pyspark.sql import types as T

from lakehouse.errors import SchemaEvolutionError
from lakehouse.ops.adopt import AdoptError
from lakehouse.table import Table


def _corpus(spark, n=400):
    return (
        spark.range(n)
        .select(
            F.col("id").alias("k"),
            (F.col("id") % 7).alias("grp"),
            F.date_add(F.lit("2024-01-01").cast("date"),
                       (F.col("id") % 5).cast("int")).alias("d"),
            (F.col("id") * 1.5).alias("v"),
        )
    )


def _inodes(root):
    return {
        os.stat(os.path.join(dp, fn)).st_ino
        for dp, _dirs, fns in os.walk(root)
        for fn in fns
        if fn.endswith(".parquet")
    }


def test_add_files_flat_zero_copy_and_pruning(spark, tmp_path):
    """Flat layout (all columns present): every file hardlinks, stats
    prune point lookups, scan matches the source exactly."""
    df = _corpus(spark)
    ext = str(tmp_path / "flat")
    df.repartition(6, "k").write.parquet(ext)

    t = Table.create(spark, str(tmp_path / "tbl"), df.schema)
    snap = t.add_files(ext)
    assert snap.summary["adopted-files"] == snap.summary["zero-copy-links"]
    assert {
        os.stat(os.path.join(t.root, e.file_path)).st_ino
        for e in t.live_files()
    } == _inodes(ext)

    got = t.scan()
    assert got.count() == 400
    assert got.exceptAll(df).count() == 0 and df.exceptAll(got).count() == 0
    # footer stats arrived: a point lookup prunes files
    plan = t.plan(filter=[("k", "=", 3)])
    assert 0 < len(plan.files) < plan.candidate_files


def test_add_files_hive_layout_fills_every_reader(spark, tmp_path):
    """partitionBy layout: the partition column is physically ABSENT
    from data pages; adoption stays zero-copy by recording per-file
    fills, and every reader injects them (no nulls, exact parity) —
    native, pruned, lazy, datasource, and post-MoR-delete scans."""
    df = _corpus(spark)
    ext = str(tmp_path / "hive")
    df.repartition(4, "k").write.partitionBy("d").parquet(ext)
    # the layout really drops the column
    some = next(
        os.path.join(dp, fn)
        for dp, _dirs, fns in os.walk(ext)
        for fn in fns
        if fn.endswith(".parquet")
    )
    assert "d" not in pq.ParquetFile(some).schema_arrow.names

    t = Table.create(
        spark, str(tmp_path / "tbl"), df.schema,
        partition_spec=[{"name": "d", "transform": "identity", "source": "d"}],
    )
    snap = t.add_files(ext)
    assert snap.summary["adopted-files"] == snap.summary["zero-copy-links"]
    live = t.live_files()
    assert all(e.stats["d"].get("fill") for e in live)
    assert all(e.partition["d"] == e.stats["d"]["min"] for e in live)

    got = t.scan()
    assert got.filter(F.col("d").isNull()).count() == 0
    assert got.exceptAll(df).count() == 0 and df.exceptAll(got).count() == 0

    want = df.filter(F.col("d") == F.lit("2024-01-03").cast("date")).count()
    plan = t.plan(filter=[("d", "=", "2024-01-03")])
    assert len(plan.files) < plan.candidate_files
    assert t.scan(filter=[("d", "=", "2024-01-03")]).count() == want

    lazy = t.scan(distributed_planning=True)
    assert lazy.filter(F.col("d").isNull()).count() == 0
    assert lazy.count() == 400

    from lakehouse.datasource import register

    register(spark)
    ds = spark.read.format("lakehouse").load(t.root)
    assert ds.count() == 400
    assert ds.filter(F.col("d").isNull()).count() == 0

    # MoR delete over a filled table: both the fill and the delete apply
    t.delete("k % 10 = 0", mode="mor", key="k")
    got = t.scan()
    assert got.count() == 360
    assert got.filter(F.col("d").isNull()).count() == 0

    # positional delete whose PREDICATE references the FILLED column —
    # the match pass must see injected values, not nulls
    res = t.delete(
        "d = DATE'2024-01-02' AND k % 2 = 1", mode="mor-pos"
    )
    assert res.keys_deleted > 0
    want_gone = df.filter(
        "(k % 10 = 0) OR (d = DATE'2024-01-02' AND k % 2 = 1)"
    ).count()
    assert t.scan().count() == 400 - want_gone

    # materialize rewrites the surviving rows: the filled column must
    # land as REAL values in the new self-contained files, never null
    t.materialize_deletes()
    live2 = t.live_files()
    assert not any(
        st.get("fill")
        for e in live2
        for st in e.stats.values()
        if isinstance(st, dict)
    )
    got = t.scan()
    assert got.count() == 400 - want_gone
    assert got.filter(F.col("d").isNull()).count() == 0
    want = df.filter(
        "NOT ((k % 10 = 0) OR (d = DATE'2024-01-02' AND k % 2 = 1))"
    )
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0


def test_add_files_fills_age_out_under_compaction(spark, tmp_path):
    """Compaction reads through the fill join and writes SELF-CONTAINED
    files: the flag disappears, pruning and parity survive."""
    df = _corpus(spark)
    ext = str(tmp_path / "hive")
    df.repartition(4, "k").write.partitionBy("d").parquet(ext)
    t = Table.create(
        spark, str(tmp_path / "tbl"), df.schema,
        partition_spec=[{"name": "d", "transform": "identity", "source": "d"}],
    )
    t.add_files(ext)
    res = t.compact(target_file_size=64 * 1024 * 1024, min_input_files=2)
    assert res.files_rewritten > 0
    live = t.live_files()
    assert not any(
        st.get("fill")
        for e in live
        for st in e.stats.values()
        if isinstance(st, dict)
    )
    cols = set(
        pq.ParquetFile(
            os.path.join(t.root, live[0].file_path)
        ).schema_arrow.names
    )
    assert "d" in cols
    got = t.scan()
    assert got.exceptAll(df).count() == 0 and df.exceptAll(got).count() == 0


def test_add_files_schema_gates(spark, tmp_path):
    df = _corpus(spark)
    ext = str(tmp_path / "flat")
    df.coalesce(2).write.parquet(ext)

    # incompatible type (double column into int table column)
    narrow = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("grp", T.LongType()),
            T.StructField("d", T.DateType()),
            T.StructField("v", T.IntegerType()),
        ]
    )
    t_bad = Table.create(spark, str(tmp_path / "bad"), narrow)
    with pytest.raises(SchemaEvolutionError, match="does not read"):
        t_bad.add_files(ext)

    # extra source column rejected unless allowed
    smaller = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("grp", T.LongType()),
            T.StructField("d", T.DateType()),
        ]
    )
    t_small = Table.create(spark, str(tmp_path / "small"), smaller)
    with pytest.raises(AdoptError, match="not in table schema"):
        t_small.add_files(ext)
    t_small.add_files(ext, allow_extra_columns=True)
    assert t_small.scan().count() == 400

    # files already inside the table dir are refused
    t_ok = Table.create(spark, str(tmp_path / "ok"), df.schema)
    t_ok.append(df.limit(10))
    inside = os.path.join(
        t_ok.root, t_ok.live_files()[0].file_path
    )
    with pytest.raises(AdoptError, match="inside the table"):
        t_ok.add_files(inside)

    # missing partition source column with NO path-proven value
    t_part = Table.create(
        spark, str(tmp_path / "part"), df.schema,
        partition_spec=[{"name": "d", "transform": "identity", "source": "d"}],
    )
    ext2 = str(tmp_path / "nodcol")
    df.drop("d").coalesce(1).write.parquet(ext2)
    with pytest.raises(AdoptError, match="not\\s+recoverable"):
        t_part.add_files(ext2)


def test_add_files_widening_and_missing_nullable(spark, tmp_path):
    """int32 file column reads as the table's long (Iceberg-safe
    promotion, no rewrite); a nullable table column absent from the
    file scans as null."""
    src = spark.range(50).select(
        F.col("id").cast("int").alias("k"),
        (F.col("id") % 3).cast("float").alias("v"),
    )
    ext = str(tmp_path / "narrow")
    src.coalesce(1).write.parquet(ext)

    wide = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("v", T.DoubleType()),
            T.StructField("note", T.StringType(), True),
        ]
    )
    t = Table.create(spark, str(tmp_path / "tbl"), wide)
    t.add_files(ext)
    got = t.scan()
    assert got.schema["k"].dataType == T.LongType()
    assert got.count() == 50
    assert got.filter(F.col("note").isNull()).count() == 50
    assert got.agg(F.sum("k")).collect()[0][0] == sum(range(50))
