"""Default column values (Iceberg-v3 initial-default analog): files
written before a column existed scan as the DEFAULT, not null — a
metadata-only ADD COLUMN, zero rewrites (lakehouse/schema.py defaults +
the field-id mapped scan path)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lakehouse.schema import CLIPS_SCHEMA
from lakehouse.synth import synth_clips_df
from lakehouse.table import Table


@pytest.fixture()
def t(spark, table_root):
    t = Table.create(spark, table_root, CLIPS_SCHEMA)
    t.append(synth_clips_df(spark, 20, seed=1, n_days=2))
    return t


def test_add_column_with_default_reads_back(spark, t):
    t.add_column("quality_tier", "string", default="unreviewed")
    # old files: every row shows the default, not null
    got = t.scan().select("quality_tier").distinct().collect()
    assert [r.quality_tier for r in got] == ["unreviewed"]
    # new append WITH explicit values stores them
    df = synth_clips_df(spark, 4, seed=2, n_days=1, start=100).withColumn(
        "quality_tier", F.lit("gold")
    )
    t.append(df)
    by = dict(
        t.scan().groupBy("quality_tier").count().collect()
    )
    assert by == {"unreviewed": 20, "gold": 4}


def test_writer_fills_default_for_missing_column(spark, t):
    t.add_column("quality_tier", "string", default="unreviewed")
    # incoming frame LACKS the column -> write-default applies
    t.append(synth_clips_df(spark, 4, seed=3, n_days=1, start=200))
    assert t.scan().where("quality_tier IS NULL").count() == 0
    assert t.scan().where("quality_tier = 'unreviewed'").count() == 24


def test_add_column_without_default_nulls(spark, t):
    t.add_column("notes", "string")
    assert t.scan().where("notes IS NULL").count() == 20


def test_default_does_not_resurrect_dropped_column(spark, t):
    t.add_column("tier", "int", default=1)
    t.append(
        synth_clips_df(spark, 4, seed=4, n_days=1, start=300).withColumn(
            "tier", F.lit(9)
        )
    )
    t.drop_column("tier")
    t.add_column("tier", "int", default=5)
    # all rows (incl. those that stored 9 under the OLD field id) show
    # the NEW default — old values never resurrect
    got = {r.tier for r in t.scan().select("tier").distinct().collect()}
    assert got == {5}


def test_datasource_read_applies_defaults(spark, t):
    from lakehouse.datasource import register

    register(spark)
    t.add_column("quality_tier", "string", default="unreviewed")
    df = spark.read.format("lakehouse").load(t.root)
    assert df.where("quality_tier = 'unreviewed'").count() == 20
    assert df.where("quality_tier IS NULL").count() == 0


def test_compaction_materializes_defaults(spark, t):
    t.add_column("quality_tier", "string", default="unreviewed")
    t.compact(target_file_size=64 * 1024 * 1024)
    assert t.scan().where("quality_tier = 'unreviewed'").count() == 20


def test_time_travel_sees_default_under_current_schema(spark, t):
    """Historical snapshots read under the CURRENT schema (the engine's
    long-standing time-travel semantics): rows that predate the column
    surface the default there too, never null."""
    snap = t.current_snapshot_id()
    t.add_column("quality_tier", "string", default="unreviewed")
    old = t.scan(snapshot_id=snap)
    assert old.where("quality_tier = 'unreviewed'").count() == 20
    assert old.where("quality_tier IS NULL").count() == 0


def test_metadata_agg_with_defaults(spark, t):
    t.add_column("tier", "int", default=3)
    t.append(
        synth_clips_df(spark, 4, seed=5, n_days=1, start=400).withColumn(
            "tier", F.lit(8)
        )
    )
    res = t.min_max(["tier"])
    assert res.per_column["tier"] == (3, 8)
    assert t.count_rows(filter=[("tier", "=", 8)]).value == 4


def test_invalid_defaults_rejected(spark, t):
    with pytest.raises(Exception):
        t.add_column("bad", "int", default="not-an-int")
    with pytest.raises(Exception):
        t.add_column("clip_id", "string")  # existing name
