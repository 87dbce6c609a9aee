"""scan_with_lineage: Iceberg-style _file/_pos/_snapshot_id columns."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lakehouse import Table
from lakehouse.errors import LakehouseError
from lakehouse.schema import CLIPS_SCHEMA
from lakehouse.synth import synth_clips_df


def test_lineage_columns_identify_commit_and_file(spark, tmp_path):
    t = Table.create(spark, str(tmp_path / "t"), CLIPS_SCHEMA)
    s1 = t.append(synth_clips_df(spark, 24, seed=3, n_days=1),
                  target_file_count=2).snapshot_id
    s2 = t.append(synth_clips_df(spark, 8, seed=4, n_days=1, start=1000),
                  target_file_count=1).snapshot_id
    df = t.scan_with_lineage()
    rows = df.select("clip_id", "_file", "_pos", "_snapshot_id").collect()
    assert len(rows) == 32
    by_snap = {}
    for r in rows:
        by_snap.setdefault(r._snapshot_id, []).append(r)
    assert set(by_snap) == {s1, s2}
    assert len(by_snap[s1]) == 24 and len(by_snap[s2]) == 8
    # _file is root-relative and resolves to a live manifest entry
    live = {e.file_path for e in t.live_files()}
    assert {r._file for r in rows} == live
    # _pos is a within-file row index: dense from 0 per file
    by_file = {}
    for r in rows:
        by_file.setdefault(r._file, []).append(r._pos)
    for poss in by_file.values():
        assert sorted(poss) == list(range(len(poss)))
    # lineage scan returns the same logical rows as the plain scan
    a = t.scan().select("clip_id")
    b = df.select("clip_id")
    assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()


def test_lineage_scan_prunes_and_filters(spark, tmp_path):
    t = Table.create(spark, str(tmp_path / "t"), CLIPS_SCHEMA)
    t.set_sort_order(["clip_id"])
    df = synth_clips_df(spark, 64, seed=7, n_days=1)
    t.append(df, target_file_count=8)
    probe = df.select("clip_id").collect()[20].clip_id
    out = t.scan_with_lineage(
        filter=[("clip_id", ">=", probe), ("clip_id", "<=", probe)]
    )
    rows = out.collect()
    assert len(rows) == 1 and rows[0].clip_id == probe
    # sorted table: the hit names exactly the one pruned-to file
    assert len({r._file for r in rows}) == 1


def test_lineage_scan_refuses_pending_mor_deletes(spark, tmp_path):
    t = Table.create(spark, str(tmp_path / "t"), CLIPS_SCHEMA)
    t.append(synth_clips_df(spark, 16, seed=5, n_days=1))
    t.delete("dur_ms % 2 = 0", mode="mor", key="clip_id")
    with pytest.raises(LakehouseError, match="materialize_deletes"):
        t.scan_with_lineage()
    t.materialize_deletes()
    n = t.scan_with_lineage().count()
    assert n == t.scan().count()


def test_lineage_scan_empty_table(spark, tmp_path):
    t = Table.create(spark, str(tmp_path / "t"), CLIPS_SCHEMA)
    df = t.scan_with_lineage()
    assert df.count() == 0
    assert {"_file", "_pos", "_snapshot_id"} <= set(df.columns)


def test_lineage_survives_column_mapping(spark, tmp_path):
    """After a rename (field-id mapping), lineage reads old files under
    their physical names and still reports correct _snapshot_id."""
    t = Table.create(spark, str(tmp_path / "t"), CLIPS_SCHEMA)
    s1 = t.append(synth_clips_df(spark, 12, seed=5, n_days=1)).snapshot_id
    t.rename_column("transcript", "caption")
    s2 = t.append(
        synth_clips_df(spark, 4, seed=6, n_days=1, start=500)
        .withColumnRenamed("transcript", "caption")
    ).snapshot_id
    df = t.scan_with_lineage()
    assert "caption" in df.columns
    got = {
        r._snapshot_id
        for r in df.select("_snapshot_id").distinct().collect()
    }
    assert got == {s1, s2}
    assert df.count() == 16
