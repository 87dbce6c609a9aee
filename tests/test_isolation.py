"""Serializable-isolation MERGE validation (Iceberg's
conflictDetectionFilter / validateNoConflicting* analog,
Table._validate_serializable): a MERGE planned against snapshot S must
fail if a concurrent commit after S added data or deletes overlapping
the source-key range — a matching row inserted concurrently would be
missed (write skew), a concurrent delete of a matched key silently
undone (lost delete). Overlap tests ride manifest min/max stats only.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lakehouse import CommitConflictError, Table
from lakehouse.schema import CLIPS_SCHEMA
from lakehouse.synth import synth_clips_df


@pytest.fixture()
def table(spark, table_root):
    t = Table.create(spark, table_root, CLIPS_SCHEMA)
    t.append(synth_clips_df(spark, 60, seed=41, n_days=1),
             target_file_count=3)
    return t


def _upd(t, n=5):
    return (
        t.scan()
        .orderBy("clip_id")
        .limit(n)
        .withColumn("transcript", F.lit("v2"))
    )


@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_concurrent_overlapping_append_conflicts(spark, table, mode):
    t = table
    src = _upd(t).localCheckpoint()  # plan the source against S
    base = t.current_snapshot_id()
    # concurrent writer inserts rows in the SAME key range after S
    t.append(
        t.scan().orderBy("clip_id").limit(3)
        .withColumn("clip_id", F.concat(F.col("clip_id"), F.lit("x"))),
        target_file_count=1,
    )
    with pytest.raises(CommitConflictError, match="serializable"):
        t.merge(src, mode=mode, isolation="serializable",
                validate_from=base)
    # default snapshot isolation still commits (today's behavior)
    t.merge(src, mode=mode, validate_from=None)


@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_disjoint_concurrent_append_passes(spark, table, mode):
    t = table
    src = _upd(t).localCheckpoint()
    base = t.current_snapshot_id()
    # concurrent rows in a DISJOINT key range (prefix 'zzz' sorts after
    # every synth id) — stats pruning must let the merge through
    t.append(
        t.scan().orderBy("clip_id").limit(3)
        .withColumn("clip_id", F.concat(F.lit("zzz-"), F.col("clip_id"))),
        target_file_count=1,
    )
    res = t.merge(src, mode=mode, isolation="serializable",
                  validate_from=base)
    assert res.snapshot_id is not None
    assert t.scan().filter(F.col("transcript") == "v2").count() == 5


def test_concurrent_overlapping_delete_conflicts(spark, table):
    t = table
    src = _upd(t).localCheckpoint()
    victim = src.select("clip_id").first()[0]
    base = t.current_snapshot_id()
    t.delete(f"clip_id = '{victim}'", mode="mor")  # lost-delete race
    with pytest.raises(CommitConflictError, match="serializable"):
        t.merge(src, mode="mor", isolation="serializable",
                validate_from=base)


def test_unmoved_head_validates_trivially(spark, table):
    t = table
    src = _upd(t)
    res = t.merge(src, mode="cow", isolation="serializable")
    assert res.snapshot_id is not None
    assert t.scan().filter(F.col("transcript") == "v2").count() == 5


def test_data_neutral_rewrite_never_conflicts(spark, table):
    t = table
    src = _upd(t).localCheckpoint()
    base = t.current_snapshot_id()
    t.compact(target_file_size=1 << 30)  # replace: data-neutral
    res = t.merge(src, mode="cow", isolation="serializable",
                  validate_from=base)
    assert res.snapshot_id is not None


def test_expired_read_base_refuses_validation(spark, table):
    t = table
    src = _upd(t).localCheckpoint()
    base = t.current_snapshot_id()
    t.append(synth_clips_df(spark, 5, start=900, seed=42, n_days=1),
             target_file_count=1)
    t.rollback(base)  # head moved off the chain containing base's child
    t.append(synth_clips_df(spark, 5, start=950, seed=43, n_days=1),
             target_file_count=1)
    # base IS an ancestor here; make it non-ancestor via a fake id
    with pytest.raises(CommitConflictError, match="replan|ancestor|serializable"):
        t.merge(src, mode="cow", isolation="serializable",
                validate_from=999999999)
