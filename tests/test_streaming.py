"""Streaming ingest: foreachBatch append with exactly-once batch commits.

Engine-side counterpart of the reference's checkpointed streaming sink
(/root/reference/etl/glue_stream.py:339-349): the stream replays batches
after a restart, and the table must not double-commit them.
"""

from __future__ import annotations

import pytest

from lakehouse import Table
from lakehouse.schema import CLIPS_SCHEMA
from lakehouse.streaming import append_batch, committed_batch_ids
from lakehouse.synth import synth_clips_df

DATE_SPEC = [
    {"name": "event_date", "transform": "identity", "source": "event_date"}
]


@pytest.fixture()
def clips_table(spark, table_root):
    return Table.create(
        spark, table_root, CLIPS_SCHEMA, partition_spec=DATE_SPEC
    )


def test_batch_append_is_idempotent(spark, clips_table):
    cb = append_batch(clips_table)
    batch = synth_clips_df(spark, 32, seed=7, n_days=2)
    cb(batch, 0)
    assert clips_table.scan().count() == 32
    cb(batch, 0)  # replay after simulated restart
    assert clips_table.scan().count() == 32
    cb(synth_clips_df(spark, 16, start=32, seed=7, n_days=2), 1)
    assert clips_table.scan().count() == 48
    assert committed_batch_ids(clips_table) == {0, 1}


def test_empty_batch_commits_nothing(spark, clips_table):
    cb = append_batch(clips_table)
    cb(synth_clips_df(spark, 0, seed=7), 0)
    assert clips_table.current_snapshot_id() is None
    assert committed_batch_ids(clips_table) == set()


def test_rate_stream_end_to_end(spark, clips_table):
    """Bounded rate-source stream through the real writeStream surface."""
    from lakehouse.streaming import run_stream_demo

    result = run_stream_demo(
        spark, clips_table, batches=2, rows_per_second=64, timeout_s=90
    )
    assert result["batches_committed"] >= 2
    assert result["rows_after"] > result["rows_before"]
    # every committed snapshot carries its stream batch id
    ids = committed_batch_ids(clips_table)
    assert len(ids) == result["batches_committed"]
