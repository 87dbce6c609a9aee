"""Scale-free planner gate: 10^12-row SEMANTICS without 10^12 rows.

Metadata must be the only thing that grows with table size (SURVEY.md §7
watch-list): fabricate manifests describing ~54k virtual data files
(~10^12 rows at 20M rows/file) and assert the planner prunes correctly
and fast, entirely driver-side — no data file is ever written.
"""

from __future__ import annotations

import datetime as dt
import time

import pytest

from lakehouse import Table
from lakehouse.meta.manifests import DataFileEntry
from lakehouse.schema import CLIPS_SCHEMA

DATE_SPEC = [
    {"name": "event_date", "transform": "identity", "source": "event_date"}
]

COMMITS = 36
DAYS_PER_COMMIT = 10
FILES_PER_DAY = 150  # 36 * 10 * 150 = 54,000 virtual files
ROWS_PER_FILE = 20_000_000  # → 1.08e12 virtual rows


@pytest.fixture(scope="module")
def big_meta_table(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("virtual") / "t")
    t = Table.create(spark, root, CLIPS_SCHEMA, partition_spec=DATE_SPEC)
    day0 = dt.date(2020, 1, 1)
    for c in range(COMMITS):
        entries = []
        for d in range(DAYS_PER_COMMIT):
            day = (day0 + dt.timedelta(days=c * DAYS_PER_COMMIT + d)).isoformat()
            for f in range(FILES_PER_DAY):
                lo = f * 1000
                entries.append(
                    DataFileEntry(
                        file_path=f"data/virtual/{day}/f{f:04d}.parquet",
                        partition={"event_date": day},
                        record_count=ROWS_PER_FILE,
                        file_size_bytes=512 * 1024 * 1024,
                        stats={
                            "clip_id": {
                                "min": f"clip-{lo:012d}",
                                "max": f"clip-{lo + 999:012d}",
                                "null_count": 0,
                            },
                            "event_date": {
                                "min": day,
                                "max": day,
                                "null_count": 0,
                            },
                        },
                    )
                )
        t._commit_files("append", entries, ())
    return t


def test_virtual_scale_bookkeeping(big_meta_table):
    t = big_meta_table
    plan = t.plan()
    assert plan.candidate_files == COMMITS * DAYS_PER_COMMIT * FILES_PER_DAY
    assert sum(e.record_count for e in plan.files) > 1_000_000_000_000


def test_partition_pruning_at_scale_is_fast_and_exact(big_meta_table):
    t = big_meta_table
    day = dt.date(2020, 6, 15)
    t0 = time.time()
    plan = t.plan(filter=[("event_date", "=", day)])
    elapsed = time.time() - t0
    assert len(plan.files) == FILES_PER_DAY
    assert all(e.partition["event_date"] == day.isoformat() for e in plan.files)
    # manifest-summary skip must avoid opening most manifests
    assert plan.pruned_manifests >= COMMITS - 2
    assert elapsed < 5.0, f"driver planning took {elapsed:.1f}s over 54k files"


def test_stats_pruning_at_scale(big_meta_table):
    t = big_meta_table
    plan = t.plan(
        filter=[("clip_id", ">=", "clip-000000000000"),
                ("clip_id", "<", "clip-000000001000")]
    )
    # each day keeps exactly the one file whose clip range matches
    assert len(plan.files) == COMMITS * DAYS_PER_COMMIT
    assert {e.stats["clip_id"]["min"] for e in plan.files} == {
        "clip-000000000000"
    }


def test_distributed_planning_matches_driver_at_scale(big_meta_table):
    t = big_meta_table
    day = dt.date(2020, 3, 3)
    f = [("event_date", "=", day)]
    a = sorted(e.file_path for e in t.plan(filter=f).files)
    b = sorted(e.file_path for e in t.plan(filter=f, distributed=True).files)
    assert a == b


def test_time_travel_pins_virtual_snapshots(big_meta_table):
    t = big_meta_table
    snaps = t.snapshots()
    early = snaps[4]
    plan = t.plan(snapshot_id=early.snapshot_id)
    assert plan.candidate_files == 5 * DAYS_PER_COMMIT * FILES_PER_DAY
