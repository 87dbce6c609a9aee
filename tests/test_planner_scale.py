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


def test_lazy_planner_prunes_1m_virtual_files_off_driver(spark):
    """The scale planner must keep the kept-file set as a DataFrame and
    hand the driver only bounded path chunks — never the full entry list
    (VERDICT.md §wrong 2). 1M virtual manifest entries are fabricated as
    a Spark job (spark.range → entry rows), pruned with the same
    prune_entries_df the lazy scan path uses, and consumed through
    iter_path_chunks; the driver holds ≤ chunk_size paths at any time.
    """
    import json as _json

    from pyspark.sql import functions as F

    from lakehouse.expressions import normalize_filter
    from lakehouse.meta.scan import LazyScanPlan, prune_entries_df

    n = 1_000_000
    files_per_day = 2_000  # 500 virtual days
    mdf = spark.range(n).select(
        F.concat(F.lit("data/virtual/f"), F.col("id")).alias("file_path"),
        F.to_json(
            F.struct(
                F.date_format(
                    F.date_add(
                        F.lit("2020-01-01"),
                        (F.col("id") / files_per_day).cast("int"),
                    ),
                    "yyyy-MM-dd",
                ).alias("event_date")
            )
        ).alias("partition_json"),
        F.lit(20_000_000).alias("record_count"),
        F.lit(512 * 1024 * 1024).alias("file_size_bytes"),
        F.lit(_json.dumps({})).alias("stats_json"),
        F.lit("").alias("sort_order"),
    )
    # low-selectivity filter: 100 of 500 days survive → 200k files
    preds = normalize_filter(
        [("event_date", ">=", "2020-01-01"), ("event_date", "<", "2020-04-10")]
    )
    pruned = prune_entries_df(mdf, preds)
    lplan = LazyScanPlan(pruned, None, snapshot_id=1, candidate_files=n)

    kept = 100 * files_per_day
    chunk_size = 50_000
    seen = 0
    max_chunk = 0
    for chunk in lplan.iter_path_chunks("/virtual", chunk_size=chunk_size):
        assert chunk[0][0].startswith("/virtual/data/virtual/f")
        max_chunk = max(max_chunk, len(chunk))
        seen += len(chunk)
    assert seen == kept
    assert max_chunk <= chunk_size


def test_distributed_scan_matches_driver_scan(spark, tmp_path):
    """End-to-end equality of the lazy scan path on a real table."""
    from lakehouse import Table
    from lakehouse.synth import synth_clips_df

    root = str(tmp_path / "t")
    t = Table.create(spark, root, CLIPS_SCHEMA, partition_spec=DATE_SPEC)
    t.append(synth_clips_df(spark, 80, seed=5, n_days=3), target_file_count=6)
    f = [("dur_ms", ">", 800)]
    a = sorted(
        r.clip_id for r in t.scan(filter=f).select("clip_id").collect()
    )
    b = sorted(
        r.clip_id
        for r in t.scan(filter=f, distributed_planning=True)
        .select("clip_id")
        .collect()
    )
    assert a == b and len(a) > 0


def test_default_scan_auto_selects_lazy_planner(spark, tmp_path, monkeypatch):
    """scan() with no distributed_planning argument must take the lazy
    path on its own once the snapshot tracks more entries than
    scan_lazy_threshold — the default API never driver-materializes a
    huge file list (VERDICT r2 item 7). Rows must equal the forced
    driver-planner scan."""
    import lakehouse.table as table_mod
    from lakehouse.synth import synth_clips_df

    root = str(tmp_path / "t")
    t = Table.create(
        spark, root, CLIPS_SCHEMA, partition_spec=DATE_SPEC,
        properties={"scan_lazy_threshold": "2"},
    )
    # partitioned append: one file per event_date => 3 entries tracked
    t.append(synth_clips_df(spark, 60, seed=5, n_days=3), target_file_count=6)

    lazy_calls = []
    orig = table_mod.plan_scan_lazy

    def spy(*a, **kw):
        lazy_calls.append(1)
        return orig(*a, **kw)

    monkeypatch.setattr(table_mod, "plan_scan_lazy", spy)
    f = [("dur_ms", ">", 800)]
    auto = sorted(
        r.clip_id for r in t.scan(filter=f).select("clip_id").collect()
    )
    assert lazy_calls, (
        "3 files >= threshold 2: the default scan must auto-select the "
        "lazy planner"
    )
    eager = sorted(
        r.clip_id
        for r in t.scan(filter=f, distributed_planning=False)
        .select("clip_id")
        .collect()
    )
    assert auto == eager and len(auto) > 0
    # under the threshold (or by default) the driver planner is used
    lazy_calls.clear()
    t2 = Table.create(
        spark, str(tmp_path / "t2"), CLIPS_SCHEMA, partition_spec=DATE_SPEC
    )
    t2.append(synth_clips_df(spark, 20, seed=5, n_days=2), target_file_count=2)
    t2.scan().count()
    assert not lazy_calls


def test_time_travel_pins_virtual_snapshots(big_meta_table):
    t = big_meta_table
    snaps = t.snapshots()
    early = snaps[4]
    plan = t.plan(snapshot_id=early.snapshot_id)
    assert plan.candidate_files == 5 * DAYS_PER_COMMIT * FILES_PER_DAY
