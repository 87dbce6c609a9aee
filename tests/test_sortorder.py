"""Write-time sort orders: range-partitioned sorted writes -> file
min/max stats prune like an index."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lakehouse import Table
from lakehouse.schema import CLIPS_SCHEMA
from lakehouse.synth import synth_clips_df


def _point_filter(cid: str):
    return [("clip_id", ">=", cid), ("clip_id", "<=", cid)]


def test_sorted_append_prunes_where_unsorted_cannot(spark, tmp_path):
    df = synth_clips_df(spark, 128, seed=4, n_days=1)
    probe = df.select("clip_id").collect()[17].clip_id

    plain = Table.create(spark, str(tmp_path / "plain"), CLIPS_SCHEMA)
    plain.append(df, target_file_count=8)
    kept_plain = len(plain.plan(filter=_point_filter(probe)).files)

    sorted_t = Table.create(spark, str(tmp_path / "sorted"), CLIPS_SCHEMA)
    sorted_t.set_sort_order(["clip_id"])
    sorted_t.append(df, target_file_count=8)
    kept_sorted = len(sorted_t.plan(filter=_point_filter(probe)).files)

    # unsorted round-robin files each span ~the whole key range (stats
    # luck may drop one); sorted files cover disjoint ranges, so a
    # point lookup keeps exactly one
    assert kept_plain >= 6, kept_plain
    assert kept_sorted == 1, kept_sorted
    # and both scans return identical rows (sorting is layout-only)
    a = plain.scan().select("clip_id", "dur_ms")
    b = sorted_t.scan().select("clip_id", "dur_ms")
    assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()


def test_sorted_files_carry_provenance_and_disjoint_ranges(spark, tmp_path):
    t = Table.create(spark, str(tmp_path / "t"), CLIPS_SCHEMA)
    t.set_sort_order(["clip_id"])
    assert t.sort_order() == ["clip_id"]
    t.append(synth_clips_df(spark, 96, seed=7, n_days=1),
             target_file_count=6)
    entries = t.live_files()
    assert all(e.sort_order == "sorted(clip_id)" for e in entries)
    ranges = sorted(
        (e.stats["clip_id"]["min"], e.stats["clip_id"]["max"])
        for e in entries
    )
    for (lo1, hi1), (lo2, _hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, (hi1, lo2)  # disjoint (boundary dup allowed)


def test_sort_order_with_partition_spec(spark, tmp_path):
    t = Table.create(
        spark,
        str(tmp_path / "t"),
        CLIPS_SCHEMA,
        partition_spec=[
            {"name": "event_date", "transform": "identity",
             "source": "event_date"}
        ],
    )
    t.set_sort_order(["clip_id"])
    df = synth_clips_df(spark, 128, seed=9, n_days=2)
    t.append(df, target_file_count=8)
    # within each partition dir, key ranges stay disjoint
    by_part = {}
    for e in t.live_files():
        by_part.setdefault(tuple(sorted(e.partition.items())), []).append(
            (e.stats["clip_id"]["min"], e.stats["clip_id"]["max"])
        )
    assert len(by_part) == 2
    for ranges in by_part.values():
        ranges.sort()
        for (lo1, hi1), (lo2, _h) in zip(ranges, ranges[1:]):
            assert hi1 <= lo2
    # row parity with the source
    assert t.scan().count() == 128


def test_set_sort_order_validates_and_clears(spark, tmp_path):
    t = Table.create(spark, str(tmp_path / "t"), CLIPS_SCHEMA)
    with pytest.raises(ValueError, match="not in schema"):
        t.set_sort_order(["nope"])
    t.set_sort_order(["clip_id"])
    t.set_sort_order(None)
    assert t.sort_order() == []
    t.append(synth_clips_df(spark, 16, seed=3, n_days=1),
             target_file_count=2)
    assert all(e.sort_order == "" for e in t.live_files())


def test_merge_rewrites_respect_sort_order(spark, tmp_path):
    t = Table.create(spark, str(tmp_path / "t"), CLIPS_SCHEMA)
    t.set_sort_order(["clip_id"])
    t.append(synth_clips_df(spark, 64, seed=5, n_days=1),
             target_file_count=4)
    src = (
        t.scan()
        .filter(F.xxhash64("clip_id") % 4 == 0)
        .withColumn("transcript", F.concat("transcript", F.lit(" [v2]")))
    )
    t.merge(src, key="clip_id")
    # every data file written by the merge carries the sorted tag too
    assert all(
        e.sort_order == "sorted(clip_id)" for e in t.live_files()
    ), [e.sort_order for e in t.live_files()]
