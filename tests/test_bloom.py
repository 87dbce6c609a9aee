"""Bloom-filter sidecars: point-lookup file skipping beyond min/max.

The reference consumes file skipping wholesale from its Delta jar
(README.md:68 "partition optimization"); Delta's BloomFilterIndex and
Iceberg's Puffin blobs are the published counterparts of this module
(lakehouse/bloom.py). These tests pin: no false negatives, real
skipping on overlapping-range files where min/max cannot prune, parity
between driver and distributed planners, sidecar lifecycle under
rewrite + GC, and the registered-format writer producing the same
sidecars as the native path.
"""

from __future__ import annotations

import os

import pytest

from lakehouse import Table
from lakehouse.bloom import (
    build_bloom,
    might_contain_any,
    sidecar_path,
)
from lakehouse.schema import CLIPS_SCHEMA
from lakehouse.synth import clip_id_for, synth_clips_df


def test_bloom_no_false_negatives_and_low_fp():
    vals = [f"clip-{i:012d}" for i in range(5000)]
    b = build_bloom(vals)
    assert all(might_contain_any(b, [v]) for v in vals)
    probes = [f"absent-{i}" for i in range(2000)]
    fp = sum(might_contain_any(b, [p]) for p in probes)
    assert fp / len(probes) < 0.05  # sized for ~1%


def test_bloom_mixed_types_canonicalized():
    b = build_bloom([1, 2, 3])
    import numpy as np

    assert might_contain_any(b, [np.int64(2)])
    assert might_contain_any(b, ["2"])  # str canonicalization is shared
    assert not might_contain_any(b, [99])
    # '=' NULL probes nothing -> conservative keep
    assert might_contain_any(b, [None])


def test_bloom_cross_type_numeric_and_tz_no_false_negative():
    """A bloom 'no' is a DEFINITE skip, so numerically-equal values of
    different arrival types must never miss: a double column probed
    with an int literal, int columns probed with whole floats, tz-aware
    Arrow timestamps probed with naive predicate literals."""
    import datetime as dt

    import numpy as np

    b = build_bloom([5.0, 6.5, np.float64(7.0)])  # double column values
    assert might_contain_any(b, [5])  # int literal probe
    assert might_contain_any(b, [7])
    assert might_contain_any(b, [6.5])
    assert not might_contain_any(b, [8])

    bi = build_bloom([5, 7])
    assert might_contain_any(bi, [5.0])  # float probe on int column

    aware = dt.datetime(2024, 1, 5, 12, 0, 0, tzinfo=dt.timezone.utc)
    naive = dt.datetime(2024, 1, 5, 12, 0, 0)
    bt = build_bloom([aware])
    assert might_contain_any(bt, [naive])
    assert might_contain_any(build_bloom([naive]), [aware])


@pytest.fixture()
def bloom_table(spark, table_root):
    t = Table.create(
        spark,
        table_root,
        CLIPS_SCHEMA,
        properties={"bloom_columns": ["clip_id"]},
    )
    # interleave ids across appends so every file's [min,max] clip_id
    # range overlaps every other file's: min/max pruning keeps ALL
    # files for a point lookup; only blooms can skip
    df = synth_clips_df(spark, 400, seed=31, n_days=1)
    for i in range(4):
        t.append(df.filter(f"pmod(xxhash64(clip_id), 4) = {i}"),
                 target_file_count=2)
    return t


def test_point_lookup_skips_files(spark, bloom_table):
    t = bloom_table
    all_files = t.plan().files
    assert len(all_files) == 8
    # sidecars exist and stats carry the marker
    assert all(
        os.path.exists(sidecar_path(os.path.join(t.root, e.file_path)))
        for e in all_files
    )
    assert all(e.stats["clip_id"].get("bloom") for e in all_files)

    target = clip_id_for(123)
    plan = t.plan(filter=[("clip_id", "=", target)])
    # min/max can't prune (ranges all overlap); the bloom must
    assert 1 <= len(plan.files) < 8
    rows = t.scan(filter=[("clip_id", "=", target)]).collect()
    assert [r.clip_id for r in rows] == [target]


def test_in_predicate_and_planner_parity(spark, bloom_table):
    t = bloom_table
    probe = [clip_id_for(5), clip_id_for(250), "clip-nonexistent"]
    driver = t.plan(filter=[("clip_id", "in", probe)])
    dist = t.plan(filter=[("clip_id", "in", probe)], distributed=True)
    assert 1 <= len(driver.files) < 8
    assert sorted(e.file_path for e in driver.files) == sorted(
        e.file_path for e in dist.files
    )
    got = {
        r.clip_id
        for r in t.scan(filter=[("clip_id", "in", probe)]).collect()
    }
    assert got == {clip_id_for(5), clip_id_for(250)}


def test_rewrite_refreshes_blooms_and_gc_sweeps_sidecars(spark, bloom_table):
    import time

    t = bloom_table
    old_files = {e.file_path for e in t.plan().files}
    t.compact(target_file_size=256 * 1024 * 1024)
    new_files = {e.file_path for e in t.plan().files}
    assert new_files != old_files
    # rewritten files got fresh sidecars via the shared harvest path
    for e in t.plan().files:
        assert os.path.exists(sidecar_path(os.path.join(t.root, e.file_path)))
    # expire + GC removes the replaced data files AND their sidecars
    t.expire_snapshots(keep_last=1)
    t.remove_orphan_files(older_than_ms=int(time.time() * 1000) + 60_000)
    for rel in old_files:
        assert not os.path.exists(os.path.join(t.root, rel))
        assert not os.path.exists(sidecar_path(os.path.join(t.root, rel)))
    # post-GC point lookup still correct and still pruned
    target = clip_id_for(123)
    rows = t.scan(filter=[("clip_id", "=", target)]).collect()
    assert [r.clip_id for r in rows] == [target]


def test_format_writer_builds_sidecars(spark, table_root):
    from lakehouse.datasource import register

    register(spark)
    t = Table.create(
        spark,
        table_root,
        CLIPS_SCHEMA,
        properties={"bloom_columns": ["clip_id"]},
    )
    df = synth_clips_df(spark, 120, seed=32, n_days=1).repartition(3)
    df.write.format("lakehouse").mode("append").save(t.root)
    files = t.plan().files
    assert files and all(
        os.path.exists(sidecar_path(os.path.join(t.root, e.file_path)))
        for e in files
    )
    target = clip_id_for(7)
    plan = t.plan(filter=[("clip_id", "=", target)])
    assert len(plan.files) < len(files)


def test_merge_bloom_prunes_touched_files(spark, bloom_table, tmp_path):
    """Sparse upsert on an unsorted key: every file's [min,max] range
    contains every key, so the interval sweep alone would rewrite all 8
    files; the bloom pass must confine the COW rewrite to the files
    actually holding the keys — while an equivalent table WITHOUT
    blooms touches strictly more."""
    from pyspark.sql import functions as F

    t = bloom_table
    n_files = len(t.plan().files)
    src = (
        t.scan()
        .filter(F.col("clip_id").isin(clip_id_for(3), clip_id_for(77)))
        .withColumn("transcript", F.lit("edited"))
    )
    before = t.scan().count()
    res = t.merge(src, key="clip_id")
    assert res.files_touched < n_files
    assert t.scan().count() == before
    assert (
        t.scan().filter("transcript = 'edited'").count() == 2
    )

    # control: same layout, no bloom property -> every file touched
    plain = Table.create(
        spark, str(tmp_path / "plain"), CLIPS_SCHEMA
    )
    df = synth_clips_df(spark, 400, seed=31, n_days=1)
    for i in range(4):
        plain.append(df.filter(f"pmod(xxhash64(clip_id), 4) = {i}"),
                     target_file_count=2)
    res2 = plain.merge(
        plain.scan()
        .filter(F.col("clip_id").isin(clip_id_for(3), clip_id_for(77)))
        .withColumn("transcript", F.lit("edited")),
        key="clip_id",
    )
    # overlapping ranges + no blooms: the interval sweep keeps all 8
    assert res2.files_touched == 8 > res.files_touched


def test_no_bloom_property_means_no_sidecars(spark, table_root):
    t = Table.create(spark, table_root, CLIPS_SCHEMA)
    t.append(synth_clips_df(spark, 50, seed=33, n_days=1),
             target_file_count=2)
    for e in t.plan().files:
        assert not os.path.exists(
            sidecar_path(os.path.join(t.root, e.file_path))
        )
        assert not e.stats["clip_id"].get("bloom")
