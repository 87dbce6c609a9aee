"""Zero-copy CLONE — ops/clone.py.

Covers: scan parity with shared inodes (no data bytes moved), full
metadata independence after the clone (appends, MoR deletes, expiry+GC
on either side never disturb the other), time-travel clones pinning an
old snapshot + its schema, MoR delete files carrying over, bloom
sidecars carrying over, refs NOT carrying over, and the
dest-already-exists guard.
"""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from lakehouse.errors import TableAlreadyExistsError
from lakehouse.table import Table


def _corpus(spark, n=300, base=0):
    return spark.range(base, base + n).select(
        F.col("id").alias("k"),
        (F.col("id") % 5).alias("grp"),
        (F.col("id") * 2.5).alias("v"),
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _inode_map(root):
    return {
        os.path.relpath(os.path.join(dp, fn), root): os.stat(
            os.path.join(dp, fn)
        ).st_ino
        for dp, _dirs, fns in os.walk(root)
        for fn in fns
        if fn.endswith(".parquet")
    }


def test_clone_scan_parity_zero_copy(spark, tmp_path):
    """Clone scans identically to the source while every parquet byte is
    a shared inode — the clone moved metadata, not data."""
    t = Table.create(spark, str(tmp_path / "src"), _corpus(spark).schema)
    t.append(_corpus(spark))
    t.append(_corpus(spark, base=300))

    c = t.clone_to(str(tmp_path / "dst"))
    assert _rows(c.scan()) == _rows(t.scan())

    src_ino = _inode_map(t.root)
    dst_ino = _inode_map(c.root)
    # every parquet in the clone (data + manifests) shares its inode
    assert dst_ino and set(dst_ino) <= set(src_ino)
    for rel, ino in dst_ino.items():
        assert src_ino[rel] == ino, rel

    # fresh identity, provenance recorded, snapshot id preserved
    assert c.meta.table_uuid != t.meta.table_uuid
    assert c.meta.properties["clone_source"] == t.root
    assert c.current_snapshot_id() == t.current_snapshot_id()
    assert c.snapshots()[-1].operation == "clone"


def test_clone_independence_both_directions(spark, tmp_path):
    """Writes after the clone are invisible across the boundary, and the
    clone's snapshot ids keep advancing past the inherited one."""
    t = Table.create(spark, str(tmp_path / "src"), _corpus(spark).schema)
    t.append(_corpus(spark))
    c = t.clone_to(str(tmp_path / "dst"))

    t.append(_corpus(spark, n=50, base=1000))
    c.delete("grp = 3", mode="mor", key="k")

    assert t.scan().count() == 350
    assert c.scan().count() == 300 - 60  # grp==3 is 60 of 300
    # MoR delete committed on the clone got a NEW, larger snapshot id
    sids = [s.snapshot_id for s in c.snapshots()]
    assert sids == sorted(sids) and len(sids) == 2


def test_gc_on_source_never_breaks_clone(spark, tmp_path):
    """Source-side compaction + expiry + orphan GC unlink the source's
    directory entries; the clone still reads every row because the
    inodes survive (the add_files discipline)."""
    t = Table.create(spark, str(tmp_path / "src"), _corpus(spark).schema)
    t.append(_corpus(spark))
    c = t.clone_to(str(tmp_path / "dst"))
    before = _rows(c.scan())

    t.compact()  # rewrites data files
    t.expire_snapshots(keep_last=1)
    t.remove_orphan_files(older_than_ms=0)

    assert _rows(c.scan()) == before
    # and the reverse: clone GC leaves the source intact
    c.compact()
    c.expire_snapshots(keep_last=1)
    c.remove_orphan_files(older_than_ms=0)
    assert _rows(t.scan()) == before


def test_clone_pinned_old_snapshot_and_schema(spark, tmp_path):
    """Cloning at an old snapshot reproduces the time-travel scan AND
    adopts that snapshot's schema as current."""
    t = Table.create(spark, str(tmp_path / "src"), _corpus(spark).schema)
    s1 = t.append(_corpus(spark))
    t.evolve_schema(t.schema.add("extra", "string"))
    t.append(
        _corpus(spark, n=40, base=500).withColumn("extra", F.lit("x"))
    )

    c = t.clone_to(str(tmp_path / "dst"), snapshot_id=s1.snapshot_id)
    # the clone binds the PINNED snapshot's schema (3 cols); the source's
    # time-travel scan binds its current evolved schema — project to compare
    assert _rows(c.scan()) == _rows(
        t.scan(snapshot_id=s1.snapshot_id, columns=["k", "grp", "v"])
    )
    assert [f.name for f in c.schema.fields] == ["k", "grp", "v"]
    assert c.meta.properties["clone_source_snapshot"] == s1.snapshot_id


def test_clone_carries_mor_deletes_and_refs_do_not(spark, tmp_path):
    """Un-materialized MoR deletes travel with the clone (delete files +
    sequence ordering are in the manifests); branches/tags do not."""
    t = Table.create(spark, str(tmp_path / "src"), _corpus(spark).schema)
    t.append(_corpus(spark))
    t.delete("k < 20", mode="mor", key="k")
    t.create_tag("release")

    c = t.clone_to(str(tmp_path / "dst"))
    assert _rows(c.scan()) == _rows(t.scan())
    assert c.scan().count() == 280
    assert "release" in t.refs() and "release" not in c.refs()


def test_clone_bloom_sidecars_travel(spark, tmp_path):
    """A bloom-indexed source clones with its sidecars so point-lookup
    file skipping works identically on the clone."""
    t = Table.create(
        spark,
        str(tmp_path / "src"),
        _corpus(spark).schema,
        properties={"bloom_columns": ["k"]},
    )
    t.append(_corpus(spark))
    c = t.clone_to(str(tmp_path / "dst"))
    blooms = [
        fn
        for _dp, _d, fns in os.walk(c.root)
        for fn in fns
        if fn.endswith(".bloom")
    ]
    assert blooms
    assert _rows(c.scan(filter=[("k", "=", 7)])) == _rows(
        t.scan(filter=[("k", "=", 7)])
    )


def test_clone_empty_table_and_existing_dest_guard(spark, tmp_path):
    t = Table.create(spark, str(tmp_path / "src"), _corpus(spark).schema)
    c = t.clone_to(str(tmp_path / "empty"))
    assert c.scan().count() == 0
    assert c.schema == t.schema

    with pytest.raises(TableAlreadyExistsError):
        t.clone_to(str(tmp_path / "empty"))
