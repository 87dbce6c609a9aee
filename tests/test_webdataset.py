"""WebDataset tar-shard export/import (lakehouse/webdataset.py): the
training-loader handoff. Round-trip byte parity, deterministic
(re-export byte-identical) shards, shard-assignment stability, and the
manifest contract.
"""

from __future__ import annotations

import os
import tarfile

import pytest
from pyspark.sql import functions as F

from lakehouse import Table
from lakehouse.schema import CLIPS_SCHEMA
from lakehouse.synth import synth_clips_df
from lakehouse.webdataset import export_webdataset, read_webdataset


@pytest.fixture()
def clips(spark):
    return synth_clips_df(spark, 120, seed=51, n_days=2)


def _export(df, out, **kw):
    kw.setdefault("n_shards", 4)
    kw.setdefault("meta_cols", ["sr_hz", "dur_ms", "codec"])
    return export_webdataset(df, out, **kw)


def test_roundtrip_byte_parity(spark, clips, tmp_path):
    out = str(tmp_path / "wds")
    man = _export(clips, out).collect()
    assert sum(r["n_samples"] for r in man) == 120
    assert {r["shard"] for r in man} == {
        f"shard-{i:06d}.tar" for i in range(4)
    }
    back = read_webdataset(spark, out)
    j = (
        clips.select(
            F.col("clip_id").alias("key"), "bytes", "transcript", "sr_hz"
        )
        .join(back, "key", "full_outer")
        .collect()
    )
    assert len(j) == 120
    for r in j:
        assert r["data"] == bytes(r["bytes"]), r["key"]
        assert r["text"] == r["transcript"]
        assert f'"sr_hz": "{r["sr_hz"]}"' in r["meta_json"]


def test_reexport_is_byte_identical(spark, clips, tmp_path):
    m1 = {
        r["shard"]: r["sha256"]
        for r in _export(clips, str(tmp_path / "a")).collect()
    }
    # different upstream partitioning must not change a single byte
    m2 = {
        r["shard"]: r["sha256"]
        for r in _export(
            clips.repartition(13), str(tmp_path / "b")
        ).collect()
    }
    assert m1 == m2
    # overwrite-in-place commits cleanly too (tmp files all swept)
    m3 = _export(clips, str(tmp_path / "a")).collect()
    assert {r["shard"]: r["sha256"] for r in m3} == m1
    leftovers = [
        f for f in os.listdir(str(tmp_path / "a")) if ".tmp-" in f
    ]
    assert leftovers == []


def test_sample_members_adjacent_and_key_sorted(spark, clips, tmp_path):
    """The WebDataset contract: one sample's members are stored
    adjacently, samples ordered by key (streamable, zero seeks)."""
    out = str(tmp_path / "wds")
    man = _export(clips, out).collect()
    with tarfile.open(man[0]["path"]) as tf:
        names = [m.name for m in tf if m.isfile()]
    keys = []
    for i in range(0, len(names), 3):
        grp = names[i:i + 3]
        stems = {n.rsplit(".", 1)[0] for n in grp}
        assert len(stems) == 1, f"sample members not adjacent: {grp}"
        keys.append(stems.pop())
    assert keys == sorted(keys)
    assert man[0]["min_key"] == keys[0]
    assert man[0]["max_key"] == keys[-1]


def test_export_from_table_scan_and_subset_columns(spark, tmp_path):
    t = Table.create(spark, str(tmp_path / "t"), CLIPS_SCHEMA)
    t.append(synth_clips_df(spark, 40, seed=52, n_days=1),
             target_file_count=2)
    out = str(tmp_path / "wds")
    # text-only export (no payload column): .txt members only
    man = export_webdataset(
        t.scan(), out, n_shards=2, bytes_col=None
    ).collect()
    assert sum(r["n_samples"] for r in man) == 40
    back = read_webdataset(spark, out)
    assert back.filter(F.col("data").isNotNull()).count() == 0
    assert back.filter(F.col("text").isNotNull()).count() == 40


# --- incremental sync -----------------------------------------------------


def _shard_of(spark, key, n_shards):
    return spark.sql(
        f"SELECT pmod(xxhash64('{key}'), {n_shards})"
    ).collect()[0][0]


def test_sync_full_incremental_noop_parity(spark, tmp_path):
    from lakehouse.webdataset import sync_webdataset

    t = Table.create(spark, str(tmp_path / "t"), CLIPS_SCHEMA)
    t.append(synth_clips_df(spark, 80, seed=61, n_days=1),
             target_file_count=4)
    out = str(tmp_path / "wds")
    r = sync_webdataset(t, out, n_shards=8, meta_cols=["sr_hz"])
    assert r.mode == "full" and r.manifest.count() == 8
    before = {x["shard"]: x["sha256"] for x in r.manifest.collect()}

    # no change -> noop
    assert sync_webdataset(t, out, n_shards=8,
                           meta_cols=["sr_hz"]).mode == "noop"
    # data-neutral compaction -> still noop (marker advances)
    t.compact()
    r = sync_webdataset(t, out, n_shards=8, meta_cols=["sr_hz"])
    assert r.mode == "noop"

    # churn: append new keys + MoR-delete an old one
    t.append(synth_clips_df(spark, 10, start=200, seed=62, n_days=1),
             target_file_count=1)
    victim = t.scan().select("clip_id").orderBy("clip_id").first()[0]
    t.delete(f"clip_id = '{victim}'", mode="mor")
    r = sync_webdataset(t, out, n_shards=8, meta_cols=["sr_hz"])
    assert r.mode == "incremental" and r.dirty_shards
    after = {x["shard"]: x["sha256"] for x in r.manifest.collect()}
    # untouched shards kept their exact bytes
    width = max(6, len(str(8 - 1)))
    clean = {f"shard-{i:0{width}d}.tar" for i in range(8)} - {
        f"shard-{i:0{width}d}.tar" for i in r.dirty_shards
    }
    for name in clean:
        assert after[name] == before[name], name
    # parity: the synced directory == a fresh full export, byte for byte
    fresh = export_webdataset(
        t.scan(), str(tmp_path / "fresh"), n_shards=8,
        meta_cols=["sr_hz"],
    ).collect()
    assert {x["shard"]: x["sha256"] for x in fresh} == after
    # sample conservation through the loader-side read
    assert read_webdataset(spark, out).count() == t.scan().count()


def test_sync_removes_emptied_shards(spark, tmp_path):
    from lakehouse.webdataset import sync_webdataset

    t = Table.create(spark, str(tmp_path / "t"), CLIPS_SCHEMA)
    t.append(synth_clips_df(spark, 12, seed=63, n_days=1),
             target_file_count=1)
    out = str(tmp_path / "wds")
    sync_webdataset(t, out, n_shards=64)
    # a shard holding exactly one key empties when that key is deleted
    keys = [r[0] for r in t.scan().select("clip_id").collect()]
    shards = {k: _shard_of(spark, k, 64) for k in keys}
    lone = next(
        k for k, s in shards.items()
        if sum(1 for v in shards.values() if v == s) == 1
    )
    t.delete(f"clip_id = '{lone}'", mode="mor")
    r = sync_webdataset(t, out, n_shards=64)
    assert r.mode == "incremental"
    assert shards[lone] in r.removed_shards
    name = f"shard-{shards[lone]:06d}.tar"
    assert not os.path.exists(os.path.join(out, name))
    assert read_webdataset(spark, out).count() == 11


def test_sync_refuses_mismatched_layout(spark, tmp_path):
    from lakehouse import LakehouseError
    from lakehouse.webdataset import sync_webdataset

    t = Table.create(spark, str(tmp_path / "t"), CLIPS_SCHEMA)
    t.append(synth_clips_df(spark, 8, seed=64, n_days=1),
             target_file_count=1)
    out = str(tmp_path / "wds")
    sync_webdataset(t, out, n_shards=4)
    with pytest.raises(LakehouseError, match="n_shards"):
        sync_webdataset(t, out, n_shards=8)


def test_ingest_webdataset_round_trips_a_table(spark, tmp_path):
    import datetime as dt

    from lakehouse.webdataset import ingest_webdataset

    src = Table.create(spark, str(tmp_path / "src"), CLIPS_SCHEMA)
    src.append(synth_clips_df(spark, 30, seed=65, n_days=1),
               target_file_count=2)
    out = str(tmp_path / "wds")
    export_webdataset(src.scan(), out, n_shards=3)
    back = ingest_webdataset(
        spark, out, ingest_ts=dt.datetime(2026, 1, 1)
    )
    assert back.filter(F.col("ingest_error").isNotNull()).count() == 0
    cols = ["clip_id", "bytes", "sr_hz", "dur_ms", "codec", "transcript"]
    a, b = src.scan().select(cols), back.select(cols)
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0
    # and it lands in a fresh table through the ordinary append path
    dst = Table.create(spark, str(tmp_path / "dst"), CLIPS_SCHEMA)
    dst.append(back.select(*[f.name for f in CLIPS_SCHEMA.fields]),
               target_file_count=2)
    assert dst.scan().count() == 30


def test_member_byte_index_supports_ranged_reads(spark, clips, tmp_path):
    from lakehouse.webdataset import read_webdataset_index

    out = str(tmp_path / "wds")
    man = _export(clips, out, write_index=True).collect()
    idx = read_webdataset_index(spark, out)
    # 3 members per sample (wav + txt + json), every sample indexed
    assert idx.count() == 3 * 120
    assert idx.select("key").distinct().count() == 120
    # a single ranged read at (offset, size) returns the exact member
    probe = (
        idx.filter(F.col("ext") == "wav").orderBy("key").limit(5).collect()
    )
    paths = {r["shard"]: r["path"] for r in man}
    src = {
        r["clip_id"]: bytes(r["bytes"])
        for r in clips.select("clip_id", "bytes").collect()
    }
    for r in probe:
        with open(paths[r["shard"]], "rb") as fh:
            fh.seek(r["offset"])
            got = fh.read(r["size"])
        assert got == src[r["key"]], r["member"]
    # sync keeps the index in step: delete every key of a lone shard
    # (reuse the emptied-shard machinery) and the idx file goes with it
