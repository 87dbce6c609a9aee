"""Streaming CDC source: ``spark.readStream.format("lakehouse")
.option("changes", "true")`` — the Delta streaming-readChangeFeed
analog (lakehouse/datasource.py). Appends stream as insert rows; MoR
delete/merge commits stream the full row images their NEW delete files
kill (old deletes excluded, so a row streams as deleted exactly once);
data-neutral rewrites are silent; COW mutations stream Iceberg-
changelog delete/insert pairs bounded by the commit's touched files.
Everything planned map-only from manifest diffs.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lakehouse import Table
from lakehouse.datasource import register
from lakehouse.schema import CLIPS_SCHEMA
from lakehouse.synth import synth_clips_df

DATE_SPEC = [
    {"name": "event_date", "transform": "identity", "source": "event_date"}
]


@pytest.fixture()
def cdc_table(spark, table_root):
    register(spark)
    t = Table.create(
        spark, table_root, CLIPS_SCHEMA, partition_spec=DATE_SPEC
    )
    t.append(
        synth_clips_df(spark, 100, seed=31, n_days=2), target_file_count=4
    )
    return t


def _drainer(spark, root, tmp_path):
    out, ckpt = str(tmp_path / "cdc_out"), str(tmp_path / "cdc_ckpt")
    sdf = (
        spark.readStream.format("lakehouse")
        .option("changes", "true")
        .option("start", "beginning")
        .load(root)
    )

    def drain():
        q = (
            sdf.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return spark.read.parquet(out)

    return drain


def _ids(df, ctype):
    return sorted(
        r[0]
        for r in df.filter(F.col("_change_type") == ctype)
        .select("clip_id")
        .collect()
    )


def test_append_and_mor_ladder_streams_exact_changes(
    spark, cdc_table, tmp_path
):
    """The full streamable ladder on one checkpoint: appends → compact
    (silent) → eq delete → MoR merge upsert → positional delete, each
    drain asserting exactly the new change rows."""
    t = cdc_table
    drain = _drainer(spark, t.root, tmp_path)

    all_ids = _ids(drain(), "insert")
    assert len(all_ids) == 100
    assert _ids(spark.read.parquet(str(tmp_path / "cdc_out")), "delete") == []

    # data-neutral rewrite: no change rows
    t.compact(target_file_size=1 << 30)
    assert drain().count() == 100

    # equality MoR delete: full old row images stream as deletes
    victims = [i for i in all_ids if i.endswith(("0", "1"))][:10]
    t.delete("clip_id IN (%s)" % ", ".join(f"'{v}'" for v in victims), mode="mor")
    got = drain()
    assert _ids(got, "delete") == sorted(victims)
    assert got.count() == 100 + len(victims)
    # deleted rows carry the full image (payload intact, commit id set)
    img = got.filter(
        (F.col("_change_type") == "delete")
        & (F.col("clip_id") == victims[0])
    ).collect()
    assert len(img) == 1 and img[0]["bytes"] is not None
    assert img[0]["_commit_snapshot_id"] == t.current_snapshot_id()

    # a second, overlapping delete must NOT re-emit already-dead rows
    victims2 = victims[5:] + [i for i in all_ids if i.endswith("2")][:5]
    t.delete("clip_id IN (%s)" % ", ".join(f"'{v}'" for v in victims2), mode="mor")
    got = drain()
    new_deletes = sorted(set(victims2) - set(victims))
    assert _ids(got, "delete") == sorted(set(victims) | set(new_deletes))

    # MoR merge upsert: old images stream as deletes, new as inserts
    survivors = [
        i for i in all_ids if i not in set(victims) | set(victims2)
    ]
    upd = (
        t.scan()
        .filter(F.col("clip_id").isin(survivors[:8]))
        .withColumn("transcript", F.lit("updated"))
    )
    ins = synth_clips_df(spark, 4, start=900, seed=32, n_days=1)
    t.merge(upd.unionByName(ins), mode="mor")
    got = drain()
    upd_ids = sorted(survivors[:8])
    assert (
        _ids(got.filter(F.col("_commit_snapshot_id")
                        == t.current_snapshot_id()), "delete")
        == upd_ids
    )
    new_inserts = got.filter(
        (F.col("_change_type") == "insert")
        & (F.col("_commit_snapshot_id") == t.current_snapshot_id())
    )
    assert new_inserts.count() == 8 + 4
    assert (
        new_inserts.filter(F.col("transcript") == "updated").count() == 8
    )

    # positional delete (non-key predicate) streams row images too
    n_before = t.scan().count()
    n_pos = t.scan().filter(F.col("sr_hz") == 8000).count()
    if n_pos:
        t.delete("sr_hz = 8000", mode="mor-pos")
        got = drain()
        batch = got.filter(
            (F.col("_commit_snapshot_id") == t.current_snapshot_id())
        )
        assert batch.count() == n_pos
        assert set(r[0] for r in batch.select("_change_type").collect()) \
            == {"delete"}
        assert t.scan().count() == n_before - n_pos

    # net effect: inserts minus deletes reproduces the live table
    got = spark.read.parquet(str(tmp_path / "cdc_out"))
    net = (
        got.groupBy("clip_id")
        .agg(
            F.sum(
                F.when(F.col("_change_type") == "insert", 1).otherwise(-1)
            ).alias("n")
        )
        .filter(F.col("n") > 0)
    )
    assert net.count() == t.scan().count()


def test_cow_delete_streams_changelog_pairs(spark, cdc_table, tmp_path):
    """COW mutations stream Iceberg-changelog style (r3 verdict #7 —
    previously failed the stream): removed files' live rows as deletes,
    added files' rows as inserts; carried-over rows appear as
    delete+insert pairs, and the running net effect still reproduces
    the live table."""
    t = cdc_table
    drain = _drainer(spark, t.root, tmp_path)
    drain()
    victims = set(
        r.clip_id for r in t.scan().filter("sr_hz = 16000")
        .select("clip_id").collect()
    )
    assert victims
    t.delete("sr_hz = 16000", mode="cow")
    got = drain()
    batch = got.filter(
        F.col("_commit_snapshot_id") == t.current_snapshot_id()
    )
    dels = set(_ids(batch, "delete"))
    ins = set(_ids(batch, "insert"))
    assert victims <= dels  # every deleted row streamed as delete
    assert not (victims & ins)  # and never as an insert
    assert dels - victims == ins  # carryovers: delete+insert pairs
    net = (
        got.groupBy("clip_id")
        .agg(F.sum(
            F.when(F.col("_change_type") == "insert", 1).otherwise(-1)
        ).alias("n"))
        .filter(F.col("n") > 0)
    )
    assert net.count() == t.scan().count()


def test_cow_update_stage_exactly_once(spark, cdc_table, tmp_path):
    """COW UPDATE in the ladder: old images stream as deletes, new as
    inserts (updated rows carry the new values), exactly once across
    checkpointed drains."""
    t = cdc_table
    drain = _drainer(spark, t.root, tmp_path)
    drain()
    upd_keys = set(
        r.clip_id for r in t.scan().filter("dur_ms >= 1000")
        .select("clip_id").collect()
    )
    assert upd_keys
    t.update({"transcript": "'cowup'"}, "dur_ms >= 1000", mode="cow")
    got = drain()
    batch = got.filter(
        F.col("_commit_snapshot_id") == t.current_snapshot_id()
    )
    assert upd_keys <= set(_ids(batch, "delete"))
    new_img = batch.filter(
        (F.col("_change_type") == "insert")
        & (F.col("transcript") == "cowup")
    )
    assert set(r.clip_id for r in new_img.select("clip_id").collect()) \
        == upd_keys
    # old images must NOT carry the new value
    assert batch.filter(
        (F.col("_change_type") == "delete")
        & (F.col("transcript") == "cowup")
    ).count() == 0
    n_total = got.count()
    assert drain().count() == n_total  # exactly once: nothing re-emitted
    net = (
        spark.read.parquet(str(tmp_path / "cdc_out"))
        .groupBy("clip_id")
        .agg(F.sum(
            F.when(F.col("_change_type") == "insert", 1).otherwise(-1)
        ).alias("n"))
        .filter(F.col("n") > 0)
    )
    assert net.count() == t.scan().count()


def test_changes_is_stream_only(spark, cdc_table):
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import AnalysisException

    with pytest.raises((AnalysisException, Py4JJavaError, Exception),
                       match="STREAMING|changes"):
        (
            spark.read.format("lakehouse")
            .option("changes", "true")
            .load(cdc_table.root)
            .collect()
        )


def test_checkpoint_restart_resumes_cdc(spark, cdc_table, tmp_path):
    """A delete landing between drains arrives exactly once, from the
    checkpointed offset (new reader instance each drain)."""
    t = cdc_table
    drain = _drainer(spark, t.root, tmp_path)
    assert drain().count() == 100
    t.delete("dur_ms < 500", mode="mor-pos")
    n_dead = 100 - t.scan().count()
    got = drain()
    assert got.filter(F.col("_change_type") == "delete").count() == n_dead
    # idempotent: nothing new -> nothing re-emitted
    assert drain().count() == got.count()


def test_cdc_replication_mirrors_the_source(spark, cdc_table, tmp_path):
    """CDC stream + replicate_batch = lakehouse-to-lakehouse
    replication: the mirror's logical rows equal the source's after
    every drain, through appends, MoR upserts and deletes, across
    checkpointed restarts."""
    from lakehouse.streaming import replicate_batch

    src = cdc_table
    dst = Table.create(spark, str(tmp_path / "mirror"), CLIPS_SCHEMA)
    ckpt = str(tmp_path / "repl_ckpt")
    sink = replicate_batch(dst)

    def drain():
        q = (
            spark.readStream.format("lakehouse")
            .option("changes", "true")
            .option("start", "beginning")
            .load(src.root)
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    def assert_mirror():
        a, b = src.scan(), dst.scan()
        assert a.exceptAll(b).count() == 0
        assert b.exceptAll(a).count() == 0

    drain()
    assert_mirror()

    # churn: upsert 10 keys + insert 5 new + delete 8, then replicate
    keys = [r[0] for r in src.scan().select("clip_id").limit(10).collect()]
    upd = (
        src.scan()
        .filter(F.col("clip_id").isin(keys))
        .withColumn("transcript", F.lit("v2"))
    )
    src.merge(
        upd.unionByName(
            synth_clips_df(spark, 5, start=700, seed=33, n_days=1)
        ),
        mode="mor",
    )
    src.delete("dur_ms < 700", mode="mor-pos")
    drain()
    assert_mirror()
    assert (
        dst.scan().filter(F.col("transcript") == "v2").count() == 10
    )
    # replay: nothing new, mirror unchanged (batch-id idempotency)
    n_snaps = len(dst.snapshots())
    drain()
    assert len(dst.snapshots()) == n_snaps
    assert_mirror()
