"""Python DataSource surface: spark.read/readStream.format("lakehouse").

The reference's analysts reach the bronze table through a catalog so any
engine can query it by name (/root/reference/README.md:104-114); these
tests pin our equivalent third surface (after Table.scan and temp
views): registered-format reads, file-pruning pushdown, merge-on-read
delete application, time travel, and snapshot-offset streaming with
checkpoint resume.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lakehouse import Table
from lakehouse.datasource import (
    LakehouseBatchReader,
    LakehousePushdownBatchReader,
    register,
)
from lakehouse.schema import CLIPS_SCHEMA
from lakehouse.synth import synth_clips_df


DATE_SPEC = [
    {"name": "event_date", "transform": "identity", "source": "event_date"}
]


@pytest.fixture()
def clips_table(spark, table_root):
    register(spark)
    t = Table.create(
        spark, table_root, CLIPS_SCHEMA, partition_spec=DATE_SPEC
    )
    t.append(
        synth_clips_df(spark, 300, seed=11, n_days=3), target_file_count=6
    )
    return t


def _assert_same_rows(a, b):
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_batch_read_matches_native_scan(spark, clips_table):
    df = spark.read.format("lakehouse").load(clips_table.root)
    assert df.count() == 300
    _assert_same_rows(df, clips_table.scan())


def test_batch_read_applies_mor_deletes(spark, clips_table):
    res = clips_table.delete("dur_ms < 1500", mode="mor", key="clip_id")
    assert res.keys_deleted > 0
    df = spark.read.format("lakehouse").load(clips_table.root)
    _assert_same_rows(df, clips_table.scan())
    assert df.filter("dur_ms < 1500").count() == 0


def test_batch_read_mixed_key_mor_deletes(spark, clips_table):
    """Two pending MoR deletes on DIFFERENT key columns: each must be
    applied against its own column (the sequence rule is per delete
    key, like the native reader) — not pooled into one value set."""
    r1 = clips_table.delete("dur_ms < 1500", mode="mor", key="clip_id")
    r2 = clips_table.delete("dur_ms >= 2800", mode="mor", key="dur_ms")
    assert r1.keys_deleted > 0 and r2.keys_deleted > 0
    assert len(clips_table.plan().delete_files) == 2
    df = spark.read.format("lakehouse").load(clips_table.root)
    _assert_same_rows(df, clips_table.scan())
    assert df.filter("dur_ms < 1500 or dur_ms >= 2800").count() == 0
    assert df.count() > 0


def test_batch_read_applies_pos_deletes(spark, clips_table):
    """Pending POSITIONAL deletes are applied inside the Arrow read
    tasks: dead (file_path, row_pos) pairs masked per batch with the
    running row offset, matching the native scan bit for bit."""
    res = clips_table.delete("dur_ms < 1500", mode="mor-pos")
    assert res.keys_deleted > 0
    df = spark.read.format("lakehouse").load(clips_table.root)
    _assert_same_rows(df, clips_table.scan())
    assert df.filter("dur_ms < 1500").count() == 0
    # mixed kinds: an equality delete stacked on top still composes
    clips_table.delete("sr_hz = 8000", mode="mor", key="clip_id")
    df = spark.read.format("lakehouse").load(clips_table.root)
    _assert_same_rows(df, clips_table.scan())
    assert df.filter("dur_ms < 1500 or sr_hz = 8000").count() == 0
    assert df.count() > 0


def test_batch_read_after_cluster_drops_zkey(spark, clips_table):
    """Clustered files carry the hidden physical zkey column; the
    datasource must project it away like the native scan does."""
    clips_table.cluster(["dur_ms", "sr_hz"], curve="zorder")
    df = spark.read.format("lakehouse").load(clips_table.root)
    assert df.columns == [f.name for f in CLIPS_SCHEMA.fields]
    _assert_same_rows(df, clips_table.scan())


def test_filter_pushdown_prunes_files(spark, clips_table):
    """WHERE clauses reach plan_scan: the reader plans fewer input
    files under a selective predicate, and results still match."""
    from pyspark.sql.datasource import EqualTo

    reader = LakehousePushdownBatchReader(clips_table.root, {})
    all_files = sum(len(p.files) for p in reader.partitions())

    pruned = LakehousePushdownBatchReader(clips_table.root, {})
    one_day = clips_table.scan().select("event_date").first()[0]
    kept = pruned.pushFilters([EqualTo(("event_date",), one_day)])
    assert list(kept)  # everything reported back for row-level reapply
    kept_files = sum(len(p.files) for p in pruned.partitions())
    assert 0 < kept_files < all_files

    df = (
        spark.read.format("lakehouse")
        .load(clips_table.root)
        .filter(F.col("event_date") == F.lit(one_day))
    )
    native = clips_table.scan().filter(
        F.col("event_date") == F.lit(one_day)
    )
    _assert_same_rows(df, native)


def test_reads_when_host_session_disables_pushdown(spark, clips_table):
    """Spark 4.1 refuses to build a reader that even *defines*
    pushFilters while spark.sql.python.filterPushdown.enabled is false
    (DATA_SOURCE_PUSHDOWN_DISABLED). register() must detect the conf and
    degrade to the no-pushFilters reader so the format works in ANY host
    session — rows identical, pushdown is only a file-skipping
    optimization. Mirrors the driver harness that surfaced this
    (CORRECTNESS_r02 lh_datasource_scan)."""
    conf_key = "spark.sql.python.filterPushdown.enabled"
    prev = spark.conf.get(conf_key, "true")
    try:
        spark.conf.set(conf_key, "false")
        register(spark)  # re-register: picks the no-pushdown variant
        one_day = clips_table.scan().select("event_date").first()[0]
        df = (
            spark.read.format("lakehouse")
            .load(clips_table.root)
            .filter(F.col("event_date") == F.lit(one_day))
        )
        native = clips_table.scan().filter(
            F.col("event_date") == F.lit(one_day)
        )
        _assert_same_rows(df, native)
        # the degraded reader class must not OVERRIDE pushFilters (the
        # exact check plan_data_source_read.py applies)
        from pyspark.sql.datasource import DataSourceReader

        assert (
            LakehouseBatchReader.pushFilters is DataSourceReader.pushFilters
        )
        # per-read override works in a pushdown-enabled session too
        spark.conf.set(conf_key, "true")
        register(spark)
        df2 = (
            spark.read.format("lakehouse")
            .option("pushdown", "false")
            .load(clips_table.root)
        )
        _assert_same_rows(df2, clips_table.scan())
    finally:
        spark.conf.set(conf_key, prev)
        register(spark)


def test_time_travel_snapshot_and_ref(spark, clips_table):
    s0 = clips_table.current_snapshot_id()
    clips_table.create_tag("v1")
    clips_table.append(
        synth_clips_df(spark, 50, seed=12, n_days=1), target_file_count=1
    )
    cur = spark.read.format("lakehouse").load(clips_table.root)
    pinned = (
        spark.read.format("lakehouse")
        .option("snapshot_id", s0)
        .load(clips_table.root)
    )
    tagged = (
        spark.read.format("lakehouse")
        .option("ref", "v1")
        .load(clips_table.root)
    )
    assert cur.count() == 350
    assert pinned.count() == 300
    assert tagged.count() == 300


def test_schema_evolution_null_fills_old_files(spark, clips_table):
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    wide = T.StructType(
        list(CLIPS_SCHEMA.fields)
        + [T.StructField("lang", T.StringType(), True)]
    )
    new = synth_clips_df(spark, 20, seed=14, n_days=1).withColumn(
        "lang", F.lit("en")
    )
    clips_table.append(new, target_file_count=1, new_schema=wide)
    df = spark.read.format("lakehouse").load(clips_table.root)
    assert "lang" in df.columns
    # 300 pre-evolution rows read back null-filled; 20 new rows carry it
    assert df.filter("lang is null").count() == 300
    assert df.filter("lang = 'en'").count() == 20


def test_empty_table_reads_zero_rows(spark, table_root):
    register(spark)
    Table.create(spark, table_root, CLIPS_SCHEMA)
    df = spark.read.format("lakehouse").load(table_root)
    assert df.count() == 0
    assert df.columns == [f.name for f in CLIPS_SCHEMA.fields]


def test_stream_tail_resumes_from_checkpoint(spark, clips_table, tmp_path):
    """availableNow pass 1 drains history; an append between passes is
    delivered exactly once on pass 2 via the checkpointed offset."""
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    sdf = (
        spark.readStream.format("lakehouse")
        .option("start", "beginning")
        .load(clips_table.root)
        .select("clip_id")
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

    drain()
    assert spark.read.parquet(out).count() == 300
    clips_table.append(
        synth_clips_df(spark, 40, start=300, seed=13, n_days=1),
        target_file_count=2,
    )
    drain()
    got = spark.read.parquet(out)
    assert got.count() == 340
    # exactly once: no clip delivered twice
    assert got.select("clip_id").distinct().count() == 340


def test_write_append_matches_native(spark, clips_table):
    """df.write.format('lakehouse') commits an ACID append whose
    manifests are indistinguishable from Table.append()'s: the native
    scan, the format read, and partition pruning all see the rows."""
    extra = synth_clips_df(spark, 40, start=300, seed=21, n_days=3)
    extra.write.format("lakehouse").mode("append").save(clips_table.root)
    assert clips_table.scan().count() == 340
    df = spark.read.format("lakehouse").load(clips_table.root)
    _assert_same_rows(df, clips_table.scan())
    # the written files carry real footer stats + partition values:
    # a pruned plan over one day must not touch every file
    one_day = (
        clips_table.scan().groupBy("event_date").count().first()["event_date"]
    )
    plan = clips_table.plan(filter=[("event_date", "=", one_day)])
    assert 0 < len(plan.files) < len(clips_table.plan().files)


def test_write_overwrite_replaces_table(spark, clips_table):
    fresh = synth_clips_df(spark, 25, start=1000, seed=22, n_days=2)
    fresh.write.format("lakehouse").mode("overwrite").save(clips_table.root)
    assert clips_table.scan().count() == 25
    # one atomic snapshot: history shows overwrite on top of the appends
    assert clips_table.meta.snapshot(
        clips_table.current_snapshot_id()
    ).operation == "overwrite"
    df = spark.read.format("lakehouse").load(clips_table.root)
    _assert_same_rows(df, clips_table.scan())


def test_write_overwrite_removes_pending_mor_deletes(spark, clips_table):
    clips_table.delete("dur_ms < 1500", mode="mor", key="clip_id")
    assert clips_table.plan().delete_files
    fresh = synth_clips_df(spark, 10, start=2000, seed=23, n_days=1)
    fresh.write.format("lakehouse").mode("overwrite").save(clips_table.root)
    assert clips_table.plan().delete_files == []
    assert clips_table.scan().count() == 10


def test_write_rejects_unknown_columns(spark, clips_table):
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.captured import PythonException

    bad = synth_clips_df(spark, 5, start=400, seed=24).withColumn(
        "rogue", F.lit(1)
    )
    with pytest.raises((PythonException, Py4JJavaError), match="rogue"):
        bad.write.format("lakehouse").mode("append").save(clips_table.root)
    # failed job committed nothing
    assert clips_table.scan().count() == 300


def test_stream_write_sink_idempotent_appends(spark, clips_table, tmp_path):
    """writeStream.format('lakehouse'): each micro-batch is one ACID
    append stamped with its batch id; rerunning from the same checkpoint
    delivers no duplicates."""
    src = synth_clips_df(spark, 60, start=500, seed=25, n_days=2)
    src_dir = str(tmp_path / "src")
    src.write.parquet(src_dir)
    sdf = spark.readStream.schema(src.schema).parquet(src_dir)

    def drain():
        q = (
            sdf.writeStream.format("lakehouse")
            .option("path", clips_table.root)
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    drain()
    assert clips_table.scan().count() == 360
    summaries = [s.summary or {} for s in clips_table.snapshots()]
    assert any("stream_batch_id" in s for s in summaries)
    drain()  # no new data, no new rows
    assert clips_table.scan().count() == 360
    assert (
        clips_table.scan().select("clip_id").distinct().count() == 360
    )


def test_stream_raises_on_row_changing_snapshot(spark, clips_table, tmp_path):
    from pyspark.errors.exceptions.captured import StreamingQueryException

    clips_table.delete("dur_ms < 1000", mode="cow")
    sdf = (
        spark.readStream.format("lakehouse")
        .option("start", "beginning")
        .load(clips_table.root)
    )
    q = (
        sdf.writeStream.format("noop")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(StreamingQueryException, match="row-changing"):
        q.awaitTermination(120)


def test_stream_rate_limit_bounds_each_microbatch(
    spark, tmp_path, table_root
):
    """max_snapshots_per_batch=1: an availableNow catch-up over 3
    append snapshots must run 3 bounded micro-batches (one snapshot
    each), not one giant batch — the offset log records each step."""
    import os

    register(spark)
    t = Table.create(spark, table_root, CLIPS_SCHEMA)
    for i in range(3):
        t.append(synth_clips_df(spark, 20, seed=i, n_days=2, start=20 * i))
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def drain():
        q = (
            spark.readStream.format("lakehouse")
            .option("start", "beginning")
            .option("max_snapshots_per_batch", "1")
            .load(t.root)
            .select("clip_id")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        return spark.read.parquet(out).count()

    # each availableNow drain advances exactly ONE snapshot (the rate
    # limit bounds the batch), resuming from the checkpoint
    assert drain() == 20
    assert drain() == 40
    assert drain() == 60
    assert drain() == 60  # caught up: no further batches
    offsets = [
        n
        for n in os.listdir(os.path.join(ckpt, "offsets"))
        if not n.startswith(".")
    ]
    assert len(offsets) >= 3, offsets
