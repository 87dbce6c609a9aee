"""MaterializedTransform: incremental derived-feature tables.

The gate everywhere: after any base DML sequence, refresh() must leave
scan() row-for-row equal to expected() (the full recompute) while the
result object proves the incremental path actually ran.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lakehouse import Table
from lakehouse.schema import CLIPS_SCHEMA

DATE_SPEC = [
    {"name": "event_date", "transform": "identity", "source": "event_date"}
]
from lakehouse.synth import synth_clips_df
from lakehouse.transform import MaterializedTransform, register_transform


def _mk_base(spark, tmp_path, n=96, seed=3):
    t = Table.create(
        spark,
        str(tmp_path / "base"),
        CLIPS_SCHEMA,
        partition_spec=DATE_SPEC,
    )
    t.append(synth_clips_df(spark, n, seed=seed, n_days=4),
             target_file_count=6)
    return t


def _assert_parity(mt):
    got, exp = mt.scan(), mt.expected()
    assert got.count() == exp.count()
    assert got.exceptAll(exp).isEmpty()
    assert exp.exceptAll(got).isEmpty()


def test_expr_transform_incremental_parity(spark, tmp_path):
    base = _mk_base(spark, tmp_path)
    mt = MaterializedTransform.create(
        spark,
        str(tmp_path / "feat"),
        base,
        key="clip_id",
        columns=["clip_id", "dur_ms", "transcript"],
        exprs={
            "dur_s": "dur_ms / 1000.0",
            "n_words": "size(split(transcript, ' '))",
        },
    )
    # the MoR delete below is "table-wide" at this file count and the
    # cost guard would (correctly) resync; disable it to exercise the
    # incremental CDC fold-in itself
    mt.table.set_properties(transform_resync_cost_ratio="off")
    assert mt.refresh().mode == "full"
    _assert_parity(mt)
    # second refresh with no base change is a no-op
    assert mt.refresh().mode == "noop"

    # append + MoR delete, then one incremental refresh
    base.append(synth_clips_df(spark, 32, seed=9, n_days=4, start=100_000))
    base.delete("dur_ms % 3 = 0", mode="mor", key="clip_id")
    res = mt.refresh()
    assert res.mode == "incremental"
    assert res.rows_upserted > 0 and res.rows_deleted > 0
    _assert_parity(mt)


def test_update_rows_are_upserted_not_duplicated(spark, tmp_path):
    base = _mk_base(spark, tmp_path, n=48)
    mt = MaterializedTransform.create(
        spark,
        str(tmp_path / "feat"),
        base,
        key="clip_id",
        columns=["clip_id", "transcript"],
        exprs={"n_words": "size(split(transcript, ' '))"},
    )
    mt.refresh()
    # change payloads in place: transcript gains a word for a slice
    base.update(
        {"transcript": "concat(transcript, ' extra')"},
        "dur_ms % 5 = 0",
    )
    res = mt.refresh()
    assert res.mode == "incremental"
    assert res.rows_upserted > 0 and res.rows_deleted == 0
    _assert_parity(mt)
    # keys stayed unique
    n = mt.scan().count()
    assert mt.scan().select("clip_id").distinct().count() == n


def test_named_transform_roundtrips_registry(spark, tmp_path):
    base = _mk_base(spark, tmp_path, n=32)
    mt = MaterializedTransform.create(
        spark,
        str(tmp_path / "feat"),
        base,
        key="clip_id",
        columns=["clip_id", "bytes"],
        transform="audio_stats",
    )
    mt.refresh()
    # a FRESH handle (new object, props-only knowledge) keeps maintaining
    mt2 = MaterializedTransform(spark, mt.table.root)
    base.append(synth_clips_df(spark, 16, seed=21, n_days=4, start=200_000))
    res = mt2.refresh()
    assert res.mode == "incremental" and res.rows_upserted == 16
    _assert_parity(mt2)
    row = mt2.scan().filter("NOT ok").count()
    assert row == 0  # all synth clips decode


def test_expired_sync_snapshot_triggers_full_resync(spark, tmp_path):
    base = _mk_base(spark, tmp_path, n=48)
    mt = MaterializedTransform.create(
        spark,
        str(tmp_path / "feat"),
        base,
        key="clip_id",
        columns=["clip_id", "dur_ms"],
        exprs={"dur_s": "dur_ms / 1000.0"},
    )
    mt.refresh()
    # rewrite history enough that the synced snapshot expires
    base.append(synth_clips_df(spark, 16, seed=5, n_days=4, start=300_000))
    base.compact()
    base.expire_snapshots(keep_last=1)
    res = mt.refresh()
    assert res.mode == "full-resync"
    _assert_parity(mt)
    # and maintenance continues incrementally afterwards
    base.append(synth_clips_df(spark, 8, seed=6, n_days=4, start=400_000))
    assert mt.refresh().mode == "incremental"
    _assert_parity(mt)


def test_create_validation(spark, tmp_path):
    base = _mk_base(spark, tmp_path, n=8)
    with pytest.raises(ValueError, match="exactly one"):
        MaterializedTransform.create(
            spark, str(tmp_path / "x"), base, key="clip_id",
            columns=["clip_id"],
        )
    with pytest.raises(ValueError, match="include the key"):
        MaterializedTransform.create(
            spark, str(tmp_path / "x"), base, key="clip_id",
            columns=["dur_ms"], exprs={"d": "dur_ms"},
        )
    with pytest.raises(ValueError, match="unknown transform"):
        MaterializedTransform.create(
            spark, str(tmp_path / "x"), base, key="clip_id",
            columns=["clip_id"], transform="nope",
        )
    with pytest.raises(ValueError, match="not in base schema"):
        MaterializedTransform.create(
            spark, str(tmp_path / "x"), base, key="clip_id",
            columns=["clip_id", "missing"], exprs={"d": "1"},
        )
    # custom registration must retain the key
    register_transform("drops_key", lambda df: df.select("bytes"))
    with pytest.raises(ValueError, match="retain key"):
        MaterializedTransform.create(
            spark, str(tmp_path / "x"), base, key="clip_id",
            columns=["clip_id", "bytes"], transform="drops_key",
        )


def test_mfcc_transform_registered(spark, tmp_path):
    base = _mk_base(spark, tmp_path, n=12)
    mt = MaterializedTransform.create(
        spark,
        str(tmp_path / "emb"),
        base,
        key="clip_id",
        columns=["clip_id", "bytes"],
        transform="mfcc_embedding",
    )
    assert mt.refresh().mode == "full"
    rows = mt.scan().select("clip_id", "embedding").collect()
    assert len(rows) == 12
    assert all(r.embedding is not None and len(r.embedding) == 12
               for r in rows)  # 13 mfcc - c0


def test_refresh_merge_kwargs_route_to_mor(spark, tmp_path):
    """refresh(mode=\"mor\") routes the CDC fold-in through the
    merge-on-read MERGE: same parity, zero data-file rewrites in the
    refresh commit (deletes become delete files)."""
    base = _mk_base(spark, tmp_path, n=48)
    mt = MaterializedTransform.create(
        spark,
        str(tmp_path / "feat"),
        base,
        key="clip_id",
        columns=["clip_id", "dur_ms"],
        exprs={"dur_s": "dur_ms / 1000.0"},
    )
    mt.table.set_properties(transform_resync_cost_ratio="off")
    mt.refresh()
    files_before = {e.file_path for e in mt.table.live_files()}
    # base churn that produces BOTH upserts and deletes
    base.delete("dur_ms % 3 = 0", mode="mor", key="clip_id")
    base.append(synth_clips_df(spark, 16, seed=9, n_days=4, start=100_000))
    res = mt.refresh(mode="mor")
    assert res.mode == "incremental"
    assert res.rows_upserted > 0 and res.rows_deleted > 0
    _assert_parity(mt)
    # MoR refresh never rewrote a pre-existing derived data file
    files_after = {e.file_path for e in mt.table.live_files()}
    assert files_before <= files_after


def test_pq_code_transform_incremental_index(spark, tmp_path):
    """The registered ``pq_code`` extractor maintains a PQ ANN index as
    a derived table: appends encode only the new vectors (incremental
    mode), deletes drop their codes, and the final index equals a fresh
    full encode of the live base rows."""
    from lakehouse.similarity import pq_encode

    emb = spark.range(120).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(64)),
            lambda i: (
                F.sin(F.col("id").cast("double") * i.cast("double"))
            ).cast("float"),
        ).alias("embedding"),
    )
    base = Table.create(spark, str(tmp_path / "emb"), emb.schema)
    base.append(emb)
    mt = MaterializedTransform.create(
        spark,
        str(tmp_path / "pq"),
        base,
        key="vec_id",
        columns=["vec_id", "embedding"],
        transform="pq_code",
    )
    mt.table.set_properties(transform_resync_cost_ratio="off")
    assert mt.refresh().mode == "full"

    base.append(
        emb.filter(F.col("vec_id") < 30).withColumn(
            "vec_id", F.col("vec_id") + 1000
        )
    )
    base.delete("vec_id % 10 = 1", mode="mor", key="vec_id")
    res = mt.refresh()
    assert res.mode == "incremental", res
    assert res.rows_upserted == 27 and res.rows_deleted > 0, res

    got = {
        r.vec_id: list(r.pq_code) for r in mt.scan().collect()
    }
    fresh = {
        r.vec_id: list(r.pq_code)
        for r in pq_encode(base.scan()).collect()
    }
    assert got == fresh and len(got) == 120 + 30 - 12 - 3
    _assert_parity(mt)
