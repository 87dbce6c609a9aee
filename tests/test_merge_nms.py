"""MERGE ... WHEN NOT MATCHED BY SOURCE (Delta's
whenNotMatchedBySourceDelete / -Update analog; the reference delegates
row-level DML to the Delta jar, /root/reference/README.md:194).

Covers: full-sync delete (no condition) via metadata-only drops,
condition-scoped delete (tuple condition → pruning + whole-file drops,
out-of-scope files untouched), boundary-file rewrites, the update-set
form, the MoR delete variant (keys-only, zero target data removals),
the guard rails (MoR update refusal), and serializable isolation over
the clause's condition-domain read set.
"""

import pyspark.sql.functions as F
import pytest

from lakehouse import CLIPS_SCHEMA, Table
from lakehouse.errors import MergeError
from lakehouse.synth import synth_clips_pdf


def _mk_table(spark, root, n=60, files=3):
    t = Table.create(spark, str(root), CLIPS_SCHEMA)
    pdf = synth_clips_pdf(range(n), seed=42, n_days=2)
    t.append(
        spark.createDataFrame(pdf, schema=CLIPS_SCHEMA),
        target_file_count=files,
    )
    return t


def _ids(t_or_df):
    df = t_or_df.scan() if isinstance(t_or_df, Table) else t_or_df
    return sorted(r.clip_id for r in df.select("clip_id").collect())


def _src_slice(t, ids, codec="upd"):
    return (
        t.scan()
        .filter(F.col("clip_id").isin(list(ids)))
        .withColumn("codec", F.lit(codec))
    )


class TestCowNms:
    def test_full_sync_no_condition(self, spark, tmp_path):
        t = _mk_table(spark, tmp_path / "t")
        keep = _ids(t)[10:20]
        t.merge(
            _src_slice(t, keep),
            key="clip_id",
            not_matched_by_source="delete",
        )
        out = t.scan()
        assert _ids(out) == sorted(keep)
        assert out.filter(F.col("codec") != "upd").count() == 0
        # every original file vanished metadata-only: the closed form
        # emits source rows only, no target file is read or rewritten
        summ = t.meta.snapshots[-1].summary
        assert int(summ.get("nms_files_dropped", 0)) == 3
        assert int(summ.get("files_touched", -1)) == 0

    def test_condition_scoped_delete_prunes(self, spark, tmp_path):
        t = Table.create(spark, str(tmp_path / "t"), CLIPS_SCHEMA)
        pdf = synth_clips_pdf(range(60), seed=42, n_days=2)
        df = spark.createDataFrame(pdf, schema=CLIPS_SCHEMA)
        ids = sorted(pdf.clip_id)
        lo_ids, hi_ids = ids[:30], ids[30:]
        lo = df.filter(F.col("clip_id").isin(lo_ids)).withColumn(
            "sr_hz", F.lit(8000)
        )
        hi = df.filter(F.col("clip_id").isin(hi_ids)).withColumn(
            "sr_hz", F.lit(16000)
        )
        # two appends → sr-disjoint files; the 16 kHz file must stay out
        # of the sync's way entirely
        t.append(lo, target_file_count=1)
        t.append(hi, target_file_count=1)
        before = {e.file_path for e in t.plan().files}
        hi_file = {
            e.file_path
            for e in t.plan(filter=[("sr_hz", "=", 16000)]).files
        }
        src = _src_slice(t, lo_ids[:10])
        t.merge(
            src,
            key="clip_id",
            not_matched_by_source="delete",
            not_matched_by_source_condition=[("sr_hz", "=", 8000)],
        )
        out = t.scan()
        # 8 kHz domain synced to source; 16 kHz rows untouched
        assert out.filter("sr_hz = 8000").count() == 10
        assert out.filter("sr_hz = 8000 AND codec <> 'upd'").count() == 0
        assert out.filter("sr_hz = 16000").count() == 30
        after = {e.file_path for e in t.plan().files}
        # the out-of-condition file survived the commit untouched
        assert hi_file <= after
        # the fully-in-condition file was dropped metadata-only
        summ = t.meta.snapshots[-1].summary
        assert int(summ.get("nms_files_dropped", 0)) == 1
        assert (before - after) != set()

    def test_boundary_file_rewrites(self, spark, tmp_path):
        # one file mixes in- and out-of-condition rows → rewrite, with
        # only the in-condition unmatched rows deleted
        t = Table.create(spark, str(tmp_path / "t"), CLIPS_SCHEMA)
        pdf = synth_clips_pdf(range(40), seed=42, n_days=2)
        df = spark.createDataFrame(pdf, schema=CLIPS_SCHEMA)
        ids = sorted(pdf.clip_id)
        df = df.withColumn(
            "sr_hz",
            F.when(F.col("clip_id").isin(ids[:20]), 8000).otherwise(16000),
        )
        t.append(df, target_file_count=1)
        src = _src_slice(t, ids[:5])
        t.merge(
            src,
            key="clip_id",
            not_matched_by_source="delete",
            not_matched_by_source_condition=[("sr_hz", "=", 8000)],
        )
        out = t.scan()
        assert out.count() == 25  # 5 synced + 20 out-of-condition
        assert out.filter("sr_hz = 8000").count() == 5
        summ = t.meta.snapshots[-1].summary
        assert int(summ.get("nms_files_dropped", 0)) == 0

    def test_update_set_form(self, spark, tmp_path):
        t = _mk_table(spark, tmp_path / "t", n=30, files=1)
        ids = _ids(t)
        cond = f"clip_id >= '{ids[20]}'"
        t.merge(
            _src_slice(t, ids[:10]),
            key="clip_id",
            not_matched_by_source={"codec": "'stale'"},
            not_matched_by_source_condition=cond,
        )
        out = t.scan()
        assert out.count() == 30
        assert out.filter("codec = 'upd'").count() == 10
        assert out.filter("codec = 'stale'").count() == 10
        # the middle band: unmatched but outside the condition → intact
        assert (
            out.filter(
                f"clip_id >= '{ids[10]}' AND clip_id < '{ids[20]}'"
                " AND codec NOT IN ('upd','stale')"
            ).count()
            == 10
        )

    def test_sql_string_condition(self, spark, tmp_path):
        t = _mk_table(spark, tmp_path / "t", n=30, files=1)
        ids = _ids(t)
        t.merge(
            _src_slice(t, ids[:10]),
            key="clip_id",
            not_matched_by_source="delete",
            not_matched_by_source_condition=f"clip_id >= '{ids[25]}'",
        )
        assert t.scan().count() == 25  # 30 - 5 deleted

    def test_source_deletes_interplay(self, spark, tmp_path):
        t = _mk_table(spark, tmp_path / "t", n=30, files=1)
        ids = _ids(t)
        src = _src_slice(t, ids[:10]).withColumn(
            "op",
            F.when(F.col("clip_id").isin(ids[:3]), "delete").otherwise(
                F.lit(None).cast("string")
            ),
        )
        t.merge(src, key="clip_id", not_matched_by_source="delete")
        # matched deletes vanish, matched updates survive, unmatched die
        assert t.scan().count() == 7

    def test_guards(self, spark, tmp_path):
        t = _mk_table(spark, tmp_path / "t", n=10, files=1)
        src = _src_slice(t, _ids(t)[:4])
        with pytest.raises(MergeError, match="unknown"):
            t.merge(
                src,
                key="clip_id",
                not_matched_by_source={"nope": "'x'"},
            )
        with pytest.raises(MergeError, match="without"):
            t.merge(
                src,
                key="clip_id",
                not_matched_by_source_condition="sr_hz = 1",
            )


class TestMorNms:
    def test_mor_full_sync(self, spark, tmp_path):
        t = _mk_table(spark, tmp_path / "t")
        keep = _ids(t)[10:20]
        r = t.merge(
            _src_slice(t, keep),
            key="clip_id",
            mode="mor",
            not_matched_by_source="delete",
        )
        out = t.scan()
        assert _ids(out) == sorted(keep)
        assert out.filter(F.col("codec") != "upd").count() == 0
        # zero target data files read or removed: pure MoR
        assert r.files_touched == 0
        summ = t.meta.snapshots[-1].summary
        assert int(summ["nms_keys_deleted"]) == 50
        # the fold-in agrees
        t.materialize_deletes()
        assert _ids(t) == sorted(keep)

    def test_mor_condition(self, spark, tmp_path):
        t = _mk_table(spark, tmp_path / "t", n=30, files=2)
        ids = _ids(t)
        t.merge(
            _src_slice(t, ids[:5]),
            key="clip_id",
            mode="mor",
            not_matched_by_source="delete",
            not_matched_by_source_condition=f"clip_id >= '{ids[25]}'",
        )
        assert t.scan().count() == 25

    def test_mor_empty_source_still_syncs(self, spark, tmp_path):
        t = _mk_table(spark, tmp_path / "t", n=10, files=1)
        ids = _ids(t)
        src = t.scan().filter("1 = 0")
        t.merge(
            src,
            key="clip_id",
            mode="mor",
            not_matched_by_source="delete",
            not_matched_by_source_condition=f"clip_id < '{ids[4]}'",
        )
        assert t.scan().count() == 6

    def test_mor_update_refused(self, spark, tmp_path):
        t = _mk_table(spark, tmp_path / "t", n=10, files=1)
        src = _src_slice(t, _ids(t)[:4])
        with pytest.raises(MergeError, match="copy-on-write"):
            t.merge(
                src,
                key="clip_id",
                mode="mor",
                not_matched_by_source={"codec": "'x'"},
            )

    def test_cow_mor_parity(self, spark, tmp_path):
        """Same merge through both modes lands the same row set."""
        t1 = _mk_table(spark, tmp_path / "a", n=40, files=2)
        t2 = _mk_table(spark, tmp_path / "b", n=40, files=2)
        ids = _ids(t1)
        kw = dict(
            key="clip_id",
            not_matched_by_source="delete",
            not_matched_by_source_condition=f"clip_id < '{ids[30]}'",
        )
        t1.merge(_src_slice(t1, ids[5:15]), **kw)
        t2.merge(_src_slice(t2, ids[5:15]), mode="mor", **kw)
        a = sorted(
            t1.scan().select("clip_id", "codec").collect(),
            key=lambda r: r[0],
        )
        b = sorted(
            t2.scan().select("clip_id", "codec").collect(),
            key=lambda r: r[0],
        )
        assert a == b


class TestNmsReviewFindings:
    """Regression tests from the session-6 code review."""

    def test_null_condition_rows_survive_cow_delete(self, spark, tmp_path):
        """SQL three-valued logic: the clause fires only where the
        condition is TRUE — unmatched rows whose condition column is
        NULL must survive (previously ~cond deleted them)."""
        t = Table.create(spark, str(tmp_path / "t"), CLIPS_SCHEMA)
        pdf = synth_clips_pdf(range(20), seed=42, n_days=2)
        df = spark.createDataFrame(pdf, schema=CLIPS_SCHEMA)
        ids = sorted(pdf.clip_id)
        df = df.withColumn(
            "sr_hz",
            F.when(F.col("clip_id").isin(ids[:5]), F.lit(None).cast("int"))
            .otherwise(F.col("sr_hz")),
        )
        t.append(df, target_file_count=1)
        src = _src_slice(t, ids[15:])
        t.merge(
            src,
            key="clip_id",
            not_matched_by_source="delete",
            not_matched_by_source_condition="sr_hz > 0",  # NULL for ids[:5]
        )
        out = t.scan()
        # NULL-sr rows kept, condition-true unmatched rows deleted,
        # matched rows replaced
        assert out.filter("sr_hz IS NULL").count() == 5
        assert out.count() == 10  # 5 NULL + 5 matched

    def test_empty_string_condition_refused(self, spark, tmp_path):
        t = _mk_table(spark, tmp_path / "t", n=10, files=1)
        src = _src_slice(t, _ids(t)[:3])
        with pytest.raises(MergeError, match="empty"):
            t.merge(
                src,
                key="clip_id",
                not_matched_by_source="delete",
                not_matched_by_source_condition="   ",
            )

    def test_mor_null_key_rows_refused(self, spark, tmp_path):
        """Equality deletes can't retire NULL-key rows — the MoR NMS
        path must refuse instead of silently diverging from COW."""
        t = Table.create(spark, str(tmp_path / "t"), CLIPS_SCHEMA)
        pdf = synth_clips_pdf(range(10), seed=42, n_days=2)
        df = spark.createDataFrame(pdf, schema=CLIPS_SCHEMA)
        ids = sorted(pdf.clip_id)
        df = df.withColumn(
            "clip_id",
            F.when(F.col("clip_id") == ids[0], F.lit(None)).otherwise(
                F.col("clip_id")
            ),
        )
        t.append(df, target_file_count=1)
        src = (
            t.scan()
            .filter(F.col("clip_id").isin(ids[1:4]))
            .withColumn("codec", F.lit("upd"))
        )
        with pytest.raises(MergeError, match="NULL"):
            t.merge(
                src,
                key="clip_id",
                mode="mor",
                not_matched_by_source="delete",
            )


class TestNmsSerializable:
    """Serializable isolation for NOT MATCHED BY SOURCE (r3 verdict #6
    — previously refused): the clause's read set is its condition
    DOMAIN, validated with the same stats-only overlap test as the key
    range. A concurrent insert INSIDE the domain conflicts; one outside
    commits; unconditional full sync conflicts on any concurrent
    data commit."""

    def _extra(self, t, prefix, n=3):
        import pyspark.sql.functions as F

        return (
            t.scan()
            .orderBy("clip_id")
            .limit(n)
            .withColumn(
                "clip_id", F.concat(F.lit(prefix), F.col("clip_id"))
            )
        )

    @pytest.mark.parametrize("mode", ["cow", "mor"])
    def test_concurrent_insert_inside_domain_conflicts(
        self, spark, tmp_path, mode
    ):
        from lakehouse.errors import CommitConflictError

        t = _mk_table(spark, tmp_path / "t", n=20, files=2)
        src = _src_slice(t, _ids(t)[:10]).localCheckpoint()
        base = t.current_snapshot_id()
        # 'aaa…' ids sort INSIDE the sync domain (< 'x') and OUTSIDE
        # the source key range
        t.append(self._extra(t, "aaa-"), target_file_count=1)
        with pytest.raises(CommitConflictError, match="NOT MATCHED"):
            t.merge(
                src,
                key="clip_id",
                mode=mode,
                isolation="serializable",
                validate_from=base,
                not_matched_by_source="delete",
                not_matched_by_source_condition=[("clip_id", "<", "x")],
            )

    @pytest.mark.parametrize("mode", ["cow", "mor"])
    def test_concurrent_insert_outside_domain_commits(
        self, spark, tmp_path, mode
    ):
        t = _mk_table(spark, tmp_path / "t", n=20, files=2)
        keep = _ids(t)[:10]
        src = _src_slice(t, keep).localCheckpoint()
        base = t.current_snapshot_id()
        # 'zzz…' ids sort OUTSIDE the domain (< 'x' is false) and
        # outside the source key range — stats pruning lets it through
        t.append(self._extra(t, "zzz-"), target_file_count=1)
        res = t.merge(
            src,
            key="clip_id",
            mode=mode,
            isolation="serializable",
            validate_from=base,
            not_matched_by_source="delete",
            not_matched_by_source_condition=[("clip_id", "<", "x")],
        )
        assert res.snapshot_id is not None
        out = _ids(t)
        # zzz rows survive (outside domain); unmatched in-domain gone
        assert [c for c in out if c.startswith("zzz-")]
        assert [c for c in out if not c.startswith("zzz-")] == sorted(keep)

    def test_full_sync_conflicts_on_any_concurrent_commit(
        self, spark, tmp_path
    ):
        from lakehouse.errors import CommitConflictError

        t = _mk_table(spark, tmp_path / "t", n=20, files=2)
        src = _src_slice(t, _ids(t)[:10]).localCheckpoint()
        base = t.current_snapshot_id()
        t.append(self._extra(t, "zzz-"), target_file_count=1)
        # unconditional full sync reads EVERYTHING unmatched — even a
        # disjoint-range concurrent append conflicts
        with pytest.raises(CommitConflictError, match="whole table"):
            t.merge(
                src,
                key="clip_id",
                isolation="serializable",
                validate_from=base,
                not_matched_by_source="delete",
            )
