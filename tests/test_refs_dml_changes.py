"""Branches/tags + WAP, rollback, DELETE/UPDATE, incremental + CDC reads.

These extend the maintenance matrix with the remaining Delta/Iceberg
surface the reference consumes as a black box (SURVEY.md §2 second
table): row-level DML, point-in-time recovery, and incremental
consumption of the bronze table.
"""

import pytest
from pyspark.sql import functions as F

from lakehouse import CLIPS_SCHEMA, Table
from lakehouse.errors import LakehouseError, RefError

from test_maintenance import make_small_file_table, scan_fingerprint


def make_table(spark, root, **kw):
    return make_small_file_table(spark, root, **kw)


# --- refs: branches, tags, WAP, rollback -------------------------------------


def test_branch_append_isolated_then_published(spark, table_root):
    t = make_table(spark, table_root, rows=40, appends=2)
    main_fp = scan_fingerprint(t)
    main_rows = t.scan().count()

    from lakehouse.synth import synth_clips_pdf

    extra = spark.createDataFrame(
        synth_clips_pdf(range(1000, 1010), seed=7, n_days=2),
        schema=CLIPS_SCHEMA,
    )
    t.append(extra, branch="audit")

    # main is untouched; the branch sees base + staged rows
    assert scan_fingerprint(t) == main_fp
    assert t.scan(ref="audit").count() == main_rows + 10

    # audit passes → fast-forward publish
    t.fast_forward("audit", drop=True)
    assert t.scan().count() == main_rows + 10
    assert "audit" not in t.refs()


def test_tag_pins_snapshot_across_expiry(spark, table_root):
    t = make_table(spark, table_root, rows=40, appends=2)
    v1 = t.current_snapshot_id()
    t.create_tag("release-1")
    fp1 = scan_fingerprint(t)
    t.compact(target_file_size=1 << 30)
    t.expire_snapshots(keep_last=1)
    # the tag kept its snapshot alive and readable
    assert scan_fingerprint(t, ref="release-1") == fp1
    assert t.refs()["release-1"]["snapshot_id"] == v1


def test_fast_forward_rejects_diverged_main(spark, table_root):
    t = make_table(spark, table_root, rows=40, appends=2)
    from lakehouse.synth import synth_clips_pdf

    t.append(
        spark.createDataFrame(
            synth_clips_pdf(range(2000, 2005), seed=1, n_days=2),
            schema=CLIPS_SCHEMA,
        ),
        branch="wip",
    )
    # main moves past the branch point → fast-forward must refuse
    t.compact(target_file_size=1 << 30)
    with pytest.raises(RefError):
        t.fast_forward("wip")


def test_writing_to_tag_fails(spark, table_root):
    t = make_table(spark, table_root, rows=20, appends=1)
    t.create_tag("pin")
    from lakehouse.synth import synth_clips_pdf

    df = spark.createDataFrame(
        synth_clips_pdf(range(5), seed=1, n_days=1), schema=CLIPS_SCHEMA
    )
    with pytest.raises(RefError):
        t.append(df, branch="pin")


def test_rollback_restores_prior_scan(spark, table_root):
    t = make_table(spark, table_root, rows=40, appends=2)
    v = t.current_snapshot_id()
    fp = scan_fingerprint(t)
    t.delete("dur_ms >= 0")  # wipe everything
    assert t.scan().count() == 0
    t.rollback(v)
    assert scan_fingerprint(t) == fp


# --- DELETE / UPDATE ---------------------------------------------------------


def test_delete_partial_and_metadata_only(spark, table_root):
    t = make_table(spark, table_root, rows=60, appends=3, n_days=2)
    before = {r.clip_id for r in t.scan().select("clip_id").collect()}
    dates = sorted(
        r.event_date for r in t.scan().select("event_date").distinct().collect()
    )
    gone_date = dates[0]

    # partition-wide delete -> every touched file is a whole-file drop
    res = t.delete([("event_date", "=", str(gone_date))])
    assert res.files_dropped > 0 and res.files_rewritten == 0
    left = t.scan()
    assert left.filter(F.col("event_date") == gone_date).count() == 0

    # row-level delete within files -> rewrite path
    victim = sorted(
        r.clip_id for r in left.select("clip_id").limit(3).collect()
    )[0]
    res2 = t.delete(f"clip_id = '{victim}'")
    assert res2.rows_affected == 1 and res2.files_rewritten == 1
    after = {r.clip_id for r in t.scan().select("clip_id").collect()}
    assert victim not in after
    assert after < before


def test_delete_noop_when_nothing_matches(spark, table_root):
    t = make_table(spark, table_root, rows=20, appends=1)
    v = t.current_snapshot_id()
    res = t.delete("clip_id = 'no-such-clip'")
    assert res.rows_affected == 0
    assert res.snapshot_id is None
    assert t.current_snapshot_id() == v


def test_update_rewrites_only_matching_files(spark, table_root):
    t = make_table(spark, table_root, rows=60, appends=3)
    total = t.scan().count()
    victim = sorted(
        r.clip_id for r in t.scan().select("clip_id").limit(1).collect()
    )[0]
    files_before = {e.file_path for e in t.live_files()}
    res = t.update(
        {"transcript": "concat(transcript, ' [redacted]')"},
        f"clip_id = '{victim}'",
    )
    assert res.rows_affected == 1
    files_after = {e.file_path for e in t.live_files()}
    # untouched files kept their identity (no full-table rewrite)
    assert len(files_before & files_after) == len(files_before) - res.files_rewritten
    assert t.scan().count() == total
    got = (
        t.scan()
        .filter(F.col("clip_id") == victim)
        .select("transcript")
        .collect()[0][0]
    )
    assert got.endswith(" [redacted]")


# --- incremental + CDC -------------------------------------------------------


def test_incremental_scan_returns_only_new_appends(spark, table_root):
    t = make_table(spark, table_root, rows=20, appends=1)
    v0 = t.current_snapshot_id()
    from lakehouse.synth import synth_clips_pdf

    t.append(
        spark.createDataFrame(
            synth_clips_pdf(range(3000, 3010), seed=3, n_days=2),
            schema=CLIPS_SCHEMA,
        )
    )
    t.compact(target_file_size=1 << 30)  # data-neutral, must be skipped
    inc = t.incremental_scan(from_snapshot_id=v0)
    assert inc.count() == 10
    ids = {r.clip_id for r in inc.select("clip_id").collect()}
    assert all(i.split("-")[-1].isdigit() for i in ids)


def test_incremental_scan_raises_on_row_changing_op(spark, table_root):
    t = make_table(spark, table_root, rows=20, appends=1)
    v0 = t.current_snapshot_id()
    victim = t.scan().select("clip_id").limit(1).collect()[0][0]
    t.delete(f"clip_id = '{victim}'")
    with pytest.raises(LakehouseError):
        t.incremental_scan(from_snapshot_id=v0)
    # explicit opt-in replays the delete's surviving rows
    assert t.incremental_scan(
        from_snapshot_id=v0, allow_replays=True
    ).count() >= 0


def test_row_changes_tags_inserts_and_deletes(spark, table_root):
    t = make_table(spark, table_root, rows=20, appends=1)
    v0 = t.current_snapshot_id()
    victim = t.scan().select("clip_id").limit(1).collect()[0][0]
    t.delete(f"clip_id = '{victim}'")
    from lakehouse.synth import synth_clips_pdf

    t.append(
        spark.createDataFrame(
            synth_clips_pdf(range(4000, 4002), seed=4, n_days=1),
            schema=CLIPS_SCHEMA,
        )
    )
    cdc = t.row_changes(from_snapshot_id=v0)
    by_type = {
        r["_change_type"]: r["n"]
        for r in cdc.groupBy("_change_type").agg(F.count("*").alias("n")).collect()
    }
    assert by_type == {"insert": 2, "delete": 1}
    deleted = cdc.filter(F.col("_change_type") == "delete").collect()
    assert deleted[0].clip_id == victim


def test_row_changes_empty_across_compaction(spark, table_root):
    t = make_table(spark, table_root, rows=40, appends=2)
    v0 = t.current_snapshot_id()
    t.compact(target_file_size=1 << 30)
    t.cluster(["clip_id"], target_file_size=1 << 30)
    assert t.row_changes(from_snapshot_id=v0).count() == 0


# --- metadata tables ---------------------------------------------------------


def test_metadata_tables_roundtrip(spark, table_root):
    t = make_table(spark, table_root, rows=40, appends=2)
    f = t.files_df()
    assert f.count() == len(t.live_files())
    agg = f.agg(
        F.sum("record_count").alias("r"), F.sum("file_size_bytes").alias("b")
    ).collect()[0]
    assert agg.r == t.scan().count()
    snaps = t.snapshots_df().collect()
    assert [s.operation for s in snaps] == ["append", "append"]
    parts = t.partitions_df().collect()
    assert sum(p.record_count for p in parts) == agg.r
    hist = t.history()
    assert hist[-1]["snapshot_id"] == t.current_snapshot_id()


# --- INSERT OVERWRITE (partition replacement) --------------------------------


def test_overwrite_dynamic_replaces_only_incoming_partitions(spark, table_root):
    t = make_table(spark, table_root, rows=40, appends=2, n_days=2)
    dates = sorted(
        r.event_date for r in t.scan().select("event_date").distinct().collect()
    )
    d0 = dates[0]
    other_before = t.scan().filter(F.col("event_date") != d0).count()
    src = (
        t.scan()
        .filter(F.col("event_date") == d0)
        .limit(5)
        .withColumn("transcript", F.lit("backfilled"))
    )
    res = t.overwrite_partitions(src)
    assert res.partitions_replaced == 1
    after = t.scan()
    assert after.filter(F.col("event_date") == d0).count() == 5
    assert (
        after.filter(F.col("event_date") == d0)
        .select("transcript").distinct().collect()[0][0]
        == "backfilled"
    )
    assert after.filter(F.col("event_date") != d0).count() == other_before


def test_overwrite_static_guards_against_leaks(spark, table_root):
    t = make_table(spark, table_root, rows=40, appends=2, n_days=2)
    dates = sorted(
        r.event_date for r in t.scan().select("event_date").distinct().collect()
    )
    d0, d1 = dates[0], dates[1]
    # rows from d1 under a filter naming d0 must be rejected
    src = t.scan().filter(F.col("event_date") == d1).limit(3)
    with pytest.raises(ValueError):
        t.overwrite_partitions(
            src, partition_filter=[("event_date", "=", str(d0))]
        )
    # matching rows succeed and clear the whole partition
    src_ok = t.scan().filter(F.col("event_date") == d0).limit(3)
    res = t.overwrite_partitions(
        src_ok, partition_filter=[("event_date", "=", str(d0))]
    )
    assert res.rows_written == 3
    assert t.scan().filter(F.col("event_date") == d0).count() == 3


def test_overwrite_requires_partitioned_table(spark, tmp_path):
    from lakehouse import CLIPS_SCHEMA, Table
    from lakehouse.synth import synth_clips_pdf

    t = Table.create(spark, str(tmp_path / "flat"), CLIPS_SCHEMA)
    df = spark.createDataFrame(
        synth_clips_pdf(range(4), seed=1, n_days=1), schema=CLIPS_SCHEMA
    )
    with pytest.raises(ValueError):
        t.overwrite_partitions(df)


def test_changelog_view_update_pairing(spark, table_root):
    """delete+insert with the same identifier → update_before/after;
    unpaired rows keep insert/delete; untouched rows never appear."""
    from pyspark.sql import functions as F

    from lakehouse import CLIPS_SCHEMA, Table
    from lakehouse.synth import synth_clips_df

    t = Table.create(spark, table_root, CLIPS_SCHEMA)
    t.append(synth_clips_df(spark, 24, seed=5, n_days=3))
    s0 = t.current_snapshot_id()

    # update 4 rows (merge), delete 2 (cow), insert 3 fresh
    upd = (
        t.scan().filter("sr_hz >= 0").limit(4)
        .withColumn("transcript", F.lit("edited"))
    )
    t.merge(upd, key="clip_id")
    victims = [
        r.clip_id
        for r in t.scan().filter("transcript != 'edited'")
        .select("clip_id").limit(2).collect()
    ]
    t.delete([("clip_id", "in", victims)])
    t.append(synth_clips_df(spark, 3, seed=6, n_days=3, start=900))

    clv = t.changelog_view(
        from_snapshot_id=s0,
        identifier_columns=["clip_id"],
        columns=["clip_id", "transcript"],
    )
    rows = clv.collect()
    by_type: dict = {}
    for r in rows:
        by_type.setdefault(r._change_type, []).append(r)
    assert len(by_type.get("update_after", [])) == 4
    assert len(by_type.get("update_before", [])) == 4
    assert all(r.transcript == "edited" for r in by_type["update_after"])
    assert {r.clip_id for r in by_type.get("delete", [])} == set(victims)
    assert len(by_type.get("insert", [])) == 3
    # pairs cover the same identifiers
    assert {r.clip_id for r in by_type["update_after"]} == {
        r.clip_id for r in by_type["update_before"]
    }


# --- cherry-pick: WAP publish after main has moved ---------------------------


def _staged_rows(spark, ids, seed=7):
    from lakehouse.synth import synth_clips_pdf

    return spark.createDataFrame(
        synth_clips_pdf(ids, seed=seed, n_days=2), schema=CLIPS_SCHEMA
    )


def test_cherry_pick_after_main_moved(spark, table_root):
    """Stage an append on an audit branch, let main advance, then
    cherry-pick: fast_forward refuses (diverged), cherry_pick lands the
    staged rows on top of main, re-sequenced to the new snapshot id."""
    t = make_table(spark, table_root, rows=40, appends=2)
    staged_df = _staged_rows(spark, range(1000, 1010))
    staged_ids = {r.clip_id for r in staged_df.select("clip_id").collect()}
    staged = t.append(staged_df, branch="audit")

    t.append(_staged_rows(spark, range(2000, 2005), seed=9))  # main moves
    with pytest.raises(RefError):
        t.fast_forward("audit")

    snap = t.cherry_pick(staged.snapshot_id)
    assert snap.operation == "cherry-pick"
    assert snap.summary["source_snapshot"] == staged.snapshot_id
    assert t.scan().count() == 40 + 5 + 10
    ids = {r.clip_id for r in t.scan().select("clip_id").collect()}
    assert staged_ids <= ids
    # picked entries carry the NEW snapshot's sequence number
    picked = [
        e for e in t.live_files() if e.seq == snap.snapshot_id
    ]
    assert sum(e.record_count for e in picked) == 10


def test_cherry_pick_mor_delete_cannot_claim_picked_rows(spark, table_root):
    """An equality delete committed on main BETWEEN staging and publish
    applies only to older sequence numbers: the picked rows survive the
    older delete even when their keys match its predicate."""
    t = make_table(spark, table_root, rows=40, appends=2)
    staged_df = _staged_rows(spark, range(1000, 1010))
    staged_ids = {r.clip_id for r in staged_df.select("clip_id").collect()}
    staged = t.append(staged_df, branch="wip")
    t.delete("dur_ms >= 0", mode="mor", key="clip_id")  # wipes main
    assert t.scan().count() == 0

    t.cherry_pick(staged.snapshot_id)
    survivors = {r.clip_id for r in t.scan().select("clip_id").collect()}
    # exactly the staged rows: the delete predates them in sequence order
    assert survivors == staged_ids


def test_cherry_pick_child_of_head_is_fast_forward(spark, table_root):
    t = make_table(spark, table_root, rows=20, appends=1)
    staged = t.append(_staged_rows(spark, range(500, 504)), branch="audit")
    n_snaps = len(t.snapshots())
    snap = t.cherry_pick(staged.snapshot_id)
    assert snap.snapshot_id == staged.snapshot_id  # no new snapshot
    assert len(t.snapshots()) == n_snaps
    assert t.scan().count() == 24


def test_cherry_pick_guards(spark, table_root):
    t = make_table(spark, table_root, rows=30, appends=2)
    staged = t.append(_staged_rows(spark, range(700, 705)), branch="audit")
    t.append(_staged_rows(spark, range(800, 803), seed=3))
    t.cherry_pick(staged.snapshot_id)
    # double-pick
    with pytest.raises(RefError):
        t.cherry_pick(staged.snapshot_id)
    # removal-shaped snapshots refuse
    before = t.current_snapshot_id()
    t.compact()
    t.append(_staged_rows(spark, range(900, 902), seed=4))
    rewrite = [s for s in t.snapshots() if s.operation == "replace"][-1]
    with pytest.raises(RefError):
        t.cherry_pick(rewrite.snapshot_id)
    # picking the current head refuses
    with pytest.raises(RefError):
        t.cherry_pick(t.current_snapshot_id())


def test_ref_age_retention_drops_only_aged_refs(spark, table_root):
    """Iceberg max-ref-age-ms: an aged-out tag is dropped during expire
    (same commit releases its pin); fresh refs and refs without a
    policy survive; time travel through the dropped ref's snapshot then
    fails cleanly."""
    import time as _t

    from lakehouse.errors import SnapshotNotFoundError

    t = make_table(spark, table_root, rows=40, appends=2)
    v1 = t.current_snapshot_id()
    t.create_tag("old-release", max_ref_age_ms=1000)
    t.create_tag("forever")  # no policy: immortal
    t.compact(target_file_size=1 << 30)
    now = int(_t.time() * 1000)

    # young ref: nothing to drop yet
    res = t.expire_snapshots(keep_last=1, now_ms=now)
    assert res.dropped_refs == []
    assert v1 in res.surviving_snapshot_ids  # still pinned twice

    # clock advances past the per-ref limit: the aged tag drops and its
    # snapshot expires IN THE SAME commit (forever-tag still pins it!)
    res2 = t.expire_snapshots(keep_last=1, now_ms=now + 5000)
    assert res2.dropped_refs == ["old-release"]
    assert "old-release" not in t.refs() and "forever" in t.refs()
    assert v1 in res2.surviving_snapshot_ids  # "forever" still pins v1

    # drop the immortal ref manually: now the snapshot really expires
    t.drop_ref("forever")
    res3 = t.expire_snapshots(keep_last=1, now_ms=now + 5000)
    assert v1 in res3.expired_snapshot_ids
    with pytest.raises(SnapshotNotFoundError):
        t.scan(snapshot_id=v1).count()


def test_ref_age_call_level_default(spark, table_root):
    """A call-level max_ref_age_ms applies to refs WITHOUT their own
    policy; a per-ref policy overrides it (longer-lived ref survives a
    stricter call default... per Iceberg, per-ref wins)."""
    import time as _t

    t = make_table(spark, table_root, rows=40, appends=2)
    t.create_tag("no-policy")
    t.create_tag("long-lived", max_ref_age_ms=10_000_000)
    now = int(_t.time() * 1000)
    res = t.expire_snapshots(keep_last=1, max_ref_age_ms=1, now_ms=now + 1000)
    assert res.dropped_refs == ["no-policy"]
    assert "long-lived" in t.refs()
