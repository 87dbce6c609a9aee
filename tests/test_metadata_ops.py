"""Manifest rewrite + replace-commit conflict detection + lineage log."""

import pytest

from lakehouse import CommitConflictError
from tests.test_maintenance import make_small_file_table, scan_fingerprint


def test_rewrite_manifests_compacts_metadata(spark, table_root):
    t = make_small_file_table(spark, table_root, rows=120, appends=4)
    from lakehouse.meta import snapshots as S

    snap = t.meta.snapshot()
    before = len(S.read_manifest_list(t.root, snap.manifest_list))
    assert before == 4  # one manifest per append
    fp = scan_fingerprint(t)

    res = t.rewrite_manifests()
    assert res.manifests_before == 4
    assert res.manifests_after < before
    assert scan_fingerprint(t) == fp
    # planning still prunes identically
    import datetime as dt

    plan = t.plan(filter=[("event_date", "=", dt.date(2024, 1, 1))])
    assert 0 < len(plan.files) < plan.candidate_files


def test_replace_commit_conflict_on_stale_files(spark, table_root):
    """Two compactions planned from the same snapshot: the loser must get
    CommitConflictError, not silently resurrect rewritten files."""
    t = make_small_file_table(spark, table_root, rows=120, appends=4)
    live = t.live_files()
    victim = live[0].file_path

    # winner: a real compaction rewrites everything
    t.compact(target_file_size=64 * 1024 * 1024)

    # loser: tries to commit a REPLACE of a file that is no longer live
    with pytest.raises(CommitConflictError, match="no longer live"):
        t._commit_files("replace", [], [victim])


def test_lineage_records_are_complete(spark, table_root):
    t = make_small_file_table(spark, table_root, rows=120, appends=3)
    res = t.compact(target_file_size=64 * 1024 * 1024, job_id="lineage-check")

    from lakehouse.lineage import LineageLog

    log = LineageLog(t.root, "lineage-check")
    job = log.job_record()
    assert job["op"] == "compact" and job["status"] == "DONE"
    tasks = log.done_tasks()
    assert len(tasks) == res.bins
    for rec in tasks.values():
        assert rec.files_in and rec.files_out
        assert rec.bytes_in > 0 and rec.bytes_out > 0
        assert rec.records_out > 0
    total_out = sum(r.records_out for r in tasks.values())
    assert total_out == res.records_rewritten


def test_analyze_kmv_ndv(spark, table_root):
    """KMV sketches: exact below k, ~3% at k=1024 above it, mergeable,
    and approx_ndv answers from the persisted file with zero scan."""
    from lakehouse import CLIPS_SCHEMA, Table
    from lakehouse.ops.analyze import merge_sketches, read_stats
    from lakehouse.synth import synth_clips_df

    t = Table.create(spark, table_root, CLIPS_SCHEMA)
    t.append(synth_clips_df(spark, 300, seed=3, n_days=5))

    res = t.analyze(["clip_id", "sr_hz", "event_date"])
    # 300 distinct ids < k -> hash-exact
    assert res["clip_id"].exact and res["clip_id"].ndv == 300
    exact_sr = t.scan().select("sr_hz").distinct().count()
    assert res["sr_hz"].ndv == exact_sr
    # persisted: readable at the snapshot, answered without a scan
    sid, stats = read_stats(t.root, at_or_before=t.current_snapshot_id())
    assert sid == t.current_snapshot_id()
    assert t.approx_ndv("clip_id") == 300

    # estimator path (distinct > k): small k forces estimation
    est = t.analyze(["clip_id"], k=64)["clip_id"]
    assert not est.exact
    assert abs(est.ndv - 300) / 300 < 0.35  # 1/sqrt(62) ~ 13% expected

    # mergeability: sketch(first half) ∪ sketch(second half) ==
    # sketch(all) at the same k
    a, b = res["clip_id"], t.analyze(["clip_id"])["clip_id"]
    m = merge_sketches(a, b)
    assert m.ndv == 300 and m.exact


def test_manifests_and_refs_metadata_tables(spark, tmp_path):
    """manifests_df reads list summaries only (zero file I/O); refs_df
    materializes main + named refs."""
    from lakehouse import Table
    from lakehouse.synth import synth_clips_df

    df = synth_clips_df(spark, 40, seed=2, n_days=2)
    t = Table.create(spark, str(tmp_path / "m"), df.schema)
    t.append(df, target_file_count=3)
    t.append(synth_clips_df(spark, 20, seed=3, n_days=2, start=40),
             target_file_count=2)

    m = t.manifests_df().collect()
    assert len(m) == 2  # one manifest per append
    assert sum(r.entry_count for r in m) == 5
    assert sum(r.record_count for r in m) == 60
    assert all(r.delete_count == 0 for r in m)

    t.create_tag("v1")
    t.create_branch("dev")
    refs = {r.name: (r.type, r.snapshot_id) for r in t.refs_df().collect()}
    assert set(refs) == {"main", "v1", "dev"}
    assert refs["main"][0] == "branch"
    assert refs["v1"] == ("tag", t.current_snapshot_id())

    # empty table: empty frames, stable schema
    e = Table.create(spark, str(tmp_path / "e"), df.schema)
    assert e.manifests_df().count() == 0
    assert e.refs_df().count() == 0
