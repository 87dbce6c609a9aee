"""Maintenance autopilot: metadata-only decisions driving the gated
ops (lakehouse/ops/maintain.py)."""

from __future__ import annotations

import pytest

from lakehouse.audio import pcm_sha1
from lakehouse.schema import CLIPS_SCHEMA
from lakehouse.synth import synth_clips_df
from lakehouse.table import Table

from pyspark.sql import functions as F


@pytest.fixture()
def t(spark, table_root):
    t = Table.create(spark, table_root, CLIPS_SCHEMA)
    # many tiny appends -> plenty of small files
    for i in range(4):
        t.append(
            synth_clips_df(spark, 16, seed=i, n_days=2, start=16 * i),
            files_per_partition=2,
        )
    return t


def test_dry_run_reports_without_acting(spark, t):
    before = t.current_snapshot_id()
    rep = t.maintain(dry_run=True, min_small_files=4)
    assert rep.dry_run and rep.took("compact")
    assert t.current_snapshot_id() == before  # nothing executed


def test_compacts_when_small_files_accumulate(spark, t):
    files_before = len(t.plan().files)
    sha_before = sorted(
        r.h for r in t.scan().select(pcm_sha1(F.col("bytes")).alias("h")).collect()
    )
    rep = t.maintain(min_small_files=4)
    assert rep.took("compact")
    assert len(t.plan().files) < files_before
    sha_after = sorted(
        r.h for r in t.scan().select(pcm_sha1(F.col("bytes")).alias("h")).collect()
    )
    assert sha_after == sha_before  # payload bytes untouched
    # second run: nothing left to do
    rep2 = t.maintain(min_small_files=4)
    assert not rep2.actions or not rep2.took("compact")


def test_folds_in_heavy_deletes_first(spark, t):
    t.delete("dur_ms < 100000", mode="mor", key="clip_id")  # hides ~all rows? no
    # hide a large fraction: all hot-prefix clips
    rep = t.maintain(min_small_files=10_000, materialize_hidden_fraction=0.0)
    assert rep.took("materialize_deletes")
    assert not t.plan().delete_files


def test_converts_trickle_deletes(spark, t):
    from lakehouse.synth import clip_id_for

    for i in range(4, 8):
        t.delete(f"clip_id = '{clip_id_for(i)}'", mode="mor", key="clip_id")
    rep = t.maintain(
        min_small_files=10_000,
        materialize_hidden_fraction=0.9,
        convert_min_delete_files=4,
    )
    assert rep.took("convert_deletes") and not rep.took("materialize_deletes")
    assert len(t.plan().delete_files) == 1  # merged into one positional file


def test_recluster_on_stale_layout(spark, t):
    t.cluster(["dur_ms", "sr_hz"])
    rep0 = t.maintain(
        cluster_by=["dur_ms", "sr_hz"], min_small_files=10_000
    )
    assert not rep0.took("cluster")  # freshly clustered: nothing stale
    # new appends decay the layout
    for i in range(4, 8):
        t.append(
            synth_clips_df(spark, 16, seed=i, n_days=2, start=16 * i),
            files_per_partition=2,
        )
    rep = t.maintain(
        cluster_by=["dur_ms", "sr_hz"],
        min_small_files=10_000,
        cluster_stale_fraction=0.3,
    )
    assert rep.took("cluster")
    marker = "zorder(dur_ms,sr_hz)"
    assert all(e.sort_order == marker for e in t.plan().files)


def test_expiry_and_gc_last(spark, t):
    rep = t.maintain(
        min_small_files=10_000, expire_keep_last=1, gc=True
    )
    assert rep.took("expire_snapshots") and rep.took("remove_orphan_files")
    assert len(t.snapshots()) == 1


def test_retention_policy_enforced_then_steady_state(spark, t):
    """retention_filter (TTL policy): the first maintain() pass deletes
    every expired row (whole-file drops stay metadata-only, partial
    files rewrite without the expired rows); the second pass skips at
    zero data cost because pruned planning proves nothing matches."""
    import json

    expired = t.scan(filter=[("dur_ms", "<", 1500)]).count()
    live = t.scan().count()
    assert 0 < expired < live
    t.set_properties(retention_filter=json.dumps([["dur_ms", "<", 1500]]))

    rep = t.maintain(min_small_files=10_000)  # isolate the policy step
    act = [a for a in rep.actions if a["action"] == "retention_delete"]
    assert act and act[0]["candidate_files"] > 0
    assert t.scan().count() == live - expired
    assert t.scan(filter=[("dur_ms", "<", 1500)]).count() == 0

    rep2 = t.maintain(min_small_files=10_000)
    sk = [s for s in rep2.skipped if s["action"] == "retention_delete"]
    assert sk and sk[0]["candidate_files"] == 0
    assert t.scan().count() == live - expired


def test_retention_policy_dry_run_only_reports(spark, t):
    import json

    t.set_properties(retention_filter=json.dumps([["dur_ms", "<", 1500]]))
    n = t.scan().count()
    rep = t.maintain(dry_run=True, min_small_files=10_000)
    assert rep.took("retention_delete")
    assert t.scan().count() == n


def test_autopilot_refreshes_stale_stats(spark, tmp_path):
    """Step 5: with analyze_columns set, maintain() analyzes when a
    data-changing snapshot postdates the stats, and skips when fresh
    or when only data-neutral rewrites landed since."""
    from lakehouse import CLIPS_SCHEMA, Table
    from lakehouse.ops.analyze import read_histograms, read_stats
    from lakehouse.synth import synth_clips_pdf

    t = Table.create(
        spark,
        str(tmp_path / "stats_auto"),
        CLIPS_SCHEMA,
        properties={"analyze_columns": "dur_ms"},
    )
    pdf = synth_clips_pdf(range(60), seed=4, n_days=2)
    t.append(spark.createDataFrame(pdf, schema=CLIPS_SCHEMA),
             target_file_count=3)

    rep = t.maintain()
    assert rep.took("analyze"), rep.actions
    cur = t.current_snapshot_id()
    assert read_stats(t.root, at_or_before=cur)[1]["dur_ms"] is not None
    assert "dur_ms" in read_histograms(t.root, at_or_before=cur)[1]

    # fresh stats: second pass must skip
    rep2 = t.maintain()
    assert not rep2.took("analyze")
    assert any(a["action"] == "analyze" for a in rep2.skipped)

    # a new data-changing append makes them stale again
    pdf2 = synth_clips_pdf(range(60, 120), seed=4, n_days=2)
    t.append(spark.createDataFrame(pdf2, schema=CLIPS_SCHEMA),
             target_file_count=3)
    rep3 = t.maintain(dry_run=True)
    assert any(a["action"] == "analyze" for a in rep3.actions)
