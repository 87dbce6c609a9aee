"""Ops-metrics surface (Table.metrics): the queryable per-commit ledger
built from snapshot summaries — the engine-side form of the reference's
monitoring chapter (/root/reference/README.md:319-329, CloudWatch
metrics + alarms over the Glue stream). Zero data I/O by construction:
every value comes from metadata the commits already wrote.
"""

import os

import pytest

from lakehouse import CLIPS_SCHEMA, Table
from lakehouse.synth import synth_clips_df


@pytest.fixture()
def t(spark, table_root):
    t = Table.create(spark, table_root, CLIPS_SCHEMA)
    t.append(synth_clips_df(spark, 60, seed=1, n_days=3),
             target_file_count=1)
    t.append(synth_clips_df(spark, 40, start=60, seed=2, n_days=3),
             target_file_count=1)
    return t


def test_metrics_ledger_matches_commits(spark, t):
    # indices 0-9 live entirely in the first append's file: the
    # probe-planned COW rewrite touches exactly that one file, so the
    # post-delete table still has 2 files for compact to bin together
    pred = "CAST(regexp_extract(clip_id, '([0-9]+)$', 1) AS BIGINT) < 10"
    n_err = t.scan().filter(pred).count()
    assert n_err == 10
    t.delete(pred, mode="cow")
    t.compact()

    m = {r["commit_seq"]: r for r in t.metrics().collect()}
    assert sorted(m) == [1, 2, 3, 4]
    a1, a2, d, c = m[1], m[2], m[3], m[4]
    assert (a1["operation"], a1["added_files"], a1["added_records"],
            a1["removed_files"], a1["removed_records"]) == (
        "append", 1, 60, 0, 0)
    assert (a2["added_records"], a2["removed_records"]) == (40, 0)
    # COW delete: rewrites the touched files; the ledger nets out to the
    # deleted rows
    assert d["operation"] == "delete"
    assert d["removed_records"] - d["added_records"] == n_err
    # compaction is data-neutral: bytes/files churn, records net to zero
    assert c["operation"] == "replace"
    assert c["added_records"] == c["removed_records"] == 100 - n_err
    assert c["removed_files"] == 2 and c["added_files"] == 1


def test_metrics_carries_wall_time_and_lineage_link(t):
    t.compact()
    rows = {r["commit_seq"]: r for r in t.metrics().collect()}
    assert all(r["commit_ms"] is not None and r["commit_ms"] >= 0
               for r in rows.values())
    repl = rows[max(rows)]
    assert repl["operation"] == "replace" and repl["job_id"]
    assert os.path.isdir(
        os.path.join(t.root, "metadata", "lineage", repl["job_id"])
    ), "job_id must link to the on-disk lineage log"


def test_metrics_tolerates_legacy_summaries(spark, t, monkeypatch):
    """Commits written before removed_records/commit_ms existed surface
    NULL, not garbage (forward-compat with old tables)."""
    meta = t.meta  # Table.meta reloads from disk: pin one copy
    legacy = meta.snapshots[0]
    legacy.summary.pop("removed_records", None)
    legacy.summary.pop("removed_bytes", None)
    legacy.summary.pop("commit_ms", None)
    monkeypatch.setattr(Table, "meta", property(lambda self: meta))
    rows = {r["commit_seq"]: r for r in t.metrics().collect()}
    assert rows[1]["removed_records"] is None
    assert rows[1]["commit_ms"] is None
    assert rows[2]["removed_records"] == 0
