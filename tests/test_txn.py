"""Multi-table transactions: all-or-nothing publish across catalog
tables (lakehouse/txn.py). The crash-window tests drive the SAME
recovery code a real restart runs — they simulate a dead publisher by
writing the intent ledger entry and stopping, exactly what a process
killed after the commit point leaves on disk.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from lakehouse import Catalog
from lakehouse.schema import CLIPS_SCHEMA
from lakehouse.synth import synth_clips_df
from lakehouse.txn import (
    TransactionError,
    _txns_dir,
    purge_stale_branches,
    recover_txns,
)


@pytest.fixture()
def wh(spark, tmp_path):
    cat = Catalog.create(str(tmp_path / "wh"))
    for name in ("clips", "quarantine"):
        cat.create_table(spark, name, CLIPS_SCHEMA)
    cat.load_table(spark, "clips").append(
        synth_clips_df(spark, 20, seed=81, n_days=1), target_file_count=1
    )
    return cat


def _counts(spark, cat):
    return {
        n: cat.load_table(spark, n).scan().count()
        for n in ("clips", "quarantine")
    }


def test_commit_publishes_both_tables(spark, wh):
    with wh.transaction(spark) as txn:
        txn.append("clips", synth_clips_df(spark, 10, seed=82, n_days=1),
                   target_file_count=1)
        txn.append("quarantine", synth_clips_df(spark, 5, seed=83,
                                                n_days=1),
                   target_file_count=1)
        # staged rows invisible to plain readers, visible to the txn
        assert _counts(spark, wh) == {"clips": 20, "quarantine": 0}
        assert txn.scan("clips").count() == 30
        modes = txn.commit()
    assert modes == {"clips": "fast-forward", "quarantine": "fast-forward"}
    assert _counts(spark, wh) == {"clips": 30, "quarantine": 5}
    # ledger retired; no txn branches remain
    for n in ("clips", "quarantine"):
        refs = wh.load_table(spark, n).refs()
        assert not [r for r in refs if r.startswith("txn-")]


def test_abort_leaves_main_untouched(spark, wh):
    with wh.transaction(spark) as txn:
        txn.append("clips", synth_clips_df(spark, 10, seed=84, n_days=1),
                   target_file_count=1)
        # no commit -> __exit__ aborts
    assert _counts(spark, wh) == {"clips": 20, "quarantine": 0}
    assert not [r for r in wh.load_table(spark, "clips").refs()
                if r.startswith("txn-")]
    # nothing reached the ledger
    tdir = _txns_dir(wh.path)
    assert not os.path.isdir(tdir) or not os.listdir(tdir)


def test_crash_after_intent_is_recovered(spark, wh):
    """Publisher dies right after the durable commit point: the intent
    file exists, no table was published. Recovery must finish BOTH."""
    txn = wh.transaction(spark)
    s1 = txn.append("clips", synth_clips_df(spark, 10, seed=85, n_days=1),
                    target_file_count=1)
    s2 = txn.append("quarantine",
                    synth_clips_df(spark, 5, seed=86, n_days=1),
                    target_file_count=1)
    # hand-write the intent record (what commit() CAS-creates) and stop
    os.makedirs(_txns_dir(wh.path), exist_ok=True)
    rec = {
        "txn_id": txn.txn_id,
        "ts_ms": 0,
        "tables": [
            {"name": "clips",
             "root": wh.resolve("clips"),
             "branch": txn.branch,
             "staged": [s1.snapshot_id]},
            {"name": "quarantine",
             "root": wh.resolve("quarantine"),
             "branch": txn.branch,
             "staged": [s2.snapshot_id]},
        ],
    }
    with open(os.path.join(_txns_dir(wh.path),
                           f"{txn.txn_id}.json"), "w") as f:
        json.dump(rec, f)
    assert _counts(spark, wh) == {"clips": 20, "quarantine": 0}

    out = recover_txns(wh, spark)
    assert set(out) == {txn.txn_id}
    assert _counts(spark, wh) == {"clips": 30, "quarantine": 5}
    # idempotent: a second recovery (or a racing one) is a no-op
    assert recover_txns(wh, spark) == {}
    assert _counts(spark, wh) == {"clips": 30, "quarantine": 5}


def test_crash_mid_publish_recovers_the_rest(spark, wh):
    """Publisher dies after table 1 of 2: recovery publishes table 2
    and re-publishing table 1 is a no-op (no duplicate rows)."""
    from lakehouse.txn import _publish_table

    txn = wh.transaction(spark)
    s1 = txn.append("clips", synth_clips_df(spark, 10, seed=87, n_days=1),
                    target_file_count=1)
    s2 = txn.append("quarantine",
                    synth_clips_df(spark, 5, seed=88, n_days=1),
                    target_file_count=1)
    entries = [
        {"name": "clips", "root": wh.resolve("clips"),
         "branch": txn.branch, "staged": [s1.snapshot_id]},
        {"name": "quarantine", "root": wh.resolve("quarantine"),
         "branch": txn.branch, "staged": [s2.snapshot_id]},
    ]
    os.makedirs(_txns_dir(wh.path), exist_ok=True)
    with open(os.path.join(_txns_dir(wh.path),
                           f"{txn.txn_id}.json"), "w") as f:
        json.dump({"txn_id": txn.txn_id, "ts_ms": 0, "tables": entries}, f)
    _publish_table(spark, entries[0])  # ... then crash
    assert _counts(spark, wh) == {"clips": 30, "quarantine": 0}

    recover_txns(wh, spark)
    assert _counts(spark, wh) == {"clips": 30, "quarantine": 5}


def test_concurrent_writer_forces_cherry_pick(spark, wh):
    """Main moves between staging and publish: fast-forward correctly
    refuses and the publish cherry-picks — staged rows AND the
    concurrent writer's rows both land."""
    txn = wh.transaction(spark)
    txn.append("clips", synth_clips_df(spark, 10, seed=89, n_days=1),
               target_file_count=1)
    # a concurrent writer advances main mid-transaction
    wh.load_table(spark, "clips").append(
        synth_clips_df(spark, 7, seed=90, n_days=1), target_file_count=1
    )
    modes = txn.commit()
    assert modes["clips"].startswith("cherry-pick")
    assert wh.load_table(spark, "clips").scan().count() == 37


def test_multi_append_chain_publishes_in_order(spark, wh):
    txn = wh.transaction(spark)
    txn.append("clips", synth_clips_df(spark, 4, seed=91, n_days=1),
               target_file_count=1)
    txn.append("clips", synth_clips_df(spark, 6, seed=92, n_days=1),
               target_file_count=1)
    wh.load_table(spark, "clips").append(  # force the cherry-pick path
        synth_clips_df(spark, 1, seed=93, n_days=1), target_file_count=1
    )
    modes = txn.commit()
    assert modes["clips"] == "cherry-pick:2"
    assert wh.load_table(spark, "clips").scan().count() == 31


def test_commit_after_commit_and_abort_after_commit_refused(spark, wh):
    txn = wh.transaction(spark)
    txn.append("clips", synth_clips_df(spark, 2, seed=94, n_days=1),
               target_file_count=1)
    txn.commit()
    with pytest.raises(TransactionError):
        txn.commit()
    with pytest.raises(TransactionError):
        txn.append("clips", synth_clips_df(spark, 2, seed=95, n_days=1))


def test_pin_recovers_first(spark, wh):
    """A pinned read set sees ALL of a durably-committed txn."""
    txn = wh.transaction(spark)
    s1 = txn.append("clips", synth_clips_df(spark, 10, seed=96, n_days=1),
                    target_file_count=1)
    os.makedirs(_txns_dir(wh.path), exist_ok=True)
    with open(os.path.join(_txns_dir(wh.path),
                           f"{txn.txn_id}.json"), "w") as f:
        json.dump({"txn_id": txn.txn_id, "ts_ms": 0, "tables": [
            {"name": "clips", "root": wh.resolve("clips"),
             "branch": txn.branch, "staged": [s1.snapshot_id]}]}, f)
    pins = wh.pin(spark)
    t = wh.load_table(spark, "clips")
    assert t.scan(snapshot_id=pins["clips"]).count() == 30


def test_purge_stale_branches_spares_live_and_committed(spark, wh):
    # a txn that crashed BEFORE the commit point: branch, no ledger
    dead = wh.transaction(spark)
    dead.append("clips", synth_clips_df(spark, 3, seed=97, n_days=1),
                target_file_count=1)
    # a LIVE (recent) uncommitted txn must be spared by the grace period
    live = wh.transaction(spark)
    live.append("clips", synth_clips_df(spark, 3, seed=98, n_days=1),
                target_file_count=1)

    # the default 72h grace spares every fresh branch
    assert purge_stale_branches(wh, spark) == {}
    # an expired grace drops exactly the uncommitted ones
    dropped = purge_stale_branches(wh, spark, older_than_ms=0)
    assert sorted(dropped["clips"]) == sorted([dead.branch, live.branch])
    refs = wh.load_table(spark, "clips").refs()
    assert not [r for r in refs if r.startswith("txn-")]
    assert wh.load_table(spark, "clips").scan().count() == 20


def test_txn_merge_upserts_atomically(spark, wh):
    """MoR merges stage on the txn branch like appends: invisible
    before commit, atomic across tables, cherry-pickable under a
    concurrent writer."""
    from pyspark.sql import functions as F

    wh.load_table(spark, "quarantine").append(
        synth_clips_df(spark, 10, seed=99, n_days=1), target_file_count=1
    )
    txn = wh.transaction(spark)
    upd_c = (
        wh.load_table(spark, "clips").scan()
        .orderBy("clip_id").limit(5)
        .withColumn("transcript", F.lit("txn"))
    )
    upd_q = (
        wh.load_table(spark, "quarantine").scan()
        .orderBy("clip_id").limit(3)
        .withColumn("transcript", F.lit("txn"))
    )
    txn.merge("clips", upd_c)
    txn.merge("quarantine", upd_q)
    # read-your-writes sees the upsert; plain readers do not
    assert txn.scan("clips").filter(
        F.col("transcript") == "txn").count() == 5
    assert wh.load_table(spark, "clips").scan().filter(
        F.col("transcript") == "txn").count() == 0
    # concurrent writer moves clips' main -> cherry-pick publish
    wh.load_table(spark, "clips").append(
        synth_clips_df(spark, 4, start=800, seed=100, n_days=1),
        target_file_count=1,
    )
    modes = txn.commit()
    assert modes["clips"].startswith("cherry-pick")
    assert modes["quarantine"] == "fast-forward"
    c = wh.load_table(spark, "clips").scan()
    assert c.filter(F.col("transcript") == "txn").count() == 5
    assert c.count() == 24  # 20 base + 4 concurrent (upserts replace)
    q = wh.load_table(spark, "quarantine").scan()
    assert q.filter(F.col("transcript") == "txn").count() == 3
    assert q.count() == 10


def test_txn_refuses_cow_merge(spark, wh):
    from pyspark.sql import functions as F

    from lakehouse.txn import TransactionError

    txn = wh.transaction(spark)
    src = wh.load_table(spark, "clips").scan().limit(2).withColumn(
        "transcript", F.lit("x")
    )
    with pytest.raises(TransactionError, match="merge-on-read"):
        txn.merge("clips", src, mode="cow")
    txn.abort()


def test_txns_df_ledger_view(spark, wh):
    assert wh.txns_df(spark).count() == 0
    with wh.transaction(spark) as txn:
        txn.append("clips", synth_clips_df(spark, 3, seed=101, n_days=1),
                   target_file_count=1)
        txn.commit()
    rows = wh.txns_df(spark).collect()
    assert len(rows) == 1
    assert rows[0]["status"] == "published"
    assert rows[0]["tables"] == ["clips"]
    assert rows[0]["staged_snapshots"] == 1
    # a dead publisher shows as 'committed' until recovery
    dead = wh.transaction(spark)
    s = dead.append("clips", synth_clips_df(spark, 2, seed=102, n_days=1),
                    target_file_count=1)
    from lakehouse.txn import _cas_create
    _cas_create(
        os.path.join(_txns_dir(wh.path), f"{dead.txn_id}.json"),
        {"txn_id": dead.txn_id, "ts_ms": 5, "tables": [
            {"name": "clips", "root": wh.resolve("clips"),
             "branch": dead.branch, "staged": [s.snapshot_id]}]},
    )
    st = {r["txn_id"]: r["status"] for r in wh.txns_df(spark).collect()}
    assert st[dead.txn_id] == "committed"
    wh.recover_txns(spark)
    st = {r["txn_id"]: r["status"] for r in wh.txns_df(spark).collect()}
    assert st[dead.txn_id] == "published"


def test_concurrent_recovery_publishes_exactly_once(spark, wh):
    """Two recoverers race on one durably-committed txn (the real
    deployment shape: every reader runs recovery). CAS guards at the
    table layer must make the publish land exactly once."""
    import threading

    txn = wh.transaction(spark)
    s1 = txn.append("clips", synth_clips_df(spark, 10, seed=103,
                                            n_days=1),
                    target_file_count=1)
    os.makedirs(_txns_dir(wh.path), exist_ok=True)
    with open(os.path.join(_txns_dir(wh.path),
                           f"{txn.txn_id}.json"), "w") as f:
        json.dump({"txn_id": txn.txn_id, "ts_ms": 0, "tables": [
            {"name": "clips", "root": wh.resolve("clips"),
             "branch": txn.branch, "staged": [s1.snapshot_id]}]}, f)

    errs: list = []

    def run():
        try:
            recover_txns(wh, spark)
        except Exception as e:  # pragma: no cover - diagnostic
            errs.append(e)

    threads = [threading.Thread(target=run) for _ in range(4)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errs, errs
    assert wh.load_table(spark, "clips").scan().count() == 30
    assert recover_txns(wh, spark) == {}


def test_txn_nms_full_sync_sees_staged_rows(spark, wh):
    """ADVICE r3 high: the NOT MATCHED BY SOURCE candidate scan must
    read the txn BRANCH head, not main — rows staged earlier in the
    same transaction are full-sync candidates too (read-your-writes).
    Before the fix, staged-but-unmatched rows silently survived."""
    from pyspark.sql import functions as F

    clips = wh.load_table(spark, "clips")
    base_keep = sorted(
        r.clip_id for r in clips.scan().select("clip_id").limit(10).collect()
    )
    txn = wh.transaction(spark)
    # stage 5 extra rows on the branch (invisible to main)
    txn.append(
        "clips",
        synth_clips_df(spark, 5, start=900, seed=7, n_days=1),
        target_file_count=1,
    )
    assert txn.scan("clips").count() == 25
    # full-sync merge against a source holding only 10 of the base keys:
    # every other row — INCLUDING the 5 staged ones — must be deleted
    src = clips.scan().filter(F.col("clip_id").isin(base_keep))
    txn.merge("clips", src, not_matched_by_source="delete")
    got = sorted(
        r.clip_id
        for r in txn.scan("clips").select("clip_id").collect()
    )
    assert got == base_keep  # staged 900s gone pre-commit too
    txn.commit()
    final = sorted(
        r.clip_id
        for r in wh.load_table(spark, "clips")
        .scan()
        .select("clip_id")
        .collect()
    )
    assert final == base_keep


def test_txn_nms_before_first_staged_commit_uses_main(spark, wh):
    """Branch ref doesn't exist until the first staged commit — the NMS
    scan falls back to the branch parent (main head)."""
    from pyspark.sql import functions as F

    clips = wh.load_table(spark, "clips")
    keep = sorted(
        r.clip_id for r in clips.scan().select("clip_id").limit(4).collect()
    )
    txn = wh.transaction(spark)
    src = clips.scan().filter(F.col("clip_id").isin(keep))
    txn.merge("clips", src, not_matched_by_source="delete")
    assert sorted(
        r.clip_id for r in txn.scan("clips").select("clip_id").collect()
    ) == keep
    txn.commit()
    assert wh.load_table(spark, "clips").scan().count() == 4
