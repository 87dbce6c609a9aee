"""M2–M5 gates: compaction (+resume), clustering, expiry+GC, MERGE.

The central invariant (north rule): scans before/after every maintenance
op return byte-identical row *sets* — checked as an order-insensitive
fingerprint over (clip_id, transcript, decoded-PCM sha1), i.e. both
payload invariants from BASELINE.json#input_hint at once.
"""

import hashlib
import os

import pytest
from pyspark.sql import functions as F

from lakehouse import CLIPS_SCHEMA, MergeError, SnapshotNotFoundError, Table
from lakehouse.audio import pcm_sha1
from lakehouse.synth import synth_clips_pdf

DATE_SPEC = [{"name": "event_date", "transform": "identity", "source": "event_date"}]


def make_small_file_table(spark, root, *, rows=120, appends=4, n_days=2):
    """appends × small batches → many small files (the compaction fixture)."""
    t = Table.create(spark, root, CLIPS_SCHEMA, partition_spec=DATE_SPEC)
    per = rows // appends
    for i in range(appends):
        pdf = synth_clips_pdf(range(i * per, (i + 1) * per), seed=42, n_days=n_days)
        t.append(
            spark.createDataFrame(pdf, schema=CLIPS_SCHEMA),
            target_file_count=3,
        )
    return t


def scan_fingerprint(t, **kw) -> str:
    df = t.scan(**kw).select(
        "clip_id", "transcript", pcm_sha1(F.col("bytes")).alias("pcm")
    )
    rows = sorted((r.clip_id, r.transcript, r.pcm) for r in df.collect())
    return hashlib.sha1(repr(rows).encode()).hexdigest()


# --- M2: compaction ----------------------------------------------------------


def test_compact_scan_parity_and_file_reduction(spark, table_root):
    t = make_small_file_table(spark, table_root)
    before_fp = scan_fingerprint(t)
    files_before = len(t.live_files())
    pre_compact_snapshot = t.current_snapshot_id()

    res = t.compact(target_file_size=64 * 1024 * 1024)
    assert res.bins > 0 and res.files_rewritten > res.files_created
    assert len(t.live_files()) < files_before
    assert scan_fingerprint(t) == before_fp
    # snapshot isolation: pre-compaction snapshot unchanged
    assert scan_fingerprint(t, snapshot_id=pre_compact_snapshot) == before_fp
    # idempotence: nothing left to compact at this threshold
    res2 = t.compact(target_file_size=64 * 1024 * 1024)
    assert res2.bins == 0


def test_compact_preserves_clustering(spark, table_root):
    """Compacting small CLUSTERED files must not undo the clustering:
    zkey-adjacent bins, outputs keeping the sort_order + zkey column,
    and pairwise-DISJOINT zkey ranges per partition (FFD by size would
    merge far-apart ranges into overlapping, pruning-hostile files)."""
    t = make_small_file_table(spark, table_root, rows=200, appends=5)
    t.cluster(["sr_hz", "dur_ms"], target_file_size=256 * 1024)
    fp = scan_fingerprint(t)
    clustered_before = [e for e in t.live_files() if e.sort_order]
    assert len(clustered_before) > 2

    res = t.compact(target_file_size=2 * 1024 * 1024, min_input_files=2)
    assert res.bins > 0
    assert scan_fingerprint(t) == fp
    out = [e for e in t.live_files() if e.sort_order]
    assert out, "compacted clustered files must keep their sort_order"
    assert all("zkey" in e.stats for e in out)
    by_pk: dict[str, list] = {}
    for e in out:
        by_pk.setdefault(str(sorted(e.partition.items())), []).append(e)
    for members in by_pk.values():
        ranges = sorted(
            (e.stats["zkey"]["min"], e.stats["zkey"]["max"])
            for e in members
        )
        for (lo1, hi1), (lo2, _hi2) in zip(ranges, ranges[1:]):
            assert hi1 <= lo2, f"overlapping zkey ranges: {ranges}"
    # pruning on the cluster columns still bites after compaction
    pred = [("sr_hz", "=", 8000)]
    plan_after = t.plan(filter=pred)
    assert len(plan_after.files) < plan_after.candidate_files


def test_compact_shuffle_path_parity(spark, table_root):
    """The single-job shuffle path (the >DIRECT_MAX_BINS scale path)
    must be row-set identical to direct concatenation."""
    t = make_small_file_table(spark, table_root, rows=120, appends=4)
    before_fp = scan_fingerprint(t)
    files_before = len(t.live_files())
    res = t.compact(target_file_size=64 * 1024 * 1024, execution="shuffle")
    assert res.bins > 0 and res.files_created < files_before
    assert len(t.live_files()) < files_before
    assert scan_fingerprint(t) == before_fp
    # exactly one output file per bin
    assert res.files_created == res.bins


@pytest.mark.parametrize("execution", ["direct", "shuffle"])
def test_compact_resume_after_crash(spark, table_root, execution):
    t = make_small_file_table(spark, table_root, rows=160, appends=4)
    before_fp = scan_fingerprint(t)
    version_before = t.meta.version

    calls = {"n": 0}

    def crash_after_first(bin_key):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("injected crash after first bin")

    with pytest.raises(RuntimeError, match="injected crash"):
        t.compact(
            target_file_size=64 * 1024 * 1024,
            job_id="resume-test",
            execution=execution,
            fault_injector=crash_after_first,
        )
    # nothing committed: table untouched mid-crash
    assert t.meta.version == version_before
    assert scan_fingerprint(t) == before_fp

    from lakehouse.lineage import LineageLog

    done_before_resume = len(LineageLog(t.root, "resume-test").done_tasks())
    assert done_before_resume >= 1

    res = t.compact(
        target_file_size=64 * 1024 * 1024,
        job_id="resume-test",
        execution=execution,
    )
    assert res.snapshot_id is not None
    assert scan_fingerprint(t) == before_fp
    # the resumed run reused the DONE bin instead of redoing it
    rec = LineageLog(t.root, "resume-test").job_record()
    assert rec["status"] == "DONE"
    # all live files exist exactly once on disk
    live = [e.file_path for e in t.live_files()]
    assert len(live) == len(set(live))
    for rel in live:
        assert os.path.exists(os.path.join(t.root, rel))


# --- M3: clustering ----------------------------------------------------------


@pytest.mark.parametrize("curve", ["zorder", "hilbert"])
def test_cluster_scan_parity_and_pruning(spark, table_root, curve):
    t = make_small_file_table(spark, table_root, rows=200, appends=5)
    before_fp = scan_fingerprint(t)
    # range query BEFORE clustering: sr_hz scattered across all files
    pred = [("sr_hz", "=", 8000)]
    plan_before = t.plan(filter=pred)

    res = t.cluster(
        ["sr_hz", "dur_ms"], curve=curve, target_file_size=2 * 1024 * 1024
    )
    assert res.snapshot_id is not None and res.files_created > 0
    assert scan_fingerprint(t) == before_fp

    plan_after = t.plan(filter=pred)
    ratio_before = len(plan_before.files) / max(1, plan_before.candidate_files)
    ratio_after = len(plan_after.files) / max(1, plan_after.candidate_files)
    assert ratio_after < ratio_before  # clustering improved file skipping
    # zkey ranges recorded per file
    clustered = [e for e in t.live_files() if e.sort_order]
    assert clustered and all("zkey" in e.stats for e in clustered)
    # correctness of the pruned read
    got = t.scan(filter=pred).select("clip_id").collect()
    expected = synth_clips_pdf(range(200), seed=42, n_days=2)
    want = expected[expected["sr_hz"] == 8000]
    assert sorted(r.clip_id for r in got) == sorted(want["clip_id"])


def test_hilbert_beats_zorder_locality():
    from lakehouse.curves import (
        block_diameter_metric,
        hilbert_index,
        zorder_index,
    )

    z = block_diameter_metric(zorder_index, bits=6, block=48)
    h = block_diameter_metric(hilbert_index, bits=6, block=48)
    assert h < z


# --- M4: expiry + GC ---------------------------------------------------------


def test_expire_and_gc(spark, table_root):
    t = make_small_file_table(spark, table_root, rows=120, appends=3)
    s_old = t.snapshots()[0].snapshot_id
    t.compact(target_file_size=64 * 1024 * 1024)
    fp = scan_fingerprint(t)

    res = t.expire_snapshots(keep_last=1)
    assert s_old in res.expired_snapshot_ids
    assert t.current_snapshot_id() in res.surviving_snapshot_ids
    with pytest.raises(SnapshotNotFoundError):
        t.scan(snapshot_id=s_old)
    assert scan_fingerprint(t) == fp  # live reads unchanged

    live_before_gc = {e.file_path for e in t.live_files()}
    gc = t.remove_orphan_files(older_than_ms=int(1e18), mode="driver")
    assert gc.deleted_files  # pre-compaction small files swept
    assert set(gc.deleted_files).isdisjoint(live_before_gc)
    assert scan_fingerprint(t) == fp
    # disk now contains exactly the live set
    on_disk = set()
    for dirpath, _d, files in os.walk(os.path.join(t.root, "data")):
        for n in files:
            if n.endswith(".parquet"):
                on_disk.add(
                    os.path.relpath(os.path.join(dirpath, n), t.root)
                )
    assert on_disk == live_before_gc


def test_gc_spark_mode_matches_driver_mode(spark, table_root):
    t = make_small_file_table(spark, table_root, rows=80, appends=2)
    t.compact(target_file_size=64 * 1024 * 1024)
    t.expire_snapshots(keep_last=1)
    dry_driver = t.remove_orphan_files(
        older_than_ms=int(1e18), mode="driver", dry_run=True
    )
    dry_spark = t.remove_orphan_files(
        older_than_ms=int(1e18), mode="spark", dry_run=True
    )
    assert dry_driver.deleted_files == dry_spark.deleted_files


def test_gc_respects_grace_period(spark, table_root):
    t = make_small_file_table(spark, table_root, rows=80, appends=2)
    t.compact(target_file_size=64 * 1024 * 1024)
    t.expire_snapshots(keep_last=1)
    gc = t.remove_orphan_files(older_than_ms=0, dry_run=False)  # cutoff in past
    assert gc.deleted_files == []  # everything younger than cutoff → kept


# --- M5: MERGE INTO ----------------------------------------------------------


def _merge_source(spark, *, updates, inserts, deletes, seed=777):
    """updates/deletes: index iterables into the seed-42 target domain;
    inserts: new index range generated under another seed."""
    import pandas as pd

    parts = []
    if updates:
        pdf = synth_clips_pdf(updates, seed=seed, n_days=2)  # new payloads
        target_ids = synth_clips_pdf(updates, seed=42, n_days=2)["clip_id"]
        pdf["clip_id"] = list(target_ids)  # same keys, new bytes/transcripts
        pdf["op"] = None
        parts.append(pdf)
    if inserts:
        pdf = synth_clips_pdf(inserts, seed=seed, n_days=2)
        pdf["clip_id"] = [f"new-{i:012d}" for i in inserts]
        pdf["op"] = None
        parts.append(pdf)
    if deletes:
        pdf = synth_clips_pdf(deletes, seed=42, n_days=2)
        pdf["op"] = "delete"
        parts.append(pdf)
    src = pd.concat(parts, ignore_index=True)
    from pyspark.sql import types as T

    schema = T.StructType(
        CLIPS_SCHEMA.fields + [T.StructField("op", T.StringType(), True)]
    )
    return spark.createDataFrame(src, schema=schema)


@pytest.mark.parametrize("strategy", ["broadcast", "shuffle"])
def test_merge_matrix(spark, table_root, strategy):
    t = make_small_file_table(spark, table_root, rows=100, appends=2)
    updates = range(0, 20)
    inserts = range(1000, 1015)
    deletes = range(20, 30)
    src = _merge_source(spark, updates=updates, inserts=inserts, deletes=deletes)

    res = t.merge(src, key="clip_id", strategy=strategy)
    assert res.snapshot_id is not None

    got = {
        r.clip_id: r.transcript
        for r in t.scan().select("clip_id", "transcript").collect()
    }
    base = synth_clips_pdf(range(100), seed=42, n_days=2)
    upd = synth_clips_pdf(updates, seed=777, n_days=2)
    target_upd_ids = list(
        synth_clips_pdf(updates, seed=42, n_days=2)["clip_id"]
    )
    deleted_ids = set(synth_clips_pdf(deletes, seed=42, n_days=2)["clip_id"])

    assert len(got) == 100 - 10 + 15
    for cid in deleted_ids:
        assert cid not in got
    for cid, tr in zip(target_upd_ids, upd["transcript"]):
        assert got[cid] == tr  # updated payload
    for i in inserts:
        assert f"new-{i:012d}" in got
    untouched = base[
        ~base["clip_id"].isin(set(target_upd_ids) | deleted_ids)
    ]
    for _, row in untouched.iterrows():
        assert got[row["clip_id"]] == row["transcript"]


def test_merge_duplicate_source_keys_error(spark, table_root):
    t = make_small_file_table(spark, table_root, rows=40, appends=1)
    import pandas as pd

    pdf = synth_clips_pdf(range(0, 4), seed=42, n_days=2)
    dup = pd.concat([pdf, pdf.iloc[[0]]], ignore_index=True)
    dup["op"] = None
    from pyspark.sql import types as T

    schema = T.StructType(
        CLIPS_SCHEMA.fields + [T.StructField("op", T.StringType(), True)]
    )
    with pytest.raises(MergeError, match="duplicate source keys"):
        t.merge(spark.createDataFrame(dup, schema=schema))
    # failed merge committed nothing
    assert t.meta.snapshots[-1].operation == "append"


def test_merge_prunes_untouched_files(spark, table_root):
    """A merge over only the hot range must not rewrite cold-range files.

    Requires key-clustered files first: fresh hash-partitioned appends mix
    key ranges in every file, so every file intersects the hot range —
    clustering by clip_id is exactly what makes MERGE file-pruning bite.
    """
    t = make_small_file_table(spark, table_root, rows=100, appends=2)
    t.cluster(["clip_id"], target_file_size=512 * 1024)
    total_files = len(t.live_files())
    assert total_files > 1
    hot_updates = [i for i in range(100) if i % 10 < 3][:10]  # hot- prefix keys
    src = _merge_source(spark, updates=hot_updates, inserts=[], deletes=[])
    res = t.merge(src, key="clip_id")
    assert 0 < res.files_touched < total_files

    got = t.scan().count()
    assert got == 100


def test_merge_shuffle_hot_key_range(spark, table_root):
    """SURVEY §5.7: the hot-prefix fixture (~30% of keys share the
    'hot-' lexicographic prefix, lakehouse/synth.py:44-48) driven
    through strategy='shuffle'.

    MERGE keys are unique, so per-key skew cannot exist — the risk a
    hot RANGE poses is partition-placement skew, which hash exchanges
    break up and AQE skew-join splits residually. This exercises the
    shuffle path under the hot fixture end-to-end and pins down that
    (a) results are exact, (b) the session really runs the join under
    AQE with skew-join on (config'd ≠ exercised — SURVEY §7 trap)."""
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    assert spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true"

    t = make_small_file_table(spark, table_root, rows=200, appends=2)
    # every 10th index mod 10 < 3 → hot- prefix; update ALL hot keys
    hot_idx = [i for i in range(200) if i % 10 < 3]
    src = _merge_source(spark, updates=hot_idx, inserts=[], deletes=[])
    assert all(
        cid.startswith("hot-")
        for cid in synth_clips_pdf(hot_idx, seed=42, n_days=2)["clip_id"]
    )
    res = t.merge(src, key="clip_id", strategy="shuffle")
    assert res.snapshot_id is not None

    got = {
        r.clip_id: r.transcript
        for r in t.scan().select("clip_id", "transcript").collect()
    }
    assert len(got) == 200
    upd = synth_clips_pdf(hot_idx, seed=777, n_days=2)
    hot_ids = list(synth_clips_pdf(hot_idx, seed=42, n_days=2)["clip_id"])
    for cid, tr in zip(hot_ids, upd["transcript"]):
        assert got[cid] == tr
    cold = synth_clips_pdf(
        [i for i in range(200) if i % 10 >= 3], seed=42, n_days=2
    )
    for _, row in cold.iterrows():
        assert got[row["clip_id"]] == row["transcript"]


def test_merge_snapshot_isolation(spark, table_root):
    t = make_small_file_table(spark, table_root, rows=60, appends=2)
    pre = t.current_snapshot_id()
    fp_pre = scan_fingerprint(t)
    src = _merge_source(spark, updates=range(0, 10), inserts=range(500, 505), deletes=[])
    t.merge(src)
    assert scan_fingerprint(t, snapshot_id=pre) == fp_pre


def test_merge_bucket_partition_pruning(spark, table_root):
    """On a table partitioned by bucket(clip_id, n) the key-range sweep
    cannot prune anything (every file's [min,max] spans the key space);
    the bucket-partition prune must bound the touched set to the
    buckets the source keys actually hash into — and the merge result
    must still be exact."""
    from lakehouse.ops.merge import prune_files_by_key_bucket

    spec = [
        {"name": "kb", "transform": "bucket", "source": "clip_id", "n": 8}
    ]
    t = Table.create(spark, table_root, CLIPS_SCHEMA, partition_spec=spec)
    base = synth_clips_pdf(range(160), seed=42, n_days=2)
    t.append(
        spark.createDataFrame(base, schema=CLIPS_SCHEMA),
        target_file_count=16,
    )
    n_files = len(t.live_files())
    assert n_files >= 8  # at least one file per hit bucket

    # a single-key upsert can touch at most ONE bucket's files
    src = _merge_source(spark, updates=range(0, 1), inserts=[], deletes=[])
    live = t.plan().files
    kept = prune_files_by_key_bucket(
        spark, t.meta, src.select(CLIPS_SCHEMA.fieldNames()), "clip_id", live
    )
    hit_buckets = {e.partition["kb"] for e in kept}
    assert len(hit_buckets) == 1
    assert len(kept) < n_files

    res = t.merge(src, key="clip_id")
    assert res.files_touched <= len(kept)
    got = {
        r.clip_id: r.transcript
        for r in t.scan().select("clip_id", "transcript").collect()
    }
    upd = synth_clips_pdf(range(0, 1), seed=777, n_days=2)
    victim = base["clip_id"].iloc[0]
    assert got[victim] == upd["transcript"].iloc[0]
    assert len(got) == 160


def test_cluster_sampled_quantile_pass(spark, table_root):
    """Forcing the bounded cut-estimation sample (quantile_sample_rows
    far below the row count) must keep the north-rule invariant — scans
    byte-identical — and still yield effective pruning cuts: the cuts
    steer file LAYOUT only. Counts scale back up, so output sizing
    still tracks true partition volume (multiple files per partition
    at a small target size)."""
    t = make_small_file_table(spark, table_root, rows=400, appends=4)
    before_fp = scan_fingerprint(t)
    pred = [("sr_hz", "=", 8000)]
    plan_before = t.plan(filter=pred)

    res = t.cluster(
        ["sr_hz", "dur_ms"],
        target_file_size=256 * 1024,
        quantile_sample_rows=64,  # 400 rows -> 16% sample
    )
    assert res.snapshot_id is not None
    assert scan_fingerprint(t) == before_fp  # byte-identical row set
    # sizing survived the scale-back: more than one output file
    assert res.files_created > 1
    plan_after = t.plan(filter=pred)
    ratio_before = len(plan_before.files) / max(1, plan_before.candidate_files)
    ratio_after = len(plan_after.files) / max(1, plan_after.candidate_files)
    assert ratio_after < ratio_before  # sampled cuts still prune


def test_cluster_resume_after_crash(spark, table_root):
    """Cluster's coarse-resume path: a crash AFTER the rewrite but
    BEFORE the commit leaves the table untouched; re-running with the
    same job_id finds the 'rewrite-complete' sentinel, reuses every
    recorded output file (no second rewrite), and commits — scans stay
    byte-identical and no duplicate or dangling files appear."""
    t = make_small_file_table(spark, table_root, rows=200, appends=5)
    before_fp = scan_fingerprint(t)
    version_before = t.meta.version

    def crash(stage):
        raise RuntimeError("injected crash before cluster commit")

    with pytest.raises(RuntimeError, match="injected crash"):
        t.cluster(
            ["sr_hz", "dur_ms"],
            target_file_size=2 * 1024 * 1024,
            job_id="cluster-resume-test",
            fault_injector=crash,
        )
    assert t.meta.version == version_before  # nothing committed
    assert scan_fingerprint(t) == before_fp

    from lakehouse.lineage import LineageLog

    rec = LineageLog(t.root, "cluster-resume-test").done_tasks()
    assert "rewrite-complete" in rec
    outs_recorded = {
        e.file_path
        for k, r in rec.items()
        if k != "rewrite-complete"
        for e in r.out_entries()
    }
    assert outs_recorded

    res = t.cluster(
        ["sr_hz", "dur_ms"],
        target_file_size=2 * 1024 * 1024,
        job_id="cluster-resume-test",
    )
    assert res.snapshot_id is not None
    assert scan_fingerprint(t) == before_fp
    # the resumed run committed the FIRST run's outputs, not a re-rewrite
    live = {e.file_path for e in t.live_files()}
    assert live == outs_recorded
    for rel in live:
        assert os.path.exists(os.path.join(t.root, rel))
