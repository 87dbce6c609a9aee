"""M1 gate: create → append×2 → pruned scan → time travel → CAS conflicts."""

import datetime as dt

import pytest

from lakehouse import (
    CLIPS_SCHEMA,
    CommitConflictError,
    SnapshotNotFoundError,
    Table,
    TableAlreadyExistsError,
)
from lakehouse.synth import synth_clips_pdf

DATE_SPEC = [{"name": "event_date", "transform": "identity", "source": "event_date"}]


def _make_table(spark, root):
    return Table.create(
        spark, root, CLIPS_SCHEMA, partition_spec=DATE_SPEC
    )


def _df(spark, lo, hi, n_days=4):
    return spark.createDataFrame(
        synth_clips_pdf(range(lo, hi), seed=42, n_days=n_days),
        schema=CLIPS_SCHEMA,
    )


def test_create_load_and_double_create(spark, table_root):
    t = _make_table(spark, table_root)
    assert t.current_snapshot_id() is None
    with pytest.raises(TableAlreadyExistsError):
        _make_table(spark, table_root)
    t2 = Table.load(spark, table_root)
    assert t2.schema == CLIPS_SCHEMA


def test_empty_table_scan_returns_no_rows(spark, table_root):
    t = _make_table(spark, table_root)
    assert t.scan().count() == 0
    assert t.scan(filter=[("clip_id", "=", "x")]).count() == 0


def test_append_scan_roundtrip(spark, table_root):
    t = _make_table(spark, table_root)
    s1 = t.append(_df(spark, 0, 40))
    assert s1.operation == "append"
    s2 = t.append(_df(spark, 40, 64))
    assert s2.parent_snapshot_id == s1.snapshot_id

    got = t.scan().select("clip_id", "transcript").collect()
    assert len(got) == 64
    expected = synth_clips_pdf(range(64), seed=42, n_days=4)
    assert sorted(r.clip_id for r in got) == sorted(expected["clip_id"])
    by_id = {r.clip_id: r.transcript for r in got}
    for _, row in expected.iterrows():
        assert by_id[row["clip_id"]] == row["transcript"]


def test_partition_pruning(spark, table_root):
    t = _make_table(spark, table_root)
    t.append(_df(spark, 0, 64, n_days=4))
    day = dt.date(2024, 1, 2)
    plan = t.plan(filter=[("event_date", "=", day)])
    assert plan.candidate_files > len(plan.files) > 0
    # every surviving file's partition is exactly the requested day
    for e in plan.files:
        assert e.partition["event_date"] == day.isoformat()
    got = t.scan(filter=[("event_date", "=", day)]).collect()
    expected = synth_clips_pdf(range(64), seed=42, n_days=4)
    want = expected[expected["event_date"] == day]
    assert sorted(r.clip_id for r in got) == sorted(want["clip_id"])


def test_stats_pruning_on_clip_id(spark, table_root):
    t = _make_table(spark, table_root)
    t.append(_df(spark, 0, 64))
    plan = t.plan(filter=[("clip_id", ">=", "hot-"), ("clip_id", "<", "hot-~")])
    got = t.scan(
        filter=[("clip_id", ">=", "hot-"), ("clip_id", "<", "hot-~")]
    ).collect()
    assert all(r.clip_id.startswith("hot-") for r in got)
    assert len(got) == sum(1 for i in range(64) if i % 10 < 3)


def test_time_travel_and_snapshot_isolation(spark, table_root):
    t = _make_table(spark, table_root)
    s1 = t.append(_df(spark, 0, 32))
    n1 = t.scan().count()
    t.append(_df(spark, 32, 64))
    assert t.scan().count() == 64
    # pinned reader still sees v1 exactly
    assert t.scan(snapshot_id=s1.snapshot_id).count() == n1 == 32
    with pytest.raises(SnapshotNotFoundError):
        t.scan(snapshot_id=999)


def test_distributed_planning_matches_driver_planning(spark, table_root):
    t = _make_table(spark, table_root)
    t.append(_df(spark, 0, 64))
    f = [("event_date", "=", dt.date(2024, 1, 1))]
    driver_plan = t.plan(filter=f)
    dist_plan = t.plan(filter=f, distributed=True)
    assert sorted(e.file_path for e in driver_plan.files) == sorted(
        e.file_path for e in dist_plan.files
    )


def test_concurrent_commit_one_retries(spark, table_root):
    """Two committers race for the same version; CAS makes one rebase."""
    from lakehouse.meta import snapshots as S

    t = _make_table(spark, table_root)
    t.append(_df(spark, 0, 8))

    base = S.load_metadata(t.root)
    # writer A publishes v(base+1) out from under writer B
    ok = S._try_publish(
        t.root, base.version + 1, {**base.to_json(), "version": base.version + 1}
    )
    assert ok
    # writer B (the real append) must detect the loss and land on base+2
    t.append(_df(spark, 8, 16))
    assert S.load_metadata(t.root).version == base.version + 2
    assert t.scan().count() == 16


def test_cas_publish_refuses_existing_version(spark, table_root):
    from lakehouse.meta import snapshots as S

    t = _make_table(spark, table_root)
    base = S.load_metadata(t.root)
    payload = {**base.to_json(), "version": base.version}
    assert not S._try_publish(t.root, base.version, payload)


def test_schema_evolution_additive_only(spark, table_root):
    from pyspark.sql import types as T

    from lakehouse import SchemaEvolutionError

    t = _make_table(spark, table_root)
    t.append(_df(spark, 0, 8))
    wider = T.StructType(
        CLIPS_SCHEMA.fields + [T.StructField("speaker", T.StringType(), True)]
    )
    t.append(_df(spark, 8, 16), new_schema=wider)
    got = t.scan()
    assert "speaker" in got.columns
    assert got.count() == 16
    assert got.filter("speaker IS NULL").count() == 16

    narrower = T.StructType(CLIPS_SCHEMA.fields[:3])
    with pytest.raises(SchemaEvolutionError):
        t.append(_df(spark, 16, 24), new_schema=narrower)


def test_sql_view_surface(spark, table_root):
    """spark.sql over a registered view: snapshot-pinned at registration
    (later appends invisible), re-register advances, time-travel and
    branch views pin their refs (the reference's Athena/Glue analyst
    path, engine-side)."""
    t = _make_table(spark, table_root)
    t.append(_df(spark, 0, 30))
    t.create_or_replace_view("clips_v")
    assert spark.sql("SELECT count(*) AS n FROM clips_v").collect()[0].n == 30

    t.append(_df(spark, 30, 50))
    # pinned: the append after registration is invisible
    assert spark.sql("SELECT count(*) AS n FROM clips_v").collect()[0].n == 30
    t.create_or_replace_view("clips_v")
    assert spark.sql("SELECT count(*) AS n FROM clips_v").collect()[0].n == 50

    # predicate + projection flow through SQL; filter pushes to planning
    got = spark.sql(
        "SELECT clip_id FROM clips_v WHERE sr_hz = 8000 ORDER BY clip_id"
    ).collect()
    want = sorted(
        r.clip_id
        for r in t.scan(filter=[("sr_hz", "=", 8000)]).select("clip_id").collect()
    )
    assert [r.clip_id for r in got] == want

    # time-travel view
    first_snap = t.snapshots()[0].snapshot_id
    t.create_or_replace_view("clips_v0", snapshot_id=first_snap)
    assert spark.sql("SELECT count(*) AS n FROM clips_v0").collect()[0].n == 30


def test_partition_spec_evolution(spark, table_root):
    """Iceberg-style spec evolution: future writes use the new spec, old
    files keep their self-describing partition values, planning prunes
    both generations safely, and a clustering rewrite migrates old files
    to the current spec."""
    t = _make_table(spark, table_root)  # spec: identity(event_date)
    t.append(_df(spark, 0, 30, n_days=4))
    old_files = {e.file_path for e in t.live_files()}
    assert all(
        set(e.partition) == {"event_date"} for e in t.live_files()
    )

    spec_id = t.update_partition_spec(
        [
            {"name": "event_date", "transform": "identity",
             "source": "event_date"},
            {"name": "sr_bucket", "transform": "bucket", "source": "sr_hz",
             "n": 4},
        ]
    )
    assert spec_id == 1
    meta = t.meta
    assert len(meta.partition_specs) == 2
    assert meta.default_spec_id == 1

    t.append(_df(spark, 30, 60, n_days=4))
    new_files = [
        e for e in t.live_files() if e.file_path not in old_files
    ]
    assert new_files and all(
        set(e.partition) == {"event_date", "sr_bucket"} for e in new_files
    )
    assert t.scan().count() == 60

    # pruning is exact on new-spec files and conservative on old ones
    day = t.live_files()[0].partition["event_date"]
    plan = t.plan(filter=[("event_date", "=", dt.date.fromisoformat(day))])
    assert 0 < len(plan.files) < plan.candidate_files
    got = t.scan(
        filter=[("event_date", "=", dt.date.fromisoformat(day))]
    ).count()
    want = t.scan().filter(f"event_date = DATE'{day}'").count()
    assert got == want

    # overwrite refuses mixed specs, naming the migration path
    import pytest as _pytest

    with _pytest.raises(ValueError, match="older partition spec"):
        t.overwrite_partitions(_df(spark, 0, 5, n_days=4))

    # a clustering rewrite migrates everything to the current spec
    t.cluster(["clip_id"], target_file_size=4 * 1024 * 1024)
    assert all(
        set(e.partition) == {"event_date", "sr_bucket"}
        for e in t.live_files()
    )
    assert t.scan().count() == 60
    # and overwrite works again
    res = t.overwrite_partitions(_df(spark, 0, 5, n_days=4))
    assert res.snapshot_id is not None


def test_pure_migration_cluster_keeps_all_rows(spark, table_root):
    """Regression (round-2 review): when EVERY live file predates a spec
    evolution, cluster()'s commit must still add all outputs — an
    earlier version reassembled outputs through INPUT partition keys,
    which match nothing after migration and silently emptied the table."""
    t = _make_table(spark, table_root)
    t.append(_df(spark, 0, 40, n_days=2))
    t.update_partition_spec(
        [
            {"name": "event_date", "transform": "identity",
             "source": "event_date"},
            {"name": "srb", "transform": "bucket", "source": "sr_hz",
             "n": 4},
        ]
    )
    res = t.cluster(["clip_id"], target_file_size=4 * 1024 * 1024)
    assert res.files_created > 0
    assert t.scan().count() == 40
    assert all(
        set(e.partition) == {"event_date", "srb"} for e in t.live_files()
    )


def test_compact_preserves_spec_id_for_overwrite_guard(spark, table_root):
    """Regression (round-2 review): compaction concatenates old-spec
    partition values, so its outputs must INHERIT the old spec_id —
    stamping the current spec would disarm overwrite's mixed-spec guard
    and silently leave stale rows behind."""
    import pytest as _pytest

    t = _make_table(spark, table_root)
    for lo in (0, 20, 40):
        t.append(_df(spark, lo, lo + 20, n_days=2), target_file_count=2)
    t.update_partition_spec(
        [
            {"name": "event_date", "transform": "identity",
             "source": "event_date"},
            {"name": "srb", "transform": "bucket", "source": "sr_hz",
             "n": 4},
        ]
    )
    res = t.compact(target_file_size=64 * 1024 * 1024)
    assert res.bins > 0
    assert t.scan().count() == 60
    # compacted outputs still carry the OLD spec id
    assert all(e.spec_id == 0 for e in t.live_files())
    with _pytest.raises(ValueError, match="older partition spec"):
        t.overwrite_partitions(_df(spark, 0, 5, n_days=2))


def test_schema_evolution_type_widening(spark, tmp_path):
    """Iceberg's safe type promotions (int→long, float→double, decimal
    precision growth): old parquet files stay live UNREWRITTEN and read
    correctly under the widened schema; narrowing still rejected."""
    from decimal import Decimal

    from pyspark.sql import types as T

    from lakehouse import SchemaEvolutionError, Table

    schema = T.StructType([
        T.StructField("k", T.StringType(), False),
        T.StructField("a", T.IntegerType(), True),
        T.StructField("b", T.FloatType(), True),
        T.StructField("c", T.DecimalType(10, 2), True),
    ])
    t = Table.create(spark, str(tmp_path / "w"), schema)
    t.append(spark.createDataFrame(
        [("r1", 1, 1.5, Decimal("1.25")), ("r2", 2, 2.5, Decimal("2.25"))],
        schema=schema,
    ))
    files_before = {e.file_path for e in t.live_files()}

    widened = T.StructType([
        T.StructField("k", T.StringType(), False),
        T.StructField("a", T.LongType(), True),
        T.StructField("b", T.DoubleType(), True),
        T.StructField("c", T.DecimalType(18, 2), True),
        T.StructField("extra", T.StringType(), True),
    ])
    t.append(
        spark.createDataFrame(
            [("r3", 3_000_000_000, 3.5, Decimal("3.25"), "x")],
            schema=widened,
        ),
        new_schema=widened,
    )
    # the old file was not rewritten
    assert files_before <= {e.file_path for e in t.live_files()}
    got = t.scan()
    assert dict(got.dtypes)["a"] == "bigint"
    assert dict(got.dtypes)["b"] == "double"
    assert dict(got.dtypes)["c"] == "decimal(18,2)"
    rows = {r.k: r for r in got.collect()}
    assert rows["r1"].a == 1 and rows["r3"].a == 3_000_000_000
    assert rows["r1"].b == 1.5 and rows["r1"].c == Decimal("1.25")
    # pruning on the widened column still works across old + new stats
    # (empty parts have no stats and are conservatively kept — count
    # surviving ROWS, not files)
    pl = t.plan(filter=[("a", ">=", 3_000_000_000)])
    assert sum(e.record_count for e in pl.files) == 1
    # narrowing (long -> int) is rejected
    narrowed = T.StructType([
        T.StructField("k", T.StringType(), False),
        T.StructField("a", T.IntegerType(), True),
        T.StructField("b", T.DoubleType(), True),
        T.StructField("c", T.DecimalType(18, 2), True),
        T.StructField("extra", T.StringType(), True),
    ])
    with pytest.raises(SchemaEvolutionError):
        t.append(
            spark.createDataFrame(
                [("r4", 4, 4.5, Decimal("4.25"), "y")], schema=narrowed
            ),
            new_schema=narrowed,
        )
    # widened scan survives maintenance (compaction rewrites old files
    # under the CURRENT schema)
    t.compact()
    got2 = t.scan()
    assert got2.count() == 3
    assert {r.k for r in got2.collect()} == {"r1", "r2", "r3"}


def test_evolve_schema_metadata_only(spark, tmp_path):
    """Dedicated evolution commit: no data written, files stay live,
    scans read old files up-cast; incremental scans treat the commit as
    data-neutral."""
    from pyspark.sql import types as T

    from lakehouse import SchemaEvolutionError, Table

    schema = T.StructType([
        T.StructField("k", T.StringType(), False),
        T.StructField("a", T.IntegerType(), True),
    ])
    t = Table.create(spark, str(tmp_path / "ev"), schema)
    t.append(spark.createDataFrame([("r1", 1)], schema=schema))
    s0 = t.current_snapshot_id()
    files = {e.file_path for e in t.live_files()}

    widened = T.StructType([
        T.StructField("k", T.StringType(), False),
        T.StructField("a", T.LongType(), True),
        T.StructField("note", T.StringType(), True),
    ])
    snap = t.evolve_schema(widened)
    assert snap.snapshot_id != s0
    assert {e.file_path for e in t.live_files()} == files
    got = t.scan()
    assert dict(got.dtypes)["a"] == "bigint" and "note" in got.columns
    assert got.collect()[0].a == 1
    # data-neutral for incremental consumption
    inc = t.incremental_scan(from_snapshot_id=s0)
    assert inc.count() == 0
    with pytest.raises(SchemaEvolutionError):
        t.evolve_schema(schema)  # narrowing back is rejected


def test_time_travel_by_timestamp(spark, table_root):
    """scan(as_of=...): latest snapshot committed at or before the
    given instant; before-first-commit raises."""
    import datetime as dt2
    import time as time2

    from lakehouse import SnapshotNotFoundError

    t = _make_table(spark, table_root)
    t.append(_df(spark, 0, 16))
    ts1 = t.snapshots()[-1].timestamp_ms
    time2.sleep(0.05)
    t.append(_df(spark, 16, 32))

    assert t.scan(as_of=ts1).count() == 16
    assert t.scan(as_of=dt2.datetime.now()).count() == 32
    assert t.snapshot_as_of(ts1) == t.snapshots()[0].snapshot_id
    with pytest.raises(SnapshotNotFoundError):
        t.scan(as_of=ts1 - 10_000)
    with pytest.raises(Exception):
        t.scan(as_of=ts1, snapshot_id=1)


def test_concurrent_appends_threaded(spark, table_root):
    """Three writer threads race 9 appends through the CAS commit loop:
    every commit must land (optimistic retry), the snapshot chain stays
    linear, and no rows are lost or duplicated."""
    import threading

    t = _make_table(spark, table_root)
    errs = []

    def writer(wid):
        try:
            for i in range(3):
                lo = wid * 30 + i * 10
                t.append(_df(spark, lo, lo + 10))
        except Exception as e:  # pragma: no cover - failure evidence
            errs.append(e)

    threads = [
        threading.Thread(target=writer, args=(w,)) for w in range(3)
    ]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errs, errs
    snaps = t.snapshots()
    assert len(snaps) == 9 and all(s.operation == "append" for s in snaps)
    # linear history: each snapshot's parent is the previous one
    ids = [s.snapshot_id for s in snaps]
    parents = [s.parent_snapshot_id for s in snaps]
    assert parents == [None] + ids[:-1]
    got = t.scan().select("clip_id").collect()
    assert len(got) == 90 and len({r.clip_id for r in got}) == 90
