"""Named catalog: the engine-side Glue-catalog analog.

The reference's analysts resolve tables by NAME through a catalog
(infra/terraform/modules/glue/main.tf:130-182); these tests pin our
naming layer: CAS-versioned registration, managed create, external
register/unregister (pointer-only), SQL views across the catalog, and
format reads via catalog+table options.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from lakehouse import Catalog, CatalogError, Table
from lakehouse.schema import CLIPS_SCHEMA
from lakehouse.synth import synth_clips_df


@pytest.fixture()
def warehouse(tmp_path):
    return Catalog.create(str(tmp_path / "wh"))


def test_create_load_and_managed_table(spark, warehouse):
    t = warehouse.create_table(
        spark,
        "clips",
        CLIPS_SCHEMA,
        partition_spec=[
            {"name": "event_date", "transform": "identity",
             "source": "event_date"}
        ],
    )
    t.append(synth_clips_df(spark, 60, seed=71, n_days=2),
             target_file_count=2)
    again = Catalog.load(warehouse.path)
    assert again.tables() == {"clips": t.root}
    assert again.load_table(spark, "clips").scan().count() == 60
    # managed tables live under the warehouse
    assert t.root.startswith(warehouse.path)


def test_register_external_and_unregister_keeps_data(spark, warehouse,
                                                     tmp_path):
    ext_root = str(tmp_path / "elsewhere" / "ext")
    t = Table.create(spark, ext_root, CLIPS_SCHEMA)
    t.append(synth_clips_df(spark, 20, seed=72, n_days=1),
             target_file_count=1)
    warehouse.register("ext", ext_root)
    assert warehouse.load_table(spark, "ext").scan().count() == 20
    with pytest.raises(CatalogError, match="already registered"):
        warehouse.register("ext", ext_root)
    warehouse.register("ext", ext_root, replace=True)
    warehouse.unregister("ext")
    assert "ext" not in warehouse.tables()
    # pointer-only drop: data intact, re-registerable
    assert Table.load(spark, t.root).scan().count() == 20
    with pytest.raises(CatalogError, match="unknown table"):
        warehouse.resolve("ext")


def test_register_rejects_bad_names_and_missing_tables(warehouse, tmp_path):
    with pytest.raises(CatalogError, match="invalid table name"):
        warehouse.register("../escape", str(tmp_path))
    from lakehouse.errors import TableNotFoundError

    with pytest.raises(TableNotFoundError):
        warehouse.register("ghost", str(tmp_path / "nope"))


def test_sql_views_across_catalog(spark, warehouse):
    a = warehouse.create_table(spark, "bronze", CLIPS_SCHEMA)
    a.append(synth_clips_df(spark, 30, seed=73, n_days=1),
             target_file_count=1)
    b = warehouse.create_table(spark, "gold", CLIPS_SCHEMA)
    b.append(synth_clips_df(spark, 10, start=500, seed=74, n_days=1),
             target_file_count=1)
    names = warehouse.register_views(spark)
    assert names == ["bronze", "gold"]
    got = spark.sql(
        "SELECT (SELECT count(*) FROM bronze) AS nb, "
        "(SELECT count(*) FROM gold) AS ng"
    ).first()
    assert (got.nb, got.ng) == (30, 10)
    # views are snapshot-pinned: a later append is invisible until
    # re-registration (the documented create_or_replace_view contract)
    a.append(synth_clips_df(spark, 5, start=900, seed=75, n_days=1),
             target_file_count=1)
    assert spark.sql("SELECT count(*) n FROM bronze").first().n == 30
    warehouse.register_views(spark, names=["bronze"])
    assert spark.sql("SELECT count(*) n FROM bronze").first().n == 35


def test_format_reads_by_catalog_name(spark, warehouse):
    from lakehouse.datasource import register

    register(spark)
    t = warehouse.create_table(spark, "clips", CLIPS_SCHEMA)
    t.append(synth_clips_df(spark, 40, seed=76, n_days=1),
             target_file_count=2)
    df = (
        spark.read.format("lakehouse")
        .option("catalog", warehouse.path)
        .option("table", "clips")
        .load()
    )
    assert df.count() == 40
    assert df.exceptAll(t.scan()).count() == 0
    with pytest.raises(Exception, match="BOTH"):
        spark.read.format("lakehouse").option(
            "catalog", warehouse.path
        ).load().count()


def test_concurrent_registration_cas(warehouse, spark, tmp_path):
    """Racing registrations both land (optimistic rebase), never
    overwrite each other."""
    import threading

    roots = []
    for i in range(2):
        r = str(tmp_path / f"t{i}")
        Table.create(spark, r, CLIPS_SCHEMA)
        roots.append(r)
    errs = []

    def reg(i):
        try:
            warehouse.register(f"t{i}", roots[i])
        except Exception as e:  # pragma: no cover
            errs.append(e)

    threads = [threading.Thread(target=reg, args=(i,)) for i in range(2)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errs
    assert set(warehouse.tables()) == {"t0", "t1"}


def test_maintain_all_sweeps_tables_and_derived(spark, tmp_path):
    """One call: autopilot on plain tables, refresh on registered
    rollups and feature transforms — refresh result modes prove the
    derived tables actually folded in the base's delta."""
    from lakehouse import Table
    from lakehouse.catalog import Catalog
    from lakehouse.rollup import MaterializedRollup
    from lakehouse.schema import CLIPS_SCHEMA
    from lakehouse.synth import synth_clips_df
    from lakehouse.transform import MaterializedTransform

    cat = Catalog.create(str(tmp_path / "wh"))
    base = Table.create(spark, str(tmp_path / "wh" / "clips"), CLIPS_SCHEMA)
    cat.register("clips", base.root)
    # lots of small files so the autopilot has something to compact
    for i in range(3):
        base.append(
            synth_clips_df(spark, 16, seed=i, n_days=2, start=i * 1000),
            target_file_count=4,
        )
    roll = MaterializedRollup.create(
        spark, str(tmp_path / "wh" / "roll"), base,
        group_by=["event_date"],
        aggs={"n": ("count", None)},
    )
    cat.register("clips_rollup", roll.table.root)
    mt = MaterializedTransform.create(
        spark, str(tmp_path / "wh" / "feat"), base,
        key="clip_id", columns=["clip_id", "dur_ms"],
        exprs={"dur_s": "dur_ms / 1000.0"},
    )
    cat.register("clips_features", mt.table.root)

    out = cat.maintain_all(spark)
    assert out["clips_rollup"]["refresh"].mode == "full"
    assert out["clips_features"]["refresh"].mode == "full"
    assert any(a["action"] == "compact" for a in out["clips"].actions)

    # second sweep after new data: derived go incremental, base settles
    base.append(synth_clips_df(spark, 8, seed=9, n_days=2, start=9000))
    out2 = cat.maintain_all(spark)
    assert out2["clips_rollup"]["refresh"].mode == "incremental"
    assert out2["clips_features"]["refresh"].mode == "incremental"
    # derived parity
    got, exp = mt.scan(), mt.expected()
    assert got.exceptAll(exp).isEmpty() and exp.exceptAll(got).isEmpty()

    # dry-run reports without acting
    dr = cat.maintain_all(spark, dry_run=True)
    assert dr["clips_rollup"]["refresh"] == {
        "action": "refresh", "dry_run": True
    }


def test_maintain_all_compacts_derived_small_files(spark, tmp_path):
    """Derived tables are ordinary tables: after many per-batch
    refreshes pile up small files, the warehouse sweep must compact
    the DERIVED table too, not only its base (ADVICE r2)."""
    from lakehouse import Table
    from lakehouse.catalog import Catalog
    from lakehouse.schema import CLIPS_SCHEMA
    from lakehouse.synth import synth_clips_df
    from lakehouse.transform import MaterializedTransform

    cat = Catalog.create(str(tmp_path / "wh"))
    base = Table.create(spark, str(tmp_path / "wh" / "clips"), CLIPS_SCHEMA)
    cat.register("clips", base.root)
    mt = MaterializedTransform.create(
        spark, str(tmp_path / "wh" / "feat"), base,
        key="clip_id", columns=["clip_id", "dur_ms"],
        exprs={"dur_s": "dur_ms / 1000.0"},
    )
    cat.register("clips_features", mt.table.root)
    # simulate a streaming-refreshed derived table: one tiny file per
    # micro-batch refresh
    for i in range(4):
        base.append(
            synth_clips_df(spark, 12, seed=i, n_days=1, start=i * 100)
        )
        mt.refresh()
    n_files_before = len(mt.table.live_files())
    assert n_files_before >= 4
    out = cat.maintain_all(spark)
    rep = out["clips_features"]["maintain"]
    assert any(a["action"] == "compact" for a in rep.actions), rep
    assert len(mt.table.live_files()) < n_files_before
    # rows unchanged by maintenance
    got, exp = mt.scan(), mt.expected()
    assert got.exceptAll(exp).isEmpty() and exp.exceptAll(got).isEmpty()


def test_pinned_views_reproducible_across_writes(spark, warehouse):
    """Catalog.pin captures a warehouse-wide read set; register_views
    with those pins re-creates the identical view set after arbitrary
    writes — the reproducible multi-table analyst session."""
    a = warehouse.create_table(spark, "a", CLIPS_SCHEMA)
    b = warehouse.create_table(spark, "b", CLIPS_SCHEMA)
    a.append(synth_clips_df(spark, 30, seed=1, n_days=2))
    b.append(synth_clips_df(spark, 20, seed=2, n_days=2))

    pins = warehouse.pin(spark)
    assert set(pins) == {"a", "b"}

    a.append(synth_clips_df(spark, 10, seed=3, n_days=2, start=100))
    b.delete("dur_ms >= 0", mode="mor", key="clip_id")  # wipes b's head

    warehouse.register_views(spark, prefix="pin_", pins=pins)
    assert spark.sql("SELECT count(*) FROM pin_a").collect()[0][0] == 30
    assert spark.sql("SELECT count(*) FROM pin_b").collect()[0][0] == 20
    # unpinned views see the new heads
    warehouse.register_views(spark, prefix="cur_")
    assert spark.sql("SELECT count(*) FROM cur_a").collect()[0][0] == 40
    assert spark.sql("SELECT count(*) FROM cur_b").collect()[0][0] == 0


def test_metrics_all_unions_per_table_ledgers(spark, warehouse):
    a = warehouse.create_table(spark, "a", CLIPS_SCHEMA)
    b = warehouse.create_table(spark, "b", CLIPS_SCHEMA)
    a.append(synth_clips_df(spark, 20, seed=1, n_days=2))
    a.compact()
    b.append(synth_clips_df(spark, 10, seed=2, n_days=2))

    m = warehouse.metrics_all(spark)
    rows = m.collect()
    assert {r.table_name for r in rows} == {"a", "b"}
    assert len([r for r in rows if r.table_name == "a"]) == 2
    assert len([r for r in rows if r.table_name == "b"]) == 1
    per_op = {(r.table_name, r.operation) for r in rows}
    assert ("a", "append") in per_op and ("a", "replace") in per_op
