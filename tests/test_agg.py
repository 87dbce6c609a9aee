"""Metadata-only aggregates (ops/agg.py): COUNT/MIN/MAX from manifest
stats, boundary-file reads only where a predicate genuinely splits a
file, and the MoR-deletes fallback — each gated against the real scan.
"""

import pytest
from pyspark.sql import functions as F

from lakehouse import CLIPS_SCHEMA, Table
from lakehouse.synth import synth_clips_pdf

DATE_SPEC = [
    {"name": "event_date", "transform": "identity", "source": "event_date"}
]


@pytest.fixture()
def table(spark, table_root):
    t = Table.create(spark, table_root, CLIPS_SCHEMA, partition_spec=DATE_SPEC)
    for i in range(2):
        pdf = synth_clips_pdf(range(i * 40, (i + 1) * 40), seed=42, n_days=3)
        t.append(
            spark.createDataFrame(pdf, schema=CLIPS_SCHEMA),
            target_file_count=2,
        )
    return t


def test_count_unfiltered_is_pure_metadata(table):
    res = table.count_rows()
    assert res.value == table.scan().count() == 80
    assert res.files_scanned == 0 and res.fallback is None
    assert res.files_metadata_only == len(table.live_files())


def test_count_partition_filter_is_pure_metadata(table):
    import datetime as dt

    day = dt.date(2024, 1, 1)
    flt = [("event_date", "=", day)]
    res = table.count_rows(filter=flt)
    assert res.value == table.scan().filter(
        F.col("event_date") == F.lit(day)
    ).count()
    # identity-partition predicate: every kept file fully matches
    assert res.files_scanned == 0


def test_count_range_filter_reads_only_boundary_files(table):
    flt = [("dur_ms", ">=", 1500)]
    res = table.count_rows(filter=flt)
    assert res.value == table.scan().filter("dur_ms >= 1500").count()
    # dur_ms spans every file: all kept files are boundary reads, and
    # the answer still matches the scan
    assert res.files_metadata_only + res.files_scanned == len(
        table.plan(filter=flt).files
    )


def test_count_falls_back_under_pending_mor_delete(table):
    table.delete("dur_ms <= 1200", mode="mor", key="clip_id")
    res = table.count_rows()
    assert res.fallback == "mor-deletes-pending"
    assert res.value == table.scan().count()
    table.materialize_deletes()
    res2 = table.count_rows()
    assert res2.fallback is None and res2.files_scanned == 0
    assert res2.value == res.value


def test_min_max_matches_scan(table):
    res = table.min_max(["dur_ms", "sr_hz"])
    row = table.scan().agg(
        F.min("dur_ms"), F.max("dur_ms"), F.min("sr_hz"), F.max("sr_hz")
    ).collect()[0]
    assert res.per_column["dur_ms"] == (row[0], row[1])
    assert res.per_column["sr_hz"] == (row[2], row[3])
    assert res.files_scanned == 0  # numeric stats are exact


def test_min_max_filtered_and_temporal(table):
    import datetime as dt

    day = dt.date(2024, 1, 1)
    flt = [("event_date", "=", day)]
    res = table.min_max(["ingest_ts"], filter=flt)
    row = (
        table.scan()
        .filter(F.col("event_date") == F.lit(day))
        .agg(F.min("ingest_ts"), F.max("ingest_ts"))
        .collect()[0]
    )
    # stats encode timestamps as ISO strings; compare like-for-like
    lo, hi = res.per_column["ingest_ts"]
    assert lo == row[0].isoformat(sep=" ")
    assert hi == row[1].isoformat(sep=" ")


def test_always_matches_stats_null_handling():
    from lakehouse.expressions import Predicate
    from lakehouse.ops.agg import _always_matches_stats

    st = {"min": 10, "max": 20, "nulls": 0, "rows": 5}
    assert _always_matches_stats(Predicate("c", ">=", 10), st)
    assert _always_matches_stats(Predicate("c", "<=", 20), st)
    assert not _always_matches_stats(Predicate("c", ">", 10), st)
    assert _always_matches_stats(Predicate("c", "not_null"), st)
    # any null defeats every comparison (three-valued logic)
    stn = {"min": 10, "max": 20, "nulls": 1, "rows": 5}
    assert not _always_matches_stats(Predicate("c", ">=", 10), stn)
    assert not _always_matches_stats(Predicate("c", "not_null"), stn)
    assert _always_matches_stats(
        Predicate("c", "is_null"), {"min": None, "max": None, "nulls": 5, "rows": 5}
    )
    # truncated string stats are outer bounds — still safe for the dual
    lo64 = "a" * 64
    sts = {"min": lo64, "max": lo64 + "￿", "nulls": 0, "rows": 3}
    assert _always_matches_stats(Predicate("c", "<", "b"), sts)
    assert not _always_matches_stats(Predicate("c", "=", lo64), sts)


# --- SUM pushdown (agg_stats_columns) ---------------------------------------


@pytest.fixture()
def sum_table(spark, table_root):
    t = Table.create(
        spark,
        table_root,
        CLIPS_SCHEMA,
        partition_spec=DATE_SPEC,
        properties={"agg_stats_columns": "dur_ms"},
    )
    for i in range(2):
        pdf = synth_clips_pdf(range(i * 40, (i + 1) * 40), seed=42, n_days=3)
        t.append(
            spark.createDataFrame(pdf, schema=CLIPS_SCHEMA),
            target_file_count=2,
        )
    return t


def test_sum_unfiltered_is_pure_metadata(sum_table):
    res = sum_table.sum_agg(["dur_ms"])
    row = sum_table.scan().agg(
        F.sum("dur_ms"), F.count("dur_ms")
    ).collect()[0]
    assert res.per_column["dur_ms"] == (row[0], row[1])
    assert res.files_scanned == 0 and res.fallback is None


def test_sum_partition_filter_is_pure_metadata(sum_table):
    import datetime as dt

    day = dt.date(2024, 1, 1)
    flt = [("event_date", "=", day)]
    res = sum_table.sum_agg(["dur_ms"], filter=flt)
    row = (
        sum_table.scan()
        .filter(F.col("event_date") == F.lit(day))
        .agg(F.sum("dur_ms"), F.count("dur_ms"))
        .collect()[0]
    )
    assert res.per_column["dur_ms"] == (row[0], row[1])
    assert res.files_scanned == 0


def test_sum_range_filter_reads_only_boundary_files(sum_table):
    flt = [("dur_ms", ">=", 1500)]
    res = sum_table.sum_agg(["dur_ms"], filter=flt)
    row = (
        sum_table.scan()
        .filter("dur_ms >= 1500")
        .agg(F.sum("dur_ms"), F.count("dur_ms"))
        .collect()[0]
    )
    assert res.per_column["dur_ms"] == (row[0], row[1])
    assert res.files_metadata_only + res.files_scanned == len(
        sum_table.plan(filter=flt).files
    )


def test_sum_opt_in_after_first_append_reads_legacy_files(
    spark, table_root
):
    t = Table.create(
        spark, table_root, CLIPS_SCHEMA, partition_spec=DATE_SPEC
    )
    pdf = synth_clips_pdf(range(40), seed=42, n_days=3)
    t.append(spark.createDataFrame(pdf, schema=CLIPS_SCHEMA),
             target_file_count=2)
    n_legacy = len(t.live_files())
    t.set_properties(agg_stats_columns="dur_ms")
    pdf2 = synth_clips_pdf(range(40, 80), seed=42, n_days=3)
    t.append(spark.createDataFrame(pdf2, schema=CLIPS_SCHEMA),
             target_file_count=2)
    res = t.sum_agg(["dur_ms"])
    row = t.scan().agg(F.sum("dur_ms"), F.count("dur_ms")).collect()[0]
    # legacy (pre-opt-in) files lack sums: read, never guessed
    assert res.files_scanned == n_legacy
    assert res.per_column["dur_ms"] == (row[0], row[1])


def test_sum_falls_back_under_pending_mor_delete(sum_table):
    sum_table.delete("dur_ms <= 1200", mode="mor", key="clip_id")
    res = sum_table.sum_agg(["dur_ms"])
    assert res.fallback == "mor-deletes-pending"
    row = sum_table.scan().agg(
        F.sum("dur_ms"), F.count("dur_ms")
    ).collect()[0]
    assert res.per_column["dur_ms"] == (row[0], row[1])
    sum_table.materialize_deletes()
    res2 = sum_table.sum_agg(["dur_ms"])
    assert res2.fallback is None and res2.files_scanned == 0
    assert res2.per_column["dur_ms"] == res.per_column["dur_ms"]


def test_sum_null_semantics(spark, tmp_path):
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("grp", T.StringType()),
            T.StructField("v", T.LongType()),
        ]
    )
    t = Table.create(
        spark,
        str(tmp_path / "nulls"),
        schema,
        partition_spec=[
            {"name": "grp", "transform": "identity", "source": "grp"}
        ],
        properties={"agg_stats_columns": "v"},
    )
    rows = [(1, "a", 10), (2, "a", None), (3, "b", None), (4, "b", None)]
    t.append(spark.createDataFrame(rows, schema), target_file_count=1)
    res = t.sum_agg(["v"])
    assert res.per_column["v"] == (10, 1)  # SUM/COUNT ignore NULLs
    assert res.files_scanned == 0
    # group of only NULLs: SUM is NULL (None), count 0 — pure metadata
    res_b = t.sum_agg(["v"], filter=[("grp", "=", "b")])
    assert res_b.per_column["v"] == (None, 0)
    assert res_b.files_scanned == 0
