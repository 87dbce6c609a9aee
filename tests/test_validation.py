"""E2 quarantine split + C2 manifest/filesystem verification."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from lakehouse import Table
from lakehouse.schema import CLIPS_SCHEMA
from lakehouse.streaming import enrich, validate_split
from lakehouse.synth import synth_clips_df

DATE_SPEC = [
    {"name": "event_date", "transform": "identity", "source": "event_date"}
]


def test_validate_split_quarantines_bad_audio(spark):
    good = synth_clips_df(spark, 24, seed=5, n_days=2)
    corrupted = (
        synth_clips_df(spark, 8, start=100, seed=5, n_days=2)
        .withColumn("bytes", F.lit(b"not a wav file"))
    )
    mislabeled = (
        synth_clips_df(spark, 4, start=200, seed=5, n_days=2)
        .withColumn("sr_hz", F.lit(12345))
    )
    df = good.unionByName(corrupted).unionByName(mislabeled)
    valid, quarantine = validate_split(df)
    assert valid.count() == 24
    q = quarantine.select("clip_id", "reject_reason").collect()
    assert len(q) == 12
    reasons = {r.reject_reason for r in q}
    assert any("mismatch" in r for r in reasons)
    assert any("mismatch" not in r for r in reasons)


def test_enrich_adds_ingest_fields(spark):
    df = enrich(synth_clips_df(spark, 4, seed=5, n_days=2).drop("ingest_ts"))
    row = df.select("ingest_ts", "request_id").first()
    assert row.ingest_ts is not None
    assert len(row.request_id) == 36  # uuid


def test_table_verify_detects_missing_and_drift(spark, table_root):
    t = Table.create(spark, table_root, CLIPS_SCHEMA, partition_spec=DATE_SPEC)
    t.append(synth_clips_df(spark, 32, seed=5, n_days=2), target_file_count=4)
    rep = t.verify()
    assert rep["consistent"] and rep["files_checked"] > 1

    victim = t.live_files()[0].file_path
    full = os.path.join(t.root, victim)
    with open(full, "ab") as f:
        f.write(b"x")  # size drift
    rep = t.verify()
    assert not rep["consistent"]
    assert rep["size_drift"] and rep["size_drift"][0]["file"] == victim

    os.remove(full)
    rep = t.verify()
    assert rep["missing"] == [victim]
