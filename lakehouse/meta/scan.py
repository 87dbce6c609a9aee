"""Scan planning: snapshot → pruned file list → Spark DataFrame.

This is the engine-side realization of the reference's read path
(Athena → Glue catalog → Delta log → pruned Parquet scan,
/root/reference/README.md:104-114; SURVEY.md §3.3): all pruning happens
*before* a DataFrame exists, over small metadata — partition values
exactly, then per-file min/max stats conservatively. The residual filter
is re-applied in Spark so Catalyst additionally pushes it into the
Parquet reader (row-group skipping), matching the reference's
``filterPushdown=true`` (/root/reference/etl/glue_stream.py:301).

For manifest sets too large for the driver (10^12-row tables have
millions of files), ``plan_scan_distributed`` runs the same pruning as a
Spark job over the manifest Parquet files themselves.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field
from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..expressions import (
    Predicate,
    matches_partition,
    matches_stats,
    normalize_filter,
    to_sql,
)
from .manifests import DataFileEntry, read_manifest
from .snapshots import TableMetadata, read_manifest_list


@dataclass
class ScanPlan:
    files: list[DataFileEntry]
    residual_sql: Optional[str]
    snapshot_id: int
    candidate_files: int = 0  # before pruning (for skip-ratio metrics)
    pruned_manifests: int = 0
    stats: dict = field(default_factory=dict)

    @property
    def skipped_files(self) -> int:
        return self.candidate_files - len(self.files)


def _manifest_may_match(
    manifest_summary: dict, preds: Sequence[Predicate]
) -> bool:
    """Coarse manifest-level pruning using the partition roll-up recorded
    in the manifest list (skip opening manifests for dead partitions)."""
    parts = manifest_summary.get("partitions")
    if not parts or len(parts) >= 1000:  # capped summary: can't prune
        return True
    for pj in parts:
        partition = json.loads(pj)
        if all(matches_partition(p, partition) for p in preds):
            return True
    return False


def plan_scan(
    table_root: str,
    meta: TableMetadata,
    *,
    filter=None,  # noqa: A002
    snapshot_id: Optional[int] = None,
) -> ScanPlan:
    """Driver-side planning (metadata is small relative to data)."""
    preds = normalize_filter(filter)
    if snapshot_id is None and meta.current_snapshot_id is None:
        return ScanPlan([], to_sql(preds), snapshot_id=0)  # empty table
    snap = meta.snapshot(snapshot_id)
    manifests = read_manifest_list(table_root, snap.manifest_list)

    kept: list[DataFileEntry] = []
    candidates = 0
    pruned_manifests = 0
    for m in manifests:
        if preds and not _manifest_may_match(m.get("summary", {}), preds):
            pruned_manifests += 1
            candidates += m.get("summary", {}).get("entry_count", 0)
            continue
        for entry in read_manifest(table_root, m["path"]):
            candidates += 1
            if preds:
                if not all(matches_partition(p, entry.partition) for p in preds):
                    continue
                if not all(
                    matches_stats(p, entry.stats.get(p.col)) for p in preds
                ):
                    continue
            kept.append(entry)

    return ScanPlan(
        files=kept,
        residual_sql=to_sql(preds),
        snapshot_id=snap.snapshot_id,
        candidate_files=candidates,
        pruned_manifests=pruned_manifests,
    )


def read_plan(
    spark: SparkSession,
    table_root: str,
    meta: TableMetadata,
    plan: ScanPlan,
    *,
    columns: Optional[Sequence[str]] = None,
) -> DataFrame:
    """Materialize a plan as a DataFrame.

    Data files are self-contained (identity-partition columns are stored
    in the files, see ops/append.py), so the read is a plain multi-path
    Parquet scan with the declared schema — no inference, mirroring the
    reference's ``inferSchema="false"`` stance (etl/glue_stream.py:133).
    """
    schema = T.StructType.fromJson(meta.schema_json)
    if not plan.files:
        df = spark.createDataFrame([], schema)
    else:
        paths = [os.path.join(table_root, e.file_path) for e in plan.files]
        df = spark.read.schema(schema).parquet(*paths)
    if plan.residual_sql:
        df = df.filter(plan.residual_sql)
    if columns:
        df = df.select(*columns)
    return df


def plan_scan_distributed(
    spark: SparkSession,
    table_root: str,
    meta: TableMetadata,
    *,
    filter=None,  # noqa: A002
    snapshot_id: Optional[int] = None,
) -> ScanPlan:
    """Same pruning semantics, but executed as a Spark job over the
    manifest Parquet files — the scale path when a snapshot tracks more
    files than the driver should hold (millions of entries).

    Partition + stats pruning run inside an Arrow-batched ``mapInPandas``
    (no per-row Python at the JVM boundary), and only surviving entries
    are collected (the output is bounded by the files actually read).
    """
    import pandas as pd

    preds = normalize_filter(filter)
    if snapshot_id is None and meta.current_snapshot_id is None:
        return ScanPlan([], to_sql(preds), snapshot_id=0)  # empty table
    snap = meta.snapshot(snapshot_id)
    manifests = read_manifest_list(table_root, snap.manifest_list)
    paths = [os.path.join(table_root, m["path"]) for m in manifests]
    if not paths:
        return ScanPlan([], to_sql(preds), snap.snapshot_id)

    mdf = spark.read.parquet(*paths)
    total = mdf.count()
    if not preds:
        kept_rows = mdf.toPandas().to_dict("records")
    else:
        pred_payload = [(p.col, p.op, p.value) for p in preds]

        def keep_batch(batches):
            from ..expressions import Predicate as P
            from ..expressions import matches_partition as mp
            from ..expressions import matches_stats as ms

            local_preds = [P(c, o, v) for c, o, v in pred_payload]
            for pdf in batches:
                mask = []
                for part_j, stats_j in zip(
                    pdf["partition_json"], pdf["stats_json"]
                ):
                    part = json.loads(part_j or "{}")
                    stats = json.loads(stats_j or "{}")
                    ok = all(mp(p, part) for p in local_preds) and all(
                        ms(p, stats.get(p.col)) for p in local_preds
                    )
                    mask.append(ok)
                yield pdf[pd.Series(mask, index=pdf.index)]

        kept_rows = (
            mdf.mapInPandas(keep_batch, mdf.schema).toPandas().to_dict("records")
        )

    return ScanPlan(
        files=[DataFileEntry.from_row(r) for r in kept_rows],
        residual_sql=to_sql(preds),
        snapshot_id=snap.snapshot_id,
        candidate_files=total,
    )
