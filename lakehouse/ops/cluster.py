"""Z-order / Hilbert clustering rewrite (the OPTIMIZE ZORDER counterpart).

Pipeline per partition (partitions run as concurrent mini-jobs, same
scheduling model as compaction):

1. normalization bounds for each cluster column come from **manifest
   stats aggregation** — zero data passes over the table;
2. read the partition's live files, compute the 64-bit curve key in one
   vectorized pandas UDF (Arrow batch → numpy interleave, curves.py);
3. ``repartitionByRange(n_out, zkey)`` — Spark samples the key to build
   balanced range bounds (this shuffle *is* the clustering; skewed key
   densities get balanced by the sampler) — then
   ``sortWithinPartitions(zkey)`` so row groups inside each file are
   key-local too;
4. write one job-scoped Parquet set; the ``zkey`` column is persisted as
   a *hidden physical* column: scans project the declared table schema
   only (extra parquet columns are invisible), while stats harvest picks
   up per-file zkey ranges for free, giving lineage metrics and
   curve-range pruning;
5. one REPLACE commit; per-file min/max of the cluster columns are now
   tight, so range scans on them prune files (the effectiveness gate).
"""

from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field
from typing import Any, Optional, Sequence

import pandas as pd

from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..curves import bits_per_dim
from ..lineage import LineageLog
from ..meta.manifests import DataFileEntry
from ..ops.append import harvest_stats

ZKEY_COL = "zkey"


@dataclass
class ClusterResult:
    job_id: str
    snapshot_id: Optional[int]
    partitions: int
    files_rewritten: int
    files_created: int
    bytes_rewritten: int
    zkey_ranges: dict[str, list] = field(default_factory=dict)


def _column_bounds(
    files: Sequence[DataFileEntry], columns: Sequence[str]
) -> dict[str, tuple]:
    """Global [min, max] per cluster column from manifest stats."""
    bounds: dict[str, tuple] = {}
    for col in columns:
        lo = hi = None
        for e in files:
            st = e.stats.get(col) or {}
            if "min" not in st:
                continue
            lo = st["min"] if lo is None else min(lo, st["min"])
            hi = st["max"] if hi is None else max(hi, st["max"])
        bounds[col] = (lo, hi)
    return bounds


def _make_zkey_udf(
    columns: Sequence[str],
    col_types: dict[str, T.DataType],
    bounds: dict[str, tuple],
    curve: str,
):
    """Vectorized curve-key UDF closed over broadcastable bounds."""
    bits = bits_per_dim(len(columns))
    string_cols = {
        c for c in columns if isinstance(col_types[c], T.StringType)
    }
    temporal = (T.TimestampType, T.DateType)
    temporal_cols = {c for c in columns if isinstance(col_types[c], temporal)}
    b = dict(bounds)

    @F.pandas_udf(T.LongType())
    def zkey_udf(*cols: pd.Series) -> pd.Series:
        import numpy as np

        from ..curves import curve_index, normalize_to_uint

        coords = []
        for name, series in zip(columns, cols):
            lo, hi = b[name]
            if name in temporal_cols:
                series = pd.to_datetime(series).astype("int64")
                lo = pd.Timestamp(lo).value if lo is not None else None
                hi = pd.Timestamp(hi).value if hi is not None else None
            coords.append(
                normalize_to_uint(
                    series, lo, hi, bits, is_string=name in string_cols
                )
            )
        idx = curve_index(coords, bits, curve)
        # keys fit in int64: k*bits <= 64 with sign bit only hit when
        # k*bits == 64; shift right 1 keeps order and avoids overflow
        return pd.Series((idx >> np.uint64(1)).astype("int64"))

    return zkey_udf


def cluster(
    table,
    columns: Sequence[str],
    *,
    curve: str = "zorder",
    target_file_size: int = 128 * 1024 * 1024,
    partition_filter=None,
    max_concurrency: int = 8,
    job_id: Optional[str] = None,
    fault_injector=None,
) -> ClusterResult:
    if curve not in ("zorder", "hilbert"):
        raise ValueError("curve must be 'zorder' or 'hilbert'")
    spark = table.spark
    schema = table.schema
    col_types = {f.name: f.dataType for f in schema.fields}
    for c in columns:
        if c not in col_types:
            raise ValueError(f"unknown cluster column: {c}")

    log = LineageLog(table.root, job_id)
    log.start_job(
        "cluster", {"columns": list(columns), "curve": curve}
    )
    live = table.plan(filter=partition_filter).files
    if not live:
        log.finish_job({"partitions": 0})
        return ClusterResult(log.job_id, None, 0, 0, 0, 0)

    bounds = _column_bounds(live, columns)
    zkey_udf = _make_zkey_udf(columns, col_types, bounds, curve)

    by_partition: dict[str, list[DataFileEntry]] = {}
    for e in live:
        by_partition.setdefault(
            str(sorted(e.partition.items())), []
        ).append(e)

    existing = log.done_tasks()
    job_data_rel = f"data/{log.job_id}"

    def run_partition(item) -> tuple[list[str], list[DataFileEntry], list]:
        import hashlib

        pkey, members = item
        key = "part-" + hashlib.sha1(pkey.encode()).hexdigest()[:16]
        files_in = [e.file_path for e in members]
        bytes_in = sum(e.file_size_bytes for e in members)
        if key in existing:
            rec = existing[key]
            return rec.files_in, rec.out_entries(), rec.zkey_range
        log.start_task(key, files_in, bytes_in)
        n_out = max(1, round(bytes_in / target_file_size))
        paths = [os.path.join(table.root, p) for p in files_in]
        out_rel_dir = f"{job_data_rel}/{key}"
        wide = (
            spark.read.schema(schema)
            .parquet(*paths)
            .withColumn(ZKEY_COL, zkey_udf(*[F.col(c) for c in columns]))
        )
        if n_out > 1:
            # Two-phase range placement. repartitionByRange would sample
            # by EXECUTING THE CHILD TWICE — for audio rows that means
            # reading every binary payload and running the key UDF twice.
            # Instead: (A) a narrow pass over just the cluster columns
            # (Parquet column pruning skips the bytes entirely) gets the
            # zkey quantile cuts; (B) one wide pass assigns each row its
            # range bucket with a codegen'd comparison chain, and
            # ``write.partitionBy(bucket)`` splits files per bucket, so
            # each output file covers one tight zkey range regardless of
            # which task wrote it (hash collisions cost balance, never
            # range purity).
            narrow = (
                spark.read.schema(schema)
                .parquet(*paths)
                .select(*columns)
                .withColumn(
                    ZKEY_COL, zkey_udf(*[F.col(c) for c in columns])
                )
            )
            cuts = narrow.approxQuantile(
                ZKEY_COL,
                [i / n_out for i in range(1, n_out)],
                0.01,
            )
            cuts = sorted({int(c) for c in cuts})
            bucket = F.lit(0)
            for c in cuts:
                bucket = bucket + (F.col(ZKEY_COL) > F.lit(c)).cast("int")
            (
                wide.withColumn("__bucket", bucket)
                .repartition(len(cuts) + 1, F.col("__bucket"))
                .sortWithinPartitions("__bucket", ZKEY_COL)
                .write.partitionBy("__bucket")
                .mode("overwrite")
                .parquet(os.path.join(table.root, out_rel_dir))
            )
        else:
            (
                wide.coalesce(1)
                .sortWithinPartitions(ZKEY_COL)
                .write.mode("overwrite")
                .parquet(os.path.join(table.root, out_rel_dir))
            )
        base = os.path.join(table.root, out_rel_dir)
        out_files = []
        for dirpath, _dn, fns in os.walk(base):
            for n in sorted(fns):
                if n.endswith(".parquet"):
                    rel = os.path.relpath(
                        os.path.join(dirpath, n), table.root
                    )
                    out_files.append((rel, members[0].partition))
        out_files.sort()
        entries = harvest_stats(
            spark,
            table.root,
            out_files,
            sort_order=f"{curve}({','.join(columns)})",
        )
        zr = None
        zstats = [e.stats.get(ZKEY_COL, {}) for e in entries]
        zvals = [s for s in zstats if "min" in s]
        if zvals:
            zr = [min(s["min"] for s in zvals), max(s["max"] for s in zvals)]
        if fault_injector is not None:
            fault_injector(key)
        log.finish_task(
            key, entries, files_in=files_in, bytes_in=bytes_in, zkey_range=zr
        )
        return files_in, entries, zr

    added: list[DataFileEntry] = []
    removed: list[str] = []
    zranges: dict[str, list] = {}
    items = sorted(by_partition.items())
    with ThreadPoolExecutor(max_workers=max_concurrency) as pool:
        for (pkey, _), (files_in, entries, zr) in zip(
            items, pool.map(run_partition, items)
        ):
            removed.extend(files_in)
            added.extend(entries)
            if zr:
                zranges[pkey] = zr

    bytes_rewritten = sum(e.file_size_bytes for e in added)
    snap = table._commit_files(
        "replace",
        added,
        removed,
        summary={
            "job_id": log.job_id,
            "cluster_columns": list(columns),
            "curve": curve,
            "bytes_rewritten": bytes_rewritten,
        },
    )
    log.finish_job(
        {
            "partitions": len(by_partition),
            "files_created": len(added),
            "snapshot_id": snap.snapshot_id,
        }
    )
    return ClusterResult(
        job_id=log.job_id,
        snapshot_id=snap.snapshot_id,
        partitions=len(by_partition),
        files_rewritten=len(removed),
        files_created=len(added),
        bytes_rewritten=bytes_rewritten,
        zkey_ranges=zranges,
    )
