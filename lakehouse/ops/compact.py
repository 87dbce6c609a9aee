"""Bin-packing small-file compaction (the OPTIMIZE counterpart).

The reference's streaming append with ``shuffle.partitions=1``
(/root/reference/etl/glue_stream.py:297) is the canonical small-file
generator; README.md:68 names "Delta Lake partition optimization" as the
perf lever but ships no code for it — this module is that code.

Strategy (matches Iceberg's binpack rewrite, built from DataFrame ops):

1. **Plan** (driver, over manifest metadata only): group live files by
   partition, pick files below the small-file threshold, first-fit-
   decreasing pack them into bins of ``target_file_size`` input bytes.
2. **Execute**: each bin is an independent mini-job — read exactly its
   files, ``coalesce(1)`` (no shuffle: compaction is a concatenation,
   not a re-hash), write one Parquet file into the job directory. Bins
   run concurrently through the shared SparkSession (FAIR scheduler),
   so cluster utilization scales with bin count, not with per-bin
   parallelism — the same knob Iceberg exposes as
   max-concurrent-file-group-rewrites.
3. **Commit** once: REPLACE snapshot removing all inputs of DONE bins
   and adding their outputs. Scans before/after are row-set identical.

Resumability: every bin writes a lineage task record (RUNNING → DONE
with output manifest entries). Restarting with the same ``job_id``
skips DONE bins and redoes interrupted ones; a crash between execute
and commit is recovered by re-running the job (all bins DONE → commit
straight away). Partial outputs are never referenced → GC sweeps them.
"""

from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field
from typing import Any, Callable, Optional

from ..lineage import DONE, LineageLog
from ..meta.manifests import DataFileEntry
from ..ops.append import harvest_stats

DEFAULT_TARGET_FILE_SIZE = 128 * 1024 * 1024


@dataclass
class CompactionResult:
    job_id: str
    snapshot_id: Optional[int]
    bins: int
    files_rewritten: int
    files_created: int
    bytes_rewritten: int
    records_rewritten: int
    skipped_partitions: int = 0
    details: dict[str, Any] = field(default_factory=dict)


def plan_bins(
    files: list[DataFileEntry],
    *,
    target_file_size: int,
    small_file_threshold: int,
    min_input_files: int,
) -> list[list[DataFileEntry]]:
    """FFD bin-packing per partition. Only bins that actually reduce the
    file count (≥2 inputs) are returned."""
    by_partition: dict[str, list[DataFileEntry]] = {}
    for e in files:
        key = str(sorted(e.partition.items()))
        by_partition.setdefault(key, []).append(e)

    bins: list[list[DataFileEntry]] = []
    for group in by_partition.values():
        small = [e for e in group if e.file_size_bytes < small_file_threshold]
        if len(small) < min_input_files:
            continue
        open_bins: list[tuple[int, list[DataFileEntry]]] = []
        for e in sorted(small, key=lambda x: -x.file_size_bytes):
            placed = False
            for i, (size, members) in enumerate(open_bins):
                if size + e.file_size_bytes <= target_file_size:
                    open_bins[i] = (size + e.file_size_bytes, members + [e])
                    placed = True
                    break
            if not placed:
                open_bins.append((e.file_size_bytes, [e]))
        bins.extend(members for _size, members in open_bins if len(members) >= 2)
    return bins


def compact(
    table,
    *,
    target_file_size: int = DEFAULT_TARGET_FILE_SIZE,
    small_file_threshold: Optional[int] = None,
    min_input_files: int = 2,
    partition_filter=None,
    max_concurrency: int = 8,
    job_id: Optional[str] = None,
    fault_injector: Optional[Callable[[str], None]] = None,
) -> CompactionResult:
    """Rewrite small files into ~``target_file_size`` files per partition.

    ``fault_injector(bin_key)`` is a test hook called after a bin's data
    is written but before its DONE record — raising there simulates a
    mid-job crash for the resumability gate (SURVEY.md §5.6).
    """
    spark = table.spark
    threshold = small_file_threshold or int(target_file_size * 0.75)
    log = LineageLog(table.root, job_id)
    log.start_job(
        "compact",
        {
            "target_file_size": target_file_size,
            "small_file_threshold": threshold,
            "partition_filter": str(partition_filter) if partition_filter else None,
        },
    )

    live = table.plan(filter=partition_filter).files
    bins = plan_bins(
        live,
        target_file_size=target_file_size,
        small_file_threshold=threshold,
        min_input_files=min_input_files,
    )
    if not bins:
        log.finish_job({"bins": 0})
        return CompactionResult(log.job_id, None, 0, 0, 0, 0, 0)

    job_data_rel = f"data/{log.job_id}"
    existing = log.done_tasks()

    def bin_key(members: list[DataFileEntry]) -> str:
        import hashlib

        h = hashlib.sha1(
            "|".join(sorted(e.file_path for e in members)).encode()
        ).hexdigest()[:16]
        return f"bin-{h}"

    def run_bin(members: list[DataFileEntry]) -> tuple[str, list[DataFileEntry]]:
        key = bin_key(members)
        if key in existing:  # resume: reuse prior output
            return key, existing[key].out_entries()
        files_in = [e.file_path for e in members]
        bytes_in = sum(e.file_size_bytes for e in members)
        log.start_task(key, files_in, bytes_in)
        paths = [os.path.join(table.root, p) for p in files_in]
        out_rel_dir = f"{job_data_rel}/{key}"
        (
            spark.read.schema(table.schema)
            .parquet(*paths)
            .coalesce(1)  # concatenation, not a shuffle
            .write.mode("overwrite")  # rerun of an interrupted bin
            .parquet(os.path.join(table.root, out_rel_dir))
        )
        out_files = []
        base = os.path.join(table.root, out_rel_dir)
        for name in sorted(os.listdir(base)):
            if name.endswith(".parquet"):
                out_files.append((f"{out_rel_dir}/{name}", members[0].partition))
        entries = harvest_stats(spark, table.root, out_files)
        if fault_injector is not None:
            fault_injector(key)
        log.finish_task(key, entries, files_in=files_in, bytes_in=bytes_in)
        return key, entries

    added: list[DataFileEntry] = []
    removed: list[str] = []
    with ThreadPoolExecutor(max_workers=max_concurrency) as pool:
        for members, (_key, entries) in zip(bins, pool.map(run_bin, bins)):
            added.extend(entries)
            removed.extend(e.file_path for e in members)

    bytes_rewritten = sum(e.file_size_bytes for e in added)
    records = sum(e.record_count for e in added)
    snap = table._commit_files(
        "replace",
        added,
        removed,
        summary={
            "job_id": log.job_id,
            "bins": len(bins),
            "bytes_rewritten": bytes_rewritten,
        },
    )
    log.finish_job(
        {
            "bins": len(bins),
            "files_rewritten": len(removed),
            "files_created": len(added),
            "bytes_rewritten": bytes_rewritten,
            "snapshot_id": snap.snapshot_id,
        }
    )
    return CompactionResult(
        job_id=log.job_id,
        snapshot_id=snap.snapshot_id,
        bins=len(bins),
        files_rewritten=len(removed),
        files_created=len(added),
        bytes_rewritten=bytes_rewritten,
        records_rewritten=records,
    )
