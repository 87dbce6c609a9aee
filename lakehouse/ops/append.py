"""Physical Parquet writer + APPEND commit.

Spark-side mirror of the reference's sink (partitioned Delta append,
/root/reference/etl/glue_stream.py:304-354): schema-conform projection →
partition-column derivation → partitioned Parquet write → atomic
metadata commit. Differences from the reference, by design:

- tasks write straight into an immutable per-job directory under
  ``data/`` (no renames; uncommitted job dirs are invisible to readers
  and swept by GC) — the same no-rename commit discipline Iceberg uses
  so the protocol survives object stores;
- per-file stats are harvested from Parquet footers after the write,
  driver-side (threaded, IO-bound) for small file counts and as a Spark
  job above ``DISTRIBUTE_STATS_THRESHOLD`` files;
- file sizing is explicit: callers either keep the incoming partitioning
  (streaming micro-batches — the canonical small-file generator the
  compactor exists for) or request a shuffle to ``target_file_count``.
"""

from __future__ import annotations

import os
import uuid
from typing import Any, Optional, Sequence

from pyspark.sql import DataFrame, SparkSession

from ..meta.manifests import DataFileEntry, collect_file_stats
from ..partitioning import (
    PART_PREFIX,
    decode_dir_value,
    with_partition_columns,
)
from ..schema import conform

DISTRIBUTE_STATS_THRESHOLD = 512


def _parse_partition_dirs(
    rel_path: str, spec: Sequence[dict[str, Any]]
) -> dict[str, Any]:
    """Recover partition values from ``_p_<name>=<value>`` components."""
    by_name = {PART_PREFIX + f["name"]: f for f in spec}
    out: dict[str, Any] = {}
    for comp in rel_path.split(os.sep):
        if "=" not in comp:
            continue
        key, _, raw = comp.partition("=")
        field = by_name.get(key)
        if field is not None:
            out[field["name"]] = decode_dir_value(raw, field)
    return out


def list_job_files(
    table_root: str, job_rel_dir: str, spec: Sequence[dict[str, Any]]
) -> list[tuple[str, dict[str, Any]]]:
    """(relative_path, partition_values) for every parquet file the job wrote."""
    base = os.path.join(table_root, job_rel_dir)
    found = []
    for dirpath, _dirnames, filenames in os.walk(base):
        for name in filenames:
            if not name.endswith(".parquet"):
                continue
            abs_path = os.path.join(dirpath, name)
            rel = os.path.relpath(abs_path, table_root)
            found.append((rel, _parse_partition_dirs(rel, spec)))
    return sorted(found)


def harvest_stats(
    spark: SparkSession,
    table_root: str,
    files: Sequence[tuple[str, dict[str, Any]]],
    *,
    stat_columns: Optional[Sequence[str]] = None,
    sort_order: str = "",
) -> list[DataFileEntry]:
    """Footer-only stats harvest; distributed over executors when the file
    count is too large for the driver to chew through serially.

    Tables with the ``bloom_columns`` property additionally get a
    Bloom-filter sidecar per file (lakehouse/bloom.py) built here — the
    single choke point every write/rewrite path (append, compact,
    cluster, MoR materialize, format writer) funnels through, so blooms
    stay consistent across ops without per-op wiring.
    """
    from ..bloom import bloom_columns_property, harvest_file_blooms
    from ..meta.snapshots import load_metadata
    from .agg import agg_stats_columns_property

    stat_cols = list(stat_columns) if stat_columns else None
    props = load_metadata(table_root).properties
    bloom_cols = bloom_columns_property(props)
    sum_cols = agg_stats_columns_property(props)

    if len(files) <= DISTRIBUTE_STATS_THRESHOLD:
        from concurrent.futures import ThreadPoolExecutor

        def one(item):
            rel, part = item
            entry = collect_file_stats(
                os.path.join(table_root, rel),
                rel,
                part,
                stat_columns=stat_cols,
                sum_columns=sum_cols,
                sort_order=sort_order,
            )
            harvest_file_blooms(entry, table_root, bloom_cols)
            return entry

        with ThreadPoolExecutor(max_workers=16) as pool:
            return list(pool.map(one, files))

    # scale path: ship (rel, partition) pairs to executors; each reads only
    # footers of its slice (shared storage — same layout as S3/HDFS deploys)
    sc = spark.sparkContext
    payload = [(rel, part) for rel, part in files]

    def part_stats(items):
        from ..bloom import harvest_file_blooms as hfb
        from ..meta.manifests import collect_file_stats as cfs

        for rel, part in items:
            entry = cfs(
                os.path.join(table_root, rel),
                rel,
                part,
                stat_columns=stat_cols,
                sum_columns=sum_cols,
                sort_order=sort_order,
            )
            hfb(entry, table_root, bloom_cols)
            yield entry.to_row()

    rows = (
        sc.parallelize(payload, max(1, len(payload) // 64))
        .mapPartitions(part_stats)
        .collect()
    )
    return [DataFileEntry.from_row(r) for r in rows]


def write_data_files(
    spark: SparkSession,
    table_root: str,
    schema_json: dict[str, Any],
    spec: Sequence[dict[str, Any]],
    df: DataFrame,
    *,
    target_file_count: Optional[int] = None,
    files_per_partition: Optional[int] = None,
    sort_order: str = "",
    stat_columns: Optional[Sequence[str]] = None,
    job_dir: Optional[str] = None,
) -> list[DataFileEntry]:
    """Write ``df`` as committed-later data files; returns manifest entries.

    ``target_file_count``: shuffle-repartition before the write to bound
    output file count — capped at one file per partition value (rows of a
    value co-locate in one task). ``files_per_partition``: additionally
    SPLIT each partition value into N files via a salt that rides as an
    extra directory level (``__salt=k``) — this is how oversized
    partitions (one hot day ≫ target file size) get bounded files; the
    salt dir is opaque to readers, which always get explicit file lists.
    ``None``/``None`` keeps the incoming partitioning (no shuffle — the
    streaming append path).
    """
    from pyspark.sql import types as T

    schema = T.StructType.fromJson(schema_json)
    out = conform(df, schema)

    # write-time CHECK constraints: every row-writing path funnels
    # through here, so enforcement is one fused map-side predicate that
    # fails the job BEFORE any snapshot commit (lakehouse/constraints.py)
    from ..constraints import constraints_of, enforce
    from ..meta.snapshots import load_metadata
    from ..sortorder import provenance_tag, sort_order_of

    props = load_metadata(table_root).properties
    # generated columns first (compute-or-validate), so CHECK
    # constraints below can reference the computed values
    from ..constraints import apply_generated, generated_of

    gen = generated_of(props)
    if gen:
        out = apply_generated(out, gen)
    checks = constraints_of(props)
    if checks:
        out = enforce(out, checks)

    # table sort order (lakehouse/sortorder.py): applied unless the
    # caller stamped its own layout provenance (cluster's zorder/hilbert
    # tags, MoR delete-file tags)
    order_cols = sort_order_of(props) if not sort_order else []
    order_cols = [c for c in order_cols if c in out.columns]
    if order_cols:
        sort_order = provenance_tag(order_cols)

    out, part_cols = with_partition_columns(out, spec)

    salt_col = None
    if files_per_partition and files_per_partition > 1 and part_cols:
        from pyspark.sql import functions as F

        salt_col = "__salt"
        out = out.withColumn(
            salt_col,
            F.pmod(
                F.xxhash64(F.col(out.columns[0]).cast("string")),
                F.lit(files_per_partition),
            ),
        )

    if target_file_count is not None or salt_col:
        from pyspark.sql import functions as F

        keys = [F.col(c) for c in part_cols]
        if salt_col:
            keys.append(F.col(salt_col))
        n = target_file_count or 1
        if salt_col:
            n = max(n, files_per_partition)
        if order_cols:
            # range-partition on (partition cols, sort cols): files in
            # one partition dir cover DISJOINT sort-key ranges, so
            # min/max stats prune like an index; a hot partition value
            # splits by key range (no salt needed)
            rng = keys + [F.col(c) for c in order_cols]
            out = out.repartitionByRange(n, *rng).sortWithinPartitions(
                *rng
            )
        elif keys:
            out = out.repartition(n, *keys)
        else:
            out = out.repartition(n)
    elif order_cols:
        # no-shuffle path (streaming appends): task-local sort only
        out = out.sortWithinPartitions(
            *(part_cols + order_cols) if part_cols else order_cols
        )

    job_rel = job_dir or f"data/job-{uuid.uuid4().hex}"
    writer = out.write.mode("error").format("parquet")
    if part_cols:
        writer = writer.partitionBy(*(part_cols + ([salt_col] if salt_col else [])))
    writer.save(os.path.join(table_root, job_rel))

    files = list_job_files(table_root, job_rel, spec)
    return harvest_stats(
        spark,
        table_root,
        files,
        stat_columns=stat_columns,
        sort_order=sort_order,
    )
