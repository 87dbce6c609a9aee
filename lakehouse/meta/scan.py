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
millions of files), ``plan_scan_lazy`` + ``read_lazy_plan`` run the same
pruning as a Spark job over the manifest Parquet files themselves and
keep the kept-file set as a DataFrame end-to-end; the driver only ever
holds bounded chunks of bare paths. ``plan_scan_distributed`` is the
driver-materialized variant for metadata APIs that need entry objects.
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
    # delete files (merge-on-read; equality or positional): applied at
    # read time to data files with strictly smaller seq; never pruned
    delete_files: list[DataFileEntry] = field(default_factory=list)

    @property
    def skipped_files(self) -> int:
        return self.candidate_files - len(self.files)


def _bloom_refine(table_root, kept, preds):
    """Point-lookup refinement: after partition + min/max pruning, test
    ``=``/``in`` predicates against per-file Bloom sidecars (opt-in via
    the ``bloom_columns`` table property). Driver IO is bounded: only
    runs while the surviving set is ≤ BLOOM_PROBE_CAP files — a point
    lookup post-pruning has few candidates, a broad scan skips this
    step entirely. A bloom "no" is definite; results never change.
    """
    from ..bloom import (
        BLOOM_PROBE_CAP,
        entry_passes_blooms,
        eq_probes,
        read_sidecar,
    )

    probes = eq_probes(preds) if preds else []
    if not probes or not kept or len(kept) > BLOOM_PROBE_CAP:
        return kept
    probe_cols = {c for c, _v in probes}
    out = []
    for entry in kept:
        if any((entry.stats.get(c) or {}).get("bloom") for c in probe_cols):
            sidecar = read_sidecar(os.path.join(table_root, entry.file_path))
            if not entry_passes_blooms(entry.stats, sidecar, probes):
                continue
        out.append(entry)
    return out


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
    deletes: list[DataFileEntry] = []
    candidates = 0
    pruned_manifests = 0
    for m in manifests:
        summary = m.get("summary", {})
        has_deletes = summary.get("delete_count", 0) > 0
        if preds and not has_deletes and not _manifest_may_match(summary, preds):
            pruned_manifests += 1
            # entry_count here is data-only by construction: the guard
            # above never summary-prunes a manifest holding deletes
            candidates += summary.get("entry_count", 0)
            continue
        for entry in read_manifest(table_root, m["path"]):
            if entry.is_delete:
                deletes.append(entry)  # never pruned: reads must see them
                continue
            candidates += 1
            if preds:
                if not all(matches_partition(p, entry.partition) for p in preds):
                    continue
                if not all(
                    matches_stats(p, entry.stats.get(p.col)) for p in preds
                ):
                    continue
            kept.append(entry)

    kept = _bloom_refine(table_root, kept, preds)

    return ScanPlan(
        files=kept,
        residual_sql=to_sql(preds),
        snapshot_id=snap.snapshot_id,
        candidate_files=candidates,
        pruned_manifests=pruned_manifests,
        delete_files=deletes,
    )


def _split_delete_kinds(
    delete_files: Sequence[DataFileEntry],
) -> tuple[list[DataFileEntry], list[DataFileEntry]]:
    """(equality deletes, positional deletes)."""
    eq = [d for d in delete_files if not d.is_pos_delete]
    pos = [d for d in delete_files if d.is_pos_delete]
    return eq, pos


def _anti_join_eq_deletes(
    spark: SparkSession,
    table_root: str,
    df: DataFrame,
    delete_files: Sequence[DataFileEntry],
) -> DataFrame:
    """Apply Iceberg's sequence rule to a DataFrame that carries a
    ``__seq`` column: left-anti join the broadcast union of equality
    delete keys where ``delete.seq > data.seq`` (a delete applies only
    to files committed strictly before it), one join per delete-key
    column. The single implementation shared by the driver scan, the
    lazy/distributed scan, and CDC — the seq rule lives in exactly one
    place. Positional entries in ``delete_files`` are ignored (apply
    them with :func:`_anti_join_pos_deletes`); ``__seq`` is preserved
    so both kinds can chain."""
    from pyspark.sql import functions as F

    by_key: dict[str, list[DataFileEntry]] = {}
    for d in delete_files:
        if d.delete_key:
            by_key.setdefault(d.delete_key, []).append(d)
    for key, dels in sorted(by_key.items()):
        ddf = None
        for d in dels:
            one = spark.read.parquet(
                os.path.join(table_root, d.file_path)
            ).select(F.col(key).alias("__dk"), F.lit(d.seq).alias("__dseq"))
            ddf = one if ddf is None else ddf.unionByName(one)
        df = df.join(
            F.broadcast(ddf),
            (df[key] == ddf["__dk"]) & (ddf["__dseq"] > df["__seq"]),
            "left_anti",
        )
    return df


def _anti_join_pos_deletes(
    spark: SparkSession,
    table_root: str,
    df: DataFrame,
    pos_deletes: Sequence[DataFileEntry],
) -> DataFrame:
    """Apply positional deletes to a DataFrame carrying ``__seq``,
    ``__path`` (table-relative file path) and ``__pos`` (row index
    within the file) columns: one broadcast left-anti join against the
    union of (file_path, row_pos) delete rows, same strict sequence
    rule as equality deletes. The delete set is tiny relative to data
    (trickle deletes), so broadcast is the right shape at any scale —
    the wide side never shuffles. ``__seq`` is preserved for chaining.
    """
    from pyspark.sql import functions as F

    ddf = None
    for d in pos_deletes:
        one = spark.read.parquet(
            os.path.join(table_root, d.file_path)
        ).select(
            F.col("file_path").alias("__dp"),
            F.col("row_pos").alias("__dpos"),
            F.lit(d.seq).alias("__dseq"),
        )
        ddf = one if ddf is None else ddf.unionByName(one)
    if ddf is None:
        return df
    return df.join(
        F.broadcast(ddf),
        (df["__path"] == ddf["__dp"])
        & (df["__pos"] == ddf["__dpos"])
        & (ddf["__dseq"] > df["__seq"]),
        "left_anti",
    )


# helper columns carried by merge-on-read reads (dropped before the
# caller sees the DataFrame)
_MOR_COLS = ("__seq", "__path", "__pos")


def _union_seq_groups(
    spark: SparkSession,
    schema: T.StructType,
    by_seq: dict[int, list[str]],
    *,
    rel_prefix: Optional[str] = None,
) -> Optional[DataFrame]:
    """Union of per-commit-seq parquet reads, each group carrying its
    seq as a literal ``__seq`` column (no per-row path join; distinct
    seqs are bounded by commit count). Single implementation behind
    every merge-on-read reader.

    With ``rel_prefix`` (the table root), each row additionally carries
    ``__path`` (file path relative to the root, via the Parquet
    ``_metadata.file_path`` column — computed by the reader, no join)
    and ``__pos`` (``_metadata.row_index``), the join keys positional
    deletes need."""
    from pyspark.sql import functions as F

    pos_cols = []
    if rel_prefix is not None:
        # the reader reports "file:" + absolute path; manifests store
        # root-relative paths — strip the constant-length prefix
        plen = len("file:" + os.path.abspath(rel_prefix) + "/")
        pos_cols = [
            F.expr(
                f"substring(_metadata.file_path, {plen + 1})"
            ).alias("__path"),
            F.col("_metadata.row_index").alias("__pos"),
        ]
    df = None
    for seq in sorted(by_seq):
        part = (
            spark.read.schema(schema)
            .parquet(*by_seq[seq])
            .select("*", F.lit(seq).alias("__seq"), *pos_cols)
        )
        df = part if df is None else df.unionByName(part)
    return df


def _split_deletes(mdf: DataFrame) -> tuple[DataFrame, list[DataFileEntry]]:
    """Split a manifest-entry DataFrame into (data rows, collected
    equality-delete entries). Delete entries are a bounded small set, so
    collecting them driver-side is safe even on the lazy path."""
    from pyspark.sql import functions as F

    if "content" not in mdf.columns:
        return mdf, []
    deletes = [
        DataFileEntry.from_row(r.asDict())
        for r in mdf.filter(F.col("content") == "deletes").collect()
    ]
    return (
        mdf.filter(F.coalesce(F.col("content"), F.lit("data")) != "deletes"),
        deletes,
    )


def _apply_mor_deletes(
    spark: SparkSession,
    table_root: str,
    schema: T.StructType,
    data_files: Sequence[DataFileEntry],
    delete_files: Sequence[DataFileEntry],
) -> DataFrame:
    """Merge-on-read: seq-grouped reads + the shared sequence-rule
    anti-joins (equality deletes by key, positional deletes by
    (file_path, row_pos)). The per-row path/pos columns are only read
    when positional deletes are actually pending — the equality-only
    path is byte-identical to round 2."""
    eq, pos = _split_delete_kinds(delete_files)
    by_seq: dict[int, list[str]] = {}
    for e in data_files:
        by_seq.setdefault(e.seq, []).append(
            os.path.join(table_root, e.file_path)
        )
    df = _union_seq_groups(
        spark, schema, by_seq, rel_prefix=table_root if pos else None
    )
    if pos:
        df = _anti_join_pos_deletes(spark, table_root, df, pos)
    if eq:
        df = _anti_join_eq_deletes(spark, table_root, df, eq)
    return df.drop(*_MOR_COLS)


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
    Pending merge-on-read deletes (equality and positional) are applied
    as broadcast anti-joins before projection.
    """
    schema = T.StructType.fromJson(meta.schema_json)
    if not plan.files:
        df = spark.createDataFrame([], schema)
    elif plan.delete_files:
        df = _apply_mor_deletes(
            spark, table_root, schema, plan.files, plan.delete_files
        )
    else:
        paths = [os.path.join(table_root, e.file_path) for e in plan.files]
        df = spark.read.schema(schema).parquet(*paths)
    if plan.residual_sql:
        df = df.filter(plan.residual_sql)
    if columns:
        df = df.select(*columns)
    return df


def prune_entries_df(
    mdf: DataFrame,
    preds: Sequence[Predicate],
    table_root: Optional[str] = None,
) -> DataFrame:
    """Partition + stats pruning over a manifest-entry DataFrame, as a
    DataFrame transformation — the output never touches the driver here.

    Pruning runs inside an Arrow-batched ``mapInPandas`` (no per-row
    Python at the JVM boundary); this is the reusable core of both the
    distributed planner and the lazy scan path, and the unit under the
    1M-virtual-file gate in tests/test_planner_scale.py. When
    ``table_root`` is given, ``=``/``in`` predicates are additionally
    tested against per-file Bloom sidecars executor-side (shared
    storage) — no driver cap needed on this path, and sidecar IO only
    happens for entries whose stats carry the ``bloom`` marker.
    """
    if not preds:
        return mdf
    import pandas as pd

    pred_payload = [(p.col, p.op, p.value) for p in preds]

    def keep_batch(batches):
        from ..bloom import entry_passes_blooms, eq_probes, read_sidecar
        from ..expressions import Predicate as P
        from ..expressions import matches_partition as mp
        from ..expressions import matches_stats as ms

        local_preds = [P(c, o, v) for c, o, v in pred_payload]
        probes = eq_probes(local_preds) if table_root else []
        probe_cols = {c for c, _v in probes}
        for pdf in batches:
            mask = []
            for part_j, stats_j, rel in zip(
                pdf["partition_json"], pdf["stats_json"], pdf["file_path"]
            ):
                part = json.loads(part_j or "{}")
                stats = json.loads(stats_j or "{}")
                ok = all(mp(p, part) for p in local_preds) and all(
                    ms(p, stats.get(p.col)) for p in local_preds
                )
                if ok and probes and any(
                    (stats.get(c) or {}).get("bloom") for c in probe_cols
                ):
                    sidecar = read_sidecar(os.path.join(table_root, rel))
                    ok = entry_passes_blooms(stats, sidecar, probes)
                mask.append(ok)
            yield pdf[pd.Series(mask, index=pdf.index)]

    return mdf.mapInPandas(keep_batch, mdf.schema)


@dataclass
class LazyScanPlan:
    """A scan plan whose kept-file set stays a DataFrame end-to-end.

    The driver-side ``ScanPlan`` materializes one ``DataFileEntry`` per
    surviving file — correct for metadata APIs, but a memory and
    argument-list ceiling when a low-selectivity filter over millions of
    files survives pruning (VERDICT.md §wrong 2). Here only bounded
    chunks of bare file paths ever reach the driver, via
    ``toLocalIterator`` in ``iter_path_chunks``.
    """

    files_df: DataFrame  # full manifest-entry schema, pruned, data only
    residual_sql: Optional[str]
    snapshot_id: int
    candidate_files: int
    # equality delete entries are collected driver-side (bounded small
    # set) even on the lazy path; applied per chunk in read_lazy_plan
    delete_files: list[DataFileEntry] = field(default_factory=list)

    def iter_path_chunks(self, table_root: str, chunk_size: int = 100_000):
        """Yield lists of ≤``chunk_size`` (absolute path, seq) pairs;
        driver memory is bounded by one chunk (toLocalIterator streams
        partitions)."""
        cols = ["file_path"] + (
            ["seq"] if "seq" in self.files_df.columns else []
        )
        chunk: list[tuple[str, int]] = []
        for row in (
            self.files_df.select(*cols).toLocalIterator(
                prefetchPartitions=True
            )
        ):
            seq = row.seq if "seq" in cols and row.seq is not None else 0
            chunk.append((os.path.join(table_root, row.file_path), seq))
            if len(chunk) >= chunk_size:
                yield chunk
                chunk = []
        if chunk:
            yield chunk


def plan_scan_lazy(
    spark: SparkSession,
    table_root: str,
    meta: TableMetadata,
    *,
    filter=None,  # noqa: A002
    snapshot_id: Optional[int] = None,
) -> LazyScanPlan:
    """Distributed pruning with a DataFrame-valued result set — the
    scale path when a snapshot tracks more files than the driver should
    hold (millions of entries)."""
    preds = normalize_filter(filter)
    if snapshot_id is None and meta.current_snapshot_id is None:
        empty = spark.createDataFrame(
            [], "file_path string, partition_json string, stats_json string"
        )
        return LazyScanPlan(empty, to_sql(preds), 0, 0)
    snap = meta.snapshot(snapshot_id)
    manifests = read_manifest_list(table_root, snap.manifest_list)
    paths = [os.path.join(table_root, m["path"]) for m in manifests]
    candidates = sum(
        m.get("summary", {}).get("entry_count", 0) for m in manifests
    )
    if not paths:
        empty = spark.createDataFrame(
            [], "file_path string, partition_json string, stats_json string"
        )
        return LazyScanPlan(empty, to_sql(preds), snap.snapshot_id, 0)
    # mergeSchema: pre-round-2 manifests lack the content/seq columns
    mdf, deletes = _split_deletes(
        spark.read.option("mergeSchema", "true").parquet(*paths)
    )
    return LazyScanPlan(
        files_df=prune_entries_df(mdf, preds, table_root),
        residual_sql=to_sql(preds),
        snapshot_id=snap.snapshot_id,
        candidate_files=candidates,
        delete_files=deletes,
    )


def read_lazy_plan(
    spark: SparkSession,
    table_root: str,
    meta: TableMetadata,
    plan: LazyScanPlan,
    *,
    columns: Optional[Sequence[str]] = None,
    chunk_size: int = 100_000,
) -> DataFrame:
    """Materialize a LazyScanPlan without ever building the full path
    list in one Python object: chunked multi-path reads, unioned lazily.
    Pending equality deletes are applied the same way as read_plan —
    chunks are further grouped by seq so no per-row path join is needed.
    """
    from pyspark.sql import functions as F

    schema = T.StructType.fromJson(meta.schema_json)
    mor = bool(plan.delete_files)
    eq, pos = _split_delete_kinds(plan.delete_files)
    df = None
    for chunk in plan.iter_path_chunks(table_root, chunk_size):
        if mor:
            by_seq: dict[int, list[str]] = {}
            for p, seq in chunk:
                by_seq.setdefault(seq, []).append(p)
            part = _union_seq_groups(
                spark, schema, by_seq,
                rel_prefix=table_root if pos else None,
            )
        else:
            part = spark.read.schema(schema).parquet(*[p for p, _s in chunk])
        df = part if df is None else df.unionByName(part)
    if df is None:
        df = spark.createDataFrame([], schema)
    elif mor:
        if pos:
            df = _anti_join_pos_deletes(spark, table_root, df, pos)
        if eq:
            df = _anti_join_eq_deletes(spark, table_root, df, eq)
        df = df.drop(*_MOR_COLS)
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
    """Distributed pruning, driver-materialized result — for metadata
    APIs that need ``DataFileEntry`` objects (``plan()``/``live_files``).
    Output size is bounded by the files that survive pruning; callers
    that only need to READ the data should use ``plan_scan_lazy`` +
    ``read_lazy_plan`` instead, which never materialize the entry list.
    """
    preds = normalize_filter(filter)
    if snapshot_id is None and meta.current_snapshot_id is None:
        return ScanPlan([], to_sql(preds), snapshot_id=0)  # empty table
    snap = meta.snapshot(snapshot_id)
    manifests = read_manifest_list(table_root, snap.manifest_list)
    paths = [os.path.join(table_root, m["path"]) for m in manifests]
    if not paths:
        return ScanPlan([], to_sql(preds), snap.snapshot_id)

    mdf, deletes = _split_deletes(
        spark.read.option("mergeSchema", "true").parquet(*paths)
    )
    total = mdf.count()
    kept_rows = prune_entries_df(mdf, preds, table_root).collect()
    return ScanPlan(
        files=[DataFileEntry.from_row(r.asDict()) for r in kept_rows],
        residual_sql=to_sql(preds),
        snapshot_id=snap.snapshot_id,
        candidate_files=total,
        delete_files=deletes,
    )
