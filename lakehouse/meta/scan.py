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


def _bloom_refine(table_root, kept, preds, *, names_of=None):
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
    out = []
    for entry in kept:
        # rename/drop safe: sidecars and stats are keyed by the file's
        # WRITE-TIME names — translate each probe's column first
        eprobes = probes
        if names_of is not None:
            eprobes = []
            for c, vals in probes:
                phys = names_of(entry, c)
                if phys is not None:
                    eprobes.append((phys, vals))
        if any(
            (entry.stats.get(c) or {}).get("bloom") for c, _v in eprobes
        ):
            sidecar = read_sidecar(os.path.join(table_root, entry.file_path))
            if not entry_passes_blooms(entry.stats, sidecar, eprobes):
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
    from .. import fieldids

    preds = normalize_filter(filter)
    if snapshot_id is None and meta.current_snapshot_id is None:
        return ScanPlan([], to_sql(preds), snapshot_id=0)  # empty table
    snap = meta.snapshot(snapshot_id)
    manifests = read_manifest_list(table_root, snap.manifest_list)
    # rename/drop safe: translate predicate names to each entry's
    # write-time physical names before any stats lookup
    names_of = fieldids.name_lookup(meta.schemas, meta.current_schema_id)
    stats_of = fieldids.stats_lookup(meta.schemas, meta.current_schema_id)

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
                    matches_stats(p, stats_of(entry, p.col)) for p in preds
                ):
                    continue
            kept.append(entry)

    kept = _bloom_refine(table_root, kept, preds, names_of=names_of)

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


def _mapped_read_parts(
    meta: TableMetadata, logical: T.StructType, gid: int
) -> tuple[T.StructType, list]:
    """(physical read schema, select exprs) materializing ``logical``
    from files written under schema ``gid``: field ids resolve each
    logical column to its write-time PHYSICAL name (rename survives),
    ids absent from the write schema are filled with the field's
    ``initial-default`` (null when none — late adds and
    drop-then-re-add), and names outside the table schema entirely
    (``__zkey`` etc.) pass through physically."""
    from pyspark.sql import functions as F

    from .. import fieldids
    from ..schema import field_default

    schemas = meta.schemas
    all_ids = fieldids.schema_field_ids(schemas)
    cur_ids = all_ids[meta.current_schema_id]
    if gid == fieldids.LEGACY_SCHEMA_ID:
        gid = fieldids.resolve_legacy_gid(schemas)
    name_by_id = {v: k for k, v in all_ids[gid].items()}
    read_fields, sel = [], []
    for f in logical.fields:
        phys = (
            name_by_id.get(cur_ids[f.name])
            if f.name in cur_ids
            else f.name
        )
        if phys is None:
            sel.append(
                F.lit(field_default(f)).cast(f.dataType).alias(f.name)
            )
        else:
            read_fields.append(T.StructField(phys, f.dataType, True))
            sel.append(F.col(phys).alias(f.name))
    return T.StructType(read_fields), sel


def seq_schema_groups(
    table_root: str, meta: TableMetadata, entries: Sequence[DataFileEntry]
) -> dict:
    """Group entries for `_union_seq_groups`: plain seq keys on tables
    that never renamed/dropped (zero behavior change), (seq, write
    schema id) keys once field-id mapping is in play."""
    from .. import fieldids

    mapped = fieldids.has_mapped_schemas(meta.schemas)
    by: dict = {}
    for e in entries:
        if mapped:
            gid = (
                e.schema_id
                if e.schema_id is not None
                else meta.current_schema_id
            )
            key = (e.seq, gid)
        else:
            key = e.seq
        by.setdefault(key, []).append(
            os.path.join(table_root, e.file_path)
        )
    return by


def entry_fills(stats) -> dict[str, Any]:
    """Adopted-file column fills: ``{col: const}`` for stats entries
    flagged ``fill`` (ops/adopt.py — the column is physically ABSENT
    from the file's data pages, its value proven constant by the source
    layout; min==max carries the constant, so stats pruning works at
    full power)."""
    return {
        c: st.get("min")
        for c, st in (stats or {}).items()
        if isinstance(st, dict) and st.get("fill")
    }


def fills_of_entries(
    entries: Sequence[DataFileEntry],
) -> dict[str, dict[str, Any]]:
    """rel_path → {col: const} over fill-flagged entries only."""
    out: dict[str, dict[str, Any]] = {}
    for e in entries:
        m = entry_fills(e.stats)
        if m:
            out[e.file_path] = m
    return out


_FILL_PATH = "__fillp"


def _fill_path_expr(table_root: str):
    """Root-relative file path of each row, computed by the parquet
    reader itself (``_metadata.file_path`` = "file:" + absolute path —
    same normalization as the positional-delete ``__path``)."""
    from pyspark.sql import functions as F

    plen = len("file:" + os.path.abspath(table_root) + "/")
    return F.expr(f"substring(_metadata.file_path, {plen + 1})").alias(
        _FILL_PATH
    )


def _apply_entry_fills(
    spark: SparkSession,
    schema: T.StructType,
    df: DataFrame,
    fills: dict[str, dict[str, Any]],
) -> DataFrame:
    """Inject per-file constants for adopted files that are not
    self-contained (hive layouts drop the partition column from data
    pages). ONE broadcast left-join keyed on the reader-computed
    ``__fillp`` path — bounded by the count of fill-flagged FILES, not
    rows; rows from self-contained files coalesce to their stored
    values. The first rewrite touching such a file (compaction,
    clustering, MERGE) reads through here and writes self-contained
    output, so fills age out under normal maintenance."""
    from pyspark.sql import functions as F

    cols = sorted({c for m in fills.values() for c in m})
    rows = [
        tuple(
            [p]
            + [None if m.get(c) is None else str(m[c]) for c in cols]
        )
        for p, m in sorted(fills.items())
    ]
    fschema = T.StructType(
        [T.StructField(_FILL_PATH, T.StringType())]
        + [T.StructField(f"__fill_{c}", T.StringType()) for c in cols]
    )
    fdf = spark.createDataFrame(rows, fschema)
    by_name = {f.name: f.dataType for f in schema.fields}
    df = df.join(F.broadcast(fdf), _FILL_PATH, "left")
    for c in cols:
        df = df.withColumn(
            c,
            F.coalesce(
                F.col(c), F.col(f"__fill_{c}").cast(by_name[c])
            ),
        )
    return df.drop(_FILL_PATH, *[f"__fill_{c}" for c in cols])


def read_entries(
    spark: SparkSession,
    meta: TableMetadata,
    table_root: str,
    entries: Sequence[DataFileEntry],
    logical_schema: Optional[T.StructType] = None,
) -> DataFrame:
    """Plain (no seq/pos columns) mapped-aware read of a set of data
    file entries — the one helper every rewrite op should use instead
    of ``spark.read.schema(table.schema).parquet(*paths)``: identical
    plan on tables that never renamed/dropped a column, per-write-
    schema grouped reads (physical names resolved by field id) once
    they have. Adopted-file fills (``entry_fills``) are applied here,
    so every rewrite op regains self-contained output for free."""
    schema = logical_schema or T.StructType.fromJson(meta.schema_json)
    if not entries:
        return spark.createDataFrame([], schema)
    fills = fills_of_entries(entries)
    groups = seq_schema_groups(table_root, meta, entries)
    if all(isinstance(k, int) for k in groups):
        paths = [os.path.join(table_root, e.file_path) for e in entries]
        df = spark.read.schema(schema).parquet(*paths)
        if fills:
            df = _apply_entry_fills(
                spark, schema,
                df.select("*", _fill_path_expr(table_root)), fills,
            )
        return df
    flat: dict = {}
    for (_seq, gid), paths in groups.items():
        flat.setdefault((0, gid), []).extend(paths)
    return _union_seq_groups(
        spark, schema, flat, meta=meta,
        fills=fills or None, fill_root=table_root,
    ).drop("__seq")


def _union_seq_groups(
    spark: SparkSession,
    schema: T.StructType,
    by_seq: dict,
    *,
    rel_prefix: Optional[str] = None,
    meta: Optional[TableMetadata] = None,
    fills: Optional[dict] = None,
    fill_root: Optional[str] = None,
) -> Optional[DataFrame]:
    """Union of per-commit-seq parquet reads, each group carrying its
    seq as a literal ``__seq`` column (no per-row path join; distinct
    seqs are bounded by commit count). Single implementation behind
    every merge-on-read reader.

    With ``rel_prefix`` (the table root), each row additionally carries
    ``__path`` (file path relative to the root, via the Parquet
    ``_metadata.file_path`` column — computed by the reader, no join)
    and ``__pos`` (``_metadata.row_index``), the join keys positional
    deletes need.

    Keys are either plain seq ints, or ``(seq, write_schema_id)``
    tuples from :func:`seq_schema_groups` on field-id-mapped tables —
    then ``meta`` must be given and each group is read under its
    write-time physical names, aliased back to the current ones."""
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
    fill_cols = []
    if fills:
        fill_cols = [_fill_path_expr(fill_root)]
    df = None
    for key in sorted(by_seq):
        if isinstance(key, tuple):
            seq, gid = key
            read_schema, sel = _mapped_read_parts(meta, schema, gid)
        else:
            seq, read_schema, sel = key, schema, [F.col("*")]
        part = (
            spark.read.schema(read_schema)
            .parquet(*by_seq[key])
            .select(*sel, F.lit(seq).alias("__seq"), *pos_cols, *fill_cols)
        )
        df = part if df is None else df.unionByName(part)
    if df is not None and fills:
        df = _apply_entry_fills(spark, schema, df, fills)
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
    *,
    meta: Optional[TableMetadata] = None,
) -> DataFrame:
    """Merge-on-read: seq-grouped reads + the shared sequence-rule
    anti-joins (equality deletes by key, positional deletes by
    (file_path, row_pos)). The per-row path/pos columns are only read
    when positional deletes are actually pending — the equality-only
    path is byte-identical to round 2."""
    eq, pos = _split_delete_kinds(delete_files)
    fills = fills_of_entries(data_files)
    if meta is not None:
        by_seq = seq_schema_groups(table_root, meta, data_files)
    else:
        by_seq = {}
        for e in data_files:
            by_seq.setdefault(e.seq, []).append(
                os.path.join(table_root, e.file_path)
            )
    df = _union_seq_groups(
        spark,
        schema,
        by_seq,
        rel_prefix=table_root if pos else None,
        meta=meta,
        fills=fills or None,
        fill_root=table_root,
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
            spark, table_root, schema, plan.files, plan.delete_files,
            meta=meta,
        )
    else:
        fills = fills_of_entries(plan.files)
        groups = seq_schema_groups(table_root, meta, plan.files)
        if all(isinstance(k, int) for k in groups):
            # un-mapped table: single multi-path read, same as ever
            paths = [
                os.path.join(table_root, e.file_path) for e in plan.files
            ]
            df = spark.read.schema(schema).parquet(*paths)
            if fills:
                df = _apply_entry_fills(
                    spark, schema,
                    df.select("*", _fill_path_expr(table_root)), fills,
                )
        else:
            flat = {}  # drop the seq dimension — only schema groups matter
            for (_seq, gid), paths in groups.items():
                flat.setdefault((0, gid), []).extend(paths)
            df = _union_seq_groups(
                spark, schema, flat, meta=meta,
                fills=fills or None, fill_root=table_root,
            ).drop("__seq")
    if plan.residual_sql:
        df = df.filter(plan.residual_sql)
    if columns:
        df = df.select(*columns)
    return df


def prune_entries_df(
    mdf: DataFrame,
    preds: Sequence[Predicate],
    table_root: Optional[str] = None,
    meta: Optional[TableMetadata] = None,
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

    from .. import fieldids

    pred_payload = [(p.col, p.op, p.value) for p in preds]
    # field-id mapping: ship a tiny gid→(current col→physical name)
    # dict into the closure so every executor-side stats/bloom lookup
    # uses the entry's write-time names (rename/drop sound, identical
    # to the driver path). None = unmapped table, plain name lookups.
    phys_by_gid: Optional[dict[int, dict[str, Optional[str]]]] = None
    cur_gid = -1
    if meta is not None and fieldids.has_mapped_schemas(meta.schemas):
        cols = [p.col for p in preds]
        all_ids = fieldids.schema_field_ids(meta.schemas)
        cur_ids = all_ids[meta.current_schema_id]
        cur_gid = meta.current_schema_id
        legacy_gid = fieldids.resolve_legacy_gid(meta.schemas)
        phys_by_gid = {}
        for gid, ids in enumerate(all_ids):
            inv = {v: k for k, v in ids.items()}
            phys_by_gid[gid] = {
                c: inv.get(cur_ids[c]) if c in cur_ids else None
                for c in cols
            }
        phys_by_gid[fieldids.LEGACY_SCHEMA_ID] = phys_by_gid[legacy_gid]
    has_gid_col = "schema_id" in mdf.columns

    def keep_batch(batches):
        from ..bloom import entry_passes_blooms, eq_probes, read_sidecar
        from ..expressions import Predicate as P
        from ..expressions import matches_partition as mp
        from ..expressions import matches_stats as ms

        local_preds = [P(c, o, v) for c, o, v in pred_payload]
        probes = eq_probes(local_preds) if table_root else []
        for pdf in batches:
            if phys_by_gid is not None and has_gid_col:
                gids = [
                    int(g) if g is not None and not pd.isna(g) else -1
                    for g in pdf["schema_id"]
                ]
            else:
                gids = [cur_gid] * len(pdf)
            mask = []
            for part_j, stats_j, rel, gid in zip(
                pdf["partition_json"],
                pdf["stats_json"],
                pdf["file_path"],
                gids,
            ):
                part = json.loads(part_j or "{}")
                stats = json.loads(stats_j or "{}")
                if phys_by_gid is None:
                    name_of = {p.col: p.col for p in local_preds}
                else:
                    name_of = phys_by_gid.get(
                        gid, phys_by_gid[cur_gid]
                    )
                ok = all(mp(p, part) for p in local_preds) and all(
                    ms(
                        p,
                        (
                            stats.get(name_of[p.col])
                            if name_of[p.col] is not None
                            else None
                        ),
                    )
                    for p in local_preds
                )
                eprobes = [
                    (name_of[c], v)
                    for c, v in probes
                    if name_of[c] is not None
                ]
                if ok and eprobes and any(
                    (stats.get(c) or {}).get("bloom") for c, _v in eprobes
                ):
                    sidecar = read_sidecar(os.path.join(table_root, rel))
                    ok = entry_passes_blooms(stats, sidecar, eprobes)
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
        """Yield lists of ≤``chunk_size`` (absolute path, seq, gid,
        rel path, fills) tuples; driver memory is bounded by one chunk
        (toLocalIterator streams partitions). ``fills`` is the adopted
        non-self-contained column map (``entry_fills``) or None —
        parsed only when the stats JSON carries the flag, so the common
        path pays one substring probe per row."""
        cols = ["file_path"] + (
            ["seq"] if "seq" in self.files_df.columns else []
        )
        has_gid = "schema_id" in self.files_df.columns
        if has_gid:
            cols.append("schema_id")
        has_stats = "stats_json" in self.files_df.columns
        if has_stats:
            cols.append("stats_json")
        chunk: list[tuple[str, int, int, str, Optional[dict]]] = []
        for row in (
            self.files_df.select(*cols).toLocalIterator(
                prefetchPartitions=True
            )
        ):
            seq = row.seq if "seq" in cols and row.seq is not None else 0
            gid = (
                row.schema_id
                if has_gid and row.schema_id is not None
                else -1
            )
            fills = None
            if has_stats and row.stats_json and '"fill"' in row.stats_json:
                fills = entry_fills(json.loads(row.stats_json)) or None
            chunk.append(
                (
                    os.path.join(table_root, row.file_path),
                    seq,
                    gid,
                    row.file_path,
                    fills,
                )
            )
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
        files_df=prune_entries_df(mdf, preds, table_root, meta=meta),
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

    from .. import fieldids

    schema = T.StructType.fromJson(meta.schema_json)
    mapped = fieldids.has_mapped_schemas(meta.schemas)
    mor = bool(plan.delete_files)
    eq, pos = _split_delete_kinds(plan.delete_files)
    df = None
    for chunk in plan.iter_path_chunks(table_root, chunk_size):
        fills = {
            rel: fl for _p, _s, _g, rel, fl in chunk if fl
        }
        if mor or mapped:
            by_seq: dict = {}
            for p, seq, gid, _rel, _fl in chunk:
                key = (seq, gid) if mapped else seq
                by_seq.setdefault(key, []).append(p)
            part = _union_seq_groups(
                spark, schema, by_seq,
                rel_prefix=table_root if pos else None,
                meta=meta,
                fills=fills or None,
                fill_root=table_root,
            )
            if not mor:
                part = part.drop("__seq")
        else:
            part = spark.read.schema(schema).parquet(
                *[p for p, _s, _g, _r, _f in chunk]
            )
            if fills:
                part = _apply_entry_fills(
                    spark, schema,
                    part.select("*", _fill_path_expr(table_root)), fills,
                )
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
    kept_rows = prune_entries_df(
        mdf, preds, table_root, meta=meta
    ).collect()
    return ScanPlan(
        files=[DataFileEntry.from_row(r.asDict()) for r in kept_rows],
        residual_sql=to_sql(preds),
        snapshot_id=snap.snapshot_id,
        candidate_files=total,
        delete_files=deletes,
    )
