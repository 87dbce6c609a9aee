"""Shuffle-based MERGE INTO (copy-on-write), with file-level pruning and
skew-aware execution.

Semantics (Delta/Iceberg MERGE matrix, keyed on a unique ``clip_id``):

- source row matches a target row:   UPDATE (replace payload), or DELETE
  when the source row's ``op`` column says so;
- source row matches nothing:        INSERT (DELETE-ops are ignored);
- target row matches nothing:        carried over unchanged;
- duplicate keys in the source:      MergeError (ambiguous merge — same
  contract as Delta's "multiple source rows matched").

Execution, scale-first:

1. **File pruning.** Only target files whose manifest [min,max] range on
   the merge key intersects the source key set are rewritten. The probe
   is a broadcast range-join of source keys against the (small) file-
   range table — at 10^12-row scale this is what turns MERGE from a
   full-table rewrite into a touched-files rewrite.
2. **The join — two strategies, picked by a measured source-size
   estimate (one narrow pass that also does the duplicate-key check):**

   - *broadcast* (source ≤ threshold): the source is broadcast and the
     wide target side NEVER shuffles — rows stream parquet-scan →
     resolve → write. Inserts come from an anti-join whose target side
     is a column-pruned key scan. This is the everyday 10^12-row MERGE
     shape: a trickle of updates against huge files.
   - *shuffle* (large source): both sides hash-repartitioned on
     ``xxhash64(key, seed)`` — a seeded rehash that breaks
     adversarial/hot lexicographic ranges (the reference's own
     partition-key skew bug,
     /root/reference/etl/handlers/click_handler.py:165, is this failure
     mode) — FULL OUTER join, with AQE skew-join splitting for residual
     imbalance (session.py turns it on).

3. **Commit.** REPLACE touched files + APPEND result files in one
   snapshot (op="merge"); untouched files are never read or moved.
   Output files are sized like appends (~128 MB targets) rather than
   inheriting scan-task fragmentation.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..errors import MergeError
from ..lineage import LineageLog
from ..ops.append import write_data_files
from ..schema import conform

DELETE_OP = "delete"


@dataclass
class MergeResult:
    job_id: str
    snapshot_id: Optional[int]
    files_touched: int
    files_written: int
    rows_written: int


def merge_into(
    table,
    source: DataFrame,
    *,
    key: str = "clip_id",
    op_col: str = "op",
    target_file_count: Optional[int] = None,
    salt_seed: int = 0,
    job_id: Optional[str] = None,
    strategy: str = "auto",
    broadcast_threshold: int = 256 * 1024 * 1024,
) -> MergeResult:
    if strategy not in ("auto", "broadcast", "shuffle"):
        raise MergeError(f"unknown merge strategy: {strategy!r}")
    spark = table.spark
    meta = table.meta
    schema = table.schema
    if key not in [f.name for f in schema.fields]:
        raise MergeError(f"merge key {key!r} not in table schema")

    has_op = op_col in source.columns
    op_expr = (
        F.col(op_col).cast("string") if has_op else F.lit(None).cast("string")
    )
    # schema-conform (cast/null-fill, cf. schema.conform) plus the op
    # column, in a single projection so lineage stays one plan
    present = set(source.columns)
    cols_expr = []
    for f in schema.fields:
        if f.name in present:
            cols_expr.append(F.col(f.name).cast(f.dataType).alias(f.name))
        else:
            cols_expr.append(F.lit(None).cast(f.dataType).alias(f.name))
    src = source.select(*cols_expr, op_expr.alias("__op"))
    # the source plan is reused by the stats pass, the join build, and
    # (broadcast path) the insert anti-join — persist it so an arbitrary
    # user plan (e.g. a filtered table scan) executes once, not 3×
    from pyspark import StorageLevel

    src = src.persist(StorageLevel.MEMORY_AND_DISK)

    # --- one narrow pass: duplicate-key check + source size estimate ---------
    # (row size = byte lengths of string/binary cells + 8/primitive; the
    # estimate picks the join strategy below, so it only needs to be
    # order-of-magnitude right)
    row_sz = F.lit(0)
    for f in schema.fields:
        if isinstance(f.dataType, (T.BinaryType, T.StringType)):
            row_sz = row_sz + F.coalesce(
                F.length(F.col(f.name)), F.lit(0)
            )
        else:
            row_sz = row_sz + F.lit(8)
    stats = (
        src.select(F.col(key).alias("__k"), row_sz.alias("__sz"))
        .groupBy("__k")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("__sz").alias("b"))
        .agg(
            F.max("n").alias("max_n"),
            F.sum("b").alias("src_bytes"),
            F.count(F.lit(1)).alias("src_rows"),
        )
        .collect()[0]
    )
    if (stats.max_n or 0) > 1:
        dup = (
            src.groupBy(key)
            .agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") > 1)
            .limit(1)
            .collect()
        )
        raise MergeError(
            f"duplicate source keys (e.g. {dup[0][key]!r}); MERGE requires "
            f"a unique {key} per source row"
        )
    src_bytes = int(stats.src_bytes or 0)

    # --- file-level pruning: which target files can contain source keys? -----
    # Range comparison must happen in the key's NATIVE type: stats are
    # shipped as strings (schema-stable broadcast table) and cast back,
    # otherwise numeric keys compare lexicographically ("9" > "10") and
    # pruning silently drops files that must be rewritten.
    key_type = schema[key].dataType
    live = table.plan().files
    ranged = []
    for e in live:
        st = e.stats.get(key) or {}
        lo, hi = st.get("min"), st.get("max")
        ranged.append(
            (
                e.file_path,
                None if lo is None else str(lo),
                None if hi is None else str(hi),
            )
        )
    files_df = spark.createDataFrame(
        ranged, "file_path string, kmin string, kmax string"
    )
    lo_t = F.col("kmin").cast(key_type)
    hi_t = F.col("kmax").cast(key_type)
    touched_rows = (
        src.select(F.col(key).alias("__k"))
        .join(
            F.broadcast(files_df),
            (F.col("kmin").isNull())
            | ((F.col("__k") >= lo_t) & (F.col("__k") <= hi_t)),
            "inner",
        )
        .select("file_path")
        .distinct()
        .collect()
    )
    touched = sorted(r.file_path for r in touched_rows)

    log = LineageLog(table.root, job_id)
    log.start_job(
        "merge",
        {
            "key": key,
            "touched_files": len(touched),
            "salt_seed": salt_seed,
            "strategy": strategy,
            "src_bytes_est": src_bytes,
        },
    )

    cols = [f.name for f in schema.fields]
    touched_set = set(touched)
    bytes_touched = sum(
        e.file_size_bytes for e in live if e.file_path in touched_set
    )
    if target_file_count is None:
        # without an explicit count the union of join branches would
        # write (scan tasks × partition values) fragment files; size the
        # output like an append instead (~128 MB targets, one task per
        # partition value)
        target_file_count = max(
            1, -(-(bytes_touched + src_bytes) // (128 * 1024 * 1024))
        )
    if touched:
        paths = [os.path.join(table.root, p) for p in touched]
        target_sub = spark.read.schema(schema).parquet(*paths)
    else:
        target_sub = spark.createDataFrame([], schema)

    # --- join strategy -------------------------------------------------------
    # broadcast: small source → broadcast LEFT join against the touched
    #   target rows. The wide target side never shuffles: rows stream
    #   parquet-scan → resolve → write, so total IO is read-touched +
    #   write-touched (at 10^12 rows this is the everyday MERGE shape —
    #   a trickle of updates against huge files).
    # shuffle: large source → both sides hash-repartitioned on a SEEDED
    #   rehash of the key (breaks adversarial/hot lexicographic ranges —
    #   the reference's own partition-key skew bug,
    #   /root/reference/etl/handlers/click_handler.py:165) + AQE skew
    #   splitting for residual imbalance.
    use_broadcast = strategy == "broadcast" or (
        strategy == "auto" and src_bytes <= broadcast_threshold
    )
    not_delete = (F.col("__op").isNull()) | (F.col("__op") != DELETE_OP)
    t = target_sub.select(
        F.col(key).alias("__k"), F.struct(*cols).alias("__t")
    )
    s = src.select(
        F.col(key).alias("__k"), F.struct(*cols).alias("__s"), "__op"
    )
    if use_broadcast:
        joined = t.join(F.broadcast(s), "__k", "left")
        kept_target = joined.filter(F.col("__s").isNull()).select("__t.*")
        updated = joined.filter(
            F.col("__s").isNotNull() & not_delete
        ).select("__s.*")
        # inserts: source keys provably absent from the touched rows
        # (pruning already proved untouched files cannot contain them);
        # the anti-join's target side is a column-pruned key scan
        inserts = (
            s.join(t.select("__k"), "__k", "left_anti")
            .filter(not_delete)
            .select("__s.*")
        )
        result = kept_target.unionByName(updated).unionByName(inserts)
    else:
        n_shuffle = int(spark.conf.get("spark.sql.shuffle.partitions"))
        salt = lambda c: F.xxhash64(F.col(c), F.lit(salt_seed))  # noqa: E731
        joined = t.repartition(n_shuffle, salt("__k")).join(
            s.repartition(n_shuffle, salt("__k")), "__k", "full_outer"
        )
        kept_target = joined.filter(F.col("__s").isNull()).select("__t.*")
        from_source = joined.filter(
            F.col("__s").isNotNull() & not_delete
        ).select("__s.*")
        result = kept_target.unionByName(from_source)

    entries = write_data_files(
        spark,
        table.root,
        meta.schema_json,
        meta.partition_spec,
        result,
        target_file_count=target_file_count,
        job_dir=f"data/{log.job_id}",
    )
    rows_written = sum(e.record_count for e in entries)
    snap = table._commit_files(
        "merge",
        entries,
        touched,
        summary={
            "job_id": log.job_id,
            "files_touched": len(touched),
            "rows_written": rows_written,
        },
    )
    log.finish_task(
        "merge",
        entries,
        files_in=touched,
        bytes_in=bytes_touched,
    )
    log.finish_job(
        {"snapshot_id": snap.snapshot_id, "rows_written": rows_written}
    )
    src.unpersist()
    return MergeResult(
        job_id=log.job_id,
        snapshot_id=snap.snapshot_id,
        files_touched=len(touched),
        files_written=len(entries),
        rows_written=rows_written,
    )
