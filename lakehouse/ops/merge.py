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
2. **The join — keys only, never payloads.** Copy-on-write MERGE with a
   unique key has a closed form:

       result = (touched target  ⟕anti  source keys)  ∪  source rows
                                                         (minus deletes)

   A matched UPDATE and an unmatched INSERT both emit the source row
   verbatim, and a matched DELETE emits nothing — so the only join the
   operator needs is a **left-anti of the wide target side against the
   source KEY column**. Audio payloads (the dominant bytes) never cross
   a join build side. Two execution strategies, picked from a measured
   key-volume estimate (one narrow pass that also does the
   duplicate-key check):

   - *broadcast* (key set ≤ threshold): source keys are broadcast; the
     wide target side NEVER shuffles — rows stream parquet-scan →
     anti-filter → write. This is the everyday 10^12-row MERGE shape: a
     trickle of updates against huge files, at network cost
     O(keys × executors), not O(payload × executors).
   - *shuffle* (large key set): both sides hash-repartitioned on
     ``xxhash64(key, seed)`` — a seeded rehash that breaks
     adversarial/hot lexicographic ranges (the reference's own
     partition-key skew bug,
     /root/reference/etl/handlers/click_handler.py:165, is this failure
     mode) — left-anti join, with AQE skew-join splitting for residual
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
    broadcast_threshold: int = 32 * 1024 * 1024,
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

    # --- one narrow pass: duplicate-key check + KEY-volume estimate ----------
    # (the join below only ever moves keys, so the strategy choice is
    # keyed on key bytes — payload size is irrelevant to it)
    key_type = schema[key].dataType
    key_sz = (
        F.coalesce(F.length(F.col(key).cast("string")), F.lit(0)) + 16
        if isinstance(key_type, (T.StringType, T.BinaryType))
        else F.lit(24)
    )
    stats = (
        src.select(F.col(key).alias("__k"), key_sz.alias("__sz"))
        .groupBy("__k")
        .agg(F.count(F.lit(1)).alias("n"), F.max("__sz").alias("b"))
        .agg(
            F.max("n").alias("max_n"),
            F.sum("b").alias("key_bytes"),
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
    key_bytes = int(stats.key_bytes or 0)

    # --- file-level pruning: which target files can contain source keys? -----
    # Range comparison must happen in the key's NATIVE type: stats are
    # shipped as strings (schema-stable broadcast table) and cast back,
    # otherwise numeric keys compare lexicographically ("9" > "10") and
    # pruning silently drops files that must be rewritten.
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
            "key_bytes_est": key_bytes,
        },
    )

    cols = [f.name for f in schema.fields]
    touched_set = set(touched)
    touched_entries = [e for e in live if e.file_path in touched_set]
    bytes_touched = sum(e.file_size_bytes for e in touched_entries)
    rows_touched = sum(e.record_count for e in touched_entries)
    if target_file_count is None:
        # without an explicit count the union branches would write
        # (scan tasks × partition values) fragment files; size the
        # output like an append instead (~128 MB targets). Source bytes
        # are estimated from the touched files' average row size.
        avg_row = bytes_touched / rows_touched if rows_touched else 1024
        src_bytes_est = int(int(stats.src_rows or 0) * avg_row)
        target_file_count = max(
            1, -(-(bytes_touched + src_bytes_est) // (128 * 1024 * 1024))
        )
    if touched:
        paths = [os.path.join(table.root, p) for p in touched]
        target_sub = spark.read.schema(schema).parquet(*paths)
    else:
        target_sub = spark.createDataFrame([], schema)

    # --- the keys-only anti-join ---------------------------------------------
    # result = (touched target ⟕anti source keys) ∪ (source minus deletes):
    # matched updates and unmatched inserts are both the source row
    # verbatim, matched deletes vanish — no payload ever enters a join.
    # broadcast: key set broadcast; the wide target side never shuffles —
    #   rows stream parquet-scan → anti-filter → write, total IO =
    #   read-touched + write-touched (the everyday 10^12-row MERGE shape:
    #   a trickle of updates against huge files).
    # shuffle: large key set → both sides hash-repartitioned on a SEEDED
    #   rehash of the key (breaks adversarial/hot lexicographic ranges —
    #   the reference's own partition-key skew bug,
    #   /root/reference/etl/handlers/click_handler.py:165) + AQE skew
    #   splitting for residual imbalance.
    use_broadcast = strategy == "broadcast" or (
        strategy == "auto" and key_bytes <= broadcast_threshold
    )
    not_delete = (F.col("__op").isNull()) | (F.col("__op") != DELETE_OP)
    keys = src.select(F.col(key).alias("__k"))
    t = target_sub
    if use_broadcast:
        kept_target = t.join(
            F.broadcast(keys), t[key] == keys["__k"], "left_anti"
        )
    else:
        n_shuffle = int(spark.conf.get("spark.sql.shuffle.partitions"))
        salt = lambda c, d: F.xxhash64(d[c], F.lit(salt_seed))  # noqa: E731
        kept_target = t.repartition(n_shuffle, salt(key, t)).join(
            keys.repartition(n_shuffle, salt("__k", keys)),
            t[key] == keys["__k"],
            "left_anti",
        )
    from_source = src.filter(not_delete).select(*cols)
    result = kept_target.select(*cols).unionByName(from_source)

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
