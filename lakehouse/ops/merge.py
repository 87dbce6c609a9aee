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
2. **The join.** Touched rows FULL OUTER JOIN source on a salted hash of
   the key: both sides are hash-repartitioned on ``xxhash64(key, seed)``
   — a seeded rehash that breaks adversarial/hot lexicographic ranges
   (the reference's own partition-key skew bug,
   /root/reference/etl/handlers/click_handler.py:165, is this failure
   mode) — and AQE skew-join splitting handles residual imbalance at
   runtime (session.py turns it on).
3. **Commit.** REPLACE touched files + APPEND result files in one
   snapshot (op="merge"); untouched files are never read or moved.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

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
) -> MergeResult:
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

    # --- duplicate source keys are an error (ambiguous merge) ----------------
    dup = (
        src.groupBy(key)
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
        .limit(1)
        .collect()
    )
    if dup:
        raise MergeError(
            f"duplicate source keys (e.g. {dup[0][key]!r}); MERGE requires "
            f"a unique {key} per source row"
        )

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
        {"key": key, "touched_files": len(touched), "salt_seed": salt_seed},
    )

    cols = [f.name for f in schema.fields]
    if touched:
        paths = [os.path.join(table.root, p) for p in touched]
        target_sub = spark.read.schema(schema).parquet(*paths)
    else:
        target_sub = spark.createDataFrame([], schema)

    # --- salted hash repartition + full outer join ---------------------------
    n_shuffle = int(spark.conf.get("spark.sql.shuffle.partitions"))
    salt = lambda c: F.xxhash64(F.col(c), F.lit(salt_seed))  # noqa: E731
    t = (
        target_sub.select(
            F.col(key).alias("__k"), F.struct(*cols).alias("__t")
        )
        .repartition(n_shuffle, salt("__k"))
    )
    s = (
        src.select(
            F.col(key).alias("__k"), F.struct(*cols).alias("__s"), "__op"
        )
        .repartition(n_shuffle, salt("__k"))
    )
    joined = t.join(s, "__k", "full_outer")

    not_delete = (F.col("__op").isNull()) | (F.col("__op") != DELETE_OP)
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
        bytes_in=sum(e.file_size_bytes for e in live if e.file_path in set(touched)),
    )
    log.finish_job(
        {"snapshot_id": snap.snapshot_id, "rows_written": rows_written}
    )
    return MergeResult(
        job_id=log.job_id,
        snapshot_id=snap.snapshot_id,
        files_touched=len(touched),
        files_written=len(entries),
        rows_written=rows_written,
    )
