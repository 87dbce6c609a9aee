"""Exact distributed quantiles / equi-depth histograms.

Spark ships only approximate quantiles (``percentile_approx``, a
Greenwald-Khanna sketch) as its scalable path; the exact ``percentile``
aggregate buffers every value. This module computes EXACT rank
statistics with bounded memory everywhere — the primitive behind
ANALYZE histograms (ops/analyze.py) and CBO selectivity estimation,
and the same coarse-bucket + prefix-sum scheme packing.py uses for
sequence assembly:

1. one narrow aggregate: N, min, max (the only driver row);
2. values land in ``coarse`` width-w buckets — a monotone map, so a
   global rank splits into (bucket, local rank); per-bucket counts are
   one shuffle of a single long column, and the cumulative-offset walk
   happens driver-side over a CONSTANT-bounded frame (≤ ``coarse``
   rows, independent of table size);
3. only the ≤ ``buckets`` coarse buckets that actually contain a
   target rank are re-read: within each, a per-bucket sort assigns
   local row numbers and the rows at the target local ranks are the
   answers. The value at a global rank is well-defined under ties
   (equal values sort adjacently), so results are deterministic under
   any partitioning.

Worst case: a single heavy value makes its coarse bucket hold that
value's full multiplicity — the per-bucket sort then carries it, but
the picked VALUE is already determined (it IS the heavy value);
raising ``coarse`` bounds every other bucket at N/coarse rows.

The reference has no statistics story at all (its Glue crawler
computes table-level stats only, infra/terraform/modules/glue); Iceberg
publishes NDV but not histograms — this is the missing CBO half.
"""

from __future__ import annotations

from bisect import bisect_right
from typing import Optional

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_COARSE = 4096

_NUMERIC = ("int", "bigint", "smallint", "tinyint", "float", "double",
            "long", "integer", "short", "byte")


def _check_numeric(df: DataFrame, col: str) -> str:
    t = df.schema[col].dataType.simpleString()
    if not any(t.startswith(p) for p in _NUMERIC) and not t.startswith(
        "decimal"
    ):
        raise ValueError(
            f"exact_quantiles: column {col!r} has non-numeric type {t}"
        )
    return t


def target_ranks(n: int, buckets: int) -> list[tuple[int, int]]:
    """(bucket, global rank) pairs: rank_b = ceil(b·N/B), integer-exact
    (the same arithmetic the DuckDB oracle twin uses)."""
    return [
        (b, (b * n + buckets - 1) // buckets)
        for b in range(1, buckets + 1)
    ]


def exact_quantiles(
    df: DataFrame,
    col: str,
    buckets: int,
    *,
    coarse: int = DEFAULT_COARSE,
) -> DataFrame:
    """Exact equi-depth quantile values: one row per bucket b ∈ 1..B
    with the value at global rank ceil(b·N/B) under ORDER BY col
    (NULLs excluded, SQL aggregate semantics). Deterministic under
    ties and any partitioning — the value at a rank is unique even
    when row order among equal values is not."""
    if buckets <= 0:
        raise ValueError("buckets must be positive")
    t = _check_numeric(df, col)
    spark = df.sparkSession
    out_schema = f"bucket int, rank bigint, value {t}"

    vals = df.select(F.col(col).alias("v")).filter(F.col("v").isNotNull())
    n, mn, mx = vals.agg(
        F.count("v"), F.min("v"), F.max("v")
    ).collect()[0]
    if not n:
        return spark.createDataFrame([], out_schema)
    ranks = target_ranks(int(n), buckets)
    if mn == mx:  # constant column: every quantile IS the value
        return spark.createDataFrame(
            [(b, r, mn) for b, r in ranks], out_schema
        )

    w = (float(mx) - float(mn)) / coarse
    cb = F.least(
        F.floor((F.col("v").cast("double") - F.lit(float(mn))) / F.lit(w)),
        F.lit(coarse - 1),
    ).cast("long")

    # per-coarse-bucket counts: constant-bounded frame, driver walk
    counts = sorted(
        (r["cb"], r["cnt"])
        for r in vals.groupBy(cb.alias("cb"))
        .agg(F.count("*").alias("cnt"))
        .collect()
    )
    cbs = [c for c, _ in counts]
    cums: list[int] = []
    run = 0
    for _, c in counts:
        run += c
        cums.append(run)
    needed = []  # (cb, local_rank, bucket, global_rank)
    for b, r in ranks:
        i = bisect_right(cums, r - 1)  # first bucket with cum >= r
        off = cums[i - 1] if i else 0
        needed.append((cbs[i], r - off, b, r))
    need_df = spark.createDataFrame(
        needed, "cb long, lrank bigint, bucket int, rank bigint"
    )
    hot = sorted({c for c, _, _, _ in needed})

    per_cb = Window.partitionBy("cb").orderBy("v")
    return (
        vals.withColumn("cb", cb)
        .filter(F.col("cb").isin(hot))
        .withColumn("rn", F.row_number().over(per_cb))
        .join(need_df, "cb")
        .filter(F.col("rn") == F.col("lrank"))
        .select("bucket", "rank", F.col("v").alias("value"))
        .orderBy("bucket")
    )


def equi_depth_bounds(
    df: DataFrame,
    col: str,
    buckets: int,
    *,
    coarse: int = DEFAULT_COARSE,
) -> tuple[int, Optional[float], list]:
    """Driver-side histogram ingredients: (non-null row count, min,
    ordered upper-bound list — one per bucket, the last equals max).
    Collect is bucket-bounded (≤ B rows)."""
    rows = exact_quantiles(df, col, buckets, coarse=coarse).collect()
    if not rows:
        return 0, None, []
    vals = df.select(F.col(col).alias("v")).filter(F.col("v").isNotNull())
    mn = vals.agg(F.min("v")).collect()[0][0]
    n = rows[-1]["rank"]  # rank of bucket B == N by construction
    return int(n), mn, [r["value"] for r in rows]


def quantiles_oracle_sql(
    buckets: int, col: str, table: str, where: str = ""
) -> str:
    """DuckDB twin of exact_quantiles: row_number over the full order,
    joined to the same integer-exact target ranks."""
    w = f"WHERE {where}" if where else ""
    return f"""
        WITH v AS (
            SELECT {col} AS value FROM {table}
            {w + (' AND ' if where else 'WHERE ')}{col} IS NOT NULL
        ),
        n AS (SELECT COUNT(*) AS c FROM v),
        ranked AS (
            SELECT value, row_number() OVER (ORDER BY value) AS rn FROM v
        ),
        ranks AS (
            SELECT CAST(b AS INTEGER) AS bucket,
                   (b * c + {buckets} - 1) // {buckets} AS rank
            FROM generate_series(1, {buckets}) AS g(b), n
        )
        SELECT bucket, rank, value
        FROM ranks JOIN ranked ON ranked.rn = ranks.rank
        ORDER BY bucket
    """
