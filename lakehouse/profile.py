"""Dataset profiling for training-data curation: one pass, per-column
statistics as ROWS (long format), entirely JVM-side built-ins.

The reference's analysts eyeball table health with ad-hoc Athena
queries (/root/reference/README.md:104-114); a curation pipeline wants
the profile as data. Long format (one row per column) keeps the output
schema fixed however many columns are profiled, so profiles are
themselves appendable to a lakehouse table and diffable run-over-run.

Scale shape: ONE aggregation job over the input — every statistic is a
built-in aggregate (count / count distinct / min / max / avg /
percentile), partial-aggregated map-side; no per-column passes, no
driver loops over data. ``count_distinct`` is exact (a shuffle per
column set — acceptable in one aggregate); swap in
``approx_count_distinct`` at extreme cardinalities.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_NUMERIC = {"tinyint", "smallint", "int", "bigint", "float", "double"}


def profile_columns(
    df: DataFrame, columns: Optional[Sequence[str]] = None
) -> DataFrame:
    """Per-column profile rows: ``(column, n, nulls, n_distinct,
    min_s, max_s, mean, median)``.

    min/max are cast to string so one fixed schema covers every input
    type; mean/median are populated for numeric columns only (NULL
    otherwise). median is the exact interpolated 0.5-percentile
    (``percentile``), matching DuckDB's ``quantile_cont`` for the
    oracle twin.
    """
    dtypes = dict(df.dtypes)
    cols = list(columns) if columns is not None else list(df.columns)
    aggs = []
    for c in cols:
        numeric = dtypes.get(c) in _NUMERIC
        aggs.append(
            F.struct(
                F.lit(c).alias("column"),
                F.count(F.lit(1)).alias("n"),
                (F.count(F.lit(1)) - F.count(c)).alias("nulls"),
                F.countDistinct(c).alias("n_distinct"),
                F.min(c).cast("string").alias("min_s"),
                F.max(c).cast("string").alias("max_s"),
                (
                    F.avg(c) if numeric else F.lit(None).cast("double")
                ).alias("mean"),
                (
                    F.expr(f"percentile(`{c}`, 0.5)")
                    if numeric
                    else F.lit(None).cast("double")
                ).alias("median"),
            ).alias(f"_p_{c}")
        )
    one = df.agg(*aggs)
    stacked = one.select(
        F.explode(F.array(*[F.col(f"_p_{c}") for c in cols])).alias("p")
    )
    return stacked.select("p.*")
