"""Custom relational operators Spark lacks: as-of join, range join.

Spark's DataFrame API has no ASOF JOIN (point-in-time enrichment) and
compiles naive interval predicates to BroadcastNestedLoopJoin — the
O(n·m) plan that dies at 10^12 rows. Both operators here are pure
DataFrame compositions: one shuffle each, no Python in the hot path,
no nested-loop join anywhere.

Reference analogue: the reference enriches click events row-by-row in
`etl/handlers/click_handler.py` (static derivations only); these are
the time-aware enrichments a clickstream warehouse asks for next
("value of the user's most recent prior purchase", "events inside a
promo window").
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    by: Sequence[str] = (),
    tolerance: Optional[float] = None,
    right_suffix: str = "",
) -> DataFrame:
    """Backward as-of LEFT join: each left row picks the LATEST right
    row with ``right.on <= left.on`` (ties at equal ``on`` match), per
    ``by`` key group. Unmatched left rows keep NULL right columns —
    the exact semantics of DuckDB/kdb ``ASOF LEFT JOIN`` (the oracle).

    Contract: the right side must be unique on ``(by, on)`` — with
    duplicates "the latest right row" is ill-defined and the pick
    would be partition-order-dependent; pre-aggregate upstream (the
    registry query groups by key+ts first).

    Scale shape: tag both sides, union, ONE shuffle on ``by`` for a
    per-key ordered window, then ``last(right_struct, ignorenulls)``
    over ``rowsBetween(unboundedPreceding, currentRow)`` — right rows
    sort BEFORE left rows at equal ``on`` so equality matches. No
    join node at all, so nothing to skew-split; a hot ``by`` key costs
    one sorted partition (same bound as any per-key window — salt
    upstream if one key dominates). ``tolerance`` (same units as
    ``on``) nulls out matches older than ``left.on - tolerance``.
    """
    by = list(by)
    if on in by:
        raise ValueError("asof_join: `on` cannot also be a `by` key")
    lcols = [c for c in left.columns if c not in by and c != on]
    rcols = [c for c in right.columns if c not in by and c != on]
    clash = set(rcols) & set(lcols)
    if clash and not right_suffix:
        raise ValueError(
            f"asof_join: right columns {sorted(clash)} clash with left; "
            "pass right_suffix"
        )
    rout = {c: f"{c}{right_suffix}" for c in rcols}

    r2 = right.select(
        *by,
        F.col(on).alias("__ts"),
        F.lit(0).alias("__tag"),
        F.struct(
            F.col(on).alias("__asof"), *[F.col(c) for c in rcols]
        ).alias("__r"),
    )
    rtype = r2.schema["__r"].dataType
    ltype = (
        left.select(F.struct(*[F.col(c) for c in lcols]).alias("__l"))
        .schema["__l"]
        .dataType
    )
    l2 = left.select(
        *by,
        F.col(on).alias("__ts"),
        F.lit(1).alias("__tag"),
        F.lit(None).cast(rtype).alias("__r"),
        F.struct(*[F.col(c) for c in lcols]).alias("__l"),
        F.col(on).alias("__on"),
    )
    r3 = r2.withColumn("__l", F.lit(None).cast(ltype)).withColumn(
        "__on", F.lit(None).cast(left.schema[on].dataType)
    )
    u = l2.unionByName(r3)

    w = (
        Window.partitionBy(*by)
        .orderBy(F.col("__ts").asc(), F.col("__tag").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        if by
        else Window.partitionBy(F.lit(0))
        .orderBy(F.col("__ts").asc(), F.col("__tag").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    m = F.last("__r", ignorenulls=True).over(w)
    if tolerance is not None:
        # numeric lookback window; timestamps measure in MICROSECONDS
        def _num(c):
            dt = left.schema[on].dataType.typeName()
            if dt in ("timestamp", "timestamp_ntz"):
                return F.unix_micros(c.cast("timestamp"))
            if dt == "date":
                return F.datediff(c, F.lit("1970-01-01"))
            return c.cast("double")

        m = F.when(
            _num(F.col("__ts")) - _num(m["__asof"]) <= float(tolerance), m
        )
    out = (
        u.withColumn("__m", m)
        .filter(F.col("__tag") == 1)
        .select(
            *by,
            F.col("__on").alias(on),
            *[F.col("__l")[c].alias(c) for c in lcols],
            F.col("__m")["__asof"].alias(f"{on}_matched{right_suffix}"),
            *[F.col("__m")[c].alias(rout[c]) for c in rcols],
        )
    )
    return out


def range_join(
    left: DataFrame,
    right: DataFrame,
    *,
    left_on: str,
    start_col: str,
    end_col: str,
    bucket_width: int,
) -> DataFrame:
    """Inner point-in-interval join: left rows where
    ``start <= left_on < end`` — WITHOUT the BroadcastNestedLoopJoin
    Spark compiles a raw inequality join to. All three columns must be
    integer-valued (epoch seconds / days / ms; cast dates upstream).

    Scale shape: the point side lands in exactly ONE width-``w``
    bucket; each interval explodes to the buckets it spans
    (``(end-start)/w + 1`` rows — pick ``w`` near the median interval
    span so the blow-up stays ~2×). The join is then a plain equi-join
    on the bucket id (shuffle or broadcast, AQE's choice) with the
    exact predicate as a post-filter. No duplicates by construction:
    a matching interval covers the point's bucket exactly once.
    Degenerate intervals (``end <= start``) match nothing.
    """
    w = int(bucket_width)
    if w <= 0:
        raise ValueError("bucket_width must be positive")
    lb = left.withColumn(
        "__b", F.expr(f"CAST({left_on} AS BIGINT) DIV {w}")
    )
    rb = (
        right.filter(F.col(start_col) < F.col(end_col))
        .withColumn(
            "__b",
            F.explode(
                F.sequence(
                    F.expr(f"CAST({start_col} AS BIGINT) DIV {w}"),
                    F.expr(f"(CAST({end_col} AS BIGINT) - 1) DIV {w}"),
                )
            ),
        )
    )
    return lb.join(rb, "__b").filter(
        (F.col(left_on) >= F.col(start_col))
        & (F.col(left_on) < F.col(end_col))
    ).drop("__b")
