"""Multi-touch attribution over event streams — the marketing-analytics
companion to funnel analysis (the reference's Delta table feeds exactly
this ask: "which touch channel gets credit for each purchase?"; the
reference ships the clickstream table but no operator —
`/root/reference/README.md:104,113,317` routes analysts to Athena over
the bronze table, same gap as `lakehouse/funnel.py`).

Semantics (the standard attribution models):
- A CONVERSION is an event of ``conversion_type`` at time ``tc``.
- Its QUALIFYING TOUCHES are the user's events of a ``touch_types``
  channel at ``tt <= tc`` (and ``tc - tt <= lookback`` seconds when a
  lookback is given). Ties at the conversion's exact timestamp qualify
  — same at-or-before convention as ``funnel_times``.
- ``last_touch``: the latest qualifying touch's channel gets 100 % of
  the conversion and its ``value`` (ties broken by latest timestamp,
  then largest ``id_col`` — fully deterministic).
- ``first_touch``: the earliest qualifying touch (ties: smallest id).
- ``linear``: every qualifying touch shares the conversion equally;
  channel credit is ``touches_of_channel / total_touches``.
- A conversion with NO qualifying touch is credited to the ``(none)``
  channel in every model, so each model's conversion column sums to the
  total conversion count (nothing silently dropped).

Scale shape: ONE shuffle — a per-user window over ``(user, micros)``
with a RANGE frame (``[tc - lookback, tc]``; unbounded-preceding when
no lookback). No join node anywhere: touches and conversions ride the
same scan, and the first/last touch is a ``min``/``max`` over a
fixed-width sortable key ``%020d|%020d|channel`` (micros, id — lexical
order == numeric order), the same union-and-window trick as
``lakehouse/joins.asof_join``. The linear model adds one windowed
``count`` per channel over the SAME frame (``touch_types`` is a
bounded, caller-supplied list — these are extra expressions in one
window node, not extra shuffles). Per-user event lists are never
materialized, so a hot user costs window aggregates, not a
``collect_list`` — safe at 10^12 events.

Cross-engine exactness: per-conversion linear shares are IEEE
quotients of small ints (bit-identical in Spark and DuckDB), rounded
to 6 decimals per row, then summed as DECIMAL(18,6) — exact and
order-insensitive — and only cast to double at the end (the repo-wide
``_dec_sum`` convention).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .stablemath import stable_round_dec

MODELS = ("last_touch", "first_touch", "linear")

# fixed-width sortable key: 20-digit micros | 20-digit id | channel —
# channel starts at character 43 (1-based) in both engines
_CHAN_START = 43


def _micros(df: DataFrame, ts_col: str):
    dt = df.schema[ts_col].dataType.typeName()
    if dt in ("timestamp", "timestamp_ntz"):
        return F.unix_micros(F.col(ts_col).cast("timestamp"))
    return (F.col(ts_col).cast("double") * 1_000_000).cast("long")


def attribution_report(
    events: DataFrame,
    touch_types: Sequence[str],
    conversion_type: str,
    *,
    model: str = "last_touch",
    lookback: Optional[float] = None,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """One row per touch channel (plus ``(none)``): credited
    ``conversions`` and ``value`` under ``model``. ``lookback`` is in
    seconds. Channel names must not contain ``|`` (key separator)."""
    if model not in MODELS:
        raise ValueError(f"model must be one of {MODELS}")
    if conversion_type in touch_types:
        raise ValueError("conversion_type cannot also be a touch type")
    if not touch_types:
        raise ValueError("need at least one touch channel")
    for t in touch_types:
        if "|" in t:
            raise ValueError(f"channel name contains '|': {t!r}")

    touched = F.col("__et").isin(*[str(t) for t in touch_types])
    base = events.select(
        F.col(user_col).alias("__u"),
        _micros(events, ts_col).alias("__tn"),
        F.col(id_col).cast("long").alias("__id"),
        F.col(type_col).alias("__et"),
        F.col(value_col).cast("double").alias("__v"),
    ).filter(touched | (F.col("__et") == conversion_type))

    wb = Window.partitionBy("__u").orderBy("__tn")
    w = (
        wb.rangeBetween(-int(float(lookback) * 1_000_000), 0)
        if lookback is not None
        else wb.rangeBetween(Window.unboundedPreceding, 0)
    )

    if model == "linear":
        cnts = [
            F.count(F.when(F.col("__et") == str(t), F.lit(1)))
            .over(w)
            .alias(f"__c{i}")
            for i, t in enumerate(touch_types)
        ]
        scored = base.select("*", *cnts).filter(
            F.col("__et") == conversion_type
        )
        tot = None
        for i in range(len(touch_types)):
            c = F.col(f"__c{i}")
            tot = c if tot is None else tot + c
        scored = scored.withColumn("__tot", tot)
        # ONE aggregation pass: exact decimal sums of per-row rounded
        # IEEE shares for every channel at once, then a stack() unpivot
        # of the single result row (see module docstring)
        vv = F.coalesce(F.col("__v"), F.lit(0.0))
        aggs, labels = [], []
        for i, t in enumerate(list(touch_types) + [None]):
            if t is None:  # the (none) channel: conversions w/o touches
                share = F.when(F.col("__tot") == 0, F.lit(1.0)).otherwise(
                    F.lit(0.0)
                )
            else:
                share = F.when(
                    F.col("__tot") > 0, F.col(f"__c{i}") / F.col("__tot")
                ).otherwise(F.lit(0.0))
            # stable_round_DEC (not stable_round): these rounded
            # per-row shares feed a SUM, which must be decimal-exact
            # (order-insensitive) — the output boundary below casts
            # the aggregate to double (see stablemath.py docstring)
            aggs.append(
                F.sum(stable_round_dec(share, 6)).alias(f"__conv{i}")
            )
            aggs.append(
                F.sum(stable_round_dec(vv * share, 6)).alias(f"__val{i}")
            )
            labels.append(
                (str(t) if t is not None else "(none)").replace("'", "''")
            )
        row = scored.agg(*aggs)
        stack = ", ".join(
            f"'{lab}', __conv{i}, __val{i}" for i, lab in enumerate(labels)
        )
        return (
            row.select(
                F.expr(
                    f"stack({len(labels)}, {stack}) "
                    "AS (channel, __conv, __val)"
                )
            )
            .select(
                "channel",
                F.coalesce(F.col("__conv").cast("double"), F.lit(0.0)).alias(
                    "conversions"
                ),
                F.coalesce(F.col("__val").cast("double"), F.lit(0.0)).alias(
                    "value"
                ),
            )
            .filter(F.col("conversions") > 0)
            .orderBy("channel")
        )

    key = F.when(
        touched,
        F.concat(
            F.format_string("%020d|%020d|", F.col("__tn"), F.col("__id")),
            F.col("__et"),
        ),
    )
    agg = F.max(key) if model == "last_touch" else F.min(key)
    conv = base.withColumn("__k", agg.over(w)).filter(
        F.col("__et") == conversion_type
    )
    channel = F.coalesce(
        F.expr(f"substring(__k, {_CHAN_START})"), F.lit("(none)")
    )
    return (
        conv.groupBy(channel.alias("channel"))
        .agg(
            F.count(F.lit(1)).cast("double").alias("conversions"),
            F.sum(
                F.coalesce(F.col("__v"), F.lit(0.0)).cast("decimal(18,4)")
            )
            .cast("double")
            .alias("value"),
        )
        .orderBy("channel")
    )


def attribution_oracle_sql(
    touch_types: Sequence[str],
    conversion_type: str,
    *,
    model: str = "last_touch",
    lookback: Optional[float] = None,
    table: str = "events",
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
    value_col: str = "value",
) -> str:
    """DuckDB twin: identical window frame, key encoding and decimal
    arithmetic."""
    q = lambda s: str(s).replace("'", "''")
    in_list = ", ".join(f"'{q(t)}'" for t in touch_types)
    frame = (
        f"RANGE BETWEEN {int(float(lookback) * 1_000_000)} PRECEDING "
        "AND CURRENT ROW"
        if lookback is not None
        else "RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"
    )
    base = (
        f"base AS (SELECT {user_col} AS u, epoch_us({ts_col}) AS tn, "
        f"CAST({id_col} AS BIGINT) AS eid, {type_col} AS et, "
        f"CAST({value_col} AS DOUBLE) AS v FROM {table} "
        f"WHERE {type_col} IN ({in_list}) "
        f"OR {type_col} = '{q(conversion_type)}')"
    )
    win = f"OVER (PARTITION BY u ORDER BY tn {frame})"
    if model == "linear":
        cnts = ", ".join(
            f"count(CASE WHEN et = '{q(t)}' THEN 1 END) {win} AS c{i}"
            for i, t in enumerate(touch_types)
        )
        tot = " + ".join(f"c{i}" for i in range(len(touch_types)))
        picks = []
        for i, t in enumerate(touch_types):
            share = f"CASE WHEN tot > 0 THEN c{i} * 1.0 / tot ELSE 0.0 END"
            picks.append(
                f"SELECT '{q(t)}' AS channel, "
                f"CAST(coalesce(SUM(CAST(floor(({share}) * 1000000.0 + 0.5) "
                f"/ 1000000.0 AS DECIMAL(18,6))), 0) AS DOUBLE) AS conversions, "
                f"CAST(coalesce(SUM(CAST(floor(coalesce(v, 0.0) * "
                f"({share}) * 1000000.0 + 0.5) / 1000000.0 "
                f"AS DECIMAL(18,6))), 0) AS DOUBLE) "
                f"AS value FROM conv"
            )
        none_share = "CASE WHEN tot = 0 THEN 1.0 ELSE 0.0 END"
        picks.append(
            f"SELECT '(none)' AS channel, "
            f"CAST(coalesce(SUM(CAST({none_share} AS DECIMAL(18,6))), 0) "
            f"AS DOUBLE) AS conversions, "
            f"CAST(coalesce(SUM(CAST(floor(coalesce(v, 0.0) * "
            f"({none_share}) * 1000000.0 + 0.5) / 1000000.0 "
            f"AS DECIMAL(18,6))), 0) AS DOUBLE) "
            f"AS value FROM conv"
        )
        return (
            f"WITH {base}, "
            f"sc AS (SELECT *, {cnts} FROM base), "
            f"conv AS (SELECT *, {tot} AS tot FROM sc "
            f"WHERE et = '{q(conversion_type)}'), "
            f"u AS ({' UNION ALL '.join(picks)}) "
            "SELECT * FROM u WHERE conversions > 0 ORDER BY channel"
        )
    fn = "max" if model == "last_touch" else "min"
    key = (
        f"CASE WHEN et IN ({in_list}) "
        "THEN printf('%020d|%020d|', tn, eid) || et END"
    )
    return (
        f"WITH {base}, "
        f"sc AS (SELECT *, {fn}({key}) {win} AS k FROM base), "
        f"conv AS (SELECT * FROM sc WHERE et = '{q(conversion_type)}') "
        f"SELECT coalesce(substr(k, {_CHAN_START}), '(none)') AS channel, "
        "CAST(count(*) AS DOUBLE) AS conversions, "
        "CAST(SUM(CAST(coalesce(v, 0.0) AS DECIMAL(18,4))) AS DOUBLE) "
        "AS value FROM conv GROUP BY 1 ORDER BY 1"
    )
