"""Funnel analysis over event streams — the flagship clickstream
analytics query of the reference's domain (its Delta table feeds
exactly this ask: "of users who viewed, how many carted, then
purchased, and how fast do they fall off?"; the reference ships the
table but no operator — `README.md` analyst chapter).

Semantics (the standard ordered-funnel definition): a user reaches
step k at the EARLIEST event of type k occurring at-or-after their
step-(k−1) time (ties allowed: same-timestamp progression counts, so
an atomic view+purchase bundle traverses both). An optional ``within``
horizon bounds each hop.

Scale shape: one narrow aggregate per step — filter to the step's
event type FIRST (column-pruned scan), groupBy the user key (one
shuffle of (user, ts) pairs only), then an equi-join against the
previous step's (user, t_prev) frame. No broadcast hints anywhere —
step frames shrink monotonically but start corpus-scaled (every user
who did step 1), so AQE owns the join strategy. No per-user event
lists are ever materialized (a hot user costs one min(), not a
collect_list), which is what makes this safe at 10^12 events.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_times(
    events: DataFrame,
    steps: Sequence[str],
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    within: Optional[float] = None,
) -> DataFrame:
    """Per-user step timestamps: one row per user who completed step 1,
    with ``t1..tN`` (NULL from the first uncompleted step on).
    ``within`` (seconds) bounds each hop's duration."""
    if len(steps) < 2:
        raise ValueError("funnel needs at least two steps")
    cur = (
        events.filter(F.col(type_col) == steps[0])
        .groupBy(F.col(user_col).alias("user"))
        .agg(F.min(ts_col).alias("t1"))
    )
    for i, step in enumerate(steps[1:], start=2):
        nxt = events.filter(F.col(type_col) == step).select(
            F.col(user_col).alias("user"), F.col(ts_col).alias("__ts")
        )
        cond = F.col("__ts") >= F.col(f"t{i-1}")
        if within is not None:
            # seconds; timestamp(_ntz) measured via an explicit
            # timestamp cast (NTZ casts to DOUBLE are rejected)
            is_ts = events.schema[ts_col].dataType.typeName() in (
                "timestamp",
                "timestamp_ntz",
            )

            def _num(c):
                return (
                    c.cast("timestamp").cast("double")
                    if is_ts
                    else c.cast("double")
                )

            cond = cond & (
                _num(F.col("__ts"))
                <= _num(F.col(f"t{i-1}")) + float(within)
            )
        cur = (
            cur.join(nxt, "user", "left")
            .withColumn("__ok", F.when(cond, F.col("__ts")))
            .groupBy("user", *[f"t{j}" for j in range(1, i)])
            .agg(F.min("__ok").alias(f"t{i}"))
        )
    return cur


def funnel_report(
    events: DataFrame,
    steps: Sequence[str],
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    within: Optional[float] = None,
) -> DataFrame:
    """One row per funnel step: users reached, conversion from the
    previous step and from step 1 (cross-engine-stable 4-decimal
    rounding — lakehouse/stablemath.py — so float division can't flake
    the gate)."""
    from .stablemath import stable_round

    t = funnel_times(
        events, steps,
        user_col=user_col, ts_col=ts_col, type_col=type_col, within=within,
    )
    counts = t.agg(
        *[
            F.count(F.col(f"t{i}")).alias(f"n{i}")
            for i in range(1, len(steps) + 1)
        ]
    )
    rows = None
    for i, step in enumerate(steps, start=1):
        prev = F.col(f"n{i-1}") if i > 1 else F.col("n1")
        r = counts.select(
            F.lit(i).alias("step"),
            F.lit(step).alias("event_type"),
            F.col(f"n{i}").alias("users"),
            stable_round(
                F.when(prev > 0, F.col(f"n{i}") / prev).otherwise(
                    F.lit(None)
                ),
                4,
            ).alias("conversion_from_prev"),
            stable_round(
                F.when(F.col("n1") > 0, F.col(f"n{i}") / F.col("n1"))
                .otherwise(F.lit(None)),
                4,
            ).alias("conversion_from_first"),
        )
        rows = r if rows is None else rows.unionByName(r)
    return rows


def funnel_oracle_sql(
    steps: Sequence[str],
    *,
    table: str = "events",
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    within: Optional[float] = None,
) -> str:
    """DuckDB twin: identical step-by-step min() cascade; stable
    floor-based rounding (lakehouse/stablemath.py) so the rate columns
    hash-match bit-for-bit."""
    from .stablemath import stable_round_sql as _r

    q = lambda s: s.replace("'", "''")
    ctes = [
        f"s1 AS (SELECT {user_col} AS u, min({ts_col}) AS t1 "
        f"FROM {table} WHERE {type_col} = '{q(steps[0])}' GROUP BY 1)"
    ]
    for i, step in enumerate(steps[1:], start=2):
        bound = (
            f" AND epoch(e.{ts_col}) <= epoch(p.t{i-1}) + {float(within)}"
            if within is not None
            else ""
        )
        prev_ts = ", ".join(f"p.t{j}" for j in range(1, i))
        ctes.append(
            f"s{i} AS (SELECT p.u, {prev_ts}, min(e.{ts_col}) AS t{i} "
            f"FROM s{i-1} p LEFT JOIN {table} e ON e.{user_col} = p.u "
            f"AND e.{type_col} = '{q(step)}' AND e.{ts_col} >= p.t{i-1}"
            f"{bound} GROUP BY ALL)"
        )
    n = len(steps)
    cnt = ", ".join(f"count(t{i}) AS n{i}" for i in range(1, n + 1))
    sel = []
    for i, step in enumerate(steps, start=1):
        prev = f"n{i-1}" if i > 1 else "n1"
        sel.append(
            f"SELECT {i} AS step, '{q(step)}' AS event_type, "
            f"n{i} AS users, "
            f"{_r(f'CASE WHEN {prev} > 0 THEN n{i} * 1.0 / {prev} END')} "
            f"AS conversion_from_prev, "
            f"{_r(f'CASE WHEN n1 > 0 THEN n{i} * 1.0 / n1 END')} "
            f"AS conversion_from_first FROM c"
        )
    return (
        "WITH " + ", ".join(ctes) + f", c AS (SELECT {cnt} FROM s{n}) "
        + " UNION ALL ".join(sel)
    )


def cohort_retention(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    max_periods: Optional[int] = None,
) -> DataFrame:
    """Weekly cohort-retention triangle — the other canonical
    clickstream analytic: users cohorted by FIRST-ACTIVITY week, then
    counted once per (cohort, weeks-since-cohort) they were active.

    Scale shape: (1) first-seen = one groupBy(user) min(ts) (narrow:
    user+ts only); (2) activity = distinct (user, week) — dedup BEFORE
    the join so a hot user contributes one row per week, not per event;
    (3) one equi-join on user (no broadcast hint — both sides are
    user-scaled, AQE decides); (4) final groupBy (cohort, period) is
    bounded by weeks², tiny. ``max_periods`` truncates the triangle.

    Output: (cohort_week DATE, weeks_since INT, users BIGINT).
    """
    first = (
        events.select(F.col(user_col).alias("u"), F.col(ts_col).alias("t"))
        .groupBy("u")
        .agg(F.date_trunc("week", F.min("t")).cast("date").alias("cohort"))
    )
    activity = (
        events.select(
            F.col(user_col).alias("u"),
            F.date_trunc("week", F.col(ts_col)).cast("date").alias("week"),
        )
        .distinct()
    )
    joined = activity.join(first, "u").select(
        "cohort",
        (
            F.datediff(F.col("week"), F.col("cohort")) / 7
        ).cast("int").alias("weeks_since"),
    )
    if max_periods is not None:
        joined = joined.filter(F.col("weeks_since") < int(max_periods))
    return (
        joined.groupBy("cohort", "weeks_since")
        .agg(F.count(F.lit(1)).alias("users"))
        .select(
            F.col("cohort").alias("cohort_week"), "weeks_since", "users"
        )
    )


def cohort_retention_oracle_sql(
    *,
    table: str = "events",
    user_col: str = "user_id",
    ts_col: str = "ts",
    max_periods: Optional[int] = None,
) -> str:
    """DuckDB twin (date_trunc('week') is Monday-start in both)."""
    bound = (
        f"WHERE weeks_since < {int(max_periods)} "
        if max_periods is not None
        else ""
    )
    return f"""
    WITH first AS (SELECT {user_col} AS u,
                          CAST(date_trunc('week', min({ts_col})) AS DATE)
                              AS cohort
                   FROM {table} GROUP BY 1),
         act AS (SELECT DISTINCT {user_col} AS u,
                        CAST(date_trunc('week', {ts_col}) AS DATE) AS week
                 FROM {table}),
         j AS (SELECT cohort,
                      CAST(datediff('day', cohort, week) / 7 AS INTEGER)
                          AS weeks_since
               FROM act JOIN first USING (u))
    SELECT cohort AS cohort_week, weeks_since, count(*) AS users
    FROM j {bound}GROUP BY 1, 2
    """
