"""User-journey path analytics — next-event transition matrix and
top-k session paths (the "where do users go next / what do the common
journeys look like" asks of the reference's clickstream table;
`/root/reference/README.md:104,113,317` defers them to Athena/BI over
the bronze table — same operator gap as `lakehouse/funnel.py` and
`lakehouse/attribution.py`).

Scale shape: both operators cost exactly ONE corpus-scaled shuffle —
the per-user window sort on ``(micros, event_id)`` (fully
deterministic ordering; duplicate timestamps tie-break on id). After
that everything is bounded:

- ``event_transitions``: ``lead()`` pairs ride the window, then a
  group-by on ``(src, dst)`` whose cardinality is ``|event types|²``
  — tiny by construction; the per-src probability normalization is a
  window over that already-aggregated frame.
- ``top_paths``: only the first ``k_events`` rows per user survive the
  ``row_number`` filter, so the per-user ``collect_list`` is bounded
  at ``k_events`` structs (never a hot-user blowup); paths are counted
  with one more narrow shuffle and the top ``n_paths`` leave via
  ``orderBy(count DESC, path ASC).limit(n)`` — a deterministic,
  driver-bounded result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _micros(df: DataFrame, ts_col: str):
    dt = df.schema[ts_col].dataType.typeName()
    if dt in ("timestamp", "timestamp_ntz"):
        return F.unix_micros(F.col(ts_col).cast("timestamp"))
    return (F.col(ts_col).cast("double") * 1_000_000).cast("long")


def event_transitions(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """First-order Markov transition matrix: one row per observed
    ``(src_type, dst_type)`` adjacent-event pair across all users, with
    the count and the per-src transition probability (4 decimals; a
    user's last event emits no pair)."""
    w = Window.partitionBy(F.col(user_col)).orderBy(
        F.col("__tn"), F.col(id_col)
    )
    pairs = (
        events.select(
            F.col(user_col),
            _micros(events, ts_col).alias("__tn"),
            F.col(id_col),
            F.col(type_col).alias("src_type"),
        )
        .withColumn("dst_type", F.lead("src_type").over(w))
        .filter(F.col("dst_type").isNotNull())
        .groupBy("src_type", "dst_type")
        .agg(F.count(F.lit(1)).alias("transitions"))
    )
    from .stablemath import stable_round

    per_src = Window.partitionBy("src_type")
    return pairs.select(
        "src_type",
        "dst_type",
        "transitions",
        stable_round(
            F.col("transitions") / F.sum("transitions").over(per_src), 4
        ).alias("probability"),
    ).orderBy("src_type", "dst_type")


def transition_gaps(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """Dwell-time view of the transition matrix: per ``(src, dst)``
    adjacent pair, the count plus the mean and max gap in seconds
    ("how long do users stare at the cart before purchasing?"). Gaps
    are integer micros summed as DECIMAL (exact, order-insensitive)
    and divided once at the end, then stable-rounded
    (lakehouse/stablemath.py) — cross-engine bit-deterministic. Same
    one-shuffle scale shape as :func:`event_transitions`."""
    from .stablemath import stable_round
    w = Window.partitionBy(F.col(user_col)).orderBy(
        F.col("__tn"), F.col(id_col)
    )
    pairs = (
        events.select(
            F.col(user_col),
            _micros(events, ts_col).alias("__tn"),
            F.col(id_col),
            F.col(type_col).alias("src_type"),
        )
        .withColumn("dst_type", F.lead("src_type").over(w))
        .withColumn("__gap", F.lead("__tn").over(w) - F.col("__tn"))
        .filter(F.col("dst_type").isNotNull())
    )
    return (
        pairs.groupBy("src_type", "dst_type")
        .agg(
            F.count(F.lit(1)).alias("transitions"),
            F.sum(F.col("__gap").cast("decimal(38,0)")).alias("__sum"),
            F.max("__gap").alias("__max"),
        )
        .select(
            "src_type",
            "dst_type",
            "transitions",
            stable_round(
                F.col("__sum").cast("double")
                / F.col("transitions")
                / 1_000_000,
                4,
            ).alias("avg_gap_s"),
            stable_round(F.col("__max") / 1_000_000, 4).alias(
                "max_gap_s"
            ),
        )
        .orderBy("src_type", "dst_type")
    )


def transition_gaps_oracle_sql(
    *,
    table: str = "events",
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> str:
    """DuckDB twin: identical lead() gaps and decimal-sum arithmetic."""
    from .stablemath import stable_round_sql as _r

    return f"""
        WITH p AS (
          SELECT {type_col} AS src_type,
                 lead({type_col}) OVER w AS dst_type,
                 lead(epoch_us({ts_col})) OVER w
                     - epoch_us({ts_col}) AS gap
          FROM {table}
          WINDOW w AS (PARTITION BY {user_col}
                       ORDER BY epoch_us({ts_col}), {id_col})
        )
        SELECT src_type, dst_type,
               count(*) AS transitions,
               {_r("CAST(SUM(CAST(gap AS DECIMAL(38,0))) AS DOUBLE) / count(*) / 1000000")} AS avg_gap_s,
               {_r("max(gap) / 1000000")} AS max_gap_s
        FROM p WHERE dst_type IS NOT NULL
        GROUP BY 1, 2 ORDER BY 1, 2
    """


def transitions_oracle_sql(
    *,
    table: str = "events",
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> str:
    """DuckDB twin: identical lead() pairing and normalization."""
    from .stablemath import stable_round_sql as _r

    return f"""
        WITH p AS (
          SELECT {type_col} AS src_type,
                 lead({type_col}) OVER (
                   PARTITION BY {user_col}
                   ORDER BY epoch_us({ts_col}), {id_col}
                 ) AS dst_type
          FROM {table}
        ), c AS (
          SELECT src_type, dst_type, count(*) AS transitions
          FROM p WHERE dst_type IS NOT NULL GROUP BY 1, 2
        )
        SELECT src_type, dst_type, transitions,
               {_r("transitions * 1.0 / SUM(transitions) OVER (PARTITION BY src_type)")} AS probability
        FROM c ORDER BY src_type, dst_type
    """


def top_paths(
    events: DataFrame,
    *,
    k_events: int = 5,
    n_paths: int = 20,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
    sep: str = ">",
) -> DataFrame:
    """The ``n_paths`` most common journeys, where a user's journey is
    their first ``k_events`` event types joined with ``sep`` in
    ``(ts, id)`` order. Deterministic top-n: ties broken by path
    string ascending."""
    if k_events < 1 or n_paths < 1:
        raise ValueError("k_events and n_paths must be >= 1")
    if "'" in sep or "\\" in sep:
        raise ValueError("sep must not contain quotes or backslashes")
    w = Window.partitionBy(F.col("__u")).orderBy(
        F.col("__tn"), F.col("__id")
    )
    per_user = (
        events.select(
            F.col(user_col).alias("__u"),
            _micros(events, ts_col).alias("__tn"),
            F.col(id_col).alias("__id"),
            F.col(type_col).alias("__et"),
        )
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k_events)
        .groupBy("__u")
        .agg(
            F.expr(
                "array_join(transform(array_sort("
                "collect_list(struct(__rn, __et))), s -> s.__et), "
                f"'{sep}') AS path"
            )
        )
    )
    return (
        per_user.groupBy("path")
        .agg(F.count(F.lit(1)).alias("users"))
        .orderBy(F.col("users").desc(), F.col("path"))
        .limit(n_paths)
    )


def top_paths_oracle_sql(
    *,
    k_events: int = 5,
    n_paths: int = 20,
    table: str = "events",
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
    sep: str = ">",
) -> str:
    """DuckDB twin: identical row_number bound and ordered string_agg."""
    if "'" in sep or "\\" in sep:
        raise ValueError("sep must not contain quotes or backslashes")
    return f"""
        WITH b AS (
          SELECT {user_col} AS u, {type_col} AS et,
                 row_number() OVER (
                   PARTITION BY {user_col}
                   ORDER BY epoch_us({ts_col}), {id_col}
                 ) AS rn
          FROM {table}
        ), p AS (
          SELECT u, string_agg(et, '{sep}' ORDER BY rn) AS path
          FROM b WHERE rn <= {int(k_events)} GROUP BY u
        )
        SELECT path, count(*) AS users
        FROM p GROUP BY path
        ORDER BY users DESC, path LIMIT {int(n_paths)}
    """
