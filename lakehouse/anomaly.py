"""Event-rate anomaly detection — the ops-side "did the error rate
spike / did traffic fall off a cliff?" screen over the reference's
clickstream table (its monitoring chapter wires CloudWatch alarms on
infrastructure metrics, `README.md:319-329`; this is the DATA-side
alarm the table itself can answer).

Semantics: events bucket into fixed ``bucket_s``-second windows per
key (same epoch-micros floor arithmetic as the tumbling rollup); a
bucket is anomalous when its count's z-score against THAT KEY's other
buckets exceeds ``z_threshold``. The z is computed from the closed
form over integer power sums —

    mean = s/n,   var = (ss − s²/n)/(n−1),   z = (c − mean)/sqrt(var)

— so both engines derive it from exactly-represented integers
(cross-engine bit-deterministic before the final rounding; the engine
sums counts as DECIMAL so the int64 power sums can't overflow, and the
closed form is exact while s, ss < 2^53 — i.e. every corpus whose
per-key bucket counts aren't astronomically pathological). Keys with
fewer than ``min_buckets`` buckets or zero variance emit nothing
(a constant series has no anomalies by definition).

Scale shape: ONE corpus-scaled shuffle — the (key, bucket) count
aggregate; the per-key moment aggregate and the z projection act on
the already-aggregated frame (|keys| × |buckets| rows), and only
anomalous buckets are returned (bounded output, deterministic order).
Missing buckets (zero events) are NOT imputed — the screen measures
observed-bucket deviation; a fully silent key is a liveness question
for the ingest monitor, not a rate z-score.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def rate_anomalies(
    events: DataFrame,
    *,
    bucket_s: int = 3600,
    z_threshold: float = 3.0,
    min_buckets: int = 4,
    key_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Anomalous (key, bucket) rows: bucket start (unix micros), count,
    the key's mean/std over its buckets, and the z-score (4 decimals),
    ordered by (key, bucket)."""
    if bucket_s < 1 or min_buckets < 2:
        raise ValueError("bucket_s >= 1 and min_buckets >= 2 required")
    b_us = bucket_s * 1_000_000
    dt = events.schema[ts_col].dataType.typeName()
    tn = (
        F.unix_micros(F.col(ts_col).cast("timestamp"))
        if dt in ("timestamp", "timestamp_ntz")
        else (F.col(ts_col).cast("double") * 1_000_000).cast("long")
    )
    # integer modulo, not double division: (tn/b_us).cast(long) rounds
    # through a double and can misbucket a timestamp within an ulp of a
    # boundary; tn - tn % b_us is exact for the post-epoch domain
    per_bucket = events.groupBy(
        F.col(key_col).alias("key"),
        (tn - tn % F.lit(b_us)).alias("bucket_start_us"),
    ).agg(F.count(F.lit(1)).alias("n_events"))
    stats = per_bucket.groupBy("key").agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(F.col("n_events").cast("decimal(38,0)"))
        .cast("double")
        .alias("__s"),
        F.sum(
            (F.col("n_events") * F.col("n_events")).cast("decimal(38,0)")
        )
        .cast("double")
        .alias("__ss"),
    )
    from .stablemath import stable_round

    j = per_bucket.join(stats, "key")
    mean = F.col("__s") / F.col("__n")
    var = (F.col("__ss") - F.col("__s") * F.col("__s") / F.col("__n")) / (
        F.col("__n") - 1
    )
    z = (F.col("n_events") - mean) / F.sqrt(var)
    return (
        j.filter((F.col("__n") >= min_buckets) & (var > 0))
        .select(
            "key",
            "bucket_start_us",
            "n_events",
            stable_round(mean, 4).alias("mean_events"),
            stable_round(F.sqrt(var), 4).alias("std_events"),
            stable_round(z, 4).alias("z_score"),
        )
        .filter(F.abs(F.col("z_score")) >= z_threshold)
        .orderBy("key", "bucket_start_us")
    )


def rate_anomalies_oracle_sql(
    *,
    bucket_s: int = 3600,
    z_threshold: float = 3.0,
    min_buckets: int = 4,
    table: str = "events",
    key_col: str = "event_type",
    ts_col: str = "ts",
) -> str:
    """DuckDB twin: identical bucket floor, power sums and closed form,
    with the cross-engine-stable rounding (lakehouse/stablemath.py) —
    the z filter applies to the ROUNDED z exactly as the engine does,
    so a round tie could otherwise change row MEMBERSHIP, not just a
    hash."""
    from .stablemath import stable_round_sql as _r

    b_us = bucket_s * 1_000_000
    return f"""
        WITH pb AS (
          SELECT {key_col} AS key,
                 (epoch_us({ts_col}) // {b_us}) * {b_us}
                     AS bucket_start_us,
                 count(*) AS n_events
          FROM {table} GROUP BY 1, 2
        ), st AS (
          SELECT key, count(*) AS n,
                 CAST(SUM(n_events) AS DOUBLE) AS s,
                 CAST(SUM(n_events * n_events) AS DOUBLE) AS ss
          FROM pb GROUP BY 1
        ), z AS (
          SELECT pb.key, pb.bucket_start_us, pb.n_events,
                 {_r("s / n")} AS mean_events,
                 {_r("sqrt((ss - s * s / n) / (n - 1))")} AS std_events,
                 {_r("(pb.n_events - s / n) / sqrt((ss - s * s / n) / (n - 1))")} AS z_score
          FROM pb JOIN st USING (key)
          WHERE n >= {int(min_buckets)}
            AND (ss - s * s / n) / (n - 1) > 0
        )
        SELECT * FROM z WHERE abs(z_score) >= {float(z_threshold)}
        ORDER BY key, bucket_start_us
    """
