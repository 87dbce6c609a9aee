"""Event-time operators: watermarked windowed rollup + gap sessionization.

The reference's Spark job is stamp-and-append — it derives ``event_ts``
(/root/reference/etl/glue_stream.py:213-219) and partitions by its date
(:239, :346) but defers every aggregation to Athena reads over the Delta
table. An engine that ingests continuously needs the silver-layer
event-time operators Structured Streaming was built for:

- ``windowed_rollup`` — tumbling-window aggregate that tolerates late
  data via watermarks. ONE transformation valid in both batch and
  streaming mode (the watermark is attached only on streaming frames),
  so the streaming result is verifiable against the batch twin on the
  same rows.
- ``sessionize_batch`` / ``sessionize_stream`` — gap-based session
  assembly over per-key event streams. Both share one session
  definition (a new session starts when the gap since the key's
  previous event exceeds ``gap_s``), so the stateful streaming operator
  (``applyInPandasWithState`` + event-time timeout) is checkable
  row-for-row against the batch lag/cumsum twin, which itself has a
  DuckDB-oracle SQL form (``sessionize_oracle_sql``).

Scale notes (100 TB shape):
- the rollup is a single hash aggregate keyed on (window, key) — partial
  map-side combine, one shuffle, bounded state (watermark evicts).
- batch sessionization is one shuffle (partitionBy key) + a sort within
  key partitions; no driver materialization.
- streaming sessionization keeps ONE open session per key in the state
  store (4 fixed-width fields), evicted by event-time timeout — state
  is O(live keys), not O(events). Rows cross into Python once per
  micro-batch as Arrow batches (pandas), never per-row.
"""

from __future__ import annotations

from typing import Iterator, Optional, Tuple

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# ---------------------------------------------------------------------------
# windowed rollup (batch + streaming, one code path)


def windowed_rollup(
    df: DataFrame,
    *,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window: str = "60 seconds",
    watermark: str = "120 seconds",
    sum_col: Optional[str] = "value",
) -> DataFrame:
    """Tumbling event-time window × key → (n, total).

    On a streaming frame the watermark bounds state and defines the
    late-data cutoff (rows older than the watermark are dropped by the
    aggregation, finalized windows emit exactly once in append mode).
    On a batch frame the same expression tree runs as a plain hash
    aggregate, which makes it the oracle twin for the streaming run.
    Output timestamps are unix micros so results compare portably.
    """
    src = df.withWatermark(ts_col, watermark) if df.isStreaming else df
    total = (
        F.sum(F.col(sum_col).cast("decimal(18,4)")).cast("double")
        if sum_col
        else F.lit(None).cast("double")
    )
    return (
        src.groupBy(
            F.window(F.col(ts_col), window).alias("win"), F.col(key_col)
        )
        .agg(F.count(F.lit(1)).alias("n"), total.alias("total"))
        .select(
            F.unix_micros("win.start").alias("window_start_us"),
            F.unix_micros("win.end").alias("window_end_us"),
            key_col,
            "n",
            "total",
        )
    )


def windowed_rollup_oracle_sql(
    *,
    table: str = "events",
    ts_col: str = "ts",
    key_col: str = "event_type",
    window_s: int = 60,
    sum_col: str = "value",
) -> str:
    """DuckDB twin. Spark's tumbling ``window(ts, N seconds)`` start is
    ts floored to a multiple of N since the epoch — expressed portably
    as integer arithmetic on epoch micros."""
    w_us = window_s * 1_000_000
    return f"""
        SELECT (epoch_us({ts_col}) // {w_us}) * {w_us} AS window_start_us,
               (epoch_us({ts_col}) // {w_us}) * {w_us} + {w_us} AS window_end_us,
               {key_col},
               count(*) AS n,
               CAST(SUM(CAST({sum_col} AS DECIMAL(18,4))) AS DOUBLE) AS total
        FROM {table} GROUP BY 1, 2, 3
    """


def sliding_rollup(
    df: DataFrame,
    *,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window: str = "60 seconds",
    slide: str = "15 seconds",
    watermark: str = "120 seconds",
    sum_col: Optional[str] = "value",
) -> DataFrame:
    """Sliding (hopping) event-time window × key → (n, total) — the
    moving-average view the tumbling rollup can't serve (each event
    lands in ``window/slide`` overlapping windows). Same one-code-path
    contract as :func:`windowed_rollup`: the watermark is attached only
    on streaming frames, so the batch run of the SAME expression tree
    is the streaming run's oracle.

    ``window`` must be an exact multiple of ``slide`` (that is also
    what keeps the DuckDB twin a closed-form generate_series replicate
    — every event is in exactly ``window/slide`` windows).

    Scale shape: Spark's native ``F.window(ts, window, slide)`` expands
    each row to its ``window/slide`` window assignments BEFORE the one
    hash-aggregate shuffle (map-side combine still applies); streaming
    state is bounded by the watermark exactly as in the tumbling case.
    """

    def _secs(s: str) -> int:
        n, unit = s.split()
        if not unit.startswith("second"):
            raise ValueError("windows are specified in seconds")
        return int(n)

    w_s, s_s = _secs(window), _secs(slide)
    if w_s % s_s != 0:
        raise ValueError("window must be a multiple of slide")
    src = df.withWatermark(ts_col, watermark) if df.isStreaming else df
    total = (
        F.sum(F.col(sum_col).cast("decimal(18,4)")).cast("double")
        if sum_col
        else F.lit(None).cast("double")
    )
    return (
        src.groupBy(
            F.window(F.col(ts_col), window, slide).alias("win"),
            F.col(key_col),
        )
        .agg(F.count(F.lit(1)).alias("n"), total.alias("total"))
        .select(
            F.unix_micros("win.start").alias("window_start_us"),
            F.unix_micros("win.end").alias("window_end_us"),
            key_col,
            "n",
            "total",
        )
    )


def sliding_rollup_oracle_sql(
    *,
    table: str = "events",
    ts_col: str = "ts",
    key_col: str = "event_type",
    window_s: int = 60,
    slide_s: int = 15,
    sum_col: str = "value",
) -> str:
    """DuckDB twin. Spark assigns an event at t to the
    ``window_s/slide_s`` windows whose starts are the slide multiples
    in ``(t − window, t]`` — replicated with a generate_series cross
    join on integer epoch-micros arithmetic (every event is in exactly
    m windows when window is a multiple of slide, so no filter)."""
    if window_s % slide_s != 0:
        raise ValueError("window must be a multiple of slide")
    m = window_s // slide_s
    w_us, s_us = window_s * 1_000_000, slide_s * 1_000_000
    return f"""
        SELECT ((epoch_us({ts_col}) // {s_us}) - g.i) * {s_us}
                   AS window_start_us,
               ((epoch_us({ts_col}) // {s_us}) - g.i) * {s_us} + {w_us}
                   AS window_end_us,
               {key_col},
               count(*) AS n,
               CAST(SUM(CAST({sum_col} AS DECIMAL(18,4))) AS DOUBLE) AS total
        FROM {table} CROSS JOIN generate_series(0, {m - 1}) AS g(i)
        GROUP BY 1, 2, 3
    """


def interval_join(
    df: DataFrame,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
    left_type: str = "view",
    right_type: str = "purchase",
    within: float = 3600.0,
    watermark: str = "3600 seconds",
    how: str = "inner",
) -> DataFrame:
    """Event-time interval join — every (left, right) pair of the same
    key with ``right.ts`` in ``[left.ts, left.ts + within]`` (the
    "purchase within an hour of the view" pairing). ONE code path:
    on a streaming frame both sides get watermarks and this is Spark's
    stream-stream join, so the batch self-join of the same expression
    tree is the streaming run's oracle.

    ``how="inner"``: matches emit as they occur (append-mode inner
    joins don't wait for the watermark; the watermark bounds the join
    STATE via the time-range condition). ``how="left_outer"``: a left
    row with no match additionally emits with NULL right columns — in
    streaming only once the watermark passes ``left.ts + within`` and
    the row's match window provably closed (the "views that never
    converted" feed), which is exactly Spark's outer-join
    watermark-eviction contract.

    Scale shape: one shuffle per side on the join key; streaming state
    holds only rows younger than ``watermark`` + ``within`` per side
    (evicted by the range condition) — O(recent events), not O(stream).
    Output timestamps are unix micros so results compare portably.
    """
    if how not in ("inner", "left_outer"):
        raise ValueError("how must be 'inner' or 'left_outer'")
    base = df.select(
        F.col(key_col).alias("key"),
        F.col(ts_col).alias("__ts"),
        F.col(type_col).alias("__et"),
        F.col(id_col).alias("__id"),
    )
    if df.isStreaming:
        # ONE watermark on the shared parent, BEFORE the type split:
        # rows of other types (e.g. a flush sentinel) still advance it,
        # and both join sides inherit the same event-time column tag —
        # per-side watermarks below the filters would stall on whichever
        # side sees events last (the min-of-watermarks rule)
        base = base.withWatermark("__ts", watermark)
    l = base.filter(F.col("__et") == left_type).select(
        "key",
        F.col("__ts").alias("l_ts"),
        F.col("__id").alias("left_id"),
    )
    r = base.filter(F.col("__et") == right_type).select(
        F.col("key").alias("r_key"),
        F.col("__ts").alias("r_ts"),
        F.col("__id").alias("right_id"),
    )
    cond = (
        (l["key"] == r["r_key"])
        & (r["r_ts"] >= l["l_ts"])
        & (
            r["r_ts"]
            <= l["l_ts"] + F.expr(f"INTERVAL {int(within)} SECONDS")
        )
    )
    return l.join(r, cond, how).select(
        "key",
        "left_id",
        "right_id",
        F.unix_micros("l_ts").alias("left_ts_us"),
        F.unix_micros("r_ts").alias("right_ts_us"),
    )


def interval_join_oracle_sql(
    *,
    table: str = "events",
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
    left_type: str = "view",
    right_type: str = "purchase",
    within: float = 3600.0,
    how: str = "inner",
) -> str:
    """DuckDB twin: the same pair predicate on epoch micros; type
    filters sit in pre-filtered subqueries so the outer form is exact
    (a WHERE on the right side would silently turn it back inner)."""
    if how not in ("inner", "left_outer"):
        raise ValueError("how must be 'inner' or 'left_outer'")
    q = lambda s: str(s).replace("'", "''")
    w_us = int(float(within) * 1_000_000)
    join_kw = "JOIN" if how == "inner" else "LEFT JOIN"
    return f"""
        SELECT l.{key_col} AS key,
               l.{id_col} AS left_id,
               r.{id_col} AS right_id,
               epoch_us(l.{ts_col}) AS left_ts_us,
               epoch_us(r.{ts_col}) AS right_ts_us
        FROM (SELECT * FROM {table}
              WHERE {type_col} = '{q(left_type)}') l
        {join_kw} (SELECT * FROM {table}
              WHERE {type_col} = '{q(right_type)}') r
          ON l.{key_col} = r.{key_col}
         AND epoch_us(r.{ts_col}) >= epoch_us(l.{ts_col})
         AND epoch_us(r.{ts_col}) <= epoch_us(l.{ts_col}) + {w_us}
    """


# ---------------------------------------------------------------------------
# sessionization — shared definition, batch twin


def sessionize_batch(
    df: DataFrame,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_s: int = 1800,
    sum_col: Optional[str] = "value",
) -> DataFrame:
    """Gap-based sessions: within a key, order by event time; a row more
    than ``gap_s`` after its predecessor starts a new session.

    Plan shape: one Exchange on ``key_col`` feeds BOTH window functions
    and the final aggregate (same partitioning reused — no second
    shuffle), with a per-partition sort. No Python boundary.
    """
    from pyspark.sql.window import Window

    gap_us = int(gap_s) * 1_000_000
    us = F.unix_micros(F.col(ts_col))
    w = Window.partitionBy(key_col).orderBy(us)
    new_s = F.when(
        F.coalesce(us - F.lag(us).over(w), F.lit(gap_us + 1)) > gap_us, 1
    ).otherwise(0)
    cum = Window.partitionBy(key_col).orderBy(us).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    total = (
        F.sum(F.col(sum_col).cast("decimal(18,4)")).cast("double")
        if sum_col
        else F.lit(None).cast("double")
    )
    return (
        df.withColumn("__us", us)
        .withColumn("__sess", F.sum(new_s).over(cum))
        .groupBy(key_col, "__sess")
        .agg(
            F.min("__us").alias("session_start_us"),
            F.max("__us").alias("session_end_us"),
            F.count(F.lit(1)).alias("n"),
            total.alias("total"),
        )
        .select(key_col, "session_start_us", "session_end_us", "n", "total")
    )


def sessionize_oracle_sql(
    *,
    table: str = "events",
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_s: int = 1800,
    sum_col: str = "value",
) -> str:
    """DuckDB twin of ``sessionize_batch`` (same lag/cumsum shape)."""
    gap_us = int(gap_s) * 1_000_000
    return f"""
        WITH e AS (
            SELECT {key_col} AS k, epoch_us({ts_col}) AS us,
                   {sum_col} AS v
            FROM {table}
        ), m AS (
            SELECT k, us, v,
                   CASE WHEN COALESCE(
                            us - lag(us) OVER (PARTITION BY k ORDER BY us),
                            {gap_us + 1}) > {gap_us}
                        THEN 1 ELSE 0 END AS new_s
            FROM e
        ), s AS (
            SELECT k, us, v,
                   SUM(new_s) OVER (PARTITION BY k ORDER BY us
                                    ROWS UNBOUNDED PRECEDING) AS sess
            FROM m
        )
        SELECT k AS {key_col},
               MIN(us) AS session_start_us,
               MAX(us) AS session_end_us,
               count(*) AS n,
               CAST(SUM(CAST(v AS DECIMAL(18,4))) AS DOUBLE) AS total
        FROM s GROUP BY k, sess
    """


# ---------------------------------------------------------------------------
# sessionization — stateful streaming twin


def sessionize_stream(
    stream: DataFrame,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_s: int = 1800,
    watermark: str = "120 seconds",
    sum_col: Optional[str] = "value",
) -> DataFrame:
    """Streaming sessions via ``applyInPandasWithState``.

    State per key = the one open session (start, last, n, total). A
    micro-batch's rows merge into it in event-time order; sessions whose
    gap closed inside the batch emit immediately; the trailing open
    session arms an event-time timeout at ``last + gap`` and emits when
    the watermark passes it (exactly-once, append mode). Rows older
    than the current watermark are dropped — the same late-data rule
    the windowed rollup gets from Spark's aggregation operator.
    """
    gap_us = int(gap_s) * 1_000_000
    out_schema = StructType(
        [
            StructField(key_col, StringType()),
            StructField("session_start_us", LongType()),
            StructField("session_end_us", LongType()),
            StructField("n", LongType()),
            StructField("total", DoubleType()),
        ]
    )
    # total is carried as integer ten-thousandths so the running sum is
    # EXACT and order-insensitive — bit-identical to the batch twin's
    # decimal(18,4) aggregation regardless of micro-batch arrival order.
    state_schema = StructType(
        [
            StructField("start_us", LongType()),
            StructField("last_us", LongType()),
            StructField("n", LongType()),
            StructField("total_1e4", LongType()),
        ]
    )

    def _emit(key: str, sess: Tuple[int, int, int, int]) -> pd.DataFrame:
        return pd.DataFrame(
            {
                key_col: [key],
                "session_start_us": [sess[0]],
                "session_end_us": [sess[1]],
                "n": [sess[2]],
                "total": [sess[3] / 10_000.0],
            }
        )

    def fn(
        key: Tuple[str], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        k = key[0]
        if state.hasTimedOut:
            # watermark passed last+gap: the open session is final
            sess = tuple(state.get)
            state.remove()
            yield _emit(k, sess)
            return
        wm_us = state.getCurrentWatermarkMs() * 1000
        parts = []
        for pdf in pdfs:
            us = pdf[ts_col].to_numpy().astype("datetime64[us]").astype("int64")
            vals = (
                pdf[sum_col].to_numpy().astype("float64")
                if sum_col
                else None
            )
            keep = us >= wm_us  # drop late rows (same rule as windowed agg)
            parts.append((us[keep], None if vals is None else vals[keep]))
        us_all = [u for us, _ in parts for u in us]
        if not us_all:
            return
        order = sorted(range(len(us_all)), key=us_all.__getitem__)
        vals_all = (
            [v for _, vs in parts for v in vs] if sum_col else None
        )
        if state.exists:
            start, last, n, total = state.get
        else:
            start, last, n, total = None, 0, 0, 0
        closed = []
        for i in order:
            u = int(us_all[i])
            v = (
                int(round(float(vals_all[i]) * 10_000))
                if vals_all is not None
                else 0
            )
            if start is None:
                start, last, n, total = u, u, 0, 0
            elif u - last > gap_us:
                closed.append((start, last, n, total))
                start, last, n, total = u, u, 0, 0
            elif u < start:
                # in-gap row older than the open session's start (cross-
                # batch out-of-order above the watermark): extend backward
                start = u
            n += 1
            total += v
            if u > last:
                last = u
        state.update((start, last, n, total))
        # fire when the event-time watermark passes the session gap
        state.setTimeoutTimestamp(last // 1000 + int(gap_s) * 1000 + 1)
        for sess in closed:
            yield _emit(k, sess)

    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(key_col)
        .applyInPandasWithState(
            fn,
            out_schema,
            state_schema,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )


# ---------------------------------------------------------------------------
# deterministic micro-batch driver (tests + self-verifying entry queries)


def drive_batches(
    spark: SparkSession,
    transform,
    batches: list,
    *,
    checkpoint_dir: Optional[str] = None,
) -> DataFrame:
    """Feed batch DataFrames through a real file-source stream, one
    micro-batch per query run (availableNow + shared checkpoint =
    deterministic replay of the production restart path), applying
    ``transform`` (streaming DataFrame → streaming DataFrame); returns
    every row emitted in append mode across all runs.

    Each run appends one batch's rows as new parquet files, starts the
    stream against the directory, and drains it; the checkpoint makes
    the next run see only the new files, so watermark advancement across
    micro-batches — the thing under test — behaves exactly as a live
    stream with restarts.
    """
    import tempfile

    src = tempfile.mkdtemp(prefix="lh_stream_src_")
    ckpt = checkpoint_dir or tempfile.mkdtemp(prefix="lh_stream_ckpt_")
    schema = batches[0].schema
    collected: list = []

    def sink(bdf: DataFrame, _bid: int) -> None:
        collected.extend(bdf.collect())

    for b in batches:
        b.coalesce(1).write.mode("append").parquet(src)
        q = (
            transform(spark.readStream.schema(schema).parquet(src))
            .writeStream.outputMode("append")
            .option("checkpointLocation", ckpt)
            .foreachBatch(sink)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    out_schema = transform(
        spark.readStream.schema(schema).parquet(src)
    ).schema
    return spark.createDataFrame(collected, out_schema)
