"""Event-time operators: windowed rollup + sessionization, batch ↔
streaming parity and DuckDB-oracle agreement.

The streaming paths run through a REAL file-source stream with a shared
checkpoint (`drive_batches`), one micro-batch per run, so watermark
advancement and event-time timeouts behave exactly as in production
restarts — not a mocked MemoryStream.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from pyspark.sql import functions as F

from lakehouse.streaming_agg import (
    drive_batches,
    sessionize_batch,
    sessionize_oracle_sql,
    sessionize_stream,
    windowed_rollup,
    windowed_rollup_oracle_sql,
)


BASE = 3600  # keep event times off epoch 0: Spark's pre-stateful late-row
# filter is STRICT (ts > watermark) and the initial watermark is 0, so an
# epoch-0 event would be dropped in the very first micro-batch.


def _events_pdf():
    """Deterministic per-key event timeline (seconds since BASE).

    key a: bursts at 0-40s, then 200-220s (gap 160s)
    key b: steady every 50s from 10s to 310s (gaps 50s, one session)
    """
    rows = []
    for s, v in [(0, 1.0), (20, 2.0), (40, 3.0), (200, 4.0), (220, 5.0)]:
        rows.append(("a", BASE + s, v))
    for i in range(7):
        rows.append(("b", BASE + 10 + 50 * i, 10.0 + i))
    return pd.DataFrame(
        {
            "user_id": [r[0] for r in rows],
            "ts": pd.to_datetime([r[1] for r in rows], unit="s"),
            "value": [r[2] for r in rows],
        }
    )


def _spark_events(spark):
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return spark.createDataFrame(_events_pdf())


def _sorted_rows(df, cols, order=None):
    return [
        tuple(r)
        for r in df.select(*cols).orderBy(*(order or cols)).collect()
    ]


COLS = ["user_id", "session_start_us", "session_end_us", "n", "total"]


# ---------------------------------------------------------------------------
# batch twins vs DuckDB oracle


def test_sessionize_batch_matches_duckdb(spark):
    df = _spark_events(spark)
    got = _sorted_rows(
        sessionize_batch(df, key_col="user_id", gap_s=100), COLS
    )
    con = duckdb.connect()
    con.register("events", _events_pdf())
    want = [
        tuple(r)
        for r in con.sql(
            sessionize_oracle_sql(gap_s=100)
            + " ORDER BY user_id, session_start_us"
        ).fetchall()
    ]
    assert got == want
    # shape sanity: a's 100s gap splits it; b's 50s gaps do not
    a_sessions = [r for r in got if r[0] == "a"]
    b_sessions = [r for r in got if r[0] == "b"]
    assert len(a_sessions) == 2 and len(b_sessions) == 1
    assert a_sessions[0][3] == 3 and a_sessions[1][3] == 2
    assert b_sessions[0][3] == 7


def test_windowed_rollup_batch_matches_duckdb(spark):
    df = _spark_events(spark)
    roll_cols = ["window_start_us", "window_end_us", "user_id", "n", "total"]
    got = _sorted_rows(
        windowed_rollup(
            df, key_col="user_id", window="60 seconds", sum_col="value"
        ),
        roll_cols,
        order=["window_start_us", "user_id"],
    )
    con = duckdb.connect()
    con.register("events", _events_pdf())
    want = [
        tuple(r)
        for r in con.sql(
            windowed_rollup_oracle_sql(key_col="user_id", window_s=60)
            + " ORDER BY 1, 3"
        ).fetchall()
    ]
    assert got == want


# ---------------------------------------------------------------------------
# streaming parity (watermarks, event-time timeouts, late-row drops)


def _split_batches(spark, pdf, cut_points, flush_s=100_000):
    """Time-ordered micro-batches split at `cut_points` seconds, plus a
    far-future flush row that drives the watermark past every session
    and window so append-mode results finalize."""
    batches = []
    lo = -1
    for hi in list(cut_points) + [10**9]:
        part = pdf[(pdf.ts.astype("int64") // 10**9 > lo)
                   & (pdf.ts.astype("int64") // 10**9 <= hi)]
        if len(part):
            batches.append(spark.createDataFrame(part))
        lo = hi
    flush = pd.DataFrame(
        {
            "user_id": ["zz_flush"],
            "ts": pd.to_datetime([flush_s], unit="s"),
            "value": [0.0],
        }
    )
    batches.append(spark.createDataFrame(flush))
    return batches


def test_sessionize_stream_matches_batch(spark):
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    pdf = _events_pdf()
    batches = _split_batches(spark, pdf, [BASE + 40, BASE + 150])
    got = drive_batches(
        spark,
        lambda s: sessionize_stream(
            s, key_col="user_id", gap_s=100, watermark="30 seconds"
        ),
        batches,
    )
    want = sessionize_batch(
        _spark_events(spark), key_col="user_id", gap_s=100
    )
    got_rows = [t for t in _sorted_rows(got, COLS) if t[0] != "zz_flush"]
    assert got_rows == _sorted_rows(want, COLS)


def test_windowed_rollup_stream_matches_batch(spark):
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    pdf = _events_pdf()
    batches = _split_batches(spark, pdf, [BASE + 40, BASE + 150])
    out_cols = ["window_start_us", "user_id", "n", "total"]
    got = drive_batches(
        spark,
        lambda s: windowed_rollup(
            s,
            key_col="user_id",
            window="60 seconds",
            watermark="30 seconds",
            sum_col="value",
        ),
        batches,
    )
    want = windowed_rollup(
        _spark_events(spark), key_col="user_id", window="60 seconds"
    )
    got_rows = [
        t for t in _sorted_rows(got, out_cols) if t[1] != "zz_flush"
    ]
    assert got_rows == _sorted_rows(want, out_cols)


def test_stream_drops_late_rows(spark):
    """A row older than the watermark at arrival time is dropped by the
    stateful operator — the batch twin over the surviving rows is the
    reference result."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    pdf = _events_pdf()
    on_time = _split_batches(spark, pdf, [BASE + 150])
    late = pd.DataFrame(
        {
            "user_id": ["a"],
            "ts": pd.to_datetime([BASE + 5], unit="s"),  # watermark long past
            "value": [99.0],
        }
    )
    # inject the late row after the second real batch, before the flush
    batches = on_time[:-1] + [spark.createDataFrame(late)] + on_time[-1:]
    got = drive_batches(
        spark,
        lambda s: sessionize_stream(
            s, key_col="user_id", gap_s=100, watermark="30 seconds"
        ),
        batches,
    )
    want = sessionize_batch(
        _spark_events(spark), key_col="user_id", gap_s=100
    )
    got_rows = [t for t in _sorted_rows(got, COLS) if t[0] != "zz_flush"]
    assert got_rows == _sorted_rows(want, COLS)  # late 99.0 not counted
    assert not any(abs(t[4] - 99.0) < 1e-9 for t in got_rows)


def test_sessionize_stream_out_of_order_within_gap(spark):
    """Cross-batch out-of-order rows above the watermark merge into the
    open session (extending its start backward when needed)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")

    def b(rows):
        return spark.createDataFrame(
            pd.DataFrame(
                {
                    "user_id": [r[0] for r in rows],
                    "ts": pd.to_datetime([r[1] for r in rows], unit="s"),
                    "value": [float(r[2]) for r in rows],
                }
            )
        )

    batches = [
        b([("a", 50, 1.0)]),
        b([("a", 30, 2.0)]),  # older than open start, within gap, on time
        b([("zz_flush", 100_000, 0.0)]),
    ]
    got = drive_batches(
        spark,
        lambda s: sessionize_stream(
            s, key_col="user_id", gap_s=100, watermark="600 seconds"
        ),
        batches,
    )
    rows = [t for t in _sorted_rows(got, COLS) if t[0] == "a"]
    assert rows == [("a", 30_000_000, 50_000_000, 2, 3.0)]


def test_stream_rollup_into_lakehouse_table(spark, tmp_path):
    """The full silver pipeline: file-source stream → watermarked
    windowed rollup → idempotent MERGE upsert into a lakehouse TABLE
    (composite window+key merge key). After the stream drains, the
    table must equal the batch rollup over the same rows — streaming,
    event-time aggregation, and the ACID table layer composed
    end-to-end."""
    import tempfile

    from pyspark.sql import functions as F

    from lakehouse import Table
    from lakehouse.streaming import upsert_batch

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    pdf = _events_pdf()
    batches = _split_batches(spark, pdf, [BASE + 40, BASE + 150])

    def transform(s):
        return windowed_rollup(
            s,
            key_col="user_id",
            window="60 seconds",
            watermark="30 seconds",
            sum_col="value",
        ).withColumn(
            "rollup_key",
            F.concat_ws("|", F.col("window_start_us"), F.col("user_id")),
        )

    probe = transform(
        spark.readStream.schema(batches[0].schema).parquet(
            tempfile.mkdtemp(prefix="lh_probe_")
        )
    )
    t = Table.create(spark, str(tmp_path / "silver"), probe.schema)
    sink = upsert_batch(t, key="rollup_key")

    src = tempfile.mkdtemp(prefix="lh_silver_src_")
    ckpt = tempfile.mkdtemp(prefix="lh_silver_ckpt_")
    for b in batches:
        b.coalesce(1).write.mode("append").parquet(src)
        q = (
            transform(spark.readStream.schema(batches[0].schema).parquet(src))
            .writeStream.outputMode("append")
            .option("checkpointLocation", ckpt)
            .foreachBatch(sink)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    out_cols = ["window_start_us", "user_id", "n", "total"]
    got = [
        t2
        for t2 in _sorted_rows(t.scan(), out_cols)
        if t2[1] != "zz_flush"
    ]
    want = windowed_rollup(
        _spark_events(spark), key_col="user_id", window="60 seconds"
    )
    assert got == _sorted_rows(want, out_cols)
    # every micro-batch landed as its own idempotent merge commit
    from lakehouse.streaming import committed_batch_ids

    assert len(committed_batch_ids(t)) >= len(batches) - 1


def test_sliding_rollup_batch_matches_duckdb(spark):
    from lakehouse.streaming_agg import (
        sliding_rollup,
        sliding_rollup_oracle_sql,
    )

    df = _spark_events(spark)
    roll_cols = ["window_start_us", "window_end_us", "user_id", "n", "total"]
    got = _sorted_rows(
        sliding_rollup(
            df, key_col="user_id", window="60 seconds", slide="20 seconds",
            sum_col="value",
        ),
        roll_cols,
        order=["window_start_us", "user_id"],
    )
    con = duckdb.connect()
    con.register("events", _events_pdf())
    want = [
        tuple(r)
        for r in con.sql(
            sliding_rollup_oracle_sql(
                key_col="user_id", window_s=60, slide_s=20
            )
            + " ORDER BY 1, 3"
        ).fetchall()
    ]
    assert got == want
    # every event lands in exactly window/slide = 3 windows
    assert sum(t[3] for t in got) == 3 * len(_events_pdf())
    with pytest.raises(ValueError):
        sliding_rollup(df, window="60 seconds", slide="25 seconds")


def test_sliding_rollup_stream_matches_batch(spark):
    from lakehouse.streaming_agg import sliding_rollup

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    pdf = _events_pdf()
    batches = _split_batches(spark, pdf, [BASE + 40, BASE + 150])
    out_cols = ["window_start_us", "window_end_us", "user_id", "n", "total"]
    got = drive_batches(
        spark,
        lambda s: sliding_rollup(
            s,
            key_col="user_id",
            window="60 seconds",
            slide="20 seconds",
            watermark="30 seconds",
            sum_col="value",
        ),
        batches,
    )
    want = sliding_rollup(
        _spark_events(spark), key_col="user_id", window="60 seconds",
        slide="20 seconds",
    )
    got_rows = [
        t for t in _sorted_rows(got, out_cols) if t[2] != "zz_flush"
    ]
    assert got_rows == _sorted_rows(want, out_cols)


def _ij_events(spark):
    """view/purchase pairs for the interval join: user 1 has purchases
    at +30 s and +4000 s of a view (only the first within 3600 s); user
    2's purchase precedes their view (never matches)."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, t0, 1, "view"),
        (2, t0 + dt.timedelta(seconds=30), 1, "purchase"),
        (3, t0 + dt.timedelta(seconds=4000), 1, "purchase"),
        (4, t0 + dt.timedelta(seconds=4100), 1, "view"),
        (5, t0 + dt.timedelta(seconds=100), 2, "purchase"),
        (6, t0 + dt.timedelta(seconds=200), 2, "view"),
    ]
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )


def test_interval_join_batch_semantics_and_duckdb(spark):
    from lakehouse.streaming_agg import (
        interval_join,
        interval_join_oracle_sql,
    )

    ev = _ij_events(spark)
    got = sorted(
        (r.key, r.left_id, r.right_id)
        for r in interval_join(ev, within=3600.0).collect()
    )
    # view@0 matches purchase@30 only (purchase@4000 is out of window
    # for view@0 but IN window at-or-after view@4100? no — 4000 < 4100,
    # a right before the left never matches); user 2 inverted -> none
    assert got == [(1, 1, 2)]
    con = duckdb.connect()
    con.register("events", ev.toPandas())
    want = sorted(
        (r[0], r[1], r[2])
        for r in con.sql(interval_join_oracle_sql(within=3600.0)).fetchall()
    )
    assert got == want


def test_interval_join_stream_matches_batch(spark):
    import datetime as dt

    from lakehouse.streaming_agg import interval_join

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = _ij_events(spark)
    cut = dt.datetime(2024, 1, 1) + dt.timedelta(seconds=150)
    flush = spark.sql(
        "SELECT CAST(-1 AS BIGINT) AS event_id, "
        "TIMESTAMP '2025-01-01' AS ts, CAST(-1 AS BIGINT) AS user_id, "
        "'zz_flush' AS event_type"
    )
    batches = [ev.filter(ev.ts < cut), ev.filter(ev.ts >= cut), flush]
    got = drive_batches(
        spark,
        lambda s: interval_join(s, within=3600.0, watermark="3600 seconds"),
        batches,
    )
    cols = ["key", "left_id", "right_id", "left_ts_us", "right_ts_us"]
    g = sorted(tuple(r) for r in got.select(*cols).collect())
    w = sorted(
        tuple(r)
        for r in interval_join(ev, within=3600.0).select(*cols).collect()
    )
    assert g == w and len(g) == 1


def test_interval_join_left_outer_batch_and_stream(spark):
    import datetime as dt

    from lakehouse.streaming_agg import interval_join

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = _ij_events(spark)
    batch = interval_join(ev, within=3600.0, how="left_outer")
    rows = sorted(
        ((r.key, r.left_id, r.right_id) for r in batch.collect()), key=repr
    )
    # view@0 matches purchase@30; view@4100 and user 2's view have no
    # match in-window -> NULL right
    assert rows == sorted(
        [(1, 1, 2), (1, 4, None), (2, 6, None)], key=repr
    )

    cut = dt.datetime(2024, 1, 1) + dt.timedelta(seconds=150)
    # the flush must carry an IN-TYPE row: the type filters push below
    # the shared watermark node, so an off-type sentinel is never read
    # and the watermark stalls. A far-future right-typed row advances
    # the watermark and can match nothing (too late for every left).
    # Two flushes: eviction emits NULL rows on the trigger AFTER the
    # watermark advancement lands in the checkpoint.
    def _flush(eid):
        return spark.sql(
            f"SELECT CAST({eid} AS BIGINT) AS event_id, "
            "TIMESTAMP '2025-01-01' AS ts, CAST(-1 AS BIGINT) AS user_id, "
            "'purchase' AS event_type"
        )
    batches = [
        ev.filter(ev.ts < cut),
        ev.filter(ev.ts >= cut),
        _flush(-1),
        _flush(-2),
    ]
    got = drive_batches(
        spark,
        lambda s: interval_join(
            s, within=3600.0, watermark="3600 seconds", how="left_outer"
        ),
        batches,
    )
    cols = ["key", "left_id", "right_id", "left_ts_us", "right_ts_us"]
    g = sorted((tuple(r) for r in got.select(*cols).collect()), key=repr)
    w = sorted((tuple(r) for r in batch.select(*cols).collect()), key=repr)
    assert g == w and len(g) == 3
    with pytest.raises(ValueError):
        interval_join(ev, how="full_outer")
