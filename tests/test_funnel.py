"""Funnel analysis: ordered-step semantics, horizon, oracle parity."""

import duckdb
import pytest

SF_DIR = "/root/testdata/sf0.01"


def test_funnel_ordered_semantics(spark):
    """A later-step event BEFORE the earlier step must not count; ties
    at the same timestamp DO count; stalling at step k nulls k+1 on."""
    from lakehouse.funnel import funnel_times

    ev = spark.createDataFrame(
        [
            # u1: clean A(1) -> B(5) -> C(9)
            ("u1", 1, "A"), ("u1", 5, "B"), ("u1", 9, "C"),
            # u2: B before A only -> stalls at A
            ("u2", 1, "B"), ("u2", 4, "A"),
            # u3: A and B at the SAME ts -> tie counts, no C
            ("u3", 7, "A"), ("u3", 7, "B"),
            # u4: never does A -> no row at all
            ("u4", 2, "B"), ("u4", 3, "C"),
        ],
        "user_id string, ts int, event_type string",
    )
    got = {
        r.user: (r.t1, r.t2, r.t3)
        for r in funnel_times(ev, ["A", "B", "C"]).collect()
    }
    assert got == {
        "u1": (1, 5, 9),
        "u2": (4, None, None),
        "u3": (7, 7, None),
    }


def test_funnel_within_horizon(spark):
    from lakehouse.funnel import funnel_times

    ev = spark.createDataFrame(
        [("u1", 0, "A"), ("u1", 10, "B"), ("u2", 0, "A"), ("u2", 3, "B")],
        "user_id string, ts int, event_type string",
    )
    got = {
        r.user: r.t2
        for r in funnel_times(ev, ["A", "B"], within=5.0).collect()
    }
    assert got == {"u1": None, "u2": 3}


def test_funnel_report_matches_oracle(spark):
    from lakehouse.funnel import funnel_oracle_sql, funnel_report

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    steps = ["view", "click", "purchase"]
    got = sorted(
        tuple(r) for r in funnel_report(ev, steps, within=86400.0).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/events.parquet')"
    )
    want = sorted(
        tuple(r)
        for r in con.execute(
            funnel_oracle_sql(steps, within=86400.0)
        ).fetchall()
    )
    assert got == want
    con.close()


def test_funnel_rejects_single_step(spark):
    from lakehouse.funnel import funnel_times

    df = spark.createDataFrame([("u", 1, "A")], "user_id string, ts int, event_type string")
    with pytest.raises(ValueError):
        funnel_times(df, ["A"])


def test_cohort_retention_matches_oracle_and_semantics(spark):
    from lakehouse.funnel import cohort_retention, cohort_retention_oracle_sql

    # semantics on a tiny planted frame: u1 first week W0, active W0+W2;
    # u2 first W1, active W1 only
    ev = spark.createDataFrame(
        [
            ("u1", "2024-01-01 10:00:00"), ("u1", "2024-01-02 10:00:00"),
            ("u1", "2024-01-16 10:00:00"),
            ("u2", "2024-01-09 10:00:00"),
        ],
        "user_id string, ts string",
    ).selectExpr("user_id", "CAST(ts AS TIMESTAMP) AS ts")
    got = sorted(
        (str(r.cohort_week), r.weeks_since, r.users)
        for r in cohort_retention(ev).collect()
    )
    assert got == [
        ("2024-01-01", 0, 1),
        ("2024-01-01", 2, 1),
        ("2024-01-08", 0, 1),
    ]

    ev2 = spark.read.parquet(f"{SF_DIR}/events.parquet")
    got2 = sorted(
        (str(r.cohort_week), r.weeks_since, r.users)
        for r in cohort_retention(ev2, max_periods=8).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/events.parquet')"
    )
    want = sorted(
        (str(r[0]), r[1], r[2])
        for r in con.execute(
            cohort_retention_oracle_sql(max_periods=8)
        ).fetchall()
    )
    assert got2 == want
    con.close()
