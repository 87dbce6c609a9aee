"""Attribution + journey-path operators (lakehouse/attribution.py,
lakehouse/paths.py) against hand-computed fixtures. The DuckDB oracle
parity is gated separately by the registry twins (check_entry.py);
these tests pin the SEMANTICS on frames small enough to verify by eye:
lookback exclusion, at-conversion-timestamp ties, (none) conservation,
linear fractional shares, per-user ordering tie-breaks."""

from __future__ import annotations

import datetime as dt

import pytest

from lakehouse.attribution import attribution_report
from lakehouse.paths import event_transitions, top_paths

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ev(spark, rows):
    return spark.createDataFrame(
        [
            (i, T0 + dt.timedelta(seconds=s), u, et, v)
            for i, (s, u, et, v) in enumerate(rows)
        ],
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double",
    )


@pytest.fixture(scope="module")
def journey(spark):
    # user 1: view@0, click@10, purchase@20 (v=100), signup@30,
    #         purchase@30 (v=50; signup ties the purchase timestamp)
    # user 2: purchase@5 (v=7) with no touches at all
    # user 3: view@0, purchase@100000 (v=1) — outside a 1000 s lookback
    return _ev(
        spark,
        [
            (0, 1, "view", 1.0),
            (10, 1, "click", 1.0),
            (20, 1, "purchase", 100.0),
            (30, 1, "signup", 1.0),
            (30, 1, "purchase", 50.0),
            (5, 2, "purchase", 7.0),
            (0, 3, "view", 1.0),
            (100000, 3, "purchase", 1.0),
        ],
    )


TOUCHES = ["view", "click", "signup"]


def _by_channel(df):
    return {r.channel: (r.conversions, r.value) for r in df.collect()}


def test_last_touch_ties_and_none(spark, journey):
    got = _by_channel(
        attribution_report(journey, TOUCHES, "purchase", model="last_touch")
    )
    # purchase@20 -> click@10; purchase@30 -> signup@30 (tie counts);
    # user 2 -> (none); user 3 -> view (unbounded lookback)
    assert got == {
        "click": (1.0, 100.0),
        "signup": (1.0, 50.0),
        "view": (1.0, 1.0),
        "(none)": (1.0, 7.0),
    }


def test_first_touch(spark, journey):
    got = _by_channel(
        attribution_report(journey, TOUCHES, "purchase", model="first_touch")
    )
    # both of user 1's purchases first-touch to view@0
    assert got == {"view": (3.0, 151.0), "(none)": (1.0, 7.0)}


def test_lookback_excludes_stale_touch(spark, journey):
    got = _by_channel(
        attribution_report(
            journey, TOUCHES, "purchase", model="last_touch", lookback=1000.0
        )
    )
    # user 3's view@0 is 100000 s before the purchase -> (none)
    assert got["(none)"] == (2.0, 8.0)
    assert "view" not in got


def test_linear_shares(spark, journey):
    got = _by_channel(
        attribution_report(journey, TOUCHES, "purchase", model="linear")
    )
    # purchase@20: {view, click} -> 0.5 each of 1 conv / 100 value
    # purchase@30: {view, click, signup} -> 1/3 each of 1 conv / 50
    # user 3: view alone -> 1.0 of 1 conv / 1 value
    want = {
        "click": (0.5 + 1 / 3, 50.0 + 50 / 3),
        "signup": (1 / 3, 50 / 3),
        "view": (1.5 + 1 / 3, 51.0 + 50 / 3),
        "(none)": (1.0, 7.0),
    }
    assert set(got) == set(want)
    for ch, (conv, val) in want.items():
        assert got[ch][0] == pytest.approx(conv, abs=1e-5), ch
        assert got[ch][1] == pytest.approx(val, abs=1e-5), ch
    # conversion mass is conserved across channels
    assert sum(v[0] for v in got.values()) == pytest.approx(4.0, abs=1e-5)


def test_attribution_rejects_bad_args(spark, journey):
    with pytest.raises(ValueError):
        attribution_report(journey, TOUCHES, "purchase", model="shapley")
    with pytest.raises(ValueError):
        attribution_report(journey, ["view", "purchase"], "purchase")
    with pytest.raises(ValueError):
        attribution_report(journey, [], "purchase")
    with pytest.raises(ValueError):
        attribution_report(journey, ["a|b"], "purchase")


def test_event_transitions(spark):
    ev = _ev(
        spark,
        [
            (0, 1, "a", 0.0),
            (1, 1, "b", 0.0),
            (2, 1, "a", 0.0),
            (3, 1, "c", 0.0),
            (0, 2, "a", 0.0),
            (1, 2, "b", 0.0),
        ],
    )
    got = {
        (r.src_type, r.dst_type): (r.transitions, float(r.probability))
        for r in event_transitions(ev).collect()
    }
    # a->b twice, a->c once (p=2/3, 1/3); b->a once (p=1.0); last
    # events emit nothing
    assert got == {
        ("a", "b"): (2, 0.6667),
        ("a", "c"): (1, 0.3333),
        ("b", "a"): (1, 1.0),
    }


def test_transitions_same_timestamp_tie_breaks_on_id(spark):
    # two events at the SAME timestamp: order must follow event_id
    ev = _ev(spark, [(0, 1, "x", 0.0), (0, 1, "y", 0.0)])
    got = [
        (r.src_type, r.dst_type) for r in event_transitions(ev).collect()
    ]
    assert got == [("x", "y")]


def test_top_paths(spark):
    ev = _ev(
        spark,
        [
            (0, 1, "a", 0.0),
            (1, 1, "b", 0.0),
            (0, 2, "a", 0.0),
            (1, 2, "b", 0.0),
            (0, 3, "a", 0.0),
            (1, 3, "c", 0.0),
            (2, 3, "d", 0.0),  # beyond k_events=2 -> ignored
        ],
    )
    got = [(r.path, r.users) for r in top_paths(ev, k_events=2).collect()]
    assert got == [("a>b", 2), ("a>c", 1)]
    # deterministic tie-break: equal counts order by path ascending
    got2 = [
        (r.path, r.users)
        for r in top_paths(ev, k_events=1, n_paths=1).collect()
    ]
    assert got2 == [("a", 3)]
    with pytest.raises(ValueError):
        top_paths(ev, k_events=0)


def test_transition_gaps(spark):
    from lakehouse.paths import transition_gaps

    ev = _ev(
        spark,
        [
            (0, 1, "a", 0.0),
            (10, 1, "b", 0.0),
            (0, 2, "a", 0.0),
            (30, 2, "b", 0.0),
            (35, 2, "a", 0.0),
        ],
    )
    got = {
        (r.src_type, r.dst_type): (r.transitions, float(r.avg_gap_s), float(r.max_gap_s))
        for r in transition_gaps(ev).collect()
    }
    # a->b gaps: 10s and 30s (mean 20, max 30); b->a gap: 5s
    assert got == {
        ("a", "b"): (2, 20.0, 30.0),
        ("b", "a"): (1, 5.0, 5.0),
    }
