"""A/B experiment analysis (lakehouse/abtest.py): the engine's numbers
re-derived independently in pure Python (hashlib md5 assignment +
closed-form two-proportion z), plus assignment invariants. Oracle
parity is gated separately by the registry twin (events_ab_test)."""

from __future__ import annotations

import hashlib
import math

import pytest

from lakehouse.abtest import ab_test_report
from lakehouse.sampling import _HEX_WIDTH, _threshold_hex


def _variant(seed: int, user, k: int) -> str:
    h = hashlib.md5(f"{seed}:{user}".encode()).hexdigest()[:_HEX_WIDTH]
    for i in range(1, k):
        if h < _threshold_hex(i / k):
            return f"v{i - 1}"
    return f"v{k - 1}"


@pytest.fixture(scope="module")
def events(spark):
    # 200 users; user u converts iff u % 3 == 0 (value 10.0), everyone
    # also emits a view event so non-converters are still in scope
    rows = []
    for u in range(200):
        rows.append((2 * u, u, "view", 1.0))
        if u % 3 == 0:
            rows.append((2 * u + 1, u, "purchase", 10.0))
    return spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, value double"
    )


def test_ab_report_matches_pure_python(spark, events):
    seed, k = 11, 2
    got = {
        r.variant: r
        for r in ab_test_report(
            events, conversion_type="purchase", variants=k, seed=seed
        ).collect()
    }
    arms: dict[str, list[int]] = {}
    for u in range(200):
        arms.setdefault(_variant(seed, u, k), []).append(u)
    assert set(got) == set(arms)
    n0 = len(arms["v0"])
    c0 = sum(1 for u in arms["v0"] if u % 3 == 0)
    for v, users in arms.items():
        n = len(users)
        c = sum(1 for u in users if u % 3 == 0)
        r = got[v]
        assert (r.users, r.converters) == (n, c), v
        assert float(r.conv_rate) == pytest.approx(round(c / n, 4), abs=1e-9)
        assert r.conv_value == pytest.approx(10.0 * c, abs=1e-9)
        if v == "v0":
            assert r.lift is None and r.z_score is None
        else:
            assert float(r.lift) == pytest.approx(round(c / n - c0 / n0, 4), abs=1e-9)
            p = (c + c0) / (n + n0)
            se = math.sqrt(p * (1 - p) * (1 / n + 1 / n0))
            assert float(r.z_score) == pytest.approx(
                round((c / n - c0 / n0) / se, 4), abs=1e-9
            )


def test_assignment_is_seed_stable_and_partitions_users(spark, events):
    # every user appears in exactly one arm, arms cover all users, and
    # re-running with the same seed reproduces the exact counts
    a = ab_test_report(events, variants=4, seed=3).collect()
    b = ab_test_report(
        events.repartition(7, "user_id"), variants=4, seed=3
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    assert sum(r.users for r in a) == 200
    # a different seed reshuffles arms (almost surely different split)
    c = ab_test_report(events, variants=4, seed=4).collect()
    assert sorted(r.users for r in c) != sorted(r.users for r in a) or sorted(
        r.converters for r in c
    ) != sorted(r.converters for r in a)


def test_ab_rejects_single_arm(spark, events):
    with pytest.raises(ValueError):
        ab_test_report(events, variants=1)
