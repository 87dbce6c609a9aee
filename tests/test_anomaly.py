"""Event-rate anomaly screen (lakehouse/anomaly.py): planted-spike
detection with exact hand-computed z, degenerate-series exclusions.
Oracle parity is gated by the registry twin (events_rate_anomalies)."""

from __future__ import annotations

import datetime as dt
import math

import pytest

from lakehouse.anomaly import rate_anomalies

T0 = dt.datetime(2024, 1, 1)


def _ev(spark, buckets_by_type):
    """buckets_by_type: {type: [count_in_bucket_0, count_in_bucket_1, …]}
    with 60 s buckets."""
    rows, eid = [], 0
    for et, counts in buckets_by_type.items():
        for b, c in enumerate(counts):
            for j in range(c):
                rows.append(
                    (eid, T0 + dt.timedelta(seconds=60 * b + j % 60), et)
                )
                eid += 1
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string"
    )


def test_planted_spike_is_flagged_with_exact_z(spark):
    counts = [10, 10, 10, 10, 10, 10, 10, 50]  # spike in the last bucket
    ev = _ev(spark, {"click": counts, "view": [10] * 8})
    got = rate_anomalies(ev, bucket_s=60, z_threshold=2.0).collect()
    # 'view' is constant (zero variance) -> nothing; 'click' flags the
    # spike bucket only
    assert [(r.key, r.n_events) for r in got] == [("click", 50)]
    r = got[0]
    n, s = len(counts), sum(counts)
    ss = sum(c * c for c in counts)
    mean = s / n
    std = math.sqrt((ss - s * s / n) / (n - 1))
    assert float(r.mean_events) == pytest.approx(round(mean, 4), abs=1e-9)
    assert float(r.std_events) == pytest.approx(round(std, 4), abs=1e-9)
    assert float(r.z_score) == pytest.approx(round((50 - mean) / std, 4), abs=1e-9)
    assert r.bucket_start_us == int(
        (T0 + dt.timedelta(seconds=60 * 7)).timestamp() * 1_000_000
    )


def test_dip_flags_negative_z_and_min_buckets_guard(spark):
    ev = _ev(spark, {"err": [40, 40, 40, 40, 40, 2], "few": [1, 99]})
    got = rate_anomalies(ev, bucket_s=60, z_threshold=1.5).collect()
    # 'few' has only 2 buckets < min_buckets=4 -> excluded even though
    # its spread is huge; 'err' flags the dip with a NEGATIVE z
    assert [(r.key, r.n_events) for r in got] == [("err", 2)]
    assert got[0].z_score < 0
    with pytest.raises(ValueError):
        rate_anomalies(ev, bucket_s=0)
    with pytest.raises(ValueError):
        rate_anomalies(ev, min_buckets=1)
