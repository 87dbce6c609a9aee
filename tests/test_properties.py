"""Property-based tests (hypothesis) for the pure-Python kernels the
engine's correctness leans on: the file-pruning predicate algebra, its
"every row matches" dual (metadata aggregates), the spectral band
partition, and safe type widening. No SparkSession — these run in
milliseconds and explore corners the example-based tests don't."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from lakehouse.expressions import Predicate, matches_stats
from lakehouse.ops.agg import _always_matches_stats

OPS = ["=", "!=", "<", "<=", ">", ">=", "is_null", "not_null"]


@st.composite
def column_and_pred(draw):
    """A concrete column (list of int-or-None) plus a predicate over it."""
    rows = draw(
        st.lists(
            st.one_of(st.integers(-50, 50), st.none()),
            min_size=1,
            max_size=12,
        )
    )
    op = draw(st.sampled_from(OPS))
    value = draw(st.integers(-60, 60))
    return rows, Predicate("c", op, value)


def _stats_of(rows):
    vals = [v for v in rows if v is not None]
    return {
        "min": min(vals) if vals else None,
        "max": max(vals) if vals else None,
        "nulls": sum(1 for v in rows if v is None),
        "rows": len(rows),
    }


def _row_satisfies(v, p: Predicate):
    if p.op == "is_null":
        return v is None
    if p.op == "not_null":
        return v is not None
    if v is None:
        return False  # SQL three-valued logic: NULL fails comparisons
    return {
        "=": v == p.value,
        "!=": v != p.value,
        "<": v < p.value,
        "<=": v <= p.value,
        ">": v > p.value,
        ">=": v >= p.value,
    }[p.op]


@settings(max_examples=400, deadline=None)
@given(column_and_pred())
def test_pruning_is_sound_and_dual_is_exact(cp):
    """The load-bearing pair:

    - ``matches_stats`` must never prune a file that contains a
      satisfying row (soundness of file skipping);
    - ``_always_matches_stats`` must never claim full-match for a file
      containing a non-satisfying row (soundness of metadata COUNT).
    """
    rows, pred = cp
    stats = _stats_of(rows)
    any_true = any(_row_satisfies(v, pred) for v in rows)
    all_true = all(_row_satisfies(v, pred) for v in rows)
    if any_true:
        assert matches_stats(pred, stats), (rows, pred, stats)
    if not all_true:
        assert not _always_matches_stats(pred, stats), (rows, pred, stats)
    # and the trivial implication: always ⊆ may
    if _always_matches_stats(pred, stats):
        assert matches_stats(pred, stats)


@settings(max_examples=200, deadline=None)
@given(st.integers(1, 8193), st.integers(1, 64))
def test_band_edges_partition_spectrum(n_bins, n_bands):
    from lakehouse.audio import _band_edges

    e = _band_edges(n_bins, n_bands)
    assert len(e) == n_bands + 1
    assert e[0] == 0 and e[-1] == n_bins
    assert (np.diff(e) >= 0).all()
    # partition property: reduceat over these edges covers every bin
    # exactly once — sum of band energies == total energy
    p = np.random.default_rng(n_bins * 64 + n_bands).random(n_bins)
    bands = np.add.reduceat(p, e[:-1])
    bands = np.where(e[1:] > e[:-1], bands, 0.0)
    assert abs(bands.sum() - p.sum()) < 1e-9 * max(p.sum(), 1.0)


@settings(max_examples=200, deadline=None)
@given(st.data())
def test_widening_is_a_partial_order(data):
    from pyspark.sql import types as T

    from lakehouse.schema import is_widening

    pool = [
        T.ByteType(), T.ShortType(), T.IntegerType(), T.LongType(),
        T.FloatType(), T.DoubleType(), T.StringType(),
        T.DecimalType(10, 2), T.DecimalType(18, 2), T.DecimalType(18, 4),
    ]
    a = data.draw(st.sampled_from(pool))
    b = data.draw(st.sampled_from(pool))
    c = data.draw(st.sampled_from(pool))
    assert is_widening(a, a)  # reflexive
    if a != b:  # antisymmetric: no widening cycles
        assert not (is_widening(a, b) and is_widening(b, a))
    if is_widening(a, b) and is_widening(b, c):  # transitive
        assert is_widening(a, c), (a, b, c)


# --- round-3 session-4 DSP kernels --------------------------------------------


@settings(max_examples=30, deadline=None)
@given(
    amp=st.floats(0.02, 0.9),
    f0=st.floats(100.0, 3000.0),
    ratio=st.floats(1.5, 10.0),
)
def test_drc_gain_law_holds_for_any_tone(amp, f0, ratio):
    """For a constant-envelope tone at ANY amplitude/frequency, the
    compressor's steady-state reduction equals
    max(level - threshold, 0) · (1 - 1/ratio) within 0.15 dB, and
    never amplifies."""
    from lakehouse.audio import drc_pcm

    sr = 16000
    t = np.arange(int(sr * 0.4)) / sr
    x = (amp * np.sin(2 * np.pi * f0 * t)).astype(np.float32)
    y, _ = drc_pcm(x, sr, threshold_db=-20.0, ratio=ratio)

    def rms_db(v):
        return 20 * np.log10(
            np.sqrt(np.mean(v.astype(np.float64) ** 2)) + 1e-12
        )

    q = len(x) // 4
    lvl = rms_db(x[q:-q])
    want = -max(lvl + 20.0, 0.0) * (1.0 - 1.0 / ratio)
    got = rms_db(y[q:-q]) - lvl
    assert got <= 0.05  # never amplifies
    assert abs(got - want) < 0.15, (lvl, got, want)


@settings(max_examples=30, deadline=None)
@given(
    n=st.integers(2048, 40000),
    sr_out=st.sampled_from([8000, 11025, 16000, 22050, 44100]),
)
def test_sinc_resample_length_law(n, sr_out):
    """Output length is EXACTLY round(n · sr_out / sr_in) for any input
    length and rate pair, and the output is finite."""
    from lakehouse.audio import _resample_sinc

    sr_in = 16000
    rng = np.random.default_rng(n)
    x = (0.3 * rng.standard_normal(n)).clip(-1, 1).astype(np.float32)
    y = _resample_sinc(x, sr_in, sr_out)
    want = n if sr_in == sr_out else max(1, int(round(n * sr_out / sr_in)))
    assert len(y) == want
    assert np.all(np.isfinite(y)) and np.max(np.abs(y)) <= 1.0


@settings(max_examples=20, deadline=None)
@given(
    n=st.integers(2048, 30000),
    factor=st.sampled_from([0.8, 0.9, 1.1, 1.25, 1.5]),
)
def test_pitch_shift_length_preserved(n, factor):
    """Pitch shift NEVER changes the sample count, for any input length
    and any factor, and stays within PCM range."""
    from lakehouse.audio import pitch_shift_pcm

    rng = np.random.default_rng(n)
    x = (0.3 * rng.standard_normal(n)).clip(-1, 1).astype(np.float32)
    y = pitch_shift_pcm(x, factor)
    assert len(y) == n
    assert np.all(np.isfinite(y)) and np.max(np.abs(y)) <= 1.0


@settings(max_examples=20, deadline=None)
@given(
    n=st.integers(2048, 30000),
    rate=st.sampled_from([0.8, 0.9, 1.1, 1.25, 1.5]),
)
def test_time_stretch_length_law(n, rate):
    """Time stretch yields EXACTLY round(n / rate) samples for any
    input length and rate, and stays within PCM range."""
    from lakehouse.audio import time_stretch_pcm

    rng = np.random.default_rng(n)
    x = (0.3 * rng.standard_normal(n)).clip(-1, 1).astype(np.float32)
    y = time_stretch_pcm(x, rate)
    assert len(y) == max(1, int(round(n / rate)))
    assert np.all(np.isfinite(y)) and np.max(np.abs(y)) <= 1.0


@settings(max_examples=15, deadline=None)
@given(
    seed=st.integers(0, 10_000),
    lookback=st.sampled_from([None, 50.0, 500.0]),
)
def test_attribution_conserves_conversions(spark, seed, lookback):
    """For EVERY model and lookback, total credited conversions across
    channels (including '(none)') equals the exact conversion count —
    attribution reassigns credit, never creates or destroys it."""
    import datetime as dt

    from lakehouse.attribution import attribution_report

    rng = np.random.default_rng(seed)
    t0 = dt.datetime(2024, 1, 1)
    types = ["view", "click", "signup", "purchase"]
    rows = [
        (
            i,
            t0 + dt.timedelta(seconds=int(rng.integers(0, 2000))),
            int(rng.integers(0, 8)),
            types[int(rng.integers(0, 4))],
            float(rng.integers(0, 100)),
        )
        for i in range(60)
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double",
    )
    n_conv = sum(1 for r in rows if r[3] == "purchase")
    for model in ("last_touch", "first_touch", "linear"):
        rep = attribution_report(
            ev, ["view", "click", "signup"], "purchase",
            model=model, lookback=lookback,
        ).collect()
        total = sum(r.conversions for r in rep)
        assert abs(total - n_conv) < 1e-4, (model, lookback, total, n_conv)
