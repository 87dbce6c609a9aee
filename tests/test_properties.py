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


@settings(max_examples=400)
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


@settings(max_examples=200)
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


@settings(max_examples=200)
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
