"""Cross-engine-deterministic rounding for double-typed readouts.

Why: every oracle-checked query that emits ``round(double, d)`` is a
cross-engine lottery. Spark's ``round`` re-parses the double's
SHORTEST DECIMAL REPR (``BigDecimal.valueOf``) and rounds that
HALF_UP; DuckDB rounds the TRUE BINARY value. A double whose binary
value sits just below a ``…5`` tie (e.g. 0.12344999999999999 printing
as "0.12345") rounds UP in Spark and DOWN in DuckDB — the round-3
driver red on ``events_ab_test`` was exactly this class.

Fix: round with IEEE-only ops both engines execute bit-identically —

    stable_round(x, d) = floor(x * 10^d + 0.5) / 10^d

multiply, add, ``floor`` and divide are all correctly-rounded IEEE 754
ops with identical results in any conforming engine, so when the input
doubles are bit-identical (integer-derived ratios, sqrt/ln chains over
them), the rounded outputs are bit-identical too — no tie class exists
at all (n/10^d can never be EXACTLY halfway at d decimals). Ties round
half-toward-+inf in BOTH engines (that is what makes them agree; plain
HALF_UP differs only on negative ties, immaterial for parity).

OUTPUT TYPE: **DOUBLE, never DECIMAL.** Round 4 emitted
``DECIMAL(p,d)`` here and it caused five driver hash reds
(VERDICT r4 §What's wrong #1): fixed-scale decimals render with
trailing zeros (``Decimal('1.0000')``) while a float renders by
shortest repr (``1.0``) — any comparison protocol that materializes
the two sides differently hash-mismatches on every trailing-zero
value even when the values are bit-identical. The final
``long / 10^d`` division IS the double nearest n·10^-d in both
engines (IEEE division is correctly rounded), so a plain DOUBLE
output carries the identical value and hashes identically by repr.
Query outputs must therefore be DOUBLE; DECIMAL is for *internal*
order-insensitive summation only — use :func:`stable_round_dec` for
that and cast the aggregate back to double at the output boundary
(the pattern attribution.py uses).

Magnitude bound (documented, not clamped): Spark's ``floor(double)``
returns BIGINT, so for ``|x·10^d| ≥ 2^63`` Spark overflows/NULLs
while DuckDB's ``floor`` stays a double — callers must guarantee
``|x| < 2^63 / 10^d`` (~9.2e14 at d=4). For ``stable_round_dec``
additionally ``|x| < 10^(precision-digits)``. Every current caller
rounds ratios, z-scores, cosines, log-probs or second-scale gaps —
all far inside the bound.

For self-verifying (Spark-vs-Spark) queries plain ``F.round`` is fine;
this helper matters wherever a DuckDB oracle twin exists.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def stable_round(col: Column, digits: int = 4, *, precision: int = 18) -> Column:
    """``floor(x·10^d + 0.5)/10^d`` as DOUBLE — the engine half of the
    pair; bit-deterministic given bit-identical input doubles. NULL in
    → NULL out (all ops propagate NULL). ``precision`` is accepted for
    call-site compatibility but unused: the output is always double
    (see module docstring — DECIMAL readouts break hash protocols)."""
    p = float(10 ** digits)
    return (F.floor(col * F.lit(p) + F.lit(0.5)) / F.lit(p)).cast("double")


def stable_round_dec(
    col: Column, digits: int = 4, *, precision: int = 18
) -> Column:
    """Like :func:`stable_round` but emits ``DECIMAL(precision,
    digits)`` — for INTERNAL order-insensitive summation only (decimal
    addition is exact, so a SUM over any partitioning is
    deterministic). NEVER let this type reach a query's output schema:
    cast the aggregate to double at the boundary. The double nearest
    n·10^-d always casts to exactly n·10^-d decimal in both engines,
    so the decimal sum matches a DuckDB twin that sums the same
    rounded values as DECIMAL."""
    p = float(10 ** digits)
    return (
        (F.floor(col * F.lit(p) + F.lit(0.5)) / F.lit(p))
        .cast(f"decimal({precision},{digits})")
    )


def stable_round_sql(expr: str, digits: int = 4, *, precision: int = 18) -> str:
    """The DuckDB twin of ``stable_round`` — textually the same IEEE
    op chain, so the two engines agree bit-for-bit.

    Canonical emitted text (do not drift):
    ``CAST(floor((X) * 10^d.0 + 0.5) / 10^d.0 AS DOUBLE)``.
    A few oracle builders (similarity.py ADC/cosine) inline this text
    verbatim because their ``X`` itself interpolates f-string pieces a
    plain string argument can't carry — any change here must sweep
    those sites too (grep ``floor((`` )."""
    p = float(10 ** digits)
    return (
        f"CAST(floor(({expr}) * {p!r} + 0.5) / {p!r} AS DOUBLE)"
    )
