"""Cross-engine-deterministic rounding for double-typed readouts.

Why: every oracle-checked query that emits ``round(double, d)`` is a
cross-engine lottery. Spark's ``round`` re-parses the double's
SHORTEST DECIMAL REPR (``BigDecimal.valueOf``) and rounds that
HALF_UP; DuckDB rounds the TRUE BINARY value. A double whose binary
value sits just below a ``…5`` tie (e.g. 0.12344999999999999 printing
as "0.12345") rounds UP in Spark and DOWN in DuckDB — the round-3
driver red on ``events_ab_test`` was exactly this class
(VERDICT.md §What's wrong #1).

Fix: round with IEEE-only ops both engines execute bit-identically —

    stable_round(x, d) = floor(x * 10^d + 0.5) / 10^d

multiply, add, ``floor`` and divide are all correctly-rounded IEEE 754
ops with identical results in any conforming engine, so when the input
doubles are bit-identical (integer-derived ratios, sqrt/ln chains over
them), the rounded outputs are bit-identical too — no tie class exists
at all (n/10^d can never be EXACTLY halfway at d decimals). The result
is then cast DECIMAL(prec, d): the double nearest n/10^d always casts
to exactly n·10^-d in both engines, and decimal output is repr-stable
through every hash protocol. Ties round half-toward-+inf in BOTH
engines (that is what makes them agree; plain HALF_UP differs only on
negative ties, immaterial for parity).

For self-verifying (Spark-vs-Spark) queries plain ``F.round`` is fine;
this helper matters wherever a DuckDB oracle twin exists.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def stable_round(col: Column, digits: int = 4, *, precision: int = 18) -> Column:
    """``floor(x·10^d + 0.5)/10^d`` as DECIMAL(precision, digits) — the
    engine half of the pair; bit-deterministic given bit-identical
    input doubles. NULL in → NULL out (all ops propagate NULL)."""
    p = float(10 ** digits)
    return (
        (F.floor(col * F.lit(p) + F.lit(0.5)) / F.lit(p))
        .cast(f"decimal({precision},{digits})")
    )


def stable_round_sql(expr: str, digits: int = 4, *, precision: int = 18) -> str:
    """The DuckDB twin of ``stable_round`` — textually the same IEEE
    op chain, so the two engines agree bit-for-bit.

    Canonical emitted text (do not drift):
    ``CAST(floor((X) * 10^d.0 + 0.5) / 10^d.0 AS DECIMAL(p,d))``.
    A few oracle builders (similarity.py ADC/cosine, attribution.py)
    inline this text verbatim because their ``X`` itself interpolates
    f-string pieces a plain string argument can't carry — any change
    here must sweep those sites too (grep ``floor((`` )."""
    p = float(10 ** digits)
    return (
        f"CAST(floor(({expr}) * {p!r} + 0.5) / {p!r} "
        f"AS DECIMAL({precision},{digits}))"
    )
