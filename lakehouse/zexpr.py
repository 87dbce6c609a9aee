"""Z-order and Hilbert keys as pure Catalyst expressions (JVM-side).

The pandas-UDF curve key (curves.py) is correct but pays the Python
worker toll twice per clustering job; measured on this engine the toll
DOMINATES at high parallelism (cluster op at local[32]: 23.6 s with the
UDF vs 8.4 s with a JVM key — the Arrow exchange and 32-worker fan-out
cost more than the actual bit-twiddling). Both curves need only shifts,
masks, XORs and conditionals, all of which Catalyst codegens:

- Z-order is a single Column expression (``zorder_key_expr``);
- Hilbert (Skilling's transpose algorithm, AIP Conf. Proc. 707, 2004)
  is an ITERATIVE state transform, so a single expression tree would
  double in size every round (exponential blowup). ``with_hilbert_key``
  instead unrolls the fixed ``bits``/``n`` loop as a staged chain of
  ``withColumn`` Projects over named temp columns — Catalyst keeps
  multiply-referenced non-cheap projections un-collapsed, so plan size
  and codegen work stay LINEAR in bits×n, and no Python eval node ever
  appears in the rewrite plan (gated in tests/test_plans.py).

Semantics mirror ``curves.normalize_to_uint`` + ``curves.zorder_index``
/ ``curves.hilbert_index`` bit-for-bit for numeric, timestamp (micros)
and ASCII-string columns: min/max linear scaling into ``bits``-wide
codes (nulls → 0), big-endian 8-byte prefix for strings, interleave
with column 0 most significant, and a final logical right-shift by 1 so
the 64-bit key fits a signed LongType without reordering.
"""

from __future__ import annotations

import datetime as _dt
from typing import Optional, Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _string_prefix_float(v: Optional[str]) -> float:
    """Python twin of curves.string_prefix_uint for bound literals."""
    if v is None:
        return 0.0
    b = str(v).encode("utf-8", "ignore")[:8]
    return float(int.from_bytes(b.ljust(8, b"\x00"), "big"))


def _bound_float(v, dtype: T.DataType) -> Optional[float]:
    if v is None:
        return None
    if isinstance(dtype, T.StringType):
        return _string_prefix_float(v)
    if isinstance(dtype, T.TimestampType):
        if isinstance(v, str):
            v = _dt.datetime.fromisoformat(v)
        if isinstance(v, _dt.datetime):
            if v.tzinfo is None:
                v = v.replace(tzinfo=_dt.timezone.utc)
            return float(int(v.timestamp() * 1_000_000))
        return float(v)
    if isinstance(dtype, T.DateType):
        if isinstance(v, str):
            v = _dt.date.fromisoformat(v)
        if isinstance(v, _dt.date):
            epoch = _dt.date(1970, 1, 1)
            return float((v - epoch).days * 86_400_000_000)
        return float(v)
    return float(v)


def _value_expr(name: str, dtype: T.DataType) -> Column:
    """The column as a DOUBLE in the same domain as ``_bound_float``."""
    c = F.col(name)
    if isinstance(dtype, T.StringType):
        # first 8 bytes, zero-padded, big-endian → exact uint64 → double
        # (byte-wise, so multi-byte UTF-8 still orders correctly)
        return (
            F.conv(
                F.hex(
                    F.expr(
                        f"rpad(substring(CAST(`{name}` AS BINARY), 1, 8), "
                        f"8, X'00')"
                    )
                ),
                16,
                10,
            )
            .cast("decimal(20,0)")
            .cast("double")
        )
    if isinstance(dtype, T.TimestampType):
        return F.unix_micros(c).cast("double")
    if isinstance(dtype, T.DateType):
        return (F.col(name).cast("timestamp").cast("double") * 1e6)
    return c.cast("double")


def norm_code_expr(
    name: str, dtype: T.DataType, lo, hi, bits: int
) -> Column:
    """[0, 2^bits) code column mirroring curves.normalize_to_uint."""
    max_code = (1 << bits) - 1
    lo_f = _bound_float(lo, dtype)
    hi_f = _bound_float(hi, dtype)
    if lo_f is None or hi_f is None or (hi_f - lo_f) <= 0:
        return F.lit(0).cast("long")
    span = hi_f - lo_f
    scaled = (_value_expr(name, dtype) - F.lit(lo_f)) / F.lit(span)
    clamped = F.least(F.greatest(F.coalesce(scaled, F.lit(0.0)), F.lit(0.0)), F.lit(1.0))
    return (clamped * F.lit(float(max_code))).cast("long")


def interleave_expr(codes: Sequence[Column], bits: int) -> Column:
    """Bitwise Morton interleave, column 0 most significant per group;
    logically shifted right once so the key is a non-negative long."""
    k = len(codes)
    out = F.lit(0).cast("long")
    for bit in range(bits):
        for j, code in enumerate(codes):
            pos = bit * k + (k - 1 - j)
            src = F.shiftright(code, bit).bitwiseAND(F.lit(1))
            out = out.bitwiseOR(F.shiftleft(src, pos))
    return F.shiftrightunsigned(out, 1)


def zorder_key_expr(
    columns: Sequence[str],
    col_types: dict[str, T.DataType],
    bounds: dict[str, tuple],
    bits: int,
) -> Column:
    codes = [
        norm_code_expr(c, col_types[c], *(bounds.get(c) or (None, None)), bits)
        for c in columns
    ]
    return interleave_expr(codes, bits)


def with_hilbert_key(
    df,
    columns: Sequence[str],
    col_types: dict[str, T.DataType],
    bounds: dict[str, tuple],
    bits: int,
    out_col: str = "zkey",
):
    """Append the Hilbert curve key of ``columns`` as ``out_col`` —
    Skilling's transpose algorithm unrolled into JVM bit-ops.

    Mirrors ``curves.hilbert_index`` exactly (the parity gate in
    tests/test_zexpr.py compares against the numpy UDF bit-for-bit),
    including the final ``>> 1`` that fits the key into a signed long.
    Staged temp columns (``__h<i>``, ``__ht``) carry the iterative
    state; they are dropped before returning.
    """
    n = len(columns)
    codes = [
        norm_code_expr(c, col_types[c], *(bounds.get(c) or (None, None)), bits)
        for c in columns
    ]
    if n == 1:
        # 1-D Hilbert == identity (curves.hilbert_index short-circuit),
        # shifted like every curve key
        return df.withColumn(out_col, F.shiftrightunsigned(codes[0], 1))

    hcols = [f"__h{i}" for i in range(n)]
    for name, code in zip(hcols, codes):
        df = df.withColumn(name, code)
    X = [F.col(h) for h in hcols]

    # axes -> transpose (inverse undo)
    q = 1 << (bits - 1)
    while q > 1:
        p = q - 1
        # i == 0 degenerates: t = (X0 ^ X0) & P = 0, so only the
        # conditional X0 ^= P remains
        df = df.withColumn(
            hcols[0],
            F.when(
                X[0].bitwiseAND(F.lit(q)) != 0, X[0].bitwiseXOR(F.lit(p))
            ).otherwise(X[0]),
        )
        for i in range(1, n):
            cond = X[i].bitwiseAND(F.lit(q)) != 0
            df = df.withColumn(
                "__ht",
                F.when(cond, F.lit(0)).otherwise(
                    X[0].bitwiseXOR(X[i]).bitwiseAND(F.lit(p))
                ),
            )
            df = df.withColumn(
                hcols[0],
                F.when(cond, X[0].bitwiseXOR(F.lit(p))).otherwise(
                    X[0].bitwiseXOR(F.col("__ht"))
                ),
            )
            df = df.withColumn(hcols[i], X[i].bitwiseXOR(F.col("__ht")))
        q >>= 1

    # Gray encode (sequential: X[i] ^= X[i-1] with updated X[i-1])
    for i in range(1, n):
        df = df.withColumn(hcols[i], X[i].bitwiseXOR(X[i - 1]))
    # undo excess work: t = XOR of (Q-1) for every set bit Q of X[n-1]
    t_expr = F.lit(0).cast("long")
    q = 1 << (bits - 1)
    while q > 1:
        t_expr = t_expr.bitwiseXOR(
            F.when(X[n - 1].bitwiseAND(F.lit(q)) != 0, F.lit(q - 1)).otherwise(
                F.lit(0)
            )
        )
        q >>= 1
    df = df.withColumn("__ht", t_expr)
    for i in range(n):
        df = df.withColumn(hcols[i], X[i].bitwiseXOR(F.col("__ht")))

    # transpose -> index: bit j of X[i] becomes bit (j*n + n-1-i)
    df = df.withColumn(out_col, interleave_expr(X, bits))
    return df.drop("__ht", *hcols)
