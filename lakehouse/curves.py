"""Z-order and Hilbert 64-bit keys — vectorized numpy bit-twiddling.

Delta's ``OPTIMIZE ZORDER BY`` is the published counterpart of the
reference's "partition optimization" perf lever
(/root/reference/README.md:68); nothing like it exists in stock Spark,
so the key computation is implemented here and invoked from a pandas
UDF (Arrow batches → numpy arrays → pure array ops, no per-row Python).

- Z-order: classic bit interleave of k coordinates, ``64 // k`` bits each.
- Hilbert: Skilling's transpose algorithm (J. Skilling, "Programming the
  Hilbert curve", AIP Conf. Proc. 707, 2004) vectorized with numpy
  masks; same key width as Z-order so the two are drop-in alternatives.

Coordinates are produced by ``normalize_to_uint``: min/max linear
scaling for numerics (bounds come from manifest stats — no extra data
pass), big-endian byte-prefix integers for strings (order-preserving).
"""

from __future__ import annotations

from typing import Iterable, Sequence

import numpy as np
import pandas as pd


def bits_per_dim(n_dims: int, total_bits: int = 64) -> int:
    if not 1 <= n_dims <= 8:
        raise ValueError("clustering supports 1..8 columns")
    return min(32, total_bits // n_dims)


# --- coordinate normalization -------------------------------------------------


def string_prefix_uint(values: pd.Series, n_bytes: int = 8) -> np.ndarray:
    """Order-preserving uint64 from the first 8 bytes of each string."""
    out = np.zeros(len(values), dtype=np.uint64)
    for i, v in enumerate(values):
        if v is None:
            continue
        b = str(v).encode("utf-8", "ignore")[:n_bytes]
        out[i] = int.from_bytes(b.ljust(n_bytes, b"\x00"), "big")
    return out


def normalize_to_uint(
    values: pd.Series, lo, hi, bits: int, *, is_string: bool = False
) -> np.ndarray:
    """Scale values into [0, 2^bits); nulls map to 0 (sort first)."""
    max_code = (1 << bits) - 1
    if is_string:
        arr = string_prefix_uint(values).astype(np.float64)
        lo_f = float(string_prefix_uint(pd.Series([lo]))[0]) if lo is not None else 0.0
        hi_f = float(string_prefix_uint(pd.Series([hi]))[0]) if hi is not None else 0.0
    else:
        arr = pd.to_numeric(values, errors="coerce").to_numpy(dtype=np.float64)
        lo_f = float(lo) if lo is not None else np.nanmin(arr) if len(arr) else 0.0
        hi_f = float(hi) if hi is not None else np.nanmax(arr) if len(arr) else 0.0
    span = hi_f - lo_f
    if span <= 0:
        return np.zeros(len(values), dtype=np.uint64)
    scaled = (arr - lo_f) / span
    scaled = np.clip(np.nan_to_num(scaled, nan=0.0), 0.0, 1.0)
    return (scaled * max_code).astype(np.uint64)


# --- Z-order ------------------------------------------------------------------


def zorder_index(coords: Sequence[np.ndarray], bits: int) -> np.ndarray:
    """Interleave ``bits`` low bits of each coordinate, col 0 most
    significant within each bit group."""
    k = len(coords)
    out = np.zeros(len(coords[0]), dtype=np.uint64)
    for bit in range(bits):
        for j, c in enumerate(coords):
            src = (c.astype(np.uint64) >> np.uint64(bit)) & np.uint64(1)
            out |= src << np.uint64(bit * k + (k - 1 - j))
    return out


# --- Hilbert (Skilling's transpose algorithm, vectorized) ---------------------


def hilbert_index(coords: Sequence[np.ndarray], bits: int) -> np.ndarray:
    """Hilbert distance of each point; coords are ``bits``-bit uints."""
    n = len(coords)
    if n == 1:
        return coords[0].astype(np.uint64)
    X = [c.astype(np.uint64).copy() for c in coords]
    M = np.uint64(1 << (bits - 1))

    # axes -> transpose (inverse undo)
    Q = M
    while Q > np.uint64(1):
        P = np.uint64(Q - np.uint64(1))
        for i in range(n):
            cond = (X[i] & Q) != 0
            t = np.where(cond, np.uint64(0), (X[0] ^ X[i]) & P)
            X[0] = np.where(cond, X[0] ^ P, X[0] ^ t)
            if i != 0:
                X[i] = X[i] ^ t
        Q >>= np.uint64(1)

    # Gray encode
    for i in range(1, n):
        X[i] ^= X[i - 1]
    t = np.zeros_like(X[0])
    Q = M
    while Q > np.uint64(1):
        cond = (X[n - 1] & Q) != 0
        t = np.where(cond, t ^ np.uint64(Q - np.uint64(1)), t)
        Q >>= np.uint64(1)
    for i in range(n):
        X[i] ^= t

    # transpose -> single index: bit j of X[i] becomes bit (j*n + n-1-i)
    out = np.zeros_like(X[0])
    for j in range(bits):
        for i in range(n):
            bit = (X[i] >> np.uint64(j)) & np.uint64(1)
            out |= bit << np.uint64(j * n + (n - 1 - i))
    return out


def curve_index(
    coords: Sequence[np.ndarray], bits: int, curve: str
) -> np.ndarray:
    if curve == "zorder":
        return zorder_index(coords, bits)
    if curve == "hilbert":
        return hilbert_index(coords, bits)
    raise ValueError(f"unknown curve: {curve!r} (want zorder|hilbert)")


def block_diameter_metric(
    index_fn, bits: int = 6, block: int = 16
) -> float:
    """Avg Manhattan diameter of index-contiguous blocks on a 2-D grid —
    the locality metric used to property-test Hilbert vs Z-order."""
    side = 1 << bits
    xs, ys = np.meshgrid(
        np.arange(side, dtype=np.uint64), np.arange(side, dtype=np.uint64)
    )
    xs, ys = xs.ravel(), ys.ravel()
    idx = index_fn([xs, ys], bits)
    order = np.argsort(idx, kind="stable")
    sx, sy = xs[order].astype(np.int64), ys[order].astype(np.int64)
    diams = []
    for start in range(0, len(sx), block):
        bx, by = sx[start : start + block], sy[start : start + block]
        diams.append((bx.max() - bx.min()) + (by.max() - by.min()))
    return float(np.mean(diams))
