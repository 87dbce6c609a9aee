"""Deterministic sampling for training-data pipelines.

Three operators a 100 TB corpus pipeline runs constantly, all built on
the same primitive — a seeded content hash compared against a
threshold — so every sample is REPRODUCIBLE (same seed → same rows, on
any cluster size, any partitioning, any execution order) and
SQL-portable (md5 exists verbatim in DuckDB for the oracle twin):

- ``hash_sample``: Bernoulli-style fraction sampling. Unlike
  ``df.sample()`` (partition-order dependent RNG), membership is a pure
  function of (seed, id) — stable across retries, resumable jobs, and
  re-partitioning. Comparison happens on a fixed-width hex prefix, a
  plain string compare in both engines.
- ``stratified_sample``: exactly-n-per-stratum via rank over the hash
  inside each stratum — one shuffle keyed on the strata columns; the
  hash order is a uniform random permutation per stratum, so this is
  uniform sampling without replacement.
- ``stratified_fractions``: per-stratum Bernoulli rates (the mixture /
  source-weighting knob for pretraining corpora), a single projection +
  filter — no shuffle at all.

Scale: ``hash_sample``/``stratified_fractions`` are pure codegen'd
filters (embarrassingly parallel, pushed to the scan). The exact-n
variant shuffles once on the strata key; a pathological single-stratum
corpus degenerates to a global top-n — use the fraction variant there.
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_HEX_WIDTH = 8  # 32 bits of hash → fraction resolution ~2.3e-10


def _hash_hex(seed: int, id_col: Column) -> Column:
    """First 8 hex chars of md5(seed || ':' || id) — lowercase in both
    Spark and DuckDB, so lexicographic compare == numeric compare."""
    return F.substring(
        F.md5(F.concat(F.lit(f"{seed}:"), id_col.cast("string"))),
        1,
        _HEX_WIDTH,
    )


def _threshold_hex(fraction: float) -> str:
    if not 0.0 <= fraction <= 1.0:
        raise ValueError("fraction must be in [0, 1]")
    n = int(round(fraction * 16**_HEX_WIDTH))
    if n >= 16**_HEX_WIDTH:
        # 'g' sorts after every hex digit: keep-all. (The numeric
        # threshold would be 9 chars wide and lexicographic compare
        # against 8-char hashes would DROP hashes starting a-f.)
        return "g"
    return format(n, f"0{_HEX_WIDTH}x")


def _hash_sql(seed: int, id_sql: str) -> str:
    return (
        f"substr(md5('{seed}:' || CAST({id_sql} AS VARCHAR)), 1, "
        f"{_HEX_WIDTH})"
    )


def hash_sample(
    df: DataFrame,
    fraction: float,
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Keep ~``fraction`` of rows, membership = f(seed, id) only."""
    return df.filter(
        _hash_hex(seed, F.col(id_col)) < F.lit(_threshold_hex(fraction))
    )


def hash_sample_oracle_sql(
    fraction: float,
    id_col: str = "doc_id",
    seed: int = 42,
    table: str = "documents",
) -> str:
    return (
        f"SELECT * FROM {table} WHERE {_hash_sql(seed, id_col)} < "
        f"'{_threshold_hex(fraction)}'"
    )


def stratified_sample(
    df: DataFrame,
    strata_cols: Sequence[str],
    n_per_stratum: int,
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Exactly min(n, |stratum|) rows per stratum, uniformly without
    replacement (rank over the seeded hash; id tie-break for the
    astronomically unlikely 32-bit collision)."""
    w_cols = [F.col(c) for c in strata_cols]
    from pyspark.sql import Window

    w = Window.partitionBy(*w_cols).orderBy(
        _hash_hex(seed, F.col(id_col)), F.col(id_col)
    )
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= int(n_per_stratum))
        .drop("__rk")
    )


def stratified_sample_oracle_sql(
    strata_cols: Sequence[str],
    n_per_stratum: int,
    id_col: str = "doc_id",
    seed: int = 42,
    table: str = "documents",
) -> str:
    parts = ", ".join(strata_cols)
    return f"""
    SELECT * EXCLUDE (__rk) FROM (
        SELECT *, row_number() OVER (
            PARTITION BY {parts}
            ORDER BY {_hash_sql(seed, id_col)}, {id_col}
        ) AS __rk
        FROM {table}
    ) WHERE __rk <= {int(n_per_stratum)}
    """


def stratified_fractions(
    df: DataFrame,
    stratum_col: str,
    fractions: Mapping[str, float],
    id_col: str = "doc_id",
    seed: int = 42,
    default_fraction: float = 0.0,
) -> DataFrame:
    """Per-stratum Bernoulli rates — corpus mixture weighting as one
    codegen'd filter (strata absent from ``fractions`` get
    ``default_fraction``)."""
    thr = None
    for name, frac in sorted(fractions.items()):
        cond = F.col(stratum_col) == name
        lit = F.lit(_threshold_hex(frac))
        thr = F.when(cond, lit) if thr is None else thr.when(cond, lit)
    thr = (
        thr.otherwise(F.lit(_threshold_hex(default_fraction)))
        if thr is not None
        else F.lit(_threshold_hex(default_fraction))
    )
    return df.filter(_hash_hex(seed, F.col(id_col)) < thr)


def stratified_fractions_oracle_sql(
    stratum_col: str,
    fractions: Mapping[str, float],
    id_col: str = "doc_id",
    seed: int = 42,
    default_fraction: float = 0.0,
    table: str = "documents",
) -> str:
    whens = " ".join(
        f"WHEN {stratum_col} = '{name}' THEN '{_threshold_hex(frac)}'"
        for name, frac in sorted(fractions.items())
    )
    case = (
        f"(CASE {whens} ELSE '{_threshold_hex(default_fraction)}' END)"
    )
    return (
        f"SELECT * FROM {table} WHERE {_hash_sql(seed, id_col)} < {case}"
    )


def _split_bounds(splits: Mapping[str, float]) -> list[tuple[str, str]]:
    """(name, upper-threshold-hex) pairs in declaration order; the last
    bound is the keep-all sentinel so assignment is EXHAUSTIVE no matter
    how the fractions round."""
    fracs = list(splits.values())
    if any(f < 0 for f in fracs):
        raise ValueError("split fractions must be >= 0")
    total = sum(fracs)
    if not 0.999 <= total <= 1.001:
        raise ValueError(f"split fractions must sum to 1, got {total}")
    names = list(splits.keys())
    bounds, acc = [], 0.0
    for name, frac in zip(names[:-1], fracs[:-1]):
        acc += frac
        bounds.append((name, _threshold_hex(min(acc, 1.0))))
    bounds.append((names[-1], "g"))
    return bounds


def split_assign(
    df: DataFrame,
    splits: Mapping[str, float],
    id_col: str = "doc_id",
    seed: int = 42,
    out_col: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment: one ``out_col`` label
    per row, a pure function of (seed, id) — DISJOINT and EXHAUSTIVE by
    construction (cumulative thresholds over one hash draw), stable
    across cluster size, partitioning, retries, and incremental
    arrivals (a new row's split never depends on what else is in the
    corpus — the property eval-set hygiene needs). One codegen'd
    projection, no shuffle; ``splits`` is ordered ``{name: fraction}``
    summing to 1."""
    h = _hash_hex(seed, F.col(id_col))
    bounds = _split_bounds(splits)
    expr = None
    for name, thr in bounds[:-1]:
        cond = h < F.lit(thr)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = F.lit(bounds[-1][0])
    expr = expr.otherwise(last) if expr is not None else last
    return df.withColumn(out_col, expr)


def split_assign_oracle_sql(
    splits: Mapping[str, float],
    id_col: str = "doc_id",
    seed: int = 42,
    out_col: str = "split",
    table: str = "documents",
) -> str:
    bounds = _split_bounds(splits)
    h = _hash_sql(seed, id_col)
    whens = " ".join(
        f"WHEN {h} < '{thr}' THEN '{name}'" for name, thr in bounds[:-1]
    )
    case = f"(CASE {whens} ELSE '{bounds[-1][0]}' END)" if whens else (
        f"'{bounds[-1][0]}'"
    )
    return f"SELECT *, {case} AS {out_col} FROM {table}"
