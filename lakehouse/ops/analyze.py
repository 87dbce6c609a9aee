"""ANALYZE TABLE: per-column NDV (distinct count) sketches.

Iceberg publishes per-column NDV in Puffin stats files (theta
sketches); engines feed it to cost-based join planning. This is the
engine's counterpart, built on the K-Minimum-Values sketch
(Bar-Yossef et al. 2002) — simpler than theta/HLL, fully mergeable,
and exactly reproducible from the data given the hash:

- one column-pruned pass per analyzed column computes the k smallest
  ``xxhash64`` values; the Spark plan is scan → project(hash) →
  TakeOrderedAndProject — a distributed top-k, never a full sort, and
  payload columns are never read;
- fewer than k survivors ⇒ the column's distinct hash count IS the
  (hash-exact) NDV; otherwise the KMV estimator
  ``(k-1) / normalize(kth smallest)`` with expected relative error
  ``~1/sqrt(k-2)`` (k=1024 → ~3%);
- the k-value lists are persisted per snapshot under
  ``metadata/stats/``: two analyses MERGE by unioning lists and
  re-taking the k smallest, so incremental maintenance at 10^12 rows
  is append-only (re-analyze only new files, merge sketches).

``approx_ndv`` answers from the newest stats file at-or-before the
current snapshot — zero data read — and falls back to a fresh analyze.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import Any, Optional, Sequence

from pyspark.sql import functions as F

KMV_K = 1024
_STATS_DIR = "metadata/stats"


@dataclass
class ColumnNdv:
    column: str
    ndv: float          # estimate (exact when exact=True)
    exact: bool         # True when the sketch saw < k distinct hashes
    k: int
    sketch: list[int]   # the k (or fewer) smallest xxhash64 values


def _estimate(hashes: list[int], k: int) -> tuple[float, bool]:
    """KMV estimate from the sorted k-min hash list."""
    uniq = sorted(set(hashes))
    if len(uniq) < k:
        return float(len(uniq)), True
    # normalize signed 64-bit hash to (0, 1]
    kth = (uniq[k - 1] + 2**63 + 1) / 2.0**64
    return (k - 1) / kth, False


def analyze(
    table,
    columns: Sequence[str],
    *,
    k: int = KMV_K,
    snapshot_id: Optional[int] = None,
) -> dict[str, ColumnNdv]:
    """Compute + persist NDV sketches for ``columns`` at a snapshot.

    One Spark job per column: TakeOrderedAndProject over the hashed,
    column-pruned scan — O(k) driver memory per column regardless of
    table size. NULLs are excluded (COUNT DISTINCT semantics)."""
    names = {f.name for f in table.schema.fields}
    missing = [c for c in columns if c not in names]
    if missing:
        raise ValueError(f"unknown column(s): {missing}")
    sid = (
        snapshot_id
        if snapshot_id is not None
        else table.current_snapshot_id()
    )
    out: dict[str, ColumnNdv] = {}
    for c in columns:
        rows = (
            table.scan(snapshot_id=snapshot_id, columns=[c])
            .filter(F.col(c).isNotNull())
            .select(F.xxhash64(F.col(c)).alias("__h"))
            # KMV is defined over DISTINCT hash values: without this a
            # heavy hitter's repeated hash floods the k-minimum set and
            # the estimate collapses to ~#heavy-hitters. distinct() is
            # a partial-aggregated shuffle of ONE long column, then the
            # top-k is still TakeOrderedAndProject (gated).
            .distinct()
            .orderBy("__h")
            .limit(int(k))
            .collect()
        )
        hashes = [r["__h"] for r in rows]
        est, exact = _estimate(hashes, int(k))
        out[c] = ColumnNdv(c, est, exact, int(k), sorted(set(hashes)))
    _write_stats(table.root, sid, out)
    return out


def merge_sketches(a: ColumnNdv, b: ColumnNdv) -> ColumnNdv:
    """Union two KMV sketches of the same column (k of the smaller)."""
    if a.column != b.column:
        raise ValueError("cannot merge sketches of different columns")
    k = min(a.k, b.k)
    merged = sorted(set(a.sketch) | set(b.sketch))[:k]
    est, exact = _estimate(merged, k)
    return ColumnNdv(a.column, est, exact, k, merged)


def _stats_path(root: str, sid: Optional[int]) -> str:
    return os.path.join(root, _STATS_DIR, f"ndv-{sid or 0}.json")


def _write_stats(
    root: str, sid: Optional[int], stats: dict[str, ColumnNdv]
) -> None:
    os.makedirs(os.path.join(root, _STATS_DIR), exist_ok=True)
    path = _stats_path(root, sid)
    merged: dict[str, Any] = {}
    if os.path.exists(path):  # keep other columns analyzed earlier
        with open(path) as f:
            merged = json.load(f)
    for c, nd in stats.items():
        merged[c] = {
            "ndv": nd.ndv,
            "exact": nd.exact,
            "k": nd.k,
            "sketch": nd.sketch,
        }
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(merged, f)
    os.replace(tmp, path)


def read_stats(
    root: str, *, at_or_before: Optional[int] = None
) -> tuple[Optional[int], dict[str, ColumnNdv]]:
    """Newest persisted sketch file at-or-before a snapshot id."""
    d = os.path.join(root, _STATS_DIR)
    if not os.path.isdir(d):
        return None, {}
    sids = sorted(
        int(n[4:-5])
        for n in os.listdir(d)
        if n.startswith("ndv-") and n.endswith(".json")
    )
    if at_or_before is not None:
        sids = [s for s in sids if s <= at_or_before]
    if not sids:
        return None, {}
    sid = sids[-1]
    with open(_stats_path(root, sid)) as f:
        raw = json.load(f)
    return sid, {
        c: ColumnNdv(c, v["ndv"], v["exact"], v["k"], v["sketch"])
        for c, v in raw.items()
    }


def approx_ndv(table, column: str, *, max_staleness: int = 0) -> float:
    """NDV for a column: persisted sketch when fresh enough (zero data
    read), else a fresh single-column analyze. ``max_staleness`` = how
    many snapshots old the stats file may be (0 = current only)."""
    cur = table.current_snapshot_id()
    sid, stats = read_stats(table.root, at_or_before=cur)
    if (
        sid is not None
        and column in stats
        and cur is not None
        and _snapshots_between(table, sid, cur) <= max_staleness
    ):
        return stats[column].ndv
    return analyze(table, [column])[column].ndv


def _snapshots_between(table, a: int, b: int) -> int:
    ids = [s.snapshot_id for s in table.snapshots()]
    return len([i for i in ids if a < i <= b])
