"""Per-file Bloom-filter sidecars: point-lookup file skipping.

Min/max stats (meta/manifests.py) prune range predicates well only when
files are clustered on the probed column; a point lookup on an UNSORTED
key (``clip_id = 'x'`` over freshly-appended files whose key ranges all
overlap) keeps every file. The standard lakehouse lever is a per-file
Bloom filter on designated columns — Iceberg stores these as Puffin
blob files next to the data, Delta as BloomFilterIndex sidecars; the
reference consumes the capability wholesale from its Delta jar. Here:

- **opt-in** via the table property ``bloom_columns`` (list of column
  names), set at ``Table.create`` or later via properties.
- **built at stats-harvest time** (ops/append.py:harvest_stats): every
  write/rewrite path already opens each produced file once for footer
  stats; blooms add one column-pruned read of just the designated
  columns. The bitset is written as a JSON sidecar ``<file>.bloom``
  next to the data file (never inline in manifests — at 10 bits/key a
  1M-row file needs ~1.2 MB, which would bloat manifests from ~1 KB to
  ~1 MB per entry). The manifest entry records only a ``bloom: true``
  marker per column, so planning knows which sidecars exist without
  listing storage.
- **consulted at plan time** for ``=`` / ``in`` predicates, AFTER
  partition + min/max pruning and only while the surviving candidate
  set is small (``BLOOM_PROBE_CAP``): a point lookup post-pruning has
  bounded candidates, while a low-selectivity scan skips the sidecar
  IO entirely. A Bloom "no" is definite (file skipped); a "maybe"
  keeps the file — strictly a superset optimization, results never
  change. The distributed planner applies the same test executor-side
  (shared storage), with no cap.
- **GC-aware**: ops/expire.py treats ``X.parquet.bloom`` as live iff
  ``X.parquet`` is live, so sidecars follow their data file through
  orphan collection.

Hashing is ``pandas.util.hash_array`` (vectorized SipHash, fixed key —
deterministic across processes) over values canonicalized to strings,
so probe-side and build-side agree regardless of the Python/Arrow type
a value arrives as. Double hashing h1 + i*h2 derives k=7 probe
positions; the bitset is sized at ~10 bits/key (≈1% false positives),
capped at 1 MiB per column per file.
"""

from __future__ import annotations

import base64
import json
import os
from typing import Any, Iterable, Mapping, Optional

import numpy as np

SIDECAR_SUFFIX = ".bloom"
BLOOM_PROBE_CAP = 4096  # max surviving files worth driver sidecar IO
_K = 7
_BITS_PER_KEY = 10
_MIN_BITS = 1 << 10
_MAX_BITS = 1 << 23  # 1 MiB bitset cap


def sidecar_path(data_path: str) -> str:
    return data_path + SIDECAR_SUFFIX


def bloom_columns_property(properties: Optional[Mapping[str, Any]]) -> list[str]:
    """Parse the ``bloom_columns`` table property (list or CSV string)."""
    raw = (properties or {}).get("bloom_columns")
    if not raw:
        return []
    if isinstance(raw, str):
        return [c.strip() for c in raw.split(",") if c.strip()]
    return [str(c) for c in raw]


# two independent SipHash keys (16 bytes each): with a power-of-two m,
# ``pos_i = (h1 + i*h2) mod m`` uses only low bits, and deriving h2
# arithmetically from h1 would make every position a function of
# h1 mod m alone — any low-bit collision then hits ALL k positions
# (measured ~7.5% FP at n=5000/m=2^16). Independent hashes restore the
# textbook Kirsch-Mitzenmacher guarantee (~0.2% there).
_KEY1 = "lakehouse-bloom1"
_KEY2 = "lakehouse-bloom2"


def _canon(v: Any) -> str:
    """One canonical string per LOGICAL value, whatever Python/Arrow
    type it arrives as. A bloom "no" is a definite skip, so build-side
    and probe-side must agree even across types: ``5`` (int),
    ``np.int64(5)`` and ``5.0`` (a double column probed with an int
    literal) must hash identically, and tz-aware timestamps (Arrow
    read-back) must match the naive literals predicates carry."""
    import datetime as dt

    if isinstance(v, bool):  # before int: bool is an int subclass
        return str(v)
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if isinstance(v, (float, np.floating)):
        f = float(v)
        return str(int(f)) if f.is_integer() else repr(f)
    if isinstance(v, dt.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(dt.timezone.utc).replace(tzinfo=None)
        return v.isoformat(sep=" ")
    if isinstance(v, dt.date):
        return v.isoformat()
    return str(v)


def _hash64(values: Iterable[Any], key: str = _KEY1) -> np.ndarray:
    """Deterministic vectorized 64-bit hash of canonicalized values.

    None maps to a reserved token that equality predicates never probe
    (``= NULL`` matches nothing, and IS NULL pruning uses null counts,
    not blooms).
    """
    import pandas as pd
    from pandas.util import hash_array

    canon = np.array(
        ["\x00null" if v is None else _canon(v) for v in values],
        dtype=object,
    )
    return hash_array(canon, categorize=False, hash_key=key)


def build_bloom(values: Iterable[Any]) -> dict[str, Any]:
    """Bitset over the values of one column of one file."""
    vals = list(values)
    h = _hash64(vals)
    n = max(1, len(h))
    m = 1 << int(np.ceil(np.log2(n * _BITS_PER_KEY)))
    m = max(_MIN_BITS, min(_MAX_BITS, m))
    h2 = _hash64(vals, _KEY2) | np.uint64(1)
    bits = np.zeros(m, dtype=bool)
    for i in range(_K):
        bits[(h + np.uint64(i) * h2) % np.uint64(m)] = True
    return {
        "m": int(m),
        "k": _K,
        "bits": base64.b64encode(np.packbits(bits).tobytes()).decode(),
    }


def probe_hashes(values: Iterable[Any]) -> Optional[tuple[np.ndarray, np.ndarray]]:
    """Hash a probe set ONCE for testing against many blooms (the MERGE
    touched-file refinement tests one key batch against every candidate
    file). None when nothing probes (all-null)."""
    probes = [p for p in values if p is not None]
    if not probes:
        return None
    return _hash64(probes), _hash64(probes, _KEY2) | np.uint64(1)


def unpack_bloom(bloom: Mapping[str, Any]) -> tuple[np.ndarray, np.uint64, int]:
    """Decode a sidecar bloom once per task: (bitset, m, k)."""
    bits = np.unpackbits(
        np.frombuffer(base64.b64decode(bloom["bits"]), dtype=np.uint8)
    ).astype(bool)
    return bits, np.uint64(int(bloom["m"])), int(bloom["k"])


def unpacked_contains_any(
    unpacked: tuple[np.ndarray, np.uint64, int],
    hashes: tuple[np.ndarray, np.ndarray],
) -> bool:
    bits, m, k = unpacked
    h, h2 = hashes
    ok = np.ones(len(h), dtype=bool)
    for i in range(k):
        ok &= bits[(h + np.uint64(i) * h2) % m]
        if not ok.any():
            return False
    return True


def might_contain_any(bloom: Mapping[str, Any], probes: Iterable[Any]) -> bool:
    """False only when NO probe value can be in the file (definite skip)."""
    hashes = probe_hashes(probes)
    if hashes is None:
        return True  # '=' NULL never probes; stay conservative
    return unpacked_contains_any(unpack_bloom(bloom), hashes)


def write_sidecar(data_abs_path: str, blooms: Mapping[str, dict]) -> None:
    with open(sidecar_path(data_abs_path), "w") as f:
        json.dump(dict(blooms), f)


def read_sidecar(data_abs_path: str) -> Optional[dict[str, dict]]:
    try:
        with open(sidecar_path(data_abs_path)) as f:
            return json.load(f)
    except (OSError, json.JSONDecodeError):
        return None  # missing/corrupt sidecar -> no skipping, still correct


def build_file_blooms(
    data_abs_path: str, columns: Iterable[str]
) -> dict[str, dict]:
    """Column-pruned read of one parquet file → one bloom per column."""
    import pyarrow.parquet as pq

    pf = pq.ParquetFile(data_abs_path)
    have = [c for c in columns if c in pf.schema_arrow.names]
    if not have:
        return {}
    tbl = pq.read_table(data_abs_path, columns=have)
    return {c: build_bloom(tbl.column(c).to_pylist()) for c in have}


def harvest_file_blooms(entry, table_root: str, columns: Iterable[str]) -> None:
    """Build + persist sidecar for one manifest entry; mark stats."""
    columns = list(columns)
    if not columns or entry.is_delete:
        return
    abs_path = os.path.join(table_root, entry.file_path)
    blooms = build_file_blooms(abs_path, columns)
    if not blooms:
        return
    write_sidecar(abs_path, blooms)
    for c in blooms:
        entry.stats.setdefault(c, {"rows": entry.record_count})
        entry.stats[c]["bloom"] = True


def eq_probes(preds) -> list[tuple[str, list[Any]]]:
    """(col, probe-values) for each bloom-testable predicate: ``=`` is a
    single probe, ``in`` is any-of. Distinct predicates AND together;
    each must independently pass the file's bloom."""
    out = []
    for p in preds:
        if p.op == "=" and p.value is not None:
            out.append((p.col, [p.value]))
        elif p.op == "in" and p.value:
            out.append((p.col, list(p.value)))
    return out


def entry_passes_blooms(
    entry_stats: Mapping[str, Mapping[str, Any]],
    sidecar: Optional[Mapping[str, Mapping[str, Any]]],
    probes: Iterable[tuple[str, list[Any]]],
) -> bool:
    """Shared test for driver and executor pruning paths."""
    for col, values in probes:
        if not (entry_stats.get(col) or {}).get("bloom"):
            continue  # no bloom for this column on this file
        b = (sidecar or {}).get(col)
        if b and not might_contain_any(b, values):
            return False
    return True
