"""Write-time sort orders (Iceberg SortOrder analog).

A table property — ``write.sort-order`` = JSON list of column names —
that every row-writing path funnelling through ``write_data_files``
honors: when a write shuffles (``target_file_count`` set), rows are
RANGE-partitioned on (partition columns, sort columns) and sorted
within tasks, so files in the same partition directory cover disjoint
sort-key ranges. That turns per-file min/max stats into an index: a
point or range predicate on the sort key keeps O(1) of N files where
unsorted appends keep all N (gated in tests/test_sortorder.py).

Contrast with Z-order clustering (``ops/cluster.py``): a sort order is
cheap insurance applied AT WRITE TIME to each append's slice of data;
clustering is a maintenance REWRITE that reorders the whole table and
handles multi-column locality. Iceberg draws the same line
(write.sort-order vs rewriteDataFiles sort/zorder strategies). Range
partitioning also replaces hash-salting as the oversized-partition
splitter: a hot partition value splits by key range instead of by an
opaque salt, keeping the split files prunable.

No-shuffle writes (the streaming append path) get a task-local
``sortWithinPartitions`` only — still row-group-friendly, no extra
exchange on the hot path.
"""

from __future__ import annotations

import json
from typing import Sequence

SORT_ORDER_PROP = "write.sort-order"


def sort_order_of(properties: dict) -> list[str]:
    raw = (properties or {}).get(SORT_ORDER_PROP)
    if not raw:
        return []
    cols = json.loads(raw)
    if not isinstance(cols, list) or not all(
        isinstance(c, str) for c in cols
    ):
        raise ValueError(f"malformed {SORT_ORDER_PROP}: {raw!r}")
    return cols


def sort_order_property(columns: Sequence[str]) -> dict:
    return {SORT_ORDER_PROP: json.dumps(list(columns)) if columns else None}


def provenance_tag(columns: Sequence[str]) -> str:
    return f"sorted({','.join(columns)})"
