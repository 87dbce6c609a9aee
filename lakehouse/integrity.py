"""Referential-integrity audit: FK orphan detection across tables.

The post-ingest data-quality sweep every warehouse runs ("does every
fact row still have its dimension row?") — the reference trusts its
registry schema and never validates cross-table consistency; a
10^12-row lakehouse ingesting from at-least-once streams cannot.

Scale shape: parent keys reduce to DISTINCT before the join (one
narrow shuffle of the key column only), then orphans are ONE left-anti
equi-join per relationship — no broadcast hints (a dimension can be
corpus-scaled; AQE picks broadcast when it measures small). Null child
keys are reported separately, not counted as orphans (SQL FK
semantics: NULL references nothing and violates nothing).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def orphan_rows(
    child: DataFrame,
    parent: DataFrame,
    on: Sequence[tuple],
) -> DataFrame:
    """Child rows whose FK has no matching parent row. ``on`` is a list
    of ``(child_col, parent_col)`` pairs (composite keys supported).
    Rows with any NULL key column are excluded (they violate NOT NULL,
    not referential integrity — count them via ``integrity_report``)."""
    on = [tuple(p) for p in on]
    if not on:
        raise ValueError("orphan_rows: need at least one key pair")
    pk = parent.select(
        *[F.col(pc).alias(cc) for cc, pc in on]
    ).dropDuplicates([cc for cc, _pc in on])
    nn = child
    for cc, _pc in on:
        nn = nn.filter(F.col(cc).isNotNull())
    return nn.join(pk, [cc for cc, _pc in on], "left_anti")


def integrity_report(
    relationships: Sequence[tuple],
) -> DataFrame:
    """One row per FK relationship: child rows, null-key rows, orphan
    rows, distinct missing keys. ``relationships`` is a list of
    ``(name, child_df, parent_df, on_pairs)``. Each relationship costs
    one pass over the child and one distinct over the parent keys —
    relationships are independent, so Spark schedules them as separate
    jobs (union of bounded one-row aggregates)."""
    outs = []
    for name, child, parent, on in relationships:
        on = [tuple(p) for p in on]
        key_cols = [cc for cc, _pc in on]
        null_pred = None
        for cc in key_cols:
            c = F.col(cc).isNull()
            null_pred = c if null_pred is None else (null_pred | c)
        orph = orphan_rows(child, parent, on)
        stats = orph.agg(
            F.count(F.lit(1)).alias("orphan_rows"),
            F.count_distinct(*[F.col(c) for c in key_cols]).alias(
                "missing_keys"
            ),
        ).crossJoin(
            child.agg(
                F.count(F.lit(1)).alias("child_rows"),
                F.sum(
                    F.when(null_pred, F.lit(1)).otherwise(F.lit(0))
                ).alias("null_key_rows"),
            )
        )
        outs.append(
            stats.select(
                F.lit(name).alias("relationship"),
                "child_rows",
                F.col("null_key_rows").cast("long").alias("null_key_rows"),
                "orphan_rows",
                "missing_keys",
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out
