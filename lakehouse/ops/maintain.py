"""One-call table maintenance autopilot.

The reference schedules its maintenance as ad-hoc Glue jobs
(/root/reference/README.md:68 names compaction as the perf lever but
ships no scheduler); real lakehouse deployments run a policy loop:
"compact when small files accumulate, fold deletes in when they pile
up, re-cluster when the layout decays, expire old snapshots". This
module is that loop as a library call.

Every DECISION reads only table metadata — manifest entries (file
sizes, sort markers, delete record counts) and the snapshot log — so
the decision pass costs O(files) driver work at any data scale; the
ACTIONS are the existing gated operators (compact / convert_deletes /
materialize_deletes / cluster / expire+GC), each of which already has
its 10^12-row execution shape.

``dry_run=True`` returns the same report without executing anything —
the "what would maintenance do" probe an operator wants before a
production window. Dry-run decisions are all evaluated against the
CURRENT state: an earlier action can subsume a later one when run for
real (e.g. a delete fold-in that rewrites every small file leaves
compaction nothing to do), so the dry-run action list is an upper
bound, not a promise.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Any, Optional, Sequence


@dataclass
class MaintenanceReport:
    actions: list[dict[str, Any]] = field(default_factory=list)
    skipped: list[dict[str, Any]] = field(default_factory=list)
    dry_run: bool = False

    def took(self, name: str) -> bool:
        return any(a["action"] == name for a in self.actions)


def maintain(
    table,
    *,
    dry_run: bool = False,
    target_file_size: int = 128 * 1024 * 1024,
    min_small_files: int = 8,
    cluster_by: Optional[Sequence[str]] = None,
    curve: str = "zorder",
    cluster_stale_fraction: float = 0.5,
    materialize_hidden_fraction: float = 0.10,
    convert_min_delete_files: int = 4,
    expire_keep_last: Optional[int] = None,
    expire_older_than_ms: Optional[int] = None,
    gc: bool = False,
) -> MaintenanceReport:
    """Run whichever maintenance the table currently needs.

    Policy order matters: deletes fold in first (so compaction and
    clustering rewrite final rows), then compaction, then clustering,
    then snapshot expiry + orphan GC (last, so it can reap the files
    the earlier steps retired once they age out).
    """
    rep = MaintenanceReport(dry_run=dry_run)

    def decide(name, fire, reason, metrics, act):
        entry = {"action": name, "reason": reason, **metrics}
        if not fire:
            rep.skipped.append(entry)
            return
        if not dry_run:
            t0 = time.time()
            res = act()
            entry["secs"] = round(time.time() - t0, 2)
            if res is not None and hasattr(res, "__dict__"):
                for k, v in vars(res).items():
                    if isinstance(v, (int, float, str)):
                        entry[k] = v
        rep.actions.append(entry)

    # --- 0. row-retention policy (TTL) -------------------------------------
    # Table property ``retention_filter`` = JSON list of [col, op, value]
    # tuple predicates naming EXPIRED rows (BigQuery partition expiration
    # / Iceberg delete-then-expire restated as a policy the autopilot
    # enforces). Values are static literals — the scheduler that calls
    # maintain() owns the cutoff arithmetic, keeping every run
    # reproducible. Runs FIRST so later rewrites never waste work on
    # expired rows. The decision is metadata-only: a pruned plan under
    # the filter; zero candidate files (stats prove nothing matches —
    # the steady state after one enforcement pass, since COW delete
    # drops fully-expired files metadata-only and rewrites partial ones
    # without the expired rows) skips at zero data cost.
    ret = table.meta.properties.get("retention_filter")
    if ret:
        import json as _json

        flt = [tuple(p) for p in _json.loads(ret)]
        cand = table.plan(filter=flt).files
        decide(
            "retention_delete",
            bool(cand),
            f"retention_filter matches {len(cand)} candidate files",
            {
                "candidate_files": len(cand),
                "candidate_rows": sum(e.record_count for e in cand),
            },
            lambda: table.delete(flt, mode="cow"),
        )

    # --- 1. pending MoR deletes ------------------------------------------
    plan = table.plan()
    data_rows = sum(e.record_count for e in plan.files) or 1
    del_files = plan.delete_files
    hidden = sum(e.record_count for e in del_files)
    frac = hidden / data_rows
    decide(
        "materialize_deletes",
        bool(del_files) and frac >= materialize_hidden_fraction,
        f"hidden-row fraction {frac:.3f} >= {materialize_hidden_fraction}",
        {"delete_files": len(del_files), "hidden_rows": hidden},
        lambda: table.materialize_deletes(),
    )
    if not rep.took("materialize_deletes"):
        decide(
            "convert_deletes",
            len(del_files) >= convert_min_delete_files,
            f"{len(del_files)} pending delete files >= "
            f"{convert_min_delete_files}",
            {"delete_files": len(del_files), "hidden_rows": hidden},
            lambda: table.convert_deletes(),
        )

    # --- 2. small-file compaction ----------------------------------------
    entries = [e for e in table.plan().files]  # refreshed post-fold-in
    small = [e for e in entries if e.file_size_bytes < target_file_size // 2]
    decide(
        "compact",
        len(small) >= min_small_files,
        f"{len(small)} files under {target_file_size // 2} bytes "
        f">= {min_small_files}",
        {"small_files": len(small), "total_files": len(entries)},
        lambda: table.compact(target_file_size=target_file_size),
    )

    # --- 3. clustering decay ----------------------------------------------
    if cluster_by:
        entries = [e for e in table.plan().files]
        marker = f"{curve}({','.join(cluster_by)})"
        stale = [e for e in entries if e.sort_order != marker]
        sfrac = len(stale) / (len(entries) or 1)
        decide(
            "cluster",
            sfrac >= cluster_stale_fraction,
            f"stale-layout fraction {sfrac:.3f} >= "
            f"{cluster_stale_fraction} (marker {marker!r})",
            {"stale_files": len(stale), "total_files": len(entries)},
            lambda: table.cluster(
                list(cluster_by),
                curve=curve,
                target_file_size=target_file_size,
            ),
        )

    # --- 4. snapshot expiry + GC ------------------------------------------
    if expire_keep_last is not None or expire_older_than_ms is not None:
        snaps = table.snapshots()
        decide(
            "expire_snapshots",
            len(snaps) > (expire_keep_last or 1),
            f"{len(snaps)} snapshots retained",
            {"snapshots": len(snaps)},
            lambda: table.expire_snapshots(
                keep_last=expire_keep_last,
                older_than_ms=expire_older_than_ms,
            ),
        )
        if gc:
            decide(
                "remove_orphan_files",
                rep.took("expire_snapshots"),
                "post-expiry reachability sweep",
                {},
                lambda: table.remove_orphan_files(),
            )

    # --- 5. statistics refresh (ANALYZE scheduling) -------------------------
    # Table property ``analyze_columns`` = CSV of columns whose NDV
    # sketches + equi-depth histograms the autopilot keeps fresh
    # (Iceberg deployments schedule ANALYZE the same way). The decision
    # is metadata-only: stats are stale when a DATA-changing snapshot
    # (appends/deletes/merges — data-neutral rewrites don't move row
    # statistics) landed after the newest persisted stats file, or a
    # listed column has never been analyzed. Histogram columns must be
    # numeric (the property owner's contract; NDV works on any type).
    ana = table.meta.properties.get("analyze_columns")
    if ana:
        from .analyze import read_histograms, read_stats
        from .changes import DATA_NEUTRAL_OPS

        cols = [c.strip() for c in str(ana).split(",") if c.strip()]
        cur = table.current_snapshot_id()
        basis = None  # newest data-changing snapshot
        for s in table.snapshots():
            if s.operation not in DATA_NEUTRAL_OPS:
                basis = max(basis or 0, s.snapshot_id)
        ndv_sid, ndv = read_stats(table.root, at_or_before=cur)
        h_sid, hists = read_histograms(table.root, at_or_before=cur)
        stale = basis is not None and (
            ndv_sid is None
            or ndv_sid < basis
            or h_sid is None
            or h_sid < basis
            or any(c not in ndv for c in cols)
            or any(c not in hists for c in cols)
        )

        def _refresh():
            table.analyze(cols)
            table.analyze_histograms(cols)

        decide(
            "analyze",
            stale,
            f"stats (ndv@{ndv_sid}, hist@{h_sid}) behind last data "
            f"change @{basis}",
            {"columns": ",".join(cols)},
            _refresh,
        )
    return rep
