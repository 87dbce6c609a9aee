"""Zero-copy table clone (Delta SHALLOW/CLONE, Iceberg snapshot-migrate).

Materializing a dev/test/rollback copy of a 10^12-row table by
rewriting it is a full-table copy job; CLONE instead creates a brand-new
independent table whose first snapshot references the SAME immutable
file bytes:

- every live file of the pinned source snapshot (data files, equality
  and positional delete files, and their ``.bloom`` sidecars) is
  hardlinked into the clone's directory at the same relative path
  (``os.link`` = one metadata syscall, zero data bytes; cross-device
  falls back to a copy),
- the source's manifest parquet files are themselves immutable, so they
  are hardlinked too — entries (stats, partition values, seq, spec_id,
  schema_id, adoption fills) carry over verbatim, which preserves
  merge-on-read semantics exactly: delete-file sequence numbers keep
  their ordering because the clone's snapshot id equals the source's,
  and later clone commits get strictly larger ids,
- ONE new metadata json is published with a fresh table_uuid: full
  schema history, partition-spec history, sort orders and properties are
  copied; refs are NOT (tags/branches pin snapshots the clone does not
  carry).

After the clone, the two tables share inodes but no metadata: appends,
MERGE, compaction, expiry+GC on either side never disturb the other —
GC unlinks its own directory entry and the inode survives while the
sibling still references it (the same discipline ``add_files`` adoption
relies on, lakehouse/ops/adopt.py).

Scale shape: O(live files) driver-side link syscalls plus O(manifests)
links and one json write — no Spark job, no file reads, independent of
row count. The reference's only copy story is re-running the Glue job
over the old bucket (full read + rewrite, /root/reference/README.md);
clone does the same onboarding in metadata time.
"""

from __future__ import annotations

import os
import shutil
import uuid
from dataclasses import dataclass
from typing import Optional

from ..bloom import sidecar_path
from ..errors import TableAlreadyExistsError
from ..meta import snapshots as S
from ..meta.manifests import read_manifest


@dataclass
class CloneResult:
    dest_root: str
    snapshot_id: int
    files_linked: int
    files_copied: int
    manifests: int
    bytes_referenced: int


def _link_or_copy(src: str, dst: str) -> bool:
    """Hardlink ``src`` to ``dst`` (copy on cross-device); True = linked."""
    os.makedirs(os.path.dirname(dst), exist_ok=True)
    try:
        os.link(src, dst)
        return True
    except OSError:
        shutil.copy2(src, dst)
        return False


def clone_table(
    table,
    dest_root: str,
    *,
    snapshot_id: Optional[int] = None,
    properties: Optional[dict] = None,
) -> CloneResult:
    """Clone ``table`` (at ``snapshot_id`` or current) into ``dest_root``.

    Returns a :class:`CloneResult`; load the new table with
    ``Table.load(spark, dest_root)``. An empty source (no snapshots)
    clones to an empty table with the same schema/spec/properties.
    """
    dest_root = os.path.abspath(dest_root)
    if S.list_versions(dest_root):
        raise TableAlreadyExistsError(dest_root)
    meta = table.meta
    os.makedirs(S.metadata_dir(dest_root), exist_ok=True)

    extra = dict(properties or {})
    extra.setdefault("clone_source", table.root)
    snapshots: list[S.Snapshot] = []
    current_sid = None
    linked = copied = n_manifests = 0
    bytes_ref = 0

    if meta.current_snapshot_id is not None:
        snap = meta.snapshot(snapshot_id)
        extra.setdefault("clone_source_snapshot", snap.snapshot_id)
        manifests = S.read_manifest_list(table.root, snap.manifest_list)
        seen: set[str] = set()
        for m in manifests:
            # manifest parquet files are immutable — link them verbatim
            if _link_or_copy(
                os.path.join(table.root, m["path"]),
                os.path.join(dest_root, m["path"]),
            ):
                linked += 1
            else:
                copied += 1
            n_manifests += 1
            for e in read_manifest(table.root, m["path"]):
                if e.file_path in seen:
                    continue  # pos-delete files can appear per target
                seen.add(e.file_path)
                bytes_ref += e.file_size_bytes
                if _link_or_copy(
                    os.path.join(table.root, e.file_path),
                    os.path.join(dest_root, e.file_path),
                ):
                    linked += 1
                else:
                    copied += 1
                side = os.path.join(table.root, sidecar_path(e.file_path))
                if os.path.isfile(side):
                    if _link_or_copy(
                        side,
                        os.path.join(dest_root, sidecar_path(e.file_path)),
                    ):
                        linked += 1
                    else:
                        copied += 1
        mlist = S.write_manifest_list(dest_root, snap.snapshot_id, manifests)
        snapshots = [
            S.Snapshot(
                snapshot_id=snap.snapshot_id,
                parent_snapshot_id=None,
                timestamp_ms=S.now_ms(),
                operation="clone",
                manifest_list=mlist,
                schema_id=snap.schema_id,
                summary={
                    "clone_source": table.root,
                    "clone_source_snapshot": snap.snapshot_id,
                    "files_linked": linked,
                    "files_copied": copied,
                    "bytes_referenced": bytes_ref,
                },
            )
        ]
        current_sid = snap.snapshot_id

    # a clone pinned at an OLD snapshot adopts that snapshot's schema as
    # its current one (Iceberg time-travel reads bind the snapshot's
    # schema-id); the full schema history still carries over so field-id
    # mapping resolves pre-rename physical names in old files.
    cur_schema_id = (
        snapshots[0].schema_id if snapshots else meta.current_schema_id
    )
    schema_json = (
        meta.schemas[cur_schema_id]
        if 0 <= cur_schema_id < len(meta.schemas)
        else meta.schema_json
    )
    new_meta = S.TableMetadata(
        table_uuid=uuid.uuid4().hex,
        location=dest_root,
        version=0,
        schema_json=schema_json,
        partition_spec=list(meta.partition_spec),
        schemas=list(meta.schemas),
        current_schema_id=cur_schema_id,
        current_snapshot_id=current_sid,
        snapshots=snapshots,
        properties={**meta.properties, **extra},
        partition_specs=[list(s) for s in meta.partition_specs],
        default_spec_id=meta.default_spec_id,
        refs={},
    )
    # losing a concurrent-clone race leaves this attempt's hardlinks in
    # place (zero data bytes — just directory entries); do NOT clean up:
    # the winner's table shares the same paths, so removal would corrupt
    # it. The entry check above makes this window race-only.
    if not S._try_publish(dest_root, 1, {**new_meta.to_json(), "version": 1}):
        raise TableAlreadyExistsError(dest_root)
    return CloneResult(
        dest_root=dest_root,
        snapshot_id=current_sid if current_sid is not None else 0,
        files_linked=linked,
        files_copied=copied,
        manifests=n_manifests,
        bytes_referenced=bytes_ref,
    )
