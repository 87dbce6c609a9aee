"""Engine error hierarchy.

The reference delegates all table-format failure modes to the Delta jar
(/root/reference/etl/glue_stream.py:341); we surface them as typed errors.
"""


class LakehouseError(Exception):
    """Base class for all engine errors."""


class TableNotFoundError(LakehouseError):
    """No table metadata at the given location."""


class TableAlreadyExistsError(LakehouseError):
    """create_table over an existing table without overwrite."""


class CommitConflictError(LakehouseError):
    """Optimistic commit lost the race and could not be rebased."""


class SnapshotNotFoundError(LakehouseError):
    """Requested snapshot id is unknown or has been expired."""


class SchemaEvolutionError(LakehouseError):
    """Non-additive (incompatible) schema change rejected."""


class MergeError(LakehouseError):
    """MERGE INTO semantic violation (e.g. duplicate source keys)."""


class ValidationError(LakehouseError):
    """Row-level payload validation failure (audio decode, schema conform)."""


class RefError(LakehouseError):
    """Branch/tag ref violation (unknown ref, tag write, bad fast-forward)."""


class ConstraintViolationError(LakehouseError):
    """ADD CONSTRAINT rejected: existing rows violate the expression."""
