"""lakehouse — a from-scratch PySpark-native lakehouse table-maintenance
engine (Iceberg-style metadata over Parquet) for audio-clip + transcript
tables.

Built against the capabilities of ``waleadekoya/realtime-clickstream-lakehouse``
(/root/reference): what that repo delegates to the Delta Lake jar —
ACID appends, snapshot isolation, time travel, partition/stats pruning,
OPTIMIZE-style compaction, Z-order clustering, VACUUM, MERGE — is
implemented here in pure ``pyspark.sql`` + Arrow UDFs + a small
pure-Python metadata core. See SURVEY.md for the full mapping.
"""

from .errors import (
    CommitConflictError,
    LakehouseError,
    MergeError,
    RefError,
    SchemaEvolutionError,
    SnapshotNotFoundError,
    TableAlreadyExistsError,
    TableNotFoundError,
    ValidationError,
)
from .catalog import Catalog, CatalogError
from .expressions import Predicate
from .schema import CLICK_EVENT_SCHEMA, CLIPS_SCHEMA, conform
from .table import Table
from .txn import Transaction, TransactionError

__all__ = [
    "Table",
    "Catalog",
    "CatalogError",
    "Transaction",
    "TransactionError",
    "Predicate",
    "conform",
    "CLIPS_SCHEMA",
    "CLICK_EVENT_SCHEMA",
    "LakehouseError",
    "CommitConflictError",
    "MergeError",
    "RefError",
    "SchemaEvolutionError",
    "SnapshotNotFoundError",
    "TableAlreadyExistsError",
    "TableNotFoundError",
    "ValidationError",
]

__version__ = "0.1.0"
