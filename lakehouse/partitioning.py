"""Partition spec + transforms (identity / day / month / bucket / truncate).

The reference partitions its bronze table by a derived date column —
``partitionBy("event_date")`` with ``event_date = to_date(event_ts)``
(/root/reference/etl/glue_stream.py:239,346). We generalize that to an
Iceberg-style partition *spec*: named transforms over source columns,
recorded in table metadata, applied as Catalyst expressions at write time.

Data files stay **self-contained**: the physical layout duplicates each
partition value into a ``_p_<name>=<value>`` directory (for humans and
Hive-style tools) while the source column remains inside the Parquet
file, so a planned multi-file read needs no partition-value
reconstruction and per-file min/max stats still cover the source column.
"""

from __future__ import annotations

import datetime as _dt
import urllib.parse
from typing import Any, Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

PART_PREFIX = "_p_"
HIVE_NULL = "__HIVE_DEFAULT_PARTITION__"


def partition_field_expr(field: Mapping[str, Any]) -> Column:
    """Catalyst expression computing one partition field."""
    transform = field.get("transform", "identity")
    src = F.col(field["source"])
    if transform == "identity":
        return src
    if transform == "day":
        return F.to_date(src)
    if transform == "month":
        return F.date_format(src, "yyyy-MM")
    if transform == "hour":
        return F.date_format(src, "yyyy-MM-dd-HH")
    if transform == "bucket":
        n = int(field["n"])
        return F.pmod(F.xxhash64(src), F.lit(n)).cast("int")
    if transform == "truncate":
        n = int(field["n"])
        return F.substring(src.cast("string"), 1, n)
    raise ValueError(f"unknown partition transform: {transform!r}")


def with_partition_columns(
    df: DataFrame, spec: Sequence[Mapping[str, Any]]
) -> tuple[DataFrame, list[str]]:
    """Append ``_p_<name>`` columns for each spec field; returns (df, names)."""
    names = []
    for field in spec:
        name = PART_PREFIX + field["name"]
        df = df.withColumn(name, partition_field_expr(field))
        names.append(name)
    return df, names


def encode_partition_value(value: Any) -> Any:
    """JSON-safe, order-preserving encoding (matches manifests stats)."""
    if isinstance(value, _dt.datetime):
        return value.isoformat(sep=" ")
    if isinstance(value, _dt.date):
        return value.isoformat()
    return value


def decode_dir_value(raw: str, spec_field: Mapping[str, Any]) -> Any:
    """Decode a hive-style directory value back to its manifest encoding."""
    val = urllib.parse.unquote(raw)
    if val == HIVE_NULL:
        return None
    transform = spec_field.get("transform", "identity")
    if transform == "bucket":
        return int(val)
    # dates/timestamps already serialize as ISO strings in dir names;
    # numeric identity partitions need their type back
    typ = spec_field.get("result_type")
    if typ in ("int", "long"):
        return int(val)
    if typ == "double":
        return float(val)
    return val


def spec_with_result_types(
    spec: Sequence[Mapping[str, Any]], schema: T.StructType
) -> list[dict[str, Any]]:
    """Annotate spec fields with the partition value's primitive type so
    directory values round-trip (stored once in table metadata)."""
    out = []
    for field in spec:
        field = dict(field)
        transform = field.get("transform", "identity")
        if transform == "bucket":
            field["result_type"] = "int"
        elif transform in ("month", "hour", "truncate"):
            field["result_type"] = "string"
        elif transform == "day":
            field["result_type"] = "date"
        else:
            src_type = schema[field["source"]].dataType
            field["result_type"] = src_type.simpleString()
        out.append(field)
    return out
