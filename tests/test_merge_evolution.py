"""MERGE with schema_evolution=True (Delta's withSchemaEvolution):
new source columns are added metadata-only before the merge, safely-
widenable types widen, and the merge lands under the evolved schema.
Default (flag off) keeps Delta's default too: unknown columns dropped."""

import pyspark.sql.functions as F
import pytest
from pyspark.sql import types as T

from lakehouse import Table
from lakehouse.errors import MergeError

SCHEMA = T.StructType(
    [
        T.StructField("uid", T.LongType()),
        T.StructField("v", T.IntegerType()),
    ]
)


def _mk(spark, root, rows=20):
    t = Table.create(spark, str(root), SCHEMA)
    t.append(
        spark.range(rows).select(
            F.col("id").alias("uid"), F.col("id").cast("int").alias("v")
        ),
        target_file_count=2,
    )
    return t


def _src_extra(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("uid"),
        (F.col("id") + 100).cast("int").alias("v"),
        F.concat(F.lit("tag"), F.col("id").cast("string")).alias("extra"),
    )


@pytest.mark.parametrize("mode", ["cow", "mor"])
def test_new_column_added_and_populated(spark, tmp_path, mode):
    t = _mk(spark, tmp_path / mode)
    t.merge(
        _src_extra(spark, 15, 25), key="uid", mode=mode,
        schema_evolution=True,
    )
    assert [f.name for f in t.schema.fields] == ["uid", "v", "extra"]
    out = t.scan()
    assert out.count() == 25
    # merged rows carry the new column, pre-existing rows read null
    assert out.filter("extra IS NOT NULL").count() == 10
    assert out.filter("uid < 15 AND extra IS NOT NULL").count() == 0
    assert out.filter("uid = 20 AND extra = 'tag20'").count() == 1
    # the evolution itself was a metadata-only commit before the merge
    ops = [s.operation for s in t.meta.snapshots]
    assert "evolve-schema" in ops


def test_type_widening(spark, tmp_path):
    t = _mk(spark, tmp_path / "w")
    src = spark.range(18, 22).select(
        F.col("id").alias("uid"),
        (F.col("id") * 10_000_000_000).alias("v"),  # long > int range
    )
    t.merge(src, key="uid", schema_evolution=True)
    assert t.schema["v"].dataType == T.LongType()
    out = t.scan()
    assert out.filter("uid = 21").collect()[0]["v"] == 210_000_000_000
    # pre-existing int rows up-cast at scan
    assert out.filter("uid = 0").collect()[0]["v"] == 0


def test_without_flag_extra_dropped(spark, tmp_path):
    t = _mk(spark, tmp_path / "d")
    t.merge(_src_extra(spark, 15, 25), key="uid")
    assert [f.name for f in t.schema.fields] == ["uid", "v"]
    assert t.scan().count() == 25


def test_op_col_never_evolves(spark, tmp_path):
    t = _mk(spark, tmp_path / "o")
    src = _src_extra(spark, 0, 5).withColumn("op", F.lit(None).cast("string"))
    t.merge(src, key="uid", schema_evolution=True)
    assert "op" not in [f.name for f in t.schema.fields]
    assert "extra" in [f.name for f in t.schema.fields]


def test_noop_when_nothing_new(spark, tmp_path):
    t = _mk(spark, tmp_path / "n")
    n_before = len(t.meta.snapshots)
    src = spark.range(3).select(
        F.col("id").alias("uid"), F.lit(7).cast("int").alias("v")
    )
    t.merge(src, key="uid", schema_evolution=True)
    ops = [s.operation for s in t.meta.snapshots[n_before:]]
    assert "evolve-schema" not in ops
