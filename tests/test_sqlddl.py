"""SQL DDL front-end (lakehouse/sqlddl.py): CREATE TABLE AS SELECT /
ALTER TABLE text forms dispatched to the native catalog/table ops,
with the same loud-refusal discipline as the DML front-end — plus the
VERDICT r4 "done =" chain: DDL → DML → read driven through text only."""

import pyspark.sql.functions as F
import pytest
from pyspark.sql import types as T

from lakehouse.catalog import Catalog
from lakehouse.sqldml import SqlDmlError


@pytest.fixture()
def cat(tmp_path):
    return Catalog.create(str(tmp_path / "wh"))


class TestCreateTableAs:
    def test_ctas_infers_schema_and_appends(self, spark, cat):
        t = cat.sql(
            spark,
            "CREATE TABLE users AS SELECT id AS user_id, "
            "concat('u', id) AS name, CAST(id * 1.5 AS DOUBLE) AS score "
            "FROM range(10)",
        )
        assert sorted(cat.tables()) == ["users"]
        assert [f.name for f in t.schema.fields] == [
            "user_id", "name", "score",
        ]
        rows = sorted(r.user_id for r in t.scan().collect())
        assert rows == list(range(10))

    def test_ctas_partitioned_by(self, spark, cat):
        t = cat.sql(
            spark,
            "CREATE TABLE ev PARTITIONED BY (day) AS "
            "SELECT id, CAST(id % 3 AS STRING) AS day FROM range(30)",
        )
        spec = t.meta.partition_spec
        assert [p["source"] for p in spec] == ["day"]
        assert [p["transform"] for p in spec] == ["identity"]
        # partition pruning works on the created layout
        plan = t.plan(filter=[("day", "=", "1")])
        assert 0 < len(plan.files) < len(t.plan().files)
        assert t.scan(filter=[("day", "=", "1")]).count() == 10

    def test_ctas_values_body_and_parens(self, spark, cat):
        t = cat.sql(
            spark, "CREATE TABLE kv AS (SELECT 1 AS k, 'a' AS v)"
        )
        assert [tuple(r) for r in t.scan().collect()] == [(1, "a")]

    def test_ctas_refusals(self, spark, cat):
        with pytest.raises(SqlDmlError, match="SELECT/VALUES"):
            cat.sql(spark, "CREATE TABLE t2 AS DELETE FROM x")
        with pytest.raises(SqlDmlError, match="PARTITIONED BY column"):
            cat.sql(
                spark,
                "CREATE TABLE t3 PARTITIONED BY (nope) AS "
                "SELECT 1 AS k",
            )
        from lakehouse.sqlddl import execute_ddl

        with pytest.raises(SqlDmlError, match="catalog"):
            execute_ddl("CREATE TABLE t5 AS SELECT 1 AS k", spark=spark)


class TestAlterTable:
    def _mk(self, spark, cat):
        return cat.sql(
            spark,
            "CREATE TABLE base AS SELECT id AS k, "
            "concat('n', id) AS name FROM range(5)",
        )

    def test_add_column_with_default(self, spark, cat):
        t = self._mk(spark, cat)
        cat.sql(
            spark,
            "ALTER TABLE base ADD COLUMN tier STRING DEFAULT 'bronze'",
        )
        out = t.scan()
        assert dict(out.dtypes)["tier"] == "string"
        # old rows scan as the default, not null
        assert out.filter(F.col("tier") == "bronze").count() == 5

    def test_add_column_no_default_and_numeric_default(self, spark, cat):
        t = self._mk(spark, cat)
        cat.sql(spark, "ALTER TABLE base ADD COLUMN w DOUBLE DEFAULT 2.5")
        cat.sql(spark, "ALTER TABLE base ADD COLUMN note STRING")
        row = t.scan().filter(F.col("k") == 0).first()
        assert row.w == 2.5 and row.note is None

    def test_drop_and_rename_column(self, spark, cat):
        t = self._mk(spark, cat)
        cat.sql(spark, "ALTER TABLE base RENAME COLUMN name TO label")
        assert "label" in [f.name for f in t.schema.fields]
        cat.sql(spark, "ALTER TABLE base DROP COLUMN label")
        assert [f.name for f in t.schema.fields] == ["k"]

    def test_alter_through_bound_table(self, spark, cat):
        t = self._mk(spark, cat)
        t.sql("ALTER TABLE base ADD COLUMN z BIGINT DEFAULT 7")
        assert t.scan().filter(F.col("z") == 7).count() == 5
        with pytest.raises(SqlDmlError, match="targets"):
            t.sql("ALTER TABLE other ADD COLUMN q BIGINT")

    def test_alter_refusals(self, spark, cat):
        self._mk(spark, cat)
        with pytest.raises(SqlDmlError, match="unsupported ALTER"):
            cat.sql(spark, "ALTER TABLE base SET TBLPROPERTIES ('a'='b')")
        with pytest.raises(SqlDmlError, match="literal"):
            cat.sql(
                spark,
                "ALTER TABLE base ADD COLUMN c BIGINT DEFAULT k + 1",
            )
        with pytest.raises(SqlDmlError, match="unsupported statement"):
            from lakehouse.sqlddl import execute_ddl

            execute_ddl("VACUUM base", catalog=cat, spark=spark)

    def test_default_string_with_quote_and_keyword(self, spark, cat):
        t = self._mk(spark, cat)
        # masked-text parsing: a quoted DEFAULT containing a keyword
        # or doubled quote must round-trip exactly
        cat.sql(
            spark,
            "ALTER TABLE base ADD COLUMN m STRING "
            "DEFAULT 'it''s DEFAULT ok'",
        )
        assert t.scan().first().m == "it's DEFAULT ok"


def test_text_only_lifecycle(spark, cat):
    """VERDICT r4 next-step #6 'done =' gate: a full DDL → DML → read
    chain driven through SQL text alone — create, evolve, upsert,
    delete, and read back, never touching the Python mutation APIs."""
    cat.sql(
        spark,
        "CREATE TABLE orders PARTITIONED BY (day) AS "
        "SELECT id AS order_id, CAST(id % 2 AS STRING) AS day, "
        "CAST(id * 10.0 AS DOUBLE) AS amount FROM range(8)",
    )
    cat.sql(
        spark,
        "ALTER TABLE orders ADD COLUMN status STRING DEFAULT 'open'",
    )
    cat.sql(
        spark,
        "INSERT INTO orders (SELECT 100 AS order_id, '1' AS day, "
        "5.0 AS amount, 'open' AS status)",
    )
    spark.sql(
        "SELECT 0 AS order_id, '0' AS day, 999.0 AS amount, "
        "'amended' AS status"
    ).createOrReplaceTempView("fix_src")
    cat.sql(
        spark,
        "MERGE INTO orders t USING fix_src s ON t.order_id = s.order_id "
        "WHEN MATCHED THEN UPDATE SET *",
    )
    cat.sql(spark, "DELETE FROM orders WHERE order_id IN (6, 7)")
    t = cat.load_table(spark, "orders")
    cat.register_views(spark, names=["orders"])
    got = {
        r.order_id: (r.status, r.amount)
        for r in spark.sql("SELECT * FROM orders").collect()
    }
    assert len(got) == 7  # 8 - 2 deleted + 1 inserted
    assert got[0] == ("amended", 999.0)
    assert got[100] == ("open", 5.0)
    assert got[1] == ("open", 10.0)
    assert t.scan(filter=[("day", "=", "1")]).count() == 4  # 1,3,5 + inserted 100


class TestColumnListCreateAndDrop:
    """Round-5 grammar completion: explicit column-list CREATE (typed
    columns + DEFAULTs, depth-aware comma split for decimal(p,s)) and
    DROP TABLE (unregister; PURGE deletes the directory)."""

    def test_create_column_list(self, spark, cat):
        t = cat.sql(
            spark,
            "CREATE TABLE typed (k BIGINT, name STRING DEFAULT 'anon', "
            "amt DECIMAL(10,2), tags ARRAY<STRING>) "
            "PARTITIONED BY (name)",
        )
        assert [(f.name, f.dataType.simpleString()) for f in t.schema.fields] == [
            ("k", "bigint"), ("name", "string"),
            ("amt", "decimal(10,2)"), ("tags", "array<string>"),
        ]
        assert [p["source"] for p in t.meta.partition_spec] == ["name"]
        assert t.scan().count() == 0
        # DEFAULT applies on write when the column is omitted
        t.sql("INSERT INTO typed (k) VALUES (1)")
        assert t.scan().first().name == "anon"

    def test_create_column_list_refusals(self, spark, cat):
        with pytest.raises(SqlDmlError, match="unparseable type"):
            cat.sql(spark, "CREATE TABLE bad (k NOPETYPE)")
        with pytest.raises(SqlDmlError, match="bad column definition"):
            cat.sql(spark, "CREATE TABLE bad2 (justaname)")
        with pytest.raises(SqlDmlError, match="PARTITIONED BY column"):
            cat.sql(
                spark,
                "CREATE TABLE bad3 (k BIGINT) PARTITIONED BY (nope)",
            )

    def test_drop_table_keeps_files_without_purge(self, spark, cat):
        import os

        t = cat.sql(spark, "CREATE TABLE keepme AS SELECT 1 AS k")
        root = t.root
        cat.sql(spark, "DROP TABLE keepme")
        assert "keepme" not in cat.tables()
        assert os.path.isdir(root)  # external-style: directory survives
        cat.register("keepme", root)  # recoverable
        assert cat.load_table(spark, "keepme").scan().count() == 1

    def test_drop_table_purge_removes_files(self, spark, cat):
        import os

        t = cat.sql(spark, "CREATE TABLE gone AS SELECT 1 AS k")
        root = t.root
        cat.sql(spark, "DROP TABLE gone PURGE")
        assert "gone" not in cat.tables()
        assert not os.path.exists(root)

    def test_drop_unknown_refused(self, spark, cat):
        from lakehouse.catalog import CatalogError

        with pytest.raises((SqlDmlError, CatalogError)):
            cat.sql(spark, "DROP TABLE never_existed")


class TestTruncate:
    """TRUNCATE TABLE: whole-table metadata delete — zero data I/O,
    snapshots stay time-travelable, schema/spec/properties survive."""

    def test_truncate_metadata_only(self, spark, cat):
        t = cat.sql(
            spark,
            "CREATE TABLE big PARTITIONED BY (day) AS "
            "SELECT id, CAST(id % 4 AS STRING) AS day FROM range(100)",
        )
        pre_snap = t.current_snapshot_id()
        n_files = len(t.plan().files)
        assert n_files > 1
        snap = cat.sql(spark, "TRUNCATE TABLE big")
        assert snap.operation == "delete"
        assert snap.summary["truncate"] is True
        assert snap.summary["removed_files"] == n_files
        assert snap.summary["removed_records"] == 100
        # no data files were written by the truncate commit
        assert snap.summary.get("added_files", 0) in (0, None)
        assert t.scan().count() == 0
        assert len(t.plan().files) == 0
        # prior snapshot still time-travels
        assert t.scan(snapshot_id=pre_snap).count() == 100
        # the table is still writable with its old schema + spec
        t.sql("INSERT INTO big VALUES (7, '3')")
        assert t.scan().count() == 1
        assert [p["source"] for p in t.meta.partition_spec] == ["day"]

    def test_truncate_clears_pending_mor_deletes(self, spark, cat):
        t = cat.sql(
            spark, "CREATE TABLE morred AS SELECT id AS k FROM range(20)"
        )
        t.delete([("k", "<", 5)], mode="mor", key="k")
        assert len(t.plan().delete_files) > 0
        t.sql("TRUNCATE TABLE morred")
        assert t.plan().delete_files == [] or len(t.plan().delete_files) == 0
        assert t.scan().count() == 0

    def test_truncate_refusals(self, spark, cat):
        cat.sql(spark, "CREATE TABLE tr AS SELECT 1 AS k")
        from lakehouse.sqlddl import execute_ddl

        with pytest.raises(SqlDmlError, match="TRUNCATE TABLE"):
            execute_ddl("TRUNCATE tr", catalog=cat, spark=spark)


class TestReviewFixesR5:
    """Round-5 review findings on the DDL/DML front-ends."""

    def test_column_named_like_keyword(self, spark, cat):
        # 'values' is a common column name — must parse as a column
        # list, not be mistaken for a query body
        t = cat.sql(
            spark, "CREATE TABLE kwcols (values BIGINT, k INT)"
        )
        assert [f.name for f in t.schema.fields] == ["values", "k"]

    def test_query_body_without_as_gets_pointed_at_as(self, spark, cat):
        with pytest.raises(SqlDmlError, match="needs AS"):
            cat.sql(spark, "CREATE TABLE noas (SELECT 1 AS k)")

    def test_fully_parenthesized_compound_insert(self, spark, cat):
        t = cat.sql(spark, "CREATE TABLE cmp (k BIGINT)")
        t.sql("INSERT INTO cmp ((SELECT 1 AS k) UNION ALL (SELECT 2))")
        assert sorted(r.k for r in t.scan().collect()) == [1, 2]

    def test_ddl_rejects_dml_kwargs(self, spark, cat):
        cat.sql(spark, "CREATE TABLE kwt AS SELECT 1 AS k")
        with pytest.raises(SqlDmlError, match="keyword argument"):
            cat.sql(spark, "TRUNCATE TABLE kwt", mode="mor")
        with pytest.raises(SqlDmlError, match="keyword argument"):
            cat.sql(
                spark,
                "ALTER TABLE kwt ADD COLUMN z BIGINT",
                isolation="serializable",
            )

    def test_table_sql_routes_drop_to_ddl(self, spark, cat):
        t = cat.sql(spark, "CREATE TABLE bnd AS SELECT 1 AS k")
        # a bound table can't DROP (no catalog) but the error must come
        # from the DDL front-end, not the DML grammar refusal
        with pytest.raises(SqlDmlError, match="DROP TABLE needs catalog"):
            t.sql("DROP TABLE bnd")
