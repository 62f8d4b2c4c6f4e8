"""Subquery DML (VERDICT r9 #3): ``DELETE/UPDATE ... WHERE <subquery
predicate>`` plans the predicate through Catalyst (semi/anti join) and
commits through the keyed ``delete_matching`` / ``update_matching``
verbs — pruned CoW rewrite with data-driven carry, or O(matches) MoR
tombstones. Mirrors the Athena cleanup shape over the replicated
table (reference README.md:170-174)."""

import pytest
from pyspark.sql import functions as F

from dynamodb_zero_etl_s3tables_spark.engine import ZeroEtlEngine
from dynamodb_zero_etl_s3tables_spark.spec import SourceSpec, TableSpec
from dynamodb_zero_etl_s3tables_spark.table.catalog import Catalog


def _engine(spark, warehouse, name="sq", partitioned=True):
    eng = ZeroEtlEngine(
        spark,
        warehouse,
        SourceSpec(table_name="src-ddb", key_columns=("pk",)),
        TableSpec(
            namespace="ns",
            name=name,
            key_columns=("pk",),
            partition_columns=("status",) if partitioned else (),
        ),
    )
    eng.bootstrap(
        spark.createDataFrame(
            [
                (1, "A", 10.0, 100),
                (2, "A", 150.0, 200),
                (3, "B", 20.0, 100),
                (4, "B", 250.0, 300),
                (5, "C", 70.0, 100),
            ],
            "pk long, status string, price double, cust long",
        )
    )
    return eng


def _table(spark, warehouse, name="sqt", partition_columns=("status",)):
    t = Catalog(spark, warehouse).create_table(
        TableSpec(
            namespace="ns",
            name=name,
            key_columns=("pk",),
            partition_columns=partition_columns,
        )
    )
    t.bootstrap(
        spark.createDataFrame(
            [(1, "A", 10.0), (2, "A", 150.0), (3, "B", 20.0), (4, "B", 250.0)],
            "pk long, status string, price double",
        )
    )
    return t


class TestDeleteMatching:
    def test_cow_prunes_to_touched_partition(self, spark, warehouse):
        t = _table(spark, warehouse)
        keys = spark.createDataFrame([(1,), (99,)], "pk long")
        info = t.delete_matching(keys)
        assert info == {"partitions_rewritten": 1, "partitions_carried": 1}
        assert {r.pk for r in t.read().collect()} == {2, 3, 4}

    def test_cow_multi_partition_hit(self, spark, warehouse):
        t = _table(spark, warehouse, name="sqt2")
        keys = spark.createDataFrame([(1,), (3,)], "pk long")
        info = t.delete_matching(keys)
        assert info == {"partitions_rewritten": 2, "partitions_carried": 0}
        assert {r.pk for r in t.read().collect()} == {2, 4}

    def test_cow_empty_keyset_carries_everything(self, spark, warehouse):
        t = _table(spark, warehouse, name="sqt3")
        keys = spark.createDataFrame([(99,)], "pk long")
        info = t.delete_matching(keys)
        assert info == {"partitions_rewritten": 0, "partitions_carried": 2}
        assert t.read().count() == 4

    def test_carried_partition_not_reread(self, spark, warehouse, tmp_path):
        """The carried partition is a metadata reference: corrupt its
        files after the delete and the NEW snapshot must still read."""
        import pathlib

        t = _table(spark, warehouse, name="sqt4")
        keys = spark.createDataFrame([(1,)], "pk long")  # status A only
        t.delete_matching(keys)
        # corrupt the ORIGINAL v1 'B' dir? No: carried entries point at
        # v1 files. Instead prove the rewrite read only the touched
        # partition: the new snapshot's B entry dir equals the old one.
        m = t._read_manifest()
        snaps = {s.version: s for s in m.snapshots}
        v1_dirs = {
            e["values"]["status"]: e["dir"] for e in snaps[1].partitions
        }
        v2_dirs = {
            e["values"]["status"]: e["dir"] for e in snaps[2].partitions
        }
        assert v2_dirs["B"] == v1_dirs["B"], "carried entry must be reused"
        assert v2_dirs["A"] != v1_dirs["A"], "touched entry must be rewritten"

    def test_mor_tombstones_without_rewrite(self, spark, warehouse):
        t = _table(spark, warehouse, name="sqt5", partition_columns=())
        base_dir = t._read_manifest().snapshots[0].data_dir
        keys = spark.createDataFrame([(2,), (4,)], "pk long")
        info = t.delete_matching(keys, strategy="merge-on-read")
        assert info["keys_deleted"] == 2
        m = t._read_manifest()
        assert m.snapshots[0].data_dir == base_dir
        assert m.current.delta is not None
        assert {r.pk for r in t.read().collect()} == {1, 3}
        # compact folds the layer without changing the answer
        t.compact()
        assert {r.pk for r in t.read().collect()} == {1, 3}

    def test_unpartitioned_cow(self, spark, warehouse):
        t = _table(spark, warehouse, name="sqt6", partition_columns=())
        info = t.delete_matching(spark.createDataFrame([(3,)], "pk long"))
        assert info == {
            "partitions_rewritten": None,
            "partitions_carried": None,
        }
        assert t.read().count() == 3

    def test_missing_key_column_refuses(self, spark, warehouse):
        t = _table(spark, warehouse, name="sqt7")
        with pytest.raises(ValueError, match="key columns"):
            t.delete_matching(spark.createDataFrame([(1,)], "other long"))

    def test_duplicate_keys_deduped(self, spark, warehouse):
        t = _table(spark, warehouse, name="sqt8")
        keys = spark.createDataFrame([(1,), (1,), (1,)], "pk long")
        t.delete_matching(keys)
        assert t.read().count() == 3

    def test_time_travel_still_sees_deleted_rows(self, spark, warehouse):
        t = _table(spark, warehouse, name="sqt9")
        t.delete_matching(spark.createDataFrame([(1,)], "pk long"))
        assert t.read(version=1).count() == 4


class TestUpdateMatching:
    def test_cow_updates_only_matched(self, spark, warehouse):
        t = _table(spark, warehouse, name="squ1")
        keys = spark.createDataFrame([(2,), (3,)], "pk long")
        info = t.update_matching(keys, {"price": "price * 2"})
        assert info == {"partitions_rewritten": 2, "partitions_carried": 0}
        got = {r.pk: r.price for r in t.read().collect()}
        assert got == {1: 10.0, 2: 300.0, 3: 40.0, 4: 250.0}

    def test_duplicate_keys_update_once(self, spark, warehouse):
        """r10 internals change: per-key dedup moved from one
        up-front dropDuplicates into each consumer (the rewrite's
        left_outer join is the row-duplication hazard). Duplicate
        keys must neither duplicate rows nor double-apply the
        assignment."""
        t = _table(spark, warehouse, name="squ4")
        keys = spark.createDataFrame([(2,), (2,), (2,)], "pk long")
        t.update_matching(keys, {"price": "price * 2"})
        got = {r.pk: r.price for r in t.read().collect()}
        assert got == {1: 10.0, 2: 300.0, 3: 20.0, 4: 250.0}
        assert t.read().count() == 4

    def test_duplicate_keys_with_riding_partition_values(
        self, spark, warehouse
    ):
        """r10 fast path: a key frame that carries partition values
        (the SQL door's shape) with duplicate key rows — the prune
        set comes off the key frame, the rewrite still applies once
        per row, and only the matched partition is rewritten."""
        t = _table(spark, warehouse, name="squ5")
        keys = spark.createDataFrame(
            [(2, "A"), (2, "A")], "pk long, status string"
        )
        info = t.update_matching(keys, {"price": "price + 1"})
        assert info == {"partitions_rewritten": 1, "partitions_carried": 1}
        got = {r.pk: r.price for r in t.read().collect()}
        assert got == {1: 10.0, 2: 151.0, 3: 20.0, 4: 250.0}

    def test_mor_update(self, spark, warehouse):
        t = _table(spark, warehouse, name="squ2", partition_columns=())
        base_dir = t._read_manifest().snapshots[0].data_dir
        info = t.update_matching(
            spark.createDataFrame([(4,)], "pk long"),
            {"price": "0.0"},
            strategy="merge-on-read",
        )
        assert info["rows_updated"] == 1
        assert t._read_manifest().snapshots[0].data_dir == base_dir
        got = {r.pk: r.price for r in t.read().collect()}
        assert got == {1: 10.0, 2: 150.0, 3: 20.0, 4: 0.0}

    def test_key_assignment_refuses(self, spark, warehouse):
        t = _table(spark, warehouse, name="squ3")
        with pytest.raises(ValueError, match="key columns"):
            t.update_matching(
                spark.createDataFrame([(1,)], "pk long"), {"pk": "pk + 10"}
            )

    def test_partition_assignment_refuses_cow(self, spark, warehouse):
        t = _table(spark, warehouse, name="squ4")
        with pytest.raises(ValueError, match="partition columns"):
            t.update_matching(
                spark.createDataFrame([(1,)], "pk long"), {"status": "'Z'"}
            )


class TestSqlDoorSubqueries:
    def test_in_subquery_delete(self, spark, warehouse):
        eng = _engine(spark, warehouse, name="sq1")
        spark.createDataFrame([(100,)], "cust long").createOrReplaceTempView(
            "flagged_sq1"
        )
        res = eng.sql(
            "DELETE FROM ns.sq1 WHERE cust IN "
            "(SELECT cust FROM flagged_sq1)"
        )
        assert res.first().operation == "delete"
        assert {r.pk for r in eng.read().collect()} == {2, 4}

    def test_not_in_subquery_delete(self, spark, warehouse):
        eng = _engine(spark, warehouse, name="sq2")
        spark.createDataFrame([(100,), (200,)], "cust long") \
            .createOrReplaceTempView("keep_sq2")
        eng.sql(
            "DELETE FROM ns.sq2 WHERE cust NOT IN "
            "(SELECT cust FROM keep_sq2)"
        )
        assert {r.pk for r in eng.read().collect()} == {1, 2, 3, 5}

    def test_not_in_with_null_deletes_nothing(self, spark, warehouse):
        """ANSI three-valued logic: NOT IN over a set containing NULL
        is never TRUE — Catalyst owns the semantics, so the door
        inherits them instead of hand-rolling."""
        eng = _engine(spark, warehouse, name="sq3")
        spark.createDataFrame(
            [(100,), (None,)], "cust long"
        ).createOrReplaceTempView("withnull_sq3")
        eng.sql(
            "DELETE FROM ns.sq3 WHERE cust NOT IN "
            "(SELECT cust FROM withnull_sq3)"
        )
        assert eng.read().count() == 5

    def test_correlated_exists_update(self, spark, warehouse):
        eng = _engine(spark, warehouse, name="sq4")
        spark.createDataFrame([(300,)], "cust long").createOrReplaceTempView(
            "vip_sq4"
        )
        eng.sql(
            "UPDATE ns.sq4 SET price = price + 1000 WHERE EXISTS "
            "(SELECT 1 FROM vip_sq4 v WHERE v.cust = sq4.cust)"
        )
        got = {r.pk: r.price for r in eng.read().collect()}
        assert got[4] == 1250.0
        assert got[1] == 10.0

    def test_subquery_delete_prunes_partitions(self, spark, warehouse):
        import json

        eng = _engine(spark, warehouse, name="sq5")
        spark.createDataFrame([(200,)], "cust long").createOrReplaceTempView(
            "f_sq5"
        )
        # cust=200 -> pk=2 -> status 'A' only
        info = json.loads(
            eng.sql(
                "DELETE FROM ns.sq5 WHERE cust IN (SELECT cust FROM f_sq5)"
            ).first().info
        )
        assert info["partitions_rewritten"] == 1
        assert info["partitions_carried"] == 2

    def test_mixed_plain_and_subquery_conjuncts(self, spark, warehouse):
        eng = _engine(spark, warehouse, name="sq6")
        spark.createDataFrame([(100,)], "cust long").createOrReplaceTempView(
            "f_sq6"
        )
        # cust=100 matches pk 1,3,5; price > 15 narrows to pk 3,5
        eng.sql(
            "DELETE FROM ns.sq6 WHERE price > 15.0 AND cust IN "
            "(SELECT cust FROM f_sq6)"
        )
        assert {r.pk for r in eng.read().collect()} == {1, 2, 4}

    def test_scalar_subquery_in_set_refuses(self, spark, warehouse):
        eng = _engine(spark, warehouse, name="sq7")
        with pytest.raises(ValueError, match="SET expression"):
            eng.sql(
                "UPDATE ns.sq7 SET price = (SELECT MAX(price) FROM ns_sq7) "
                "WHERE pk = 1"
            )

    def test_literal_select_text_is_not_a_subquery(self, spark, warehouse):
        eng = _engine(spark, warehouse, name="sq8")
        res = eng.sql(
            "DELETE FROM ns.sq8 WHERE status = 'see (select one) above'"
        )
        assert res.first().operation == "delete"
        assert eng.read().count() == 5

    def test_merge_with_schema_evolution(self, spark, warehouse):
        """`MERGE WITH SCHEMA EVOLUTION INTO` (VERDICT r9 #4): INSERT *
        with a new source column adds it through the additive-union
        gate, NULL on old rows; without the clause the strict refusal
        stands."""
        eng = _engine(spark, warehouse, name="sq9")
        spark.createDataFrame(
            [(6, "C", 60.0, 600, "eu")],
            "pk long, status string, price double, cust long, region string",
        ).createOrReplaceTempView("src_sq9")
        with pytest.raises(ValueError, match="SCHEMA EVOLUTION"):
            eng.sql(
                "MERGE INTO ns.sq9 t USING src_sq9 s ON t.pk = s.pk "
                "WHEN NOT MATCHED THEN INSERT *"
            )
        res = eng.sql(
            "MERGE WITH SCHEMA EVOLUTION INTO ns.sq9 t USING src_sq9 s "
            "ON t.pk = s.pk WHEN NOT MATCHED THEN INSERT *"
        )
        import json

        assert json.loads(res.first().info)["schema_evolution"] is True
        got = eng.read()
        assert "region" in got.columns
        rows = {r.pk: r.region for r in got.collect()}
        assert rows[6] == "eu"
        assert rows[1] is None

    def test_merge_with_schema_evolution_update_set(self, spark, warehouse):
        """SET on a NEW source column under WITH SCHEMA EVOLUTION: the
        column is added first (NULL-backed), then the matched rows get
        the source value."""
        eng = _engine(spark, warehouse, name="sq10")
        spark.createDataFrame(
            [(1, "gold")], "pk long, tier string"
        ).createOrReplaceTempView("src_sq10")
        eng.sql(
            "MERGE WITH SCHEMA EVOLUTION INTO ns.sq10 t USING src_sq10 s "
            "ON t.pk = s.pk WHEN MATCHED THEN UPDATE SET tier = s.tier"
        )
        rows = {r.pk: r.tier for r in eng.read().collect()}
        assert rows[1] == "gold"
        assert rows[2] is None

    def test_merge_with_schema_evolution_widens_types(self, spark, warehouse):
        """Iceberg promotion through the SQL door: the source's BIGINT
        overlaps the target's INT column — WITH SCHEMA EVOLUTION widens
        it (d90b's programmatic semantics), without the clause the
        widened assignment still refuses nothing (widening happens only
        under the opt-in; the strict door refuses only NEW columns, so
        pin the widened read here)."""
        eng = ZeroEtlEngine(
            spark,
            warehouse,
            SourceSpec(table_name="src-ddb", key_columns=("pk",)),
            TableSpec(namespace="ns", name="sq11", key_columns=("pk",)),
        )
        eng.bootstrap(
            spark.createDataFrame(
                [(1, 10), (2, 20)], "pk long, qty int"
            )
        )
        spark.createDataFrame(
            [(1, 3_000_000_000)], "pk long, qty long"
        ).createOrReplaceTempView("src_sq11")
        eng.sql(
            "MERGE WITH SCHEMA EVOLUTION INTO ns.sq11 t USING src_sq11 s "
            "ON t.pk = s.pk WHEN MATCHED THEN UPDATE SET qty = s.qty"
        )
        got = eng.read()
        assert dict(got.dtypes)["qty"] == "bigint"
        rows = {r.pk: r.qty for r in got.collect()}
        assert rows == {1: 3_000_000_000, 2: 20}


def test_wrong_valued_partition_column_is_projected_away(spark, warehouse):
    """ADVICE r10 / r11 hardening: the public delete_matching contract
    is "extra columns are projected away" — a caller-supplied frame
    whose partition-named column carries WRONG values must not steer
    the prune (before the r11 gate it silently skipped the partitions
    that actually held the matching rows)."""
    t = _table(spark, warehouse, name="wrongride")
    # pk 1 and 2 live in status='A'; lie that they live in 'B'
    keys = spark.createDataFrame(
        [(1, "B"), (2, "B")], "pk long, status string"
    )
    res = t.delete_matching(keys)
    assert res["partitions_rewritten"] == 1  # 'A' (found by semi-join)
    left = sorted(r.pk for r in t.read().collect())
    assert left == [3, 4]


def test_trusted_riding_partition_values_prune_without_rescan(
    spark, warehouse
):
    """The SQL-door fast path, exercised through the public flag:
    riding values that DO come from the matched rows prune exactly."""
    t = _table(spark, warehouse, name="trustride")
    keys = t.read().filter(F.col("pk").isin(1, 2)).select("pk", "status")
    res = t.delete_matching(keys, trust_riding_partition_values=True)
    assert res["partitions_rewritten"] == 1
    assert res["partitions_carried"] == 1
    left = sorted(r.pk for r in t.read().collect())
    assert left == [3, 4]
