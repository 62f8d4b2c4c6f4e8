"""Nested-column changelog streaming (VERDICT r9 #5): struct/map/deep
array columns ride the python-runner sources as canonical JSON strings
and are restored consumer-side with from_json against the table schema
(streaming/table_source.py `restore_nested_columns`)."""

import pytest
from pyspark.sql import functions as F

from dynamodb_zero_etl_s3tables_spark.spec import TableSpec
from dynamodb_zero_etl_s3tables_spark.streaming.table_source import (
    changelog_schema_ddl,
    drain_changelog,
    make_changelog_source,
    make_partitioned_changelog_source,
    restore_nested_columns,
)
from dynamodb_zero_etl_s3tables_spark.table.catalog import Catalog


def _nested_table(spark, warehouse, name="nest"):
    t = Catalog(spark, warehouse).create_table(
        TableSpec(namespace="ns", name=name, key_columns=("pk",))
    )
    df = spark.createDataFrame(
        [
            (1, ("a", 10), {"x": 1.5}, [[1, 2], [3]]),
            (2, ("b", 20), {"y": 2.5, "z": 0.5}, [[4]]),
            (3, (None, 30), {}, []),
        ],
        "pk long, meta struct<tag:string,n:int>, "
        "scores map<string,double>, mat array<array<int>>",
    )
    t.bootstrap(df)
    return t, f"{warehouse}/ns/{name}/manifest.json"


def _drain(spark, stream, root, manifest):
    drain_changelog(
        stream, f"{root}/out", f"{root}/ckpt", manifest, timeout_sec=300.0
    )
    return spark.read.parquet(f"{root}/out")


class TestNestedChangelog:
    def test_schema_shims_nested_to_string(self, spark, warehouse):
        _t, manifest = _nested_table(spark, warehouse, "n1")
        ddl = changelog_schema_ddl(manifest)
        assert "`meta` string" in ddl
        assert "`scores` string" in ddl
        assert "`mat` string" in ddl

    def test_bootstrap_roundtrip_simple_reader(self, spark, warehouse, tmp_path):
        _t, manifest = _nested_table(spark, warehouse, "n2")
        spark.dataSource.register(make_changelog_source())
        stream = (
            spark.readStream.format("table_changelog")
            .option("manifest", manifest)
            .load()
        )
        restored = restore_nested_columns(stream, manifest)
        out = _drain(spark, restored, str(tmp_path / "n2"), manifest)
        rows = {r.pk: r for r in out.collect()}
        assert rows[1].meta.tag == "a" and rows[1].meta.n == 10
        assert rows[2].scores == {"y": 2.5, "z": 0.5}
        assert rows[1].mat == [[1, 2], [3]]
        assert rows[3].meta.tag is None and rows[3].meta.n == 30
        # empty map and empty array survive (typed encoder: {} not [])
        assert rows[3].scores == {}
        assert rows[3].mat == []

    def test_mor_wave_and_delete_roundtrip(self, spark, warehouse, tmp_path):
        t, manifest = _nested_table(spark, warehouse, "n3")
        wave = spark.createDataFrame(
            [
                ("MODIFY", 1, ("A", 11), {"x": 9.0}, [[7]], 1, 1),
                ("REMOVE", 2, None, None, None, 1, 2),
            ],
            "op string, pk long, meta struct<tag:string,n:int>, "
            "scores map<string,double>, mat array<array<int>>, "
            "ts long, seq long",
        )
        t.apply_changes(wave, strategy="merge-on-read")
        spark.dataSource.register(make_changelog_source())
        stream = restore_nested_columns(
            spark.readStream.format("table_changelog")
            .option("manifest", manifest)
            .load(),
            manifest,
        )
        out = _drain(spark, stream, str(tmp_path / "n3"), manifest)
        ups = out.filter("change_op = 'UPSERT'").collect()
        assert len(ups) == 1 and ups[0].meta.tag == "A"
        dels = out.filter("change_op = 'DELETE'").collect()
        assert len(dels) == 1 and dels[0].pk == 2 and dels[0].meta is None

    def test_partitioned_reader_roundtrip(self, spark, warehouse, tmp_path):
        _t, manifest = _nested_table(spark, warehouse, "n4")
        spark.dataSource.register(make_partitioned_changelog_source())
        stream = restore_nested_columns(
            spark.readStream.format("table_changelog_part")
            .option("manifest", manifest)
            .load(),
            manifest,
        )
        out = _drain(spark, stream, str(tmp_path / "n4"), manifest)
        rows = {r.pk: r for r in out.collect()}
        assert rows[1].meta.n == 10 and rows[2].scores["z"] == 0.5

    def test_exotic_leaves_roundtrip(self, spark, warehouse, tmp_path):
        """date / timestamp_ntz / decimal / binary INSIDE a struct:
        the canonical-JSON conventions (ISO strings, base64, plain
        decimal strings) are exactly what from_json inverts."""
        import datetime
        from decimal import Decimal

        t = Catalog(spark, warehouse).create_table(
            TableSpec(namespace="ns", name="n5", key_columns=("pk",))
        )
        df = spark.createDataFrame(
            [
                (
                    1,
                    (
                        datetime.date(2024, 3, 5),
                        datetime.datetime(2024, 3, 5, 10, 30, 0),
                        Decimal("12.50"),
                        b"\x00\xffhi",
                    ),
                )
            ],
            "pk long, payload struct<d:date,ts:timestamp_ntz,"
            "amt:decimal(10,2),blob:binary>",
        )
        t.bootstrap(df)
        manifest = f"{warehouse}/ns/n5/manifest.json"
        spark.dataSource.register(make_changelog_source())
        stream = restore_nested_columns(
            spark.readStream.format("table_changelog")
            .option("manifest", manifest)
            .load(),
            manifest,
        )
        out = _drain(spark, stream, str(tmp_path / "n5"), manifest)
        r = out.first()
        assert r.payload.d == datetime.date(2024, 3, 5)
        assert r.payload.ts == datetime.datetime(2024, 3, 5, 10, 30, 0)
        assert r.payload.amt == Decimal("12.50")
        assert bytes(r.payload.blob) == b"\x00\xffhi"

    def test_flat_table_restore_is_noop(self, spark, warehouse):
        t = Catalog(spark, warehouse).create_table(
            TableSpec(namespace="ns", name="n6", key_columns=("pk",))
        )
        t.bootstrap(spark.createDataFrame([(1, "a")], "pk long, v string"))
        manifest = f"{warehouse}/ns/n6/manifest.json"
        spark.dataSource.register(make_changelog_source())
        stream = (
            spark.readStream.format("table_changelog")
            .option("manifest", manifest)
            .load()
        )
        assert restore_nested_columns(stream, manifest) is stream

    def test_cow_diff_on_nested_table(self, spark, warehouse, tmp_path):
        """A CoW commit (merge_into) on a nested table diffs through
        the generic keyed path — nested values compare as python
        dicts reader-side and serialize at emission."""
        t, manifest = _nested_table(spark, warehouse, "n7")
        src = spark.createDataFrame(
            [(1, ("zz", 99), {"x": 1.5}, [[1, 2], [3]])],
            "pk long, meta struct<tag:string,n:int>, "
            "scores map<string,double>, mat array<array<int>>",
        )
        t.merge_into(
            src,
            matched=[
                (
                    "update",
                    None,
                    {
                        "meta": F.expr("s.meta"),
                        "scores": F.expr("s.scores"),
                        "mat": F.expr("s.mat"),
                    },
                )
            ],
        )
        spark.dataSource.register(make_changelog_source())
        stream = restore_nested_columns(
            spark.readStream.format("table_changelog")
            .option("manifest", manifest)
            .load(),
            manifest,
        )
        out = _drain(spark, stream, str(tmp_path / "n7"), manifest)
        ups = out.filter("change_op = 'UPSERT'").collect()
        assert len(ups) == 1 and ups[0].pk == 1 and ups[0].meta.tag == "zz"
