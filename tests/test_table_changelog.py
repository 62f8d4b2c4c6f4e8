"""Managed-table changelog streaming source (streaming/table_source.py):
refusal of non-changelog commits, and offset/emission unit behavior
driven directly against the reader (no stream engine needed)."""

import pytest

from dynamodb_zero_etl_s3tables_spark.spec import TableSpec
from dynamodb_zero_etl_s3tables_spark.streaming.table_source import (
    make_changelog_source,
)
from dynamodb_zero_etl_s3tables_spark.table.catalog import Catalog


def _mk(spark, warehouse):
    t = Catalog(spark, warehouse).create_table(
        TableSpec(namespace="ns", name="cdf", key_columns=("pk",))
    )
    t.bootstrap(
        spark.createDataFrame(
            [(1, "A", 10.0), (2, "B", 20.0)], "pk long, status string, price double"
        )
    )
    return t, f"{warehouse}/ns/cdf/manifest.json"


def _reader(manifest):
    src = make_changelog_source()(options={"manifest": manifest, "keys": "pk"})
    return src.simpleStreamReader(src.schema())


def test_reader_emits_bootstrap_and_mor_waves(spark, warehouse):
    t, mp = _mk(spark, warehouse)
    t.apply_changes(
        spark.createDataFrame(
            [("MODIFY", 3, "C", 30.0, 1, 1), ("REMOVE", 1, None, None, 1, 2)],
            "op string, pk long, status string, price double, ts long, seq long",
        ),
        strategy="merge-on-read",
    )
    r = _reader(mp)
    rows, off = r.read(r.initialOffset())
    rows = sorted(rows)
    assert off == {"v": 2}
    assert (1, "INSERT", 1, "A", 10.0) in rows
    assert (2, "DELETE", 1, None, None) in rows
    assert (2, "UPSERT", 3, "C", 30.0) in rows
    # caught up: nothing more, offset stable
    again, off2 = r.read(off)
    assert list(again) == [] and off2 == off
    # replay between committed offsets returns the same rows
    assert sorted(r.readBetweenOffsets({"v": 0}, {"v": 2})) == rows


def test_reader_refuses_cow_commits_with_clear_error(spark, warehouse):
    t, mp = _mk(spark, warehouse)
    t.apply_changes(
        spark.createDataFrame(
            [("MODIFY", 3, "C", 30.0, 1, 1)],
            "op string, pk long, status string, price double, ts long, seq long",
        )
    )  # copy-on-write merge: no per-row change files
    r = _reader(mp)
    with pytest.raises(ValueError, match="merge-on-read"):
        list(r.read(r.initialOffset())[0])


def test_reader_skips_staged_snapshots(spark, warehouse):
    t, mp = _mk(spark, warehouse)
    t.stage_changes(
        spark.createDataFrame(
            [("MODIFY", 9, "Z", 1.0, 1, 1)],
            "op string, pk long, status string, price double, ts long, seq long",
        )
    )
    r = _reader(mp)
    rows, off = r.read(r.initialOffset())
    # only the published bootstrap is visible; the staged WAP commit
    # must be invisible to changelog consumers until publish
    assert off == {"v": 1}
    assert all(v == 1 for (v, *_rest) in rows)


def test_schema_rejects_non_primitive_columns(spark, warehouse):
    t = Catalog(spark, warehouse).create_table(
        TableSpec(namespace="ns", name="arr", key_columns=("pk",))
    )
    t.bootstrap(
        spark.createDataFrame([(1, [1.0, 2.0])], "pk long, vec array<double>")
    )
    src = make_changelog_source()(
        options={"manifest": f"{warehouse}/ns/arr/manifest.json", "keys": "pk"}
    )
    with pytest.raises(TypeError, match="primitive"):
        src.schema()
