"""JVM-visible staged changelog (streaming/changelog_files.py, r11):
the staged per-version parquet files must carry EXACTLY the rows the
Python DataSource simple reader emits for the same table history —
bootstrap, MoR deltas (incl. tombstone suppression), CoW diffs, compact
transparency, NaN stability, nested-column JSON shim — plus the
file-stream drain contract (one microbatch per version, checkpoint
resume)."""

import math
import os

import pytest

from dynamodb_zero_etl_s3tables_spark.spec import TableSpec
from dynamodb_zero_etl_s3tables_spark.streaming.changelog_files import (
    changelog_file_stream,
    drain_changelog_files,
    materialize_changelog,
)
from dynamodb_zero_etl_s3tables_spark.streaming.table_source import (
    changelog_schema_ddl,
    make_changelog_source,
)
from dynamodb_zero_etl_s3tables_spark.table.catalog import Catalog


def _python_reader_rows(manifest):
    """Every changelog row the SIMPLE Python reader emits for the full
    history — the reference semantics the staged files must match."""
    src = make_changelog_source()(options={"manifest": manifest})
    r = src.simpleStreamReader(src.schema())
    out, off = [], r.initialOffset()
    while True:
        rows, nxt = r.read(off)
        rows = list(rows)
        if nxt == off and not rows:
            break
        out.extend(rows)
        off = nxt
    return sorted(out)


def _staged_rows(spark, manifest, stage):
    ddl = changelog_schema_ddl(manifest)
    df = spark.read.schema(ddl).parquet(stage)
    return sorted(tuple(r) for r in df.collect())


def _nan_eq(a, b):
    if isinstance(a, float) and isinstance(b, float):
        return (math.isnan(a) and math.isnan(b)) or a == b
    return a == b


def _rows_equal(xs, ys):
    return len(xs) == len(ys) and all(
        len(x) == len(y) and all(_nan_eq(a, b) for a, b in zip(x, y))
        for x, y in zip(xs, ys)
    )


def test_staged_rows_match_python_reader_mixed_history(spark, warehouse, tmp_path):
    """bootstrap -> MoR wave (tombstone + suppressed tombstone) ->
    CoW merge (insert/update/delete) -> compact (empty) -> NaN rows."""
    t = Catalog(spark, warehouse).create_table(
        TableSpec(namespace="ns", name="mix", key_columns=("pk",))
    )
    nan = float("nan")
    t.bootstrap(
        spark.createDataFrame(
            [(1, "A", 10.0), (2, "B", 20.0), (3, "C", nan)],
            "pk long, status string, price double",
        )
    )
    # v2: MoR — tombstone pk=1, re-upsert pk=2 (tombstone suppressed)
    t.apply_changes(
        spark.createDataFrame(
            [("REMOVE", 1, None, None, 1, 1), ("MODIFY", 2, "B2", 21.0, 1, 2)],
            "op string, pk long, status string, price double, ts long, seq long",
        ),
        strategy="merge-on-read",
    )
    # v3: CoW merge — new key, changed image, unchanged NaN row rides
    t.apply_changes(
        spark.createDataFrame(
            [("MODIFY", 4, "D", 40.0, 2, 1), ("MODIFY", 2, "B3", 22.0, 2, 2)],
            "op string, pk long, status string, price double, ts long, seq long",
        )
    )
    # v4: compact — must stage an EMPTY file (changelog-transparent)
    t.compact()
    manifest = f"{warehouse}/ns/mix/manifest.json"
    stage = str(tmp_path / "stage")
    n = materialize_changelog(t, stage)
    assert n == 4
    staged = _staged_rows(spark, manifest, stage)
    expected = _python_reader_rows(manifest)
    assert _rows_equal(staged, expected), f"{staged[:5]} vs {expected[:5]}"
    # the NaN row must NOT re-emit as UPSERT on v3/v4, and v4 is empty
    assert not [r for r in staged if r[0] == 4]
    assert [r for r in staged if r[0] == 3 and r[2] == 3] == []
    # incremental: nothing new -> no rewrite
    assert materialize_changelog(t, stage) == 0


def test_staged_rows_match_python_reader_nested_shim(spark, warehouse, tmp_path):
    """struct + map columns ride as the SAME canonical-JSON strings
    after from_json restoration (value-exact round trip)."""
    from pyspark.sql import functions as F

    from dynamodb_zero_etl_s3tables_spark.streaming.table_source import (
        restore_nested_columns,
    )

    t = Catalog(spark, warehouse).create_table(
        TableSpec(namespace="ns", name="nest", key_columns=("pk",))
    )
    base = spark.createDataFrame(
        [(1, ("A", "p1"), {"k": 1}), (2, ("B", "p2"), {"k": 2})],
        "pk long, meta struct<status:string,prio:string>, tags map<string,int>",
    )
    t.bootstrap(base)
    t.apply_changes(
        base.filter("pk = 2").select(
            F.lit("MODIFY").alias("op"), "pk",
            F.expr(
                "cast(named_struct('status', 'X', 'prio', meta.prio) as "
                "struct<status:string,prio:string>)"
            ).alias("meta"),
            "tags", F.lit(1).alias("ts"), F.lit(1).alias("seq"),
        ),
        strategy="merge-on-read",
    )
    manifest = f"{warehouse}/ns/nest/manifest.json"
    stage = str(tmp_path / "stage")
    materialize_changelog(t, stage)
    ddl = changelog_schema_ddl(manifest)
    df = spark.read.schema(ddl).parquet(stage)
    assert dict(df.dtypes)["meta"] == "string"  # shimmed
    restored = restore_nested_columns(df, manifest)
    got = sorted(
        (r.version, r.change_op, r.pk, tuple(r.meta) if r.meta else None,
         dict(r.tags) if r.tags else None)
        for r in restored.collect()
    )
    assert got == [
        (1, "INSERT", 1, ("A", "p1"), {"k": 1}),
        (1, "INSERT", 2, ("B", "p2"), {"k": 2}),
        (2, "UPSERT", 2, ("X", "p2"), {"k": 2}),
    ]


def test_staged_rows_match_python_reader_partitioned_rename(
    spark, warehouse, tmp_path
):
    """Partitioned table + rename boundary: staged rows == Python
    reader rows (the rename version diffs as the documented UPSERT
    wave on both paths)."""
    from pyspark.sql import functions as F

    t = Catalog(spark, warehouse).create_table(
        TableSpec(
            namespace="ns", name="part", key_columns=("pk",),
            partition_columns=("status",),
        )
    )
    base = spark.createDataFrame(
        [(i, "A" if i % 2 else "B", float(i)) for i in range(1, 21)],
        "pk long, status string, price double",
    )
    t.bootstrap(base)
    t.rename_column("price", "amount")
    t.apply_changes(
        spark.createDataFrame(
            [("MODIFY", 3, "A", 333.0, 1, 1)],
            "op string, pk long, status string, amount double, ts long, seq long",
        )
    )
    manifest = f"{warehouse}/ns/part/manifest.json"
    stage = str(tmp_path / "stage")
    assert materialize_changelog(t, stage) == 3
    staged = _staged_rows(spark, manifest, stage)
    expected = _python_reader_rows(manifest)
    assert _rows_equal(staged, expected)


def test_file_stream_drain_per_version_batches_and_resume(
    spark, warehouse, tmp_path
):
    t = Catalog(spark, warehouse).create_table(
        TableSpec(namespace="ns", name="drain", key_columns=("pk",))
    )
    t.bootstrap(
        spark.createDataFrame([(1, 10.0), (2, 20.0)], "pk long, price double")
    )
    t.apply_changes(
        spark.createDataFrame(
            [("MODIFY", 2, 21.0, 1, 1)],
            "op string, pk long, price double, ts long, seq long",
        )
    )
    manifest = f"{warehouse}/ns/drain/manifest.json"
    stage, out, ckpt = (
        str(tmp_path / "stage"), str(tmp_path / "out"), str(tmp_path / "ckpt")
    )
    materialize_changelog(t, stage)
    n1 = drain_changelog_files(
        changelog_file_stream(spark, manifest, stage), out, ckpt
    )
    assert n1 == 2  # one microbatch per version
    got1 = sorted(tuple(r) for r in spark.read.parquet(out).collect())
    assert got1 == [(1, "INSERT", 1, 10.0), (1, "INSERT", 2, 20.0),
                    (2, "UPSERT", 2, 21.0)]
    # resume: a later commit drains as ONLY the new version
    t.apply_changes(
        spark.createDataFrame(
            [("MODIFY", 3, 30.0, 2, 1)],
            "op string, pk long, price double, ts long, seq long",
        )
    )
    materialize_changelog(t, stage)
    n2 = drain_changelog_files(
        changelog_file_stream(spark, manifest, stage), out, ckpt
    )
    assert n2 == 1
    got2 = sorted(tuple(r) for r in spark.read.parquet(out).collect())
    assert got2 == got1 + [(3, "INSERT", 3, 30.0)]


def test_stage_files_are_version_named_single_files(spark, warehouse, tmp_path):
    t = Catalog(spark, warehouse).create_table(
        TableSpec(namespace="ns", name="names", key_columns=("pk",))
    )
    t.bootstrap(spark.createDataFrame([(1, 1.0)], "pk long, price double"))
    t.compact()  # empty-diff version must still stage one (empty) file
    stage = str(tmp_path / "stage")
    materialize_changelog(t, stage)
    files = sorted(os.listdir(stage))
    assert files == ["v000000001.parquet", "v000000002.parquet"]
    # mtimes are version-monotonic (the file stream's arrival order)
    m1 = os.path.getmtime(os.path.join(stage, files[0]))
    m2 = os.path.getmtime(os.path.join(stage, files[1]))
    assert m1 < m2
