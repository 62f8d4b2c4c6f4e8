"""Managed-table changelog streaming source (streaming/table_source.py):
refusal of non-changelog commits, per-version ranged offsets, staged
snapshot invisibility (rows AND schema), plus an engine-level drain
asserting one microbatch per published version and checkpoint resume."""

from pathlib import Path

import pytest

from dynamodb_zero_etl_s3tables_spark.spec import TableSpec
from dynamodb_zero_etl_s3tables_spark.streaming.table_source import (
    changelog_schema_ddl,
    drain_changelog,
    make_changelog_source,
    published_head,
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


def _reader(manifest, max_versions=None):
    opts = {"manifest": manifest, "keys": "pk"}
    if max_versions is not None:
        opts["max_versions_per_batch"] = str(max_versions)
    src = make_changelog_source()(options=opts)
    return src.simpleStreamReader(src.schema())


def test_reader_emits_one_version_per_read(spark, warehouse):
    t, mp = _mk(spark, warehouse)
    t.apply_changes(
        spark.createDataFrame(
            [("MODIFY", 3, "C", 30.0, 1, 1), ("REMOVE", 1, None, None, 1, 2)],
            "op string, pk long, status string, price double, ts long, seq long",
        ),
        strategy="merge-on-read",
    )
    r = _reader(mp)
    # batch 1: bootstrap only (default max_versions_per_batch=1)
    rows1, off1 = r.read(r.initialOffset())
    rows1 = sorted(rows1)
    assert off1 == {"v": 1}
    assert rows1 == [(1, "INSERT", 1, "A", 10.0), (1, "INSERT", 2, "B", 20.0)]
    # batch 2: the merge-on-read wave
    rows2, off2 = r.read(off1)
    rows2 = sorted(rows2)
    assert off2 == {"v": 2}
    assert (2, "DELETE", 1, None, None) in rows2
    assert (2, "UPSERT", 3, "C", 30.0) in rows2
    # caught up: nothing more, offset stable
    again, off3 = r.read(off2)
    assert list(again) == [] and off3 == off2
    # replay between committed offsets returns the union
    assert sorted(r.readBetweenOffsets({"v": 0}, {"v": 2})) == sorted(
        rows1 + rows2
    )


def test_reader_ranged_batch_cap(spark, warehouse):
    t, mp = _mk(spark, warehouse)
    t.apply_changes(
        spark.createDataFrame(
            [("MODIFY", 3, "C", 30.0, 1, 1)],
            "op string, pk long, status string, price double, ts long, seq long",
        ),
        strategy="merge-on-read",
    )
    # a wide cap drains the whole backlog in one ranged batch
    r = _reader(mp, max_versions=10)
    rows, off = r.read(r.initialOffset())
    assert off == {"v": 2}
    assert {v for (v, *_rest) in rows} == {1, 2}


_COW_WAVE = [
    ("MODIFY", 3, "C", 30.0, 1, 1),   # new key        -> INSERT
    ("MODIFY", 1, "A", 99.0, 1, 2),   # changed image  -> UPSERT
    ("REMOVE", 2, None, None, 1, 3),  # gone key       -> DELETE
]
_COW_DIFF_EXPECTED = {
    (2, "INSERT", 3, "C", 30.0),
    (2, "UPSERT", 1, "A", 99.0),
    (2, "DELETE", 2, None, None),
}


def test_reader_diffs_cow_commits(spark, warehouse):
    """r8 (VERDICT r7 #2): a copy-on-write merge version emits the
    keyed snapshot diff vs the previous published version — the
    read_changes semantics, not a refusal."""
    t, mp = _mk(spark, warehouse)
    t.apply_changes(
        spark.createDataFrame(
            _COW_WAVE,
            "op string, pk long, status string, price double, ts long, seq long",
        )
    )  # copy-on-write merge: no per-row change files -> diff fallback
    r = _reader(mp, max_versions=10)
    rows, off = r.read(r.initialOffset())
    rows = list(rows)
    assert off == {"v": 2}
    v2 = {t_ for t_ in rows if t_[0] == 2}
    assert v2 == _COW_DIFF_EXPECTED
    # an identical-image CoW rewrite diffs to zero rows
    t.compact()
    rows2 = list(r.readBetweenOffsets({"v": 2}, {"v": 3}))
    assert rows2 == []


def test_reader_skips_staged_snapshots(spark, warehouse):
    t, mp = _mk(spark, warehouse)
    t.stage_changes(
        spark.createDataFrame(
            [("MODIFY", 9, "Z", 1.0, 1, 1)],
            "op string, pk long, status string, price double, ts long, seq long",
        )
    )
    r = _reader(mp, max_versions=10)
    rows, off = r.read(r.initialOffset())
    # only the published bootstrap is visible; the staged WAP commit
    # must be invisible to changelog consumers until publish
    assert off == {"v": 1}
    assert all(v == 1 for (v, *_rest) in rows)


def test_schema_binds_to_published_snapshot_not_staged(spark, warehouse):
    """A staged WAP commit carrying schema evolution must not leak its
    unpublished columns into the stream schema (offset logic already
    skips its rows)."""
    t, mp = _mk(spark, warehouse)
    t.stage_changes(
        spark.createDataFrame(
            [("MODIFY", 9, "Z", 1.0, "new", 1, 1)],
            "op string, pk long, status string, price double, "
            "extra string, ts long, seq long",
        )
    )
    ddl = changelog_schema_ddl(mp)
    assert "extra" not in ddl
    assert ddl.startswith("version bigint, change_op string, ")
    # the reader's emitted column list matches the published schema too
    r = _reader(mp, max_versions=10)
    rows, _ = r.read(r.initialOffset())
    assert all(len(t_) == 2 + 3 for t_ in rows)  # version, op, 3 cols


def test_schema_primitive_arrays_native_nested_shimmed(spark, warehouse):
    # arrays of primitives stream (r7: embedding columns for the h24
    # index-maintenance loop) ...
    t = Catalog(spark, warehouse).create_table(
        TableSpec(namespace="ns", name="arr", key_columns=("pk",))
    )
    t.bootstrap(
        spark.createDataFrame([(1, [1.0, 2.0])], "pk long, vec array<double>")
    )
    src = make_changelog_source()(
        options={"manifest": f"{warehouse}/ns/arr/manifest.json", "keys": "pk"}
    )
    assert "`vec` array<double>" in src.schema()

    # ... and nested arrays / structs ride as JSON-string shims (r10,
    # VERDICT r9 #5 — restored consumer-side by restore_nested_columns;
    # round-trip fidelity pinned in tests/test_nested_changelog.py)
    t2 = Catalog(spark, warehouse).create_table(
        TableSpec(namespace="ns", name="nested", key_columns=("pk",))
    )
    t2.bootstrap(
        spark.createDataFrame(
            [(1, [[1.0]])], "pk long, mat array<array<double>>"
        )
    )
    src2 = make_changelog_source()(
        options={"manifest": f"{warehouse}/ns/nested/manifest.json", "keys": "pk"}
    )
    assert "`mat` string" in src2.schema()


def test_drain_one_microbatch_per_version_and_resume(spark, warehouse, tmp_path):
    """Engine-level contract: a 2-commit backlog drains as >=2
    microbatches (one per published version — not Spark's single-batch
    AvailableNow fallback), and a later drain resumes from the
    checkpointed version, appending only the new commit's rows."""
    t, mp = _mk(spark, warehouse)
    t.apply_changes(
        spark.createDataFrame(
            [("MODIFY", 3, "C", 30.0, 1, 1)],
            "op string, pk long, status string, price double, ts long, seq long",
        ),
        strategy="merge-on-read",
    )
    assert published_head(mp) == 2
    spark.dataSource.register(make_changelog_source())
    stream = (
        spark.readStream.format("table_changelog")
        .option("manifest", mp)
        .option("keys", "pk")
        .load()
    )
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    batches = drain_changelog(stream, out, ckpt, mp)
    assert batches >= 2, f"2-commit backlog must drain as >=2 microbatches, got {batches}"
    n1 = spark.read.parquet(out).count()
    assert n1 == 2 + 1  # bootstrap inserts + one upsert

    # a third commit, then resume from the checkpoint
    t.apply_changes(
        spark.createDataFrame(
            [("REMOVE", 2, None, None, 2, 1)],
            "op string, pk long, status string, price double, ts long, seq long",
        ),
        strategy="merge-on-read",
    )
    batches2 = drain_changelog(stream, out, ckpt, mp)
    assert batches2 >= 1
    got = spark.read.parquet(out)
    assert got.count() == n1 + 1
    assert got.filter("version = 3 and change_op = 'DELETE'").count() == 1


def test_decimal_columns_stream_end_to_end(spark, warehouse, tmp_path):
    """decimal(p,s) is the B3 codec's DEFAULT number type (DynamoDB N
    decodes to DECIMAL(38,18)) — the changelog source must carry it
    (it refused before r9): the schema DDL interpolates the decimal
    type string, a real Spark drain round-trips Decimal images through
    the python-runner pickle exactly, and the MoR delta path emits
    decimal upserts."""
    from decimal import Decimal

    from dynamodb_zero_etl_s3tables_spark.streaming.table_source import (
        changelog_schema_ddl,
    )

    t = Catalog(spark, warehouse).create_table(
        TableSpec(namespace="ns", name="cdfdec", key_columns=("pk",))
    )
    t.bootstrap(
        spark.createDataFrame(
            [
                (1, Decimal("10.5"), b"\x00img"),
                (2, Decimal("0.000000000000000001"), b""),
            ],
            "pk long, price decimal(38,18), blob binary",
        )
    )
    t.apply_changes(
        spark.createDataFrame(
            [("MODIFY", 1, Decimal("11.5"), b"\xff", 1, 1)],
            "op string, pk long, price decimal(38,18), blob binary,"
            " ts long, seq long",
        ),
        strategy="merge-on-read",
    )
    mp = f"{warehouse}/ns/cdfdec/manifest.json"
    ddl = changelog_schema_ddl(mp)
    assert "`price` decimal(38,18)" in ddl and "`blob` binary" in ddl
    spark.dataSource.register(make_changelog_source())
    stream = (
        spark.readStream.format("table_changelog")
        .option("manifest", mp)
        .load()
    )
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    drain_changelog(stream, out, ckpt, mp)
    got = {
        (r.version, r.change_op, r.pk): (r.price, bytes(r.blob))
        for r in spark.read.parquet(out).collect()
    }
    assert got[(1, "INSERT", 1)] == (Decimal("10.5"), b"\x00img")
    assert got[(1, "INSERT", 2)] == (Decimal("1E-18"), b"")
    assert got[(2, "UPSERT", 1)] == (Decimal("11.5"), b"\xff")


# -- partitioned reader (r7, the fat-batch upgrade) --------------------------

def test_partitioned_reader_per_file_parts_and_delete_suppression(
    spark, warehouse
):
    from dynamodb_zero_etl_s3tables_spark.streaming.table_source import (
        make_partitioned_changelog_source,
    )

    t, mp = _mk(spark, warehouse)
    # wave: pk=2 gets a new image AND a tombstone (suppressed delete),
    # pk=1 a bare tombstone (emitted), pk=3 a fresh upsert
    t.apply_changes(
        spark.createDataFrame(
            [
                ("MODIFY", 2, "B2", 21.0, 1, 1),
                ("MODIFY", 3, "C", 30.0, 1, 2),
                ("REMOVE", 1, None, None, 1, 3),
                ("REMOVE", 2, None, None, 1, 0),
            ],
            "op string, pk long, status string, price double, ts long, seq long",
        ),
        strategy="merge-on-read",
    )
    src = make_partitioned_changelog_source()(
        options={"manifest": mp, "keys": "pk"}
    )
    r = src.streamReader(None)
    assert r.initialOffset() == {"v": 0}
    head = r.latestOffset()
    assert head == {"v": 2}
    parts = r.partitions({"v": 0}, head)
    # at least one INSERT (bootstrap file), one UPSERT, one DELETE part
    roles = {p.change_op for p in parts}
    assert roles == {"INSERT", "UPSERT", "DELETE"}
    # every partition names exactly one parquet file
    assert all(p.path.endswith(".parquet") for p in parts)
    rows = [row for p in parts for row in r.read(p)]
    by_op = {}
    for row in rows:
        by_op.setdefault(row[1], []).append(row)
    assert {x[2] for x in by_op["INSERT"]} == {1, 2}      # bootstrap rows
    assert {x[2] for x in by_op["UPSERT"]} == {2, 3}      # new images
    assert {x[2] for x in by_op["DELETE"]} == {1}         # pk=2 suppressed
    assert by_op["DELETE"][0][3] is None                  # non-key cols null
    # version ranging: a (1, 2] range excludes the bootstrap
    parts2 = r.partitions({"v": 1}, {"v": 2})
    assert {p.change_op for p in parts2} == {"UPSERT", "DELETE"}
    # empty range -> the no-op placeholder partition, which yields nothing
    parts3 = r.partitions({"v": 2}, {"v": 2})
    assert len(parts3) == 1 and list(r.read(parts3[0])) == []


def test_partitioned_reader_diffs_cow_commits(spark, warehouse):
    """The partitioned reader plans ONE COW_DIFF partition per CoW
    version and its read() yields the same diff as the simple reader
    (executor-side, off the driver)."""
    from dynamodb_zero_etl_s3tables_spark.streaming.table_source import (
        make_partitioned_changelog_source,
    )

    t, mp = _mk(spark, warehouse)
    t.apply_changes(
        spark.createDataFrame(
            _COW_WAVE,
            "op string, pk long, status string, price double, ts long, seq long",
        ),
        strategy="copy-on-write",
    )
    src = make_partitioned_changelog_source()(
        options={"manifest": mp, "keys": "pk"}
    )
    r = src.streamReader(None)
    parts = r.partitions({"v": 0}, r.latestOffset())
    cow = [p for p in parts if p.change_op == "COW_DIFF"]
    assert len(cow) == 1 and cow[0].version == 2
    assert set(r.read(cow[0])) == _COW_DIFF_EXPECTED


def test_partitioned_table_streams_end_to_end(spark, warehouse):
    """r8 review: partitioned tables previously could not stream at
    all (the flat glob over a partitioned data_dir silently emitted
    zero rows, because partition VALUES live in dir names, not the
    files). The readers now read per manifest entry with typed values
    re-attached — bootstrap, MoR deltas, AND pruned CoW merges (the
    entries list carries untouched dirs by reference, which is the
    exact file set the diff needs)."""
    t = Catalog(spark, warehouse).create_table(
        TableSpec(
            namespace="ns", name="cdfp", key_columns=("pk",),
            partition_columns=("status",),
        )
    )
    t.bootstrap(
        spark.createDataFrame(
            [(1, "A", 10.0), (2, "B", 20.0)], "pk long, status string, price double"
        )
    )
    t.apply_changes(  # pruned CoW merge touching partition A only
        spark.createDataFrame(
            [("MODIFY", 1, "A", 99.0, 1, 1)],
            "op string, pk long, status string, price double, ts long, seq long",
        )
    )
    r = _reader(f"{warehouse}/ns/cdfp/manifest.json", max_versions=10)
    rows, off = r.read(r.initialOffset())
    rows = sorted(rows)
    assert off == {"v": 2}
    # bootstrap INSERTs carry the typed partition values
    assert [x for x in rows if x[0] == 1] == [
        (1, "INSERT", 1, "A", 10.0),
        (1, "INSERT", 2, "B", 20.0),
    ]
    # the pruned CoW merge diffs to ONLY the touched row — the
    # carried partition (B) is resolved through its entry reference
    assert [x for x in rows if x[0] == 2] == [(2, "UPSERT", 1, "A", 99.0)]
    # the partitioned reader plans per-entry INSERT parts for the
    # partitioned bootstrap (typed values attached at planning time)
    from dynamodb_zero_etl_s3tables_spark.streaming.table_source import (
        make_partitioned_changelog_source,
    )

    src = make_partitioned_changelog_source()(
        options={"manifest": f"{warehouse}/ns/cdfp/manifest.json"}
    )
    pr = src.streamReader(None)
    parts = pr.partitions({"v": 0}, {"v": 2})
    got = sorted(row for p in parts for row in pr.read(p))
    assert got == rows


def test_cow_diff_refuses_vacuumed_base(tmp_path):
    """r8 self-review: when every retained snapshot <= the pre-image
    version is a merge-mor delta (full-rewrite base vacuumed), the
    diff must refuse loudly — a silent empty base would emit spurious
    INSERTs and miss DELETEs."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from dynamodb_zero_etl_s3tables_spark.streaming.table_source import (
        _cow_closures,
    )

    _rows, _snap_rows, _coerce, resolve_state, diff_changes = _cow_closures()
    # synthetic manifest: v2 is merge-mor (base v1 vacuumed away),
    # v3 is a CoW rewrite
    ins = tmp_path / "v2" / "inserts"; ins.mkdir(parents=True)
    dels = tmp_path / "v2" / "deletes"; dels.mkdir(parents=True)
    pq.write_table(pa.table({"pk": [1], "x": [10]}), ins / "a.parquet")
    pq.write_table(pa.table({"pk": [9]}), dels / "a.parquet")
    v3 = tmp_path / "v3"; v3.mkdir()
    pq.write_table(pa.table({"pk": [1], "x": [11]}), v3 / "a.parquet")
    raw = {"snapshots": [
        {"version": 2, "operation": "merge-mor",
         "delta": {"inserts": str(ins), "deletes": str(dels)}},
        {"version": 3, "operation": "merge", "data_dir": str(v3)},
    ]}
    import pytest as _pt

    with _pt.raises(ValueError, match="vacuumed too"):
        diff_changes(raw, raw["snapshots"][1], ["pk"], ["pk", "x"])


def test_cow_diff_state_cache_rolls_forward(tmp_path):
    """A cached (version, state) pair short-circuits re-resolution:
    the next version's diff starts from it and applies only newer
    commits — and produces the same answer as a cold resolve."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from dynamodb_zero_etl_s3tables_spark.streaming.table_source import (
        _cow_closures,
    )

    _rows, _snap_rows, _coerce, resolve_state, diff_changes = _cow_closures()
    v1 = tmp_path / "v1"; v1.mkdir()
    pq.write_table(pa.table({"pk": [1, 2], "x": [10, 20]}), v1 / "a.parquet")
    v2 = tmp_path / "v2"; v2.mkdir()
    pq.write_table(pa.table({"pk": [1, 3], "x": [11, 30]}), v2 / "a.parquet")
    v3 = tmp_path / "v3"; v3.mkdir()
    pq.write_table(pa.table({"pk": [1, 3], "x": [12, 30]}), v3 / "a.parquet")
    raw = {"snapshots": [
        {"version": 1, "operation": "bootstrap", "data_dir": str(v1)},
        {"version": 2, "operation": "merge", "data_dir": str(v2)},
        {"version": 3, "operation": "merge", "data_dir": str(v3)},
    ]}
    cold2, cache2 = diff_changes(raw, raw["snapshots"][1], ["pk"], ["pk", "x"])
    assert cache2[0] == 2
    warm3, cache3 = diff_changes(
        raw, raw["snapshots"][2], ["pk"], ["pk", "x"], cache=cache2
    )
    cold3, _ = diff_changes(raw, raw["snapshots"][2], ["pk"], ["pk", "x"])
    assert sorted(map(str, warm3)) == sorted(map(str, cold3))
    assert {op for op, _r in warm3} == {"UPSERT"}  # only pk1 changed
    # a cache AHEAD of the requested version is ignored (replay path)
    replay2, _ = diff_changes(
        raw, raw["snapshots"][1], ["pk"], ["pk", "x"], cache=cache3
    )
    assert sorted(map(str, replay2)) == sorted(map(str, cold2))


# -- property law: reader-side CoW diff == ManagedTable.read_changes ----------
# The r8 fallback restates read_changes (full-outer-join keyed diff)
# over pyarrow row dicts. The two implementations must agree on
# ARBITRARY change sequences, not just the golden fixtures: same keys
# per op class, same surviving images (op vocabulary mapping:
# INSERT<->INSERT, MODIFY<->UPSERT, REMOVE<->DELETE-with-null-nonkeys).

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_wave_st = st.lists(
    st.tuples(
        st.sampled_from(["MODIFY", "REMOVE"]),
        st.integers(min_value=0, max_value=7),          # pk
        st.one_of(st.none(), st.sampled_from(["A", "B"])),  # status
        st.one_of(st.none(), st.floats(min_value=0, max_value=9,
                                       allow_nan=False).map(lambda x: round(x, 1))),
    ),
    min_size=1, max_size=6,
    unique_by=lambda c: c[1],  # one change per key: LWW ties are b06's law
)


@settings(
    max_examples=12, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(wave=_wave_st)
def test_cow_diff_matches_read_changes(spark, wave):
    import json as _j
    import tempfile

    from pyspark.sql import functions as F

    from dynamodb_zero_etl_s3tables_spark.streaming.table_source import (
        _cow_closures,
    )

    wh = tempfile.mkdtemp(prefix="cowlaw_")
    t = Catalog(spark, wh).create_table(
        TableSpec(namespace="ns", name="law", key_columns=("pk",))
    )
    t.bootstrap(
        spark.createDataFrame(
            [(k, "A", float(k)) for k in range(0, 8, 2)],
            "pk long, status string, price double",
        )
    )
    t.apply_changes(  # copy-on-write
        spark.createDataFrame(
            [(op, pk, s, p, 1, i) for i, (op, pk, s, p) in enumerate(wave)],
            "op string, pk long, status string, price double, ts long, seq long",
        )
    )
    # reference: the batch-side keyed diff
    ref = {
        (r.op, r.pk): (r.status, r.price)
        for r in t.read_changes(1, 2).collect()
    }
    # reader-side diff
    _rows, _snap_rows, _coerce, _resolve, diff = _cow_closures()
    raw = _j.loads(open(f"{wh}/ns/law/manifest.json").read())
    changes, _cache = diff(
        raw, raw["snapshots"][1], ["pk"], ["pk", "status", "price"]
    )
    got = {}
    for op, r in changes:
        got[({"INSERT": "INSERT", "UPSERT": "MODIFY", "DELETE": "REMOVE"}[op],
             r["pk"])] = (r.get("status"), r.get("price"))
    # REMOVE: read_changes carries the OLD image, the stream carries
    # null non-keys — compare keys-only for that class
    assert {k for k in ref} == {k for k in got}
    for k, v in ref.items():
        if k[0] != "REMOVE":
            assert got[k] == v, (k, got[k], v)
        else:
            assert got[k] == (None, None)


def test_reader_emits_mor_predicate_dml_as_delta(spark, warehouse):
    """r8 review: delete-mor/update-mor snapshots share merge-mor's
    delta-layer shape and must walk the delta path — falling into the
    CoW diff (whose flat glob over the delta root reads zero rows)
    emitted a DELETE for every live key."""
    t, mp = _mk(spark, warehouse)
    # v2: predicate DELETE as a tombstone layer (matches pk=2 only)
    t.delete_where([("price", ">", 15.0)], strategy="merge-on-read")
    # v3: predicate UPDATE as a delta layer (touches pk=1 only)
    t.update_where(
        [("pk", "=", 1)], {"price": "price + 1"}, strategy="merge-on-read"
    )
    r = _reader(mp, max_versions=10)
    rows, off = r.read(r.initialOffset())
    rows = sorted(rows)
    assert off == {"v": 3}
    v2 = [x for x in rows if x[0] == 2]
    assert v2 == [(2, "DELETE", 2, None, None)]  # NOT every live key
    v3 = [x for x in rows if x[0] == 3]
    assert v3 == [(3, "UPSERT", 1, "A", 11.0)]
    # the same two versions through the partitioned reader
    from dynamodb_zero_etl_s3tables_spark.streaming.table_source import (
        make_partitioned_changelog_source,
    )

    src = make_partitioned_changelog_source()(
        options={"manifest": mp, "keys": "pk"}
    )
    pr = src.streamReader(None)
    parts = pr.partitions({"v": 1}, {"v": 3})
    assert all(p.change_op != "COW_DIFF" for p in parts)
    got = sorted(row for p in parts for row in pr.read(p))
    assert got == v2 + v3
    # a MoR delta version is also a valid state step for a later CoW
    # diff (base -> delta -> delta -> compact diffs to zero rows)
    t.compact()
    assert list(r.readBetweenOffsets({"v": 3}, {"v": 4})) == []


def test_cow_diff_applies_read_renames(spark, warehouse):
    """r8 review: the reader-side diff must read full snapshots
    through the snapshot's read_renames mapping, or the first CoW
    commit after ALTER TABLE RENAME COLUMN emits a spurious UPSERT
    for every unchanged row (and disagrees with read_changes)."""
    t, mp = _mk(spark, warehouse)
    t.rename_column("price", "amount")  # v2: metadata-only commit
    t.apply_changes(  # v3: copy-on-write merge touching pk=1 only
        spark.createDataFrame(
            [("MODIFY", 1, "A", 99.0, 1, 1)],
            "op string, pk long, status string, amount double, ts long, seq long",
        )
    )
    r = _reader(mp, max_versions=10)
    rows = sorted(r.read(r.initialOffset())[0])
    # the rename version itself: an all-UPSERT wave under the new
    # name — exactly what read_changes reports (name-based alignment)
    v2 = [x for x in rows if x[0] == 2]
    assert sorted(v2) == [(2, "UPSERT", 1, "A", 10.0), (2, "UPSERT", 2, "B", 20.0)]
    assert {row.op for row in t.read_changes(1, 2).collect()} == {"MODIFY"}
    # the post-rename CoW merge: ONLY the touched row, no spurious wave
    v3 = [x for x in rows if x[0] == 3]
    assert v3 == [(3, "UPSERT", 1, "A", 99.0)]
    batch = {(row.op, row.pk) for row in t.read_changes(2, 3).collect()}
    assert batch == {("MODIFY", 1)}


_ops_st = st.lists(
    st.tuples(
        st.sampled_from(["cow", "mor", "delmor", "updmor", "compact"]),
        st.integers(min_value=0, max_value=9),  # seed: which keys the op hits
    ),
    min_size=2, max_size=4,
)


@settings(
    max_examples=8, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=_ops_st)
def test_changelog_replay_reconstructs_table(spark, ops):
    """Integrity law for the WHOLE changelog contract (r8): draining
    the stream across an arbitrary interleaving of copy-on-write
    merges, merge-on-read merges, predicate DML delta layers
    (delete-mor / update-mor) and compaction, then replaying the
    emitted changes key-by-key, must reconstruct exactly the table's
    current state — the round-trip every downstream CDC consumer
    depends on. (The r8 review found delete-mor/update-mor versions
    corrupting into all-key DELETE waves; this law pins every op
    class at once.)"""
    import tempfile

    wh = tempfile.mkdtemp(prefix="replaylaw_")
    t = Catalog(spark, wh).create_table(
        TableSpec(namespace="ns", name="rp", key_columns=("pk",))
    )
    t.bootstrap(
        spark.createDataFrame(
            [(k, "A", float(10 * k)) for k in range(6)],
            "pk long, status string, price double",
        )
    )
    wave_schema = (
        "op string, pk long, status string, price double, ts long, seq long"
    )
    for i, (kind, seed) in enumerate(ops):
        if kind in ("cow", "mor"):
            wave = [
                ("MODIFY", (seed + j) % 8, "B", float(seed + j), 1, j)
                for j in range(2)
            ] + [("REMOVE", (seed + 5) % 8, None, None, 1, 9)]
            t.apply_changes(
                spark.createDataFrame(wave, wave_schema),
                strategy="merge-on-read" if kind == "mor" else "copy-on-write",
            )
        elif kind == "delmor":
            t.delete_where(
                [("pk", "=", seed % 8)], strategy="merge-on-read"
            )
        elif kind == "updmor":
            t.update_where(
                [("pk", "<", seed % 8)], {"price": "price + 1"},
                strategy="merge-on-read",
            )
        else:
            t.compact()
    mp = f"{wh}/ns/rp/manifest.json"
    r = _reader(mp, max_versions=100)
    rows, off = r.read(r.initialOffset())
    assert off == {"v": published_head(mp)}
    state = {}
    for (v, op, pk, status, price) in sorted(rows, key=lambda x: x[0]):
        if op == "DELETE":
            state.pop(pk, None)
        else:
            state[pk] = (status, price)
    expected = {row.pk: (row.status, row.price) for row in t.read().collect()}
    assert state == expected, (ops, state, expected)


def test_stream_keys_derived_from_manifest_and_validated(spark, warehouse):
    """r8 review: the manifest's persisted key_columns are the
    authoritative key list — derived when the keys option is absent,
    and a mismatching option refuses instead of silently keying the
    diff on the wrong column."""
    t, mp = _mk(spark, warehouse)
    src = make_changelog_source()(options={"manifest": mp})  # no keys
    r = src.simpleStreamReader(src.schema())
    rows, _ = r.read(r.initialOffset())
    assert len(list(rows)) == 2
    bad = make_changelog_source()(options={"manifest": mp, "keys": "status"})
    with pytest.raises(ValueError, match="key_columns"):
        bad.simpleStreamReader(bad.schema())


def test_schema_refuses_metadata_column_collision(spark, warehouse):
    """A table column named `version` (or `change_op`) would produce
    a duplicate-field stream schema — refuse loudly."""
    t = Catalog(spark, warehouse).create_table(
        TableSpec(namespace="ns", name="collide", key_columns=("pk",))
    )
    t.bootstrap(spark.createDataFrame([(1, 5)], "pk long, version long"))
    with pytest.raises(ValueError, match="collides"):
        changelog_schema_ddl(f"{warehouse}/ns/collide/manifest.json")


def test_cow_diff_refuses_truncated_history(spark, warehouse):
    """r8 review: when retention expired every version below a CoW
    snapshot, the diff's pre-image is GONE — a silent empty pre-image
    would re-emit all live rows as INSERT and drop real DELETEs.
    Refuse loudly (same posture as the vacuumed MoR base)."""
    t, mp = _mk(spark, warehouse)
    t.apply_changes(
        spark.createDataFrame(
            [("MODIFY", 1, "A", 50.0, 1, 1)],
            "op string, pk long, status string, price double, ts long, seq long",
        )
    )  # v2 CoW
    t.apply_changes(
        spark.createDataFrame(
            [("REMOVE", 2, None, None, 1, 1)],
            "op string, pk long, status string, price double, ts long, seq long",
        )
    )  # v3 CoW
    t.expire_snapshots(retain_last=1)  # only v3 survives
    r = _reader(mp, max_versions=10)
    with pytest.raises(ValueError, match="truncated"):
        list(r.readBetweenOffsets({"v": 2}, {"v": 3}))


def test_cow_diff_nan_values_are_stable(spark, warehouse):
    """r8 review: NaN != NaN in Python, but Spark's null-safe compare
    (and read_changes) treat NaN as equal to itself — an unchanged
    NaN-carrying row must not re-emit as UPSERT every CoW version."""
    t = Catalog(spark, warehouse).create_table(
        TableSpec(namespace="ns", name="nan", key_columns=("pk",))
    )
    t.bootstrap(
        spark.createDataFrame(
            [(1, float("nan")), (2, 1.0)], "pk long, x double"
        )
    )
    t.overwrite(
        spark.createDataFrame(
            [(1, float("nan")), (2, 2.0)], "pk long, x double"
        )
    )
    r = _reader(f"{warehouse}/ns/nan/manifest.json", max_versions=10)
    rows, _ = r.read(r.initialOffset())
    v2 = [x for x in rows if x[0] == 2]
    assert v2 == [(2, "UPSERT", 2, 2.0)]  # the NaN row is silent
    assert {row.pk for row in t.read_changes(1, 2).collect()} == {2}


# -- partitioned CoW diff: partition-local, untouched dirs unread (r9) -------


def _corrupt_parquet_under(dirs):
    """Overwrite every parquet file under the given dirs with garbage:
    any later read of these files crashes, so a diff that succeeds
    afterwards PROVABLY never opened them."""
    import glob
    import os

    n = 0
    for d in dirs:
        for f in glob.glob(os.path.join(d, "**", "*.parquet"), recursive=True):
            with open(f, "wb") as fh:
                fh.write(b"not parquet")
            n += 1
    assert n > 0, "corruption fixture matched no files"


def test_partitioned_cow_diff_reads_only_rewritten_partitions(spark, warehouse):
    """r8 verdict #3: a pruned CoW merge's changelog diff must read
    ONLY the rewritten partition dirs — carried entries are identical
    by reference. Proven by corrupting the untouched partitions' files
    after computing the batch-side expectation: the reader still
    diffs every version correctly, which is impossible if it had
    opened them. Covers rewrite (UPSERT/INSERT within a partition),
    new-partition INSERT waves, and whole-partition-vanish DELETEs."""
    import json as _j

    t = Catalog(spark, warehouse).create_table(
        TableSpec(
            namespace="ns", name="cdfpl", key_columns=("pk",),
            partition_columns=("status",),
        )
    )
    t.bootstrap(
        spark.createDataFrame(
            [(1, "A", 10.0), (2, "A", 11.0), (3, "B", 20.0), (4, "C", 30.0)],
            "pk long, status string, price double",
        )
    )
    chg = "op string, pk long, status string, price double, ts long, seq long"
    # v2: touch ONLY partition A (modify, delete, insert) + birth a
    # NEW partition D; B and C are carried by reference
    t.apply_changes(
        spark.createDataFrame(
            [
                ("MODIFY", 1, "A", 99.0, 1, 1),
                ("REMOVE", 2, None, None, 1, 1),
                ("INSERT", 5, "A", 12.0, 1, 1),
                ("INSERT", 6, "D", 40.0, 1, 1),
            ],
            chg,
        )
    )
    # v3: remove EVERY key of partition A -> the partition vanishes
    t.apply_changes(
        spark.createDataFrame(
            [("REMOVE", 1, None, None, 2, 1), ("REMOVE", 5, None, None, 2, 1)],
            chg,
        )
    )

    def expect(lo, hi):
        out = {}
        for r in t.read_changes(lo, hi).collect():
            out[
                ({"INSERT": "INSERT", "MODIFY": "UPSERT", "REMOVE": "DELETE"}[r.op],
                 r.pk)
            ] = (r.status, r.price)
        return out

    exp2, exp3 = expect(1, 2), expect(2, 3)

    # corrupt the partitions v2/v3 never rewrote: B and C (bootstrap
    # dirs, carried by reference through v2 and v3)
    mp = f"{warehouse}/ns/cdfpl/manifest.json"
    raw = _j.loads(open(mp).read())
    boot = raw["snapshots"][0]
    untouched = [
        e["dir"] for e in boot["partitions"] if e["values"]["status"] in ("B", "C")
    ]
    assert len(untouched) == 2
    _corrupt_parquet_under(untouched)

    def got_of(rows, v):
        out = {}
        for x in rows:
            if x[0] != v:
                continue
            _v, op, pk, status, price = x
            out[(op, pk)] = (status, price)
        return out

    # simple reader: diff v2 and v3 off the corrupted warehouse
    r = _reader(mp, max_versions=1)
    rows2, off2 = r.read({"v": 1})
    rows3, off3 = r.read(off2)
    rows2, rows3 = list(rows2), list(rows3)
    assert (off2, off3) == ({"v": 2}, {"v": 3})
    for got, exp in ((got_of(rows2, 2), exp2), (got_of(rows3, 3), exp3)):
        assert set(got) == set(exp)
        for k, v in exp.items():
            if k[0] == "DELETE":
                assert got[k][0] is None and got[k][1] is None
            else:
                assert got[k] == v, (k, got[k], v)

    # partitioned reader: same emission through executor-side parts
    from dynamodb_zero_etl_s3tables_spark.streaming.table_source import (
        make_partitioned_changelog_source,
    )

    src = make_partitioned_changelog_source()(options={"manifest": mp})
    pr = src.streamReader(None)
    prows = [row for p in pr.partitions({"v": 1}, {"v": 3}) for row in pr.read(p)]
    assert got_of(prows, 2) == got_of(rows2, 2)
    assert got_of(prows, 3) == got_of(rows3, 3)


def test_partitioned_rename_boundary_emits_upsert_wave(spark, warehouse):
    """Partitioned renames landed (r9, per-entry mappings): a rename
    version's entries keep their DIRS but change their ``renames``
    mapping, so the partition-local fast path may NOT skip them as
    carried — the version must emit the same O(table) UPSERT wave
    read_changes reports (name-based semantics), and a later pruned
    merge that mixes an old-named carried entry with a new-named
    fresh one still diffs exactly (only the touched partition)."""
    t = Catalog(spark, warehouse).create_table(
        TableSpec(
            namespace="ns", name="cdfpr", key_columns=("pk",),
            partition_columns=("status",),
        )
    )
    t.bootstrap(
        spark.createDataFrame(
            [(1, "A", 10.0), (2, "B", 20.0)],
            "pk long, status string, price double",
        )
    )
    t.rename_column("price", "amount")  # v2: metadata-only
    t.apply_changes(  # v3: pruned merge touching partition A only
        spark.createDataFrame(
            [("MODIFY", 1, "A", 11.0, 1, 1)],
            "op string, pk long, status string, amount double,"
            " ts long, seq long",
        )
    )
    ref2 = {(r.op, r.pk, r.amount) for r in t.read_changes(1, 2).collect()}
    assert ref2 == {("MODIFY", 1, 10.0), ("MODIFY", 2, 20.0)}
    ref3 = {(r.op, r.pk, r.amount) for r in t.read_changes(2, 3).collect()}
    assert ref3 == {("MODIFY", 1, 11.0)}

    r = _reader(f"{warehouse}/ns/cdfpr/manifest.json", max_versions=1)
    _, off1 = r.read({"v": 0})
    rows2, off2 = r.read(off1)
    rows2 = list(rows2)
    assert off2 == {"v": 2}
    # rename boundary: same dirs, new mapping -> per-entry diff = wave
    assert {(x[1], x[2], x[4]) for x in rows2} == {
        ("UPSERT", 1, 10.0),
        ("UPSERT", 2, 20.0),
    }, rows2
    # corrupted-untouched-partition proof ACROSS the rename commit
    # (r10, VERDICT r9 #8): once the rename wave is consumed, the
    # carried partition B — which still binds through its rename
    # mapping — must never be opened again by later pruned-merge
    # diffs. Corrupt it between the v2 and v3 reads: a v3 diff that
    # succeeds provably read only the rewritten partition A.
    _corrupt_parquet_under(
        [
            e["dir"]
            for e in t.history()[-1].partitions
            if e["values"]["status"] == "B"
        ]
    )
    rows3, off3 = r.read(off2)
    rows3 = list(rows3)
    assert off3 == {"v": 3}
    # post-rename pruned merge: only the touched partition is diffed
    assert {(x[1], x[2], x[4]) for x in rows3} == {("UPSERT", 1, 11.0)}, rows3


def test_partitioned_drop_version_is_changelog_transparent(spark, warehouse):
    """A partitioned DROP COLUMN pops the dropped column's mapping
    from every entry; the carried-entry check compares COLUMN
    RESOLUTIONS (which file column each emitted column binds to), so
    the drop version — whose surviving columns resolve identically —
    is skipped WITHOUT reading any entry (r9 review: the raw-dict
    compare double-read every previously-renamed entry just to emit
    zero rows). Proven read-free by corrupting the carried partition's
    parquet before the drain. A later pruned merge then diffs exactly
    against read_changes under the surviving schema."""
    t = Catalog(spark, warehouse).create_table(
        TableSpec(
            namespace="ns", name="cdfdrop", key_columns=("pk",),
            partition_columns=("status",),
        )
    )
    t.bootstrap(
        spark.createDataFrame(
            [(1, "A", 10.0, "x"), (2, "B", 20.0, "y")],
            "pk long, status string, price double, note string",
        )
    )
    t.rename_column("price", "amount")  # v2: entries gain a mapping
    t.drop_column("amount")             # v3: mapping popped, schema shrinks
    t.apply_changes(  # v4: pruned merge on the surviving schema
        spark.createDataFrame(
            [("MODIFY", 1, "A", "z", 1, 1)],
            "op string, pk long, status string, note string, ts long, seq long",
        )
    )
    assert t.read_changes(2, 3).count() == 0  # batch API agrees

    # corrupt the carried partition's files: versions 2-4 must never
    # open them (B is resolution-unchanged at v2/v3 and carried at v4)
    for e in t.history()[0].partitions:
        if e["values"]["status"] == "B":
            for f in Path(e["dir"]).glob("*.parquet"):
                f.write_bytes(b"corrupt")

    r = _reader(f"{warehouse}/ns/cdfdrop/manifest.json", max_versions=1)
    off = {"v": 1}
    emitted = {}
    for v in (2, 3, 4):
        rows, off = r.read(off)
        emitted[v] = list(rows)
        assert off == {"v": v}
    # reader bound POST-drop: the rename wave carries no surviving-
    # column change, and the drop is transparent
    assert emitted[2] == [] and emitted[3] == []
    # (version, change_op, pk, status, note)
    assert {(x[1], x[2], x[4]) for x in emitted[4]} == {("UPSERT", 1, "z")}


def test_partition_spec_evolution_boundary_diffs_exactly(spark, warehouse):
    """r9 self-review: across a partition-spec evolution, the lazily
    migrating merge RE-KEYS every entry (status=X -> mon=Y layouts),
    so the partition-local fast path's entry matching would pair
    nothing and emit a spurious DELETE+INSERT per unchanged row. The
    layout-homogeneity guard must route that version to the generic
    keyed diff: the changelog for the migration version equals
    read_changes (only genuinely touched rows), and the evolution
    marker itself diffs to zero rows."""
    t = Catalog(spark, warehouse).create_table(
        TableSpec(
            namespace="ns", name="cdfev", key_columns=("pk",),
            partition_columns=("status",),
        )
    )
    t.bootstrap(
        spark.createDataFrame(
            [(1, "A", 1, 10.0), (2, "A", 2, 11.0), (3, "B", 3, 20.0)],
            "pk long, status string, mon long, price double",
        )
    )
    t.evolve_partitioning(("mon",))  # v2: metadata-only marker
    t.apply_changes(  # v3: migrating merge — touches ONLY pk=1
        spark.createDataFrame(
            [("MODIFY", 1, "A", 1, 99.0, 1, 1)],
            "op string, pk long, status string, mon long, price double,"
            " ts long, seq long",
        )
    )
    ref = {(r.op, r.pk) for r in t.read_changes(2, 3).collect()}
    assert ref == {("MODIFY", 1)}  # sanity: batch API reports one change

    r = _reader(f"{warehouse}/ns/cdfev/manifest.json", max_versions=1)
    rows2, off2 = r.read({"v": 1})
    rows3, off3 = r.read(off2)
    rows2, rows3 = list(rows2), list(rows3)
    assert (off2, off3) == ({"v": 2}, {"v": 3})
    assert rows2 == []  # evolution marker: changelog-transparent
    got3 = {(x[1], x[2]) for x in rows3}
    assert got3 == {("UPSERT", 1)}, rows3  # no DELETE+INSERT churn


_pwave_st = st.lists(
    st.tuples(
        st.sampled_from(["MODIFY", "REMOVE"]),
        st.integers(min_value=0, max_value=9),  # pk (8,9 = fresh keys)
        st.floats(min_value=0, max_value=9, allow_nan=False).map(
            lambda x: round(x, 1)
        ),
    ),
    min_size=1, max_size=6,
    unique_by=lambda c: c[1],
)


@settings(
    max_examples=10, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(wave=_pwave_st)
def test_partitioned_cow_diff_matches_read_changes(spark, wave):
    """r9: the PARTITION-LOCAL diff path must restate read_changes on
    arbitrary pruned-merge waves over a partitioned table (the
    unpartitioned law above never reaches part_local_diff). Partition
    values follow the engine's stable-per-key contract (status is a
    function of pk), as apply_changes documents."""
    import json as _j
    import tempfile

    from dynamodb_zero_etl_s3tables_spark.streaming.table_source import (
        _cow_closures,
    )

    part = lambda pk: "A" if pk % 2 == 0 else "B"  # noqa: E731
    wh = tempfile.mkdtemp(prefix="cowplaw_")
    t = Catalog(spark, wh).create_table(
        TableSpec(
            namespace="ns", name="plaw", key_columns=("pk",),
            partition_columns=("status",),
        )
    )
    t.bootstrap(
        spark.createDataFrame(
            [(k, part(k), float(k)) for k in range(8)],
            "pk long, status string, price double",
        )
    )
    t.apply_changes(
        spark.createDataFrame(
            [(op, pk, part(pk), p, 1, i) for i, (op, pk, p) in enumerate(wave)],
            "op string, pk long, status string, price double, ts long, seq long",
        )
    )
    ref = {
        (r.op, r.pk): (r.status, r.price)
        for r in t.read_changes(1, 2).collect()
    }
    _rows, _snap_rows, _coerce, _resolve, diff = _cow_closures()
    raw = _j.loads(open(f"{wh}/ns/plaw/manifest.json").read())
    changes, _cache = diff(
        raw, raw["snapshots"][1], ["pk"], ["pk", "status", "price"]
    )
    got = {}
    for op, r in changes:
        got[({"INSERT": "INSERT", "UPSERT": "MODIFY", "DELETE": "REMOVE"}[op],
             r["pk"])] = (r.get("status"), r.get("price"))
    assert {k for k in ref} == {k for k in got}, (ref, got)
    for k, v in ref.items():
        if k[0] != "REMOVE":
            assert got[k] == v, (k, got[k], v)
        else:
            assert got[k] == (None, None)


@settings(
    max_examples=6, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(wave=_pwave_st)
def test_partitioned_diff_across_rename_matches_read_changes(spark, wave):
    """r9 partitioned DDL: the reader-side diff must restate
    read_changes for EVERY version of a bootstrap -> pruned merge ->
    RENAME -> pruned merge history. The post-rename merge produces the
    mixed layout the per-entry mapping exists for (touched partitions
    rewritten under the new name, untouched entries carried with
    their old-name files + mapping), and the rename version itself
    must emit the O(table) UPSERT wave, not be skipped as carried."""
    import json as _j
    import tempfile

    from dynamodb_zero_etl_s3tables_spark.streaming.table_source import (
        _cow_closures,
    )

    part = lambda pk: "A" if pk % 2 == 0 else "B"  # noqa: E731
    wh = tempfile.mkdtemp(prefix="cowrlaw_")
    t = Catalog(spark, wh).create_table(
        TableSpec(
            namespace="ns", name="rlaw", key_columns=("pk",),
            partition_columns=("status",),
        )
    )
    t.bootstrap(
        spark.createDataFrame(
            [(k, part(k), float(k)) for k in range(8)],
            "pk long, status string, price double",
        )
    )
    t.apply_changes(  # v2: pruned merge under the OLD name
        spark.createDataFrame(
            [(op, pk, part(pk), p, 1, i) for i, (op, pk, p) in enumerate(wave)],
            "op string, pk long, status string, price double, ts long, seq long",
        )
    )
    t.rename_column("price", "amount")  # v3: metadata-only
    t.apply_changes(  # v4: pruned merge under the NEW name (mixed layout)
        spark.createDataFrame(
            [
                (op, pk, part(pk), p + 100.0, 2, i)
                for i, (op, pk, p) in enumerate(wave)
            ],
            "op string, pk long, status string, amount double, ts long, seq long",
        )
    )
    _rows, _snap_rows, _coerce, _resolve, diff = _cow_closures()
    raw = _j.loads(open(f"{wh}/ns/rlaw/manifest.json").read())
    by_v = {s["version"]: s for s in raw["snapshots"]}
    oprename = {"INSERT": "INSERT", "UPSERT": "MODIFY", "DELETE": "REMOVE"}

    def reader_diff(version, val_col, cache):
        changes, cache = diff(
            raw, by_v[version], ["pk"], ["pk", "status", val_col], cache=cache
        )
        return {
            (oprename[op], r["pk"]): (r.get("status"), r.get(val_col))
            for op, r in changes
        }, cache

    cache = None
    for v, val_col in ((2, "price"), (3, "amount"), (4, "amount")):
        ref = {
            (r.op, r.pk): (r.status, r[val_col])
            for r in t.read_changes(v - 1, v).collect()
        }
        got, cache = reader_diff(v, val_col, cache)
        assert set(ref) == set(got), (v, ref, got)
        for k, img in ref.items():
            if k[0] != "REMOVE":
                assert got[k] == img, (v, k, got[k], img)
            else:
                assert got[k] == (None, None), (v, k, got[k])
