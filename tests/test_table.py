"""Table-layer golden tests (SURVEY.md §5.2(5)): CDC merge semantics,
idempotent re-apply (A10), commit conflict (A8), time travel (B10),
vacuum (B11), schema evolution (B4)."""

import time

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from dynamodb_zero_etl_s3tables_spark.spec import TableSpec
from dynamodb_zero_etl_s3tables_spark.table.catalog import Catalog
from dynamodb_zero_etl_s3tables_spark.table.manifest import (
    CommitConflictError,
    ManagedTable,
    SchemaEvolutionError,
)

SPEC = TableSpec(namespace="ns", name="items", key_columns=("pk",), order_columns=("seq",))


def base_df(spark):
    return spark.createDataFrame(
        [Row(pk=i, status="old", price=float(i * 10)) for i in range(1, 6)]
    )


def changelog_df(spark):
    rows = [
        # update pk=1 twice in one batch: seq 2 must win (B6)
        Row(op="MODIFY", seq=1, pk=1, status="v1", price=11.0),
        Row(op="MODIFY", seq=2, pk=1, status="v2", price=12.0),
        # plain update
        Row(op="MODIFY", seq=1, pk=2, status="upd", price=22.0),
        # delete (B7)
        Row(op="REMOVE", seq=1, pk=3, status="x", price=0.0),
        # insert new key (B5)
        Row(op="INSERT", seq=1, pk=9, status="new", price=99.0),
    ]
    return spark.createDataFrame(rows)


def test_bootstrap_and_read(spark, warehouse):
    t = ManagedTable(spark, warehouse, SPEC)
    assert not t.exists()
    t.bootstrap(base_df(spark))
    assert t.exists() and t.version == 1
    assert t.read().count() == 5


def test_merge_golden(spark, warehouse):
    t = ManagedTable(spark, warehouse, SPEC)
    t.bootstrap(base_df(spark))
    t.apply_changes(changelog_df(spark))
    state = {r.pk: (r.status, r.price) for r in t.read().collect()}
    assert state == {
        1: ("v2", 12.0),   # last in-batch change wins
        2: ("upd", 22.0),
        4: ("old", 40.0),  # untouched
        5: ("old", 50.0),
        9: ("new", 99.0),  # inserted
    }  # pk=3 removed


def test_merge_idempotent(spark, warehouse):
    # A10: re-applying the same batch converges to the same state
    t = ManagedTable(spark, warehouse, SPEC)
    t.bootstrap(base_df(spark))
    t.apply_changes(changelog_df(spark))
    first = sorted(map(tuple, t.read().collect()))
    t.apply_changes(changelog_df(spark))
    second = sorted(map(tuple, t.read().collect()))
    assert first == second


def test_commit_conflict(spark, warehouse):
    # A8: optimistic concurrency — stale expected_version aborts
    t = ManagedTable(spark, warehouse, SPEC)
    t.bootstrap(base_df(spark))
    m = t._read_manifest()
    t.apply_changes(changelog_df(spark))  # moves version to 2
    with pytest.raises(CommitConflictError, match="concurrent commit"):
        t._write_manifest(m, expected_version=1)


def test_concurrent_writers_race(spark, warehouse):
    """A8 end-to-end: two engine instances race apply_changes on ONE
    table (reference lambda/catalog-policy-handler.js:60,68 — the
    optimistic-concurrency contract). Writer A computes its merge
    against version V; writer B lands V+1 first; A's commit MUST fail
    with CommitConflictError (a silent win would drop B's batch), and
    A's retry — recomputed against V+1 — must land both batches."""
    a = ManagedTable(spark, warehouse, SPEC)
    a.bootstrap(base_df(spark))
    b = ManagedTable(spark, warehouse, SPEC)  # second engine instance

    batch_a = spark.createDataFrame(
        [Row(op="MODIFY", seq=1, pk=1, status="from_a", price=111.0)]
    )
    batch_b = spark.createDataFrame(
        [Row(op="MODIFY", seq=1, pk=2, status="from_b", price=222.0)]
    )

    # Interleave at the decision point: A has read the manifest at V=1
    # and computed its snapshot; B commits V=2 just before A's pointer
    # swap. (Monkeypatched interleave — same window a multi-process
    # race hits, made deterministic.)
    real_write = ManagedTable._write_manifest
    raced = {"done": False}

    def write_with_race(self, m, expected_version):
        if not raced["done"]:
            raced["done"] = True
            b.apply_changes(batch_b)  # B wins the race
        return real_write(self, m, expected_version)

    a._write_manifest = write_with_race.__get__(a)
    with pytest.raises(CommitConflictError, match="concurrent commit"):
        a.apply_changes(batch_a)
    a._write_manifest = real_write.__get__(a)

    # loser retries: recomputes against B's committed state, converges
    a.apply_changes(batch_a)
    state = {r.pk: (r.status, r.price) for r in a.read().collect()}
    assert state[1] == ("from_a", 111.0)
    assert state[2] == ("from_b", 222.0)  # B's batch survived the race
    assert a.version == 3
    audit = a.verify_integrity()
    assert audit["ok"], audit


def test_time_travel(spark, warehouse):
    # B10: snapshot read of a prior version
    t = ManagedTable(spark, warehouse, SPEC)
    t.bootstrap(base_df(spark))
    t.apply_changes(changelog_df(spark))
    assert t.read(version=1).count() == 5
    assert t.read(version=2).count() == 5  # 5 -1 removed +1 inserted
    assert {r.pk for r in t.read(version=1).collect()} == {1, 2, 3, 4, 5}
    with pytest.raises(ValueError, match="not in retained history"):
        t.read(version=99)


def test_vacuum_retention(spark, warehouse):
    # B11: unreferencedFileRemoval semantics (reference README.md:129-137)
    t = ManagedTable(spark, warehouse, SPEC)
    t.bootstrap(base_df(spark))
    t.apply_changes(changelog_df(spark))
    # pretend 40 days pass: v1 becomes noncurrent beyond the 30-day knob
    res = t.vacuum(unreferenced_days=10, noncurrent_days=30, now=time.time() + 40 * 86400)
    assert res["snapshots_dropped"] == 1
    assert res["dirs_deleted"] == 1
    assert [s.version for s in t.history()] == [2]
    assert t.read().count() == 5  # current snapshot untouched
    with pytest.raises(ValueError, match="not in retained history"):
        t.read(version=1)


def test_schema_evolution_additive(spark, warehouse):
    # B4: new column appears -> appended; old rows read as null
    t = ManagedTable(spark, warehouse, SPEC)
    t.bootstrap(base_df(spark))
    evolved = changelog_df(spark).withColumn("region", F.lit("emea"))
    t.apply_changes(evolved)
    out = t.read()
    assert "region" in out.columns
    vals = {r.pk: r.region for r in out.collect()}
    assert vals[9] == "emea" and vals[4] is None


def test_schema_evolution_type_conflict(spark, warehouse):
    t = ManagedTable(spark, warehouse, SPEC)
    t.bootstrap(base_df(spark))
    bad = changelog_df(spark).withColumn("price", F.col("price").cast("string"))
    with pytest.raises(SchemaEvolutionError, match="type conflict for column 'price'"):
        t.apply_changes(bad)


def test_schema_evolution_drop_rejected(spark, warehouse):
    t = ManagedTable(spark, warehouse, SPEC)
    t.bootstrap(base_df(spark))
    with pytest.raises(SchemaEvolutionError, match="not additive"):
        t.overwrite(base_df(spark).drop("status"))


def test_catalog_registration_and_sql(spark, warehouse):
    # C1/C2: catalog -> view -> spark.sql
    cat = Catalog(spark, warehouse)
    t = cat.create_table(SPEC)
    t.bootstrap(base_df(spark))
    view = cat.refresh_view("ns.items")
    assert view == "ns_items"
    out = cat.sql(f"SELECT COUNT(*) AS n FROM {view} WHERE price > 20").collect()
    assert out[0].n == 3
    assert cat.list_tables("ns") == ["items"]
    with pytest.raises(KeyError):
        cat.table("ns.nope")


def test_extension_points(spark, warehouse):
    # mirror of reference extension-point tests (test.ts:202-285):
    # engine exposes spark session, table root, manifest history
    t = ManagedTable(spark, warehouse, SPEC)
    t.bootstrap(base_df(spark))
    assert t.spark is spark
    assert t.root.exists()
    assert t.history()[0].operation == "bootstrap"
    assert t.spec.unreferenced_days == 10 and t.spec.noncurrent_days == 30


# -- compaction + manifest-pruned scan (Iceberg maintenance/skipping) --------


def _range_df(spark, n=20000):
    return spark.range(0, n).select(
        F.col("id").alias("pk"),
        (F.col("id") % 7).alias("g"),
        (F.col("id") * 2).cast("double").alias("x"),
    )


def test_compact_unpartitioned_preserves_rows(spark, warehouse):
    t = ManagedTable(spark, warehouse, SPEC)
    t.bootstrap(_range_df(spark).repartition(16))
    before = sorted(map(tuple, t.read().select("pk", "g", "x").collect()))
    r = t.compact(target_file_bytes=1 << 30)
    assert r["files_before"] == 16 and r["files_after"] == 1
    assert t.history()[-1].operation == "compact"
    after = sorted(map(tuple, t.read().select("pk", "g", "x").collect()))
    assert before == after
    # time travel still reaches the pre-compaction snapshot
    assert t.read(version=1).count() == 20000


def test_compact_partitioned_packs_per_partition(spark, warehouse):
    spec = TableSpec(
        namespace="ns", name="part", key_columns=("pk",), partition_columns=("g",)
    )
    t = ManagedTable(spark, warehouse, spec)
    t.bootstrap(_range_df(spark).repartition(16))  # 16 files x 7 partitions
    r = t.compact()
    assert r["files_after"] == 7  # one packed file per partition value
    assert t.read().count() == 20000


def test_scan_file_skipping_with_sort_order(spark, warehouse):
    spec = TableSpec(
        namespace="ns", name="sorted", key_columns=("pk",), sort_columns=("pk",),
        properties={"write.sorted-file-count": 8},
    )
    t = ManagedTable(spark, warehouse, spec)
    t.bootstrap(_range_df(spark))
    out = t.scan([("pk", ">=", 19500)])
    assert out.count() == 500
    m = t.last_scan_metrics
    assert m["files_read"] < m["files_total"], m
    # exactness: residual filter applies even where stats can't prune
    assert t.scan([("g", "=", 3)]).count() == 20000 // 7 + (1 if 20000 % 7 > 3 else 0)


def test_scan_partition_pruning(spark, warehouse):
    spec = TableSpec(
        namespace="ns", name="pscan", key_columns=("pk",), partition_columns=("g",)
    )
    t = ManagedTable(spark, warehouse, spec)
    t.bootstrap(_range_df(spark))
    out = t.scan([("g", "=", 2), ("pk", "<", 100)])
    assert t.last_scan_metrics["partitions_read"] == 1
    assert out.count() == len([i for i in range(100) if i % 7 == 2])


def test_scan_rejects_unknown_op(spark, warehouse):
    t = ManagedTable(spark, warehouse, SPEC)
    t.bootstrap(base_df(spark))
    with pytest.raises(ValueError, match="unsupported scan op"):
        t.scan([("pk", "!=", 1)])


def test_read_changes_diff_and_roundtrip(spark, warehouse):
    # incremental read: diff(v1, v2) in change-log shape; applying the
    # diff back onto v1 must reproduce v2 exactly
    t = ManagedTable(spark, warehouse, SPEC)
    t.bootstrap(base_df(spark))
    t.apply_changes(changelog_df(spark))
    diff = t.read_changes(1, 2)
    got = {(r.op, r.pk): (r.status, r.price) for r in diff.collect()}
    assert got == {
        ("MODIFY", 1): ("v2", 12.0),
        ("MODIFY", 2): ("upd", 22.0),
        ("REMOVE", 3): ("old", 30.0),  # old image on delete
        ("INSERT", 9): ("new", 99.0),
    }
    t2 = ManagedTable(
        spark, warehouse, TableSpec(namespace="ns", name="replica", key_columns=("pk",), order_columns=("seq",))
    )
    t2.bootstrap(t.read(version=1))
    t2.apply_changes(diff.withColumn("seq", F.lit(1)), order_cols=("seq",))
    assert sorted(map(tuple, t2.read().collect())) == sorted(
        map(tuple, t.read(version=2).collect())
    )


def test_read_changes_unchanged_rows_dropped(spark, warehouse):
    t = ManagedTable(spark, warehouse, SPEC)
    t.bootstrap(base_df(spark))
    t.overwrite(base_df(spark))  # identical state
    assert t.read_changes(1, 2).count() == 0


# -- merge-on-read ------------------------------------------------------------


def test_mor_equals_cow(spark, warehouse):
    # same golden changelog through both strategies -> identical state
    cow = ManagedTable(spark, warehouse, SPEC)
    cow.bootstrap(base_df(spark))
    cow.apply_changes(changelog_df(spark))
    mor = ManagedTable(
        spark, warehouse,
        TableSpec(namespace="ns", name="mor", key_columns=("pk",), order_columns=("seq",)),
    )
    mor.bootstrap(base_df(spark))
    mor.apply_changes(changelog_df(spark), strategy="merge-on-read")
    assert mor.history()[-1].operation == "merge-mor"
    assert sorted(map(tuple, mor.read().collect())) == sorted(
        map(tuple, cow.read().collect())
    )


def test_mor_stacked_layers_and_compact(spark, warehouse):
    t = ManagedTable(spark, warehouse, SPEC)
    t.bootstrap(base_df(spark))
    t.apply_changes(changelog_df(spark), strategy="merge-on-read")
    batch2 = spark.createDataFrame(
        [
            Row(op="MODIFY", seq=1, pk=9, status="again", price=100.0),
            Row(op="REMOVE", seq=1, pk=4, status="x", price=0.0),
        ]
    )
    t.apply_changes(batch2, strategy="merge-on-read")
    state = {r.pk: (r.status, r.price) for r in t.read().collect()}
    assert state == {
        1: ("v2", 12.0), 2: ("upd", 22.0), 5: ("old", 50.0), 9: ("again", 100.0),
    }
    # compaction materializes the chain into a flat snapshot
    r = t.compact(target_file_bytes=1 << 30)
    assert t.history()[-1].operation == "compact"
    assert t.history()[-1].delta is None
    after = {r2.pk: (r2.status, r2.price) for r2 in t.read().collect()}
    assert after == state
    assert r["files_after"] <= r["files_before"]


def test_mor_vacuum_pins_base_chain(spark, warehouse):
    t = ManagedTable(spark, warehouse, SPEC)
    t.bootstrap(base_df(spark))
    t.apply_changes(changelog_df(spark), strategy="merge-on-read")
    # v1 is old enough to drop by age, but v2 (current, MoR) needs it
    res = t.vacuum(unreferenced_days=1, noncurrent_days=1, now=time.time() + 10 * 86400)
    assert res["snapshots_dropped"] == 0  # ancestor closure pinned v1
    assert t.read().count() == 5
    # after compaction the chain is cut and v1+v2 can go
    t.compact(target_file_bytes=1 << 30)
    res2 = t.vacuum(unreferenced_days=1, noncurrent_days=1, now=time.time() + 10 * 86400)
    assert res2["snapshots_dropped"] == 2
    assert t.read().count() == 5


def test_mor_requires_bootstrap(spark, warehouse):
    t = ManagedTable(spark, warehouse, SPEC)
    with pytest.raises(FileNotFoundError, match="merge-on-read needs a bootstrapped"):
        t.apply_changes(changelog_df(spark), strategy="merge-on-read")


def test_unknown_strategy_rejected(spark, warehouse):
    t = ManagedTable(spark, warehouse, SPEC)
    t.bootstrap(base_df(spark))
    with pytest.raises(ValueError, match="unknown merge strategy"):
        t.apply_changes(changelog_df(spark), strategy="sideways")


def test_maybe_compact_policy(spark, warehouse):
    t = ManagedTable(spark, warehouse, SPEC)
    t.bootstrap(base_df(spark))
    # below both thresholds: no-op
    assert t.maybe_compact(max_delta_layers=3, max_files=64) is None
    # stack three MoR layers -> chain trigger fires
    for i in range(3):
        t.apply_changes(
            spark.createDataFrame(
                [Row(op="MODIFY", seq=i, pk=1, status=f"v{i}", price=float(i))]
            ),
            strategy="merge-on-read",
        )
    res = t.maybe_compact(max_delta_layers=3, max_files=64)
    assert res is not None and t.history()[-1].operation == "compact"
    # file-count trigger on a fragmented flat table
    t2 = ManagedTable(
        spark, warehouse,
        TableSpec(namespace="ns", name="frag", key_columns=("pk",), order_columns=("seq",)),
    )
    t2.bootstrap(_range_df(spark).repartition(16))
    assert t2.maybe_compact(max_files=8) is not None
    assert t2.maybe_compact(max_files=8) is None  # now compact


def test_scan_file_skipping_inside_partitions(spark, warehouse):
    # two-stage pruning: partition dirs by value, then min/max file
    # skipping within the surviving partition
    spec = TableSpec(
        namespace="ns", name="pskip", key_columns=("pk",), partition_columns=("g",)
    )
    t = ManagedTable(spark, warehouse, spec)
    # range-cluster on pk BEFORE the partitionBy write: each task holds
    # a contiguous pk slice, so every partition dir gets multiple files
    # with tight pk ranges
    t.bootstrap(_range_df(spark).repartitionByRange(8, "pk"))
    out = t.scan([("g", "=", 3), ("pk", ">=", 19000)])
    m = t.last_scan_metrics
    assert m["partitions_read"] == 1
    assert m["files_read"] < m["files_total"], m
    assert out.count() == len([i for i in range(19000, 20000) if i % 7 == 3])
    # carried entries keep their stats through a pruned merge
    ch = spark.createDataFrame(
        [Row(op="MODIFY", seq=1, pk=0, g=0, x=0.0)]
    )
    t.apply_changes(ch, order_cols=("seq",))
    out2 = t.scan([("g", "=", 3), ("pk", ">=", 19000)])
    assert t.last_scan_metrics["files_read"] < t.last_scan_metrics["files_total"]
    assert out2.count() == out.count()


def test_reopen_table_from_manifest(spark, warehouse):
    # durable catalog: a FRESH Catalog (new session analog) reopens a
    # table from its persisted spec and can keep merging into it
    spec = TableSpec(
        namespace="ns", name="durable", key_columns=("pk",),
        order_columns=("seq",), sort_columns=("pk",),
        properties={"write.sorted-file-count": 4},
    )
    t = ManagedTable(spark, warehouse, spec)
    t.bootstrap(base_df(spark))

    t2 = ManagedTable.open(spark, warehouse, "ns.durable")
    assert t2.spec == spec  # full spec round-trips, knobs included
    t2.apply_changes(changelog_df(spark))
    assert t2.read().count() == 5

    cat = Catalog(spark, warehouse)  # fresh catalog, nothing registered
    assert cat.table("ns.durable").version == 2
    with pytest.raises(KeyError, match="unknown table"):
        cat.table("ns.nope")


def test_rollback_and_integrity(spark, warehouse):
    t = ManagedTable(spark, warehouse, SPEC)
    t.bootstrap(base_df(spark))
    t.apply_changes(changelog_df(spark))
    assert t.read().count() == 5 and 9 in {r.pk for r in t.read().collect()}
    t.rollback_to(1)  # undo the merge, as a new commit
    assert t.version == 3
    assert t.history()[-1].operation == "rollback"
    assert {r.pk for r in t.read().collect()} == {1, 2, 3, 4, 5}
    # the rolled-back-over snapshot is still inspectable
    assert 9 in {r.pk for r in t.read(version=2).collect()}
    assert t.verify_integrity()["ok"]
    with pytest.raises(ValueError, match="not in retained history"):
        t.rollback_to(99)
    # integrity flags a manually broken data path
    import shutil
    shutil.rmtree(t.history()[1].data_dir)
    rep = t.verify_integrity()
    assert not rep["ok"] and len(rep["missing_paths"]) == 1


# -- property-based merge semantics (hypothesis) ------------------------------
# The CDC merge law, for ARBITRARY changelogs: merging equals replaying
# the log into a dict ordered by (ts, seq), REMOVE deleting the key.

from hypothesis import given, settings, strategies as st  # noqa: E402

from dynamodb_zero_etl_s3tables_spark.table.merge import merge_changes  # noqa: E402

_change = st.fixed_dictionaries(
    {
        "op": st.sampled_from(["INSERT", "MODIFY", "REMOVE"]),
        "ts": st.integers(min_value=0, max_value=5),
        "seq": st.integers(min_value=0, max_value=5),
        "pk": st.integers(min_value=1, max_value=8),
        "status": st.sampled_from(["a", "b", "c"]),
        "price": st.integers(min_value=0, max_value=99).map(float),
    }
)


@settings(max_examples=15, deadline=None)
@given(changes=st.lists(_change, min_size=1, max_size=12))
def test_merge_matches_bruteforce_replay(spark, changes):
    # de-dup exact (pk, ts, seq) collisions: LWW needs a total order
    # per key, which real changelogs guarantee via a unique seq
    seen, log = set(), []
    for c in changes:
        k = (c["pk"], c["ts"], c["seq"])
        if k not in seen:
            seen.add(k)
            log.append(c)

    base_rows = [Row(pk=i, status="base", price=float(i)) for i in range(1, 5)]
    expected = {r.pk: (r.status, r.price) for r in base_rows}
    for c in sorted(log, key=lambda c: (c["ts"], c["seq"])):
        if c["op"] == "REMOVE":
            expected.pop(c["pk"], None)
        else:
            expected[c["pk"]] = (c["status"], c["price"])

    base = spark.createDataFrame(base_rows)
    log_df = spark.createDataFrame(
        [Row(op=c["op"], ts=c["ts"], seq=c["seq"], pk=c["pk"],
             status=c["status"], price=c["price"]) for c in log]
    )
    merged = merge_changes(base, log_df, keys=["pk"], order_cols=["ts", "seq"])
    got = {r.pk: (r.status, r.price) for r in merged.collect()}
    assert got == expected


# -- round-2 hardening regressions -------------------------------------------


def test_partitioned_merge_boolean_partition_column(spark, warehouse):
    # Pruned-merge partition matching must canonicalize values through
    # ONE encoder: Python str(True) is 'True' but Spark's hive dir is
    # 'flag=true'; a mismatch carries the stale entry forward AND
    # writes a fresh dir, duplicating rows on read.
    spec = TableSpec(
        namespace="ns", name="boolpart", key_columns=("pk",),
        partition_columns=("flag",), order_columns=("seq",),
    )
    t = ManagedTable(spark, warehouse, spec)
    t.bootstrap(spark.createDataFrame(
        [Row(pk=i, flag=(i % 2 == 0), v="old") for i in range(1, 7)]
    ))
    t.apply_changes(spark.createDataFrame(
        [Row(op="MODIFY", seq=1, pk=2, flag=True, v="new")]
    ))
    rows = t.read().collect()
    assert len(rows) == 6  # no duplicated partition
    state = {r.pk: r.v for r in rows}
    assert state[2] == "new" and state[4] == "old" and state[1] == "old"
    # exactly one manifest entry per live partition value
    ents = t._read_manifest().current.partitions
    vals = [e["values"]["flag"] for e in ents]
    assert sorted(vals) == ["false", "true"]


def test_vacuum_tolerates_broken_base_chain(spark, warehouse):
    # vacuum must degrade gracefully (like verify_integrity) when a
    # merge-on-read base chain is already broken, not KeyError
    t = ManagedTable(spark, warehouse, SPEC)
    t.bootstrap(base_df(spark))
    t.apply_changes(changelog_df(spark), strategy="merge-on-read")
    m = t._read_manifest()
    m.snapshots = [s for s in m.snapshots if s.version != 1]  # break the chain
    t._write_manifest(m, expected_version=m.version)
    assert not t.verify_integrity()["ok"]
    res = t.vacuum(now=time.time() + 365 * 86400)  # must not raise
    assert isinstance(res["snapshots_dropped"], int)


def test_legacy_reopen_refuses_default_order_merge(spark, warehouse):
    # A manifest written before specs were persisted never recorded
    # order_columns; merging with the guessed default could resurrect
    # stale rows. Reads stay available; merges must state their order.
    import json as _json

    spec = TableSpec(namespace="ns", name="legacy", key_columns=("pk",),
                     order_columns=("seq",))
    t = ManagedTable(spark, warehouse, spec)
    t.bootstrap(base_df(spark))
    mp = t.manifest_path
    raw = _json.loads(mp.read_text())
    raw.pop("spec", None)  # simulate a pre-spec manifest
    mp.write_text(_json.dumps(raw))

    t2 = ManagedTable.open(spark, warehouse, "ns.legacy")
    assert t2.read().count() == 5  # read-only access fine
    with pytest.raises(ValueError, match="order_columns"):
        t2.apply_changes(changelog_df(spark))
    t2.apply_changes(changelog_df(spark), order_cols=("seq",))  # explicit OK
    assert t2.read().count() == 5


def test_snapshots_df_metadata(spark, warehouse):
    # C7: queryable snapshot metadata — versions, operations, row
    # accounting, and the MoR delta flag (not exercised by the c07
    # oracle journey, which is all copy-on-write)
    t = ManagedTable(spark, warehouse, SPEC)
    t.bootstrap(base_df(spark))
    t.apply_changes(changelog_df(spark), strategy="merge-on-read")
    meta = {r.version: r for r in t.snapshots_df().collect()}
    assert meta[1].operation == "bootstrap" and not meta[1].is_delta
    assert meta[2].operation == "merge-mor" and meta[2].is_delta
    assert meta[1].row_count == 5


def test_expire_snapshots_retain_last(spark, tmp_path):
    # B11 companion: count-based retention — keep the newest N
    # snapshots, pin MoR base chains, immediately GC unreferenced dirs
    from pyspark.sql import functions as F

    from dynamodb_zero_etl_s3tables_spark.spec import TableSpec
    from dynamodb_zero_etl_s3tables_spark.table.catalog import Catalog

    cat = Catalog(spark, str(tmp_path / "wh"))
    t = cat.create_table(
        TableSpec(namespace="ns", name="exp", key_columns=("pk",), order_columns=("seq",))
    )
    base = spark.range(10).select(
        F.col("id").alias("pk"), F.lit(0).cast("long").alias("seq"),
        F.lit("a").alias("val"),
    )
    t.bootstrap(base)
    for i in range(1, 5):  # versions 2..5
        chg = spark.range(i, i + 2).select(
            F.lit("MODIFY").alias("op"), F.lit(i).cast("long").alias("seq"),
            F.col("id").alias("pk"), F.lit(f"v{i}").alias("val"),
        )
        t.apply_changes(chg)
    assert len(t.history()) == 5
    before = t.read().collect()

    res = t.expire_snapshots(retain_last=2)
    assert res["snapshots_dropped"] == 3
    assert res["dirs_deleted"] >= 1  # old snapshot dirs gone immediately
    hist = t.history()
    assert [s.version for s in hist] == [4, 5]
    # current snapshot unchanged and still readable
    assert sorted(map(tuple, t.read().collect())) == sorted(map(tuple, before))
    # time travel to an expired version now fails loudly
    import pytest as _pytest

    with _pytest.raises(ValueError, match="not in retained history"):
        t.read(version=1)
    # invariants hold after expiry
    audit = t.verify_integrity()
    assert not audit.get("broken_chains")
    # retain_last must be positive
    with _pytest.raises(ValueError, match="retain_last"):
        t.expire_snapshots(retain_last=0)


def test_expire_snapshots_pins_mor_base_chain(spark, tmp_path):
    # a retained merge-on-read delta must keep its base snapshot
    # readable even when count-based retention would drop the base
    from pyspark.sql import functions as F

    from dynamodb_zero_etl_s3tables_spark.spec import TableSpec
    from dynamodb_zero_etl_s3tables_spark.table.catalog import Catalog

    cat = Catalog(spark, str(tmp_path / "wh2"))
    t = cat.create_table(
        TableSpec(namespace="ns", name="mor", key_columns=("pk",), order_columns=("seq",))
    )
    base = spark.range(6).select(
        F.col("id").alias("pk"), F.lit(0).cast("long").alias("seq"),
        F.lit("x").alias("val"),
    )
    t.bootstrap(base)  # v1 (the MoR base)
    chg = spark.range(2).select(
        F.lit("MODIFY").alias("op"), F.lit(1).cast("long").alias("seq"),
        F.col("id").alias("pk"), F.lit("y").alias("val"),
    )
    t.apply_changes(chg, strategy="merge-on-read")  # v2 delta on v1
    before = sorted(map(tuple, t.read().collect()))

    res = t.expire_snapshots(retain_last=1)
    # v1 is pinned by v2's chain: nothing droppable
    assert res["snapshots_dropped"] == 0
    assert sorted(map(tuple, t.read().collect())) == before


# -- write-audit-publish (WAP) ---------------------------------------------


def test_wap_stage_is_invisible_then_publishes(spark, warehouse):
    """WAP: a staged merge is fully written and version-fenced but
    invisible to read(); the audit reads it by version; publish is a
    metadata flip that makes the audited files current atomically."""
    t = ManagedTable(spark, warehouse, SPEC)
    t.bootstrap(base_df(spark))
    staged_v = t.stage_changes(changelog_df(spark))
    assert staged_v == 2
    # readers still see the bootstrap state
    assert {r.pk for r in t.read().collect()} == {1, 2, 3, 4, 5}
    # the audit sees the staged result via time travel
    audited = {r.pk: r.status for r in t.read(version=staged_v).collect()}
    assert audited == {1: "v2", 2: "upd", 4: "old", 5: "old", 9: "new"}
    t.publish(staged_v)
    assert {r.pk: r.status for r in t.read().collect()} == audited
    assert t.history()[-1].operation == "wap-publish"
    assert not t.history()[-1].staged


def test_wap_abort_drops_staged(spark, warehouse):
    t = ManagedTable(spark, warehouse, SPEC)
    t.bootstrap(base_df(spark))
    staged_v = t.stage_changes(changelog_df(spark))
    t.abort_staged(staged_v)
    # table unchanged, history clean, and the next commit reuses v2
    assert {r.pk for r in t.read().collect()} == {1, 2, 3, 4, 5}
    assert [s.version for s in t.history()] == [1]
    t.apply_changes(changelog_df(spark))
    assert t.version == 2
    assert {r.pk for r in t.read().collect()} == {1, 2, 4, 5, 9}


def test_wap_fences_other_commits(spark, warehouse):
    """A pending staged snapshot must stay LAST: merges, rollbacks and
    a second stage all conflict until publish/abort."""
    t = ManagedTable(spark, warehouse, SPEC)
    t.bootstrap(base_df(spark))
    staged_v = t.stage_changes(changelog_df(spark))
    with pytest.raises(CommitConflictError, match="pending"):
        t.apply_changes(changelog_df(spark))
    with pytest.raises(CommitConflictError, match="pending"):
        t.rollback_to(1)
    with pytest.raises(CommitConflictError, match="pending"):
        t.stage_changes(changelog_df(spark))
    # publish resolves the fence
    t.publish(staged_v)
    t.apply_changes(changelog_df(spark))
    assert t.version == 3


def test_wap_publish_wrong_version_conflicts(spark, warehouse):
    t = ManagedTable(spark, warehouse, SPEC)
    t.bootstrap(base_df(spark))
    with pytest.raises(CommitConflictError, match="no staged"):
        t.publish(1)
    staged_v = t.stage_changes(changelog_df(spark))
    with pytest.raises(CommitConflictError, match="no staged"):
        t.publish(staged_v + 1)
    t.abort_staged(staged_v)


def test_wap_aborted_files_reclaimed_by_vacuum(spark, warehouse, tmp_path):
    t = ManagedTable(spark, warehouse, SPEC)
    t.bootstrap(base_df(spark))
    staged_v = t.stage_changes(changelog_df(spark))
    staged_dir = t.history()[-1].data_dir
    t.abort_staged(staged_v)
    import pathlib

    assert pathlib.Path(staged_dir).exists()
    stats = t.vacuum(unreferenced_days=0, noncurrent_days=0, now=time.time() + 1)
    assert not pathlib.Path(staged_dir).exists(), stats


# -- type widening (B4, Iceberg promotion rules) ---------------------------


def test_schema_widening_int_to_long(spark, warehouse):
    """An incoming LONG column widens a stored INT column; old rows
    read back under the widened schema losslessly."""
    from pyspark.sql import types as T

    spec = TableSpec(namespace="ns", name="widen", key_columns=("pk",), order_columns=("seq",))
    t = ManagedTable(spark, warehouse, spec)
    schema_narrow = T.StructType([
        T.StructField("pk", T.LongType()),
        T.StructField("qty", T.IntegerType()),
    ])
    t.bootstrap(spark.createDataFrame([(1, 10), (2, 20)], schema_narrow))
    schema_wide = T.StructType([
        T.StructField("op", T.StringType()),
        T.StructField("seq", T.LongType()),
        T.StructField("pk", T.LongType()),
        T.StructField("qty", T.LongType()),
    ])
    t.apply_changes(
        spark.createDataFrame([("INSERT", 1, 3, 2**40)], schema_wide)
    )
    got = t.read()
    assert dict(got.dtypes)["qty"] == "bigint"
    assert {r.pk: r.qty for r in got.collect()} == {1: 10, 2: 20, 3: 2**40}


def test_schema_widening_narrow_arrival_casts_up(spark, warehouse):
    """An incoming INT column against a stored LONG column is cast up;
    the table schema does not narrow."""
    from pyspark.sql import types as T

    spec = TableSpec(namespace="ns", name="widen2", key_columns=("pk",), order_columns=("seq",))
    t = ManagedTable(spark, warehouse, spec)
    schema_wide = T.StructType([
        T.StructField("pk", T.LongType()),
        T.StructField("qty", T.LongType()),
    ])
    t.bootstrap(spark.createDataFrame([(1, 2**40)], schema_wide))
    schema_narrow = T.StructType([
        T.StructField("op", T.StringType()),
        T.StructField("seq", T.LongType()),
        T.StructField("pk", T.LongType()),
        T.StructField("qty", T.IntegerType()),
    ])
    t.apply_changes(spark.createDataFrame([("INSERT", 1, 2, 7)], schema_narrow))
    got = t.read()
    assert dict(got.dtypes)["qty"] == "bigint"
    assert {r.pk: r.qty for r in got.collect()} == {1: 2**40, 2: 7}


def test_schema_widening_illegal_change_still_rejected(spark, warehouse):
    from pyspark.sql import types as T

    spec = TableSpec(namespace="ns", name="widen3", key_columns=("pk",), order_columns=("seq",))
    t = ManagedTable(spark, warehouse, spec)
    t.bootstrap(spark.createDataFrame([(1, 10)], "pk long, qty int"))
    bad = spark.createDataFrame(
        [("INSERT", 1, 2, "not-a-number")], "op string, seq long, pk long, qty string"
    )
    with pytest.raises(SchemaEvolutionError, match="type conflict"):
        t.apply_changes(bad)


def test_wap_stage_race_cannot_stack(spark, warehouse):
    """Two racing stage_changes() must not both land: the second
    writer passes its own (stale) precheck, but the commit-time
    re-read fence rejects a stage on top of a pending stage — else
    the first stage becomes unpublishable (publish/abort accept only
    the LAST snapshot)."""
    from dynamodb_zero_etl_s3tables_spark.table.merge import merge_changes

    t = ManagedTable(spark, warehouse, SPEC)
    t.bootstrap(base_df(spark))
    staged_v = t.stage_changes(changelog_df(spark))
    # simulate the racing writer PAST its precheck (it read the
    # manifest before the first stage landed) reaching the commit path
    merged = merge_changes(
        t.read(), changelog_df(spark), keys=("pk",), order_cols=("seq",)
    )
    with pytest.raises(CommitConflictError, match="pending"):
        t._write_snapshot(merged, operation="wap-stage", staged=True)
    # the first stage is intact and publishable
    t.publish(staged_v)
    assert {r.pk for r in t.read().collect()} == {1, 2, 4, 5, 9}


def test_retention_pins_pending_stage(spark, warehouse):
    """vacuum()/expire_snapshots() may never drop an in-flight staged
    snapshot — only an explicit abort_staged does. (Unpinned, a
    zero-window vacuum deleted the staged dir mid-audit and the
    subsequent publish failed with 'no staged snapshot'.)"""
    import pathlib

    t = ManagedTable(spark, warehouse, SPEC)
    t.bootstrap(base_df(spark))
    staged_v = t.stage_changes(changelog_df(spark))
    staged_dir = t.history()[-1].data_dir
    # age-based retention with a zero noncurrent window, clock ahead:
    # every snapshot is past the cutoff, only the pins keep them
    stats = t.vacuum(unreferenced_days=0, noncurrent_days=0, now=time.time() + 86400)
    assert stats["snapshots_dropped"] == 0
    # count-based retention: retain_last=1 would keep only the staged
    # newest; current and staged must BOTH survive regardless
    stats2 = t.expire_snapshots(retain_last=1)
    assert stats2["snapshots_dropped"] == 0
    assert pathlib.Path(staged_dir).exists()
    t.publish(staged_v)
    assert {r.pk for r in t.read().collect()} == {1, 2, 4, 5, 9}


def test_schema_widening_partitioned_carried_entries(spark, warehouse):
    """Widening through the pruned partition path: carried (untouched)
    partition entries still hold INT32 parquet files which must read
    back under the widened snapshot schema. Pins the PySpark-4
    parquet-reader type-promotion dependency (3.x threw
    SchemaColumnConvertNotSupportedException here)."""
    spec = TableSpec(
        namespace="ns", name="widenp", key_columns=("pk",),
        order_columns=("seq",), partition_columns=("part",),
    )
    t = ManagedTable(spark, warehouse, spec)
    t.bootstrap(
        spark.createDataFrame(
            [(1, "a", 10), (2, "b", 20)], "pk long, part string, qty int"
        )
    )
    # touch ONLY partition 'a' with a widened LONG qty; 'b' carries
    ch = spark.createDataFrame(
        [("INSERT", 1, 3, "a", 2**40)],
        "op string, seq long, pk long, part string, qty long",
    )
    t.apply_changes(ch)
    snap = t.history()[-1]
    carried = [e for e in snap.partitions if e["values"]["part"] == "b"]
    assert carried, "partition b should carry forward by reference"
    got = t.read()
    assert dict(got.dtypes)["qty"] == "bigint"
    # row from the carried INT32 file reads losslessly under bigint
    assert {r.pk: r.qty for r in got.collect()} == {1: 10, 2: 20, 3: 2**40}


def test_schema_widening_mor_chain(spark, warehouse):
    """Widening over a merge-on-read chain: the base snapshot keeps
    narrow INT32 files under a widened layer schema; the read-time
    anti-join must resolve both sides to the widened type."""
    spec = TableSpec(namespace="ns", name="widenm", key_columns=("pk",), order_columns=("seq",))
    t = ManagedTable(spark, warehouse, spec)
    t.bootstrap(spark.createDataFrame([(1, 10), (2, 20)], "pk long, qty int"))
    ch = spark.createDataFrame(
        [("INSERT", 1, 3, 2**40), ("MODIFY", 1, 2, 21)],
        "op string, seq long, pk long, qty long",
    )
    t.apply_changes(ch, strategy="merge-on-read")
    got = t.read()
    assert dict(got.dtypes)["qty"] == "bigint"
    assert {r.pk: r.qty for r in got.collect()} == {1: 10, 2: 21, 3: 2**40}
    # compaction materializes the widened schema into flat files
    t.compact(target_file_bytes=1 << 30)
    got2 = t.read()
    assert dict(got2.dtypes)["qty"] == "bigint"
    assert {r.pk: r.qty for r in got2.collect()} == {1: 10, 2: 21, 3: 2**40}


def test_merge_into_clauses_first_match_wins(spark, warehouse):
    """General MERGE INTO: ordered matched clauses, first-true wins;
    unmatched-by-any-clause rows carry; NOT MATCHED inserts."""
    from dynamodb_zero_etl_s3tables_spark.table.merge import merge_into as mi

    t = ManagedTable(spark, warehouse, SPEC)
    t.bootstrap(base_df(spark))  # pk 1..5, status old, price 10*pk
    src = spark.createDataFrame(
        [Row(pk=1, np=111.0), Row(pk=2, np=222.0), Row(pk=9, np=999.0)]
    )
    t.merge_into(
        src,
        on=[("pk", "pk")],
        matched=[
            # pk=1 (price 10) satisfies BOTH conditions: update is
            # first, so it must win over the delete
            ("update", F.col("t.price") < 15.0,
             {"status": F.lit("cheap"), "price": F.col("s.np")}),
            ("delete", F.col("t.price") < 25.0, None),
        ],
        insert_values={
            "pk": F.col("pk"), "status": F.lit("new"), "price": F.col("np"),
        },
    )
    got = {r.pk: (r.status, r.price) for r in t.read().collect()}
    assert got == {
        1: ("cheap", 111.0),          # first clause won
        3: ("old", 30.0), 4: ("old", 40.0), 5: ("old", 50.0),  # carried
        9: ("new", 999.0),            # inserted
    }  # pk=2 deleted by the second clause
    assert t.history()[-1].operation == "merge-into"
    # pure-function form: unconditional update only, no inserts
    out = mi(
        base_df(spark), src, [("pk", "pk")],
        matched=[("update", None, {"price": F.col("s.np")})],
    )
    got2 = {r.pk: r.price for r in out.collect()}
    assert got2 == {1: 111.0, 2: 222.0, 3: 30.0, 4: 40.0, 5: 50.0}


# -- partition-spec evolution (Iceberg spec-v2 analog) ---------------------


def _pe_base(spark):
    return spark.createDataFrame(
        [
            Row(pk=1, part="a", cat="x", qty=10),
            Row(pk=2, part="a", cat="y", qty=20),
            Row(pk=3, part="b", cat="x", qty=30),
            Row(pk=4, part="b", cat="y", qty=40),
        ]
    )


def test_partition_evolution_mixed_layout(spark, warehouse):
    """Evolving the partition spec is metadata-only: old entries keep
    their layout and stay readable/prunable; the next merge lazily
    migrates them to the new layout."""
    spec = TableSpec(
        namespace="ns", name="pevo", key_columns=("pk",),
        order_columns=("seq",), partition_columns=("part",),
    )
    t = ManagedTable(spark, warehouse, spec)
    t.bootstrap(_pe_base(spark))
    t.evolve_partitioning(("cat",))
    assert t.history()[-1].operation == "evolve-partitioning"
    assert t.spec.partition_columns == ("cat",)
    # metadata-only: same rows, old layout still attached per entry
    assert {r.pk: (r.part, r.cat, r.qty) for r in t.read().collect()} == {
        1: ("a", "x", 10), 2: ("a", "y", 20),
        3: ("b", "x", 30), 4: ("b", "y", 40),
    }
    # old-layout entries still prune on their OWN key...
    got = t.scan(filters=[("part", "=", "a")])
    assert {r.pk for r in got.collect()} == {1, 2}
    assert t.last_scan_metrics["partitions_read"] == 1
    # ...and a new-key filter is exact (residual filter; no pruning)
    assert {r.pk for r in t.scan(filters=[("cat", "=", "x")]).collect()} == {1, 3}
    # merge under the NEW spec: old-layout entries are rewritten
    ch = spark.createDataFrame(
        [Row(op="INSERT", seq=1, pk=5, part="c", cat="x", qty=50)]
    )
    t.apply_changes(ch)
    snap = t.history()[-1]
    assert all(set(e["values"].keys()) == {"cat"} for e in snap.partitions)
    assert {r.pk for r in t.read().collect()} == {1, 2, 3, 4, 5}
    # after migration the new key prunes
    t.scan(filters=[("cat", "=", "x")])
    assert t.last_scan_metrics["partitions_read"] == 1


def test_partition_evolution_unpartitioned_to_partitioned(spark, warehouse):
    spec = TableSpec(
        namespace="ns", name="pevo2", key_columns=("pk",), order_columns=("seq",),
    )
    t = ManagedTable(spark, warehouse, spec)
    t.bootstrap(_pe_base(spark))
    t.evolve_partitioning(("part",))
    # old snapshot reads fine; the next merge rewrites partitioned
    ch = spark.createDataFrame(
        [Row(op="MODIFY", seq=1, pk=1, part="a", cat="x", qty=11)]
    )
    t.apply_changes(ch)
    snap = t.history()[-1]
    assert snap.partitions is not None
    assert {e["values"]["part"] for e in snap.partitions} == {"a", "b"}
    assert {r.pk: r.qty for r in t.read().collect()} == {1: 11, 2: 20, 3: 30, 4: 40}
    # reopen from manifest picks up the evolved spec
    t2 = ManagedTable.open(spark, warehouse, "ns.pevo2")
    assert t2.spec.partition_columns == ("part",)


def test_partition_evolution_compact_migrates_all(spark, warehouse):
    spec = TableSpec(
        namespace="ns", name="pevo3", key_columns=("pk",),
        order_columns=("seq",), partition_columns=("part",),
    )
    t = ManagedTable(spark, warehouse, spec)
    t.bootstrap(_pe_base(spark))
    t.evolve_partitioning(("cat",))
    t.compact(target_file_bytes=1 << 30)
    snap = t.history()[-1]
    assert all(set(e["values"].keys()) == {"cat"} for e in snap.partitions)
    assert {r.pk for r in t.read().collect()} == {1, 2, 3, 4}


def test_partition_evolution_rejects_unknown_column(spark, warehouse):
    spec = TableSpec(
        namespace="ns", name="pevo4", key_columns=("pk",), order_columns=("seq",),
    )
    t = ManagedTable(spark, warehouse, spec)
    t.bootstrap(_pe_base(spark))
    with pytest.raises(SchemaEvolutionError, match="not in table schema"):
        t.evolve_partitioning(("nope",))
    # and a pending stage fences the evolution like any other commit
    t.stage_changes(
        spark.createDataFrame([Row(op="INSERT", seq=1, pk=9, part="c", cat="z", qty=90)])
    )
    with pytest.raises(CommitConflictError, match="pending"):
        t.evolve_partitioning(("part",))


# -- snapshot tags (Iceberg refs) -------------------------------------------


def test_tags_pin_and_time_travel(spark, warehouse):
    t = ManagedTable(spark, warehouse, SPEC)
    t.bootstrap(base_df(spark))
    t.create_tag("baseline")
    t.apply_changes(changelog_df(spark))
    assert t.list_tags() == {"baseline": 1}
    # tag-addressed read = the pinned version, not current
    assert {r.pk for r in t.read(tag="baseline").collect()} == {1, 2, 3, 4, 5}
    assert {r.pk for r in t.read().collect()} == {1, 2, 4, 5, 9}
    # retention: a zero-window vacuum may not drop the tagged snapshot
    res = t.vacuum(unreferenced_days=0, noncurrent_days=0, now=time.time() + 86400)
    assert res["snapshots_dropped"] == 0
    res2 = t.expire_snapshots(retain_last=1)
    assert res2["snapshots_dropped"] == 0
    assert t.read(tag="baseline").count() == 5
    # deleting the tag releases the pin
    t.delete_tag("baseline")
    res3 = t.vacuum(unreferenced_days=0, noncurrent_days=0, now=time.time() + 86400)
    assert res3["snapshots_dropped"] == 1
    with pytest.raises(ValueError, match="unknown tag"):
        t.read(tag="baseline")


def test_tag_validation(spark, warehouse):
    t = ManagedTable(spark, warehouse, SPEC)
    t.bootstrap(base_df(spark))
    with pytest.raises(ValueError, match="not a published snapshot"):
        t.create_tag("nope", version=99)
    t.create_tag("v1")
    with pytest.raises(ValueError, match="already exists"):
        t.create_tag("v1")
    with pytest.raises(ValueError, match="at most one of"):
        t.read(version=1, tag="v1")
    with pytest.raises(ValueError, match="unknown tag"):
        t.delete_tag("ghost")
    # tags survive reopen from the manifest
    t2 = ManagedTable.open(spark, warehouse, "ns.items")
    assert t2.list_tags() == {"v1": 1}


def test_tag_cannot_pin_staged_version(spark, warehouse):
    """Tags resolve through read(tag=...) for ANY reader, so pinning a
    staged WAP snapshot would leak unpublished data around the fence
    (and clone_to, which copies tags but only published snapshots,
    would produce a dangling tag)."""
    t = ManagedTable(spark, warehouse, SPEC)
    t.bootstrap(base_df(spark))
    v = t.stage_changes(changelog_df(spark))
    with pytest.raises(ValueError, match="not a published snapshot"):
        t.create_tag("leak", version=v)
    # the no-version default pins the published CURRENT, not the
    # staged head (m.version includes staged — the old default)
    t.create_tag("cur")
    assert t.list_tags() == {"cur": 1}
    t.abort_staged(v)
    # ref namespaces are unified in BOTH directions (create_branch
    # already refused tag names; the mirror check)
    t.create_branch("audit")
    with pytest.raises(ValueError, match="names a branch"):
        t.create_tag("audit")


def test_empty_branch_fast_forward_returns_current(spark, warehouse):
    """An idle branch forked below the tip evaporates on fast_forward;
    the returned 'new current version' must be the ACTUAL current, not
    the stale fork base the dead ref pointed at."""
    t = ManagedTable(spark, warehouse, SPEC)
    t.bootstrap(base_df(spark))
    t.create_branch("idle")  # forked at v1
    t.apply_changes(changelog_df(spark))  # main advances to v2
    assert t.fast_forward("idle") == 2
    assert t.list_branches() == {}


# -- branches (Iceberg branch + multi-commit WAP fast-forward) -------------


def second_batch(spark):
    return spark.createDataFrame(
        [
            Row(op="MODIFY", seq=3, pk=4, status="b2", price=44.0),
            Row(op="REMOVE", seq=3, pk=5, status="x", price=0.0),
        ]
    )


def test_branch_stack_audit_fast_forward(spark, warehouse):
    """Two commits stack on one branch (main blind to both), the
    branch read sees the stacked state, and fast_forward publishes
    the whole chain atomically."""
    t = ManagedTable(spark, warehouse, SPEC)
    t.bootstrap(base_df(spark))
    t.create_branch("audit")
    v2 = t.apply_changes_to_branch("audit", changelog_df(spark))
    v3 = t.apply_changes_to_branch("audit", second_batch(spark))
    assert (v2, v3) == (2, 3)
    # main readers still see the bootstrap
    assert {r.status for r in t.read().collect()} == {"old"}
    # branch head = both batches applied in order
    state = {r.pk: r.status for r in t.read(branch="audit").collect()}
    assert state == {1: "v2", 2: "upd", 4: "b2", 9: "new"}
    assert t.list_branches() == {"audit": 3}
    head = t.fast_forward("audit")
    assert head == 3
    assert {r.pk: r.status for r in t.read().collect()} == state
    ops = [s.operation for s in t.history()]
    assert ops == ["bootstrap", "branch-publish:audit", "branch-publish:audit"]
    # provenance survives publish
    assert [s.ref for s in t.history()] == [None, "audit", "audit"]
    assert t.list_branches() == {}


def test_branch_fences_other_lineages(spark, warehouse):
    """While a branch has pending commits: main merges, anonymous
    stages, and commits to a SECOND branch all conflict."""
    t = ManagedTable(spark, warehouse, SPEC)
    t.bootstrap(base_df(spark))
    t.create_branch("a")
    t.create_branch("b")
    t.apply_changes_to_branch("a", changelog_df(spark))
    with pytest.raises(CommitConflictError, match="branch 'a'"):
        t.apply_changes(second_batch(spark))
    with pytest.raises(CommitConflictError, match="branch 'a'"):
        t.stage_changes(second_batch(spark))
    with pytest.raises(CommitConflictError, match="branch 'a'"):
        t.apply_changes_to_branch("b", second_batch(spark))
    # publishing A unblocks B
    t.fast_forward("a")
    # ...but B's fork point is now stale: the lost-update guard trips
    with pytest.raises(CommitConflictError, match="main advanced"):
        t.apply_changes_to_branch("b", second_batch(spark))


def test_branch_delete_aborts_commits(spark, warehouse):
    t = ManagedTable(spark, warehouse, SPEC)
    t.bootstrap(base_df(spark))
    t.create_branch("audit")
    t.apply_changes_to_branch("audit", changelog_df(spark))
    t.apply_changes_to_branch("audit", second_batch(spark))
    res = t.delete_branch("audit")
    assert res == {"commits_dropped": 2}
    assert [s.version for s in t.history()] == [1]
    assert {r.status for r in t.read().collect()} == {"old"}
    # history is clean again: a normal merge lands fine
    t.apply_changes(changelog_df(spark))
    assert t.version == 2


def test_branch_base_pinned_through_retention(spark, warehouse):
    """A branch ref pins its fork base: vacuum/expire may not reclaim
    it (the branch's next commit merges against that base)."""
    t = ManagedTable(spark, warehouse, SPEC)
    t.bootstrap(base_df(spark))
    t.apply_changes(changelog_df(spark))
    # fork a branch at v1 (not current), then advance main
    t.create_branch("old-base", version=1)
    t.apply_changes(second_batch(spark))
    res = t.vacuum(unreferenced_days=0, noncurrent_days=0, now=time.time() + 86400)
    # v2 (untagged, unbranched, noncurrent) drops; v1 is pinned
    assert res["snapshots_dropped"] == 1
    assert sorted(s.version for s in t.history()) == [1, 3]
    assert t.read(branch="old-base").count() == 5
    res2 = t.expire_snapshots(retain_last=1)
    assert res2["snapshots_dropped"] == 0


def test_branch_validation(spark, warehouse):
    t = ManagedTable(spark, warehouse, SPEC)
    t.bootstrap(base_df(spark))
    t.create_tag("pin")
    with pytest.raises(ValueError, match="names a tag"):
        t.create_branch("pin")
    t.create_branch("audit")
    with pytest.raises(ValueError, match="already exists"):
        t.create_branch("audit")
    with pytest.raises(ValueError, match="not a published snapshot"):
        t.create_branch("ghost", version=99)
    with pytest.raises(ValueError, match="unknown branch"):
        t.read(branch="nope")
    with pytest.raises(ValueError, match="unknown branch"):
        t.fast_forward("nope")
    # a staged snapshot is not a valid fork point
    v = t.stage_changes(changelog_df(spark))
    with pytest.raises(ValueError, match="not a published snapshot"):
        t.create_branch("on-stage", version=v)
    t.abort_staged(v)
    # branches survive reopen from the manifest
    t2 = ManagedTable.open(spark, warehouse, "ns.items")
    assert t2.list_branches() == {"audit": 1}
    # empty-branch fast-forward just evaporates the ref
    assert t2.fast_forward("audit") == 1
    assert t2.list_branches() == {}


# -- column rename (metadata-only, Iceberg name-mapping analog) ------------


def test_rename_column_no_rewrite(spark, warehouse):
    """Rename is O(manifest): data files are untouched, reads map the
    stored name to the new one (no NULLed column), time travel to the
    pre-rename version still shows the old name."""
    t = ManagedTable(spark, warehouse, SPEC)
    t.bootstrap(base_df(spark))
    dir_before = t.history()[-1].data_dir
    t.rename_column("status", "state")
    assert t.history()[-1].data_dir == dir_before  # same files
    out = t.read()
    assert "state" in out.columns and "status" not in out.columns
    vals = {r.pk: r.state for r in out.collect()}
    assert vals == {i: "old" for i in range(1, 6)}  # data intact, not NULL
    # pre-rename snapshot keeps the old name
    old = t.read(version=1)
    assert "status" in old.columns and "state" not in old.columns


def test_rename_then_merge_and_compose(spark, warehouse):
    """Post-rename merges bind to the new name and write unmapped
    files; a second rename composes to one file->current entry."""
    t = ManagedTable(spark, warehouse, SPEC)
    t.bootstrap(base_df(spark))
    t.rename_column("status", "state")
    batch = spark.createDataFrame(
        [Row(op="MODIFY", seq=1, pk=2, state="merged", price=22.0)]
    )
    t.apply_changes(batch)
    state = {r.pk: r.state for r in t.read().collect()}
    assert state[2] == "merged" and state[1] == "old"
    assert t.history()[-1].read_renames is None  # fresh files, no mapping
    # compose: rename again (state -> phase) on the merged snapshot
    t.rename_column("state", "phase")
    assert {r.pk: r.phase for r in t.read().collect()}[2] == "merged"


def test_rename_scan_pruning_follows_new_name(spark, warehouse):
    """Manifest min/max stats are re-keyed: scan() prunes on the NEW
    name after a metadata-only rename."""
    spec = TableSpec(
        namespace="ns", name="pruned", key_columns=("pk",),
        order_columns=("seq",), sort_columns=("price",),
        properties={"write.sorted-file-count": "4"},
    )
    t = ManagedTable(spark, warehouse, spec)
    t.bootstrap(
        spark.createDataFrame(
            [Row(pk=i, status="s", price=float(i)) for i in range(1, 101)]
        )
    )
    t.rename_column("price", "amount")
    got = t.scan([("amount", ">=", 90.0)])
    assert got.count() == 11
    assert t.last_scan_metrics["files_read"] < t.last_scan_metrics["files_total"]


def test_rename_validation(spark, warehouse):
    t = ManagedTable(spark, warehouse, SPEC)
    t.bootstrap(base_df(spark))
    with pytest.raises(ValueError, match="unknown column"):
        t.rename_column("ghost", "x")
    with pytest.raises(SchemaEvolutionError, match="already exists"):
        t.rename_column("status", "price")
    with pytest.raises(ValueError, match="bound by the persisted table spec"):
        t.rename_column("pk", "id")
    # MoR chain refuses until compacted
    t.apply_changes(changelog_df(spark), strategy="merge-on-read")
    with pytest.raises(ValueError, match="copy-on-write"):
        t.rename_column("status", "state")
    t.compact()
    t.rename_column("status", "state")
    assert "state" in t.read().columns


# -- shallow clone (zero-copy table registration) --------------------------


def test_shallow_clone_zero_copy_and_divergence(spark, warehouse, tmp_path):
    src = ManagedTable(spark, warehouse, SPEC)
    src.bootstrap(base_df(spark))
    src.apply_changes(changelog_df(spark))
    wh2 = str(tmp_path / "wh2")
    clone = src.clone_to(wh2)
    # identical state, zero data copied under the clone's root
    assert sorted(map(tuple, clone.read().collect())) == sorted(
        map(tuple, src.read().collect())
    )
    assert not (clone.root / "data").exists()
    # divergence: each side commits independently
    clone.apply_changes(
        spark.createDataFrame([Row(op="MODIFY", seq=9, pk=4, status="clone", price=1.0)])
    )
    src.apply_changes(
        spark.createDataFrame([Row(op="MODIFY", seq=9, pk=5, status="src", price=2.0)])
    )
    c = {r.pk: r.status for r in clone.read().collect()}
    s = {r.pk: r.status for r in src.read().collect()}
    assert c[4] == "clone" and s[4] == "old"
    assert s[5] == "src" and c[5] == "old"
    # clone-side retention never deletes source dirs
    res = clone.vacuum(unreferenced_days=0, noncurrent_days=0, now=time.time() + 86400)
    assert src.verify_integrity()["ok"]
    assert clone.verify_integrity()["ok"]
    assert res["dirs_deleted"] == 0  # shared dirs live under the source root


def test_shallow_clone_validation_and_staged_exclusion(spark, warehouse, tmp_path):
    src = ManagedTable(spark, warehouse, SPEC)
    src.bootstrap(base_df(spark))
    staged_v = src.stage_changes(changelog_df(spark))
    wh2 = str(tmp_path / "wh2")
    clone = src.clone_to(wh2, qualified_name="dev.items_copy")
    # the pending stage is the source's in-flight lineage, not cloned
    assert [s.version for s in clone.history()] == [1]
    assert clone.spec.qualified_name == "dev.items_copy"
    src.publish(staged_v)
    with pytest.raises(ValueError, match="already exists"):
        src.clone_to(wh2, qualified_name="dev.items_copy")


def test_shallow_clone_breaks_when_source_vacuums(spark, warehouse, tmp_path):
    """The documented Delta-style caveat, surfaced mechanically: the
    source does not know about clones, so a source-side vacuum that
    reclaims a dir the clone references leaves the clone with
    missing_paths in verify_integrity()."""
    src = ManagedTable(spark, warehouse, SPEC)
    src.bootstrap(base_df(spark))
    clone = src.clone_to(str(tmp_path / "wh2"))
    src.apply_changes(changelog_df(spark))
    # source reclaims v1 (the clone's only snapshot)
    src.vacuum(unreferenced_days=0, noncurrent_days=0, now=time.time() + 86400)
    audit = clone.verify_integrity()
    assert not audit["ok"] and audit["missing_paths"]


def test_rollback_to_renamed_snapshot_keeps_mapping(spark, warehouse):
    """Found by the model walk: rollback_to must carry the source
    snapshot's read_renames — without it, rolling back to a
    rename-mapped snapshot silently reads the renamed column as NULL."""
    t = ManagedTable(spark, warehouse, SPEC)
    t.bootstrap(base_df(spark))
    t.rename_column("status", "state")        # v2: mapped, same files
    t.apply_changes(                          # v3: fresh files, no map
        spark.createDataFrame(
            [Row(op="MODIFY", seq=1, pk=1, state="upd", price=1.0)]
        )
    )
    t.rollback_to(2)                          # v4: must re-carry the map
    vals = {r.pk: r.state for r in t.read().collect()}
    assert vals == {i: "old" for i in range(1, 6)}  # not None!


# -- timestamp time travel (B10, Delta TIMESTAMP AS OF analog) --------------

def test_read_as_of_timestamp(spark, warehouse):
    from dynamodb_zero_etl_s3tables_spark.spec import TableSpec
    from dynamodb_zero_etl_s3tables_spark.table.catalog import Catalog

    t = Catalog(spark, warehouse).create_table(
        TableSpec(namespace="ns", name="asof", key_columns=("pk",))
    )
    t.bootstrap(spark.createDataFrame([(1, "a")], "pk long, v string"))
    t.apply_changes(
        spark.createDataFrame(
            [("MODIFY", 2, "b", 1, 1)], "op string, pk long, v string, ts long, seq long"
        )
    )
    snaps = {s.version: s.committed_at for s in t._read_manifest().snapshots}
    # exactly at v1's commit -> v1; midway between commits -> still v1;
    # at/after v2's commit -> v2
    assert t.read(as_of=snaps[1]).count() == 1
    assert t.read(as_of=(snaps[1] + snaps[2]) / 2).count() == 1
    assert t.read(as_of=snaps[2]).count() == 2
    assert t.read(as_of=snaps[2] + 1e6).count() == 2
    with pytest.raises(ValueError, match="at or before"):
        t.read(as_of=snaps[1] - 10.0)
    with pytest.raises(ValueError, match="at most one"):
        t.read(version=1, as_of=snaps[1])


def test_read_as_of_skips_staged(spark, warehouse):
    from dynamodb_zero_etl_s3tables_spark.spec import TableSpec
    from dynamodb_zero_etl_s3tables_spark.table.catalog import Catalog

    t = Catalog(spark, warehouse).create_table(
        TableSpec(namespace="ns", name="asof2", key_columns=("pk",))
    )
    t.bootstrap(spark.createDataFrame([(1, "a")], "pk long, v string"))
    t.stage_changes(
        spark.createDataFrame(
            [("MODIFY", 2, "b", 1, 1)], "op string, pk long, v string, ts long, seq long"
        )
    )
    # a pending WAP stage is newer but must be invisible to as_of
    assert t.read(as_of=time.time() + 1e6).count() == 1


def test_read_as_of_all_staged_distinct_error(spark, warehouse):
    """If every snapshot is staged (WAP-only history), as_of must say
    so explicitly instead of dying in min() over an empty sequence.
    No write path produces this state today (stage_changes requires a
    bootstrap), so construct the persisted manifest shape directly —
    the guard defends against exactly this on-disk state."""
    import json

    from dynamodb_zero_etl_s3tables_spark.spec import TableSpec
    from dynamodb_zero_etl_s3tables_spark.table.catalog import Catalog

    t = Catalog(spark, warehouse).create_table(
        TableSpec(namespace="ns", name="asof3", key_columns=("pk",))
    )
    t.bootstrap(spark.createDataFrame([(1, "a")], "pk long, v string"))
    mp = f"{warehouse}/ns/asof3/manifest.json"
    raw = json.loads(open(mp).read())
    for s in raw["snapshots"]:
        s["staged"] = True
    open(mp, "w").write(json.dumps(raw))
    with pytest.raises(ValueError, match="staged"):
        t.read(as_of=time.time() + 1e6)


# -- drop column (B4 subtractive evolution, metadata-only) ------------------

def _drop_tbl(spark, warehouse, **spec_over):
    from dynamodb_zero_etl_s3tables_spark.spec import TableSpec
    from dynamodb_zero_etl_s3tables_spark.table.catalog import Catalog

    t = Catalog(spark, warehouse).create_table(
        TableSpec(namespace="ns", name="dropcol", key_columns=("pk",), **spec_over)
    )
    t.bootstrap(
        spark.createDataFrame(
            [(1, "a", 1.5), (2, "b", 2.5)], "pk long, status string, price double"
        )
    )
    return t


def test_drop_column_is_metadata_only_and_time_travels(spark, warehouse):
    t = _drop_tbl(spark, warehouse)
    d1 = t._read_manifest().current.data_dir
    t.drop_column("status")
    snap = t._read_manifest().current
    assert snap.data_dir == d1  # no rewrite
    assert t.read().columns == ["pk", "price"]
    assert t.read(version=1).columns == ["pk", "status", "price"]  # history intact
    # merges after the drop bind to the reduced schema
    t.apply_changes(
        spark.createDataFrame(
            [("MODIFY", 3, 9.5, 1, 1)], "op string, pk long, price double, ts long, seq long"
        )
    )
    assert {r["pk"]: r["price"] for r in t.read().collect()} == {1: 1.5, 2: 2.5, 3: 9.5}


def test_drop_column_guards(spark, warehouse):
    t = _drop_tbl(spark, warehouse)
    with pytest.raises(ValueError, match="bound by the persisted table spec"):
        t.drop_column("pk")
    with pytest.raises(ValueError, match="unknown column"):
        t.drop_column("nope")


def test_drop_column_refuses_generated_dependency(spark, warehouse):
    t = _drop_tbl(
        spark,
        warehouse,
        generated_columns=(("price_cents", "CAST(ROUND(price * 100) AS BIGINT)"),),
    )
    with pytest.raises(ValueError, match="generated"):
        t.drop_column("price")


def test_drop_column_refuses_check_constraint_dependency(spark, warehouse):
    """Dropping a column named in a persisted CHECK constraint would
    leave the table permanently unwritable (every later commit fails
    UNRESOLVED_COLUMN evaluating the constraint); refuse upfront."""
    t = _drop_tbl(spark, warehouse, check_constraints=("price > 0",))
    with pytest.raises(ValueError, match="check "):
        t.drop_column("price")
    t.drop_column("status")  # unreferenced columns still droppable
    # and the constraint still enforces on later writes
    t.apply_changes(
        spark.createDataFrame(
            [("MODIFY", 3, 9.5, 1, 1)],
            "op string, pk long, price double, ts long, seq long",
        )
    )
    assert t.read().columns == ["pk", "price"]


def test_drop_column_dependency_guard_identifier_boundaries(spark, warehouse):
    """Spark resolves identifiers case-insensitively, so 'PRICE * 100'
    must still block drop_column('price'); conversely 'doc_id' in an
    expression must NOT block dropping 'id' (whole-identifier match,
    not substring)."""
    t = _drop_tbl(
        spark,
        warehouse,
        generated_columns=(("price_cents", "CAST(ROUND(PRICE * 100) AS BIGINT)"),),
    )
    with pytest.raises(ValueError, match="generated"):
        t.drop_column("price")

    from dynamodb_zero_etl_s3tables_spark.spec import TableSpec
    from dynamodb_zero_etl_s3tables_spark.table.catalog import Catalog

    t2 = Catalog(spark, warehouse).create_table(
        TableSpec(
            namespace="ns", name="dropcol2", key_columns=("pk",),
            check_constraints=("doc_id IS NOT NULL",),
        )
    )
    t2.bootstrap(
        spark.createDataFrame(
            [(1, 7, 5)], "pk long, doc_id long, id long"
        )
    )
    t2.drop_column("id")  # 'id' inside 'doc_id' is not a reference
    assert t2.read().columns == ["pk", "doc_id"]


def test_drop_then_rename_compose(spark, warehouse):
    t = _drop_tbl(spark, warehouse)
    t.drop_column("status")
    t.rename_column("price", "amount")
    assert t.read().columns == ["pk", "amount"]
    assert {r["pk"]: r["amount"] for r in t.read().collect()} == {1: 1.5, 2: 2.5}


# -- r8 manifest review regressions -------------------------------------------

from dynamodb_zero_etl_s3tables_spark.table.manifest import (  # noqa: E402
    ConstraintViolationError,
)

_WAVE_DDL = "op string, pk long, status string, price double, ts long, seq long"


def _mk_r8(spark, warehouse, name, **spec_kw):
    t = Catalog(spark, warehouse).create_table(
        TableSpec(namespace="ns", name=name, key_columns=("pk",), **spec_kw)
    )
    t.bootstrap(
        spark.createDataFrame(
            [(1, "A", 10.0), (2, "B", 20.0)],
            "pk long, status string, price double",
        )
    )
    return t


def test_read_changes_null_safe_key_presence(spark, warehouse):
    """r8 review: presence is a side MARKER, not key nullability — an
    unchanged NULL-keyed row (matched by the null-safe join) must not
    be misreported as INSERT with the stale old image."""
    t = Catalog(spark, warehouse).create_table(
        TableSpec(namespace="ns", name="nullkey", key_columns=("pk",))
    )
    t.bootstrap(spark.createDataFrame([(None, 1.0), (2, 2.0)], "pk long, x double"))
    t.overwrite(spark.createDataFrame([(None, 1.0), (2, 9.0)], "pk long, x double"))
    assert {(r.op, r.pk) for r in t.read_changes(1, 2).collect()} == {("MODIFY", 2)}
    # a CHANGED null-keyed row is a MODIFY with the new image
    t.overwrite(spark.createDataFrame([(None, 7.0), (2, 9.0)], "pk long, x double"))
    ch = {(r.op, r.pk): r.x for r in t.read_changes(2, 3).collect()}
    assert ch == {("MODIFY", None): 7.0}
    # a REMOVED null-keyed row carries the old image
    t.overwrite(spark.createDataFrame([(2, 9.0)], "pk long, x double"))
    assert [(r.op, r.pk, r.x) for r in t.read_changes(3, 4).collect()] == [
        ("REMOVE", None, 7.0)
    ]


def test_read_changes_default_excludes_staged(spark, warehouse):
    """r8 review: read_changes' to_version default is the PUBLISHED
    head — a staged WAP snapshot must not leak through the
    incremental surface (its version is even reused after abort)."""
    t = _mk_r8(spark, warehouse, "stagedleak")
    t.stage_changes(
        spark.createDataFrame([("MODIFY", 9, "Z", 1.0, 1, 1)], _WAVE_DDL)
    )
    assert t.read_changes(1).count() == 0  # published head == v1


def test_update_where_refuses_key_assignment(spark, warehouse):
    """r8 review: keys are immutable (DynamoDB replica semantics);
    under merge-on-read a key assignment would tombstone the NEW key
    and leave the old row alive — silent duplication."""
    t = _mk_r8(spark, warehouse, "keyassign")
    for strategy in ("copy-on-write", "merge-on-read"):
        with pytest.raises(ValueError, match="key columns"):
            t.update_where([("pk", "=", 1)], {"pk": "100"}, strategy=strategy)
    assert t.read().count() == 2  # nothing committed


def test_interleaved_commit_conflicts_instead_of_lost_update(
    spark, warehouse, monkeypatch
):
    """r8 review: the optimistic CAS anchors at the manifest version
    the write PLAN derives from. A commit that interleaves between a
    verb's base read and its swap must surface as CommitConflictError
    — not silently clobber the interleaved writer's changes."""
    import dynamodb_zero_etl_s3tables_spark.table.manifest as M

    cat = Catalog(spark, warehouse)
    t1 = _mk_r8(spark, warehouse, "race")
    t2 = ManagedTable.open(spark, warehouse, "ns.race")
    orig = M.merge_changes
    fired = {}

    def hook(base, changes, keys, order_cols):
        if not fired:
            fired["x"] = True  # guard BEFORE the nested commit recurses
            t2.apply_changes(
                t2.spark.createDataFrame(
                    [("MODIFY", 2, "B", 99.0, 1, 1)], _WAVE_DDL
                )
            )
        return orig(base, changes, keys=keys, order_cols=order_cols)

    monkeypatch.setattr(M, "merge_changes", hook)
    with pytest.raises(CommitConflictError):
        t1.apply_changes(
            spark.createDataFrame([("MODIFY", 1, "A", 55.0, 1, 1)], _WAVE_DDL)
        )
    # the interleaved writer's commit SURVIVES; t1's refused plan left
    # no trace
    got = {r.pk: r.price for r in t1.read().collect()}
    assert got == {1: 10.0, 2: 99.0}


def test_evolve_partitioning_carries_rename_mapping(spark, warehouse):
    """r8 review: the evolve-partitioning marker snapshot must carry
    read_renames — otherwise the renamed column reads as NULL."""
    t = _mk_r8(spark, warehouse, "evorename")
    t.rename_column("price", "amount")
    t.evolve_partitioning(("status",))
    got = {r.pk: r.amount for r in t.read().collect()}
    assert got == {1: 10.0, 2: 20.0}


def test_rollback_preserves_dropped_column_guard(spark, warehouse):
    """r8 review: rollback must carry dropped_columns — without it a
    metadata-only re-add resurrects the dropped values from the
    carried files."""
    t = _mk_r8(spark, warehouse, "rbdrop")
    t.drop_column("price")      # v2 (files still store price)
    t.rollback_to(2)            # v3 points at the same files
    with pytest.raises(SchemaEvolutionError, match="resurrect"):
        t.add_columns({"price": "double"})


def test_add_columns_refuses_renamed_file_name(spark, warehouse):
    """r8 review: adding a column under the STORED name of a renamed
    column would make the file schema carry two fields with one file
    name and break every read."""
    t = _mk_r8(spark, warehouse, "addfile")
    t.rename_column("price", "amount")
    with pytest.raises(SchemaEvolutionError, match="stored file name"):
        t.add_columns({"price": "double"})
    # reads still fine after the refusal
    assert {r.amount for r in t.read().collect()} == {10.0, 20.0}


def test_merge_refuses_invalid_op_values(spark, warehouse):
    """r9 review (merge.py pass): op values outside
    {INSERT, MODIFY, REMOVE} used to fail SILENTLY — NULL acted as
    REMOVE (key anti-joined away, no image survived the upsert
    filter: the row just vanished) and any junk string ('DELETE',
    'remove') upserted as if it were MODIFY. Both merge strategies
    must raise on the first offending row instead."""
    t = ManagedTable(spark, warehouse, SPEC)
    t.bootstrap(base_df(spark))
    bad = spark.createDataFrame(
        [Row(op="DELETE", seq=10, pk=1, status="x", price=1.0)]
    )
    with pytest.raises(Exception, match="invalid change op"):
        t.apply_changes(bad)
    with pytest.raises(Exception, match="invalid change op"):
        t.apply_changes(bad, strategy="merge-on-read")
    null_op = spark.createDataFrame(
        [("INSERT", 10, 9, "new", 9.0), (None, 11, 1, "x", 1.0)],
        "op string, seq long, pk long, status string, price double",
    )
    with pytest.raises(Exception, match="invalid change op"):
        t.apply_changes(null_op)
    # the table is untouched by the refused batches
    assert t.version == 1
    assert {r.pk for r in t.read().collect()} == {1, 2, 3, 4, 5}


def test_rename_then_drop_blocks_file_name_readd(spark, warehouse):
    """r9 review (REAL resurrection hole): after rename a->b then drop
    b, the carried files still store the values under 'a' — and the
    old bookkeeping recorded the CURRENT name 'b' in dropped_columns
    while popping the rename mapping, so a metadata-only add of 'a'
    passed every guard and resurrected the dropped column through its
    file name. dropped_columns now records the STORED FILE name."""
    t = _mk_r8(spark, warehouse, "rendrop")
    t.rename_column("price", "amount")   # files store 'price'
    t.drop_column("amount")              # must record 'price', not 'amount'
    with pytest.raises(SchemaEvolutionError, match="resurrect"):
        t.add_columns({"price": "double"})
    # the CURRENT name is safe to re-add — no carried file stores it
    t.add_columns({"amount": "double"})
    assert {r.amount for r in t.read().collect()} == {None}


# -- partitioned schema DDL (r9: per-entry rename mappings) -----------------


def _mk_pddl(spark, warehouse, name):
    t = Catalog(spark, warehouse).create_table(
        TableSpec(
            namespace="ns", name=name, key_columns=("pk",),
            order_columns=("seq",), partition_columns=("status",),
        )
    )
    t.bootstrap(
        spark.createDataFrame(
            [(1, 1, "A", 10.0), (2, 1, "A", 20.0), (3, 1, "B", 30.0)],
            "pk long, seq long, status string, price double",
        )
    )
    return t


def test_partitioned_rename_reads_and_mixes_entries(spark, warehouse):
    """Partitioned rename is metadata-only: entries keep their dirs
    with a per-entry mapping; a later PRUNED merge rewrites touched
    partitions under the new name while carrying the others' mapping,
    so one snapshot legally mixes old-named and new-named files."""
    t = _mk_pddl(spark, warehouse, "pren")
    t.rename_column("price", "amount")  # v2: metadata-only
    assert {r.pk: r.amount for r in t.read().collect()} == {
        1: 10.0, 2: 20.0, 3: 30.0,
    }
    assert "price" in t.read(version=1).columns  # time travel: old name
    t.apply_changes(
        spark.createDataFrame(
            [("MODIFY", 2, 1, "A", 11.0)],
            "op string, seq long, pk long, status string, amount double",
        )
    )
    assert {r.pk: r.amount for r in t.read().collect()} == {
        1: 11.0, 2: 20.0, 3: 30.0,
    }
    snap = t.history()[-1]
    by_part = {e["values"]["status"]: e for e in snap.partitions}
    assert by_part["B"].get("renames") == {"price": "amount"}  # carried
    assert "renames" not in by_part["A"]  # rewritten under the new name


def test_partitioned_rename_rekeys_file_stats(spark, warehouse):
    """Per-entry file stats/blooms are re-keyed at rename so min/max
    skipping keeps pruning under the new name."""
    t = _mk_pddl(spark, warehouse, "prenstats")
    t.rename_column("price", "amount")
    out = t.scan([("amount", ">=", 25.0)])
    assert {r.pk for r in out.collect()} == {3}
    m = t.last_scan_metrics
    assert m["files_read"] < m["files_total"], m


def test_partitioned_rename_compact_materializes(spark, warehouse):
    """compact() rewrites everything under current names and clears
    every per-entry mapping — the stored file name is free again."""
    t = _mk_pddl(spark, warehouse, "prencomp")
    t.rename_column("price", "amount")
    t.compact()
    snap = t.history()[-1]
    assert all("renames" not in e for e in snap.partitions)
    assert {r.pk: r.amount for r in t.read().collect()} == {
        1: 10.0, 2: 20.0, 3: 30.0,
    }
    t.add_columns({"price": "double"})  # file name physically cleared
    assert {r.price for r in t.read().collect()} == {None}


def test_partitioned_drop_and_resurrect_guard(spark, warehouse):
    """Partitioned drop is metadata-only; the resurrect guard stays
    armed through PRUNED merges (carried entries still store the
    values) and disarms only after a full rewrite."""
    t = _mk_pddl(spark, warehouse, "pdrop")
    t.drop_column("price")  # v2: metadata-only
    assert "price" not in t.read().columns
    assert "price" in t.read(version=1).columns
    with pytest.raises(SchemaEvolutionError, match="resurrect"):
        t.add_columns({"price": "double"})
    t.apply_changes(  # pruned merge: B carried, files still store price
        spark.createDataFrame(
            [("MODIFY", 2, 1, "A")],
            "op string, seq long, pk long, status string",
        )
    )
    with pytest.raises(SchemaEvolutionError, match="resurrect"):
        t.add_columns({"price": "double"})
    t.compact()  # full rewrite physically clears the dropped values
    t.add_columns({"price": "double"})
    assert {r.price for r in t.read().collect()} == {None}


def test_rename_cycle_swap_reads_correctly(spark, warehouse):
    """r9 review (verified live): 'rename a->tmp; rename b->a; rename
    tmp->b' composes the cyclic mapping {a: b, b: a}; the sequential
    withColumnRenamed loop first duplicated a name and every later
    read failed AMBIGUOUS_REFERENCE with no recovery path (compact()
    also reads). The mapping now applies as ONE simultaneous
    substitution — flat and partitioned paths both."""
    t = _mk_r8(spark, warehouse, "renswap")  # pk, status, price
    t.rename_column("status", "tmpc")
    t.rename_column("price", "status")  # price values now named status
    t.rename_column("tmpc", "price")    # status values now named price
    got = {r.pk: (r.status, r.price) for r in t.read().collect()}
    assert got == {1: (10.0, "A"), 2: (20.0, "B")}
    t.compact()  # materializes the swap (this used to be unreachable)
    assert {r.pk: (r.status, r.price) for r in t.read().collect()} == got

    p = Catalog(spark, warehouse).create_table(
        TableSpec(
            namespace="ns", name="renswapp", key_columns=("pk",),
            order_columns=("seq",), partition_columns=("g",),
        )
    )
    p.bootstrap(
        spark.createDataFrame(
            [(1, 1, "A", 10.0, "x"), (2, 1, "B", 20.0, "y")],
            "pk long, seq long, g string, price double, note string",
        )
    )
    p.rename_column("price", "tmpc")
    p.rename_column("note", "price")
    p.rename_column("tmpc", "note")
    got2 = {r.pk: (r.price, r.note) for r in p.read().collect()}
    assert got2 == {1: ("x", 10.0), 2: ("y", 20.0)}


def test_pruned_merge_evolution_respects_ddl_guards(spark, warehouse):
    """r9 review (resurrection verified live): a PRUNED merge whose
    batch re-introduces a dropped column's name — or a renamed
    column's stored FILE name — via additive schema evolution must
    refuse like add_columns: carried entries bind file columns by
    name, so the evolved schema would read the dropped values back
    out (or bind two fields to one file column and break every later
    read). A batch touching EVERY partition (nothing carried) stays
    legal — the full rewrite physically clears the hazard."""
    t = _mk_pddl(spark, warehouse, "pevog1")
    t.drop_column("price")
    with pytest.raises(SchemaEvolutionError, match="resurrect"):
        t.apply_changes(
            spark.createDataFrame(
                [("MODIFY", 2, 1, "A", 99.0)],
                "op string, seq long, pk long, status string, price double",
            )
        )
    t2 = _mk_pddl(spark, warehouse, "pevog2")
    t2.rename_column("price", "amount")
    with pytest.raises(SchemaEvolutionError, match="stored file name"):
        t2.apply_changes(
            spark.createDataFrame(
                [("MODIFY", 2, 1, "A", 11.0, 99.0)],
                "op string, seq long, pk long, status string,"
                " amount double, price double",
            )
        )
    t2.compact()  # materializes the rename: the file name is free
    t2.apply_changes(
        spark.createDataFrame(
            [("MODIFY", 2, 1, "A", 11.0, 99.0)],
            "op string, seq long, pk long, status string,"
            " amount double, price double",
        )
    )
    got = {r.pk: (r.amount, r.price) for r in t2.read().collect()}
    assert got[1] == (11.0, 99.0) and got[3] == (30.0, None)
    # all-partitions batch: carry is empty, evolution is a full
    # rewrite — legal, and the dropped values provably do NOT return
    t3 = _mk_pddl(spark, warehouse, "pevog3")
    t3.drop_column("price")
    t3.apply_changes(
        spark.createDataFrame(
            [("MODIFY", 2, 1, "A", 1.0), ("MODIFY", 2, 3, "B", 3.0)],
            "op string, seq long, pk long, status string, price double",
        )
    )
    assert {r.pk: r.price for r in t3.read().collect()} == {
        1: 1.0, 2: None, 3: 3.0,
    }


def test_ddl_refuses_ex_partition_layout_column(spark, warehouse):
    """After partition-spec evolution, carried old-layout entries keep
    their values under the EX-partition column (no longer
    spec-protected): renaming it would silently null the column (the
    dir value re-attaches under the old name, then is projected away)
    and dropping it would break old-layout reads — refuse until
    compact() migrates every entry to the current layout."""
    t = _mk_pddl(spark, warehouse, "pexlay")
    t.evolve_partitioning(())  # spec unpartitions going forward
    with pytest.raises(ValueError, match="partition-layout"):
        t.rename_column("status", "state")
    with pytest.raises(ValueError, match="partition-layout"):
        t.drop_column("status")
    t.compact()  # migrates entries to the current (flat) layout
    t.rename_column("status", "state")
    assert {r.state for r in t.read().collect()} == {"A", "B"}


def test_partitioned_add_columns_metadata_only(spark, warehouse):
    """Partitioned ADD COLUMNS carries every entry verbatim; the new
    column surfaces as NULL until a data-writing commit."""
    t = _mk_pddl(spark, warehouse, "padd")
    t.add_columns({"flag": "boolean"})
    assert {r.flag for r in t.read().collect()} == {None}
    t.apply_changes(
        spark.createDataFrame(
            [("MODIFY", 2, 3, "B", 30.0, True)],
            "op string, seq long, pk long, status string, price double,"
            " flag boolean",
        )
    )
    got = {r.pk: r.flag for r in t.read().collect()}
    assert got == {1: None, 2: None, 3: True}


def test_stage_and_branch_merges_fill_generated_columns(spark, warehouse):
    """r8 review: stage_changes/apply_changes_to_branch share
    apply_changes' _fill_generated contract — a batch omitting a
    generated column must stage, not refuse as missing."""
    t = Catalog(spark, warehouse).create_table(
        TableSpec(
            namespace="ns", name="gstage", key_columns=("pk",),
            generated_columns=(
                ("price_cents", "CAST(ROUND(price * 100) AS BIGINT)"),
            ),
        )
    )
    t.bootstrap(
        spark.createDataFrame([(1, "A", 10.0)], "pk long, status string, price double")
    )
    v = t.stage_changes(
        spark.createDataFrame([("MODIFY", 2, "B", 1.5, 1, 1)], _WAVE_DDL)
    )
    t.publish(v)
    got = {r.pk: r.price_cents for r in t.read().collect()}
    assert got == {1: 1000, 2: 150}


def test_partition_empty_string_value_refused(spark, warehouse):
    """r8 review: '' and NULL both land in __HIVE_DEFAULT_PARTITION__,
    and the manifest round-trips the dir as NULL — an empty-string
    partition value would silently read back as NULL. Refused at
    commit; NULL itself stays legal."""
    t = Catalog(spark, warehouse).create_table(
        TableSpec(
            namespace="ns", name="emptypart", key_columns=("pk",),
            partition_columns=("status",),
        )
    )
    with pytest.raises(ConstraintViolationError):
        t.bootstrap(
            spark.createDataFrame(
                [(1, "", 1.0)], "pk long, status string, price double"
            )
        )
    t.bootstrap(
        spark.createDataFrame(
            [(1, None, 1.0), (2, "B", 2.0)], "pk long, status string, price double"
        )
    )
    assert t.read().count() == 2


def test_vacuum_reclaims_orphan_manifest_tmp(spark, warehouse):
    """r8 review: a crash between the temp manifest write and the
    atomic replace leaves manifest.tmp-* orphans; vacuum ages them
    out with the unreferenced cutoff."""
    import os

    t = _mk_r8(spark, warehouse, "tmporphan")
    orphan = t.manifest_path.parent / "manifest.tmp-deadbeef"
    orphan.write_text("{}")
    os.utime(orphan, (0, 0))
    t.vacuum(unreferenced_days=0, noncurrent_days=10_000)
    assert not orphan.exists()


# ---------------------------------------------------------------------------
# metadata_aggregate (r10): COUNT/MIN/MAX from manifest stats alone
# ---------------------------------------------------------------------------


def test_metadata_aggregate_no_data_read(spark, warehouse):
    """The headline claim, proven by corruption: after the manifest is
    written, every parquet data file is OVERWRITTEN WITH GARBAGE — the
    metadata aggregate still answers (it never opens data files),
    and the answers match the pre-corruption state."""
    t = _mk_r8(spark, warehouse, "statagg")
    t.apply_changes(
        spark.createDataFrame(
            [("INSERT", 1, 3, "C", 5.5), ("REMOVE", 1, 1, "A", 10.0)],
            "op string, seq long, pk long, status string, price double",
        ),
        order_cols=("seq",),
    )
    agg = t.metadata_aggregate(("pk", "price", "status"))
    assert agg == {
        "row_count": 2,
        "min": {"pk": 2, "price": 5.5, "status": "B"},
        "max": {"pk": 3, "price": 20.0, "status": "C"},
    }
    from pathlib import Path

    n_corrupted = 0
    for p in Path(warehouse).rglob("*.parquet"):
        p.write_bytes(b"garbage" * 16)
        n_corrupted += 1
    assert n_corrupted > 0
    assert t.metadata_aggregate(("pk", "price", "status")) == agg
    # time travel over the manifest alone: v1 is the bootstrap image
    v1 = t.metadata_aggregate(("pk", "price"), version=1)
    assert v1["row_count"] == 2
    assert (v1["min"]["pk"], v1["max"]["pk"]) == (1, 2)
    assert (v1["min"]["price"], v1["max"]["price"]) == (10.0, 20.0)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="no retained published"):
        t.metadata_aggregate(("pk",), version=99)


def test_metadata_aggregate_refusals(spark, warehouse):
    import pytest

    t = _mk_r8(spark, warehouse, "statref")
    with pytest.raises(ValueError, match="unknown column"):
        t.metadata_aggregate(("nope",))
    # merge-on-read head: tombstones are unresolvable from stats
    t.apply_changes(
        spark.createDataFrame(
            [("REMOVE", 1, 1, "A", 10.0)],
            "op string, seq long, pk long, status string, price double",
        ),
        order_cols=("seq",),
        strategy="merge-on-read",
    )
    with pytest.raises(RuntimeError, match="copy-on-write head"):
        t.metadata_aggregate(("pk",))
    t.compact()
    assert t.metadata_aggregate(("pk",))["row_count"] == 1


def test_metadata_aggregate_partitioned_and_renamed(spark, warehouse):
    """Partitioned tables aggregate across entry file stats (carried
    entries included); a renamed column resolves through the stored
    file name; a non-string partition column refuses (dir-name order
    is not value order)."""
    import pytest

    t = Catalog(spark, warehouse).create_table(
        TableSpec(
            namespace="ns",
            name="statpart",
            key_columns=("pk",),
            partition_columns=("part",),
        )
    )
    t.bootstrap(
        spark.createDataFrame(
            [(1, "a", 1.0), (2, "b", 2.0), (3, "b", 30.0)],
            "pk long, part string, x double",
        )
    )
    # pruned merge touches only partition 'a' — 'b' entries are carried
    t.apply_changes(
        spark.createDataFrame(
            [("MODIFY", 1, 1, "a", 9.0)],
            "op string, seq long, pk long, part string, x double",
        ),
        order_cols=("seq",),
    )
    agg = t.metadata_aggregate(("pk", "x", "part"))
    assert agg["row_count"] == 3
    assert agg["min"] == {"pk": 1, "x": 2.0, "part": "a"}
    assert agg["max"] == {"pk": 3, "x": 30.0, "part": "b"}
    t.rename_column("x", "y")
    agg2 = t.metadata_aggregate(("y",))
    assert (agg2["min"]["y"], agg2["max"]["y"]) == (2.0, 30.0)

    t2 = Catalog(spark, warehouse).create_table(
        TableSpec(
            namespace="ns",
            name="statpart_int",
            key_columns=("pk",),
            partition_columns=("bucket",),
        )
    )
    t2.bootstrap(
        spark.createDataFrame([(1, 2, 1.0), (2, 10, 2.0)], "pk long, bucket int, x double")
    )
    assert t2.metadata_aggregate(("pk",))["row_count"] == 2
    with pytest.raises(RuntimeError, match="non-string"):
        t2.metadata_aggregate(("bucket",))


def test_merge_into_ambiguous_source_refused(spark, warehouse):
    """Delta parity (r10 review): multiple source rows matching ONE
    target row previously duplicated the target row silently — every
    clause is ambiguous, so the merge must raise. Pure-INSERT merges
    tolerate duplicate matches exactly like Delta (the guard is only
    referenced by clause evaluation)."""
    import pytest

    t = ManagedTable(spark, warehouse, SPEC)
    t.bootstrap(base_df(spark))  # pk 1..5
    dup = spark.createDataFrame(
        [Row(pk=1, np=111.0), Row(pk=1, np=222.0), Row(pk=9, np=9.0)]
    )
    with pytest.raises(Exception, match="multiple source rows matched"):
        t.merge_into(
            dup,
            on=[("pk", "pk")],
            matched=[("update", None, {"price": F.col("s.np")})],
        )
    # the failed merge must not have committed anything
    assert t.history()[-1].operation == "bootstrap"
    # INSERT-only merge: duplicate MATCHED keys are ignored (no clause
    # touches them), duplicate UNMATCHED keys insert both — Delta's
    # behavior for a NOT MATCHED-only statement
    t.merge_into(
        dup.unionByName(
            spark.createDataFrame([Row(pk=9, np=10.0)])
        ),
        on=[("pk", "pk")],
        insert_values={
            "pk": F.col("pk"),
            "status": F.lit("new"),
            "price": F.col("np"),
        },
    )
    rows = [r for r in t.read().collect() if r.pk == 9]
    assert len(rows) == 2 and {r.price for r in rows} == {9.0, 10.0}
    assert all(r.pk != 1 or r.price == 10.0 for r in t.read().collect())


def test_metadata_aggregate_evolved_partition_column_refused(spark, warehouse):
    """After partition-spec evolution, carried old-layout entries
    store the NEW partition column in their data files, not their dir
    names — its extremes are invisible to the manifest, so the
    partition-column aggregate must refuse instead of silently
    dropping those rows; non-partition columns still answer from the
    per-file stats carried with every entry."""
    import pytest

    spec = TableSpec(
        namespace="ns", name="pevo_meta", key_columns=("pk",),
        order_columns=("seq",), partition_columns=("part",),
    )
    t = ManagedTable(spark, warehouse, spec)
    t.bootstrap(_pe_base(spark))
    t.evolve_partitioning(("cat",))
    agg = t.metadata_aggregate(("pk", "qty"))
    assert agg["row_count"] == 4
    assert (agg["min"]["qty"], agg["max"]["qty"]) == (10, 40)
    with pytest.raises(RuntimeError, match="pre-evolution carried entry"):
        t.metadata_aggregate(("cat",))
