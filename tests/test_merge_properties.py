"""Property-based merge-semantics tests (hypothesis): the CDC merge
contract (B5-B7, A10) holds for ARBITRARY change batches, not just the
golden fixtures in test_table.py. A reference model computes the
expected state in plain Python; merge_changes must agree on every
generated batch, under idempotent re-apply, and regardless of the
row order the batch arrives in."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row

from dynamodb_zero_etl_s3tables_spark.table.merge import merge_changes

KEYS = list(range(6))  # small key space forces collisions

change_st = st.fixed_dictionaries(
    {
        "op": st.sampled_from(["INSERT", "MODIFY", "REMOVE"]),
        "seq": st.integers(min_value=0, max_value=9),
        "pk": st.sampled_from(KEYS),
        "val": st.integers(min_value=-100, max_value=100),
    }
)


def reference_merge(base: dict, batch: list) -> dict:
    """Model: last change per key wins (seq desc, and among equal seq
    the one merge_changes's row_number picks — ties broken by keeping
    ANY single change; we avoid ties by deduping (pk, seq) below)."""
    state = dict(base)
    last = {}
    for ch in batch:
        cur = last.get(ch["pk"])
        if cur is None or ch["seq"] > cur["seq"]:
            last[ch["pk"]] = ch
    for pk, ch in last.items():
        if ch["op"] == "REMOVE":
            state.pop(pk, None)
        else:
            state[pk] = ch["val"]
    return state


def dedupe_ties(batch: list) -> list:
    """Keep one change per (pk, seq) — equal-seq ties are resolved by
    an engine-internal row order the model can't predict; the CONTRACT
    only promises a deterministic winner per order_cols value."""
    seen = {}
    for ch in batch:
        seen[(ch["pk"], ch["seq"])] = ch
    return list(seen.values())


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(batch=st.lists(change_st, min_size=0, max_size=25))
def test_merge_matches_reference_model(spark, batch):
    batch = dedupe_ties(batch)
    base_rows = [Row(pk=k, val=1000 + k) for k in KEYS[:4]]
    base = spark.createDataFrame(base_rows)
    expected = reference_merge({r.pk: r.val for r in base_rows}, batch)

    if not batch:
        return  # empty-batch merge is exercised in test_table.py
    changes = spark.createDataFrame([Row(**c) for c in batch])
    merged = merge_changes(base, changes, keys=["pk"], order_cols=("seq",))
    got = {r.pk: r.val for r in merged.collect()}
    assert got == expected

    # idempotency (A10): re-applying the same batch converges
    again = merge_changes(merged, changes, keys=["pk"], order_cols=("seq",))
    assert {r.pk: r.val for r in again.collect()} == expected

    # order independence: the batch arriving in reverse row order
    # must produce the same state (LWW is keyed on seq, not arrival)
    rev = spark.createDataFrame([Row(**c) for c in reversed(batch)])
    merged_rev = merge_changes(base, rev, keys=["pk"], order_cols=("seq",))
    assert {r.pk: r.val for r in merged_rev.collect()} == expected


def test_merge_schema_evolution_and_refusals(spark):
    """mergeSchema MERGE (VERDICT r6 #7): additive columns + Iceberg
    widenings evolve; everything else refuses loudly."""
    import pytest
    from pyspark.sql import functions as F

    from dynamodb_zero_etl_s3tables_spark.table.merge import (
        SchemaEvolutionError,
        merge_into,
    )

    target = spark.createDataFrame(
        [(1, 10, 1.0), (2, 20, 2.0)], "pk long, v int, price double"
    )
    source = spark.createDataFrame(
        [(2, 3000000000, 0.5), (9, 3000000001, 0.25)],
        "pk long, v long, discount double",
    )
    sets = {"v": F.col("s.v"), "discount": F.col("s.discount")}
    ins = {"pk": F.col("pk"), "v": F.col("v"), "discount": F.col("discount")}

    # strict default: assigning an unknown column refuses, names it
    with pytest.raises(SchemaEvolutionError, match="discount.*merge_schema"):
        merge_into(target, source, [("pk", "pk")],
                   matched=[("update", None, sets)], insert_values=ins)

    out = merge_into(target, source, [("pk", "pk")],
                     matched=[("update", None, sets)], insert_values=ins,
                     merge_schema=True)
    rows = {r.pk: r for r in out.collect()}
    assert dict(out.dtypes)["v"] == "bigint"          # int -> bigint widened
    assert rows[1].discount is None                   # added col NULL on untouched
    assert rows[2].v == 3000000000 and rows[2].discount == 0.5
    assert rows[9].price is None and rows[9].discount == 0.25

    # non-promotable overlap (double -> string) refuses
    bad = spark.createDataFrame([(2, "cheap")], "pk long, price string")
    with pytest.raises(SchemaEvolutionError, match="type conflict.*price"):
        merge_into(target, bad, [("pk", "pk")],
                   matched=[("update", None, {"price": F.col("s.price")})],
                   merge_schema=True)


# -- r8: two-writer commit interleaving (VERDICT r7 #8) -----------------------
# The optimistic-concurrency law (A8 — the Lambda's PolicyHashCondition,
# reference lambda/catalog-policy-handler.js:60,68) under REAL thread
# interleaving: two writers race the same expected version; exactly one
# commit survives, the loser gets CommitConflictError, and the survivor
# manifest is the winner's — never a silent merge of both.


def test_two_interleaved_writers_exactly_one_survives(spark, tmp_path):
    import threading

    from dynamodb_zero_etl_s3tables_spark.spec import TableSpec
    from dynamodb_zero_etl_s3tables_spark.table.catalog import Catalog
    from dynamodb_zero_etl_s3tables_spark.table.manifest import (
        CommitConflictError,
    )

    for trial in range(5):  # repeated: interleavings vary per run
        t = Catalog(spark, str(tmp_path / f"wh{trial}")).create_table(
            TableSpec(namespace="ns", name="race", key_columns=("pk",))
        )
        t.bootstrap(
            spark.createDataFrame([(1, "A"), (2, "B")], "pk long, status string")
        )
        barrier = threading.Barrier(2)
        outcomes: dict[str, BaseException | None] = {}

        def writer(tag: str) -> None:
            df = spark.createDataFrame(
                [("MODIFY", 3, f"from-{tag}", 1, 1)],
                "op string, pk long, status string, ts long, seq long",
            )
            barrier.wait()  # maximize check/swap overlap
            try:
                t.apply_changes(df)
                outcomes[tag] = None
            except BaseException as exc:  # noqa: BLE001 — recorded, asserted below
                outcomes[tag] = exc

        threads = [
            threading.Thread(target=writer, args=(tag,)) for tag in ("w1", "w2")
        ]
        for th in threads:
            th.start()
        for th in threads:
            th.join(120)
        errs = {k: v for k, v in outcomes.items() if v is not None}
        assert len(outcomes) == 2 and len(errs) == 1, (
            f"trial {trial}: exactly one writer must lose, got {outcomes}"
        )
        assert isinstance(next(iter(errs.values())), CommitConflictError), errs
        # survivor manifest is consistent: v2, exactly the winner's row
        winner = next(k for k, v in outcomes.items() if v is None)
        assert t.version == 2
        rows = {r.pk: r.status for r in t.read().collect()}
        assert rows == {1: "A", 2: "B", 3: f"from-{winner}"}, rows
