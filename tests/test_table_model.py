"""Model-based random-walk test of the ManagedTable feature surface.

A seeded random sequence of table operations (merge / merge-on-read /
rollback / tag / branch-commit / fast-forward / delete-branch / rename
/ compact / vacuum / expire / clone) runs against BOTH the real engine
and a plain-Python dict model; after every step the engine's read()
must equal the model, and retained history versions must stay
readable. This is where FEATURE INTERACTIONS break (rename then
rollback; branch pending then vacuum; clone then diverge) — each op
alone has a golden test, the walk covers their products. Seeds are
fixed, so failures reproduce exactly."""

import random
import time

import pytest
from pyspark.sql import Row

from dynamodb_zero_etl_s3tables_spark.spec import TableSpec
from dynamodb_zero_etl_s3tables_spark.table.manifest import (
    CommitConflictError,
    ManagedTable,
)

KEYS = list(range(1, 13))


def spec(name):
    return TableSpec(
        namespace="mdl", name=name, key_columns=("pk",), order_columns=("seq",)
    )


class Model:
    """Reference semantics: dict state + linear history of dict states."""

    def __init__(self):
        self.state = {}      # pk -> (status, price)
        self.col = "status"  # current name of the renamable column
        self.history = {}    # version -> (state snapshot, col name)
        self.v = 0

    def commit(self, new_state):
        self.v += 1
        self.state = dict(new_state)
        self.history[self.v] = (dict(new_state), self.col)


def engine_state(t):
    rows = t.read().collect()
    cols = set(t.read().columns) - {"pk", "price"}
    (col,) = cols
    return {r.pk: (r[col], r.price) for r in rows}, col


def apply_batch(model_state, batch):
    out = dict(model_state)
    for op, _seq, pk, status, price in batch:
        if op == "REMOVE":
            out.pop(pk, None)
        else:
            out[pk] = (status, price)
    return out


def make_batch(rng, seq):
    # per-row seqs are unique and increasing, so in-batch LWW (the
    # engine's max-seq rule) equals in-order application (the model's)
    n = rng.randint(1, 4)
    batch = []
    for i in range(n):
        pk = rng.choice(KEYS)
        row_seq = seq * 100 + i
        if rng.random() < 0.25:
            batch.append(("REMOVE", row_seq, pk, "x", 0.0))
        else:
            batch.append(
                ("MODIFY", row_seq, pk, f"s{row_seq}", float(rng.randint(1, 99)))
            )
    return batch


@pytest.mark.parametrize("seed", [7, 23, 91])
def test_random_walk_matches_model(spark, warehouse, tmp_path, seed):
    rng = random.Random(seed)
    t = ManagedTable(spark, warehouse, spec(f"walk{seed}"))
    model = Model()

    base = {pk: ("old", float(pk)) for pk in KEYS}
    t.bootstrap(
        spark.createDataFrame(
            [Row(pk=k, status=v[0], price=v[1]) for k, v in base.items()]
        )
    )
    model.commit(base)

    def batch_df(batch, col):
        return spark.createDataFrame(
            [
                Row(
                    **{
                        "op": op,
                        "seq": seq,
                        "pk": pk,
                        col: status,
                        "price": price,
                    }
                )
                for op, seq, pk, status, price in batch
            ]
        )

    seq = 0
    tagged = {}
    clone_n = 0
    for step in range(24):
        op = rng.choice(
            [
                "merge", "merge", "merge_mor", "rollback", "tag",
                "branch", "rename", "compact", "vacuum", "expire", "clone",
                "stage",
            ]
        )
        seq += 1
        if op == "merge" or op == "merge_mor":
            batch = make_batch(rng, seq)
            t.apply_changes(
                batch_df(batch, model.col),
                strategy="merge-on-read" if op == "merge_mor" else "copy-on-write",
            )
            model.commit(apply_batch(model.state, batch))
        elif op == "rollback":
            # pick a retained version from the engine's own history
            versions = [s.version for s in t.history() if not s.staged]
            target = rng.choice(versions)
            if target in model.history:
                t.rollback_to(target)
                st, col = model.history[target]
                model.col = col
                model.commit(st)
            # else: model lost track (can't happen — history is shared)
        elif op == "tag":
            name = f"tag{seq}"
            t.create_tag(name)
            tagged[name] = (dict(model.state), model.col, t.version)
        elif op == "stage":
            # WAP: stage, audit the invisible snapshot, coin-flip publish
            batch = make_batch(rng, seq)
            staged_v = t.stage_changes(batch_df(batch, model.col))
            expect = apply_batch(model.state, batch)
            got, _ = engine_state(t)
            assert got == model.state, f"step {step}: stage leaked into main"
            audited = {
                r.pk: (r[model.col], r.price)
                for r in t.read(version=staged_v).collect()
            }
            assert audited == expect, f"step {step}: staged audit view wrong"
            if rng.random() < 0.5:
                t.publish(staged_v)
                model.commit(expect)
            else:
                t.abort_staged(staged_v)
        elif op == "branch":
            # two stacked commits, audit, then flip a coin on publish
            name = f"br{seq}"
            t.create_branch(name)
            b1, b2 = make_batch(rng, seq), make_batch(rng, seq + 1000)
            try:
                t.apply_changes_to_branch(name, batch_df(b1, model.col))
            except CommitConflictError:
                t.delete_branch(name)  # stale fork (post-rollback) — abort
                continue
            t.apply_changes_to_branch(name, batch_df(b2, model.col))
            inter = apply_batch(model.state, b1)
            merged = apply_batch(inter, b2)
            # main must still be the model state while pending
            got, _ = engine_state(t)
            assert got == model.state, f"step {step}: branch leaked into main"
            if rng.random() < 0.5:
                t.fast_forward(name)
                # the published chain is two snapshots: intermediate + head
                model.state = dict(merged)
                model.v = t.version
                model.history[model.v - 1] = (dict(inter), model.col)
                model.history[model.v] = (dict(merged), model.col)
            else:
                t.delete_branch(name)
        elif op == "rename":
            new = f"c{seq}"
            try:
                t.rename_column(model.col, new)
            except ValueError:
                continue  # MoR chain pending — legal refusal
            model.col = new
            model.commit(model.state)  # rename commits a (same-data) version
        elif op == "compact":
            t.compact()
            model.commit(model.state)
        elif op == "vacuum":
            t.vacuum(unreferenced_days=0, noncurrent_days=0, now=time.time() + 86400)
        elif op == "expire":
            t.expire_snapshots(retain_last=rng.randint(2, 4))
        elif op == "clone":
            clone_n += 1
            c = t.clone_to(str(tmp_path / f"cw{clone_n}"))
            got, col = engine_state(c)
            assert got == model.state and col == model.col, (
                f"step {step}: clone state diverged"
            )
        # invariant: engine state == model state after every step
        got, col = engine_state(t)
        assert got == model.state, f"step {step} ({op}): state diverged"
        assert col == model.col, f"step {step} ({op}): column name diverged"
        # invariant: every tag still resolves to its pinned state
        for name, (st, col0, _v) in tagged.items():
            if name in t.list_tags():
                rows = t.read(tag=name).collect()
                pinned = {r.pk: (r[col0] if col0 in rows[0].__fields__ else r[model.col], r.price) for r in rows} if rows else {}
                # tags pin pre-rename names for pre-rename snapshots
                assert {k: v for k, v in pinned.items()} == st, (
                    f"step {step}: tag {name} drifted"
                )
        audit = t.verify_integrity()
        assert audit["ok"], f"step {step}: integrity broke: {audit}"
