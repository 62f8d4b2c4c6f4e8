"""Pipeline orchestration (SURVEY.md §2 A5, §3.1): the engine's
analog of the reference's dependency-ordered resource graph.

The reference constructor declares 7+ resources with explicit
dependency edges so CloudFormation deploys them in topological order
(reference ts:77-221, edges :208,:217-221; "correct dependency
ordering", README.md:166). Here a Pipeline is a DAG of named Stages;
``run()`` executes a topological order, records per-stage metrics
(B13), and logs structured progress (B14). Stages are idempotent by
contract (A10): re-running a completed pipeline converges.

The canonical zero-ETL pipeline (``Pipeline.zero_etl``) mirrors
§3.3's lifecycle: validate -> create namespace -> bootstrap snapshot
-> apply change batches -> register SQL view.
"""

from __future__ import annotations

import logging
import time
from collections.abc import Callable, Sequence
from dataclasses import dataclass, field
from graphlib import TopologicalSorter
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from dynamodb_zero_etl_s3tables_spark.spec import SourceSpec, TableSpec
from dynamodb_zero_etl_s3tables_spark.table.catalog import Catalog

logger = logging.getLogger("ddb_zero_etl.pipeline")


@dataclass
class Stage:
    name: str
    run: Callable[[dict[str, Any]], Any]
    depends_on: tuple[str, ...] = ()


@dataclass
class Pipeline:
    stages: list[Stage] = field(default_factory=list)
    metrics: dict[str, dict[str, Any]] = field(default_factory=dict)

    def add(self, stage: Stage) -> "Pipeline":
        if any(s.name == stage.name for s in self.stages):
            raise ValueError(f"duplicate stage {stage.name!r}")
        self.stages.append(stage)
        return self

    def order(self) -> list[str]:
        """A5: topological execution order from the dependency edges.
        A dependency naming a stage that was never added refuses HERE
        (TopologicalSorter would happily order the phantom node and
        run() would die on a bare KeyError instead — r8 review)."""
        known = {s.name for s in self.stages}
        for s in self.stages:
            missing = set(s.depends_on) - known
            if missing:
                raise ValueError(
                    f"stage {s.name!r} depends on undefined stage(s) "
                    f"{sorted(missing)} (defined: {sorted(known)})"
                )
        ts = TopologicalSorter(
            {s.name: set(s.depends_on) for s in self.stages}
        )
        return list(ts.static_order())

    def run(self, context: dict[str, Any] | None = None) -> dict[str, Any]:
        ctx: dict[str, Any] = dict(context or {})
        by_name = {s.name: s for s in self.stages}
        for name in self.order():
            stage = by_name[name]
            t0 = time.perf_counter()
            logger.info("stage %s: start", name)
            result = stage.run(ctx)
            elapsed = time.perf_counter() - t0
            ctx[name] = result
            self.metrics[name] = {"elapsed_sec": round(elapsed, 3)}
            logger.info("stage %s: done in %.3fs", name, elapsed)
        return ctx

    # -- the canonical zero-ETL pipeline (§3.3) -----------------------------

    @classmethod
    def zero_etl(
        cls,
        spark: SparkSession,
        catalog: Catalog,
        source: SourceSpec,
        target: TableSpec,
        snapshot: Callable[[SparkSession], DataFrame],
        change_batches: Sequence[Callable[[SparkSession], DataFrame]] = (),
    ) -> "Pipeline":
        """validate -> namespace -> bootstrap -> merges -> register."""
        p = cls()

        def validate(ctx):
            # A1/A2: synth-time preconditions before any job runs
            source.validate()
            target.validate()
            return True

        def create_namespace(ctx):
            catalog.create_namespace(target.namespace)  # B8
            return target.namespace

        def bootstrap(ctx):
            t = catalog.create_table(target)
            if not t.exists():  # A10: idempotent re-run skips the load
                t.bootstrap(snapshot(spark))  # B1
            return t.version

        def register(ctx):
            return catalog.refresh_view(target.qualified_name)  # C2

        p.add(Stage("validate", validate))
        p.add(Stage("create_namespace", create_namespace, ("validate",)))
        p.add(Stage("bootstrap", bootstrap, ("create_namespace",)))
        prev = "bootstrap"
        for i, batch in enumerate(change_batches):
            stage_name = f"merge_{i}"

            def merge(ctx, _batch=batch):
                t = catalog.table(target.qualified_name)
                t.apply_changes(_batch(spark))  # B5-B7
                return t.version

            p.add(Stage(stage_name, merge, (prev,)))
            prev = stage_name
        p.add(Stage("register_view", register, (prev,)))
        return p
