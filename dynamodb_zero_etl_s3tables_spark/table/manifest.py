"""Manifest-committed Parquet tables: the engine's Iceberg-semantics
layer (SURVEY.md §2 B8-B11, §4.3; no Iceberg/Delta jars available, so
the *semantics* the reference provisions are implemented directly).

Mapping to the reference:
* atomic commit = metadata-pointer swap  -> write temp manifest,
  ``os.replace`` (the GetTableMetadataLocation/
  UpdateTableMetadataLocation pair, reference ts:99) [B9]
* optimistic concurrency -> ``expected_version`` check before swap
  (the Lambda's PolicyHashCondition, reference lambda :46,:60) [A8]
* namespace/table auto-create on first write (reference ts:92,98) [B8]
* snapshot history / time travel -> every commit keeps its data dir;
  ``read(version=...)`` reads an old snapshot [B10]
* maintenance -> ``vacuum`` prunes snapshots + orphan dirs per the
  unreferencedDays/noncurrentDays knobs (reference README.md:129-137)
  [B11]
* schema evolution -> additive-only struct union, conflict = error
  (the glue:CreateTable/UpdateTable grant, reference ts:110-117) [B4]

Each snapshot is a complete copy-on-write data directory: merge
writes survivors + upserts as new files, never mutating old ones —
the same copy-on-write model Iceberg CoW tables use. At 100 TB with
partitioned tables, merge would rewrite only touched partitions
(partition-pruned anti-join); the manifest schema already records
partition columns to support that.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from dynamodb_zero_etl_s3tables_spark.spec import TableSpec
from dynamodb_zero_etl_s3tables_spark.table.merge import (
    SchemaEvolutionError,
    merge_changes,
)


class CommitConflictError(RuntimeError):
    """Raised when the manifest version moved under us (A8)."""


@dataclass
class Snapshot:
    version: int
    data_dir: str
    committed_at: float
    #: rows in the files THIS commit wrote (a pruned merge writes only
    #: touched partitions, so this is not necessarily the table total)
    row_count: int
    schema_json: str
    operation: str
    #: partitioned tables: [{"values": {col: str|None}, "dir": path}].
    #: Entries may point into EARLIER snapshots' data dirs — a pruned
    #: merge carries untouched partition dirs forward (copy-on-write
    #: at partition granularity, the Iceberg CoW model). None for
    #: unpartitioned tables.
    partitions: list[dict[str, Any]] | None = None

    def to_dict(self) -> dict[str, Any]:
        return self.__dict__.copy()

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "Snapshot":
        return cls(**d)


@dataclass
class Manifest:
    spec_namespace: str
    spec_name: str
    key_columns: list[str]
    partition_columns: list[str]
    snapshots: list[Snapshot] = field(default_factory=list)

    @property
    def current(self) -> Snapshot | None:
        return self.snapshots[-1] if self.snapshots else None

    @property
    def version(self) -> int:
        return self.current.version if self.current else 0


def _evolve_schema(old: T.StructType, new: T.StructType) -> T.StructType:
    """B4: additive-only evolution. New columns append; type changes
    and drops are rejected with a descriptive error."""
    old_by_name = {f.name: f for f in old.fields}
    for f in new.fields:
        prev = old_by_name.get(f.name)
        if prev is not None and prev.dataType != f.dataType:
            raise SchemaEvolutionError(
                f"type conflict for column {f.name!r}: "
                f"{prev.dataType.simpleString()} -> {f.dataType.simpleString()}"
            )
    missing = [f.name for f in old.fields if f.name not in {x.name for x in new.fields}]
    if missing:
        raise SchemaEvolutionError(
            f"columns missing from incoming data (drops are not additive): {missing}"
        )
    added = [f for f in new.fields if f.name not in old_by_name]
    return T.StructType(list(old.fields) + added)


class ManagedTable:
    """A keyed, manifest-committed Parquet table."""

    def __init__(self, spark: SparkSession, warehouse: str, spec: TableSpec):
        spec.validate()
        self.spark = spark
        self.spec = spec
        self.root = Path(warehouse) / spec.namespace / spec.name
        self.manifest_path = self.root / "manifest.json"
        #: B13: metrics of the most recent commit (None before any)
        self.last_commit_metrics = None

    # -- manifest I/O -------------------------------------------------------

    def _read_manifest(self) -> Manifest:
        if not self.manifest_path.exists():
            # B8/A9: get-or-default — missing table starts empty
            return Manifest(
                spec_namespace=self.spec.namespace,
                spec_name=self.spec.name,
                key_columns=list(self.spec.key_columns),
                partition_columns=list(self.spec.partition_columns),
            )
        raw = json.loads(self.manifest_path.read_text())
        snaps = [Snapshot.from_dict(s) for s in raw.pop("snapshots")]
        return Manifest(snapshots=snaps, **raw)

    def _write_manifest(self, m: Manifest, expected_version: int) -> None:
        """B9+A8: atomic pointer swap with optimistic version check."""
        self.root.mkdir(parents=True, exist_ok=True)
        current = self._read_manifest().version
        if current != expected_version:
            raise CommitConflictError(
                f"concurrent commit: manifest at v{current}, expected v{expected_version}"
            )
        payload = {
            "spec_namespace": m.spec_namespace,
            "spec_name": m.spec_name,
            "key_columns": m.key_columns,
            "partition_columns": m.partition_columns,
            "snapshots": [s.to_dict() for s in m.snapshots],
        }
        tmp = self.manifest_path.with_suffix(f".tmp-{uuid.uuid4().hex}")
        tmp.write_text(json.dumps(payload, indent=2))
        os.replace(tmp, self.manifest_path)  # atomic on POSIX

    # -- reads --------------------------------------------------------------

    def exists(self) -> bool:
        return self.manifest_path.exists() and bool(self._read_manifest().snapshots)

    @property
    def version(self) -> int:
        return self._read_manifest().version

    def read(self, version: int | None = None) -> DataFrame:
        """Current snapshot, or time travel to ``version`` (B10)."""
        m = self._read_manifest()
        if not m.snapshots:
            raise FileNotFoundError(f"table {self.spec.qualified_name} has no snapshots")
        if version is None:
            snap = m.current
        else:
            by_v = {s.version: s for s in m.snapshots}
            if version not in by_v:
                raise ValueError(
                    f"version {version} not in retained history "
                    f"{sorted(by_v)} of {self.spec.qualified_name}"
                )
            snap = by_v[version]
        schema = T.StructType.fromJson(json.loads(snap.schema_json))
        if snap.partitions is None:
            return self.spark.read.schema(schema).parquet(snap.data_dir)
        return self._read_partition_entries(snap.partitions, schema)

    def _read_partition_entries(
        self, entries: list[dict[str, Any]], schema: T.StructType
    ) -> DataFrame:
        """Assemble a snapshot from per-partition dirs: read each dir
        with the file schema (missing evolved columns surface as NULL),
        re-attach the partition-column values from the manifest entry.
        One relation per live partition — bounded by partition count,
        which is metadata-scale by design."""
        from pyspark.sql import functions as F

        pcols = list(self.spec.partition_columns)
        by_name = {f.name: f for f in schema.fields}
        file_schema = T.StructType([f for f in schema.fields if f.name not in pcols])
        parts: list[DataFrame] = []
        for ent in entries:
            df = self.spark.read.schema(file_schema).parquet(ent["dir"])
            for pc in pcols:
                raw = ent["values"][pc]
                lit = (
                    F.lit(None).cast(by_name[pc].dataType)
                    if raw is None
                    else F.lit(raw).cast(by_name[pc].dataType)
                )
                df = df.withColumn(pc, lit)
            parts.append(df.select(*[f.name for f in schema.fields]))
        if not parts:
            return self.spark.createDataFrame([], schema)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def _enumerate_partition_dirs(self, data_dir: Path) -> list[dict[str, Any]]:
        """Walk the hive layout ``col1=v/col2=v/…`` one level per
        partition column; values are unescaped dir-name strings
        (``__HIVE_DEFAULT_PARTITION__`` -> None)."""
        from urllib.parse import unquote

        pcols = list(self.spec.partition_columns)
        entries: list[dict[str, Any]] = []

        def walk(cur: Path, depth: int, values: dict[str, Any]) -> None:
            if depth == len(pcols):
                entries.append({"values": dict(values), "dir": str(cur)})
                return
            prefix = pcols[depth] + "="
            for child in sorted(cur.iterdir()):
                if child.is_dir() and child.name.startswith(prefix):
                    raw = unquote(child.name[len(prefix):])
                    values[pcols[depth]] = (
                        None if raw == "__HIVE_DEFAULT_PARTITION__" else raw
                    )
                    walk(child, depth + 1, values)

        if data_dir.exists():
            walk(data_dir, 0, {})
        return entries

    def history(self) -> list[Snapshot]:
        return list(self._read_manifest().snapshots)

    # -- writes -------------------------------------------------------------

    def _write_snapshot(
        self,
        df: DataFrame,
        operation: str,
        carry_entries: list[dict[str, Any]] | None = None,
    ) -> None:
        """Write ``df``'s files as snapshot N+1. For partitioned
        tables, ``carry_entries`` are untouched partition dirs from the
        previous snapshot, referenced (not copied) by the new one."""
        from dynamodb_zero_etl_s3tables_spark.metrics import (
            CommitMetrics,
            observe_rows,
        )

        t0 = time.perf_counter()
        m = self._read_manifest()
        expected = m.version
        if m.current is not None:
            old_schema = T.StructType.fromJson(json.loads(m.current.schema_json))
            evolved = _evolve_schema(old_schema, df.schema)
            # fill columns added by evolution so old snapshots stay readable
            for f in evolved.fields:
                if f.name not in df.columns:
                    from pyspark.sql import functions as F

                    df = df.withColumn(f.name, F.lit(None).cast(f.dataType))
            df = df.select(*[f.name for f in evolved.fields])
        data_dir = self.root / "data" / f"v{expected + 1}-{uuid.uuid4().hex[:8]}"
        # B13: row count observed by the write job itself — no second job
        df, obs = observe_rows(df, name=operation)
        writer = df.write.mode("overwrite")
        partitions: list[dict[str, Any]] | None = None
        if self.spec.partition_columns:
            writer = writer.partitionBy(*self.spec.partition_columns)
        writer.parquet(str(data_dir))
        if self.spec.partition_columns:
            partitions = self._enumerate_partition_dirs(data_dir) + list(
                carry_entries or []
            )
        n = int(obs.get["row_count"])
        m.snapshots.append(
            Snapshot(
                version=expected + 1,
                data_dir=str(data_dir),
                committed_at=time.time(),
                row_count=n,
                schema_json=json.dumps(df.schema.jsonValue()),
                operation=operation,
                partitions=partitions,
            )
        )
        self._write_manifest(m, expected_version=expected)
        self.last_commit_metrics = CommitMetrics(
            operation=operation,
            row_count=n,
            elapsed_sec=time.perf_counter() - t0,
        )

    def bootstrap(self, df: DataFrame) -> None:
        """B1: initial full-snapshot load (PITR-export analog)."""
        self._write_snapshot(df, operation="bootstrap")

    def overwrite(self, df: DataFrame) -> None:
        self._write_snapshot(df, operation="overwrite")

    def apply_changes(
        self, changes: DataFrame, order_cols: tuple[str, ...] | None = None
    ) -> None:
        """B5-B7: merge a change-log batch into the table. Idempotent
        (A10): re-applying the same batch converges to the same state.

        Partitioned tables take the PRUNED path: only partitions the
        change batch touches are read, merged, and rewritten; untouched
        partition dirs carry forward by reference. At 100 TB this is
        the difference between rewriting the touched 1% and the whole
        table. Constraint (documented engine contract): partition
        values must be stable per key — a "partition move" must be
        expressed as REMOVE(old partition) + INSERT(new partition),
        which the DynamoDB stream model already does for key-derived
        partitions.
        """
        order = order_cols or self.spec.order_columns
        snap = self._read_manifest().current
        if (
            self.spec.partition_columns
            and snap is not None
            and snap.partitions is not None
        ):
            self._apply_changes_pruned(changes, order)
            return
        base = self.read()
        merged = merge_changes(
            base,
            changes,
            keys=self.spec.key_columns,
            order_cols=order,
        )
        self._write_snapshot(merged, operation="merge")

    def _apply_changes_pruned(
        self, changes: DataFrame, order_cols: tuple[str, ...]
    ) -> None:
        snap = self._read_manifest().current
        pcols = list(self.spec.partition_columns)
        schema = T.StructType.fromJson(json.loads(snap.schema_json))
        # touched partition values: metadata-scale (distinct partition
        # tuples in the batch), the one deliberate driver-side collect
        touched_rows = changes.select(*pcols).distinct().collect()
        touched = {
            tuple(None if r[pc] is None else str(r[pc]) for pc in pcols)
            for r in touched_rows
        }
        touched_entries = [
            e
            for e in snap.partitions
            if tuple(e["values"][pc] for pc in pcols) in touched
        ]
        carry = [
            e
            for e in snap.partitions
            if tuple(e["values"][pc] for pc in pcols) not in touched
        ]
        base_touched = self._read_partition_entries(touched_entries, schema)
        merged = merge_changes(
            base_touched,
            changes,
            keys=self.spec.key_columns,
            order_cols=order_cols,
        )
        self._write_snapshot(merged, operation="merge", carry_entries=carry)

    # -- maintenance --------------------------------------------------------

    def vacuum(
        self,
        unreferenced_days: int | None = None,
        noncurrent_days: int | None = None,
        now: float | None = None,
    ) -> dict[str, int]:
        """B11: drop snapshots older than ``noncurrent_days`` (keeping
        the current one) and delete data dirs no retained snapshot
        references after ``unreferenced_days`` — the engine's
        ``unreferencedFileRemoval`` (reference README.md:129-137)."""
        import shutil

        unref = self.spec.unreferenced_days if unreferenced_days is None else unreferenced_days
        noncur = self.spec.noncurrent_days if noncurrent_days is None else noncurrent_days
        now = time.time() if now is None else now
        m = self._read_manifest()
        if not m.snapshots:
            return {"snapshots_dropped": 0, "dirs_deleted": 0}
        expected = m.version
        cutoff = now - noncur * 86400
        keep = [
            s
            for s in m.snapshots
            if s is m.current or s.committed_at >= cutoff
        ]
        dropped = len(m.snapshots) - len(keep)
        m.snapshots = keep
        self._write_manifest(m, expected_version=expected)
        # reference-count at the top-level snapshot-dir granularity: a
        # pruned merge's snapshot references SUBDIRS of earlier
        # snapshots' dirs, so a dir stays as long as any retained
        # snapshot points anywhere inside it
        data_root = self.root / "data"
        referenced: set[str] = set()
        for s in keep:
            referenced.add(Path(s.data_dir).name)
            for ent in s.partitions or []:
                try:
                    referenced.add(Path(ent["dir"]).relative_to(data_root).parts[0])
                except ValueError:
                    pass  # entry outside data_root — never collected
        deleted = 0
        unref_cutoff = now - unref * 86400
        if data_root.exists():
            for child in data_root.iterdir():
                if child.name not in referenced and child.stat().st_mtime < unref_cutoff:
                    shutil.rmtree(child)
                    deleted += 1
        return {"snapshots_dropped": dropped, "dirs_deleted": deleted}
