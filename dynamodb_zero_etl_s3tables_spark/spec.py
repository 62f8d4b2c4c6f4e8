"""Table / source specifications + synth-time validation.

Mirrors the reference's control-plane preconditions (SURVEY.md A1/A2):
the construct rejects a source table without an explicit physical name
(reference src/dynamodb-zero-etl-s3tables.ts:57-61) and without
point-in-time recovery (":63-66") *before* provisioning anything.
The engine likewise validates specs before any Spark job runs.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field


@dataclass(frozen=True)
class SourceSpec:
    """A keyed source table (the DynamoDB-table analog).

    ``pitr_enabled`` is the full-snapshot capability flag: without it a
    bootstrap export (reference ts:131-144, ExportTableToPointInTime)
    is impossible, so the pipeline must refuse to start.
    """

    table_name: str | None
    key_columns: tuple[str, ...]
    pitr_enabled: bool = True

    def validate(self) -> None:
        # A1 analog (reference ts:57-61): explicit physical name required.
        if not self.table_name or not str(self.table_name).strip():
            raise ValueError(
                "DynamoDB table must have an explicit tableName set. "
                "Auto-generated table names are not supported."
            )
        # A2 analog (reference ts:63-66): PITR required for bootstrap.
        if not self.pitr_enabled:
            raise ValueError(
                "DynamoDB table must have Point-in-Time Recovery (PITR) "
                "enabled for zero-ETL integration."
            )
        if not self.key_columns:
            raise ValueError("source table must declare at least one key column")


_IDENT = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")


def sanitize_identifier(name: str) -> str:
    """Strip non-alphanumerics -- the reference's Sid-prefix sanitizer
    (``replace(/[^a-zA-Z0-9]/g, '')``, reference ts:74)."""
    return re.sub(r"[^a-zA-Z0-9]", "", name)


@dataclass(frozen=True)
class TableSpec:
    """Target table spec: namespace/table hierarchy + layout knobs.

    Maps the reference's S3 Tables bucket -> namespace -> table
    hierarchy (reference ts:93,102) and the Iceberg maintenance knobs
    (``unreferencedFileRemoval``, reference README.md:129-137).
    """

    namespace: str
    name: str
    key_columns: tuple[str, ...]
    partition_columns: tuple[str, ...] = ()
    # LWW ordering columns for CDC merge (B6): change timestamp + tiebreak.
    order_columns: tuple[str, ...] = ("ts", "seq")
    # Iceberg sort-order analog: writes range-cluster rows on these
    # columns so per-file min/max stats are tight and `scan` can skip
    # files. Empty = no clustering (stats recorded but rarely selective).
    sort_columns: tuple[str, ...] = ()
    # Iceberg Puffin bloom-filter analog: writes record a per-file
    # bloom over these columns' values so `scan` can skip files on
    # EQUALITY predicates even where min/max ranges overlap (the
    # high-cardinality point-lookup case sort_columns doesn't cover).
    # int/string columns only; sized ~16 bits/distinct value at write.
    bloom_columns: tuple[str, ...] = ()
    # Delta-invariant / ANSI CHECK analog: SQL boolean expressions a
    # commit's rows must satisfy. Evaluated by the write job itself
    # (an Observation on the write — no second pass); any FALSE row
    # aborts the commit before the manifest references it. ANSI
    # semantics: NULL/unknown passes. MoR delta layers ("merge-mor")
    # are exempt (tombstones are not table rows); their compaction,
    # which materializes merged rows, enforces.
    check_constraints: tuple[str, ...] = ()
    # Delta generated-columns analog: (column, sql_expression) pairs.
    # A write that OMITS the column gets it computed from the
    # expression (same job, pure projection); a write that SUPPLIES
    # it is validated row-by-row via a null-safe `<=>` constraint on
    # the write Observation — a mismatch aborts the commit before the
    # manifest references it. Declaration order is compute order, so
    # a later generated column may reference an earlier one.
    generated_columns: tuple[tuple[str, str], ...] = ()
    # maintenance knobs (reference README.md:134-135 defaults 10/30 days)
    unreferenced_days: int = 10
    noncurrent_days: int = 30
    properties: dict = field(default_factory=dict)

    def validate(self) -> None:
        for part, label in ((self.namespace, "namespace"), (self.name, "table name")):
            if not part or not _IDENT.match(part):
                raise ValueError(
                    f"invalid {label} {part!r}: must match [A-Za-z_][A-Za-z0-9_]*"
                )
        if not self.key_columns:
            raise ValueError("table must declare at least one key column")
        if not self.order_columns:
            # the CDC merge's LWW window needs at least one ordering
            # column; an empty tuple would fail deep inside Spark
            # ('window requires ordering') instead of at synth time —
            # the same A1/A2 explicit-declaration discipline
            raise ValueError(
                "table must declare at least one order column (the "
                "last-writer-wins ordering for CDC merges)"
            )
        dup = set(self.key_columns) & set(self.partition_columns)
        if dup:
            raise ValueError(f"columns cannot be both key and partition: {sorted(dup)}")
        if self.unreferenced_days < 1 or self.noncurrent_days < 1:
            raise ValueError("maintenance retention days must be >= 1")

    @property
    def qualified_name(self) -> str:
        return f"{self.namespace}.{self.name}"
