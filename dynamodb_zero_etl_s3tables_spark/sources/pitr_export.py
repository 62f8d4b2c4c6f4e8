"""DynamoDB PITR export-directory source (SURVEY.md §2 B1/B3).

A real ``dynamodb:ExportTableToPointInTime`` (the action the reference
grants at src/dynamodb-zero-etl-s3tables.ts:135) lands in S3 as::

    <prefix>/AWSDynamoDB/<exportId>/
        manifest-summary.json        # one JSON object: totals + pointers
        manifest-files.json          # NDJSON: one entry per data shard
        data/<shard>.json.gz         # gzipped NDJSON of {"Item": {...}}
                                     # (or .ion.gz text-Ion when the
                                     # export chose outputFormat=ION)

This module implements both sides of that contract:

* :func:`read_export` — manifest-driven reader: parse the summary,
  enumerate shards from ``manifest-files.json`` (metadata-scale,
  driver-side by design — one line per data file, exactly where
  Iceberg-style planning happens), then scan all shards in ONE
  distributed ``spark.read.text`` and decode attribute values with
  the B3 codec (:mod:`..functions.decode`). Gzip shards are not
  splittable, so scan parallelism equals shard count — which is why
  the export service shards aggressively and why the fixture writer
  below does too.
* :func:`write_export_fixture` — deterministic fixture writer used by
  tests and the oracle-checked query: encodes rows to the wire form
  entirely JVM-side (``to_json`` over typed structs; null attribute
  tags dropped by the JSON generator, matching the export format) and
  writes gzipped shards through Spark, then emits the two manifests.

No AWS SDK involved anywhere — this is the *file format* contract,
which is public and documented. Scope note (honest): the DATA scan is
a distributed ``spark.read.text`` (any Spark-readable store), but the
MANIFEST walk (find_export_dir / read_manifest / per-file existence
checks) is local-pathlib on the driver — pointing ``export_root`` at
an object-store URI needs those few metadata reads ported to the
Hadoop FileSystem API first (s3a paths would otherwise fail the local
``exists()`` probes, never the Spark scan).
"""

from __future__ import annotations

import json
import time
from pathlib import Path

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from dynamodb_zero_etl_s3tables_spark.functions.decode import decode_item_column

_EXPORT_SUBDIR = "AWSDynamoDB"


class ExportManifestError(ValueError):
    """The export directory violates its own manifest contract."""


# ---------------------------------------------------------------------------
# wire-form encoding helpers (JVM-side)
# ---------------------------------------------------------------------------

def av_s(col: Column) -> Column:
    """String attribute ``{"S": ...}``."""
    return F.struct(col.cast("string").alias("S"))


def av_n(col: Column) -> Column:
    """Number attribute ``{"N": "..."}`` — decimal-as-string wire form."""
    return F.struct(col.cast("string").alias("N"))


def av_bool(col: Column) -> Column:
    return F.struct(col.cast("boolean").alias("BOOL"))


def av_ss(col: Column) -> Column:
    """String-set attribute; the set invariant is the writer's job."""
    return F.struct(F.array_distinct(col).alias("SS"))


def av_null() -> Column:
    return F.struct(F.lit(True).alias("NULL"))


def items_to_wire(attrs: dict[str, Column]) -> Column:
    """``{"Item": {attr: {TAG: value}}}`` as one JSON string column.

    ``to_json`` drops null struct fields by default
    (``spark.sql.jsonGenerator.ignoreNullFields``), which is exactly
    the AttributeValue encoding: only the one populated type tag
    appears per attribute.
    """
    item = F.struct(*[c.alias(name) for name, c in attrs.items()])
    return F.to_json(F.struct(item.alias("Item")))


# ---------------------------------------------------------------------------
# fixture writer
# ---------------------------------------------------------------------------

def write_export_fixture(
    df_wire: DataFrame,
    export_root: str,
    export_id: str,
    table_arn: str = "arn:aws:dynamodb:local:000000000000:table/fixture",
    shards: int = 4,
    output_format: str = "DYNAMODB_JSON",
) -> str:
    """Write ``df_wire`` (single string column of ``{"Item":...}``
    lines — or, with ``output_format="ION"``, text-Ion lines the
    caller produced via :func:`..functions.ion.item_json_to_ion_udf`)
    as a PITR-shaped export under
    ``export_root/AWSDynamoDB/<export_id>/``. Returns the export dir.

    Shard writing is fully distributed (``repartition(shards)`` +
    gzipped text sink). Per-shard item counts for the manifest come
    from one distributed pass grouped by ``input_file_name`` — the
    only driver-side materialization is the manifest itself, which is
    metadata-scale (one row per shard) by construction.
    """
    export_dir = Path(export_root) / _EXPORT_SUBDIR / export_id
    data_dir = export_dir / "data"
    spark = df_wire.sparkSession
    (
        df_wire.toDF("line")
        .repartition(shards)
        .write.mode("overwrite")
        .option("compression", "gzip")
        .text(str(data_dir))
    )
    counts = (
        spark.read.text(str(data_dir))
        .groupBy(F.input_file_name().alias("f"))
        .count()
        .collect()
    )
    entries = []
    for r in sorted(counts, key=lambda r: r["f"]):
        # input_file_name() returns a URL-ENCODED file URI: unquote it
        # before pathlib work, or a space/%/non-ASCII char in the
        # export root crashes relative_to (or silently writes a wrong
        # dataFileS3Key the reader later rejects) — r8 review
        from urllib.parse import unquote as _unquote

        p = Path(_unquote(r["f"]).removeprefix("file:"))
        entries.append(
            {
                "itemCount": r["count"],
                "dataFileS3Key": str(p.relative_to(Path(export_root))),
                "etag": "fixture",
            }
        )
    with open(export_dir / "manifest-files.json", "w") as fh:
        for e in entries:
            fh.write(json.dumps(e) + "\n")
    summary = {
        "version": "2020-06-30",
        "exportArn": f"{table_arn}/export/{export_id}",
        "tableArn": table_arn,
        "exportTime": "2020-06-30T00:00:00.000Z",
        "startTime": "2020-06-30T00:00:00.000Z",
        "endTime": "2020-06-30T00:00:00.000Z",
        "outputFormat": output_format,
        "itemCount": sum(e["itemCount"] for e in entries),
        "manifestFilesS3Key": str(
            (export_dir / "manifest-files.json").relative_to(Path(export_root))
        ),
    }
    (export_dir / "manifest-summary.json").write_text(json.dumps(summary, indent=2))
    return str(export_dir)


# ---------------------------------------------------------------------------
# reader
# ---------------------------------------------------------------------------

def find_export_dir(export_root: str, export_id: str | None = None) -> Path:
    """Locate ``AWSDynamoDB/<exportId>`` under the root; with no id,
    pick the lexicographically last (export ids are time-prefixed, so
    last == newest — the bootstrap wants the most recent export)."""
    base = Path(export_root) / _EXPORT_SUBDIR
    if export_id is not None:
        d = base / export_id
        if not (d / "manifest-summary.json").exists():
            raise ExportManifestError(f"no manifest-summary.json under {d}")
        return d
    candidates = sorted(
        p for p in (base.iterdir() if base.exists() else [])
        if (p / "manifest-summary.json").exists()
    )
    if not candidates:
        raise ExportManifestError(f"no exports under {base}")
    return candidates[-1]


def read_manifest(export_dir: Path) -> tuple[dict, list[dict]]:
    summary = json.loads((export_dir / "manifest-summary.json").read_text())
    fmt = summary.get("outputFormat", "DYNAMODB_JSON")
    if fmt not in ("DYNAMODB_JSON", "ION"):
        raise ExportManifestError(
            f"unsupported outputFormat {fmt!r} (DYNAMODB_JSON or ION)"
        )
    files_path = export_dir / "manifest-files.json"
    if not files_path.exists():
        raise ExportManifestError(f"missing manifest-files.json under {export_dir}")
    entries = [
        json.loads(line)
        for line in files_path.read_text().splitlines()
        if line.strip()
    ]
    return summary, entries


def read_export(
    spark: SparkSession,
    export_root: str,
    fields: dict[str, str],
    export_id: str | None = None,
    depth: int = 3,
    validate_counts: bool = False,
) -> DataFrame:
    """B1: manifest-driven scan + B3 decode of a PITR export dir.

    ``fields`` maps attribute name -> decode kind (see
    ``functions.decode.KINDS``). ``validate_counts=True`` runs one
    extra count action and raises :class:`ExportManifestError` on a
    mismatch with ``manifest-summary.json`` — the integrity check a
    bootstrap should run once before committing the snapshot.

    Both export formats route here: ``outputFormat`` in the summary
    selects the line conversion — DYNAMODB_JSON lines feed the B3
    codec directly (JVM get_json_object), ION lines are converted to
    the same item-map JSON by the Arrow-batched Ion parser
    (:mod:`..functions.ion`) first. Everything after the item-map
    extraction is one shared path.
    """
    export_dir = find_export_dir(export_root, export_id)
    summary, entries = read_manifest(export_dir)
    root = Path(export_root)
    paths: list[str] = []
    for e in entries:
        key = e["dataFileS3Key"]
        p = root / key
        # a manifest is DATA, not trusted config: an absolute key
        # replaces the root entirely under pathlib's `/`, and a
        # `..` segment walks out of it — either way an arbitrary
        # host file would be ingested as export data (r8 review)
        if not p.resolve().is_relative_to(root.resolve()):
            raise ExportManifestError(
                f"manifest dataFileS3Key {key!r} escapes the export "
                "root — refusing to read outside it"
            )
        if not p.exists():
            raise ExportManifestError(
                f"manifest references missing data file {key!r}"
            )
        paths.append(str(p))
    if not paths:
        raise ExportManifestError(f"manifest lists no data files in {export_dir}")
    raw = spark.read.text(paths)
    if summary.get("outputFormat", "DYNAMODB_JSON") == "ION":
        from dynamodb_zero_etl_s3tables_spark.functions.ion import (
            ion_lines_to_item_json_udf,
        )

        conv = ion_lines_to_item_json_udf()
        with_item = raw.select(conv(F.col("value")).alias("__raw_item")).filter(
            F.col("__raw_item").isNotNull()
        )
    else:
        with_item = raw.select(
            F.get_json_object(F.col("value"), "$.Item").alias("__raw_item")
        ).filter(F.col("__raw_item").isNotNull())
    decoded = decode_item_column(with_item, "__raw_item", fields, depth)
    if validate_counts:
        if summary.get("outputFormat", "DYNAMODB_JSON") == "ION":
            # the count action below + the caller's snapshot write
            # would each re-run the Python Ion parse (the one
            # expensive stage of this path); checkpoint lazily so the
            # decode is computed ONCE and both actions reuse it.
            # Bounded: a bootstrap export is read exactly once, and
            # the checkpoint is the same data volume the snapshot
            # write is about to materialize anyway.
            decoded = decoded.localCheckpoint(eager=False)
        expected = int(summary.get("itemCount", -1))
        got = decoded.count()
        if expected >= 0 and got != expected:
            raise ExportManifestError(
                f"decoded {got} items but manifest-summary says {expected}"
            )
    return decoded
