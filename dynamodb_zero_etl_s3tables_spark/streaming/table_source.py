"""Managed table CHANGELOG as a Structured Streaming SOURCE — the
Delta CDF / Iceberg incremental-read streaming analog, built on the
Spark 4 Python DataSource streaming API (SimpleDataSourceStreamReader).

Offsets are manifest VERSIONS: the reader polls ``manifest.json``,
emits every change row in ``(start, head]`` and advances the offset
to ``head``; checkpoint recovery replays from the committed version,
so a restarted stream resumes exactly where it stopped — the
engine-side realization of the reference's continuous-replication
promise (README.md:12,93) with the table itself as the source.

Emission per version:

- ``bootstrap`` / ``bootstrap-export`` / ``overwrite``: every row of
  the snapshot's data dir as ``change_op = 'INSERT'``.
- ``merge-mor``: the delta layer IS the changelog — upsert images
  (``inserts/``) as ``'UPSERT'``, tombstoned keys that have no new
  image as ``'DELETE'`` (non-key columns null).
- anything else (copy-on-write merge, compact, z-order): REFUSED with
  a clear error. CoW rewrites don't persist per-row change files, so
  a CDF over them would need a full snapshot diff; the supported
  cadence — bootstrap once, then merge-on-read CDC — is exactly the
  production mode whose write cost is O(batch) (manifest.py
  ``_apply_changes_mor``). ``compact()`` the table AFTER consumers
  pass its version, the same ordering discipline Delta CDF imposes.

Scale: the Simple reader materializes each microbatch driver-side —
correct here because a microbatch is one CDC batch (already
O(batch), the same rows the writer just shuffled). The documented
upgrade path for fat batches is the partitioned
``DataSourceStreamReader`` variant: same offsets, one
``InputPartition`` per delta file so executors read the parquet
(mirrors d94's per-file fan-out). Driver emission keeps this module
dependency-free (pyarrow only, no second SparkSession inside the
source)."""

from __future__ import annotations

#: Spark-type-name -> DDL fragment for the emitted columns (primitive
#: types the managed-table schema_json can carry; extend as needed).
_DDL = {
    "long": "bigint",
    "integer": "int",
    "short": "smallint",
    "byte": "tinyint",
    "double": "double",
    "float": "float",
    "string": "string",
    "boolean": "boolean",
    "date": "date",
    "timestamp": "timestamp",
    "timestamp_ntz": "timestamp_ntz",
}


def changelog_schema_ddl(manifest_path: str) -> str:
    """DDL for the changelog stream of the table at ``manifest_path``:
    ``version bigint, change_op string`` + the table's own columns
    (from the newest snapshot's schema_json)."""
    import json

    raw = json.loads(open(manifest_path).read())
    snaps = raw["snapshots"]
    fields = json.loads(snaps[-1]["schema_json"])["fields"]
    cols = []
    for f in fields:
        t = f["type"]
        if not isinstance(t, str) or t not in _DDL:
            raise TypeError(
                f"changelog source supports primitive columns only; "
                f"{f['name']!r} has type {t!r}"
            )
        cols.append(f"{f['name']} {_DDL[t]}")
    return "version bigint, change_op string, " + ", ".join(cols)


def make_changelog_source():
    """Factory returning the DataSource class. Everything the class
    touches is defined INSIDE this closure (cloudpickle then ships it
    by value): the streaming engine pickles the source into a python
    runner process that does not have this repo on sys.path — a
    module-global reference would die with ModuleNotFoundError there
    (same lazy pattern as d94's DdbExportDataSource)."""
    import glob
    import json

    from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader

    ddl_map = dict(_DDL)

    def _schema_ddl(manifest_path):
        raw = json.loads(open(manifest_path).read())
        fields = json.loads(raw["snapshots"][-1]["schema_json"])["fields"]
        cols = []
        for f in fields:
            t = f["type"]
            if not isinstance(t, str) or t not in ddl_map:
                raise TypeError(
                    f"changelog source supports primitive columns only; "
                    f"{f['name']!r} has type {t!r}"
                )
            cols.append(f"{f['name']} {ddl_map[t]}")
        return "version bigint, change_op string, " + ", ".join(cols)

    def _read_rows(dir_path):
        import pyarrow.parquet as pq

        out = []
        for f in sorted(glob.glob(f"{dir_path}/*.parquet")):
            out.extend(pq.read_table(f).to_pylist())
        return out

    class _Reader(SimpleDataSourceStreamReader):
        def __init__(self, manifest_path: str, col_names, key_cols):
            self._manifest = manifest_path
            self._cols = list(col_names)
            self._keys = list(key_cols)

        # -- offset plumbing --------------------------------------------
        def initialOffset(self):
            return {"v": 0}

        def read(self, start):
            raw = json.loads(open(self._manifest).read())
            head = max(
                (s["version"] for s in raw["snapshots"] if not s.get("staged")),
                default=0,
            )
            v0 = start["v"]
            if head <= v0:
                return iter(()), {"v": v0}
            rows = []
            for s in raw["snapshots"]:
                if s.get("staged") or not (v0 < s["version"] <= head):
                    continue
                rows.extend(self._emit(s))
            return iter(rows), {"v": head}

        def readBetweenOffsets(self, start, end):
            raw = json.loads(open(self._manifest).read())
            rows = []
            for s in raw["snapshots"]:
                if s.get("staged") or not (start["v"] < s["version"] <= end["v"]):
                    continue
                rows.extend(self._emit(s))
            return iter(rows)

        def commit(self, end):
            pass

        # -- per-version emission ---------------------------------------
        def _emit(self, snap):
            v, op = snap["version"], snap["operation"]
            if op in ("bootstrap", "bootstrap-export", "overwrite"):
                return [
                    self._tuple(v, "INSERT", r)
                    for r in _read_rows(snap["data_dir"])
                ]
            if op == "merge-mor":
                ups = _read_rows(snap["delta"]["inserts"])
                up_keys = {tuple(r[k] for k in self._keys) for r in ups}
                dels = [
                    r
                    for r in _read_rows(snap["delta"]["deletes"])
                    if tuple(r[k] for k in self._keys) not in up_keys
                ]
                return [self._tuple(v, "UPSERT", r) for r in ups] + [
                    self._tuple(v, "DELETE", r) for r in dels
                ]
            raise ValueError(
                f"changelog source: snapshot v{v} is {op!r}; only "
                "bootstrap/overwrite and merge-on-read CDC commits carry "
                "per-row change files. Run compaction/CoW maintenance "
                "after consumers pass this version, or switch the CDC "
                "cadence to strategy='merge-on-read'."
            )

        def _tuple(self, version, change_op, row):
            return (version, change_op, *[row.get(c) for c in self._cols])

    class TableChangelogSource(DataSource):
        @classmethod
        def name(cls):
            return "table_changelog"

        def schema(self):
            return _schema_ddl(self.options["manifest"])

        def simpleStreamReader(self, schema):
            import json as _json

            raw = _json.loads(open(self.options["manifest"]).read())
            fields = _json.loads(raw["snapshots"][-1]["schema_json"])["fields"]
            return _Reader(
                self.options["manifest"],
                [f["name"] for f in fields],
                [k.strip() for k in self.options["keys"].split(",")],
            )

    return TableChangelogSource
