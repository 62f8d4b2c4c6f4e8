"""Local replica of the driver's correctness gate: run every
registered query on Spark and its oracle on DuckDB, compare
row-count + column names + order-insensitive value hash.

Usage: python tools/check_correctness.py [sf_dir] [name_filter...]

Concurrency contract: materializing operators (e38/e41 exports, h07/
h13/h14/h17 stream sinks, d86/d87 catalog tables, c08) write scratch
under /tmp/spark_graft_io/<sha256(sf_dir)[:10]>-p<pid>/<subdir>
(operators/scratch.py) and wipe their own subdir at build time. The
pid in the namespace makes CONCURRENT PROCESSES disjoint by
construction — pytest may run alongside a sweep, and two sweeps of
the same sf_dir don't race (d86's bkt_* catalog db carries the same
per-process tag). Within one process, distinct queries never share a
subdir. Dead-process namespaces are reaped at import.
"""

from __future__ import annotations

import hashlib
import sys
import time
from pathlib import Path

import duckdb
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from dynamodb_zero_etl_s3tables_spark.session import get_spark
from dynamodb_zero_etl_s3tables_spark.operators import QUERY_REGISTRY
from dynamodb_zero_etl_s3tables_spark.sources.testdata import TABLES


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        k = df[c].dtype.kind
        if k in "iu":
            df[c] = df[c].astype("int64")
        elif k == "f":
            df[c] = df[c].astype("float64")
        elif k == "M":
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None)
        elif k == "O":
            # Strict: external harnesses hash/sort result cells and
            # crash on list/ndarray values (CORRECTNESS_r01 d28). Fail
            # loudly here so such columns never reach a driver run.
            sample = df[c].dropna()
            if len(sample) and any(
                isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray"
                for v in sample.head(20)
            ):
                raise TypeError(
                    f"column {c!r} contains array-valued cells; "
                    "stringify (array_join) before registering"
                )
    return df


def value_hash(df: pd.DataFrame) -> str:
    df = canon(df.copy())
    rows = sorted(repr(tuple(r)) for r in df.itertuples(index=False, name=None))
    h = hashlib.sha256()
    for r in rows:
        h.update(r.encode())
    return h.hexdigest()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    filters = sys.argv[2:]
    spark = get_spark()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    n_pass = n_fail = n_rows_only = 0
    failures = []
    for name, spec in QUERY_REGISTRY.items():
        if filters and not any(f in name for f in filters):
            continue
        t0 = time.time()
        try:
            sdf = spec.build(spark, sf_dir).toPandas()
        except Exception as e:
            n_fail += 1
            failures.append(name)
            msg = str(e).splitlines() or [repr(e)]
            print(f"FAIL  {name}: spark error: {msg[0][:300]}")
            continue
        if spec.oracle is None:
            n_rows_only += 1
            print(f"rows  {name}: {len(sdf)} rows ({time.time()-t0:.1f}s)")
            continue
        try:
            odf = con.execute(spec.oracle).df()
        except Exception as e:
            n_fail += 1
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {str(e).splitlines()[0][:300]}")
            continue
        problems = []
        if len(sdf) != len(odf):
            problems.append(f"rows {len(sdf)} != {len(odf)}")
        if sorted(sdf.columns) != sorted(odf.columns):
            problems.append(f"cols {sorted(sdf.columns)} != {sorted(odf.columns)}")
        if not problems and value_hash(sdf) != value_hash(odf):
            problems.append("value-hash mismatch")
            # show a diff sample
            a, b = canon(sdf.copy()), canon(odf.copy())
            key = list(a.columns)
            sa = set(repr(tuple(r)) for r in a.itertuples(index=False, name=None))
            sb = set(repr(tuple(r)) for r in b.itertuples(index=False, name=None))
            only_a = list(sa - sb)[:2]
            only_b = list(sb - sa)[:2]
            for r in only_a:
                problems.append(f"  spark-only: {r[:240]}")
            for r in only_b:
                problems.append(f"  duck-only:  {r[:240]}")
        if problems:
            n_fail += 1
            failures.append(name)
            print(f"FAIL  {name}: " + "; ".join(problems))
        else:
            n_pass += 1
            print(f"ok    {name} ({len(sdf)} rows, {time.time()-t0:.1f}s)")
    print(
        f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only"
        + (f"\nfailures: {failures}" if failures else "")
    )
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
