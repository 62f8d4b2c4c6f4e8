"""Every registered oracle must PARSE AND BIND in DuckDB.

Guards the oracle-composition regression class (caught live in r5: a
module-level SQL-fragment name collision made six composed oracles
unparsable — builders stayed green, only the DuckDB side broke, and
nothing failed until a full sweep). EXPLAIN runs the parser + binder
against the real sf0.001 views in milliseconds per query without
executing anything, so this belongs in the fast suite."""

import duckdb
import pytest

from dynamodb_zero_etl_s3tables_spark.operators import QUERY_REGISTRY
from dynamodb_zero_etl_s3tables_spark.sources.testdata import TABLES

SF_DIR = "/root/testdata/sf0.001"


def test_every_oracle_binds_in_duckdb():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    problems = []
    for name, spec in QUERY_REGISTRY.items():
        if spec.oracle is None:
            continue
        try:
            con.sql("EXPLAIN " + spec.oracle)
        except Exception as e:  # noqa: BLE001 — collect every failure
            problems.append(f"{name}: {type(e).__name__}: {e}")
    assert not problems, "\n".join(problems)
