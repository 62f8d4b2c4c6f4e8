"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

Implementation lives in ``dynamodb_zero_etl_s3tables_spark``; every
operator from SURVEY.md §2 registers itself in
``operators.registry.QUERY_REGISTRY`` with its oracle SQL.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO_ROOT = str(Path(__file__).resolve().parent)
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

from dynamodb_zero_etl_s3tables_spark.session import tune  # noqa: E402
from dynamodb_zero_etl_s3tables_spark.operators import (  # noqa: E402
    all_oracles,
    all_queries,
)

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Runs the 5-way star join (SURVEY.md D21) — the engine's
    realization of the reference's 'query your replicated table'
    (reference README.md:173).
    """
    tune(spark)
    from dynamodb_zero_etl_s3tables_spark.operators.relational import (
        d21_star_join_flagship,
    )

    return d21_star_join_flagship(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    base = all_queries()

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            tune(spark)  # UTC timezone etc. — required for hash-match
            return fn(spark, sf_dir)

        return run

    return {name: wrap(fn) for name, fn in base.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB twin for each oracle-expressible query (others get the
    driver's rows-only check)."""
    return all_oracles()
