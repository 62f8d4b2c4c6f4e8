"""Query registry + shared determinism helpers.

Determinism contract (drives the DuckDB hash-match, FIXTURES.md §C):
floating-point aggregation is order-dependent, and Spark's partition
order differs from DuckDB's scan order. Every aggregate over DOUBLE
therefore routes through an exact DECIMAL cast *in both engines* —
``dsum``/``DSUM`` below — making the result bit-identical regardless
of partition count or AQE decisions. Non-aggregated doubles pass
through untouched (same IEEE ops on both sides).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass(frozen=True)
class QuerySpec:
    name: str
    build: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL; None -> driver does rows-only check
    doc: str = ""


QUERY_REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None, doc: str = ""):
    """Decorator: register fn(spark, sf_dir) -> DataFrame under `name`."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in QUERY_REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        QUERY_REGISTRY[name] = QuerySpec(name=name, build=fn, oracle=oracle, doc=doc or fn.__doc__ or "")
        return fn

    return deco


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {n: s.build for n, s in QUERY_REGISTRY.items()}


def all_oracles() -> dict[str, str]:
    return {n: s.oracle for n, s in QUERY_REGISTRY.items() if s.oracle is not None}


# ---------------------------------------------------------------------------
# Determinism helpers (Spark side). Each has a matching SQL macro below.
# ---------------------------------------------------------------------------

def fan_out(df):
    """Repartition a narrow scan up to the cluster's parallelism
    before a CPU-heavy per-row projection (signature hashing,
    hyperplane codes): a small corpus arrives as fewer parquet splits
    than cores — sf0.1 is ONE file, one task — while the projection
    cost is per-row, not per-byte. At real scale the scan already has
    more splits than cores and this is a no-op (no shuffle added).
    Results are unaffected: every downstream aggregate is
    order-independent by the determinism contract above.

    Batch-only: a streaming frame is returned untouched (its
    micro-batch partitioning is the source's business, and the RDD
    probe below would throw on it). The probe forces one physical
    planning + RDD conversion per *builder invocation* — metadata-rate
    work, acceptable at query granularity; if it ever shows in a
    profile, replace with a file-split count from the read plan."""
    if df.isStreaming:
        return df
    sc = df.sparkSession.sparkContext
    if df.rdd.getNumPartitions() < sc.defaultParallelism:
        df = df.repartition(sc.defaultParallelism)
    return df


def dsum(col, scale: int = 6) -> Column:
    """Order-independent SUM of a double column: exact decimal sum,
    surfaced as DOUBLE. Matches `DSUM(x)` in oracle SQL."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(25,{scale})")).cast("double")


def davg(col, scale: int = 6) -> Column:
    """Order-independent AVG: decimal sum / count, as DOUBLE."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.sum(c.cast(f"decimal(25,{scale})")).cast("double")
        / F.count(c).cast("double")
    )


# Oracle-side (DuckDB) equivalents — inline these into oracle SQL via
# .format or f-strings. Python-side formatting keeps the SQL readable.
def DSUM(expr: str, scale: int = 6) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(25,{scale}))) AS DOUBLE)"


def DAVG(expr: str, scale: int = 6) -> str:
    return (
        f"(CAST(SUM(CAST({expr} AS DECIMAL(25,{scale}))) AS DOUBLE)"
        f" / CAST(COUNT({expr}) AS DOUBLE))"
    )
