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


def mh64(col) -> Column:
    """Portable 60-bit hash: first 15 hex chars of md5 as BIGINT —
    THE cross-engine hash idiom (numeric, so min/rank aggregates stay
    in HashAggregate; min(STRING) would demote to SortAggregate).
    Matches :func:`MH64` in oracle SQL. One definition (r8 review:
    the 8-line idiom was copy-pasted ~12 times across the text
    operators — a one-character drift at any site silently breaks
    that operator's cross-engine hash-match)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("bigint")


def MH64(expr_sql: str) -> str:
    """DuckDB twin of :func:`mh64`."""
    return f"(('0x' || substr(md5({expr_sql}), 1, 15))::BIGINT)"


def key_bucket(prefix: str, mod: int, key="doc_id") -> Column:
    """Deterministic bucket in [0, mod) from a salted key hash — the
    sampling/split primitive every selection operator derives its
    draw from. DISTINCT PREFIXES PER OPERATOR are the independence
    discipline: two operators sharing a salt would select as one
    function of the data. Matches :func:`KEY_BUCKET` in oracle SQL."""
    k = F.col(key) if isinstance(key, str) else key
    return mh64(F.concat(F.lit(prefix), k.cast("string"))) % mod


def KEY_BUCKET(prefix: str, mod: int, key: str = "doc_id") -> str:
    """DuckDB twin of :func:`key_bucket`."""
    salted = f"'{prefix}' || CAST({key} AS VARCHAR)"
    return f"({MH64(salted)} % {mod})"
