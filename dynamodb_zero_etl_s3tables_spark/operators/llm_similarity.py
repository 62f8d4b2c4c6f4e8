"""Similarity search over embedding columns (SURVEY.md §2 E3-E4):
brute-force cosine top-k, threshold similarity join, and an
IVF-style bucketed variant for the 100 TB path.

Determinism: dot products fold the array LEFT-TO-RIGHT in index order
as IEEE doubles — array order is a property of the row, not of
partitioning, so the fold is bit-identical in both engines and across
any cluster layout (unlike a SUM over rows, which needs the decimal
trick). Spark folds with ``aggregate(zip_with(...))``, DuckDB with
``list_reduce(list_transform(...))`` — all engine-native lambdas, no
UDFs. Row-wise aggregates (the IVF centroid means) still accumulate
in exact DECIMAL, since row order IS partition-dependent.

Scale posture: brute-force is one broadcast (the query vector) + a
map-side score + TakeOrderedAndProject — embarrassingly parallel. The
similarity join rides an equi-join on the label bucket, so only
same-bucket pairs are scored. IVF probes `nprobe` coarse buckets,
turning full scans into bucket scans.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from dynamodb_zero_etl_s3tables_spark.operators.registry import query
from dynamodb_zero_etl_s3tables_spark.sources.testdata import load

DIM = 64
_DEC = "decimal(30,12)"


def dot_fold(a: Column, b: Column) -> Column:
    """Dot product of two float arrays: left-to-right IEEE double fold
    over the index order (deterministic per row; ~3x faster than the
    decimal fold — interpreted lambda steps stay in primitive math)."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def norm_fold(a: Column) -> Column:
    """L2 norm of a float array, same fold discipline."""
    return F.sqrt(dot_fold(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot_fold(a, b) / (norm_fold(a) * norm_fold(b))


# DuckDB twin of dot_fold: same left-to-right double fold. list_reduce
# seeds with element 1 where Spark seeds 0.0 — IEEE-identical, since
# 0.0 + x == x for every finite x.
def _DOT(a: str, b: str) -> str:
    return (
        f"list_reduce(list_transform(range(1, {DIM + 1}),"
        f" i -> {a}[i]::DOUBLE * {b}[i]::DOUBLE), (acc, x) -> acc + x)"
    )


@query(
    "e03_cosine_topk",
    oracle=f"""
    WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
    scored AS (
      SELECT e.vec_id, e.label,
             ROUND({_DOT('e.embedding', 'q.qv')}
                   / (SQRT({_DOT('e.embedding', 'e.embedding')})
                      * SQRT({_DOT('q.qv', 'q.qv')})), 6) AS cos_sim
      FROM embeddings e, q
      WHERE e.vec_id <> 0
    )
    SELECT vec_id, label, cos_sim,
           rn AS rank
    FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY cos_sim DESC, vec_id) AS rn
          FROM scored)
    WHERE rn <= 20
    """,
)
def e03_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E3: brute-force cosine top-20 neighbors of vec_id=0 — the
    exact baseline every ANN variant is judged against. Broadcast the
    query vector; score map-side; global top-k via ordered limit."""
    e = load(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))
    scored = (
        e.filter(F.col("vec_id") != 0)
        .join(F.broadcast(q))
        .select(
            "vec_id",
            "label",
            F.round(
                dot_fold(F.col("embedding"), F.col("qv"))
                / (norm_fold(F.col("embedding")) * norm_fold(F.col("qv"))),
                6,
            ).alias("cos_sim"),
        )
    )
    # TakeOrderedAndProject (distributed top-k), THEN rank the 20
    # survivors — a global row_number window would funnel every scored
    # row into one partition before truncating.
    topk = scored.orderBy(F.col("cos_sim").desc(), F.col("vec_id")).limit(20)
    w = W.orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
    return topk.withColumn("rank", F.row_number().over(w)).select(
        "vec_id", "label", "cos_sim", "rank"
    )


@query(
    "e04_similarity_join",
    oracle=f"""
    WITH n AS (
      SELECT vec_id, label, embedding,
             SQRT({_DOT('embedding', 'embedding')}) AS nrm
      FROM embeddings WHERE label IN (0, 1)
    )
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.label,
           ROUND({_DOT('a.embedding', 'b.embedding')} / (a.nrm * b.nrm), 6) AS cos_sim
    FROM n a JOIN n b ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE {_DOT('a.embedding', 'b.embedding')} / (a.nrm * b.nrm) >= 0.2
    """,
)
def e04_similarity_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E4: threshold similarity join (cos >= 0.2) within coarse
    buckets (labels 0-1) — pairs meet only via the label equi-join,
    never a full cross product; norms precomputed once per vector."""
    e = load(spark, sf_dir, "embeddings").filter(F.col("label").isin(0, 1))
    n = e.select(
        "vec_id", "label", "embedding", norm_fold(F.col("embedding")).alias("nrm")
    )
    a = n.alias("a")
    b = n.alias("b")
    sim = dot_fold(F.col("a.embedding"), F.col("b.embedding")) / (
        F.col("a.nrm") * F.col("b.nrm")
    )
    return (
        a.join(b, (F.col("a.label") == F.col("b.label")) & (F.col("a.vec_id") < F.col("b.vec_id")))
        .withColumn("cos_sim_raw", sim)
        .filter(F.col("cos_sim_raw") >= 0.2)
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.col("a.label").alias("label"),
            F.round(F.col("cos_sim_raw"), 6).alias("cos_sim"),
        )
    )


@query(
    "e03b_ann_ivf",
    oracle=f"""
    WITH dims AS (SELECT UNNEST(range(1, {DIM + 1})) AS i),
    centroids AS (
      SELECT label, i.i AS dim,
             CAST(SUM(CAST(embedding[i.i]::DOUBLE AS DECIMAL(30,12))) AS DOUBLE)
               / COUNT(*) AS c
      FROM embeddings, dims i
      GROUP BY label, i.i
    ),
    q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
    cdist AS (
      SELECT c.label,
             CAST(SUM(CAST((c.c - q.qv[c.dim]::DOUBLE) * (c.c - q.qv[c.dim]::DOUBLE)
                           AS DECIMAL(30,12))) AS DOUBLE) AS d2
      FROM centroids c, q
      GROUP BY c.label
    ),
    probes AS (
      SELECT label FROM (
        SELECT label, ROW_NUMBER() OVER (ORDER BY d2, label) AS rn FROM cdist
      ) WHERE rn <= 2
    ),
    cand AS (
      SELECT e.vec_id, e.label, e.embedding
      FROM embeddings e JOIN probes p ON e.label = p.label
      WHERE e.vec_id <> 0
    ),
    scored AS (
      SELECT c.vec_id, c.label,
             ROUND({_DOT('c.embedding', 'q.qv')}
                   / (SQRT({_DOT('c.embedding', 'c.embedding')})
                      * SQRT({_DOT('q.qv', 'q.qv')})), 6) AS cos_sim
      FROM cand c, q
    )
    SELECT vec_id, label, cos_sim, rn AS rank
    FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY cos_sim DESC, vec_id) AS rn
          FROM scored)
    WHERE rn <= 10
    """,
)
def e03b_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E3 scale path: IVF-style ANN — coarse centroids (here: the
    label partitions, i.e. a pre-trained coarse quantizer), probe the
    nprobe=2 centroids nearest the query, then exact-score only those
    buckets. At 100 TB the candidate scan is ~nprobe/nlist of the
    data; centroid stats come from one partial-aggregated pass."""
    e = load(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv"))

    # centroid per label per dim: explode dims, exact-decimal mean
    dims = (
        e.select("label", F.posexplode(F.col("embedding")).alias("dim0", "x"))
        .groupBy("label", "dim0")
        .agg(
            (
                F.sum(F.col("x").cast("double").cast(_DEC)).cast("double")
                / F.count("*")
            ).alias("c")
        )
    )
    # squared distance query->centroid per label (exact-decimal sum)
    qd = q.select(F.posexplode(F.col("qv")).alias("dim0", "qx"))
    cdist = (
        dims.join(F.broadcast(qd), "dim0")
        .withColumn(
            "t",
            (
                (F.col("c") - F.col("qx").cast("double"))
                * (F.col("c") - F.col("qx").cast("double"))
            ).cast(_DEC),
        )
        .groupBy("label")
        .agg(F.sum("t").cast("double").alias("d2"))
    )
    # nprobe nearest centroids via distributed top-k (nlist can be
    # ~sqrt(N) at scale — don't window over it globally)
    probes = cdist.orderBy("d2", "label").limit(2).select("label")
    cand = e.join(F.broadcast(probes), "label").filter(F.col("vec_id") != 0)
    scored = cand.join(F.broadcast(q)).select(
        "vec_id",
        "label",
        F.round(
            dot_fold(F.col("embedding"), F.col("qv"))
            / (norm_fold(F.col("embedding")) * norm_fold(F.col("qv"))),
            6,
        ).alias("cos_sim"),
    )
    topk = scored.orderBy(F.col("cos_sim").desc(), F.col("vec_id")).limit(10)
    w = W.orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
    return topk.withColumn("rank", F.row_number().over(w)).select(
        "vec_id", "label", "cos_sim", "rank"
    )


@query(
    "e02e_embedding_neardup",
    oracle=f"""
    WITH n AS (
      SELECT vec_id, label, embedding,
             SQRT({_DOT('embedding', 'embedding')}) AS nrm
      FROM embeddings
    ), pairs AS (
      SELECT a.vec_id AS doc_a, b.vec_id AS doc_b
      FROM n a JOIN n b ON a.label = b.label AND a.vec_id < b.vec_id
      WHERE {_DOT('a.embedding', 'b.embedding')} / (a.nrm * b.nrm) >= 0.35
    ), nb AS (
      SELECT doc_b AS vec_id, MIN(doc_a) AS min_nb FROM pairs GROUP BY doc_b
    )
    SELECT e.vec_id, e.label,
           COALESCE(nb.min_nb, e.vec_id) AS keeper_id,
           (nb.min_nb IS NOT NULL) AS is_dup
    FROM embeddings e LEFT JOIN nb ON e.vec_id = nb.vec_id
    """,
)
def e02e_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E2 family: embedding-cosine near-dup — vectors with cos >= 0.35
    inside a coarse bucket (label = pre-trained quantizer cell) are
    duplicates; keeper = lowest vec_id among 1-hop smaller neighbors.

    Scale posture: pairs form only via the label equi-join (never a
    cross product); the keeper map is a groupBy on the smaller pair
    side; final assignment is a left join back to the corpus. At
    100 TB the label bucketing bounds candidate pairs exactly like
    the MinHash bands bound e02b.
    """
    e = load(spark, sf_dir, "embeddings")
    n = e.select("vec_id", "label", "embedding", norm_fold(F.col("embedding")).alias("nrm"))
    a, b = n.alias("a"), n.alias("b")
    sim = dot_fold(F.col("a.embedding"), F.col("b.embedding")) / (
        F.col("a.nrm") * F.col("b.nrm")
    )
    pairs = (
        a.join(b, (F.col("a.label") == F.col("b.label")) & (F.col("a.vec_id") < F.col("b.vec_id")))
        .filter(sim >= 0.35)
        .select(F.col("a.vec_id").alias("doc_a"), F.col("b.vec_id").alias("doc_b"))
    )
    nb = pairs.groupBy(F.col("doc_b").alias("nb_vec_id")).agg(F.min("doc_a").alias("min_nb"))
    return (
        e.join(nb, e.vec_id == nb.nb_vec_id, "left")
        .select(
            "vec_id",
            "label",
            F.coalesce(F.col("min_nb"), F.col("vec_id")).alias("keeper_id"),
            F.col("min_nb").isNotNull().alias("is_dup"),
        )
    )


@query(
    "e03c_cosine_topk_vectorized",
    oracle=f"""
    WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
    scored AS (
      SELECT e.vec_id, e.label,
             ROUND({_DOT('e.embedding', 'q.qv')}
                   / (SQRT({_DOT('e.embedding', 'e.embedding')})
                      * SQRT({_DOT('q.qv', 'q.qv')})), 6) AS cos_sim
      FROM embeddings e, q
      WHERE e.vec_id <> 0
    )
    SELECT vec_id, label, cos_sim,
           rn AS rank
    FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY cos_sim DESC, vec_id) AS rn
          FROM scored)
    WHERE rn <= 20
    """,
)
def e03c_cosine_topk_vectorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E3 via the Arrow/BLAS path (D53): ``mapInPandas`` streams Arrow
    batches into numpy, where one matrix-vector product scores a whole
    batch — the 100 TB-scale idiom when per-row lambda folds become
    the bottleneck (BLAS does in one fused loop what the fold does in
    DIM interpreted steps). Same answer as the fold-based e03 (same
    oracle); the query vector is a one-row driver-side constant
    captured in the closure, i.e. a broadcast."""
    import numpy as np
    import pandas as pd

    e = load(spark, sf_dir, "embeddings")
    qv = np.asarray(
        e.filter(F.col("vec_id") == 0).first().embedding, dtype=np.float64
    )
    qn = float(np.sqrt(qv @ qv))

    def score(batches):
        for pdf in batches:
            m = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            sims = (m @ qv) / (np.sqrt((m * m).sum(axis=1)) * qn)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"],
                    "label": pdf["label"],
                    "cos_sim": np.round(sims, 6),
                }
            )

    scored = e.filter(F.col("vec_id") != 0).mapInPandas(
        score, "vec_id long, label int, cos_sim double"
    )
    topk = scored.orderBy(F.col("cos_sim").desc(), F.col("vec_id")).limit(20)
    w = W.orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
    return topk.withColumn("rank", F.row_number().over(w)).select(
        "vec_id", "label", "cos_sim", "rank"
    )


# Random-hyperplane LSH: N_PLANES deterministic ±1 hyperplanes derived
# from md5 (pure function of (plane, dim) — no RNG, so both engines
# materialize identical planes and the whole pipeline hash-matches).
import hashlib as _hashlib

N_PLANES = 8
_PLANES = [
    [
        1 if int(_hashlib.md5(f"p{j}i{i}".encode()).hexdigest()[:2], 16) % 2 == 0 else -1
        for i in range(DIM)
    ]
    for j in range(N_PLANES)
]


def _plane_sql(j: int) -> str:
    lits = ", ".join(str(v) for v in _PLANES[j])
    return (
        f"list_reduce(list_transform(range(1, {DIM + 1}),"
        f" i -> embedding[i]::DOUBLE * ([{lits}][i])::DOUBLE), (a, x) -> a + x) > 0"
    )


_BUCKET_SQL = " + ".join(
    f"(CASE WHEN {_plane_sql(j)} THEN {1 << j} ELSE 0 END)" for j in range(N_PLANES)
)


@query(
    "e03d_ann_hyperplane_lsh",
    oracle=f"""
    WITH b AS (
      SELECT vec_id, label, embedding, ({_BUCKET_SQL}) AS bucket
      FROM embeddings
    )
    SELECT x.vec_id AS vec_a, y.vec_id AS vec_b, x.bucket,
           ROUND({_DOT('x.embedding', 'y.embedding')}
                 / (SQRT({_DOT('x.embedding', 'x.embedding')})
                    * SQRT({_DOT('y.embedding', 'y.embedding')})), 6) AS cos_sim
    FROM b x JOIN b y ON x.bucket = y.bucket AND x.vec_id < y.vec_id
    WHERE {_DOT('x.embedding', 'y.embedding')}
          / (SQRT({_DOT('x.embedding', 'x.embedding')})
             * SQRT({_DOT('y.embedding', 'y.embedding')})) >= 0.35
    """,
)
def e03d_ann_hyperplane_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E3 scale path #2: random-hyperplane LSH. Each vector's bucket
    is the packed sign pattern of N_PLANES fixed hyperplane
    projections (cosine-similar vectors land in the same bucket with
    probability (1 - θ/π)^N). Exact cosine then scores ONLY same-
    bucket pairs — the quadratic blowup is confined to buckets, which
    shrink geometrically with N_PLANES. Complements e03b's IVF
    (data-dependent centroids) with a data-independent scheme that
    needs no training pass — the right choice when the corpus drifts
    faster than centroids can be refreshed."""
    e = load(spark, sf_dir, "embeddings")
    bucket = None
    for j in range(N_PLANES):
        plane = F.array(*[F.lit(float(v)) for v in _PLANES[j]])
        proj = F.aggregate(
            F.zip_with(F.col("embedding"), plane, lambda x, y: x.cast("double") * y),
            F.lit(0.0),
            lambda a, x: a + x,
        )
        bit = F.when(proj > 0, F.lit(1 << j)).otherwise(F.lit(0))
        bucket = bit if bucket is None else bucket + bit
    b = e.select("vec_id", "label", "embedding", bucket.alias("bucket"))
    x, y = b.alias("x"), b.alias("y")
    cos = dot_fold(F.col("x.embedding"), F.col("y.embedding")) / (
        norm_fold(F.col("x.embedding")) * norm_fold(F.col("y.embedding"))
    )
    return (
        x.join(
            y,
            (F.col("x.bucket") == F.col("y.bucket"))
            & (F.col("x.vec_id") < F.col("y.vec_id")),
        )
        .filter(cos >= 0.35)
        .select(
            F.col("x.vec_id").alias("vec_a"),
            F.col("y.vec_id").alias("vec_b"),
            F.col("x.bucket").alias("bucket"),
            F.round(cos, 6).alias("cos_sim"),
        )
    )
