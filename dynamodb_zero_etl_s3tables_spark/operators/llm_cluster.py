"""Corpus clustering + sub-document dedup (LLM-pipeline E-family
extensions): deterministic Lloyd/k-means refinement over the
embeddings table, and fixed-width token-chunk dedup over documents —
the CCNet-style "remove duplicated spans across documents" pass that
document-level dedup (e01/e02*) can't see.

Scale posture:
- k-means: centroids are k rows — they BROADCAST; assignment is a
  map-side fold over each vector (no shuffle), and the re-estimation
  step is one partial-aggregated shuffle of k x DIM cells, not of
  vectors. Iterations compose the same two steps, so the cost is
  #iters scans — the canonical distributed k-means layout.
- chunk dedup: chunks shuffle once on their md5 (uniform key, bounded
  skew); ownership is an aggregate + equi-join on that hash, never a
  string self-join.

Determinism (FIXTURES.md §C discipline): distances fold left-to-right
as IEEE doubles (order is a row property — bit-identical in any
partitioning); re-estimated centroid means go through exact DECIMAL
sums and are ROUNDed before reuse, so iteration 2 sees bit-identical
centroids in both engines; assignment ties break on (dist, cid).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from dynamodb_zero_etl_s3tables_spark.operators.llm_similarity import DIM
from dynamodb_zero_etl_s3tables_spark.operators.registry import query
from dynamodb_zero_etl_s3tables_spark.sources.testdata import load

K_CLUSTERS = 8
CHUNK_W = 16


def _sq_dist(vec, cvec) -> F.Column:
    """Squared L2 distance between a float vector and a double
    centroid: left-to-right IEEE fold over index order (same
    discipline as llm_similarity.dot_fold)."""
    diffs = F.zip_with(
        vec, cvec, lambda x, y: (x.cast("double") - y) * (x.cast("double") - y)
    )
    return F.aggregate(diffs, F.lit(0.0), lambda acc, v: acc + v)


def _assign(vecs: DataFrame, cents: DataFrame) -> DataFrame:
    """Nearest-centroid assignment: broadcast the k centroids, score
    map-side, keep the (dist, cid)-minimal row per vector."""
    j = vecs.crossJoin(F.broadcast(cents)).withColumn(
        "dist", _sq_dist(F.col("embedding"), F.col("cvec"))
    )
    w = W.partitionBy("vec_id").orderBy("dist", "cid")
    return (
        j.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn", "cvec")
    )


def _reestimate(assigned: DataFrame) -> DataFrame:
    """New centroids: per-(cluster, dim) decimal-exact mean, ROUNDed
    to 6 so both engines reuse bit-identical doubles, re-assembled
    into index-ordered arrays."""
    cells = (
        assigned.select("cid", F.posexplode("embedding").alias("dim", "v"))
        .groupBy("cid", "dim")
        .agg(
            F.round(
                F.sum(F.col("v").cast("double").cast("decimal(25,9)")).cast("double")
                / F.count("*"),
                6,
            ).alias("cv")
        )
    )
    return cells.groupBy("cid").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "cv"))),
            lambda s: s.getField("cv"),
        ).alias("cvec")
    )


# DuckDB twins of the three steps, composed as CTEs in the oracle.
_SQL_DIST = (
    f"list_reduce(list_transform(range(1, {DIM} + 1), "
    "i -> (embedding[i]::DOUBLE - cvec[i]) * (embedding[i]::DOUBLE - cvec[i])), "
    "(acc, x) -> acc + x)"
)


# Shared CTE chain: two Lloyd iterations ending in a2 = the final
# (vec_id, embedding, cid, dist) assignment. e21 projects it; e25
# builds the SemDeDup pair search on top of it.
_KMEANS_CTES = f"""
    init AS (
      SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT) AS cid,
             list_transform(embedding, x -> x::DOUBLE) AS cvec
      FROM (SELECT * FROM embeddings ORDER BY vec_id LIMIT {K_CLUSTERS})
    ),
    d1 AS (
      SELECT vec_id, embedding, cid, {_SQL_DIST} AS dist
      FROM embeddings CROSS JOIN init
    ),
    a1 AS (
      SELECT vec_id, embedding, cid
      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                         ORDER BY dist, cid) AS rn FROM d1)
      WHERE rn = 1
    ),
    cells AS (
      SELECT cid, i AS dim,
             ROUND(CAST(SUM(CAST(embedding[i]::DOUBLE AS DECIMAL(25,9))) AS DOUBLE)
                   / COUNT(*), 6) AS cv
      FROM a1 CROSS JOIN (SELECT UNNEST(range(1, {DIM} + 1)) AS i) dims
      GROUP BY cid, i
    ),
    cent2 AS (
      SELECT cid, list(cv ORDER BY dim) AS cvec FROM cells GROUP BY cid
    ),
    d2 AS (
      SELECT e.vec_id, e.embedding, c.cid, {_SQL_DIST} AS dist
      FROM embeddings e CROSS JOIN cent2 c
    ),
    a2 AS (
      SELECT vec_id, embedding, cid, dist
      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                                         ORDER BY dist, cid) AS rn FROM d2)
      WHERE rn = 1
    )
"""


@query(
    "e21_kmeans_refine",
    oracle=f"""
    WITH {_KMEANS_CTES}
    SELECT vec_id, cid AS cluster, ROUND(dist, 6) AS dist FROM a2
    """,
)
def e21_kmeans_refine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E-family: two deterministic Lloyd iterations of k-means over
    the embedding corpus (k=8, seeded with the 8 smallest vec_ids) —
    the semantic-clustering pass behind corpus curation (topic
    balancing, semantic dedup sharding) and the trainer for e03b's IVF
    coarse quantizer. Assignment broadcasts centroids and folds
    map-side; re-estimation shuffles k x DIM cells; iteration count is
    fixed so the whole plan is static — at 100 TB each iteration is
    one scan + one tiny shuffle, and more iterations are the same
    plan repeated, not new shapes."""
    a2 = _two_lloyd_rounds(spark, sf_dir)
    return a2.select(
        "vec_id",
        F.col("cid").alias("cluster"),
        F.round("dist", 6).alias("dist"),
    )


def _two_lloyd_rounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared by e21/e25: the final (vec_id, embedding, cid, dist)
    assignment after two deterministic Lloyd rounds."""
    e = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    init = (
        e.orderBy("vec_id")
        .limit(K_CLUSTERS)
        .select(
            (F.row_number().over(W.partitionBy(F.lit(1)).orderBy("vec_id")) - 1)
            .cast("int")
            .alias("cid"),
            F.transform("embedding", lambda x: x.cast("double")).alias("cvec"),
        )
    )
    a1 = _assign(e, init).drop("dist")
    cent2 = _reestimate(a1)
    return _assign(e, cent2)


@query(
    "e20_chunk_dedup",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ),
    chunks AS (
      SELECT DISTINCT doc_id, md5(chunk) AS chunk_h FROM (
        SELECT doc_id,
               UNNEST(list_transform(
                 range(0, CAST(CEIL(len(t) / {CHUNK_W}.0) AS INT)),
                 i -> array_to_string(t[(i * {CHUNK_W} + 1):(i * {CHUNK_W} + {CHUNK_W})], ' ')
               )) AS chunk
        FROM toks
      )
    ),
    own AS (SELECT chunk_h, MIN(doc_id) AS owner FROM chunks GROUP BY chunk_h)
    SELECT c.doc_id,
           COUNT(*) AS n_chunks,
           CAST(SUM(CASE WHEN o.owner = c.doc_id THEN 1 ELSE 0 END) AS BIGINT)
             AS n_owned,
           CAST(SUM(CASE WHEN o.owner = c.doc_id THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*) AS owned_ratio
    FROM chunks c JOIN own o ON c.chunk_h = o.chunk_h
    GROUP BY c.doc_id
    """,
)
def e20_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E-family: fixed-width token-chunk dedup — split each document
    into {CHUNK_W}-token chunks, attribute each distinct chunk to its
    lowest-doc_id owner, and report per-document chunk ownership (the
    sub-document pass that catches boilerplate/quotation overlap
    document-level dedup misses; public CCNet/C4 pipelines dedup at
    exactly this granularity). Chunks travel as md5 hashes, so the
    ownership shuffle carries 32-byte keys with uniform distribution
    regardless of chunk text skew."""
    d = load(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    n_chunks = F.ceil(F.size(toks) / F.lit(float(CHUNK_W))).cast("int")
    chunked = d.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), n_chunks - 1),
                lambda i: F.concat_ws(
                    " ", F.slice(toks, i * CHUNK_W + 1, CHUNK_W)
                ),
            )
        ).alias("chunk"),
    )
    chunks = chunked.select("doc_id", F.md5("chunk").alias("chunk_h")).distinct()
    own = chunks.groupBy("chunk_h").agg(F.min("doc_id").alias("owner"))
    owned = F.when(F.col("owner") == F.col("doc_id"), 1).otherwise(0)
    return (
        chunks.join(own, "chunk_h")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_chunks"),
            F.sum(owned).alias("n_owned"),
            # IEEE division of exact ints — bit-identical across
            # engines, so no ROUND (FIXTURES.md rule)
            (F.sum(owned).cast("double") / F.count("*")).alias(
                "owned_ratio"
            ),
        )
    )


# DuckDB cosine between two a2 rows (qualified column refs)
def _COS(a: str, b: str) -> str:
    dot = (
        f"list_reduce(list_transform(range(1, {DIM} + 1), "
        f"i -> {a}[i]::DOUBLE * {b}[i]::DOUBLE), (acc, x) -> acc + x)"
    )
    nrm = (
        "SQRT(list_reduce(list_transform(range(1, %d + 1), "
        "i -> %s[i]::DOUBLE * %s[i]::DOUBLE), (acc, x) -> acc + x))"
    )
    return f"{dot} / (({nrm % (DIM, a, a)}) * ({nrm % (DIM, b, b)}))"


SEMDEDUP_THRESHOLD = 0.35


@query(
    "e25_semdedup",
    oracle=f"""
    WITH {_KMEANS_CTES}
    SELECT a.vec_id AS keeper, b.vec_id AS dropped, a.cid AS cluster,
           ROUND({_COS('a.embedding', 'b.embedding')}, 6) AS cos_sim
    FROM a2 a JOIN a2 b
      ON a.cid = b.cid AND a.vec_id < b.vec_id
    WHERE {_COS('a.embedding', 'b.embedding')} >= {SEMDEDUP_THRESHOLD}
    """,
)
def e25_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E-family: SemDeDup-style semantic dedup (public technique:
    k-means-cluster the embedding space, then search for high-cosine
    pairs ONLY within each cluster — the cluster bound is what makes
    semantic dedup tractable at corpus scale, since the quadratic
    pair search shrinks from O(N^2) to O(sum cluster_size^2) with
    clusters ~N/k). Composes the e21 assignment (broadcast-centroid
    Lloyd rounds) with an in-cluster equi-join pair search; the
    lowest vec_id in each qualifying pair is the keeper. The 0.35
    threshold is tuned to the synthetic corpus (random embeddings
    have no 0.9-cosine twins); a real deployment raises it — the
    plan shape is threshold-independent."""
    # Two plan-only optimizations (results bit-identical, r3 perf):
    # (1) the self-join below would recompute the whole Lloyd
    #     pipeline once per branch — checkpoint the assignment so the
    #     pair search reads materialized rows (on a cluster: a
    #     checkpoint dir; e02h uses the same pattern for iteration);
    # (2) per-vector norms are a row property — compute them ONCE per
    #     row before the join instead of 2x per candidate pair,
    #     leaving only the dot product as per-pair work.
    def nrm(c):
        return F.sqrt(
            F.aggregate(
                F.zip_with(c, c, lambda x, y: x.cast("double") * y.cast("double")),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
        )

    a2 = (
        _two_lloyd_rounds(spark, sf_dir)
        .withColumn("nrm", nrm(F.col("embedding")))
        .localCheckpoint(eager=True)
    )
    a = a2.select(
        F.col("vec_id").alias("keeper"),
        F.col("cid").alias("cluster"),
        F.col("embedding").alias("ea"),
        F.col("nrm").alias("na"),
    )
    b = a2.select(
        F.col("vec_id").alias("dropped"),
        F.col("cid").alias("cluster"),
        F.col("embedding").alias("eb"),
        F.col("nrm").alias("nb"),
    )
    dot = F.aggregate(
        F.zip_with("ea", "eb", lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    cos = dot / (F.col("na") * F.col("nb"))
    return (
        a.join(b, "cluster")
        .filter(F.col("keeper") < F.col("dropped"))
        .filter(cos >= SEMDEDUP_THRESHOLD)
        .select(
            "keeper", "dropped", "cluster", F.round(cos, 6).alias("cos_sim")
        )
    )


#: shared covariance CTE chain (upper-triangle gram + means), reused
#: by e28's oracle and e34's power-iteration oracle so the two cannot
#: drift (same decimal-sum + ROUND-6 discipline in both)
_COV_CTES = f"""
    WITH ij AS (
      SELECT i.i AS dim_i, j.j AS dim_j
      FROM (SELECT UNNEST(range(0, {DIM})) AS i) i,
           (SELECT UNNEST(range(0, {DIM})) AS j) j
      WHERE j.j >= i.i
    ),
    n AS (SELECT COUNT(*) AS n FROM embeddings),
    means AS (
      SELECT i.i AS d,
             ROUND(CAST(SUM(CAST(embedding[i.i + 1]::DOUBLE AS DECIMAL(25,9))) AS DOUBLE)
                   / (SELECT n FROM n), 6) + 0.0 AS m
      FROM embeddings, (SELECT UNNEST(range(0, {DIM})) AS i) i
      GROUP BY i.i
    ),
    gram AS (
      SELECT ij.dim_i, ij.dim_j,
             ROUND(CAST(SUM(CAST(embedding[ij.dim_i + 1]::DOUBLE
                                 * embedding[ij.dim_j + 1]::DOUBLE
                                 AS DECIMAL(25,9))) AS DOUBLE)
                   / (SELECT n FROM n), 6) + 0.0 AS gram_mean
      FROM embeddings, ij
      GROUP BY ij.dim_i, ij.dim_j
    )
"""


@query(
    "e28_embedding_covariance",
    oracle=_COV_CTES
    + """
    SELECT g.dim_i, g.dim_j, g.gram_mean,
           g.gram_mean - mi.m * mj.m + 0.0 AS cov
    FROM gram g
    JOIN means mi ON mi.d = g.dim_i
    JOIN means mj ON mj.d = g.dim_j
    """,
)
def e28_embedding_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed covariance statistics over the embedding column —
    the aggregation pass behind PCA / ZCA whitening and low-rank
    analysis of an embedding corpus (the driver-side eigen step runs
    on this {DIM}x{DIM} result, which is tiny; computing THIS matrix
    is the only part that touches all N rows).

    Plan: each row expands map-side to its {DIM}*({DIM}+1)/2 upper-
    triangle products via nested transforms (no join, no second scan
    of the corpus); one partial-aggregated shuffle of the fixed cell
    space collapses everything to {DIM}x{DIM} rows. At 100 TB the
    shuffle payload is (#partitions x cells), independent of N.
    Determinism: e17's centroid discipline — DECIMAL(25,9) sums +
    ROUND(...,6) on gram and means. The coarse scale matters: a
    double -> DECIMAL(30,12) cast of float32-widened values can land
    a term's 12th digit differently in the two engines (observed at
    sf0.01, dim 37), so deep decimal scales are NOT cross-engine
    exact; quantizing the OUTPUT at 6dp absorbs that (FIXTURES.md).
    cov = gram - mi*mj then composes the identical rounded doubles
    with IEEE mult/sub — bit-identical without further rounding."""
    e = load(spark, sf_dir, "embeddings")
    emb = F.col("embedding")
    # upper-triangle (i, j, x_i * x_j) cells, one Generate per row
    cells = e.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.sequence(F.lit(0), F.lit(DIM - 1)),
                    lambda i: F.transform(
                        F.sequence(i, F.lit(DIM - 1)),
                        lambda j: F.struct(
                            i.alias("dim_i"),
                            j.alias("dim_j"),
                            (
                                F.element_at(emb, i + 1).cast("double")
                                * F.element_at(emb, j + 1).cast("double")
                            ).alias("p"),
                        ),
                    ),
                )
            )
        ).alias("c")
    ).select("c.dim_i", "c.dim_j", "c.p")
    n = e.count()  # one metadata-cheap count, reused as a literal
    gram = cells.groupBy("dim_i", "dim_j").agg(
        (
            F.round(
                F.sum(F.col("p").cast("decimal(25,9)")).cast("double") / F.lit(n), 6
            )
            + F.lit(0.0)  # -0.0 -> 0.0: ROUND's zero sign differs across engines
        ).alias("gram_mean")
    )
    dmeans = (
        e.select(F.posexplode(emb).alias("d", "x"))
        .groupBy("d")
        .agg(
            (
                F.round(
                    F.sum(F.col("x").cast("double").cast("decimal(25,9)")).cast(
                        "double"
                    )
                    / F.lit(n),
                    6,
                )
                + F.lit(0.0)
            ).alias("m")
        )
    )
    mi = dmeans.select(F.col("d").alias("dim_i"), F.col("m").alias("mi"))
    mj = dmeans.select(F.col("d").alias("dim_j"), F.col("m").alias("mj"))
    return (
        gram.join(F.broadcast(mi), "dim_i")
        .join(F.broadcast(mj), "dim_j")
        .select(
            "dim_i",
            "dim_j",
            "gram_mean",
            (F.col("gram_mean") - F.col("mi") * F.col("mj") + F.lit(0.0)).alias(
                "cov"
            ),
        )
    )


@query(
    "e30_embedding_quantize",
    oracle=f"""
    WITH scaled AS (
      SELECT vec_id,
             127.0 / GREATEST(
               list_reduce(list_transform(embedding, x -> ABS(x::DOUBLE)),
                           (a, b) -> GREATEST(a, b)), 1e-30) AS scale,
             embedding
      FROM embeddings
    ),
    q AS (
      SELECT vec_id, scale,
             list_transform(embedding,
                            x -> CAST(FLOOR(x::DOUBLE * scale + 0.5) AS BIGINT))
               AS qv,
             embedding
      FROM scaled
    )
    SELECT vec_id,
           scale,
           CAST(list_reduce(list_transform(range(1, {DIM} + 1),
                  i -> ABS(embedding[i]::DOUBLE - qv[i] / scale)),
                  (a, b) -> GREATEST(a, b)) AS DOUBLE) AS max_abs_err,
           CAST(list_reduce(qv, (a, b) -> GREATEST(a, b)) AS BIGINT) AS q_max,
           CAST(list_reduce(qv, (a, b) -> LEAST(a, b)) AS BIGINT) AS q_min
    FROM q
    """,
)
def e30_embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E-family: symmetric int8 quantization of the embedding column —
    per-vector max-abs scaling to [-127, 127] plus the reconstruction
    error audit. This is the storage/transport form ANN indexes use at
    100 TB (4x smaller than float32, SIMD-friendly dot products); the
    operator emits the quantization metadata (scale, q range) and the
    max absolute reconstruction error per vector so a deployment can
    gate on error before swapping the quantized column in.

    Determinism: scale and the quantized values derive from identical
    IEEE doubles in both engines; rounding is FLOOR(x*scale + 0.5) —
    floor of identical doubles, no engine-specific ROUND-half
    behavior anywhere (FIXTURES.md). Per-vector folds are index-order
    array ops (row properties), so no shuffle-order sensitivity; the
    whole operator is a map-side projection."""
    e = load(spark, sf_dir, "embeddings")
    emb = F.col("embedding")
    max_abs = F.aggregate(
        F.transform(emb, lambda x: F.abs(x.cast("double"))),
        F.lit(0.0),
        lambda a, b: F.greatest(a, b),
    )
    scaled = e.select(
        "vec_id",
        (F.lit(127.0) / F.greatest(max_abs, F.lit(1e-30))).alias("scale"),
        emb.alias("embedding"),
    )
    qv = F.transform(
        F.col("embedding"),
        lambda x: F.floor(x.cast("double") * F.col("scale") + F.lit(0.5)).cast(
            "bigint"
        ),
    )
    q = scaled.select("vec_id", "scale", qv.alias("qv"), "embedding")
    err = F.aggregate(
        F.zip_with(
            F.col("embedding"),
            F.col("qv"),
            lambda x, v: F.abs(x.cast("double") - v.cast("double") / F.col("scale")),
        ),
        F.lit(0.0),
        lambda a, b: F.greatest(a, b),
    )
    return q.select(
        "vec_id",
        "scale",
        err.alias("max_abs_err"),
        F.array_max("qv").cast("bigint").alias("q_max"),
        F.array_min("qv").cast("bigint").alias("q_min"),
    )


#: power-iteration oracle: 3 unrolled iterations over the shared cov
#: CTEs. Generated by loop so Spark and SQL iterate identically.
def _power_iter_ctes(iters: int) -> str:
    parts = [
        """,
    cov_m AS (
      SELECT g.dim_i, g.dim_j, g.gram_mean - mi.m * mj.m + 0.0 AS cov
      FROM gram g
      JOIN means mi ON mi.d = g.dim_i
      JOIN means mj ON mj.d = g.dim_j
    ),
    full_m AS (
      SELECT dim_i AS i, dim_j AS j, cov FROM cov_m
      UNION ALL
      SELECT dim_j AS i, dim_i AS j, cov FROM cov_m WHERE dim_i <> dim_j
    ),
    v0 AS (SELECT UNNEST(range(0, %d)) AS d, 0.125 AS x)"""
        % DIM
    ]
    for k in range(1, iters + 1):
        parts.append(
            f""",
    w{k} AS (
      SELECT i AS d,
             CAST(SUM(CAST(cov * v.x AS DECIMAL(25,9))) AS DOUBLE) AS w
      FROM full_m JOIN v{k-1} v ON full_m.j = v.d
      GROUP BY i
    ),
    n{k} AS (
      SELECT SQRT(CAST(SUM(CAST(w * w AS DECIMAL(25,9))) AS DOUBLE)) AS nrm
      FROM w{k}
    ),
    v{k} AS (
      SELECT d, ROUND(w / (SELECT nrm FROM n{k}), 6) + 0.0 AS x FROM w{k}
    )"""
        )
    return "".join(parts)


PCA_ITERS = 3


@query(
    "e34_pca_power_iteration",
    oracle=_COV_CTES
    + _power_iter_ctes(PCA_ITERS)
    + f"""
    SELECT d AS dim, x AS loading,
           ROUND((SELECT nrm FROM n{PCA_ITERS}), 6) + 0.0 AS eigenvalue
    FROM v{PCA_ITERS}
    ORDER BY dim
    """,
)
def e34_pca_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal component of the embedding corpus by POWER
    ITERATION over the distributed covariance matrix (e28) — the
    eigen-step behind PCA/ZCA whitening, which semantic-dedup
    pipelines (SemDeDup-style, e25) run before clustering so cosine
    distances are not dominated by a single high-variance direction.

    The split of labor is the scale story: the ONLY pass that touches
    all N rows is e28's covariance aggregation (shuffle payload fixed
    at DIM(DIM+1)/2 cells, independent of N); the iteration then runs
    on the DIMxDIM matrix — metadata-scale, broadcast-joined, 3
    matvec rounds unrolled on the driver as control flow with all
    data staying in DataFrames.

    Determinism (the interesting part — iterative float linear
    algebra under a bit-exact cross-engine gate): every matvec sum
    and the norm's sum-of-squares go through DECIMAL(25,9) (order-
    independent), sqrt and division are correctly-rounded IEEE ops
    (identical in both engines), and the vector is RE-QUANTIZED to
    6dp after each normalization, so both engines enter every round
    with bit-identical state — divergence cannot accumulate. The
    oracle's iteration CTEs are generated by the same loop count
    (PCA_ITERS) the Spark side runs."""
    cov = e28_embedding_covariance(spark, sf_dir).select("dim_i", "dim_j", "cov")
    full_m = cov.select(
        F.col("dim_i").alias("i"), F.col("dim_j").alias("j"), "cov"
    ).unionAll(
        cov.filter(F.col("dim_i") != F.col("dim_j")).select(
            F.col("dim_j").alias("i"), F.col("dim_i").alias("j"), "cov"
        )
    )
    full_m = full_m.localCheckpoint(eager=True)  # cov agg runs once
    v = spark.range(DIM).select(
        F.col("id").cast("int").alias("d"), F.lit(0.125).alias("x")
    )
    norm_col = None
    for _ in range(PCA_ITERS):
        w = (
            full_m.join(F.broadcast(v), full_m.j == v.d)
            .groupBy("i")
            .agg(
                F.sum((F.col("cov") * F.col("x")).cast("decimal(25,9)"))
                .cast("double")
                .alias("w")
            )
        )
        nrm = w.agg(
            F.sqrt(
                F.sum((F.col("w") * F.col("w")).cast("decimal(25,9)")).cast(
                    "double"
                )
            ).alias("nrm")
        )
        v = (
            w.join(F.broadcast(nrm))
            .select(
                F.col("i").alias("d"),
                (F.round(F.col("w") / F.col("nrm"), 6) + F.lit(0.0)).alias("x"),
            )
        )
        norm_col = nrm
    return (
        v.join(F.broadcast(norm_col))
        .select(
            F.col("d").alias("dim"),
            F.col("x").alias("loading"),
            (F.round(F.col("nrm"), 6) + F.lit(0.0)).alias("eigenvalue"),
        )
        .orderBy("dim")
    )


KEYWORDS_PER_CLUSTER = 10


@query(
    "e35_cluster_keywords",
    oracle=f"""
    WITH {_KMEANS_CTES},
    toks AS (
      SELECT a2.cid, UNNEST(string_split(LOWER(d.text), ' ')) AS token
      FROM a2 JOIN documents d ON d.doc_id = a2.vec_id
    ),
    tf AS (SELECT cid, token, COUNT(*) AS n FROM toks GROUP BY cid, token),
    dfx AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY token),
    scored AS (
      SELECT cid, token, n, df,
             CAST(n AS DOUBLE) * {K_CLUSTERS} / df AS score
      FROM tf JOIN dfx USING (token)
    )
    SELECT cid AS cluster, rn AS rank, token, n AS tf, df, score
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY cid
                                       ORDER BY score DESC, n DESC, token) AS rn
          FROM scored)
    WHERE rn <= {KEYWORDS_PER_CLUSTER}
    """,
)
def e35_cluster_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster labeling: top keywords per k-means cluster by a
    c-TF-IDF-style score (class-based TF-IDF, the BERTopic-family
    technique for naming semantic clusters in corpus-curation
    reports). The idf factor is the exact rational k/df (clusters
    over clusters-containing-token) instead of log(k/df) — monotone
    in the same ordering for fixed tf, and IEEE division of exact
    ints keeps the score bit-identical across engines with no
    rounding step (FIXTURES.md rule).

    Composes e21's two Lloyd rounds (vec_id aligns 1:1 with doc_id in
    the corpus) — the oracle reuses the SAME _KMEANS_CTES chain, so
    the cluster assignment cannot drift between the two engines.

    Scale: the tf aggregate shuffles (cluster, token) cells — bounded
    by k x vocabulary, not corpus size; df is vocabulary-sized; the
    top-10 window partitions by cluster over k x vocab rows. After
    e21's assignment (broadcast centroids, one scan), nothing here
    rereads the corpus more than the one token explode."""
    a2 = _two_lloyd_rounds(spark, sf_dir)
    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    toks = (
        a2.select("vec_id", "cid")
        .join(d, F.col("doc_id") == F.col("vec_id"))
        .select("cid", F.explode(F.split(F.lower("text"), " ")).alias("token"))
    )
    tf = toks.groupBy("cid", "token").agg(F.count("*").alias("n"))
    dfx = tf.groupBy("token").agg(F.count("*").alias("df"))
    scored = tf.join(dfx, "token").withColumn(
        "score",
        F.col("n").cast("double") * F.lit(float(K_CLUSTERS)) / F.col("df"),
    )
    w = W.partitionBy("cid").orderBy(F.col("score").desc(), F.col("n").desc(), "token")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= KEYWORDS_PER_CLUSTER)
        .select(
            F.col("cid").alias("cluster"),
            "rank",
            "token",
            F.col("n").alias("tf"),
            "df",
            "score",
        )
    )


@query(
    "e49_cluster_balanced_sample",
    oracle=f"""
    WITH {_KMEANS_CTES},
    counts AS (SELECT cid, COUNT(*) AS n_c FROM a2 GROUP BY cid),
    tgt AS (SELECT MIN(n_c) AS target FROM counts)
    SELECT a2.vec_id, a2.cid AS cluster, c.n_c,
           (('0x' || substr(md5('bal|' || CAST(a2.vec_id AS VARCHAR)), 1, 15))::BIGINT
              % c.n_c) < t.target AS kept
    FROM a2 JOIN counts c ON a2.cid = c.cid, tgt t
    """,
)
def e49_cluster_balanced_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E-family: TOPIC-BALANCED downsampling — equalize the e21
    cluster sizes by keeping ~min-cluster-size vectors from every
    cluster, chosen by a content-keyed hash (the semantic-level
    version of e15's per-source rebalance; public pipelines run this
    between clustering and training to stop one dominant topic from
    swamping the mixture). The keep test is EXACT integer arithmetic:
    hash(vec_id) mod n_c < target — no float rate, no rounding, and
    the expected kept count per cluster is target by construction.

    Scale: composes e21's broadcast-centroid assignment (no new
    full-corpus pass); cluster counts are k rows; the target is a
    1-row broadcast; the keep flag is map-side. Determinism: the
    sample is a pure function of (vec_id, cluster sizes), re-runnable
    and shard-order-independent — the e08/e45 deterministic-sampling
    discipline."""
    a2 = _two_lloyd_rounds(spark, sf_dir)
    counts = a2.groupBy("cid").agg(F.count("*").alias("n_c"))
    target = counts.agg(F.min("n_c").alias("target"))
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("bal|"), F.col("vec_id").cast("string"))), 1, 15
        ),
        16,
        10,
    ).cast("bigint")
    return (
        a2.select("vec_id", "cid")
        .join(F.broadcast(counts), "cid")
        .crossJoin(F.broadcast(target))
        .select(
            "vec_id",
            F.col("cid").alias("cluster"),
            "n_c",
            (F.pmod(h, F.col("n_c")) < F.col("target")).alias("kept"),
        )
    )


#: e58 block-wise int4 geometry: 8 blocks of 8 dims over DIM=64.
INT4_BLOCK = 8


@query(
    "e58_blockwise_int4",
    oracle=f"""
    WITH q AS (
      SELECT vec_id,
             list_transform(range(0, {DIM // INT4_BLOCK}), b ->
               list_max(list_transform(
                 list_slice(embedding, b * {INT4_BLOCK} + 1, b * {INT4_BLOCK} + {INT4_BLOCK}),
                 x -> abs(CAST(x AS DOUBLE))))
             ) AS absmax,
             embedding
      FROM embeddings
    ),
    s AS (
      SELECT vec_id, embedding,
             list_transform(absmax, a -> GREATEST(a, 1e-30) / 7.0) AS bscale,
             GREATEST(list_max(absmax), 1e-30) / 7.0 / 127.0 AS ss
      FROM q
    ),
    r AS (
      SELECT vec_id, ss,
             list_max(list_transform(range(1, {DIM + 1}), i ->
               abs(CAST(embedding[i] AS DOUBLE)
                   - FLOOR(CAST(embedding[i] AS DOUBLE)
                           / bscale[CAST((i - 1) // {INT4_BLOCK} AS INTEGER) + 1] + 0.5)
                     * (FLOOR(bscale[CAST((i - 1) // {INT4_BLOCK} AS INTEGER) + 1] / ss + 0.5) * ss))
             )) AS max_abs_err
      FROM s
    )
    SELECT vec_id, CAST({DIM // INT4_BLOCK} AS INTEGER) AS n_blocks,
           ss AS scale_of_scales, max_abs_err,
           CAST((4.0 * {DIM} + 8 * {DIM // INT4_BLOCK} + 32) / {DIM} AS DOUBLE)
             AS bits_per_value
    FROM r
    """,
)
def e58_blockwise_int4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E-family storage path: BLOCK-WISE INT4 quantization with DOUBLE
    QUANTIZATION of the scales (the QLoRA/bitsandbytes storage scheme,
    Dettmers et al. 2023, public): each 8-dim block gets an absmax
    int4 scale, and the per-block scales are THEMSELVES int8-quantized
    against one per-vector scale-of-scales — 4 bits/value + 8/8
    bits of quantized scale + one float32 per vector = 5.5 effective
    bits, vs e30's 8 (int8) and e37's 2 (PQ). The operator emits the
    per-vector reconstruction-error audit (the gate a deployment
    checks before swapping the stored column) and the effective
    bits/value, so the three storage points (e30/e37/e58) are
    directly comparable on one corpus.

    Scale: pure map-side array expressions — no shuffle, no UDF; at
    100 TB this runs at scan speed and the output column is 5.8x
    smaller than float32. Determinism: absmax/scales/codes derive
    from identical IEEE doubles with FLOOR(x+0.5) rounding (the e30
    rule); reconstruction uses the same association order
    (code * (qscale * ss)) in both engines; no aggregation over
    floats anywhere."""
    e = load(spark, sf_dir, "embeddings")
    nb = DIM // INT4_BLOCK
    emb = F.col("embedding")
    absmax = F.transform(
        F.sequence(F.lit(0), F.lit(nb - 1)),
        lambda b: F.aggregate(
            F.transform(
                F.slice(emb, b * INT4_BLOCK + 1, INT4_BLOCK),
                lambda x: F.abs(x.cast("double")),
            ),
            F.lit(0.0),
            lambda a, x: F.greatest(a, x),
        ),
    )
    s = e.select("vec_id", emb.alias("embedding"), absmax.alias("absmax"))
    bscale = F.transform(
        F.col("absmax"), lambda a: F.greatest(a, F.lit(1e-30)) / F.lit(7.0)
    )
    ss = (
        F.greatest(
            F.aggregate(
                F.col("absmax"), F.lit(0.0), lambda a, x: F.greatest(a, x)
            ),
            F.lit(1e-30),
        )
        / F.lit(7.0)
        / F.lit(127.0)
    )
    s2 = s.select("vec_id", "embedding", bscale.alias("bscale"), ss.alias("ss"))

    def recon_err():
        def term(i):
            # i is 1-based; block index = (i-1) // B
            blk = ((i - F.lit(1)) / F.lit(INT4_BLOCK)).cast("int") + F.lit(1)
            x = F.element_at("embedding", i).cast("double")
            bs = F.element_at("bscale", blk)
            qs = F.floor(bs / F.col("ss") + F.lit(0.5))
            code = F.floor(x / bs + F.lit(0.5))
            return F.abs(x - code * (qs * F.col("ss")))

        return F.aggregate(
            F.transform(F.sequence(F.lit(1), F.lit(DIM)), term),
            F.lit(0.0),
            lambda a, x: F.greatest(a, x),
        )

    return s2.select(
        "vec_id",
        F.lit(nb).cast("int").alias("n_blocks"),
        F.col("ss").alias("scale_of_scales"),
        recon_err().alias("max_abs_err"),
        F.lit((4.0 * DIM + 8 * nb + 32) / DIM).cast("double").alias(
            "bits_per_value"
        ),
    )


@query(
    "e60_incontext_packing",
    oracle=f"""
    WITH {_KMEANS_CTES},
    tok AS (
      SELECT doc_id, len(string_split(text, ' ')) AS n_tok FROM documents
    ),
    j AS (
      SELECT a2.cid, a2.vec_id AS doc_id, t.n_tok
      FROM a2 JOIN tok t ON t.doc_id = a2.vec_id
    ),
    c AS (
      SELECT cid, doc_id, n_tok,
             SUM(n_tok) OVER (PARTITION BY cid ORDER BY doc_id) AS cum
      FROM j
    )
    SELECT doc_id, cid AS cluster, n_tok,
           CAST((cum - n_tok) // 512 AS BIGINT) AS pack_id
    FROM c
    """,
)
def e60_incontext_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E-family: SEMANTIC sequence packing in the In-Context
    Pretraining shape (Shi et al. 2023, public): pack RELATED
    documents into the same fixed-token-budget context windows by
    grouping on the e21 k-means cluster before the e09 packing
    cumsum — so a training sequence carries topically coherent
    neighbors instead of random shards, the property the paper shows
    improves in-context learning. Within a cluster the order is the
    stable doc_id (the paper's nearest-neighbor path ordering is the
    documented upgrade: replace ORDER BY doc_id with the e48 kNN-graph
    traversal — same window, different sort key).

    Scale: composes e21's broadcast-centroid assignment (no new
    corpus pass); the packing window is PARTITIONED BY CLUSTER —
    parallel across clusters, no global ordering; token counts are a
    map-side projection. Packs inherit e09's budget (512)."""
    a2 = _two_lloyd_rounds(spark, sf_dir)
    d = load(spark, sf_dir, "documents").select(
        "doc_id", F.size(F.split(F.col("text"), " ")).alias("n_tok")
    )

    j = a2.select(F.col("vec_id").alias("doc_id"), "cid").join(d, "doc_id")
    w = W.partitionBy("cid").orderBy("doc_id")
    return j.select(
        "doc_id",
        F.col("cid").alias("cluster"),
        "n_tok",
        F.floor((F.sum("n_tok").over(w) - F.col("n_tok")) / 512).alias(
            "pack_id"
        ),
    )
