"""Corpus language-model statistics (LLM-pipeline E-family
extensions): vocabulary induction / coverage curves and a bigram
conditional-probability model — the counting passes behind tokenizer
training (BPE's seed vocabulary), corpus-mixture diagnostics, and
cheap LM-based quality scoring (extends e14's unigram surprisal to
conditional bigram structure).

Scale posture: both operators are pure count pipelines — explode,
hash-aggregate with map-side partials, and top-k via
TakeOrderedAndProject — so the shuffles carry (token, count) pairs,
never documents. Cumulative/normalizing windows run only over
post-limit survivor sets (bounded rows), and scalar totals broadcast
as 1-row joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from dynamodb_zero_etl_s3tables_spark.operators.registry import query
from dynamodb_zero_etl_s3tables_spark.sources.testdata import load

VOCAB_TOP_K = 100
BIGRAM_TOP_K = 200


@query(
    "e22_vocab_coverage",
    oracle=f"""
    WITH counts AS (
      SELECT token, COUNT(*) AS n
      FROM (SELECT UNNEST(string_split(LOWER(text), ' ')) AS token
            FROM documents)
      GROUP BY token
    ),
    tot AS (SELECT CAST(SUM(n) AS BIGINT) AS t FROM counts),
    top AS (SELECT token, n FROM counts ORDER BY n DESC, token LIMIT {VOCAB_TOP_K})
    SELECT token, n,
           CAST(ROW_NUMBER() OVER (ORDER BY n DESC, token) AS BIGINT) AS rank,
           CAST(SUM(n) OVER (ORDER BY n DESC, token
                             ROWS UNBOUNDED PRECEDING) AS DOUBLE)
                 / t AS cum_share
    FROM top, tot
    """,
)
def e22_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E-family: vocabulary coverage curve — the top-K corpus tokens
    by frequency with each prefix's cumulative share of all token
    occurrences (the curve that sizes a tokenizer vocabulary: "K
    types cover X% of the corpus"). Token counting is one partial-
    aggregated shuffle of (token, count); top-K rides
    TakeOrderedAndProject; the cumulative window and the 1-row total
    broadcast touch only the K survivors."""
    d = load(spark, sf_dir, "documents")
    counts = (
        d.select(F.explode(F.split(F.lower("text"), " ")).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("n"))
    )
    total = counts.agg(F.sum("n").alias("t"))
    top = counts.orderBy(F.col("n").desc(), "token").limit(VOCAB_TOP_K)
    # Single-partition rank over the K-row post-limit result is the
    # intended plan (warning silenced at the logger in session.tune;
    # test_plans.py gates partition-less windows to bounded inputs).
    # cum_share is IEEE division of exact ints — bit-identical across
    # engines, so no ROUND (FIXTURES.md rule).
    w = W.partitionBy(F.lit(1)).orderBy(F.col("n").desc(), "token")
    return (
        top.crossJoin(F.broadcast(total))
        .select(
            "token",
            "n",
            F.row_number().over(w).cast("bigint").alias("rank"),
            (
                F.sum("n")
                .over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
                .cast("double")
                / F.col("t")
            ).alias("cum_share"),
        )
    )


@query(
    "e23_bigram_model",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split(LOWER(text), ' ') AS t FROM documents
    ),
    bigrams AS (
      SELECT UNNEST(list_transform(range(1, len(t)), i -> t[i])) AS w1,
             UNNEST(list_transform(range(1, len(t)), i -> t[i + 1])) AS w2
      FROM toks WHERE len(t) >= 2
    ),
    c12 AS (SELECT w1, w2, COUNT(*) AS n12 FROM bigrams GROUP BY w1, w2),
    c1 AS (SELECT w1, CAST(SUM(n12) AS BIGINT) AS n1 FROM c12 GROUP BY w1)
    SELECT c12.w1, c12.w2, n12, n1,
           CAST(n12 AS DOUBLE) / n1 AS p_w2_given_w1
    FROM c12 JOIN c1 ON c12.w1 = c1.w1
    ORDER BY n12 DESC, c12.w1, c12.w2
    LIMIT {BIGRAM_TOP_K}
    """,
)
def e23_bigram_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E-family: bigram conditional-probability model — counts of
    adjacent token pairs and P(w2 | w1) for the top pairs, the
    order-2 extension of e14's unigram surprisal (together they give
    a cheap interpolated-LM quality score; public data pipelines use
    exactly these tables for KenLM-style filtering). Bigram pairs
    explode map-side from each document's token array; the context
    marginal n1 re-aggregates the (w1, w2) counts — kilobyte rows —
    rather than re-scanning the corpus, and the final top-K is
    TakeOrderedAndProject."""
    d = load(spark, sf_dir, "documents")
    toks = F.split(F.lower("text"), " ")
    pairs = (
        d.select(toks.alias("t"))
        .filter(F.size("t") >= 2)
        .select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("t") - 1),
                    lambda i: F.struct(
                        F.element_at("t", i).alias("w1"),
                        F.element_at("t", i + 1).alias("w2"),
                    ),
                )
            ).alias("b")
        )
        .select("b.w1", "b.w2")
    )
    c12 = pairs.groupBy("w1", "w2").agg(F.count("*").alias("n12"))
    c1 = c12.groupBy("w1").agg(F.sum("n12").alias("n1"))
    return (
        c12.join(c1, "w1")
        .select(
            "w1",
            "w2",
            "n12",
            "n1",
            # IEEE division of exact ints — bit-identical across
            # engines, so no ROUND (FIXTURES.md rule)
            (F.col("n12").cast("double") / F.col("n1")).alias(
                "p_w2_given_w1"
            ),
        )
        .orderBy(F.col("n12").desc(), "w1", "w2")
        .limit(BIGRAM_TOP_K)
    )


BPE_TOP_K = 50


@query(
    "e32_bpe_pair_counts",
    oracle=f"""
    WITH words AS (
      SELECT w AS word, COUNT(*) AS n
      FROM (SELECT UNNEST(string_split(LOWER(text), ' ')) AS w
            FROM documents)
      WHERE LENGTH(w) >= 2
      GROUP BY w
    ),
    pairs AS (
      SELECT substring(word, CAST(i AS INTEGER), 2) AS pair, n
      FROM words, UNNEST(range(1, LENGTH(word))) AS t(i)
    )
    SELECT pair,
           CAST(SUM(n) AS BIGINT) AS freq,
           COUNT(*) AS n_types
    FROM pairs
    GROUP BY pair
    ORDER BY freq DESC, pair
    LIMIT {BPE_TOP_K}
    """,
)
def e32_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E-family: one BPE (byte-pair-encoding) training iteration — the
    adjacent-symbol-pair frequency count that tokenizer training
    (Sennrich et al. 2016, public) runs repeatedly to pick the next
    merge. The classic distributed formulation: collapse the corpus to
    a (word, count) vocabulary FIRST (one hash-agg shuffle whose
    cardinality is vocab-sized, not corpus-sized), then explode each
    word's adjacent character pairs weighted by the word count — so
    at 100 TB the pair-count shuffle carries thousands of rows, not
    trillions. `n_types` (distinct word shapes containing the pair)
    rides along as the tie-diagnostic. Top-K by frequency with the
    pair string as a total-order tiebreak; all-integer arithmetic, so
    the hash cannot drift."""
    d = load(spark, sf_dir, "documents")
    words = (
        d.select(F.explode(F.split(F.lower("text"), " ")).alias("word"))
        .filter(F.length("word") >= 2)
        .groupBy("word")
        .agg(F.count("*").alias("n"))
    )
    pairs = words.select(
        F.col("n"),
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("word") - 1),
                lambda i: F.col("word").substr(i, F.lit(2)),
            )
        ).alias("pair"),
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("n").alias("freq"), F.count("*").alias("n_types"))
        .orderBy(F.col("freq").desc(), "pair")
        .limit(BPE_TOP_K)
    )
