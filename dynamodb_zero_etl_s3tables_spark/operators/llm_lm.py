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
    trillions. `n_types` (pair OCCURRENCES across word positions — a
    word counts once per position the pair appears at, so 'aaaa'
    contributes 3 to 'a a'; both engines count identically)
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


# Shared CTE chain ending in agg = (doc_id, n_bigrams, cross_entropy)
# under the add-one-smoothed in-corpus bigram model; e42 gates on it,
# e47 terciles it, e51 reports staged attrition with it.
_XENT_CTES = """toks AS (
      SELECT doc_id, string_split(LOWER(text), ' ') AS t FROM documents
    ),
    bg AS (
      SELECT doc_id,
             UNNEST(list_transform(range(1, len(t)), i -> t[i])) AS w1,
             UNNEST(list_transform(range(1, len(t)), i -> t[i + 1])) AS w2
      FROM toks WHERE len(t) >= 2
    ),
    dpc AS (
      SELECT doc_id, w1, w2, COUNT(*) AS cnt FROM bg GROUP BY doc_id, w1, w2
    ),
    c12 AS (SELECT w1, w2, COUNT(*) AS n12 FROM bg GROUP BY w1, w2),
    c1 AS (SELECT w1, CAST(SUM(n12) AS BIGINT) AS n1 FROM c12 GROUP BY w1),
    v AS (
      SELECT COUNT(DISTINCT tok) AS vsz
      FROM (SELECT UNNEST(t) AS tok FROM toks)
    ),
    terms AS (
      SELECT doc_id, cnt,
             cnt * (ln(n1 + vsz) - ln(n12 + 1)) AS nll
      FROM dpc JOIN c12 USING (w1, w2) JOIN c1 USING (w1), v
    ),
    agg AS (
      SELECT doc_id,
             CAST(SUM(cnt) AS BIGINT) AS n_bigrams,
             ROUND(CAST(SUM(CAST(nll AS DECIMAL(25,9))) AS DOUBLE)
                   / SUM(cnt), 6) AS cross_entropy
      FROM terms GROUP BY doc_id
    )"""


#: e42 keep gate: mean bigram cross-entropy (nats) below this passes
XENT_KEEP_MAX = 3.6


def _bigram_frames(spark: SparkSession, sf_dir: str):
    """Shared bigram decomposition — the Spark twin of the oracle-side
    _XENT_CTES prefix (r8 review: the ~30-line chain was copy-pasted
    verbatim in e42/e47/e53 while the SQL side was already factored
    precisely so the engines cannot drift): returns (tdf, bg, dpc,
    c12, v)."""
    d = load(spark, sf_dir, "documents")
    tdf = d.select("doc_id", F.split(F.lower("text"), " ").alias("t"))
    bg = (
        tdf.filter(F.size("t") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("t") - 1),
                    lambda i: F.struct(
                        F.element_at("t", i).alias("w1"),
                        F.element_at("t", i + 1).alias("w2"),
                    ),
                )
            ).alias("b"),
        )
        .select("doc_id", "b.w1", "b.w2")
    )
    dpc = bg.groupBy("doc_id", "w1", "w2").agg(F.count("*").alias("cnt"))
    c12 = bg.groupBy("w1", "w2").agg(F.count("*").alias("n12"))
    v = tdf.select(F.explode("t").alias("tok")).agg(
        F.countDistinct("tok").alias("vsz")
    )
    return tdf, bg, dpc, c12, v


def _xent_terms(spark: SparkSession, sf_dir: str):
    """Per-(doc, bigram-type) Laplace cross-entropy terms (doc_id,
    cnt, nll) — e42's scoring chain, shared with e47."""
    tdf, bg, dpc, c12, v = _bigram_frames(spark, sf_dir)
    c1 = c12.groupBy("w1").agg(F.sum("n12").alias("n1"))
    return (
        dpc.join(c12, ["w1", "w2"])
        .join(c1, "w1")
        .crossJoin(F.broadcast(v))
        .select(
            "doc_id",
            "cnt",
            (
                F.col("cnt")
                * (
                    F.log(F.col("n1") + F.col("vsz"))
                    - F.log(F.col("n12") + F.lit(1))
                )
            ).alias("nll"),
        )
    )


@query(
    "e42_bigram_perplexity_filter",
    oracle=f"""
    WITH {_XENT_CTES}
    SELECT doc_id, n_bigrams, cross_entropy,
           cross_entropy < {XENT_KEEP_MAX} AS kept
    FROM agg
    """,
)
def e42_bigram_perplexity_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E-family: LM-perplexity quality filter (the CCNet gate) — score
    every document by its mean bigram cross-entropy under the corpus's
    own add-one-smoothed bigram model (e23's tables with Laplace
    smoothing: P(w2|w1) = (n12+1)/(n1+V)), and keep documents below a
    fixed nats threshold. High cross-entropy = improbable token
    transitions = boilerplate/garbled text; public pipelines run
    exactly this shape with a KenLM model in place of the in-corpus
    bigram table — swapping the model swaps one join side, not the
    plan.

    Scale: the model tables (c12/c1) are (token-pair, count) rows —
    the join keys are uniformly-hashed strings, and each document
    pre-aggregates its distinct pairs (dpc) so the join fan-in is
    types-per-doc, not tokens-per-doc. V is a 1-row broadcast. The
    per-doc sum routes cnt*log terms through DECIMAL(25,9) and rounds
    to 6dp so both engines agree bit-exactly; the keep flag compares
    the ROUNDED value, so it cannot straddle an ulp."""
    terms = _xent_terms(spark, sf_dir)
    agg = terms.groupBy("doc_id").agg(
        F.sum("cnt").cast("bigint").alias("n_bigrams"),
        F.round(
            F.sum(F.col("nll").cast("decimal(25,9)")).cast("double")
            / F.sum("cnt"),
            6,
        ).alias("cross_entropy"),
    )
    return agg.select(
        "doc_id",
        "n_bigrams",
        "cross_entropy",
        (F.col("cross_entropy") < XENT_KEEP_MAX).alias("kept"),
    )


@query(
    "e47_ccnet_lm_partition",
    oracle=f"""
    WITH {_XENT_CTES},
    parts AS (
      SELECT doc_id, cross_entropy,
             NTILE(3) OVER (ORDER BY cross_entropy, doc_id) AS tercile
      FROM agg
    )
    SELECT doc_id, cross_entropy,
           CASE tercile WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
                        ELSE 'tail' END AS part
    FROM parts
    """,
)
def e47_ccnet_lm_partition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E-family: the CCNet HEAD/MIDDLE/TAIL partition — split the
    corpus into perplexity terciles under e42's in-corpus bigram
    model (head = most fluent third, the slice CCNet keeps for LM
    training; tail = the noisiest; public: Wenzek et al. 2020). The
    tercile boundary is positional (NTILE semantics over the total
    order (cross_entropy, doc_id)) — no quantile estimation, no ties
    ambiguity.

    Scale: scoring is e42's shape (pre-aggregated pair join + one
    per-doc aggregate). The global ranking deliberately does NOT use
    an unpartitioned window (which would funnel the corpus into one
    task — the anti-pattern tests/test_plans.py forbids): it is the
    classic DISTRIBUTED RANKING construction — range-repartition on
    the order key, rank WITHIN each partition, then add per-partition
    row-count offsets (a #partitions-row metadata collect, broadcast
    back as a literal map). The final rank is exact and independent
    of where the sampled range boundaries fall, because rank depends
    only on the total order; NTILE bucket sizes are then reproduced
    arithmetically from N. The oracle states the same result as a
    plain NTILE."""
    terms = _xent_terms(spark, sf_dir)
    agg = terms.groupBy("doc_id").agg(
        F.round(
            F.sum(F.col("nll").cast("decimal(25,9)")).cast("double")
            / F.sum("cnt"),
            6,
        ).alias("cross_entropy"),
    )
    # distributed exact ranking: range-partition on the order key,
    # rank locally, then shift by the preceding partitions' counts.
    # Parallelism follows the session's shuffle-partition setting
    # (env-tunable via spark.sql.shuffle.partitions) — a hard-coded
    # count would make 100TB/32 giant range tasks; the final rank is
    # exact at ANY partition count because it depends only on the
    # total order (pinned by the same-hash-at-two-settings pytest).
    n_range = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    ranged = (
        agg.repartitionByRange(n_range, "cross_entropy", "doc_id")
        .withColumn("pid", F.spark_partition_id())
        .localCheckpoint(eager=True)  # pin pid before the two branches
    )
    counts = sorted(
        (r["pid"], r["n"])
        for r in ranged.groupBy("pid").agg(F.count("*").alias("n")).collect()
    )
    offsets, acc = {}, 0
    for pid, n in counts:
        offsets[pid] = acc
        acc += n
    n_total = acc
    base, rem = divmod(n_total, 3)
    b1 = base + (1 if rem >= 1 else 0)
    b2 = b1 + base + (1 if rem >= 2 else 0)
    off = F.create_map(
        *[F.lit(x) for kv in offsets.items() for x in kv]
    )[F.col("pid")]
    local_rank = F.row_number().over(
        W.partitionBy("pid").orderBy("cross_entropy", "doc_id")
    )
    rank = off + local_rank
    return ranged.select(
        "doc_id",
        "cross_entropy",
        F.when(rank <= b1, "head")
        .when(rank <= b2, "middle")
        .otherwise("tail")
        .alias("part"),
    )


@query(
    "e51_filter_attrition",
    oracle=f"""
    WITH {_XENT_CTES},
    m AS (
      SELECT doc_id, n_words, f1,
             (n_words BETWEEN 10 AND 100000) AS f2,
             (mwl BETWEEN 2 AND 12 AND sym < 0.2) AS f3
      FROM (
        SELECT doc_id,
               len(string_split(text, ' ')) AS n_words,
               CAST(length(replace(text, ' ', '')) AS DOUBLE)
                 / len(string_split(text, ' ')) AS mwl,
               CAST(length(regexp_replace(text, '[A-Za-z0-9 ]', '', 'g')) AS DOUBLE)
                 / length(text) AS sym,
               MIN(doc_id) OVER (PARTITION BY md5(text)) = doc_id AS f1
        FROM documents WHERE length(text) > 0
      )
    ),
    j AS (
      SELECT m.*, COALESCE(a.cross_entropy < {XENT_KEEP_MAX}, FALSE) AS f4
      FROM m LEFT JOIN agg a ON m.doc_id = a.doc_id
    )
    SELECT 0 AS stage_idx, 'raw' AS stage,
           COUNT(*) AS n_docs, CAST(SUM(n_words) AS BIGINT) AS n_tokens FROM j
    UNION ALL
    SELECT 1, 'exact_dedup', COUNT(*), CAST(SUM(n_words) AS BIGINT)
    FROM j WHERE f1
    UNION ALL
    SELECT 2, 'length_gate', COUNT(*), CAST(SUM(n_words) AS BIGINT)
    FROM j WHERE f1 AND f2
    UNION ALL
    SELECT 3, 'word_shape_gate', COUNT(*), CAST(SUM(n_words) AS BIGINT)
    FROM j WHERE f1 AND f2 AND f3
    UNION ALL
    SELECT 4, 'perplexity_gate', COUNT(*), CAST(SUM(n_words) AS BIGINT)
    FROM j WHERE f1 AND f2 AND f3 AND f4
    """,
)
def e51_filter_attrition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E-family reporting capstone: the FILTER-ATTRITION FUNNEL — the
    staged survivor table every corpus paper publishes ("started with
    N docs / T tokens; exact dedup kept X; length gate kept Y; ...").
    Stages compose cumulatively in the e38/e41 pipeline order: exact
    dedup -> length gate -> word-shape gate (mean word length +
    symbol ratio) -> the e42 perplexity gate; documents too short to
    carry a bigram fail the perplexity stage by definition.

    Scale: ALL five stage rows come from ONE conditional-aggregation
    pass over the per-doc flags frame (no per-stage re-scan); the
    1-row result unpivots driver-free via ``stack``. The flags
    themselves are one scan of map-side measures + the bounded e42
    model join + one content-hash window. At 100 TB this is a
    single-digit number of shuffles producing a 5-row report — the
    cheapest continuously-publishable health metric a corpus team
    owns. Determinism: every reported value is an integer count."""

    d = load(spark, sf_dir, "documents").filter(F.length("text") > 0)
    n_words = F.size(F.split(F.col("text"), " "))
    mwl = F.length(F.regexp_replace("text", " ", "")).cast("double") / n_words
    sym = (
        F.length(F.regexp_replace("text", "[A-Za-z0-9 ]", "")).cast("double")
        / F.length("text")
    )
    keeper = F.row_number().over(W.partitionBy(F.md5("text")).orderBy("doc_id")) == 1
    m = d.select(
        "doc_id",
        n_words.alias("n_words"),
        keeper.alias("f1"),
        n_words.between(10, 100000).alias("f2"),
        (mwl.between(2, 12) & (sym < 0.2)).alias("f3"),
    )
    xent = e42_bigram_perplexity_filter(spark, sf_dir).select(
        "doc_id", F.col("kept").alias("f4raw")
    )
    j = m.join(xent, "doc_id", "left").withColumn(
        "f4", F.coalesce(F.col("f4raw"), F.lit(False))
    )
    s1 = F.col("f1")
    s2 = s1 & F.col("f2")
    s3 = s2 & F.col("f3")
    s4 = s3 & F.col("f4")
    wide = j.agg(
        F.count("*").alias("n0"),
        F.sum("n_words").alias("t0"),
        F.count(F.when(s1, 1)).alias("n1"),
        F.sum(F.when(s1, F.col("n_words"))).alias("t1"),
        F.count(F.when(s2, 1)).alias("n2"),
        F.sum(F.when(s2, F.col("n_words"))).alias("t2"),
        F.count(F.when(s3, 1)).alias("n3"),
        F.sum(F.when(s3, F.col("n_words"))).alias("t3"),
        F.count(F.when(s4, 1)).alias("n4"),
        F.sum(F.when(s4, F.col("n_words"))).alias("t4"),
    )
    return wide.selectExpr(
        "stack(5, "
        "0, 'raw', n0, t0, "
        "1, 'exact_dedup', n1, t1, "
        "2, 'length_gate', n2, t2, "
        "3, 'word_shape_gate', n3, t3, "
        "4, 'perplexity_gate', n4, t4"
        ") AS (stage_idx, stage, n_docs, n_tokens)"
    )


#: absolute discount for the Kneser-Ney model (Chen & Goodman 1998's
#: standard fixed discount; in-corpus bigrams have n12 >= 1 > D, so
#: the discounted mass is always positive and no max() is needed)
KN_DISCOUNT = 0.75


@query(
    "e53_kneser_ney_score",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split(LOWER(text), ' ') AS t FROM documents
    ),
    bg AS (
      SELECT doc_id,
             UNNEST(list_transform(range(1, len(t)), i -> t[i])) AS w1,
             UNNEST(list_transform(range(1, len(t)), i -> t[i + 1])) AS w2
      FROM toks WHERE len(t) >= 2
    ),
    dpc AS (
      SELECT doc_id, w1, w2, COUNT(*) AS cnt FROM bg GROUP BY doc_id, w1, w2
    ),
    c12 AS (SELECT w1, w2, COUNT(*) AS n12 FROM bg GROUP BY w1, w2),
    c1k AS (
      SELECT w1, CAST(SUM(n12) AS BIGINT) AS n1, COUNT(*) AS n1p
      FROM c12 GROUP BY w1
    ),
    cont AS (SELECT w2, COUNT(*) AS n1c FROM c12 GROUP BY w2),
    v AS (
      SELECT COUNT(DISTINCT tok) AS vsz
      FROM (SELECT UNNEST(t) AS tok FROM toks)
    ),
    nt AS (SELECT COUNT(*) AS ntypes FROM c12),
    terms AS (
      SELECT doc_id, cnt,
             cnt * (ln(n1 + vsz) - ln(n12 + 1)) AS nll_lp,
             cnt * (-ln((n12 - {KN_DISCOUNT}) / n1
                        + (({KN_DISCOUNT} * n1p) / n1)
                          * (n1c / ntypes))) AS nll_kn
      FROM dpc JOIN c12 USING (w1, w2) JOIN c1k USING (w1)
               JOIN cont USING (w2), v, nt
    ),
    agg AS (
      SELECT doc_id,
             CAST(SUM(cnt) AS BIGINT) AS n_bigrams,
             ROUND(CAST(SUM(CAST(nll_lp AS DECIMAL(25,9))) AS DOUBLE)
                   / SUM(cnt), 6) AS ce_laplace,
             ROUND(CAST(SUM(CAST(nll_kn AS DECIMAL(25,9))) AS DOUBLE)
                   / SUM(cnt), 6) AS ce_kn
      FROM terms GROUP BY doc_id
    )
    SELECT doc_id, n_bigrams, ce_laplace, ce_kn,
           ROUND(ce_laplace - ce_kn, 6) AS kn_gain
    FROM agg
    """,
)
def e53_kneser_ney_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E-family: KNESER-NEY smoothed bigram scoring — the standard LM
    smoothing (Kneser & Ney 1995; Chen & Goodman 1998, public; the
    model family KenLM serves in production CCNet filters) scored
    side by side with e42's add-one baseline:

        P_KN(w2|w1) = (n12 - D)/n1 + (D * N1+(w1,.)/n1) * Pcont(w2)
        Pcont(w2)   = N1+(.,w2) / N1+(.,.)

    Absolute discounting redistributes mass to a CONTINUATION
    distribution (how many distinct contexts a word follows, not how
    often it occurs) — the correction that stops high-frequency but
    context-bound tokens from looking fluent. ``kn_gain`` (add-one CE
    minus KN CE per doc) is the per-document smoothing dividend.

    Scale: two extra model tables over e42's — context fertility
    N1+(w1,.) rides the SAME c1 aggregate (a COUNT(*) next to the
    SUM), continuation counts are one (w2, count) aggregate over the
    bigram-type table (types-sized, not corpus-sized), and the type
    total is a 1-row broadcast. The per-doc join fan-in stays
    distinct-pairs-per-doc. Determinism: the probability expression
    is written with IDENTICAL association order in both engines, each
    nll term quantizes through DECIMAL(25,9), and the final values
    round to 6dp; kn_gain subtracts the two ROUNDED values."""
    tdf, bg, dpc, c12, v = _bigram_frames(spark, sf_dir)
    c1k = c12.groupBy("w1").agg(
        F.sum("n12").alias("n1"), F.count("*").alias("n1p")
    )
    cont = c12.groupBy("w2").agg(F.count("*").alias("n1c"))
    nt = c12.agg(F.count("*").alias("ntypes"))
    p_kn = (F.col("n12") - F.lit(KN_DISCOUNT)) / F.col("n1") + (
        (F.lit(KN_DISCOUNT) * F.col("n1p")) / F.col("n1")
    ) * (F.col("n1c") / F.col("ntypes"))
    terms = (
        dpc.join(c12, ["w1", "w2"])
        .join(c1k, "w1")
        .join(cont, "w2")
        .crossJoin(F.broadcast(v))
        .crossJoin(F.broadcast(nt))
        .select(
            "doc_id",
            "cnt",
            (
                F.col("cnt")
                * (
                    F.log(F.col("n1") + F.col("vsz"))
                    - F.log(F.col("n12") + F.lit(1))
                )
            ).alias("nll_lp"),
            (F.col("cnt") * (-F.log(p_kn))).alias("nll_kn"),
        )
    )
    agg = terms.groupBy("doc_id").agg(
        F.sum("cnt").cast("bigint").alias("n_bigrams"),
        F.round(
            F.sum(F.col("nll_lp").cast("decimal(25,9)")).cast("double")
            / F.sum("cnt"),
            6,
        ).alias("ce_laplace"),
        F.round(
            F.sum(F.col("nll_kn").cast("decimal(25,9)")).cast("double")
            / F.sum("cnt"),
            6,
        ).alias("ce_kn"),
    )
    return agg.select(
        "doc_id",
        "n_bigrams",
        "ce_laplace",
        "ce_kn",
        F.round(F.col("ce_laplace") - F.col("ce_kn"), 6).alias("kn_gain"),
    )


#: e59 DoReMi mixing: weight = (1-SMOOTH)*softmax(excess) + SMOOTH/K
DOREMI_SMOOTH_NUM = 1
DOREMI_SMOOTH_DEN = 3


@query(
    "e59_doremi_mixture",
    oracle=f"""
    WITH {_XENT_CTES},
    src AS (
      SELECT d.source, a.doc_id, a.cross_entropy
      FROM agg a JOIN documents d USING (doc_id)
    ),
    per AS (
      SELECT source, COUNT(*) AS n_docs,
             ROUND(CAST(SUM(CAST(cross_entropy AS DECIMAL(25,9))) AS DOUBLE)
                   / COUNT(*), 6) AS avg_ce
      FROM src GROUP BY source
    ),
    ref AS (
      SELECT ROUND(CAST(SUM(CAST(cross_entropy AS DECIMAL(25,9))) AS DOUBLE)
                   / COUNT(*), 6) AS ref_ce
      FROM src
    ),
    ex AS (
      SELECT source, n_docs, avg_ce,
             ROUND(avg_ce - ref_ce, 6) AS excess,
             EXP(ROUND(avg_ce - ref_ce, 6)) AS raw
      FROM per, ref
    ),
    tot AS (
      SELECT CAST(SUM(CAST(raw AS DECIMAL(25,9))) AS DOUBLE) AS sraw,
             COUNT(*) AS k
      FROM ex
    )
    SELECT source, n_docs, avg_ce, excess,
           ROUND((1.0 - {DOREMI_SMOOTH_NUM}.0 / {DOREMI_SMOOTH_DEN}.0) * (raw / sraw)
                 + ({DOREMI_SMOOTH_NUM}.0 / {DOREMI_SMOOTH_DEN}.0) / k, 6) AS weight
    FROM ex, tot
    """,
)
def e59_doremi_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E-family: DOMAIN MIXTURE REWEIGHTING in the DoReMi shape (Xie
    et al. 2023, public): per-source EXCESS LOSS (mean bigram
    cross-entropy of the source minus the corpus reference — e42's
    model standing in for the proxy/reference model pair) drives
    exponentiated-gradient weights, smoothed with the uniform
    distribution (weight = 2/3 softmax(excess) + 1/3 uniform, the
    paper's uniform-mixing step). Sources whose text the LM finds
    hardest get upweighted — the training-mixture table a 100 TB
    curation run feeds its sampler. One multiplicative-weights round
    over STATIC excess losses (the paper re-trains its proxy between
    rounds; each later round reuses this exact query shape with
    refreshed losses).

    Scale: per-doc CE is e42's audited one-token-shuffle plan; from
    there everything is source-grain — K rows (sources) through a
    softmax with a 1-row broadcast total. Determinism: per-doc and
    per-source means route through DECIMAL(25,9) and round to 6dp
    BEFORE exp (identical IEEE exp input both engines); the exp-sum
    quantizes through DECIMAL; final weights round to 6dp."""
    ce = e42_bigram_perplexity_filter(spark, sf_dir).select(
        "doc_id", "cross_entropy"
    )
    d = load(spark, sf_dir, "documents").select("doc_id", "source")
    src = ce.join(d, "doc_id")
    per = src.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.round(
            F.sum(F.col("cross_entropy").cast("decimal(25,9)")).cast("double")
            / F.count("*"),
            6,
        ).alias("avg_ce"),
    )
    ref = src.agg(
        F.round(
            F.sum(F.col("cross_entropy").cast("decimal(25,9)")).cast("double")
            / F.count("*"),
            6,
        ).alias("ref_ce")
    )
    ex = per.crossJoin(F.broadcast(ref)).select(
        "source",
        "n_docs",
        "avg_ce",
        F.round(F.col("avg_ce") - F.col("ref_ce"), 6).alias("excess"),
        F.exp(F.round(F.col("avg_ce") - F.col("ref_ce"), 6)).alias("raw"),
    )
    tot = ex.agg(
        F.sum(F.col("raw").cast("decimal(25,9)")).cast("double").alias("sraw"),
        F.count("*").alias("k"),
    )
    smooth = DOREMI_SMOOTH_NUM / DOREMI_SMOOTH_DEN
    return ex.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "avg_ce",
        "excess",
        F.round(
            (F.lit(1.0) - F.lit(smooth)) * (F.col("raw") / F.col("sraw"))
            + F.lit(smooth) / F.col("k"),
            6,
        ).alias("weight"),
    )


# ---------------------------------------------------------------------------
# e67: full BPE tokenizer-training loop (iterated merges)
# ---------------------------------------------------------------------------

BPE_MERGES = 8
BPE_VOCAB_CAP = 500  # train on the top-N word shapes (count desc, word)


def _bpe_cte_body() -> str:
    """Chained-CTE twin of the merge loop. Merge application uses the
    double-space boundary trick so one REPLACE performs the exact
    leftmost-greedy non-overlapping merge (runs of a self-pair
    included): double every separator, match ' a  b ' (single-space
    margins), then collapse runs of spaces. Both engines' REPLACE
    scans left-to-right and continues after the replacement, which is
    precisely the greedy semantics."""
    body = f"""
    WITH wraw AS (
      SELECT word, COUNT(*) AS n
      FROM (SELECT UNNEST(string_split(LOWER(text), ' ')) AS word
            FROM documents)
      WHERE len(word) >= 2
      GROUP BY word
      ORDER BY n DESC, word LIMIT {BPE_VOCAB_CAP}
    ),
    w0 AS (
      SELECT word, CAST(n AS BIGINT) AS n,
             array_to_string(list_transform(range(1, len(word) + 1),
                                            i -> substr(word, i, 1)),
                             ' ') AS seq
      FROM wraw
    )"""
    for i in range(1, BPE_MERGES + 1):
        p, w = f"w{i - 1}", f"w{i}"
        body += f""",
    p{i} AS (
      SELECT pair, CAST(SUM(n) AS BIGINT) AS c
      FROM (
        SELECT n, UNNEST(list_transform(range(1, len(syms)),
                         j -> syms[j] || ' ' || syms[j + 1])) AS pair
        FROM (SELECT n, string_split(seq, ' ') AS syms FROM {p})
      )
      GROUP BY pair
    ),
    t{i} AS (SELECT pair, c FROM p{i} ORDER BY c DESC, pair LIMIT 1),
    {w} AS (
      SELECT word, n,
             TRIM(REGEXP_REPLACE(
               REPLACE('  ' || REPLACE(seq, ' ', '  ') || '  ',
                       ' ' || REPLACE(t.pair, ' ', '  ') || ' ',
                       ' ' || REPLACE(t.pair, ' ', '') || ' '),
               ' +', ' ', 'g')) AS seq
      FROM {p}, t{i} t
    )"""
    return body


def _bpe_oracle() -> str:
    picks = [
        f"SELECT {i} AS it, pair, REPLACE(pair, ' ', '') AS merged, c AS cnt"
        f" FROM t{i}"
        for i in range(1, BPE_MERGES + 1)
    ]
    return _bpe_cte_body() + "\n    " + "\n    UNION ALL ".join(picks)


def _train_bpe_merges(spark: SparkSession, sf_dir: str) -> list:
    """The e67 training loop, extracted so e78 can APPLY the learned
    merge table: returns [(it, pair, merged, cnt), ...] — identical
    driver-side state to what e67 emits as rows."""
    d = load(spark, sf_dir, "documents")
    words = (
        d.select(F.explode(F.split(F.lower("text"), " ")).alias("word"))
        .filter(F.length("word") >= 2)
        .groupBy("word")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), "word")
        .limit(BPE_VOCAB_CAP)
        .select(
            "word",
            "n",
            F.array_join(
                F.transform(
                    F.sequence(F.lit(1), F.length("word")),
                    lambda i: F.col("word").substr(i, F.lit(1)),
                ),
                " ",
            ).alias("seq"),
        )
        # pin the vocab ONCE: without the checkpoint every round's
        # driver-side collect re-planned the corpus-sized word count
        # (8 full scans where the docstring promises one), and each
        # round stacked another merge projection onto the lineage
        # (r8 review). The frame is <= BPE_VOCAB_CAP rows.
        .localCheckpoint(eager=True)
    )
    merges = []
    for it in range(1, BPE_MERGES + 1):
        syms = F.split(F.col("seq"), " ")
        pairs = words.select(
            "n",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size(syms) - 1),
                    lambda j: F.concat(
                        F.element_at(syms, j),
                        F.lit(" "),
                        F.element_at(syms, j + 1),
                    ),
                )
            ).alias("pair"),
        )
        top_rows = (
            pairs.groupBy("pair")
            .agg(F.sum("n").alias("c"))
            .orderBy(F.col("c").desc(), "pair")
            .limit(1)
            .collect()
        )
        if not top_rows:
            # vocabulary fully collapsed before the merge budget: the
            # oracle's t{i} CTE goes empty and contributes no rows —
            # stop instead of IndexError-ing on the same input
            # (r8 review)
            break
        top = top_rows[0]
        pair, cnt = top["pair"], int(top["c"])
        merged = pair.replace(" ", "")
        merges.append((it, pair, merged, cnt))
        words = words.select(
            "word", "n", _apply_merge(pair).alias("seq")
        ).localCheckpoint(eager=True)
    return merges


def _apply_merge(pair: str):
    """One exact leftmost-greedy non-overlapping merge as a pure
    string expression over the ``seq`` column (the double-space
    boundary trick — see _bpe_oracle's docstring)."""
    merged = pair.replace(" ", "")
    pat = " " + pair.replace(" ", "  ") + " "
    return F.trim(
        F.regexp_replace(
            F.replace(
                F.concat(
                    F.lit("  "),
                    F.replace(F.col("seq"), F.lit(" "), F.lit("  ")),
                    F.lit("  "),
                ),
                F.lit(pat),
                F.lit(" " + merged + " "),
            ),
            " +",
            " ",
        )
    )


@query("e67_bpe_training", oracle=_bpe_oracle())
def e67_bpe_training(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E-family: the FULL BPE tokenizer-training loop (Sennrich et
    al. 2016, public) — e32 ran one pair count; this runs
    {BPE_MERGES} complete merge iterations: count adjacent symbol
    pairs over the vocabulary, take the most frequent (ties on the
    pair string), apply the merge to every word's symbol sequence
    with exact leftmost-greedy non-overlapping semantics (self-pair
    runs like 'a a a' merge floor(k/2) times, leftmost first), and
    repeat on the merged sequences. The emitted rows are the learned
    merge table — the artifact a tokenizer trainer ships.

    Scale: the classic distributed BPE formulation — the corpus
    collapses to a (word, count) vocabulary ONCE (the only
    corpus-sized shuffle); every iteration then works on the
    vocab-sized frame (capped at the top {BPE_VOCAB_CAP} shapes,
    count-desc deterministic, via TakeOrderedAndProject), so 100 TB
    of text costs the same per-iteration work as 1 GB once the vocab
    is built. The top pair is a driver scalar per round (the merge
    table IS driver-sized state in every real trainer). Merge
    application is pure string expressions (codegen, no UDF): double
    separators, one REPLACE with single-space margins (= exact greedy
    semantics in both engines' continue-after-replacement scan),
    collapse spaces. All-integer counts; no floats anywhere."""
    merges = _train_bpe_merges(spark, sf_dir)
    return spark.createDataFrame(
        merges, schema="it int, pair string, merged string, cnt bigint"
    )


# ---------------------------------------------------------------------------
# e78: tokenizer fertility by language (apply the trained merges)
# ---------------------------------------------------------------------------


def _fertility_oracle() -> str:
    """e67's training CTEs (w0..wN, t1..tN) + application of every
    learned merge to the FULL per-language word inventory, then the
    per-language fertility aggregates. All counts integer; the two
    emitted ratios are single integer/integer IEEE divisions."""
    body = _bpe_cte_body()
    body += """,
    aw0 AS (
      SELECT lang, word, CAST(COUNT(*) AS BIGINT) AS n,
             array_to_string(list_transform(range(1, len(word) + 1),
                                            i -> substr(word, i, 1)),
                             ' ') AS seq
      FROM (SELECT lang, UNNEST(string_split(LOWER(text), ' ')) AS word
            FROM documents)
      WHERE len(word) >= 1
      GROUP BY lang, word
    )"""
    for i in range(1, BPE_MERGES + 1):
        body += f""",
    aw{i} AS (
      SELECT a.lang, a.word, a.n,
             TRIM(REGEXP_REPLACE(
               REPLACE('  ' || REPLACE(a.seq, ' ', '  ') || '  ',
                       ' ' || REPLACE(t.pair, ' ', '  ') || ' ',
                       ' ' || REPLACE(t.pair, ' ', '') || ' '),
               ' +', ' ', 'g')) AS seq
      FROM aw{i - 1} a, t{i} t
    )"""
    return (
        body
        + f"""
    SELECT lang,
           CAST(SUM(n) AS BIGINT) AS n_words,
           CAST(SUM(n * len(string_split(seq, ' '))) AS BIGINT) AS n_tokens,
           CAST(SUM(n * len(string_split(seq, ' '))) AS DOUBLE)
             / SUM(n) AS fertility,
           CAST(SUM(n * len(word)) AS DOUBLE)
             / SUM(n * len(string_split(seq, ' '))) AS chars_per_token
    FROM aw{BPE_MERGES}
    GROUP BY lang
    """
    )


@query("e78_tokenizer_fertility", oracle=_fertility_oracle())
def e78_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E-family: TOKENIZER FERTILITY by language — apply e67's trained
    merge table to the full per-language word inventory and report
    tokens-per-word and chars-per-token per language, the standard
    tokenizer-fairness diagnostic (a tokenizer trained on a skewed
    mixture fragments low-resource languages into more tokens —
    XLM-R/BLOOM tokenizer analyses, public). Completes the tokenizer
    lifecycle: e32 pair counts -> e67 training -> application +
    evaluation here.

    Scale: encoding works on the DISTINCT (lang, word) inventory with
    occurrence counts — the corpus collapses once, each of the
    {BPE_MERGES} merges is a pure string projection over the
    vocabulary frame, and the fertility roll-up weights by count, so
    100 TB of text is encoded at vocabulary cost. Determinism: the
    merge application is the proven leftmost-greedy REPLACE; both
    ratios are single divisions of exact integers (no float sums)."""
    merges = _train_bpe_merges(spark, sf_dir)
    d = load(spark, sf_dir, "documents")
    aw = (
        d.select(
            "lang", F.explode(F.split(F.lower("text"), " ")).alias("word")
        )
        # empty words (consecutive spaces) must drop on BOTH engines:
        # Spark's sequence(1, 0) is the DESCENDING [1, 0] (-> ' ',
        # 2 symbols) where DuckDB's range(1, 1) is empty (r8 review)
        .filter(F.length("word") >= 1)
        .groupBy("lang", "word")
        .agg(F.count("*").cast("bigint").alias("n"))
        .select(
            "lang",
            "word",
            "n",
            F.array_join(
                F.transform(
                    F.sequence(F.lit(1), F.length("word")),
                    lambda i: F.col("word").substr(i, F.lit(1)),
                ),
                " ",
            ).alias("seq"),
        )
    )
    for _it, pair, _merged, _cnt in merges:
        aw = aw.select("lang", "word", "n", _apply_merge(pair).alias("seq"))
    tok = F.size(F.split(F.col("seq"), " "))
    return aw.groupBy("lang").agg(
        F.sum("n").cast("bigint").alias("n_words"),
        F.sum(F.col("n") * tok).cast("bigint").alias("n_tokens"),
        (
            F.sum(F.col("n") * tok).cast("double") / F.sum("n")
        ).alias("fertility"),
        (
            F.sum(F.col("n") * F.length("word")).cast("double")
            / F.sum(F.col("n") * tok)
        ).alias("chars_per_token"),
    )


# ---------------------------------------------------------------------------
# E85: Moore-Lewis cross-entropy-difference data selection (Moore &
# Lewis, ACL 2010 — the standard "intelligent selection" recipe for
# domain-targeted training corpora; axolotl of every WMT-era MT
# pipeline and the ancestor of DSIR's importance weights, e27/e45).
# Score(d) = H_in-domain(d) − H_general(d): documents the IN-DOMAIN
# LM finds more probable than the general LM score negative and are
# selected. Both LMs are the e42 add-one-smoothed bigram shape — the
# in-domain model trains on the English slice (the "target
# distribution"), the general model on the whole corpus.
# ---------------------------------------------------------------------------

#: in-domain slice for the target-side model: the corpus's largest
#: language. A deployment points this at its actual target corpus
#: (the clean seed set); the MODEL SHAPE, not the slice, is the op.
ML_TARGET_LANG = "en"

_E85_SQL = f"""
    WITH {_XENT_CTES},
    tgt AS (SELECT doc_id FROM documents WHERE lang = '{ML_TARGET_LANG}'),
    bgt AS (SELECT bg.* FROM bg JOIN tgt USING (doc_id)),
    c12t AS (SELECT w1, w2, COUNT(*) AS n12t FROM bgt GROUP BY w1, w2),
    c1t AS (SELECT w1, CAST(SUM(n12t) AS BIGINT) AS n1t FROM c12t GROUP BY w1),
    vt AS (
      SELECT COUNT(DISTINCT tok) AS vszt
      FROM (SELECT UNNEST(t) AS tok FROM toks JOIN tgt USING (doc_id))
    ),
    terms_in AS (
      SELECT dpc.doc_id, dpc.cnt,
             dpc.cnt * (ln(COALESCE(c1t.n1t, 0) + vszt)
                        - ln(COALESCE(c12t.n12t, 0) + 1)) AS nll
      FROM dpc
      LEFT JOIN c12t ON dpc.w1 = c12t.w1 AND dpc.w2 = c12t.w2
      LEFT JOIN c1t ON dpc.w1 = c1t.w1, vt
    ),
    agg_in AS (
      SELECT doc_id,
             ROUND(CAST(SUM(CAST(nll AS DECIMAL(25,9))) AS DOUBLE)
                   / SUM(cnt), 6) AS xent_in
      FROM terms_in GROUP BY doc_id
    )
    SELECT agg.doc_id, agg_in.xent_in, agg.cross_entropy AS xent_gen,
           ROUND(agg_in.xent_in - agg.cross_entropy, 6) AS ml_score,
           ROUND(agg_in.xent_in - agg.cross_entropy, 6) < 0.0 AS selected
    FROM agg JOIN agg_in USING (doc_id)
"""


@query("e85_moore_lewis_selection", oracle=_E85_SQL)
def e85_moore_lewis_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E85: Moore-Lewis cross-entropy-difference selection — every
    document scored under TWO add-one-smoothed bigram LMs (in-domain
    = the ML_TARGET_LANG slice, general = whole corpus);
    ``ml_score = H_in(d) - H_gen(d)``, selected where negative (the
    in-domain model explains the doc better than the corpus
    baseline). Subtracting the general score cancels the "easy text
    scores high everywhere" bias that makes raw in-domain perplexity
    (e42 with a swapped model) a poor selector — the Moore-Lewis
    observation.

    Scale: one bigram explode feeds BOTH models (the in-domain
    count tables are an aggregation of the target slice of the same
    stream — no second tokenization); model tables are
    (bigram-type, count) rows joined on uniformly-hashed string
    keys; vocabulary scalars are 1-row broadcasts; per-doc sums
    route through DECIMAL(25,9) + ROUND-6 (the e42 discipline), and
    the selection flag compares the ROUNDED score so it cannot
    straddle an ulp. Unseen-in-target bigrams resolve through the
    LEFT joins as count-0 Laplace mass, not dropped rows."""
    tdf, bg, dpc, c12, v = _bigram_frames(spark, sf_dir)
    c1 = c12.groupBy("w1").agg(F.sum("n12").alias("n1"))
    d = load(spark, sf_dir, "documents")
    tgt = d.filter(F.col("lang") == ML_TARGET_LANG).select("doc_id")
    bgt = bg.join(tgt, "doc_id")
    c12t = bgt.groupBy("w1", "w2").agg(F.count("*").alias("n12t"))
    c1t = c12t.groupBy("w1").agg(F.sum("n12t").alias("n1t"))
    vt = (
        tdf.join(tgt, "doc_id")
        .select(F.explode("t").alias("tok"))
        .agg(F.countDistinct("tok").alias("vszt"))
    )
    terms = (
        dpc.join(c12, ["w1", "w2"])
        .join(c1, "w1")
        .crossJoin(F.broadcast(v))
        .join(c12t, ["w1", "w2"], "left")
        .join(c1t, "w1", "left")
        .crossJoin(F.broadcast(vt))
        .select(
            "doc_id",
            "cnt",
            (
                F.col("cnt")
                * (
                    F.log(F.col("n1") + F.col("vsz"))
                    - F.log(F.col("n12") + F.lit(1))
                )
            ).alias("nll_gen"),
            (
                F.col("cnt")
                * (
                    F.log(F.coalesce(F.col("n1t"), F.lit(0)) + F.col("vszt"))
                    - F.log(F.coalesce(F.col("n12t"), F.lit(0)) + F.lit(1))
                )
            ).alias("nll_in"),
        )
    )
    agg = terms.groupBy("doc_id").agg(
        F.round(
            F.sum(F.col("nll_in").cast("decimal(25,9)")).cast("double")
            / F.sum("cnt"),
            6,
        ).alias("xent_in"),
        F.round(
            F.sum(F.col("nll_gen").cast("decimal(25,9)")).cast("double")
            / F.sum("cnt"),
            6,
        ).alias("xent_gen"),
    )
    score = F.round(F.col("xent_in") - F.col("xent_gen"), 6)
    return agg.select(
        "doc_id",
        "xent_in",
        "xent_gen",
        score.alias("ml_score"),
        (score < 0.0).alias("selected"),
    )
