"""Text-analysis operators for training-data pipelines
(SURVEY.md §2 E5): tokenization + tf-idf, language-ID heuristic,
quality scoring, token counting, and document fingerprinting.

All JVM-side built-ins (split/explode/regexp/higher-order lambdas);
per-document costs are O(len(text)), fully partition-parallel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dynamodb_zero_etl_s3tables_spark.operators.registry import (
    DSUM,
    dsum,
    key_bucket,
    mh64,
    query,
)
from dynamodb_zero_etl_s3tables_spark.operators.scratch import scratch_dir
from dynamodb_zero_etl_s3tables_spark.sources.testdata import load

# Tiny deterministic marker-word lists for the language-ID heuristic
# (public-knowledge stopwords; scoring = count of marker hits).
_LANG_MARKERS = {
    "en": ("the", "and", "of", "a"),
    "es": ("el", "la", "de", "y"),
    "de": ("der", "die", "und", "das"),
    "fr": ("le", "la", "et", "les"),
    "zh": ("de", "shi", "le", "zai"),
}

_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")


@query(
    "e05_tfidf",
    oracle="""
    WITH tf AS (
      SELECT doc_id, token, COUNT(*) AS tf
      FROM (SELECT doc_id, UNNEST(string_split(LOWER(text), ' ')) AS token
            FROM documents)
      GROUP BY doc_id, token
    ), df AS (
      SELECT token, COUNT(*) AS df FROM tf GROUP BY token
    ), n AS (SELECT COUNT(*) AS n_docs FROM documents)
    SELECT tf.doc_id, tf.token, tf.tf, df.df,
           ROUND(tf.tf * LN((n.n_docs + 1.0) / (df.df + 1.0)), 6) AS tfidf
    FROM tf JOIN df ON tf.token = df.token CROSS JOIN n
    WHERE df.df >= 5
    """,
)
def e05_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E5: tf-idf — term frequency per doc joined with document
    frequency (broadcast: vocab << corpus) and smoothed idf."""
    d = load(spark, sf_dir, "documents")
    tf = (
        d.select("doc_id", F.explode(F.split(F.lower("text"), " ")).alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count("*").alias("tf"))
    )
    df = tf.groupBy("token").agg(F.count("*").alias("df")).filter(F.col("df") >= 5)
    n_docs = d.agg(F.count("*").alias("n_docs"))
    return (
        tf.join(F.broadcast(df), "token")
        .join(F.broadcast(n_docs))
        .select(
            "doc_id",
            "token",
            "tf",
            "df",
            F.round(
                F.col("tf") * F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0)), 6
            ).alias("tfidf"),
        )
    )


def _marker_score(toks, lang: str):
    markers = _LANG_MARKERS[lang]
    return F.size(F.filter(toks, lambda t: t.isin(*markers)))


_LANGID_SCORE_SQL = {
    lang: f"len(list_filter(toks, t -> t IN ({', '.join(repr(m) for m in ms)})))"
    for lang, ms in _LANG_MARKERS.items()
}

_LANGID_ORACLE = f"""
    WITH t AS (
      SELECT doc_id, lang AS true_lang, string_split(LOWER(text), ' ') AS toks
      FROM documents
    ), scores AS (
      SELECT doc_id, true_lang,
             {', '.join(f"{sql} AS s_{lang}" for lang, sql in _LANGID_SCORE_SQL.items())}
      FROM t
    )
    SELECT doc_id, true_lang,
           CASE GREATEST(s_en, s_es, s_de, s_fr, s_zh)
                WHEN 0 THEN 'und'
                WHEN s_en THEN 'en'
                WHEN s_es THEN 'es'
                WHEN s_de THEN 'de'
                WHEN s_fr THEN 'fr'
                ELSE 'zh' END AS pred_lang,
           s_en, s_es, s_de, s_fr, s_zh
    FROM scores
"""


@query("e05b_langid", oracle=_LANGID_ORACLE)
def e05b_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E5: language-ID heuristic — marker-word hit counts per
    language, argmax with fixed precedence (en>es>de>fr>zh on ties,
    'und' when nothing matches)."""
    d = load(spark, sf_dir, "documents")
    t = d.select(
        "doc_id",
        F.col("lang").alias("true_lang"),
        F.split(F.lower("text"), " ").alias("toks"),
    )
    scores = t.select(
        "doc_id",
        "true_lang",
        *[_marker_score(F.col("toks"), lang).alias(f"s_{lang}") for lang in _LANG_MARKERS],
    )
    best = F.greatest("s_en", "s_es", "s_de", "s_fr", "s_zh")
    pred = (
        F.when(best == 0, "und")
        .when(best == F.col("s_en"), "en")
        .when(best == F.col("s_es"), "es")
        .when(best == F.col("s_de"), "de")
        .when(best == F.col("s_fr"), "fr")
        .otherwise("zh")
    )
    return scores.select(
        "doc_id",
        "true_lang",
        pred.alias("pred_lang"),
        "s_en",
        "s_es",
        "s_de",
        "s_fr",
        "s_zh",
    )


@query(
    "e05c_quality_score",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, text, string_split(LOWER(text), ' ') AS toks,
             LENGTH(text) AS n_chars_m
      FROM documents
    )
    SELECT doc_id,
           n_chars_m,
           len(toks) AS n_tokens,
           ROUND(CAST(n_chars_m AS DOUBLE) / len(toks), 6) AS avg_token_len,
           ROUND(CAST(len(list_filter(toks,
                 t -> t IN ({', '.join(repr(s) for s in _STOPWORDS)}))) AS DOUBLE)
                 / len(toks), 6) AS stopword_ratio,
           ROUND(CAST(LENGTH(REGEXP_REPLACE(text, '[a-zA-Z0-9 ]', '', 'g')) AS DOUBLE)
                 / n_chars_m, 6) AS punct_ratio,
           ROUND(CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks), 6)
             AS distinct_ratio,
           (len(toks) BETWEEN 10 AND 1000) AND
           (CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) > 0.3)
             AS passes_filter
    FROM t
    """,
)
def e05c_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E5: quality scoring — length, stopword ratio, punctuation
    ratio, lexical diversity, and a Gopher-style keep/drop flag."""
    d = load(spark, sf_dir, "documents")
    t = d.select(
        "doc_id",
        "text",
        F.split(F.lower("text"), " ").alias("toks"),
        F.length("text").alias("n_chars_m"),
    )
    n_toks = F.size("toks")
    distinct_ratio = F.size(F.array_distinct("toks")).cast("double") / n_toks
    return t.select(
        "doc_id",
        "n_chars_m",
        n_toks.alias("n_tokens"),
        F.round(F.col("n_chars_m").cast("double") / n_toks, 6).alias("avg_token_len"),
        F.round(
            F.size(F.filter("toks", lambda t_: t_.isin(*_STOPWORDS))).cast("double")
            / n_toks,
            6,
        ).alias("stopword_ratio"),
        F.round(
            F.length(F.regexp_replace("text", "[a-zA-Z0-9 ]", "")).cast("double")
            / F.col("n_chars_m"),
            6,
        ).alias("punct_ratio"),
        F.round(distinct_ratio, 6).alias("distinct_ratio"),
        (n_toks.between(10, 1000) & (distinct_ratio > 0.3)).alias("passes_filter"),
    )


@query(
    "e05d_token_count",
    oracle="""
    SELECT doc_id,
           len(string_split(text, ' ')) AS ws_tokens,
           len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS bpe_ish_tokens,
           CAST(CEIL(LENGTH(text) / 4.0) AS BIGINT) AS byte_estimate
    FROM documents
    """,
)
def e05d_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E5: token counting — whitespace split, a BPE-ish regex
    (letter-runs / digit-runs / punctuation), and the chars/4
    rule-of-thumb estimate."""
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(F.split("text", " ")).alias("ws_tokens"),
        F.size(
            F.regexp_extract_all("text", F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), 0)
        ).alias("bpe_ish_tokens"),
        F.ceil(F.length("text") / 4.0).cast("bigint").alias("byte_estimate"),
    )


@query(
    "e05e_fingerprint",
    oracle="""
    SELECT doc_id,
           md5(REGEXP_REPLACE(LOWER(TRIM(text)), '\\s+', ' ', 'g')) AS norm_fingerprint,
           substr(md5(REGEXP_REPLACE(LOWER(TRIM(text)), '\\s+', ' ', 'g')), 1, 16)
             AS short_fp
    FROM documents
    """,
)
def e05e_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E5: document fingerprint — md5 over whitespace-normalized,
    lowercased text (the canonical-form exact-dup key)."""
    d = load(spark, sf_dir, "documents")
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    return d.select(
        "doc_id",
        F.md5(norm).alias("norm_fingerprint"),
        F.substring(F.md5(norm), 1, 16).alias("short_fp"),
    )


@query(
    "e05f_rolling_hash",
    oracle="""
    SELECT doc_id,
           list_reduce(
             list_prepend(
               CAST(0 AS BIGINT),
               list_transform(
                 string_split(LOWER(text), ' '),
                 t -> ('0x' || substr(md5(t), 1, 15))::BIGINT % 1000003)),
             (acc, h) -> (acc * 31 + h) % 999999999999989
           ) AS rolling_hash
    FROM documents
    """,
)
def e05f_rolling_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E5: polynomial rolling hash over tokens (base 31 mod a large
    prime) via a higher-order fold. The per-token hash is the portable
    md5-prefix bigint (same trick as MinHash), so the WHOLE fold is
    exact int64 arithmetic in both engines and fully oracle-checkable
    (DuckDB seeds its fold by prepending the 0 accumulator, since
    list_reduce has no init argument). acc stays < 1e15, so
    acc*31 + h < 2^62 — no int64 overflow under ANSI mode."""
    d = load(spark, sf_dir, "documents")
    mod = F.lit(999999999999989)
    tok_h = F.transform(
        F.split(F.lower("text"), " "),
        lambda t: mh64(t) % 1000003,
    )
    rolled = F.aggregate(
        tok_h,
        F.lit(0).cast("bigint"),
        lambda acc, h: (acc * 31 + h) % mod,
    )
    return d.select("doc_id", rolled.alias("rolling_hash"))


@query(
    "e08_deterministic_split",
    oracle="""
    WITH h AS (
      SELECT doc_id, lang,
             ('0x' || substr(md5('split|' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100 AS bucket
      FROM documents
    )
    SELECT doc_id, lang, bucket,
           CASE WHEN bucket < 80 THEN 'train'
                WHEN bucket < 90 THEN 'valid'
                ELSE 'test' END AS split
    FROM h
    """,
)
def e08_deterministic_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible train/valid/test split via content-key hashing —
    the scale-safe alternative to ``df.sample`` (whose output depends
    on partitioning, so it is NOT stable across cluster layouts or
    reruns). Hash buckets are a pure function of the key: any worker,
    any run, any engine assigns the same row the same split."""
    d = load(spark, sf_dir, "documents")
    bucket = key_bucket("split|", 100)
    return d.select(
        "doc_id",
        "lang",
        bucket.alias("bucket"),
        F.when(F.col("bucket") < 80, "train")
        .when(F.col("bucket") < 90, "valid")
        .otherwise("test")
        .alias("split"),
    )


@query(
    "e09_sequence_packing",
    oracle="""
    WITH t AS (
      SELECT doc_id, doc_id % 8 AS shard,
             len(string_split(text, ' ')) AS n_tok
      FROM documents
    ), c AS (
      SELECT doc_id, shard, n_tok,
             SUM(n_tok) OVER (PARTITION BY shard ORDER BY doc_id) AS cum
      FROM t
    )
    SELECT doc_id, shard, n_tok,
           CAST((cum - n_tok) // 512 AS BIGINT) AS pack_id FROM c
    """,
)
def e09_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing for LLM training: assign documents to
    fixed-token-budget packs (512 here) by cumulative token count in a
    stable order. Packing is inherently sequential, so it runs WITHIN
    hash shards — each shard's window is partition-parallel, no global
    single-partition window. At 100 TB: shard count scales with the
    cluster; a global ORDER BY would funnel everything through one
    task. (Shard key is doc_id%8 so the DuckDB oracle can replay it;
    production uses xxhash64 of a stable doc key.)"""
    d = load(spark, sf_dir, "documents")
    from pyspark.sql.window import Window as W

    t = d.select(
        "doc_id",
        (F.col("doc_id") % 8).alias("shard"),
        F.size(F.split(F.col("text"), " ")).alias("n_tok"),
    )
    w = W.partitionBy("shard").orderBy("doc_id")
    return t.withColumn(
        "pack_id",
        F.floor((F.sum("n_tok").over(w) - F.col("n_tok")) / 512),
    )


@query(
    "e10_quality_filter_chain",
    oracle="""
    WITH m AS (
      SELECT doc_id,
             len(string_split(text, ' ')) AS n_words,
             CAST(length(replace(text, ' ', '')) AS DOUBLE)
               / len(string_split(text, ' ')) AS mean_word_len,
             CAST(length(regexp_replace(text, '[A-Za-z0-9 ]', '', 'g')) AS DOUBLE)
               / length(text) AS symbol_ratio,
             CAST(len(list_filter(string_split(lower(text), ' '),
                      t -> t IN ('the','a','of','and','to','in','is','it'))) AS DOUBLE)
               / len(string_split(text, ' ')) AS stopword_frac
      FROM documents WHERE length(text) > 0
    )
    SELECT doc_id, n_words,
           CAST(ROUND(mean_word_len, 4) AS DOUBLE) AS mean_word_len,
           CAST(ROUND(symbol_ratio, 4) AS DOUBLE) AS symbol_ratio,
           CAST(ROUND(stopword_frac, 4) AS DOUBLE) AS stopword_frac,
           (n_words BETWEEN 10 AND 100000)
             AND mean_word_len BETWEEN 2 AND 12
             AND symbol_ratio < 0.2 AS keep
    FROM m
    """,
)
def e10_quality_filter_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style heuristic quality gate: word count bounds, mean
    word length, symbol-to-char ratio, stopword fraction -> keep flag.
    Every measure is a JVM-side built-in over one scan (no UDF, no
    shuffle); the filter chain is a single projection, so at 100 TB it
    runs at I/O speed and composes with e01/e02 dedup downstream."""
    d = load(spark, sf_dir, "documents").filter(F.length("text") > 0)
    toks = F.split(F.col("text"), " ")
    n_words = F.size(toks)
    mean_wl = F.length(F.regexp_replace("text", " ", "")).cast("double") / n_words
    sym = (
        F.length(F.regexp_replace("text", "[A-Za-z0-9 ]", "")).cast("double")
        / F.length("text")
    )
    stop = F.size(
        F.filter(
            F.split(F.lower("text"), " "),
            lambda t: t.isin(*_STOPWORDS),
        )
    ).cast("double") / n_words
    m = d.select(
        "doc_id",
        n_words.alias("n_words"),
        mean_wl.alias("mean_word_len"),
        sym.alias("symbol_ratio"),
        stop.alias("stopword_frac"),
    )
    return m.select(
        "doc_id",
        "n_words",
        F.round("mean_word_len", 4).alias("mean_word_len"),
        F.round("symbol_ratio", 4).alias("symbol_ratio"),
        F.round("stopword_frac", 4).alias("stopword_frac"),
        (
            F.col("n_words").between(10, 100000)
            & F.col("mean_word_len").between(2, 12)
            & (F.col("symbol_ratio") < 0.2)
        ).alias("keep"),
    )


@query(
    "e11_pii_redaction",
    oracle="""
    WITH aug AS (
      SELECT doc_id,
             'contact user' || CAST(doc_id AS VARCHAR)
               || '@example.com or +1555' || CAST(1000000 + doc_id AS VARCHAR)
               || ' re: ' || substr(text, 1, 40) AS raw
      FROM documents
    )
    SELECT doc_id,
           regexp_replace(
             regexp_replace(raw, '[a-z0-9._]+@[a-z0-9.]+\\.[a-z]+', '<EMAIL>', 'g'),
             '\\+?[0-9][0-9()\\- ]{6,}[0-9]', '<PHONE>', 'g') AS redacted,
           len(regexp_extract_all(raw, '[a-z0-9._]+@[a-z0-9.]+\\.[a-z]+'))
             + len(regexp_extract_all(raw, '\\+?[0-9][0-9()\\- ]{6,}[0-9]')) AS n_hits
    FROM aug
    """,
)
def e11_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing for training corpora: regex redaction of emails
    and phone-shaped spans, plus a per-doc hit count for audit
    metrics. Pure regexp_replace/regexp_count projections — no UDF,
    partition-parallel, composes into the quality chain (e10). The
    builder plants synthetic PII derived from doc_id so the oracle can
    replay the exact redactions."""
    d = load(spark, sf_dir, "documents")
    raw = F.concat(
        F.lit("contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or +1555"),
        (F.col("doc_id") + 1000000).cast("string"),
        F.lit(" re: "),
        F.substring("text", 1, 40),
    )
    email = r"[a-z0-9._]+@[a-z0-9.]+\.[a-z]+"
    phone = r"\+?[0-9][0-9()\- ]{6,}[0-9]"
    aug = d.select("doc_id", raw.alias("raw"))
    return aug.select(
        "doc_id",
        F.regexp_replace(
            F.regexp_replace("raw", email, "<EMAIL>"), phone, "<PHONE>"
        ).alias("redacted"),
        (
            F.regexp_count("raw", F.lit(email))
            + F.regexp_count("raw", F.lit(phone))
        ).alias("n_hits"),
    )


@query(
    "e08b_stratified_sample",
    oracle="""
    WITH h AS (
      SELECT doc_id, lang,
             ('0x' || substr(md5('strat|' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100 AS bucket
      FROM documents
    )
    SELECT doc_id, lang, bucket
    FROM h
    WHERE bucket < CASE WHEN lang = 'en' THEN 30 ELSE 70 END
    """,
)
def e08b_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling for corpus rebalancing:
    downsample the dominant language (en -> 30%) while keeping 70% of
    the rest — per-stratum rates via the same content-key hash buckets
    as e08, so the sample is a pure function of the key: stable across
    reruns, partitionings, and engines (unlike ``df.sampleBy``, whose
    output depends on partition layout). One scan, no shuffle."""
    d = load(spark, sf_dir, "documents")
    bucket = key_bucket("strat|", 100)
    rate = F.when(F.col("lang") == "en", 30).otherwise(70)
    return (
        d.select("doc_id", "lang", bucket.alias("bucket"))
        .filter(F.col("bucket") < rate)
    )


@query(
    "e10b_repetition_score",
    oracle="""
    WITH g AS (
      SELECT doc_id,
             len(t) - 2 AS n_grams,
             len(list_distinct(list_transform(
                   range(1, len(t) - 1),
                   i -> array_to_string(t[i:i+2], ' ')))) AS n_distinct
      FROM (SELECT doc_id, string_split(LOWER(text), ' ') AS t FROM documents)
      WHERE len(t) >= 3
    )
    SELECT doc_id, n_grams, n_distinct,
           CAST(ROUND(1.0 - CAST(n_distinct AS DOUBLE) / n_grams, 6) AS DOUBLE)
             AS dup_trigram_frac
    FROM g
    """,
)
def e10b_repetition_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition (Gopher-style duplicate-n-gram
    fraction): 1 - distinct/total trigrams. Degenerate generated text
    repeats itself; this is the standard cheap detector. Pure
    higher-order array functions in one projection — no explode, no
    shuffle at all (the plan is scan -> project)."""
    d = load(spark, sf_dir, "documents")
    t = F.split(F.lower("text"), " ")
    base = d.select("doc_id", t.alias("t")).filter(F.size("t") >= 3)
    idx = F.sequence(F.lit(0), F.size("t") - 3)
    grams = F.transform(idx, lambda i: F.concat_ws(" ", F.slice("t", i + 1, 3)))
    return base.select(
        "doc_id",
        (F.size("t") - 2).alias("n_grams"),
        F.size(F.array_distinct(grams)).alias("n_distinct"),
        F.round(
            F.lit(1.0) - F.size(F.array_distinct(grams)).cast("double") / (F.size("t") - 2),
            6,
        ).alias("dup_trigram_frac"),
    )


@query(
    "e13_contamination",
    oracle="""
    WITH bench AS (
      SELECT DISTINCT UNNEST(list_transform(
               range(1, len(t) - 2),
               i -> md5(array_to_string(t[i:i+3], ' ')))) AS g
      FROM (SELECT string_split(LOWER(text), ' ') AS t FROM documents
            WHERE source = 'src0')
      WHERE len(t) >= 4
    ), train AS (
      SELECT doc_id, UNNEST(list_distinct(list_transform(
               range(1, len(t) - 2),
               i -> md5(array_to_string(t[i:i+3], ' '))))) AS g
      FROM (SELECT doc_id, string_split(LOWER(text), ' ') AS t FROM documents
            WHERE source <> 'src0')
      WHERE len(t) >= 4
    ), counts AS (
      SELECT t.doc_id,
             COUNT(*) AS n_grams,
             COUNT(b.g) AS n_hit
      FROM train t LEFT JOIN bench b ON t.g = b.g
      GROUP BY t.doc_id
    )
    SELECT doc_id, n_grams, n_hit,
           CAST(ROUND(CAST(n_hit AS DOUBLE) / n_grams, 6) AS DOUBLE) AS contamination
    FROM counts
    WHERE n_hit > 0
    """,
)
def e13_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination check: fraction of each training
    document's distinct 4-gram window hashes that also occur in the
    held-out set (source='src0' plays the benchmark). The benchmark
    gram set is DISTINCT and dimension-sized, so it broadcasts; the
    training side streams through a map-side hash join — at 100 TB
    the corpus is never shuffled, only scanned. This is the standard
    n-gram-overlap decontamination pass LLM pipelines run before
    training."""
    d = load(spark, sf_dir, "documents")
    t = F.split(F.lower("text"), " ")
    base = d.select("doc_id", "source", t.alias("t")).filter(F.size("t") >= 4)
    idx = F.sequence(F.lit(0), F.size("t") - 4)
    grams = F.array_distinct(
        F.transform(idx, lambda i: F.md5(F.concat_ws(" ", F.slice("t", i + 1, 4))))
    )
    bench = (
        base.filter(F.col("source") == "src0")
        .select(F.explode(grams).alias("g"))
        .distinct()
    )
    train = base.filter(F.col("source") != "src0").select(
        "doc_id", F.explode(grams).alias("g")
    )
    counts = (
        train.join(F.broadcast(bench.withColumn("hit", F.lit(1))), "g", "left")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_grams"), F.count("hit").alias("n_hit"))
    )
    return counts.filter(F.col("n_hit") > 0).select(
        "doc_id", "n_grams", "n_hit",
        F.round(F.col("n_hit").cast("double") / F.col("n_grams"), 6).alias("contamination"),
    )


@query(
    "e14_unigram_surprisal",
    oracle="""
    WITH tok AS (
      SELECT doc_id, UNNEST(string_split(LOWER(text), ' ')) AS token
      FROM documents
    ), freq AS (
      SELECT token, COUNT(*) AS n FROM tok GROUP BY token
    ), total AS (SELECT COUNT(*) AS n_total FROM tok)
    SELECT t.doc_id,
           COUNT(*) AS n_tokens,
           CAST(ROUND(CAST(SUM(CAST(-LN(CAST(f.n AS DOUBLE) / total.n_total)
                                     AS DECIMAL(30,12))) AS DOUBLE)
                      / COUNT(*), 6) AS DOUBLE) AS avg_surprisal
    FROM tok t JOIN freq f ON t.token = f.token CROSS JOIN total
    GROUP BY t.doc_id, total.n_total
    """,
)
def e14_unigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-LM novelty score: average unigram surprisal
    (-ln p(token) under the corpus's own unigram distribution) per
    document — low = boilerplate, high = rare-token text; both tails
    are quality signals. The vocabulary (token -> count) broadcasts
    (vocab << corpus); token rows never shuffle for the lookup, only
    for the per-doc aggregate. AVG is over in-doc token order — made
    order-independent by summing exact decimals before dividing."""
    d = load(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(F.split(F.lower("text"), " ")).alias("token"))
    freq = tok.groupBy("token").agg(F.count("*").alias("n"))
    total = tok.agg(F.count("*").alias("n_total"))
    surprisal = -F.log(F.col("n").cast("double") / F.col("n_total"))
    return (
        tok.join(F.broadcast(freq), "token")
        .join(F.broadcast(total))
        .groupBy("doc_id", "n_total")
        .agg(
            F.count("*").alias("n_tokens"),
            F.round(
                F.sum(surprisal.cast("decimal(30,12)")).cast("double") / F.count("*"),
                6,
            ).alias("avg_surprisal"),
        )
        .select("doc_id", "n_tokens", "avg_surprisal")
    )


@query(
    "e15_mixture_rebalance",
    oracle="""
    WITH cnt AS (
      SELECT source, COUNT(*) AS n FROM documents GROUP BY source
    ), tgt AS (SELECT MIN(n) AS min_n FROM cnt),
    h AS (
      SELECT d.doc_id, d.source, c.n, t.min_n,
             ('0x' || substr(md5('mix|' || CAST(d.doc_id AS VARCHAR)), 1, 15))::BIGINT
               % 10000 AS bucket
      FROM documents d JOIN cnt c ON d.source = c.source CROSS JOIN tgt t
    )
    SELECT doc_id, source, bucket
    FROM h
    WHERE bucket * n < 10000 * min_n
    """,
)
def e15_mixture_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data mixing: equalize the per-source contribution by
    downsampling every source to the smallest one's size (expected),
    with deterministic content-key hash buckets and EXACT integer
    rate comparison (bucket*n < 10000*min_n — no float rate, so both
    engines keep identical rows). Source counts are a metadata-sized
    aggregate that broadcasts; the corpus itself is filtered in one
    scan. The same shape handles arbitrary target mixtures: replace
    min_n with the target weight per source."""
    d = load(spark, sf_dir, "documents")
    cnt = d.groupBy("source").agg(F.count("*").alias("n"))
    tgt = cnt.agg(F.min("n").alias("min_n"))
    bucket = key_bucket("mix|", 10000)
    return (
        d.join(F.broadcast(cnt), "source")
        .join(F.broadcast(tgt))
        .select("doc_id", "source", bucket.alias("bucket"), "n", "min_n")
        .filter(F.col("bucket") * F.col("n") < 10000 * F.col("min_n"))
        .select("doc_id", "source", "bucket")
    )


@query(
    "e12_length_histogram",
    oracle="""
    WITH t AS (
      SELECT doc_id, lang, len(string_split(LOWER(text), ' ')) AS n_tokens
      FROM documents
    ), b AS (
      SELECT lang,
             CAST(FLOOR(LOG2(GREATEST(n_tokens, 1))) AS INTEGER) AS log2_bucket
      FROM t
    )
    SELECT lang, log2_bucket, COUNT(*) AS n_docs
    FROM b
    GROUP BY lang, log2_bucket
    """,
)
def e12_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E12: token-length histogram per language on log2 buckets — the
    first diagnostic run on any new corpus slice (truncation cliffs,
    boilerplate spikes, and tokenizer pathologies all show up here
    before any model does). Map-side bucket computation + partial agg:
    the shuffle carries langs x ~20 bucket cells, nothing scales with
    corpus size."""
    d = load(spark, sf_dir, "documents")
    n_tokens = F.size(F.split(F.lower("text"), " "))
    bucket = F.floor(F.log2(F.greatest(n_tokens, F.lit(1)))).cast("int")
    return (
        d.select("lang", bucket.alias("log2_bucket"))
        .groupBy("lang", "log2_bucket")
        .agg(F.count("*").alias("n_docs"))
    )


#: e18 query terms (mid-frequency in the synthetic vocabulary) + the
#: standard Robertson/Sparck-Jones BM25 constants.
_BM25_TERMS = ("vector", "merge", "stream")
_BM25_K1 = 1.2
_BM25_B = 0.75


@query(
    "e18_bm25_retrieval",
    oracle=f"""
    WITH base AS (
      SELECT doc_id, len(string_split(LOWER(text), ' ')) AS dl
      FROM documents
    ), stats AS (
      SELECT COUNT(*) AS n_docs,
             CAST(SUM(CAST(dl AS DECIMAL(25,6))) AS DOUBLE) / COUNT(*) AS avgdl
      FROM base
    ), tf AS (
      SELECT doc_id, token, COUNT(*) AS tf
      FROM (SELECT doc_id, UNNEST(string_split(LOWER(text), ' ')) AS token
            FROM documents)
      WHERE token IN ({', '.join(repr(t) for t in _BM25_TERMS)})
      GROUP BY doc_id, token
    ), df AS (
      SELECT token, COUNT(*) AS df FROM tf GROUP BY token
    ), parts AS (
      SELECT tf.doc_id,
             LN((s.n_docs - df.df + 0.5) / (df.df + 0.5) + 1)
               * (tf.tf * ({_BM25_K1} + 1))
               / (tf.tf + {_BM25_K1} * (1 - {_BM25_B} + {_BM25_B} * b.dl / s.avgdl))
               AS part
      FROM tf
      JOIN df ON tf.token = df.token
      JOIN base b ON b.doc_id = tf.doc_id
      CROSS JOIN stats s
    )
    SELECT doc_id,
           ROUND(CAST(SUM(CAST(part AS DECIMAL(25,12))) AS DOUBLE), 6) AS bm25
    FROM parts
    GROUP BY doc_id
    ORDER BY bm25 DESC, doc_id
    LIMIT 20
    """,
)
def e18_bm25_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E18: BM25 top-k retrieval (Robertson et al., public literature)
    for a fixed term set — the lexical-retrieval primitive a curation
    pipeline uses to pull benchmark-adjacent or topic-matched slices
    out of a crawl corpus (the sparse complement of e03's dense ANN).

    Scale shape: the token stream is filtered to the query terms
    BEFORE any aggregation (the corpus-size token explosion never
    reaches a shuffle); df and the corpus stats are one-row/tiny
    broadcasts; per-doc scores sum <= |terms| parts through a decimal
    accumulator (order-independent); top-20 is TakeOrderedAndProject.
    Same LN+ROUND-6 determinism discipline as e05_tfidf."""
    d = load(spark, sf_dir, "documents")
    base = d.select("doc_id", F.size(F.split(F.lower("text"), " ")).alias("dl"))
    stats = base.agg(
        F.count("*").alias("n_docs"),
        (
            F.sum(F.col("dl").cast("decimal(25,6)")).cast("double") / F.count("*")
        ).alias("avgdl"),
    )
    toks = d.select(
        "doc_id", F.explode(F.split(F.lower("text"), " ")).alias("token")
    ).filter(F.col("token").isin(*_BM25_TERMS))
    tf = toks.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    df = tf.groupBy("token").agg(F.count("*").alias("df"))
    part = (
        F.log(
            (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1
        )
        * (F.col("tf") * (_BM25_K1 + 1))
        / (
            F.col("tf")
            + _BM25_K1
            * (1 - _BM25_B + _BM25_B * F.col("dl") / F.col("avgdl"))
        )
    )
    parts = (
        tf.join(F.broadcast(df), "token")
        .join(base, "doc_id")
        .join(F.broadcast(stats))
        .select("doc_id", part.alias("part"))
    )
    return (
        parts.groupBy("doc_id")
        .agg(
            F.round(
                F.sum(F.col("part").cast("decimal(25,12)")).cast("double"), 6
            ).alias("bm25")
        )
        .orderBy(F.col("bm25").desc(), "doc_id")
        .limit(20)
    )


@query(
    "e19_corpus_report",
    oracle="""
    WITH t AS (
      SELECT source, lang,
             len(string_split(LOWER(text), ' ')) AS n_tokens,
             CAST(len(list_distinct(string_split(LOWER(text), ' '))) AS DOUBLE)
               / len(string_split(LOWER(text), ' ')) AS dr,
             COUNT(*) OVER (PARTITION BY md5(text)) > 1 AS is_exact_dup
      FROM documents
    )
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           COUNT(DISTINCT lang) AS n_langs,
           ROUND(CAST(SUM(CASE WHEN n_tokens BETWEEN 10 AND 1000 AND dr > 0.3
                               THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 6)
             AS quality_pass_rate,
           ROUND(CAST(SUM(CASE WHEN is_exact_dup THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*), 6) AS exact_dup_rate
    FROM t
    GROUP BY source
    """,
)
def e19_corpus_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E19: per-source dataset report card — the one-page summary a
    curation team publishes with a corpus drop: volume (docs/tokens),
    language spread, quality-gate pass rate (e05c predicates), and
    exact-duplicate rate (e01 semantics), all in one pass.

    Scale shape: two shuffles total — one on the uniform content hash
    for the dup flag (window count, no pair expansion), one for the
    per-source rollup whose output is sources x 1 rows. Everything
    else is map-side projection."""
    d = load(spark, sf_dir, "documents")
    toks = F.split(F.lower("text"), " ")
    n_tokens = F.size(toks)
    dr = F.size(F.array_distinct(toks)).cast("double") / n_tokens
    from pyspark.sql.window import Window as _W

    flagged = d.select(
        "source",
        "lang",
        n_tokens.alias("n_tokens"),
        dr.alias("dr"),
        (F.count("*").over(_W.partitionBy(F.md5("text"))) > 1).alias("is_exact_dup"),
    )
    passes = (F.col("n_tokens").between(10, 1000)) & (F.col("dr") > 0.3)
    return flagged.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.countDistinct("lang").alias("n_langs"),
        F.round(
            F.sum(passes.cast("long")).cast("double") / F.count("*"), 6
        ).alias("quality_pass_rate"),
        F.round(
            F.sum(F.col("is_exact_dup").cast("long")).cast("double") / F.count("*"),
            6,
        ).alias("exact_dup_rate"),
    )


#: DSIR hashed-feature bucket count (public technique: Xie et al.
#: 2023, "Data Selection for Language Models via Importance
#: Resampling" — hashed n-gram features + importance weights between
#: a target and a raw distribution). 4096 buckets keeps the weight
#: table broadcast-sized at any corpus scale.
DSIR_BUCKETS = 4096


# Shared DSIR CTE chain ending in docw = (doc_id, n_tokens,
# dsir_logweight); e27 projects it, e45 runs Gumbel top-k on top.
_DSIR_CTES = f"""tok AS (
      SELECT doc_id, lang,
             ('0x' || substr(md5(UNNEST(string_split(LOWER(text), ' '))), 1, 15))::BIGINT
               % {DSIR_BUCKETS} AS b
      FROM documents
    ),
    raw_c AS (SELECT b, COUNT(*) AS cr FROM tok GROUP BY b),
    tgt_c AS (SELECT b, COUNT(*) AS ct FROM tok WHERE lang = 'en' GROUP BY b),
    tot AS (
      SELECT (SELECT COUNT(*) FROM tok) AS r_total,
             (SELECT COUNT(*) FROM tok WHERE lang = 'en') AS t_total
    ),
    w AS (
      SELECT r.b,
             LN((COALESCE(t.ct, 0) + 1.0) / (tot.t_total + {DSIR_BUCKETS}))
               - LN((r.cr + 1.0) / (tot.r_total + {DSIR_BUCKETS})) AS w
      FROM raw_c r LEFT JOIN tgt_c t ON r.b = t.b CROSS JOIN tot
    ),
    docw AS (
      SELECT tok.doc_id,
             COUNT(*) AS n_tokens,
             CAST(ROUND(CAST(SUM(CAST(w.w AS DECIMAL(25,9))) AS DOUBLE)
                        / COUNT(*), 6) AS DOUBLE) AS dsir_logweight
      FROM tok JOIN w ON tok.b = w.b
      GROUP BY tok.doc_id
    )"""


@query(
    "e27_dsir_importance",
    oracle=f"""
    WITH {_DSIR_CTES}
    SELECT doc_id, n_tokens, dsir_logweight FROM docw
    """,
)
def e27_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style importance weight per document: average hashed-
    unigram log-likelihood ratio between a target distribution (here
    the English slice — "train an English model") and the raw corpus,
    with add-one smoothing over {DSIR_BUCKETS} hash buckets. Documents
    whose token distribution looks like the target get high weights;
    importance RESAMPLING then samples by weight (e08's deterministic
    splitter composes on top). Public technique: Xie et al. 2023.

    Scale: tokens hash into a FIXED {DSIR_BUCKETS}-bucket space, so
    both count tables and the weight table are bounded and broadcast;
    token rows join map-side and shuffle once for the per-doc
    aggregate. Per-token log-weights are summed as exact DECIMAL(25,9)
    (FIXTURES.md's computed-double scale: order-independent, and the 1e-12 quantization
    absorbs any last-ulp libm difference between engines) then
    averaged and ROUNDed — this is a genuinely approximate value, so
    ROUND is correct here (FIXTURES.md)."""
    d = load(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", "lang", F.explode(F.split(F.lower("text"), " ")).alias("token")
    ).select(
        "doc_id",
        "lang",
        F.pmod(
            mh64("token"),
            F.lit(DSIR_BUCKETS),
        ).alias("b"),
    )
    raw_c = tok.groupBy("b").agg(F.count("*").alias("cr"))
    tgt_c = tok.filter(F.col("lang") == "en").groupBy("b").agg(
        F.count("*").alias("ct")
    )
    tot = tok.agg(
        F.count("*").alias("r_total"),
        F.sum((F.col("lang") == "en").cast("long")).alias("t_total"),
    )
    w = (
        raw_c.join(tgt_c, "b", "left")
        .join(F.broadcast(tot))
        .select(
            "b",
            (
                F.log(
                    (F.coalesce(F.col("ct"), F.lit(0)) + F.lit(1.0))
                    / (F.col("t_total") + F.lit(DSIR_BUCKETS))
                )
                - F.log(
                    (F.col("cr") + F.lit(1.0))
                    / (F.col("r_total") + F.lit(DSIR_BUCKETS))
                )
            ).alias("w"),
        )
    )
    return (
        tok.join(F.broadcast(w), "b")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.round(
                F.sum(F.col("w").cast("decimal(25,9)")).cast("double")
                / F.count("*"),
                6,
            ).alias("dsir_logweight"),
        )
    )


@query(
    "e38_training_export",
    oracle="""
    WITH dedup AS (
      SELECT doc_id, text FROM (
        SELECT doc_id, text,
               ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
        FROM documents
      ) WHERE rn = 1
    ),
    q AS (
      SELECT doc_id, text,
             len(string_split(text, ' ')) AS n_words,
             CAST(length(replace(text, ' ', '')) AS DOUBLE)
               / len(string_split(text, ' ')) AS mean_word_len,
             CAST(length(regexp_replace(text, '[A-Za-z0-9 ]', '', 'g')) AS DOUBLE)
               / length(text) AS symbol_ratio
      FROM dedup WHERE length(text) > 0
    ),
    kept AS (
      SELECT doc_id, text, n_words,
             CASE WHEN b < 80 THEN 'train'
                  WHEN b < 90 THEN 'valid'
                  ELSE 'test' END AS split
      FROM (
        SELECT *,
               ('0x' || substr(md5('split|' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
                 % 100 AS b
        FROM q
        WHERE (n_words BETWEEN 10 AND 100000)
          AND mean_word_len BETWEEN 2 AND 12
          AND symbol_ratio < 0.2
      )
    )
    SELECT split,
           COUNT(*) AS n_docs,
           CAST(SUM(n_words) AS BIGINT) AS n_tokens,
           CAST(SUM(length(text)) AS BIGINT) AS n_chars
    FROM kept GROUP BY split ORDER BY split
    """,
)
def e38_training_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E-family capstone: the END-TO-END training-data export — exact
    dedup (keep lowest doc_id per content hash), the e10 Gopher-style
    quality gate, the e08 deterministic content-key split, then a REAL
    split-partitioned parquet export; the returned per-split stats
    (doc / token / char counts) are computed from the WRITTEN files,
    so the materialization itself is inside the oracle hash-match —
    a truncated or double-written export cannot pass.

    This is the shape a corpus team ships nightly: every stage is one
    of the individually-verified operators, composed in the order the
    public pipelines (Gopher/CCNet/RefinedWeb lines) run them —
    dedup BEFORE quality (a duplicate passing quality twice would
    bias the split sizes), split LAST (so train/valid/test stay
    disjoint under any upstream change).

    Scale: dedup (reworked r8, VERDICT r7 #6): the old
    row_number-window form shuffled AND SORTED every raw row with its
    full text. Now keeper ids come from a ``min(doc_id)`` HASH
    aggregate over (md5, doc_id) projections — map-side partial agg,
    so the first exchange carries ~40-byte pairs collapsed by the
    duplication factor, never text — and survivors are recovered by a
    LEFT SEMI join on doc_id (broadcast under AQE while the keeper
    set is small; sort-free either way; ``min_by(struct)``/
    ``first(text)`` were rejected — string agg buffers demote to
    SortAggregate, the sweep-forbidden operator). Quality measures
    are map-side built-ins; the split is a pure hash function; the
    write is partitioned by split (3 dirs, append-free overwrite);
    stats are one partial-aggregated pass over the read-back. Nothing
    holds state on the driver."""
    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    return quality_split_export(
        spark, exact_dedup_survivors(d), sf_dir, "e38_export"
    )


def exact_dedup_survivors(d: DataFrame) -> DataFrame:
    """Exact-dedup survivor rows (keep lowest doc_id per content
    hash) in the r8 plan shape — keeper ids via min(doc_id)
    HashAggregate over (md5, doc_id) pairs, survivors via LEFT SEMI
    join on doc_id (plan shape pinned by tests/test_plans.py::
    test_e38_dedup_stage_shape; rationale in e38's docstring).

    PRECONDITION: ``doc_id`` is unique (it is the documents table's
    primary key). The semi join recovers survivors BY ID, so a
    duplicated doc_id would keep every row bearing a keeper id where
    the pre-r8 row_number form kept exactly one — callers feeding
    non-keyed frames should dedup ids first."""
    keepers = (
        d.select(F.md5("text").alias("__h"), "doc_id")
        .groupBy("__h")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    return d.join(keepers, "doc_id", "left_semi")


def quality_split_export(
    spark: SparkSession, docs: DataFrame, sf_dir: str, subdir: str
) -> DataFrame:
    """Shared export tail of the training capstones (e38 here; e41 in
    llm_dedup composes it behind the MinHash->components near-dup
    stage): Gopher-style quality gate -> deterministic content-key
    split -> REAL split-partitioned parquet write -> per-split stats
    computed from the READ-BACK files, so the materialization itself
    sits inside the oracle hash. ``docs`` must carry (doc_id, text).

    Scratch layout: the per-(sf_dir, process) namespace of
    operators/scratch.py — one writer per (sf_dir, process, subdir),
    so concurrent grader processes are disjoint by construction."""
    out = scratch_dir(sf_dir, subdir, wipe=True)

    dedup = docs.select("doc_id", "text").filter(F.length("text") > 0)
    n_words = F.size(F.split(F.col("text"), " "))
    mean_word_len = (
        F.length(F.regexp_replace("text", " ", "")).cast("double") / n_words
    )
    symbol_ratio = (
        F.length(F.regexp_replace("text", "[A-Za-z0-9 ]", "")).cast("double")
        / F.length("text")
    )
    q = dedup.select(
        "doc_id",
        "text",
        n_words.alias("n_words"),
        mean_word_len.alias("mwl"),
        symbol_ratio.alias("sr"),
    ).filter(
        F.col("n_words").between(10, 100000)
        & F.col("mwl").between(2, 12)
        & (F.col("sr") < 0.2)
    )
    bucket = key_bucket("split|", 100)
    kept = q.select(
        "doc_id",
        "text",
        "n_words",
        F.when(bucket < 80, "train")
        .when(bucket < 90, "valid")
        .otherwise("test")
        .alias("split"),
    )
    kept.write.mode("overwrite").partitionBy("split").parquet(str(out))
    # explicit schema: when the quality gate keeps ZERO docs the
    # written dir holds only _SUCCESS and schema inference would
    # raise UNABLE_TO_INFER_SCHEMA — the oracle returns an empty
    # result set for the same input, so the engine must too
    back = spark.read.schema(kept.schema).parquet(str(out))
    return (
        back.groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_words").alias("n_tokens"),
            F.sum(F.length("text")).cast("bigint").alias("n_chars"),
        )
        .orderBy("split")
    )


@query(
    "e39_source_overlap_matrix",
    oracle="""
    WITH t AS (
      SELECT source, string_split(LOWER(text), ' ') AS toks FROM documents
    ),
    g AS (
      SELECT DISTINCT source,
             md5(array_to_string(
               toks[CAST(i AS INTEGER):CAST(i AS INTEGER)+3], ' ')) AS h
      FROM t, UNNEST(range(1, len(toks) - 2)) AS u(i)
    ),
    tot AS (SELECT source, COUNT(*) AS n FROM g GROUP BY source),
    sh AS (
      SELECT a.source AS source_a, b.source AS source_b, COUNT(*) AS n_shared
      FROM g a JOIN g b ON a.h = b.h AND a.source < b.source
      GROUP BY a.source, b.source
    )
    SELECT sh.source_a, sh.source_b,
           ta.n AS n_a, tb.n AS n_b, sh.n_shared,
           CAST(sh.n_shared AS DOUBLE)
             / (ta.n + tb.n - sh.n_shared) AS jaccard
    FROM sh
    JOIN tot ta ON ta.source = sh.source_a
    JOIN tot tb ON tb.source = sh.source_b
    """,
)
def e39_source_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus provenance diagnostics: the SOURCE x SOURCE distinct
    4-gram overlap matrix — which pairs of ingestion sources carry
    shared text (mirrored crawls, syndicated content, one source
    scraping another). This is e13's benchmark-contamination check
    generalized to every source pair at once: the matrix drives
    source-level dedup ordering (dedup the mirror against the
    original, not vice versa) and mixture design (two 0.9-Jaccard
    sources are one source for weighting purposes).

    Scale: grams collapse to DISTINCT (source, hash) FIRST, so the
    self-join key space is per-source vocabulary, and a gram
    appearing in k sources emits C(k,2) pair rows — bounded by the
    SOURCE count (tiny), not document count; no df-cap needed, unlike
    document-keyed inverted indexes. One explode, one distinct
    aggregate, one hash-keyed self-join, one pair aggregate. The
    Jaccard is IEEE division of exact ints — no ROUND (FIXTURES.md
    rule)."""
    d = load(spark, sf_dir, "documents")
    toks = F.split(F.lower("text"), " ")
    base = d.select("source", toks.alias("t")).filter(F.size("t") >= 4)
    idx = F.sequence(F.lit(0), F.size("t") - 4)
    grams = F.array_distinct(
        F.transform(idx, lambda i: F.md5(F.concat_ws(" ", F.slice("t", i + 1, 4))))
    )
    g = base.select("source", F.explode(grams).alias("h")).distinct()
    tot = g.groupBy("source").agg(F.count("*").alias("n"))
    a = g.select(F.col("source").alias("source_a"), "h")
    b = g.select(F.col("source").alias("source_b"), F.col("h").alias("hb"))
    sh = (
        a.join(b, (F.col("h") == F.col("hb")) & (F.col("source_a") < F.col("source_b")))
        .groupBy("source_a", "source_b")
        .agg(F.count("*").alias("n_shared"))
    )
    ta = tot.select(F.col("source").alias("source_a"), F.col("n").alias("n_a"))
    tb = tot.select(F.col("source").alias("source_b"), F.col("n").alias("n_b"))
    return (
        sh.join(F.broadcast(ta), "source_a")
        .join(F.broadcast(tb), "source_b")
        .select(
            "source_a",
            "source_b",
            "n_a",
            "n_b",
            "n_shared",
            (
                F.col("n_shared").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_shared")).cast("double")
            ).alias("jaccard"),
        )
    )


#: e45 selection size and Gumbel hash resolution
DSIR_SELECT_K = 100
_GUM_M = 1 << 20


@query(
    "e45_dsir_resample",
    oracle=f"""
    WITH {_DSIR_CTES},
    g AS (
      SELECT doc_id, n_tokens, dsir_logweight,
             ROUND(dsir_logweight
                   - LN(-LN(
                       ((('0x' || substr(md5('gum|' || CAST(doc_id AS VARCHAR)),
                                  1, 15))::BIGINT % {_GUM_M}) + 0.5)
                       / {_GUM_M}.0)), 6) AS sel_key
      FROM docw
    )
    SELECT doc_id, n_tokens, dsir_logweight, sel_key, rn AS rank
    FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY sel_key DESC, doc_id) AS rn
          FROM g)
    WHERE rn <= {DSIR_SELECT_K}
    """,
)
def e45_dsir_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E-family: DSIR SELECTION — the importance-RESAMPLING step that
    e27's weights exist for (Xie et al. 2023): draw {DSIR_SELECT_K}
    documents with probability proportional to exp(weight) WITHOUT
    replacement via the Gumbel-top-k trick (public): add an
    independent Gumbel(0,1) perturbation -ln(-ln(u)) to each
    log-weight and take the k largest keys. The "randomness" is a
    content-keyed hash (md5 of 'gum|doc_id' -> uniform in (0,1) via
    (h+0.5)/2^20), so the sample is a pure function of the corpus —
    re-runnable, shard-order-independent, and oracle-checkable, the
    e08 deterministic-split discipline applied to weighted sampling.
    The length-normalized log-weight (e27's mean, not the sum) is
    used deliberately: it removes document-length bias from the draw.

    Scale: one map-side key computation over e27's bounded-join
    output, then a distributed top-k (TakeOrderedAndProject) — no new
    shuffle beyond e27's per-doc aggregate. Determinism: the Gumbel
    key is rounded to 6dp before ranking (it is a computed double;
    the quantization absorbs last-ulp libm differences), ties break
    on doc_id."""
    dw = e27_dsir_importance(spark, sf_dir)
    u = (
        key_bucket("gum|", _GUM_M)
        + F.lit(0.5)
    ) / F.lit(float(_GUM_M))
    keyed = dw.withColumn(
        "sel_key", F.round(F.col("dsir_logweight") - F.log(-F.log(u)), 6)
    )
    topk = keyed.orderBy(F.col("sel_key").desc(), "doc_id").limit(DSIR_SELECT_K)
    from pyspark.sql.window import Window as W

    w = W.partitionBy(F.lit(1)).orderBy(F.col("sel_key").desc(), "doc_id")
    return topk.withColumn("rank", F.row_number().over(w)).select(
        "doc_id", "n_tokens", "dsir_logweight", "sel_key", "rank"
    )


#: e46 hashed-feature space and weight quantization
QM_BUCKETS = 64
_QM_M31 = 2_147_483_647


@query(
    "e46_linear_quality_model",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id,
             ('0x' || substr(md5(UNNEST(string_split(LOWER(text), ' '))), 1, 15))::BIGINT
               % {QM_BUCKETS} AS b
      FROM documents
    ),
    cnt AS (SELECT doc_id, b, COUNT(*) AS c FROM tok GROUP BY doc_id, b),
    terms AS (
      SELECT doc_id, c,
             c * ((('0x' || substr(md5('w|' || CAST(b AS VARCHAR)), 1, 15))::BIGINT
                   % 2049 - 1024) / 1024.0) AS t
      FROM cnt
    ),
    agg AS (
      SELECT doc_id,
             CAST(SUM(c) AS BIGINT) AS n_tokens,
             CAST(SUM(CAST(t AS DECIMAL(25,12))) AS DOUBLE)
               / SUM(c) AS score
      FROM terms GROUP BY doc_id
    )
    SELECT doc_id, n_tokens, score,
           ROUND(1 / (1 + EXP(-score)), 6) AS prob,
           ROUND(1 / (1 + EXP(-score)), 6) >= 0.5 AS kept
    FROM agg
    """,
)
def e46_linear_quality_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E-family: MODEL-BASED quality scoring — apply a linear
    classifier over hashed bag-of-words features (the fastText shape
    behind FineWeb-Edu-style "score every document with a small
    model" passes, public): tokens hash into {QM_BUCKETS} feature
    buckets, each bucket carries a weight, and the document score is
    the length-normalized weighted sum pushed through a sigmoid with
    a 0.5 keep threshold.

    The weight "model" here is derived from a hash of the bucket id
    (quantized DYADICALLY to 1/1024 steps in [-1, 1] — exactly
    representable doubles, so every weight, term product, and
    DECIMAL(25,12)-routed sum is EXACT in both engines, and the score
    needs no rounding at all; a 1/1000 quantization would park scores
    on 6dp rounding boundaries and flip the hash on ties, which the
    first cut of this operator learned the hard way) so it is
    self-contained
    and oracle-checkable; a REAL trained model swaps in as either a
    broadcast (bucket, weight) table — one extra broadcast join — or
    a literal weight array, with an identical plan. That substitution
    point is the operator's purpose: per-document model scoring as a
    pure map-side + one-aggregate pipeline, no UDF, no inference
    service round-trip.

    Scale: token->bucket hashing and the weight lookup are map-side
    expressions; the only shuffle is the per-(doc, bucket) count
    collapse, bounded by docs x {QM_BUCKETS}. Determinism: weights and
    term sums are exact (dyadic doubles through DECIMAL(25,12)); the
    score is one exact-input IEEE division (bit-identical, no ROUND
    needed); only the sigmoid rounds to 6dp (absorbing last-ulp EXP
    differences, e27's discipline); `kept` compares the ROUNDED
    probability so it cannot straddle an ulp."""
    d = load(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.explode(F.split(F.lower("text"), " ")).alias("token")
    ).select(
        "doc_id",
        F.pmod(
            mh64("token"),
            F.lit(QM_BUCKETS),
        ).alias("b"),
    )
    cnt = tok.groupBy("doc_id", "b").agg(F.count("*").alias("c"))
    w = (
        key_bucket("w|", 2049, key="b")
        - F.lit(1024)
    ) / F.lit(1024.0)
    terms = cnt.select("doc_id", "c", (F.col("c") * w).alias("t"))
    agg = terms.groupBy("doc_id").agg(
        F.sum("c").cast("bigint").alias("n_tokens"),
        (
            F.sum(F.col("t").cast("decimal(25,12)")).cast("double") / F.sum("c")
        ).alias("score"),
    )
    prob = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("score"))), 6)
    return agg.select(
        "doc_id",
        "n_tokens",
        "score",
        prob.alias("prob"),
        (prob >= 0.5).alias("kept"),
    )


#: e54 PSI geometry: decile buckets, Laplace-style smoothing so a
#: source missing a bucket contributes a finite, well-defined term
PSI_BUCKETS = 10


@query(
    "e54_source_drift_psi",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, source, len(string_split(text, ' ')) AS n_words
      FROM documents
    ),
    r AS (
      SELECT source,
             NTILE({PSI_BUCKETS}) OVER (ORDER BY n_words, doc_id) AS bucket
      FROM d
    ),
    sb AS (SELECT source, bucket, COUNT(*) AS n_docs FROM r GROUP BY source, bucket),
    st AS (SELECT source, CAST(SUM(n_docs) AS BIGINT) AS cs FROM sb GROUP BY source),
    bt AS (SELECT bucket, CAST(SUM(n_docs) AS BIGINT) AS cb FROM sb GROUP BY bucket),
    nt AS (SELECT COUNT(*) AS n FROM d),
    grid AS (SELECT st.source, st.cs, bt.bucket, bt.cb FROM st, bt),
    terms AS (
      SELECT g.source, g.bucket,
             COALESCE(sb.n_docs, 0) AS n_docs,
             (COALESCE(sb.n_docs, 0) + 0.5) / (g.cs + 5.0) AS p_src,
             (g.cb + 0.5) / (n + 5.0) AS p_corpus
      FROM grid g LEFT JOIN sb ON g.source = sb.source AND g.bucket = sb.bucket, nt
    ),
    t2 AS (
      SELECT source, bucket, n_docs,
             ROUND(p_src, 6) AS p_src,
             ROUND(p_corpus, 6) AS p_corpus,
             ROUND((p_src - p_corpus) * ln(p_src / p_corpus), 6) AS psi_term
      FROM terms
    )
    SELECT source, bucket, n_docs, p_src, p_corpus, psi_term,
           ROUND(CAST(SUM(CAST(psi_term AS DECIMAL(25,9)))
                      OVER (PARTITION BY source) AS DOUBLE), 6) AS psi_total
    FROM t2
    """,
)
def e54_source_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E-family: PER-SOURCE DISTRIBUTION DRIFT via the POPULATION
    STABILITY INDEX (standard model-monitoring statistic, public):
    bucket the corpus into global length deciles (exact NTILE
    semantics), then for every source compute
    PSI = sum_b (p_src_b - p_corpus_b) * ln(p_src_b / p_corpus_b)
    against the corpus-wide bucket distribution, with +0.5/+5
    smoothing so a source missing a bucket contributes a finite term
    (the classic PSI>0.2 alarm threshold flags a drifted source in a
    mixture — the data-sourcing twin of e15's rebalance).

    The decile assignment deliberately avoids a global unpartitioned
    NTILE window (the single-task funnel tests/test_plans.py forbids):
    it reuses e47's DISTRIBUTED EXACT RANKING — range-repartition on
    (n_words, doc_id), rank within partitions, add per-partition
    offsets (a #partitions-row metadata collect) — and reproduces
    NTILE's bucket-size arithmetic from the global rank, which is
    exact at any partition count. Scale: after ranking, everything is
    (source x bucket)-sized; the source/bucket marginal grid is a
    broadcast cross of two tiny aggregates. Determinism: p values are
    exact-integer divisions, psi terms round at 6dp, the per-source
    total sums DECIMAL-cast rounded terms."""
    from pyspark.sql.window import Window as W

    d = load(spark, sf_dir, "documents").select(
        "doc_id", "source", F.size(F.split("text", " ")).alias("n_words")
    )
    n_range = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    ranged = (
        d.repartitionByRange(n_range, "n_words", "doc_id")
        .withColumn("pid", F.spark_partition_id())
        .localCheckpoint(eager=True)  # pin pid before the branches
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
    base, rem = divmod(n_total, PSI_BUCKETS)
    off = F.create_map(*[F.lit(x) for kv in offsets.items() for x in kv])[
        F.col("pid")
    ]
    rank = off + F.row_number().over(
        W.partitionBy("pid").orderBy("n_words", "doc_id")
    )
    # NTILE's size arithmetic from the exact global rank: the first
    # `rem` buckets hold base+1 rows, the rest hold base
    head = rem * (base + 1)
    bucket = (
        F.when(rank <= head, F.floor((rank - 1) / (base + 1)) + 1)
        .otherwise(F.lit(rem) + F.floor((rank - head - 1) / base) + 1)
        .cast("long")
    )
    r = ranged.select("source", bucket.alias("bucket"))
    sb = r.groupBy("source", "bucket").agg(F.count("*").alias("n_docs"))
    st = sb.groupBy("source").agg(F.sum("n_docs").alias("cs"))
    bt = sb.groupBy("bucket").agg(F.sum("n_docs").alias("cb"))
    grid = F.broadcast(st).crossJoin(F.broadcast(bt))
    terms = grid.join(sb, ["source", "bucket"], "left").select(
        "source",
        "bucket",
        F.coalesce(F.col("n_docs"), F.lit(0)).alias("n_docs"),
        (
            (F.coalesce(F.col("n_docs"), F.lit(0)) + F.lit(0.5))
            / (F.col("cs") + F.lit(5.0))
        ).alias("p_src"),
        ((F.col("cb") + F.lit(0.5)) / (F.lit(n_total) + F.lit(5.0))).alias(
            "p_corpus"
        ),
    )
    t2 = terms.select(
        "source",
        "bucket",
        "n_docs",
        F.round("p_src", 6).alias("p_src"),
        F.round("p_corpus", 6).alias("p_corpus"),
        F.round(
            (F.col("p_src") - F.col("p_corpus"))
            * F.log(F.col("p_src") / F.col("p_corpus")),
            6,
        ).alias("psi_term"),
    )
    wsrc = W.partitionBy("source")
    return t2.withColumn(
        "psi_total",
        F.round(
            F.sum(F.col("psi_term").cast("decimal(25,9)")).over(wsrc).cast("double"),
            6,
        ),
    )


# ---------------------------------------------------------------------------
# e62: hybrid lexical + dense retrieval via Reciprocal Rank Fusion
# ---------------------------------------------------------------------------

_RRF_K = 60


def _rrf_oracle() -> str:
    """Compose the RRF oracle from the registered e18 (lexical) and
    e03 (dense) oracles, so the fused twin can never drift from the
    arms it fuses."""
    from dynamodb_zero_etl_s3tables_spark.operators.registry import (
        QUERY_REGISTRY,
    )

    lex = QUERY_REGISTRY["e18_bm25_retrieval"].oracle
    dense = QUERY_REGISTRY["e03_cosine_topk"].oracle
    return f"""
    WITH lex AS ({lex}),
    dense AS ({dense}),
    lexr AS (
      SELECT doc_id,
             ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id) AS lex_rank
      FROM lex
    ),
    denser AS (SELECT vec_id AS doc_id, rank AS dense_rank FROM dense),
    fused AS (
      SELECT COALESCE(l.doc_id, d.doc_id) AS doc_id,
             COALESCE(l.lex_rank, 0) AS lex_rank,
             COALESCE(d.dense_rank, 0) AS dense_rank,
             ROUND(
               (CASE WHEN l.lex_rank IS NULL THEN 0.0
                     ELSE 1.0 / ({_RRF_K} + l.lex_rank) END)
               + (CASE WHEN d.dense_rank IS NULL THEN 0.0
                       ELSE 1.0 / ({_RRF_K} + d.dense_rank) END), 6)
               AS rrf_score
      FROM lexr l FULL OUTER JOIN denser d ON l.doc_id = d.doc_id
    )
    SELECT doc_id, lex_rank, dense_rank, rrf_score,
           ROW_NUMBER() OVER (ORDER BY rrf_score DESC, doc_id)
             AS fused_rank
    FROM fused
    """


@query("e62_hybrid_rrf", oracle=_rrf_oracle())
def e62_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E-family: HYBRID RETRIEVAL by Reciprocal Rank Fusion (Cormack
    et al. 2009, public): fuse the e18 BM25 lexical top-20 with the
    e03 dense cosine top-20 via score = sum over arms of
    1/(k + rank), k={_RRF_K} — the standard fusion every hybrid RAG
    retrieval stack runs, composed from this repo's own two arms
    (doc_id == vec_id is the corpus's established embedding
    correspondence, as in e49/e60). A doc missing from one arm
    contributes 0 from that arm (its rank column reads 0).

    Scale: both arms are already bounded top-k results (<= 20 rows
    each) — the fusion join, the rank windows, and the final sort all
    run over at most 40 rows regardless of corpus size; corpus-scale
    work happens inside the arms, which keep their own scale shapes
    (e18's pre-shuffle term filter, e03's two-stage top-k). The
    partition-less windows here are post-limit by construction.
    Determinism: integer ranks; rrf_score is a fixed-order two-term
    IEEE sum rounded to 6dp; ties break on doc_id."""
    from pyspark.sql.window import Window as W

    from dynamodb_zero_etl_s3tables_spark.operators.llm_similarity import (
        e03_cosine_topk,
    )

    lex = e18_bm25_retrieval(spark, sf_dir)
    wl = W.partitionBy(F.lit(1)).orderBy(F.col("bm25").desc(), "doc_id")
    lexr = lex.select(
        "doc_id", F.row_number().over(wl).alias("lex_rank")
    )
    dense = e03_cosine_topk(spark, sf_dir).select(
        F.col("vec_id").alias("doc_id"), F.col("rank").alias("dense_rank")
    )
    fused = lexr.join(dense, "doc_id", "full").select(
        "doc_id",
        F.coalesce("lex_rank", F.lit(0)).alias("lex_rank"),
        F.coalesce("dense_rank", F.lit(0)).alias("dense_rank"),
        F.round(
            F.coalesce(
                1.0 / (_RRF_K + F.col("lex_rank")), F.lit(0.0)
            )
            + F.coalesce(
                1.0 / (_RRF_K + F.col("dense_rank")), F.lit(0.0)
            ),
            6,
        ).alias("rrf_score"),
    )
    wf = W.partitionBy(F.lit(1)).orderBy(F.col("rrf_score").desc(), "doc_id")
    return fused.withColumn("fused_rank", F.row_number().over(wf))


# ---------------------------------------------------------------------------
# e63: per-source Zipf rank-frequency slope
# ---------------------------------------------------------------------------

_ZIPF_R = 100  # fit over the top-R ranks (Zipf holds in the head)


@query(
    "e63_zipf_slope",
    oracle=f"""
    WITH cnt AS (
      SELECT source, token, COUNT(*) AS c
      FROM (SELECT source, UNNEST(string_split(LOWER(text), ' ')) AS token
            FROM documents)
      GROUP BY source, token
    ),
    ranked AS (
      SELECT source, c,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY c DESC, token) AS rnk
      FROM cnt
    ),
    pts AS (
      SELECT source, ROUND(LN(rnk), 6) AS lx, ROUND(LN(c), 6) AS ly
      FROM ranked WHERE rnk <= {_ZIPF_R}
    ),
    sums AS (
      SELECT source,
             CAST(COUNT(*) AS DOUBLE) AS n,
             {DSUM('lx')} AS sx, {DSUM('ly')} AS sy,
             {DSUM('lx * lx', 12)} AS sxx, {DSUM('lx * ly', 12)} AS sxy
      FROM pts GROUP BY source
    )
    SELECT source, CAST(n AS BIGINT) AS n_ranks,
           ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS zipf_slope
    FROM sums
    """,
)
def e63_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E-family: per-source ZIPF rank-frequency slope — OLS fit of
    ln(freq) ~ ln(rank) over each source's top-{_ZIPF_R} token ranks.
    Natural text sits near slope -1 (Zipf's law, public literature);
    a source whose slope diverges (too flat = template/boilerplate
    spam, too steep = degenerate vocabulary) is a corpus-health flag
    the e19 report card can't see — same diagnostic family as e54's
    PSI drift, but on the vocabulary's SHAPE rather than a length
    marginal.

    Scale: per-(source, token) counts are one partial-aggregated
    shuffle of the token stream; the per-source rank is TWO-STAGE
    (partial top-{_ZIPF_R} inside each input partition, then the
    final per-source window over <= R x partitions survivors — the
    e43 discipline, so the vocabulary-sized frame never funnels
    through one task). The OLS fit is a per-source aggregate over
    exactly R points. Determinism: LN+ROUND-6 on integer inputs (the
    e05/e18 discipline), decimal sums, ties break on token."""
    from pyspark.sql.window import Window as W

    d = load(spark, sf_dir, "documents")
    cnt = (
        d.select(
            "source", F.explode(F.split(F.lower("text"), " ")).alias("token")
        )
        .groupBy("source", "token")
        .agg(F.count("*").alias("c"))
    )
    # stage 1: partial per-(source, input-partition) top-R
    partial = (
        cnt.withColumn("part", F.spark_partition_id())
        .withColumn(
            "prn",
            F.row_number().over(
                W.partitionBy("source", "part").orderBy(
                    F.col("c").desc(), "token"
                )
            ),
        )
        .filter(F.col("prn") <= _ZIPF_R)
        .drop("part", "prn")
    )
    # stage 2: exact per-source rank over the bounded survivors
    ranked = partial.withColumn(
        "rnk",
        F.row_number().over(
            W.partitionBy("source").orderBy(F.col("c").desc(), "token")
        ),
    ).filter(F.col("rnk") <= _ZIPF_R)
    pts = ranked.select(
        "source",
        F.round(F.log("rnk"), 6).alias("lx"),
        F.round(F.log("c"), 6).alias("ly"),
    )
    sums = pts.groupBy("source").agg(
        F.count("*").cast("double").alias("n"),
        dsum("lx").alias("sx"),
        dsum("ly").alias("sy"),
        dsum(F.col("lx") * F.col("lx"), 12).alias("sxx"),
        dsum(F.col("lx") * F.col("ly"), 12).alias("sxy"),
    )
    return sums.select(
        "source",
        F.col("n").cast("bigint").alias("n_ranks"),
        F.round(
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
            / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")),
            6,
        ).alias("zipf_slope"),
    )


# ---------------------------------------------------------------------------
# e66: stratified eval split with exact largest-remainder apportionment
# ---------------------------------------------------------------------------

_EVAL_PCT = 10  # eval target: 10% of the corpus, exactly apportioned


@query(
    "e66_stratified_split",
    oracle=f"""
    WITH strata AS (
      SELECT source, COUNT(*) AS n FROM documents GROUP BY source
    ),
    tot AS (
      SELECT SUM(n) AS big_n, (SUM(n) * {_EVAL_PCT}) // 100 AS t
      FROM strata
    ),
    quota AS (
      SELECT s.source, s.n,
             (t.t * s.n) // tot.big_n AS qf,
             (t.t * s.n) % tot.big_n AS rem
      FROM strata s, tot t, tot
    ),
    short AS (
      SELECT t.t - SUM(q.qf) AS k FROM quota q, tot t GROUP BY t.t
    ),
    ranked AS (
      SELECT source, n, qf, rem,
             ROW_NUMBER() OVER (ORDER BY rem DESC, source) AS rr
      FROM quota
    ),
    alloc AS (
      SELECT source, n,
             qf + CASE WHEN rr <= (SELECT k FROM short) THEN 1 ELSE 0 END
               AS eval_quota
      FROM ranked
    ),
    hashed AS (
      SELECT d.source, d.doc_id,
             ROW_NUMBER() OVER (
               PARTITION BY d.source
               ORDER BY md5('eval|' || CAST(d.doc_id AS VARCHAR)), d.doc_id
             ) AS hr
      FROM documents d
    ),
    chosen AS (
      SELECT h.source, h.doc_id
      FROM hashed h JOIN alloc a ON h.source = a.source
      WHERE h.hr <= a.eval_quota
    )
    SELECT a.source, CAST(a.n AS BIGINT) AS n_docs,
           CAST(a.eval_quota AS BIGINT) AS eval_quota,
           CAST(COALESCE(SUM(c.doc_id), 0) AS BIGINT) AS eval_id_sum
    FROM alloc a LEFT JOIN chosen c ON a.source = c.source
    GROUP BY a.source, a.n, a.eval_quota
    """,
)
def e66_stratified_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E8 family: STRATIFIED eval split with EXACT largest-remainder
    apportionment (Hamilton's method, public): the eval set is
    exactly floor(N * {_EVAL_PCT}%) documents, distributed across
    source strata proportionally — floor quotas first, then +1 to the
    strata with the largest integer remainders until the total is
    exact. Within a stratum, membership is the lowest content-hash
    ranks (e08's md5 discipline), so the selection is a pure function
    of the data: any engine, any layout, any rerun picks the same
    documents — `eval_id_sum` pins that cross-engine. This is the
    eval-set builder e08's independent per-row buckets can't be: e08
    hits 10% only in expectation; benchmark curation needs the exact
    count AND per-source proportionality (else small sources vanish
    from the eval set).

    Scale: strata/quota/allocation frames are O(sources) — pure
    integer arithmetic (// and %), no floats anywhere in the
    apportionment; the per-stratum hash rank is one window over the
    corpus partitioned by source (two-stage not needed: rank feeds a
    per-stratum top-quota filter, and a skewed source can use the
    e43 partial-rank discipline unchanged). One corpus scan total."""
    from pyspark.sql.window import Window as W

    d = load(spark, sf_dir, "documents")
    strata = d.groupBy("source").agg(F.count("*").alias("n"))
    tot = strata.agg(
        F.sum("n").alias("big_n"),
        F.expr(f"div(sum(n) * {_EVAL_PCT}, 100)").alias("t"),
    )
    quota = strata.join(F.broadcast(tot)).select(
        "source",
        "n",
        "big_n",
        "t",
        F.expr("div(t * n, big_n)").alias("qf"),
        ((F.col("t") * F.col("n")) % F.col("big_n")).alias("rem"),
    )
    short = quota.groupBy("t").agg(
        (F.first("t") - F.sum("qf")).alias("k")
    ).select("k")
    ranked = quota.withColumn(
        "rr",
        F.row_number().over(W.orderBy(F.col("rem").desc(), "source")),
    )
    alloc = ranked.join(F.broadcast(short)).select(
        "source",
        "n",
        (
            F.col("qf")
            + F.when(F.col("rr") <= F.col("k"), 1).otherwise(0)
        ).alias("eval_quota"),
    )
    hr = F.row_number().over(
        W.partitionBy("source").orderBy(
            # own salt ('eval|'): reusing e08b's 'strat|' coupled
            # eval-set membership to the stratified-sample draw — the
            # per-operator-salt discipline exists precisely so
            # selections are independent functions of the data
            F.md5(F.concat(F.lit("eval|"), F.col("doc_id").cast("string"))),
            "doc_id",
        )
    )
    hashed = d.select("source", "doc_id", hr.alias("hr"))
    chosen = hashed.join(F.broadcast(alloc.select("source", "eval_quota")), "source").filter(
        F.col("hr") <= F.col("eval_quota")
    )
    return (
        alloc.join(
            chosen.groupBy("source").agg(
                F.sum("doc_id").alias("eval_id_sum")
            ),
            "source",
            "left",
        )
        .select(
            "source",
            F.col("n").alias("n_docs"),
            "eval_quota",
            F.coalesce("eval_id_sum", F.lit(0)).alias("eval_id_sum"),
        )
    )


# ---------------------------------------------------------------------------
# e68: sliding-window RAG chunker with overlap + provenance
# ---------------------------------------------------------------------------

_CHUNK = 64   # window length (tokens)
_STRIDE = 32  # window stride (50% overlap)


@query(
    "e68_sliding_chunks",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS toks,
             len(string_split(text, ' ')) AS n
      FROM documents
    ),
    shaped AS (
      SELECT doc_id, toks, n,
             1 + CASE WHEN n > {_CHUNK}
                      THEN (n - {_CHUNK} + {_STRIDE} - 1) // {_STRIDE}
                      ELSE 0 END AS n_chunks
      FROM t
    ),
    chunks AS (
      SELECT doc_id, n, n_chunks,
             UNNEST(range(0, n_chunks)) AS chunk_idx
      FROM shaped
    )
    SELECT c.doc_id, CAST(c.chunk_idx AS INT) AS chunk_idx,
           CAST(c.chunk_idx * {_STRIDE} + 1 AS BIGINT) AS start_tok,
           CAST(LEAST(c.chunk_idx * {_STRIDE} + {_CHUNK}, c.n)
                - c.chunk_idx * {_STRIDE} AS BIGINT) AS chunk_len,
           md5(array_to_string(
                 t.toks[(c.chunk_idx * {_STRIDE} + 1):
                        LEAST(c.chunk_idx * {_STRIDE} + {_CHUNK}, c.n)],
                 ' ')) AS chunk_fp
    FROM chunks c JOIN t ON c.doc_id = t.doc_id
    """,
)
def e68_sliding_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E-family: SLIDING-WINDOW CHUNKER for RAG indexing —
    {_CHUNK}-token windows at {_STRIDE}-token stride (50% overlap,
    the standard retrieval-chunking default) with full provenance:
    each chunk's 1-based token span plus an md5 fingerprint of the
    exact token slice, which is what a retrieval index stores to
    dedupe chunks and map hits back to document offsets. Complements
    e20 (fixed NON-overlapping chunks for dedup granularity) — the
    overlap here is deliberate: a boundary-straddling answer span
    appears intact in at least one chunk.

    Scale: pure per-row expression work — tokenize once, derive the
    chunk count arithmetically, explode a bounded integer sequence,
    slice + hash JVM-side (no UDF, no shuffle at all until whatever
    consumes the chunks aggregates them). Output cardinality is
    sum(ceil(tokens/stride)) ~= corpus_tokens/{_STRIDE}, emitted
    streaming from the scan. All-integer span math; the fingerprint
    pins the slicing cross-engine."""
    d = load(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    n = F.size(toks)
    n_chunks = F.lit(1) + F.when(
        n > _CHUNK, F.floor((n - _CHUNK + _STRIDE - 1) / _STRIDE)
    ).otherwise(0)
    shaped = d.select(
        "doc_id",
        toks.alias("toks"),
        n.alias("n"),
        F.explode(F.sequence(F.lit(0), n_chunks.cast("int") - 1)).alias(
            "chunk_idx"
        ),
    )
    start = F.col("chunk_idx") * _STRIDE + 1
    clen = F.least(
        F.col("chunk_idx") * _STRIDE + _CHUNK, F.col("n")
    ) - F.col("chunk_idx") * _STRIDE
    return shaped.select(
        "doc_id",
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        start.cast("bigint").alias("start_tok"),
        clen.cast("bigint").alias("chunk_len"),
        F.md5(
            F.array_join(F.slice(F.col("toks"), start, clen), " ")
        ).alias("chunk_fp"),
    )



# ---------------------------------------------------------------------------
# e69: quality-aware representative selection for dup clusters
# ---------------------------------------------------------------------------


def _e69_oracle() -> str:
    """Composed from the registered e02h (components) and e05c
    (quality) oracles — the e62 discipline: the keep-policy twin can
    never drift from the clusters and scores it ranks."""
    from dynamodb_zero_etl_s3tables_spark.operators.registry import (
        QUERY_REGISTRY,
    )

    comp = QUERY_REGISTRY["e02h_dedup_components"].oracle
    qual = QUERY_REGISTRY["e05c_quality_score"].oracle
    return f"""
    WITH comp AS ({comp}),
    qual AS ({qual}),
    members AS (
      SELECT c.component_rep, c.doc_id, q.passes_filter, q.n_tokens
      FROM comp c JOIN qual q ON c.doc_id = q.doc_id
    ),
    sized AS (
      SELECT component_rep, COUNT(*) AS n_members FROM members
      GROUP BY component_rep HAVING COUNT(*) > 1
    ),
    ranked AS (
      SELECT m.component_rep, m.doc_id, m.n_tokens,
             ROW_NUMBER() OVER (
               PARTITION BY m.component_rep
               ORDER BY m.passes_filter DESC, m.n_tokens DESC, m.doc_id
             ) AS rn
      FROM members m JOIN sized s ON m.component_rep = s.component_rep
    )
    SELECT r.component_rep, s.n_members,
           r.doc_id AS kept_doc_id,
           CAST(r.n_tokens AS BIGINT) AS kept_n_tokens,
           s.n_members - 1 AS n_dropped
    FROM ranked r JOIN sized s ON r.component_rep = s.component_rep
    WHERE r.rn = 1
    """


@query("e69_best_of_cluster", oracle=_e69_oracle())
def e69_best_of_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E2 keep-policy stage: QUALITY-AWARE representative selection —
    for every multi-member near-dup component (e02h's exact connected
    components), keep the member by the documented production policy
    (FineWeb/CCNet practice, public): quality-gate pass first, then
    longest, then smallest doc_id. e02g/e02h keep min-doc_id (an
    arbitrary member); real curation keeps the BEST copy, because
    near-dup clusters routinely mix a clean original with truncated
    or boilerplate-wrapped mirrors.

    Scale: composes two already-bounded frames — component labels
    (one row per doc) and per-doc quality scores (projection-only) —
    through one equi-join; the keep window partitions on the
    component label (cluster sizes are small by near-dup physics, and
    a pathological mega-cluster is exactly what e02b's bucket cap
    bounds upstream). Output is one row per multi-member cluster.
    Determinism: integer/boolean sort keys only, total order via
    doc_id."""
    from pyspark.sql.window import Window as W

    from dynamodb_zero_etl_s3tables_spark.operators.llm_dedup import (
        e02h_dedup_components,
    )

    comp = e02h_dedup_components(spark, sf_dir)
    qual = e05c_quality_score(spark, sf_dir).select(
        "doc_id", "passes_filter", "n_tokens"
    )
    members = comp.select("component_rep", "doc_id").join(qual, "doc_id")
    sized = (
        members.groupBy("component_rep")
        .agg(F.count("*").alias("n_members"))
        .filter(F.col("n_members") > 1)
    )
    ranked = members.join(sized, "component_rep").withColumn(
        "rn",
        F.row_number().over(
            W.partitionBy("component_rep").orderBy(
                F.col("passes_filter").desc(),
                F.col("n_tokens").desc(),
                "doc_id",
            )
        ),
    )
    return ranked.filter(F.col("rn") == 1).select(
        "component_rep",
        "n_members",
        F.col("doc_id").alias("kept_doc_id"),
        F.col("n_tokens").cast("bigint").alias("kept_n_tokens"),
        (F.col("n_members") - 1).alias("n_dropped"),
    )


@query(
    "e72_temperature_mixture",
    oracle="""
    WITH cnt AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang),
    tgt AS (SELECT MIN(n) AS min_n FROM cnt),
    h AS (
      SELECT d.doc_id, d.lang, c.n, t.min_n,
             ('0x' || substr(md5('temp|' || CAST(d.doc_id AS VARCHAR)), 1, 15))::BIGINT
               % 10000 AS bucket
      FROM documents d JOIN cnt c ON d.lang = c.lang CROSS JOIN tgt t
    )
    SELECT doc_id, lang, bucket
    FROM h
    WHERE bucket * bucket * n < 100000000 * min_n
    """,
)
def e72_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E15 family: TEMPERATURE-based mixture sampling — keep each
    document of language L with probability (min_n / n_L)^(1/2), the
    alpha=0.5 temperature flattening multilingual pipelines use to
    boost low-resource languages without e15's hard equalization
    (mBERT/XLM-R exponential smoothing, mT5 alpha sampling; public).
    The sqrt never touches floating point: acceptance
    ``bucket/10000 < sqrt(min_n/n)`` is squared into the EXACT integer
    predicate ``bucket^2 * n < 10^8 * min_n`` (bucket < 10^4 and
    corpus counts keep the product far inside int64), so both engines
    keep bit-identical rows — the same boundary-proofing discipline as
    e15's linear rates. Shape: one metadata-sized count aggregate
    broadcast back over a single corpus scan; generalizes to any
    alpha = p/q by raising both sides to the q-th power."""
    d = load(spark, sf_dir, "documents")
    cnt = d.groupBy("lang").agg(F.count("*").alias("n"))
    tgt = cnt.agg(F.min("n").alias("min_n"))
    bucket = key_bucket("temp|", 10000)
    return (
        d.join(F.broadcast(cnt), "lang")
        .join(F.broadcast(tgt))
        .select("doc_id", "lang", bucket.alias("bucket"), "n", "min_n")
        .filter(
            F.col("bucket") * F.col("bucket") * F.col("n")
            < F.lit(100000000) * F.col("min_n")
        )
        .select("doc_id", "lang", "bucket")
    )


@query(
    "e73_feature_hash_embed",
    oracle="""
    WITH tok AS (
      SELECT doc_id, UNNEST(string_split(LOWER(text), ' ')) AS token
      FROM documents
    ),
    h AS (
      SELECT doc_id,
             ('0x' || substr(md5('fh|' || token), 1, 15))::BIGINT AS hv
      FROM tok
    )
    SELECT doc_id, CAST(hv % 64 AS BIGINT) AS dim,
           CAST(SUM(CASE WHEN (hv // 64) % 2 = 0 THEN 1 ELSE -1 END) AS BIGINT)
             AS w
    FROM h
    GROUP BY doc_id, hv % 64
    HAVING SUM(CASE WHEN (hv // 64) % 2 = 0 THEN 1 ELSE -1 END) <> 0
    """,
)
def e73_feature_hash_embed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E5/E3 bridge: signed feature-hash document embeddings (the
    hashing trick — Weinberger et al., ICML 2009; fastText's input
    layer) — a 64-dim sparse vector per document from token hashes
    alone, no trained model: dim = h mod 64, sign = parity of the next
    hash bit, coordinate = signed token count. Zero-valued coordinates
    (exact sign cancellation) drop on both engines. All integer
    arithmetic end-to-end, so the cross-engine hash is exact by
    construction. Shape: explode -> one groupBy(doc, dim) shuffle with
    map-side partial aggregation; output is the sparse COO triple
    form downstream ops consume directly (cosine via a dim-keyed
    self-join instead of a dense fold). At 100 TB this is the standard
    cheap-embedding path: linear scan, bounded dimensionality,
    no model broadcast."""
    d = load(spark, sf_dir, "documents")
    hv = mh64(F.concat(F.lit("fh|"), F.col("token")))
    sign = F.when(F.expr("hv div 64") % 2 == 0, F.lit(1)).otherwise(F.lit(-1))
    return (
        d.select("doc_id", F.explode(F.split(F.lower("text"), " ")).alias("token"))
        .select("doc_id", hv.alias("hv"))
        .select("doc_id", (F.col("hv") % 64).cast("bigint").alias("dim"), sign.alias("s"))
        .groupBy("doc_id", "dim")
        .agg(F.sum("s").cast("bigint").alias("w"))
        .filter(F.col("w") != 0)
    )


@query(
    "e77_trained_langid",
    oracle="""
    WITH lab AS (
      SELECT doc_id, lang, LOWER(text) AS ltext,
             ('0x' || substr(md5('split|' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT
               % 100 AS bucket
      FROM documents
    ),
    train_tok AS (
      SELECT lang, UNNEST(string_split(ltext, ' ')) AS token
      FROM lab WHERE bucket < 80
    ),
    cnt AS (SELECT lang, token, COUNT(*) AS c FROM train_tok GROUP BY lang, token),
    nl AS (SELECT lang, COUNT(*) AS n FROM train_tok GROUP BY lang),
    test_tok AS (
      SELECT doc_id, lang AS true_lang, UNNEST(string_split(ltext, ' ')) AS token
      FROM lab WHERE bucket >= 90
    ),
    scored AS (
      SELECT t.doc_id, t.true_lang, n.lang AS cand_lang,
             CAST(COALESCE(SUM(c.c), 0) AS DOUBLE) / n.n AS score
      FROM test_tok t
      CROSS JOIN nl n
      LEFT JOIN cnt c ON c.token = t.token AND c.lang = n.lang
      GROUP BY t.doc_id, t.true_lang, n.lang, n.n
    ),
    pred AS (
      SELECT doc_id, true_lang, cand_lang AS pred_lang
      FROM (SELECT *, ROW_NUMBER() OVER (
              PARTITION BY doc_id ORDER BY score DESC, cand_lang) AS rn
            FROM scored)
      WHERE rn = 1
    )
    SELECT true_lang, pred_lang, COUNT(*) AS n
    FROM pred GROUP BY true_lang, pred_lang
    """,
)
def e77_trained_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E5 family: TRAINED language ID — learn per-language unigram
    frequency tables on the e08 train split (bucket < 80), classify
    the held-out test split (bucket >= 90) by the average training
    frequency of its tokens, and emit the confusion matrix — the
    train/eval loop of a fastText-style langid (public shape), where
    e05b is the zero-shot marker heuristic. The score factors as
    (sum of per-token train counts) / (language token total): ONE
    IEEE division of two exact integers per (doc, language), so both
    engines produce bit-identical doubles — no logs, no per-token
    float sums (the determinism contract survives a trained model).
    Argmax ties break on language name.

    Scale: training is one (lang, token) count shuffle; the model
    stays a table (no driver round-trip); classification joins test
    tokens to counts on the token key and aggregates per (doc, lang)
    — corpus-linear, the per-doc window ranks 5 candidate rows."""
    d = load(spark, sf_dir, "documents")
    bucket = key_bucket("split|", 100)
    lab = d.select(
        "doc_id", "lang", F.lower("text").alias("ltext"), bucket.alias("bucket")
    )
    train_tok = (
        lab.filter(F.col("bucket") < 80)
        .select("lang", F.explode(F.split("ltext", " ")).alias("token"))
    )
    cnt = (
        train_tok.groupBy("lang", "token")
        .agg(F.count("*").alias("c"))
        .select(
            F.col("lang").alias("c_lang"), F.col("token").alias("c_token"), "c"
        )
    )
    nl = train_tok.groupBy("lang").agg(F.count("*").alias("n")).select(
        F.col("lang").alias("cand_lang"), "n"
    )
    test_tok = lab.filter(F.col("bucket") >= 90).select(
        "doc_id",
        F.col("lang").alias("true_lang"),
        F.explode(F.split("ltext", " ")).alias("token"),
    )
    scored = (
        test_tok.join(F.broadcast(nl))
        .join(
            cnt,
            (F.col("token") == F.col("c_token"))
            & (F.col("cand_lang") == F.col("c_lang")),
            "left",
        )
        .groupBy("doc_id", "true_lang", "cand_lang", "n")
        .agg(
            (F.coalesce(F.sum("c"), F.lit(0)).cast("double") / F.col("n")).alias(
                "score"
            )
        )
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("cand_lang")
    )
    pred = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("true_lang", F.col("cand_lang").alias("pred_lang"))
    )
    return pred.groupBy("true_lang", "pred_lang").agg(F.count("*").alias("n"))


#: e82 mixing-budget knobs: total budget = BUDGET_X x corpus tokens;
#: each language repeatable at most NUM/DEN epochs (fractional cap,
#: kept as exact integers: cap_tokens = NUM * n // DEN) — the
#: data-constrained regime: the budget wants more tokens than exist
#: for the small languages
E82_BUDGET_X = 2
E82_EPOCH_CAP_NUM = 5
E82_EPOCH_CAP_DEN = 2


@query(
    "e82_token_budget_epochs",
    oracle=f"""
    WITH tok AS (
      SELECT lang,
             CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
      FROM documents GROUP BY lang
    ), tot AS (
      SELECT CAST(SUM(n_tokens) AS BIGINT) AS total, COUNT(*) AS k FROM tok
    ), a1 AS (
      SELECT t.lang, t.n_tokens,
             CAST(({E82_EPOCH_CAP_NUM}::HUGEINT * t.n_tokens::HUGEINT)
                  // {E82_EPOCH_CAP_DEN} AS BIGINT) AS cap,
             CAST(LEAST(({E82_BUDGET_X}::HUGEINT * tot.total::HUGEINT) // tot.k,
                   ({E82_EPOCH_CAP_NUM}::HUGEINT * t.n_tokens::HUGEINT)
                   // {E82_EPOCH_CAP_DEN}) AS BIGINT)
               AS alloc1,
             {E82_BUDGET_X} * tot.total AS budget
      FROM tok t CROSS JOIN tot
    ), agg AS (
      SELECT SUM(alloc1) AS sum1, SUM(cap - alloc1) AS totcap FROM a1
    ), fin AS (
      SELECT a1.lang, a1.n_tokens, a1.cap,
             LEAST(
               a1.alloc1 + CASE WHEN agg.totcap = 0 THEN 0
                    ELSE CAST(((a1.budget - agg.sum1)::HUGEINT
                               * (a1.cap - a1.alloc1)::HUGEINT)
                              // agg.totcap::HUGEINT AS BIGINT) END,
               a1.cap) AS alloc
      FROM a1 CROSS JOIN agg
    )
    SELECT lang, n_tokens,
           CAST(alloc AS BIGINT) AS alloc_tokens,
           ROUND(CAST(alloc AS DOUBLE) / n_tokens, 6) AS epochs,
           alloc = cap AS at_repeat_cap
    FROM fin
    """,
)
def e82_token_budget_epochs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E5/mixing: per-language EPOCH allocation under a global token
    budget with a repeat cap — the data-constrained-scaling primitive
    (Muennighoff et al. 2023: when the budget exceeds the unique
    corpus, small sources repeat up to a cap and the remainder
    redistributes to the big ones). Policy: UNIFORM target (budget/k
    per language), clamp at {E82_EPOCH_CAP_NUM}/{E82_EPOCH_CAP_DEN}
    epochs of each language's unique tokens, redistribute the unspent
    budget proportional to remaining capacity in ONE round, final
    clamp (any residual stays unallocated — the regime where the
    budget cannot be filled at the cap). On this corpus the small
    languages cap and English absorbs the redistribution — all
    branches exercised. Every step is exact BIGINT arithmetic (floor
    divisions), so the allocation hash-matches cross-engine with no
    float-sum order sensitivity; the only doubles are the final
    per-language epoch ratios (single divisions).

    Scale: one token-count aggregate over the corpus (the explode-free
    ``size(split())`` scan e05d uses), then language-level arithmetic
    on a handful of broadcast-joined rows — at 100 TB the cost is the
    corpus scan."""
    d = load(spark, sf_dir, "documents")
    tok = d.groupBy("lang").agg(
        F.sum(F.size(F.split("text", " "))).alias("n_tokens")
    )
    tot = tok.agg(F.sum("n_tokens").alias("total"), F.count("*").alias("k"))
    # exact DECIMAL(38,0) DIV mirroring the oracle's HUGEINT // — at
    # 100 TB the redistribution product exceeds both 2^53 and 2^63,
    # so double floor-division would diverge cross-engine (ADVICE r6)
    cap = F.expr(
        f"CAST((CAST({E82_EPOCH_CAP_NUM} AS DECIMAL(38,0)) * n_tokens)"
        f" DIV {E82_EPOCH_CAP_DEN} AS BIGINT)"
    )
    share = F.expr(
        f"CAST((CAST({E82_BUDGET_X} AS DECIMAL(38,0)) * total) DIV k AS BIGINT)"
    )
    a1 = tok.join(F.broadcast(tot)).select(
        "lang",
        "n_tokens",
        cap.alias("cap"),
        F.least(share, cap).alias("alloc1"),
        (F.lit(E82_BUDGET_X) * F.col("total")).alias("budget"),
    )
    agg = a1.agg(
        F.sum("alloc1").alias("sum1"),
        F.sum(F.col("cap") - F.col("alloc1")).alias("totcap"),
    )
    j = a1.join(F.broadcast(agg))
    redis = F.when(F.col("totcap") == 0, F.lit(0)).otherwise(
        F.expr(
            "CAST((CAST(budget - sum1 AS DECIMAL(38,0)) * (cap - alloc1))"
            " DIV totcap AS BIGINT)"
        )
    )
    alloc = F.least(F.col("alloc1") + redis, F.col("cap"))
    return j.select(
        "lang",
        "n_tokens",
        alloc.cast("long").alias("alloc_tokens"),
        F.round(alloc.cast("double") / F.col("n_tokens"), 6).alias("epochs"),
        (alloc == F.col("cap")).alias("at_repeat_cap"),
    )


# ---------------------------------------------------------------------------
# E86: TRAINED quality classifier — logistic regression by full-batch
# gradient descent, run entirely as DataFrame aggregates. e46 scores
# with a FIXED linear model; this one LEARNS the weights (the
# fastText/FineWeb-Edu classifier-training step, distilled to the
# engine's determinism discipline): 3 GD iterations, each ONE
# corpus-scan gradient aggregate against the previous round's
# broadcast weights. The e34 precedent (power iteration) extended
# from linear algebra to model fitting: per-round 6dp re-quantization
# of z, p, and w keeps the whole iterative float chain bit-identical
# across engines.
# ---------------------------------------------------------------------------

#: hashed bag-of-words dimensionality (e73's hashing-trick space)
LR_DIMS = 64
LR_ITERS = 3
#: learning rate — DYADIC (exact double multiply, no 0.1-style
#: representation error entering the update). 64 suits the
#: L1-normalized feature scale (each x_j <= 1, sum_j x_j = 1, so
#: per-dim gradients are O(1/DIMS)): measured across all three SFs,
#: 3 rounds at 64 reach max|w| ~0.6-0.7 with monotone loss and a
#: well-calibrated reliability table (e88 ECE 0.002-0.016), where
#: 2.0 leaves predictions pinned to the base rate and 256 overshoots
#: (ECE 0.29).
LR_RATE = 64.0


def _lr_ctes() -> list:
    """Shared CTE chain for e86 (training) and e88 (calibration):
    features, labels, and LR_ITERS unrolled GD rounds ending in
    w{LR_ITERS}."""
    from dynamodb_zero_etl_s3tables_spark.operators.registry import MH64

    dim_expr = f"({MH64(chr(39) + 'lrq|' + chr(39) + ' || token')} % {LR_DIMS})"
    ctes = [
        "toks AS (SELECT doc_id, string_split(LOWER(text), ' ') AS t FROM documents)",
        f"""occ AS (
          SELECT doc_id, len(t) AS n, {dim_expr} AS dim
          FROM (SELECT doc_id, t, UNNEST(t) AS token FROM toks)
        )""",
        """feats AS (
          SELECT doc_id, dim, ROUND(CAST(COUNT(*) AS DOUBLE) / n, 6) AS x
          FROM occ GROUP BY doc_id, dim, n
        )""",
        "labels AS (SELECT doc_id, CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y FROM documents)",
        "ndocs AS (SELECT COUNT(*) AS nd FROM documents)",
        f"dims AS (SELECT UNNEST(range(0, {LR_DIMS})) AS dim)",
        "w0 AS (SELECT dim, CAST(0.0 AS DOUBLE) AS w FROM dims)",
    ]
    for t in range(1, LR_ITERS + 1):
        ctes.append(
            f"""z{t} AS (
          SELECT f.doc_id,
                 ROUND(CAST(SUM(CAST(f.x * w.w AS DECIMAL(25,12))) AS DOUBLE), 6) AS z
          FROM feats f JOIN w{t - 1} w USING (dim) GROUP BY f.doc_id
        )"""
        )
        ctes.append(
            f"p{t} AS (SELECT doc_id, ROUND(1.0 / (1.0 + EXP(-z)), 6) AS p FROM z{t})"
        )
        ctes.append(
            f"""g{t} AS (
          SELECT dim,
                 CAST(SUM(CAST((p.p - l.y) * f.x AS DECIMAL(25,12))) AS DOUBLE) AS gsum
          FROM feats f JOIN p{t} p USING (doc_id) JOIN labels l USING (doc_id)
          GROUP BY dim
        )"""
        )
        ctes.append(
            f"""w{t} AS (
          SELECT d.dim,
                 ROUND(COALESCE(w.w, 0.0) - {LR_RATE} * COALESCE(g.gsum, 0.0) / nd, 6) AS w
          FROM dims d
          LEFT JOIN w{t - 1} w USING (dim)
          LEFT JOIN g{t} g USING (dim), ndocs
        )"""
        )
    return ctes


def _lr_oracle() -> str:
    return (
        "WITH " + ",\n    ".join(_lr_ctes())
        + f"\n    SELECT dim, w AS weight FROM w{LR_ITERS}"
    )


def _lr_feats(spark: SparkSession, sf_dir: str):
    """(feats, labels) for e86: 64-dim hashed bag-of-words with
    per-doc L1 normalization at 6dp, and the lang='en' teacher
    label. Shared with the learning-signal test."""
    d = load(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.split(F.lower("text"), " ").alias("t"))
    occ = toks.select(
        "doc_id", F.size("t").alias("n"), F.explode("t").alias("token")
    )
    dim = (mh64(F.concat(F.lit("lrq|"), F.col("token"))) % LR_DIMS).alias("dim")
    feats = (
        occ.groupBy("doc_id", "n", dim)
        .agg(F.count("*").alias("cnt"))
        .select(
            "doc_id",
            "dim",
            F.round(F.col("cnt").cast("double") / F.col("n"), 6).alias("x"),
        )
    )
    labels = d.select(
        "doc_id", (F.col("lang") == "en").cast("int").alias("y")
    )
    return feats, labels


def _train_logreg(spark: SparkSession, sf_dir: str) -> dict:
    """The e86 GD loop, shared with e88's calibration audit: returns
    the final {dim: weight} after LR_ITERS rounds (each round ONE
    corpus scan; only 64 floats return to the driver per round)."""
    feats, labels = _lr_feats(spark, sf_dir)
    # feats feeds TWO passes per round (the z dot-product and the
    # gradient join) and labels one; without pinning them the
    # tokenize->explode->aggregate pipeline re-ran from the documents
    # scan 2x per round (guide §5 "reused AND expensive to recompute"
    # — measured r10: 2.1s of e86's 3.8s was repeated tokenization).
    # Values are unchanged: the pinned frames are deterministic
    # intermediates of THIS query's own inputs, released on return.
    feats = feats.cache()
    labels = labels.cache()
    try:
        return _logreg_rounds(feats, labels)
    finally:
        # release on EVERY path (r11, ADVICE r10): an exception inside
        # the GD loop must not leak two cached frames for the lifetime
        # of the long-lived bench/driver session
        feats.unpersist()
        labels.unpersist()


def _logreg_rounds(feats: DataFrame, labels: DataFrame) -> dict:
    nd = labels.count()  # planning scalar (doc count; also pins labels)
    w = {j: 0.0 for j in range(LR_DIMS)}
    for _t in range(LR_ITERS):
        wmap = F.create_map(
            *[c for j in range(LR_DIMS) for c in (F.lit(j), F.lit(w[j]))]
        )
        z = feats.groupBy("doc_id").agg(
            F.round(
                F.sum(
                    (F.col("x") * F.element_at(wmap, F.col("dim"))).cast(
                        "decimal(25,12)"
                    )
                ).cast("double"),
                6,
            ).alias("z")
        )
        p = z.select(
            "doc_id",
            F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("z"))), 6).alias("p"),
        )
        resid = p.join(labels, "doc_id").select(
            "doc_id", (F.col("p") - F.col("y")).alias("r")
        )
        grad = (
            feats.join(resid, "doc_id")
            .groupBy("dim")
            .agg(
                F.sum((F.col("r") * F.col("x")).cast("decimal(25,12)"))
                .cast("double")
                .alias("gsum")
            )
        )
        wnext = grad.select(
            "dim",
            F.round(
                F.element_at(wmap, F.col("dim"))
                - F.lit(LR_RATE) * F.col("gsum") / F.lit(nd),
                6,
            ).alias("w"),
        )
        updated = {int(r["dim"]): float(r["w"]) for r in wnext.collect()}
        w = {j: updated.get(j, w[j]) for j in range(LR_DIMS)}
    return w


@query("e86_logreg_quality_training", oracle=_lr_oracle())
def e86_logreg_quality_training(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E86: distributed logistic-regression TRAINING by full-batch
    gradient descent — the model-based-quality-classifier training
    loop (fastText shape; FineWeb-Edu trains exactly this over
    teacher labels). Features are e73's hashing trick (64-dim hashed
    bag-of-words, L1-normalized per doc, 6dp); the label distilled
    here is lang='en' membership (a stand-in for any reference set —
    swapping the label column swaps the teacher, not the loop).

    Per iteration, everything is ONE scan + two bounded aggregates:
    z (per-doc dot product against the 64-weight LITERAL MAP — no
    join, the weights ride the closure like a broadcast), p
    (sigmoid), and the per-dim gradient sum; the weight update runs
    in a 64-row frame and only the 64 floats come back to the driver
    (planning-scalar class, the e67 merge-table discipline). Products
    route through DECIMAL(25,12) before summing (order-independent),
    and z/p/w re-quantize to 6dp each round (the e34 law), so three
    rounds of iterative float optimization stay bit-identical to the
    DuckDB replay. At 100 TB: 3 corpus scans, map-side partial
    aggregation everywhere, shuffles carry (doc, 2 doubles) and
    (dim, 1 double) rows only."""
    w = _train_logreg(spark, sf_dir)
    schema = "dim int, weight double"
    return spark.createDataFrame(
        [(j, w[j]) for j in range(LR_DIMS)], schema
    )


# ---------------------------------------------------------------------------
# E88: calibration audit of the trained classifier — the reliability
# table (Guo et al. 2017's calibration framing) a deployment checks
# BEFORE using e86's probabilities as sampling weights or keep
# thresholds: 10 probability bins x (mean predicted p, observed
# positive rate), whose per-bin gap is the Expected Calibration Error
# integrand. Closes the train -> EVALUATE loop the same way e03e
# closes it for ANN recall and e50/e81 for LSH dedup.
# ---------------------------------------------------------------------------

CAL_BINS = 10


def _e88_oracle() -> str:
    ctes = _lr_ctes()
    t = LR_ITERS
    ctes.append(
        f"""zf AS (
          SELECT f.doc_id,
                 ROUND(CAST(SUM(CAST(f.x * w.w AS DECIMAL(25,12))) AS DOUBLE), 6) AS z
          FROM feats f JOIN w{t} w USING (dim) GROUP BY f.doc_id
        )"""
    )
    ctes.append(
        "pf AS (SELECT doc_id, ROUND(1.0 / (1.0 + EXP(-z)), 6) AS p FROM zf)"
    )
    ctes.append(
        f"""binned AS (
          SELECT l.y, p.p,
                 LEAST(CAST(FLOOR(p.p * {CAL_BINS}) AS INT), {CAL_BINS - 1}) AS bin
          FROM pf p JOIN labels l USING (doc_id)
        )"""
    )
    return (
        "WITH " + ",\n    ".join(ctes)
        + """
    SELECT bin, n, mean_p, pos_rate, ABS(pos_rate - mean_p) AS abs_gap
    FROM (
      SELECT bin, COUNT(*) AS n,
             ROUND(CAST(SUM(CAST(p AS DECIMAL(25,9))) AS DOUBLE) / COUNT(*), 6)
               AS mean_p,
             ROUND(CAST(SUM(CAST(y AS DECIMAL(25,9))) AS DOUBLE) / COUNT(*), 6)
               AS pos_rate
      FROM binned GROUP BY bin
    )"""
    )


@query("e88_classifier_calibration", oracle=_e88_oracle())
def e88_classifier_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E88: reliability table for the e86 classifier — score the
    corpus under the TRAINED weights, bin predictions into 10
    probability deciles, and report each bin's mean predicted
    probability against its observed positive rate; ``abs_gap`` is
    the ECE integrand (sum n/N * abs_gap = Expected Calibration
    Error). A curation pipeline that converts classifier scores into
    keep-probabilities or mixture weights (the FineWeb-Edu pattern)
    is only sound when this table is near-diagonal — the audit is
    the operator.

    Scale: one extra scoring pass over the corpus beyond e86's
    training (same literal-map dot product, no join), then ONE
    aggregate over {CAL_BINS} cells; determinism inherits e86's
    fixed-point chain plus decimal sums for the bin means (the
    binning FLOOR acts on 6dp-rounded doubles — no engine ROUND-half
    behavior anywhere)."""
    w = _train_logreg(spark, sf_dir)
    feats, labels = _lr_feats(spark, sf_dir)
    wmap = F.create_map(
        *[c for j in range(LR_DIMS) for c in (F.lit(j), F.lit(w[j]))]
    )
    z = feats.groupBy("doc_id").agg(
        F.round(
            F.sum(
                (F.col("x") * F.element_at(wmap, F.col("dim"))).cast(
                    "decimal(25,12)"
                )
            ).cast("double"),
            6,
        ).alias("z")
    )
    p = z.select(
        "doc_id",
        F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("z"))), 6).alias("p"),
    )
    binned = p.join(labels, "doc_id").select(
        "y",
        "p",
        F.least(
            F.floor(F.col("p") * CAL_BINS).cast("int"), F.lit(CAL_BINS - 1)
        ).alias("bin"),
    )
    agg = binned.groupBy("bin").agg(
        F.count("*").alias("n"),
        F.round(
            F.sum(F.col("p").cast("decimal(25,9)")).cast("double")
            / F.count("*"),
            6,
        ).alias("mean_p"),
        F.round(
            F.sum(F.col("y").cast("decimal(25,9)")).cast("double")
            / F.count("*"),
            6,
        ).alias("pos_rate"),
    )
    return agg.select(
        "bin",
        "n",
        "mean_p",
        "pos_rate",
        F.abs(F.col("pos_rate") - F.col("mean_p")).alias("abs_gap"),
    )
