"""Independent correctness evidence for the r6 operators beyond the
cross-engine oracle harness (which proves Spark==DuckDB, not absolute
correctness): hand-computed fixtures and self-contained invariants."""

import hashlib

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


# -- e80: exact-substring dedup vs a hand-computed excision -----------------

def test_substring_dedup_hand_fixture(spark):
    """Two docs share an exact 10-token sentence (>= k=8), a third is
    unique: the shared span's tokens — and ONLY those — must be
    excised from both carriers, and the unique doc must pass through
    byte-identical."""
    from dynamodb_zero_etl_s3tables_spark.operators.llm_dedup import (
        substring_dedup,
    )

    shared = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    docs = spark.createDataFrame(
        [
            (1, f"one two three {shared} four five"),
            (2, f"{shared} six seven eight nine ten eleven"),
            (3, "twelve thirteen fourteen fifteen sixteen seventeen "
                "eighteen nineteen twenty twentyone twentytwo"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in substring_dedup(docs, k=8).collect()}

    # doc 3: unique 11-token text, nothing excised
    assert got[3].n_dup_tokens == 0 and got[3].dup_frac == 0.0
    assert got[3].cleaned_md5 == hashlib.md5(
        b"twelve thirteen fourteen fifteen sixteen seventeen "
        b"eighteen nineteen twenty twentyone twentytwo"
    ).hexdigest()

    # doc 1: tokens are [one two three | shared x10 | four five].
    # Duplicated 8-shingles are exactly the 3 fully-inside-the-shared-
    # sentence starts (positions 4..6 1-based), covering positions
    # 4..13 = the 10 shared tokens. Cleaned = prefix + suffix.
    assert got[1].n_tokens == 15
    assert got[1].n_dup_tokens == 10
    assert got[1].cleaned_md5 == hashlib.md5(
        b"one two three four five"
    ).hexdigest()

    # doc 2: [shared x10 | six..eleven] -> shared prefix excised
    assert got[2].n_dup_tokens == 10
    assert got[2].cleaned_md5 == hashlib.md5(
        b"six seven eight nine ten eleven"
    ).hexdigest()


def test_substring_dedup_whole_doc_duplicate(spark):
    """Verbatim duplicate docs collapse to EMPTY rewrites (every
    position covered) — the boilerplate-page case."""
    from dynamodb_zero_etl_s3tables_spark.operators.llm_dedup import (
        substring_dedup,
    )

    text = "a b c d e f g h i j k l"  # 12 tokens
    docs = spark.createDataFrame(
        [(1, text), (2, text)], "doc_id long, text string"
    )
    got = {r.doc_id: r for r in substring_dedup(docs, k=8).collect()}
    for i in (1, 2):
        assert got[i].n_dup_tokens == 12
        assert got[i].dup_frac == 1.0
        assert got[i].cleaned_md5 == hashlib.md5(b"").hexdigest()


def test_substring_dedup_short_docs_untouched(spark):
    """Docs shorter than k tokens can never carry a duplicated span —
    even identical ones pass through unchanged (span semantics, not
    whole-doc dedup)."""
    from dynamodb_zero_etl_s3tables_spark.operators.llm_dedup import (
        substring_dedup,
    )

    docs = spark.createDataFrame(
        [(1, "same five token doc here"), (2, "same five token doc here")],
        "doc_id long, text string",
    )
    for r in substring_dedup(docs, k=8).collect():
        assert r.n_dup_tokens == 0
        assert r.cleaned_md5 == hashlib.md5(b"same five token doc here").hexdigest()


# -- h22: admission invariants, checked independently of the oracle ---------

def test_h22_admission_invariants(spark):
    """Re-derive the band index over the FULL corpus and check the
    admitted set's defining properties without consulting the oracle:
    (a) no admitted wave-2 doc collides with an admitted wave-1 doc;
    (b) every rejected doc collides with an admitted earlier-wave doc
        or a smaller doc_id in its own wave."""
    from dynamodb_zero_etl_s3tables_spark.operators.llm_dedup import (
        _long_bands,
        minhash_sign,
    )
    from dynamodb_zero_etl_s3tables_spark.operators.stream_twins import (
        h22_streaming_dedup_ingest,
    )
    from dynamodb_zero_etl_s3tables_spark.sources.testdata import load

    out = {r.doc_id: (r.wave, r.admitted)
           for r in h22_streaming_dedup_ingest(spark, SF_DIR).collect()}
    docs = load(spark, SF_DIR, "documents").select("doc_id", "text")
    bands = _long_bands(minhash_sign(docs)).collect()
    buckets: dict = {}
    for r in bands:
        buckets.setdefault((r.band_id, r.bucket), []).append(r.doc_id)

    admitted = {d for d, (_w, a) in out.items() if a}
    # no two ADMITTED docs may share any bucket: within a wave the
    # greedy rule rejects the larger id; across waves the standing
    # probe rejects the later arrival
    for members in buckets.values():
        adm = sorted(d for d in members if d in admitted)
        assert len(adm) <= 1, f"admitted docs {adm} share a bucket"

    for d, (w, a) in out.items():
        if a:
            continue
        reasons = []
        for members in buckets.values():
            if d not in members:
                continue
            for other in members:
                if other == d:
                    continue
                ow, oa = out[other]
                if ow < w and oa:
                    reasons.append(("standing", other))
                if ow == w and other < d:
                    reasons.append(("batch", other))
        assert reasons, f"doc {d} was rejected with no colliding justification"


# -- e82: allocation invariants ----------------------------------------------

def test_e82_budget_invariants(spark):
    from dynamodb_zero_etl_s3tables_spark.operators import QUERY_REGISTRY
    from dynamodb_zero_etl_s3tables_spark.operators.llm_text import (
        E82_BUDGET_X,
        E82_EPOCH_CAP_DEN,
        E82_EPOCH_CAP_NUM,
    )

    rows = QUERY_REGISTRY["e82_token_budget_epochs"].build(spark, SF_DIR).collect()
    total = sum(r.n_tokens for r in rows)
    budget = E82_BUDGET_X * total
    for r in rows:
        cap = (E82_EPOCH_CAP_NUM * r.n_tokens) // E82_EPOCH_CAP_DEN
        assert r.alloc_tokens <= cap, r
        assert r.at_repeat_cap == (r.alloc_tokens == cap), r
        assert r.alloc_tokens >= 0
    assert sum(r.alloc_tokens for r in rows) <= budget
    # the corpus is data-constrained by construction: someone must cap
    assert any(r.at_repeat_cap for r in rows)
    # and the redistribution must push every uncapped language past
    # its uniform share (they absorb the capped languages' leftover)
    share = budget // len(rows)
    for r in rows:
        if not r.at_repeat_cap:
            assert r.alloc_tokens >= share, r


# -- d101/h23: KMV sketch laws ------------------------------------------------

def test_kmv_estimates_bounded_and_exact_when_small(spark):
    """At sf0.001 every status group has < K distinct customers, so
    the KMV estimate must be EXACT (the sketch is exhaustive), and
    est_inter must then equal exact_inter exactly as well."""
    import duckdb

    from dynamodb_zero_etl_s3tables_spark.operators import QUERY_REGISTRY

    rows = QUERY_REGISTRY["d101_kmv_set_intersection"].build(spark, SF_DIR).collect()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM '{SF_DIR}/orders.parquet'"
    )
    truth = dict(
        con.execute(
            "SELECT o_orderstatus, COUNT(DISTINCT o_custkey) "
            "FROM orders GROUP BY 1"
        ).fetchall()
    )
    if all(v < 128 for v in truth.values()):
        for r in rows:
            assert r.est_a == truth[r.grp_a]
            assert r.est_b == truth[r.grp_b]
            assert r.est_inter == r.exact_inter


def test_kmv_streaming_merge_equals_batch(spark):
    """Merge-invariance, asserted directly: h23's streamed standing
    sketch estimates == d101's per-group batch estimates."""
    from dynamodb_zero_etl_s3tables_spark.operators import QUERY_REGISTRY

    streamed = {
        r.grp: (r.sketch_size, r.est_distinct)
        for r in QUERY_REGISTRY["h23_streaming_kmv_sketch"].build(spark, SF_DIR).collect()
    }
    batch = QUERY_REGISTRY["d101_kmv_set_intersection"].build(spark, SF_DIR).collect()
    for r in batch:
        assert streamed[r.grp_a][1] == r.est_a
        assert streamed[r.grp_b][1] == r.est_b
