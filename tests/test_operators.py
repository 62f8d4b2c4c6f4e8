"""Operator structure + plan-shape tests (SURVEY.md §5.2(2) golden
schemas; §4.2 verify-don't-reimplement: pushdown/broadcast asserted
from the physical plan)."""

import pytest

from dynamodb_zero_etl_s3tables_spark.operators import QUERY_REGISTRY
from dynamodb_zero_etl_s3tables_spark.operators.relational import (
    d01_parquet_scan,
    d16_join_broadcast_star,
    d21_star_join_flagship,
)

SF_DIR = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_registry_complete():
    # every registered query has a builder; oracle coverage is wide
    assert len(QUERY_REGISTRY) >= 80
    with_oracle = [s for s in QUERY_REGISTRY.values() if s.oracle is not None]
    assert len(with_oracle) >= 75


def test_doc_counts_match_registry():
    # COVERAGE.md / README.md pin exact registry counts; this keeps
    # the prose honest as operators are added (VERDICT r2 #9).
    n = len(QUERY_REGISTRY)
    n_oracle = sum(1 for s in QUERY_REGISTRY.values() if s.oracle is not None)
    rows_only = [k for k, s in QUERY_REGISTRY.items() if s.oracle is None]
    from pathlib import Path

    root = Path(__file__).resolve().parent.parent
    cov = (root / "COVERAGE.md").read_text()
    assert f"{n} registered queries" in cov
    assert f"{n_oracle} with DuckDB oracles" in cov
    assert f"{n - n_oracle} rows-only" in cov
    assert all(name in cov for name in rows_only), rows_only
    readme = (root / "README.md").read_text()
    assert f"{n} named query builders" in readme
    assert f"{n_oracle} hash-matched, {n - n_oracle} rows-only" in readme


def test_grade_priority_prefix():
    # Round-11 rotation: the driver grades a 50-query prefix of the
    # registry. The r11 prefix leads with the 7 never-driver-graded
    # entries (d48c is the new r11 CPU scaling probe; e84/c31/e85/e87/
    # e88/e86 are r10 session-2 additions the r10 window missed), then
    # 6 re-signs for the code changed this session (h26/h28/h24 staged
    # JVM changelog drains, e64 checkpoint revert, c23/c30 keyed-DML
    # trust gate), then the standing never-recently-graded queue. The
    # r10-graded names not re-signed rotate to the tail.
    from dynamodb_zero_etl_s3tables_spark.operators import _GRADE_PRIORITY

    names = list(QUERY_REGISTRY)
    assert names == _GRADE_PRIORITY
    window = _GRADE_PRIORITY[:50]
    # exact head: additions first, changed-code re-signs second
    assert _GRADE_PRIORITY[:13] == [
        "d48c_cpu_scaling_probe",
        "e84_simhash_hamming_join",
        "c31_metadata_only_agg_journey",
        "e85_moore_lewis_selection",
        "e87_semantic_split_decontamination",
        "e88_classifier_calibration",
        "e86_logreg_quality_training",
        "h26_cow_changelog_stream",
        "h28_nested_changelog_stream",
        "h24_streaming_index_maintenance",
        "e64_knn_pagerank",
        "c23_sql_dml_journey",
        "c30_dml_subquery_journey",
    ]
    # the standing queue follows (h20/h25 share the changelog
    # emission semantics the staged path must match)
    assert _GRADE_PRIORITY[13:15] == [
        "h20_table_changelog_stream",
        "h25_partitioned_changelog_drain",
    ]
    # freshly-graded queries stay rotated out of the window
    assert "d34_range_frame" not in window         # r10-graded
    assert "d94_python_datasource" not in window   # r10-graded
    assert "h27_out_of_order_cdc" not in window    # r10-graded, unchanged
    assert "d01_parquet_scan" not in window        # r7-graded
    # no duplicates, every priority name registered
    assert len(set(_GRADE_PRIORITY)) == len(_GRADE_PRIORITY)


def test_scan_pushdown(spark):
    # D1 + §4.2: filter and projection must reach the parquet reader
    df = d01_parquet_scan(spark, SF_DIR)
    explained = df._jdf.queryExecution().toString()
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThan(l_shipdate" in explained
    assert "ReadSchema" in explained
    # projection pruned to 4 read columns (3 selected + filter col)
    assert "l_extendedprice" not in explained.split("ReadSchema")[1].splitlines()[0]


def test_star_join_broadcasts_dims(spark):
    # D16/D21: nation/region must broadcast, never shuffle the fact side for dims
    for q in (d16_join_broadcast_star, d21_star_join_flagship):
        plan = _plan(q(spark, SF_DIR))
        assert "BroadcastHashJoin" in plan


def test_flagship_schema(spark):
    df = d21_star_join_flagship(spark, SF_DIR)
    assert [f.name for f in df.schema.fields] == [
        "region", "nation", "n_lines", "revenue",
    ]
    types = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    assert types["revenue"] == "double" and types["n_lines"] == "bigint"


def test_merge_is_shuffle_bounded(spark):
    # B5 plan shape: merge = window dedup + anti-join + union; no
    # cartesian/nested-loop anywhere
    plan = _plan(QUERY_REGISTRY["b05_cdc_upsert_merge"].build(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_no_python_udfs_in_core_paths(spark):
    # E7 posture: row-at-a-time Python (BatchEvalPython) is forbidden
    # in EVERY hot path; relational/text/ANN cores also stay free of
    # Arrow UDFs. The ONE sanctioned Arrow kernel in this set is
    # e02b's shingle/signature stage (r7: exact-int numpy, which beat
    # the interpreted HOF expression form ~3x — see llm_dedup
    # _sigs_udf) — everything downstream of it is JVM.
    for name in (
        "d21_star_join_flagship",
        "e01_exact_dedup",
        "e02b_minhash_lsh_pairs",
        "e03_cosine_topk",
        "e05_tfidf",
    ):
        plan = _plan(QUERY_REGISTRY[name].build(spark, SF_DIR))
        assert "BatchEvalPython" not in plan, name
        if name != "e02b_minhash_lsh_pairs":
            assert "ArrowEvalPython" not in plan, name


def test_d74_bloom_prefilter_contract(spark):
    # no false negatives (every true match passes the bloom) and the
    # filter actually prunes (candidates < fact rows at this fp rate)
    from pyspark.sql import functions as F

    from dynamodb_zero_etl_s3tables_spark.operators.relational import (
        bloom_bitmap,
        bloom_prefilter,
    )
    from dynamodb_zero_etl_s3tables_spark.sources.testdata import load

    keys = (
        load(spark, SF_DIR, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    bitmap = bloom_bitmap(keys, "c_custkey")
    o = load(spark, SF_DIR, "orders").select("o_custkey")
    n_total = o.count()
    cand = bloom_prefilter(o, "o_custkey", bitmap)
    n_cand = cand.count()
    n_true = o.join(keys, o.o_custkey == keys.c_custkey, "left_semi").count()
    assert n_true <= n_cand < n_total
    # every true match survives the prefilter (no false negatives)
    missed = (
        o.join(keys, o.o_custkey == keys.c_custkey, "left_semi")
        .exceptAll(cand)
        .count()
    )
    assert missed == 0


def test_e03e_full_corpus_guard(spark, monkeypatch):
    # VERDICT r2 #2: the recall harness's exact side is quadratic by
    # design; above the documented row bound it must refuse to run.
    from dynamodb_zero_etl_s3tables_spark.operators import llm_similarity

    monkeypatch.setattr(llm_similarity, "RECALL_HARNESS_MAX_ROWS", 3)
    with pytest.raises(RuntimeError, match="fixture-scale"):
        llm_similarity.e03e_lsh_recall(spark, SF_DIR)


def test_all_builders_resolve(spark):
    # every registry entry analyzes (schema resolution) without execution
    for name, spec in QUERY_REGISTRY.items():
        df = spec.build(spark, SF_DIR)
        assert df.schema is not None, name
        assert len(df.columns) > 0, name


def test_e47_rank_invariant_to_partition_count(spark):
    """VERDICT r4 #5: e47's distributed exact ranking must produce
    the identical head/middle/tail assignment at ANY range-partition
    count (the count now follows spark.sql.shuffle.partitions) —
    the rank depends only on the total order, not on where the
    sampled range boundaries fall."""
    from dynamodb_zero_etl_s3tables_spark.operators.llm_lm import (
        e47_ccnet_lm_partition,
    )

    key = "spark.sql.shuffle.partitions"
    orig = spark.conf.get(key)
    try:
        spark.conf.set(key, "3")
        a = sorted(map(tuple, e47_ccnet_lm_partition(spark, SF_DIR).collect()))
        spark.conf.set(key, "17")
        b = sorted(map(tuple, e47_ccnet_lm_partition(spark, SF_DIR).collect()))
    finally:
        spark.conf.set(key, orig)
    assert a == b
    assert len(a) > 0


def test_minhash_sketch_merges(spark):
    """e55's scale claim: MinHash signatures are MERGEABLE — the
    source-level signature equals the elementwise min of its
    documents' signatures (min distributes over union), so shard
    sketches combine without re-reading text."""
    from pyspark.sql import functions as F

    from dynamodb_zero_etl_s3tables_spark.operators.llm_dedup import (
        _AFFINE,
        M31,
        N_HASHES,
        _shingle_hashes,
    )
    from dynamodb_zero_etl_s3tables_spark.sources.testdata import load

    d = load(spark, SF_DIR, "documents").select("doc_id", "source", "text")
    mins = [
        F.min((F.lit(a) * F.col("h") + F.lit(b)) % F.lit(M31)).alias(f"sig_{i}")
        for i, (a, b) in enumerate(_AFFINE)
    ]
    direct = (
        _shingle_hashes(d, keys=("source",)).groupBy("source").agg(*mins)
    )
    per_doc = (
        _shingle_hashes(d, keys=("doc_id", "source"))
        .groupBy("doc_id", "source")
        .agg(*mins)
    )
    merged = per_doc.groupBy("source").agg(
        *[F.min(f"sig_{i}").alias(f"sig_{i}") for i in range(N_HASHES)]
    )
    key = lambda rows: {r["source"]: tuple(r[f"sig_{i}"] for i in range(N_HASHES)) for r in rows}
    assert key(direct.collect()) == key(merged.collect())


def test_quality_split_export_empty_gate(spark, tmp_path):
    """r8 review: when the quality gate keeps ZERO documents the
    partitioned write emits only _SUCCESS and schema inference on the
    read-back raised UNABLE_TO_INFER_SCHEMA — the export must return
    an empty stats frame instead (the oracle returns an empty result
    set for the same input)."""
    from dynamodb_zero_etl_s3tables_spark.operators.llm_text import (
        quality_split_export,
    )

    docs = spark.createDataFrame(
        [(1, "too short"), (2, "also tiny")], "doc_id long, text string"
    )
    out = quality_split_export(spark, docs, str(tmp_path), "empty_gate_r8")
    assert out.columns == ["split", "n_docs", "n_tokens", "n_chars"]
    assert out.count() == 0


def test_e86_logreg_actually_learns(spark):
    """The trained weights separate the classes: mean score (w·x) of
    positive-label docs exceeds the negative-label mean after 3 GD
    rounds (with w0 = 0 both means are exactly 0, so any positive
    separation is learned signal), and the weights are non-trivial."""
    import pyspark.sql.functions as F

    from dynamodb_zero_etl_s3tables_spark.operators.llm_text import (
        _lr_feats,
        e86_logreg_quality_training,
    )

    sf = "/root/testdata/sf0.001"
    wdf = e86_logreg_quality_training(spark, sf)
    weights = {r["dim"]: r["weight"] for r in wdf.collect()}
    assert len(weights) == 64 and any(abs(v) > 1e-4 for v in weights.values())
    feats, labels = _lr_feats(spark, sf)
    wmap = F.create_map(
        *[c for j, v in weights.items() for c in (F.lit(j), F.lit(v))]
    )
    z = feats.groupBy("doc_id").agg(
        F.sum(F.col("x") * F.element_at(wmap, F.col("dim"))).alias("z")
    )
    means = (
        z.join(labels, "doc_id")
        .groupBy("y")
        .agg(F.avg("z").alias("mz"))
        .collect()
    )
    mz = {r["y"]: r["mz"] for r in means}
    assert mz[1] > mz[0], f"no class separation: {mz}"
