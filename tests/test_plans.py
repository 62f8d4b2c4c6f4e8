"""Physical-plan shape tests (SURVEY.md §4.2, E7): the scale posture
is part of the contract, not an accident. Each assertion pins a plan
property that would silently regress otherwise — filter pushdown into
the parquet scan, column pruning, broadcast of dimension tables,
distributed top-k, hash (not sort) aggregation, and the absence of
cartesian products in pair-generating operators."""

import pytest

from dynamodb_zero_etl_s3tables_spark.operators import QUERY_REGISTRY

SF_DIR = "/root/testdata/sf0.001"


def plan_of(spark, name: str) -> str:
    df = QUERY_REGISTRY[name].build(spark, SF_DIR)
    return df._jdf.queryExecution().executedPlan().toString()


def test_d01_scan_pushdown_and_pruning(spark):
    plan = plan_of(spark, "d01_parquet_scan")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThan(l_shipdate" in plan
    # projection reaches the reader: only the 4 referenced columns
    assert "ReadSchema: struct<l_orderkey:bigint,l_partkey:bigint" in plan
    assert "l_comment" not in plan


def test_d21_star_join_broadcasts_dims(spark):
    plan = plan_of(spark, "d21_star_join_flagship")
    assert plan.count("BroadcastHashJoin") >= 2  # nation, region
    assert "CartesianProduct" not in plan
    # the shipdate range filter is pushed into the lineitem scan
    assert "PushedFilters: [IsNotNull(l_shipdate)" in plan


def test_d16_broadcast_star(spark):
    plan = plan_of(spark, "d16_join_broadcast_star")
    assert plan.count("BroadcastHashJoin") >= 2
    assert "CartesianProduct" not in plan


def test_d22_agg_is_hash_not_sort(spark):
    plan = plan_of(spark, "d22_grouped_agg_q1")
    assert "HashAggregate" in plan
    assert "SortAggregate" not in plan


def test_e02_signature_stage_is_shuffle_free(spark):
    # r7: signatures come from ONE Arrow-batched kernel per row —
    # no explode, no groupBy, no Exchange anywhere in the stage
    # (the pre-r7 expression form shuffled every shingle row into a
    # 64-aggregate groupBy; SortAggregate stays forbidden regardless)
    plan = plan_of(spark, "e02_minhash_signatures")
    assert "ArrowEvalPython" in plan
    assert "Exchange" not in plan
    assert "SortAggregate" not in plan


def test_e02b_lsh_has_no_join_at_all(spark):
    # bucket-group + in-bucket expansion: no self-join, no cartesian
    plan = plan_of(spark, "e02b_minhash_lsh_pairs")
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" not in plan


def test_e03_topk_is_distributed(spark):
    plan = plan_of(spark, "e03_cosine_topk")
    assert "TakeOrderedAndProject" in plan


def test_d37_topk_is_take_ordered(spark):
    plan = plan_of(spark, "d37_top_k")
    assert "TakeOrderedAndProject" in plan


def test_e04_pairs_ride_equi_join(spark):
    plan = plan_of(spark, "e04_similarity_join")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_d19_range_join_is_hash_on_equi_key(spark):
    plan = plan_of(spark, "d19_range_join")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


@pytest.mark.parametrize(
    "name",
    ["b05_cdc_upsert_merge", "d20_asof_join", "e05_tfidf", "e02e_embedding_neardup"],
)
def test_no_cartesian_anywhere(spark, name):
    assert "CartesianProduct" not in plan_of(spark, name)


def test_registry_wide_plan_sweep(spark):
    """No operator may plan a CartesianProduct or SortAggregate, and
    global windows / nested-loop joins are allowed only where the
    input is provably bounded (single-row broadcasts, post-limit
    ranking). New operators failing this need an explicit entry here
    WITH a bounded-input justification."""
    # BroadcastNestedLoopJoin with a 1-row build side (scalar
    # broadcast) or a bounded cross join — correct plans:
    bnl_ok = {
        "d18_cross_join",      # 5 regions x order statuses, by design
        "h02_watermark_twin",  # 1-row max-ts horizon broadcast
        "e03_cosine_topk",     # 1-row query-vector broadcast
        "e03b_ann_ivf",        # 1-row query-vector broadcast
        "e05_tfidf",           # 1-row corpus-size broadcast
        "e18_bm25_retrieval",  # 1-row corpus-stats broadcast
        "e14_unigram_surprisal",  # 1-row corpus-token-total broadcast
        "e27_dsir_importance",    # 1-row target/raw-total broadcast
        "e15_mixture_rebalance",  # 1-row min-source-count broadcast
        "e03e_lsh_recall",     # exact side of the recall harness IS a
        #                        deliberate brute-force pair join —
        #                        fixture-scale validation by design
        "d72_tpch_q22_idle_customers",  # 1-row avg-acctbal scalar broadcast
        "e21_kmeans_refine",   # k=8 centroid broadcast per Lloyd step
        "e22_vocab_coverage",  # 1-row corpus-token-total broadcast
        "e25_semdedup",        # same k=8 centroid broadcasts (composes e21)
        "e34_pca_power_iteration",  # 1-row norm scalar broadcast per matvec round
        "e35_cluster_keywords",     # same k=8 centroid broadcasts (composes e21)
        "e37_pq_adc_topk",          # 1-row query-vector broadcast
        "e40_ivf_pq_topk",          # 1-row query-vector broadcast
        "e42_bigram_perplexity_filter",  # 1-row vocab-size broadcast
        "e43_hard_negatives",       # 10-row anchor-set broadcast
        "e45_dsir_resample",        # composes e27's 1-row totals broadcast
        "e44_ivf_pq_residual",      # 1-row query-vector broadcast
        "e49_cluster_balanced_sample",  # k=8 centroid broadcasts (composes e21)
        "e50_lsh_dedup_recall",     # three 1-row count-aggregate broadcasts
        "e51_filter_attrition",     # 1-row vocab-size broadcast (composes e42)
        "e52_incremental_ivfpq",    # nlist(=10)-row frozen-centroid broadcast
        #                             against the DELTA side only
        "e54_source_drift_psi",     # n_sources x n_buckets marginal grid:
        #                             broadcast cross of two tiny aggregates
        "e55_source_minhash_sketch",  # theta self-join over the n_sources-row
        #                               signature table (broadcast)
        "e53_kneser_ney_score",     # two 1-row broadcasts (vocab size,
        #                             bigram-type total)
        "e85_moore_lewis_selection",  # two 1-row broadcasts (general +
        #                               in-domain vocab sizes, e42 shape)
        "e60_incontext_packing",    # k=8 centroid broadcasts (composes e21)
        "e61_matryoshka_recall",    # 1-row query-vector broadcast
        "e62_hybrid_rrf",           # composes e18's 1-row corpus-stats
        #                             broadcast + e03's query-vector broadcast
        "e66_stratified_split",     # 1-row corpus-total + 1-row shortfall
        #                             broadcasts over the O(sources) frame
        "e70_filtered_ann",        # 1-row query-vector broadcast
        "e77_trained_langid",      # 5-row language-total broadcast (the
        #                            per-candidate score denominator)
        "e72_temperature_mixture",  # 1-row min-lang-count broadcast
        "d96_tpch_q2_min_cost_supplier",    # 1-row supplier-count broadcast
        #                             (derived-partsupp stride needs S)
        "d97_tpch_q11_important_stock",     # same 1-row count + the spec's
        #                             1-row grand-total scalar broadcast
        "d98_tpch_q16_supplier_part_counts",  # same 1-row count broadcast
        "d99_tpch_q20_excess_stock",          # same 1-row count broadcast
        "e59_doremi_mixture",       # composes e42's vocab broadcast + two
        #                             1-row broadcasts (reference CE, softmax
        #                             total) over the K-sources frame
        "e82_token_budget_epochs",  # 1-row total/k broadcast + 1-row
        #                             redistribution-aggregate broadcast over
        #                             the K-languages frame
        "d101_kmv_set_intersection",  # non-equi pair expansion over the
        #                             3-status estimate frame + the
        #                             grp IN (a,b) pool join against K-row
        #                             sketches — both sides group-count sized
    }
    # Window with no partition spec over a bounded (post-limit) input:
    global_window_ok = {
        "d36_global_sort",     # rank over top-50 survivors
        "e03_cosine_topk",     # rank over top-20 survivors
        "e03b_ann_ivf",        # rank over top-10 survivors
        "e03c_cosine_topk_vectorized",  # rank over top-20 survivors
        "e21_kmeans_refine",   # centroid-id stamping over the LIMIT-8 seed
        "e22_vocab_coverage",  # rank/cumulative over the top-100 survivors
        "e25_semdedup",        # same LIMIT-8 seed stamping (composes e21)
        "e35_cluster_keywords",  # same LIMIT-8 seed stamping (composes e21)
        "e37_pq_adc_topk",       # LIMIT-16 codebook stamping + top-20 rank
        "e40_ivf_pq_topk",       # LIMIT-16 seed stamping + top-10 rank
        "e45_dsir_resample",     # rank over the top-100 survivors
        "e44_ivf_pq_residual",   # LIMIT-16 seed stamping + top-10 rank
        "e49_cluster_balanced_sample",  # LIMIT-8 seed stamping (composes e21)
        "e52_incremental_ivfpq",        # LIMIT-16 seed stamping (composes e40)
        "e60_incontext_packing",        # LIMIT-8 seed stamping (composes e21)
        "e62_hybrid_rrf",               # rank windows over the two <=20-row
        #                                 post-limit arms (composes e03/e18)
        "e66_stratified_split",         # remainder-rank window over the
        #                                 O(sources) strata frame
        "d92_compaction_plan",          # cumsum over the O(partitions)
        #                                 manifest-metadata frame (24 rows)
        "e70_filtered_ann",             # rank over the two top-10
        #                                 post-limit arms (composes e03)
    }
    # builders that run jobs/streams at build time; plan shape of
    # their final read is covered by their oracle queries instead
    skip = {
        "h07_stream_merge_sink",
        "h17_gated_cdc_sink",
        "h19_drift_gated_ingest",
        "h20_table_changelog_stream",
    }

    import re

    problems = []
    for name, spec in QUERY_REGISTRY.items():
        if name in skip:
            continue
        plan = spec.build(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
        if "CartesianProduct" in plan:
            problems.append(f"{name}: CartesianProduct")
        if "SortAggregate" in plan:
            problems.append(f"{name}: SortAggregate")
        if "BroadcastNestedLoopJoin" in plan and name not in bnl_ok:
            problems.append(f"{name}: unexpected BroadcastNestedLoopJoin")
        # A Window node prints `Window [exprs], [partSpec], [orderSpec]`,
        # omitting empty specs. Two bracket groups whose SECOND contains
        # sort directions is order-only => no partition spec (the
        # single-partition funnel); two groups without ASC/DESC is a
        # partition spec with no ordering — fine.
        unpartitioned = any(
            len(groups := re.findall(r"\[[^\]]*\]", line)) == 2
            and re.search(r"\b(ASC|DESC)\b", groups[1])
            for line in plan.splitlines()
            if re.search(r"(^|[-: ])Window \[", line)
        )
        if unpartitioned and name not in global_window_ok:
            problems.append(f"{name}: unpartitioned Window over unbounded input")
    assert not problems, problems


def test_d86_bucketed_join_has_no_shuffle_before_join(spark):
    """Bucketed co-located join: both sides scan pre-bucketed files,
    so the orderkey join itself needs NO Exchange — the only shuffles
    left are the final group-by's and the orderBy's range partitioner,
    both ABOVE the join. At fixture scale Catalyst rightly prefers a
    broadcast join (orders is tiny), so broadcast is disabled HERE to
    surface the 100 TB plan: both-sides-huge, where the bucketed
    layout is what saves the shuffle."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = plan_of(spark, "d86_bucketed_join")
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    join_pos = plan.find("SortMergeJoin")
    assert join_pos != -1, plan[:2000]
    assert "Bucketed: true" in plan
    assert "SelectedBucketsCount: 8 out of 8" in plan
    # no Exchange keyed on the join key — the bucketed layout feeds
    # the join directly; all remaining exchanges sit above the join
    assert "Exchange hashpartitioning(l_orderkey" not in plan
    assert "Exchange hashpartitioning(o_orderkey" not in plan
    exchanges = [i for i in range(len(plan)) if plan.startswith("Exchange", i)]
    assert exchanges and all(i < join_pos for i in exchanges), plan[:2000]


def test_d87_fact_scan_has_dynamic_pruning(spark):
    """Dynamic partition pruning: the month-partitioned fact scan must
    carry a runtime dynamicpruning PartitionFilter fed by the dim
    side — without it the scan reads every month directory and the
    operator's whole point is gone."""
    plan = plan_of(spark, "d87_dynamic_partition_pruning")
    assert "dynamicpruning" in plan.lower(), plan[:2000]
    assert "PartitionFilters" in plan


def test_e80_substring_dedup_shape(spark):
    # exact-substring dedup: shingle-DF groupBy stays hashable, the
    # dup-start probe is an equi hash join, never a cartesian/NL join
    plan = plan_of(spark, "e80_substring_dedup")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "HashAggregate" in plan


def test_e38_dedup_stage_shape(spark):
    # r8 (VERDICT r7 #6): exact-dedup keeper ids come from a
    # min(doc_id) HASH aggregate over (md5, doc_id) projections —
    # partial agg before the only exchange, full text never enters
    # it — and survivors return via LEFT SEMI join (broadcast at this
    # scale). min_by(struct)/first(text) would demote to the
    # forbidden SortAggregate.
    from dynamodb_zero_etl_s3tables_spark.operators.llm_text import (
        exact_dedup_survivors,
    )
    from dynamodb_zero_etl_s3tables_spark.sources.testdata import load

    d = load(spark, SF_DIR, "documents").select("doc_id", "text")
    plan = (
        exact_dedup_survivors(d)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "SortAggregate" not in plan
    assert "HashAggregate" in plan and "partial_min" in plan
    assert "LeftSemi" in plan
    # the keeper exchange partitions on the content hash and its
    # upstream partial aggregate outputs only (__h, min) — the text
    # column never rides this shuffle
    assert "Exchange hashpartitioning(__h" in plan
    partial_out = plan.split("partial_min")[1].splitlines()[0]
    assert "text" not in partial_out  # output=[__h#x, min#xL]


def test_e86_training_round_plan(spark):
    """e86's registered frame is driver-assembled (64 rows), so the
    scale evidence lives in the TRAINING-ROUND plans: one gradient
    round must be pure JVM — partial+final HashAggregate, the weight
    map as a literal (no join or broadcast for the model), and no
    Python eval node anywhere."""
    import pyspark.sql.functions as F

    from dynamodb_zero_etl_s3tables_spark.operators.llm_text import (
        LR_DIMS,
        _lr_feats,
    )

    feats, labels = _lr_feats(spark, "/root/testdata/sf0.001")
    wmap = F.create_map(
        *[c for j in range(LR_DIMS) for c in (F.lit(j), F.lit(0.0))]
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
    grad = (
        feats.join(p.join(labels, "doc_id"), "doc_id")
        .groupBy("dim")
        .agg(
            F.sum(((F.col("p") - F.col("y")) * F.col("x")).cast("decimal(25,12)"))
            .cast("double")
            .alias("gsum")
        )
    )
    plan = grad._jdf.queryExecution().executedPlan().toString()
    assert "HashAggregate" in plan and "partial" in plan.lower()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "SortAggregate" not in plan
    assert "CartesianProduct" not in plan
