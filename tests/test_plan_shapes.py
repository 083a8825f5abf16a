"""Physical-plan regression tests: pin the plan SHAPES the 100 TB design
depends on, so a refactor that silently degrades a join strategy or drops
a pushdown fails CI — not just the PLANS.md doc.

Checked properties (see PLANS.md for full plans):
- dimension joins broadcast; no accidental CartesianProduct anywhere;
- brute-force ANN bounds its sort with a window group-limit (the corpus
  is never globally sorted);
- filter + projection reach the parquet scan (PushedFilters/ReadSchema);
- both ntile variants: the partitioned one plans a hash Exchange, the
  global one is the declared single-partition anti-pattern.
"""

from __future__ import annotations

import pytest


def _plan(spark, name, sf_dir) -> str:
    from spark_streaming_dis_plugin_spark.plans.registry import all_queries

    df = all_queries()[name].fn(spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


def test_q5_broadcasts_dimensions_no_cartesian(spark, sf_dir):
    plan = _plan(spark, "q5_local_supplier_volume", sf_dir)
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_star_join_fact_never_moves(spark, sf_dir):
    plan = _plan(spark, "broadcast_star_join", sf_dir)
    assert plan.count("BroadcastHashJoin") >= 3
    assert "SortMergeJoin" not in plan


def test_bruteforce_topk_uses_window_group_limit(spark, sf_dir):
    plan = _plan(spark, "sim_bruteforce_topk", sf_dir)
    assert "WindowGroupLimit" in plan
    # the intended nested loop is the broadcast of the tiny query set
    assert "BroadcastNestedLoopJoin" in plan


def test_q6_filters_pushed_to_scan(spark, sf_dir):
    plan = _plan(spark, "q6_forecast_revenue", sf_dir)
    assert "PushedFilters: [" in plan
    assert "IsNotNull" in plan or "GreaterThan" in plan


def test_q1_reads_only_needed_columns(spark, sf_dir):
    plan = _plan(spark, "q1_pricing_summary", sf_dir)
    scan = plan[plan.index("FileScan"):]
    # lineitem has 11 columns; Q1 needs 7 — l_orderkey must be pruned
    assert "l_orderkey" not in scan.split("PushedFilters")[0]


def test_ntile_partitioned_vs_global_exchange(spark, sf_dir):
    part = _plan(spark, "window_ntile_lead_partitioned", sf_dir)
    assert "hashpartitioning(c_nationkey" in part
    glob = _plan(spark, "window_ntile_lead", sf_dir)
    assert "SinglePartition" in glob  # the declared coverage-only toy


def test_no_cartesian_in_any_benched_query(spark, sf_dir):
    from spark_streaming_dis_plugin_spark.plans.registry import all_queries

    for name, spec in all_queries().items():
        if not spec.bench:
            continue
        plan = _plan(spark, name, sf_dir)
        assert "CartesianProduct" not in plan, name


def test_q7_q8_broadcast_all_dimensions(spark, sf_dir):
    for name, min_bcast in (("q7_volume_shipping", 3),
                            ("q8_market_share", 4)):
        plan = _plan(spark, name, sf_dir)
        assert plan.count("BroadcastHashJoin") >= min_bcast, name
        assert "CartesianProduct" not in plan, name


def test_q21_semi_and_anti_joins(spark, sf_dir):
    plan = _plan(spark, "q21_late_sole_supplier", sf_dir)
    assert "LeftSemi" in plan
    assert "LeftAnti" in plan


def test_simhash64_band_join_not_cartesian(spark, sf_dir):
    """The 64-bit SimHash candidate join must be a hash/broadcast join on
    (band, band-value) keys — never all-pairs."""
    plan = _plan(spark, "dedup_simhash64_pairs", sf_dir)
    assert "CartesianProduct" not in plan
    assert "Join" in plan
    assert "InMemoryTableScan" in plan  # persisted signature relation


def test_embedding_lsh_band_join_not_cartesian(spark, sf_dir):
    """Random-hyperplane LSH: candidates come from the (band, bucket)
    equi-join over the persisted signature relation."""
    plan = _plan(spark, "dedup_embedding_lsh", sf_dir)
    assert "CartesianProduct" not in plan
    assert "InMemoryTableScan" in plan


def test_ivf_search_reads_prebuilt_index(spark, sf_dir):
    """IVF search (build split out): the plan scans the MATERIALIZED
    parquet index (inverted file + centroids) and carries NO Lloyd work —
    the decimal-exact centroid sums belong to sim_ivf_build only. Probes
    come from broadcasting the tiny centroid/query sides."""
    plan = _plan(spark, "sim_ivf_topk", sf_dir)
    assert "FileScan parquet" in plan           # stored index, not a plan
    assert "decimal(27,8)" not in plan          # no Lloyd step at search
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    build = _plan(spark, "sim_ivf_build", sf_dir)
    assert "decimal(27,8)" in build             # the build does train


def test_jaccard_capped_df_filter_before_self_join(spark, sf_dir):
    """df-capped Jaccard: the heavy-shingle drop is a BROADCAST LeftAnti
    join feeding the posting self-join (the drop-set is small by
    construction; the corpus postings never shuffle for the cap)."""
    plan = _plan(spark, "dedup_ngram_jaccard_capped", sf_dir)
    assert "LeftAnti" in plan
    assert "BuildRight" in plan or "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan


def test_chunk_dedup_shuffles_hash_only(spark, sf_dir):
    """Chunk-level dedup: every hash-shuffle key is either the 16-byte
    chunk_hash (window group-limit) or doc_id (the containment agg) —
    chunk text NEVER appears in an Exchange key. The negative assertion
    is the point: a regression that shuffled chunk/text columns would
    still contain the chunk_hash partitioning and must not pass."""
    import re

    plan = _plan(spark, "chunk_dedup_containment", sf_dir)
    keyed = re.findall(r"hashpartitioning\(([^)]*)\)", plan)
    keys = {
        frag.strip().split("#")[0]
        for group in keyed
        for frag in group.split(",")
        if "#" in frag
    }
    assert "chunk_hash" in keys
    assert keys <= {"chunk_hash", "doc_id"}, f"unexpected shuffle keys: {keys}"


def test_decontaminate_broadcasts_eval_postings(spark, sf_dir):
    """Decontamination: the eval-set posting list is the broadcast side —
    the corpus postings must never shuffle for the join (benchmarks are
    megabytes; the corpus is the 100 TB side)."""
    plan = _plan(spark, "decontaminate_eval_overlap", sf_dir)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_chunk_documents_no_shuffle_beyond_repartition(spark, sf_dir):
    """Chunking is row-local: tokenize -> sequence -> posexplode -> slice
    plans exactly one Exchange (the explicit round-robin input spread),
    no hash/range partitioning anywhere."""
    plan = _plan(spark, "chunk_documents", sf_dir)
    assert plan.count("Exchange") == 1
    assert "RoundRobinPartitioning" in plan
    assert "hashpartitioning" not in plan


def test_q2_dims_broadcast_window_min(spark, sf_dir):
    """Q2's correlated min-per-group: every dimension side broadcasts
    (part/supplier/nation/region), the pair aggregation is the only
    lineitem shuffle, and the correlated subquery is planned as a MIN
    window over the candidate set — no re-scan self-join, no SMJ."""
    plan = _plan(spark, "q2_min_cost_supplier", sf_dir)
    assert plan.count("BroadcastHashJoin") >= 4
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "Window" in plan


def test_q20_semi_joins_broadcast(spark, sf_dir):
    """Q20's nested membership chain plans as broadcast semi-joins (the
    part-name filter and the qualified-supplier set are both
    dimension-sized); the two lineitem aggregations shuffle on the pair
    key only."""
    plan = _plan(spark, "q20_potential_promotion", sf_dir)
    assert "LeftSemi" in plan
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan


def test_ivf_recall_reads_stored_index_no_lloyd(spark, sf_dir):
    """The recall contract runs both IVF searches over the prebuilt
    parquet index — the accuracy-monitoring query must not retrain
    (no decimal-exact Lloyd sums in-plan), and the ground-truth
    brute-force side bounds its sort with a window group-limit."""
    plan = _plan(spark, "sim_ivf_recall", sf_dir)
    assert "FileScan parquet" in plan
    assert "decimal(27,8)" not in plan
    assert "WindowGroupLimit" in plan


def test_pq_encode_single_shuffle(spark, sf_dir):
    """PQ encode: the codebook cross-join is a broadcast (K=4 rows), all
    M per-subspace argmins fold in ONE hash aggregation — exactly one
    vec_id shuffle, no window, no self-join."""
    plan = _plan(spark, "sim_pq_encode", sf_dir)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert plan.count("hashpartitioning(vec_id") <= 1
    assert "SortMergeJoin" not in plan
    assert "Window" not in plan


def test_bloom_bits_broadcast_probe_never_shuffles_text(spark, sf_dir):
    """The Bloom probe side must receive the bit set via broadcast; the
    incoming batch's text may not be hash-shuffled (the whole point of
    filter-based membership dedup at scale)."""
    plan = _plan(spark, "dedup_bloom_incremental", sf_dir)
    assert "BroadcastHashJoin" in plan
    for ex in plan.split("Exchange hashpartitioning")[1:]:
        keys = ex.split(")")[0]
        assert "text" not in keys, f"text in shuffle keys: {keys}"


def test_semantic_dedup_joins_on_cluster_id(spark, sf_dir):
    """SemDeDup's pairwise pass must be keyed on the cluster id (the
    corpus/C blocking), not a cartesian over the corpus."""
    plan = _plan(spark, "dedup_semantic", sf_dir)
    assert "CartesianProduct" not in plan
    # the only nested-loop join allowed is the broadcast centroid rank
    assert "cid" in plan


def test_ivfpq_no_raw_vectors_after_encode(spark, sf_dir):
    """IVF-PQ search: LUTs and probes broadcast; the candidate relation
    carries PQ codes (c0..c3), never a raw embedding shuffle."""
    plan = _plan(spark, "sim_ivfpq_topk", sf_dir)
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastExchange") >= 5  # cent + probes + 4 LUTs
    for ex in plan.split("Exchange hashpartitioning")[1:]:
        keys = ex.split(")")[0]
        assert "embedding" not in keys, f"embedding shuffled: {keys}"


def test_boilerplate_dropset_broadcast(spark, sf_dir):
    """The boilerplate drop-set (high-df segments) joins back broadcast;
    the df count is the only segment-keyed shuffle."""
    plan = _plan(spark, "text_boilerplate_strip", sf_dir)
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_recursive_spine_join_is_broadcastable(spark, sf_dir):
    """The 36-row recursive spine must not force the monthly aggregate
    through a sort-merge join."""
    plan = _plan(spark, "recursive_month_spine", sf_dir)
    assert "SortMergeJoin" not in plan


def test_pagerank_iterations_are_keyed_joins(spark, sf_dir):
    """PageRank must plan as Pregel-style keyed joins/aggregations —
    no cartesian anywhere, and the only broadcast-nested-loop allowed
    is the single-row node-count cross join."""
    plan = _plan(spark, "graph_pagerank_copurchase", sf_dir)
    assert "CartesianProduct" not in plan
    assert "hashpartitioning(src" in plan or "hashpartitioning(dst" in plan


def test_fuzzy_names_join_is_blocked(spark, sf_dir):
    """The fuzzy match must join on the blocking key, never cross-join
    the entity table against itself."""
    plan = _plan(spark, "dedup_fuzzy_names", sf_dir)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_prefix_filter_posting_join_on_token(spark, sf_dir):
    """Prefix-filtered similarity join: candidates come from a posting
    join keyed on the (prefix) token, not any all-pairs construct."""
    plan = _plan(spark, "dedup_jaccard_prefix_filter", sf_dir)
    assert "CartesianProduct" not in plan
    assert "hashpartitioning(s#" in plan or "hashpartitioning(s " in plan
