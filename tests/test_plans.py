"""Physical-plan shape tests (M5 scale hardening).

Correctness says the operator works; these assert it runs with the
plan you'd want at 100 TB: small dims broadcast (no fact-side
shuffle), filters/projections pushed into the parquet scan, partial
(map-side) aggregation before the exchange, whole-stage codegen in
the hot path.
"""

import pytest

from glue_parquet_splitter_spark.plans import final_plan, physical_plan
from glue_parquet_splitter_spark.queries import load_all_modules

REG = load_all_modules()


def plan_of(spark, sf_dir, name: str) -> str:
    return physical_plan(REG[name].fn(spark, sf_dir))


def test_broadcast_join_in_flagship(spark, sf_dir):
    """q5: all dims must broadcast — the lineitem side is never
    shuffled for a dim join."""
    plan = plan_of(spark, sf_dir, "q5_region_revenue")
    assert "BroadcastHashJoin" in plan


def test_small_dim_broadcast(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "join_broadcast_multihop")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan  # nothing should sort-merge here


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "filter_project")
    assert "PushedFilters: [" in plan
    assert "IsNotNull(l_quantity)" in plan or "GreaterThanOrEqual(l_quantity" in plan


def test_column_pruning(spark, sf_dir):
    """A 4-column projection must not read all 11 lineitem columns."""
    plan = plan_of(spark, sf_dir, "filter_project")
    scan = plan[plan.index("ReadSchema"):][:400]
    assert "l_extendedprice" in scan
    assert "l_tax" not in scan and "l_comment" not in scan


def test_partial_aggregation(spark, sf_dir):
    """Group-by must partial-aggregate map-side before the exchange."""
    plan = plan_of(spark, sf_dir, "q1_pricing_summary")
    assert "partial_sum" in plan or "partial_avg" in plan


def test_whole_stage_codegen(spark, sf_dir):
    # AQE finalizes the plan (and codegen markers) on execution
    plan = final_plan(REG["q1_pricing_summary"].fn(spark, sf_dir))
    assert "WholeStageCodegen" in plan or "*(" in plan


def test_anti_join_strategy(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "join_anti")
    assert "LeftAnti" in plan


def test_range_join_not_cartesian(spark, sf_dir):
    """The equi-key must carry the range join — no CartesianProduct."""
    plan = plan_of(spark, sf_dir, "range_join_events")
    assert "CartesianProduct" not in plan


def test_topk_no_global_sort_of_input(spark, sf_dir):
    """LIMIT after ORDER BY must run as TakeOrderedAndProject, not a
    full global sort."""
    plan = plan_of(spark, sf_dir, "sort_limit")
    assert "TakeOrderedAndProject" in plan


def test_cosine_neardup_no_cartesian(spark, sf_dir):
    """LSH-bucket blocking must make the near-dup self-join an equi
    hash join — never an all-pairs cartesian."""
    plan = plan_of(spark, sf_dir, "cosine_neardup_pairs")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_levenshtein_no_cartesian(spark, sf_dir):
    """Length-band blocking must carry the edit-distance pair join as
    an equi join on the band."""
    plan = plan_of(spark, sf_dir, "levenshtein_pairs")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_asof_join_no_join_explosion(spark, sf_dir):
    """The as-of is a union + per-key running fill: no join node at
    all, hence no broadcast of a fact-derived side and no per-row
    BNLJ/cartesian."""
    plan = plan_of(spark, sf_dir, "asof_join")
    for node in ("CartesianProduct", "BroadcastNestedLoopJoin",
                 "BroadcastHashJoin", "SortMergeJoin"):
        assert node not in plan


def test_history_dedup_hash_join_on_hash_key(spark, sf_dir):
    """The history check must be an equi hash join on the md5 key —
    no cartesian, no nested loop (text never compared pairwise)."""
    plan = plan_of(spark, sf_dir, "dedup_against_history")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_quality_filter_partial_aggregation(spark, sf_dir):
    """The token count must partial-aggregate map-side; no cartesian
    anywhere in the signal join."""
    plan = plan_of(spark, sf_dir, "gopher_quality_filter")
    assert "partial_" in plan
    assert "CartesianProduct" not in plan


def test_bm25_broadcasts_stats_and_df(spark, sf_dir):
    """The 3-row term-df dim and the 1-row stats row must broadcast;
    the token stream is never sort-merge-joined against them."""
    plan = plan_of(spark, sf_dir, "bm25_doc_ranking")
    assert "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan


def test_unigram_vocab_broadcast(spark, sf_dir):
    """Vocabulary enrich join: freq table broadcast onto the token
    stream (the corpus side is never shuffled for the join)."""
    plan = plan_of(spark, sf_dir, "unigram_logprob_quality")
    assert "BroadcastHashJoin" in plan


def test_zorder_key_stays_in_scan_stage(spark, sf_dir):
    """zval must be computed in the scan projection with the 1-row
    bounds broadcast — no shuffle before the key exists, so a
    repartitionByRange(zval) write is the FIRST exchange."""
    plan = plan_of(spark, sf_dir, "zorder_interleave")
    assert "BroadcastExchange" in plan
    assert "Exchange hashpartitioning" not in plan


def test_merge_upsert_single_join(spark, sf_dir):
    """MERGE apply is exactly one join on the primary key — no extra
    shuffle, no cartesian, delete/update/insert all resolved in the
    join's projection."""
    plan = plan_of(spark, sf_dir, "merge_upsert_apply")
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    joins = plan.count("SortMergeJoin") + plan.count("ShuffledHashJoin") + plan.count(
        "BroadcastHashJoin")
    assert joins == 1, f"expected exactly 1 join, plan:\n{plan[:2000]}"


def test_scd2_single_shuffle(spark, sf_dir):
    """Both SCD2 window passes share the user_id partitioning: one
    exchange between them.  Since r14 the query reads through the
    unique_events identity contract (duplicate event_ids make the
    (ts, event_id) change-detection order non-total), which adds ONE
    event_id-keyed exchange ahead of the user_id one — two total;
    production reads identity-clean silver and keeps the single
    user_id exchange."""
    plan = plan_of(spark, sf_dir, "scd2_event_type_intervals")
    assert plan.count("Exchange hashpartitioning") == 2, plan[:2000]
    assert plan.count("Window [row_number()") == 1, plan[:2000]  # identity
    assert "Join" not in plan, plan[:2000]


def test_sessionize_single_shuffle(spark, sf_dir):
    """Window + groupBy share the user_id hash partitioning: one
    exchange, and the session aggregate partial-aggregates map-side."""
    plan = plan_of(spark, sf_dir, "sessionize_events")
    assert plan.count("Exchange hashpartitioning") == 1, plan[:2000]
    assert "partial_" in plan


def test_dq_profile_single_scan(spark, sf_dir):
    """The column profile is one pass: a single orders scan computes
    every per-column statistic (the UNION-ALL oracle shape would scan
    four times)."""
    plan = plan_of(spark, sf_dir, "dq_profile_summary")
    assert plan.count("Scan parquet") == 1, plan[:2000]


def test_hll_union_merges_sketches_not_rows(spark, sf_dir):
    """The month rollup must aggregate day sketches (hll_union_agg),
    never rescan raw rows for the estimate side."""
    plan = plan_of(spark, sf_dir, "hll_union_daily")
    assert "hll_union_agg" in plan and "hll_sketch_agg" in plan


def test_incremental_merge_two_level_partial(spark, sf_dir):
    """Both aggregation levels partial-aggregate before their exchange."""
    plan = plan_of(spark, sf_dir, "incremental_agg_merge")
    assert plan.count("partial_sum") >= 2


def test_reservoir_single_shuffle(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "reservoir_per_group")
    assert plan.count("Exchange hashpartitioning") == 1, plan[:1500]


def test_decontamination_broadcasts_bench_grams(spark, sf_dir):
    """The benchmark gram set must broadcast; the corpus gram stream is
    never sort-merge-shuffled on the digest."""
    plan = plan_of(spark, sf_dir, "decontamination_ngram_overlap")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_snapshot_diff_single_join(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "snapshot_diff_cdf")
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    joins = plan.count("SortMergeJoin") + plan.count("ShuffledHashJoin") + plan.count(
        "BroadcastHashJoin")
    assert joins == 1, plan[:2000]


def test_interleave_prefix_is_topk_not_global_sort(spark, sf_dir):
    """The 500-row prefix must come from TakeOrdered, not a full sort
    of the corpus."""
    plan = plan_of(spark, sf_dir, "train_mix_interleave")
    assert "TakeOrderedAndProject" in plan, plan[:2000]


def test_no_accidental_cartesian_in_any_registered_plan(spark, sf_dir):
    """Registry-wide sweep: no registered query may plan a
    CartesianProduct — the one scale-killer a green oracle row can't
    see (it's correct, just O(N²)).  ``join_cross`` is the deliberate
    cross-join demonstration; streaming and pipeline queries execute
    eagerly (side effects) and are asserted by their own tests."""
    allow = {"join_cross"}
    skipped_tags = {"streaming", "pipeline"}
    offenders = []
    for name, spec in REG.items():
        if name in allow or skipped_tags & set(spec.tags):
            continue
        try:
            plan = physical_plan(spec.fn(spark, sf_dir))
        except Exception as e:  # a plan that can't build is its own bug
            offenders.append(f"{name}: EXPLAIN failed: {e}")
            continue
        if "CartesianProduct" in plan:
            offenders.append(name)
    assert not offenders, offenders


# --- round-5/6 families (VERDICT r5 #8) -------------------------------------


def test_psi_partial_agg_bounded_exchanges(spark, sf_dir):
    """PSI drift: the bucket histogram partial-aggregates map-side and
    the whole plan is the (type, bucket) groupBy plus the tiny
    reduce-over-buckets window — two hash exchanges, no join at all."""
    plan = plan_of(spark, sf_dir, "psi_feature_drift")
    assert "partial_" in plan
    assert plan.count("Exchange hashpartitioning") <= 2, plan[:2000]
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan


def test_cohort_retention_broadcasts_firsts(spark, sf_dir):
    """The per-user first-seen dim must join back as the broadcast
    side — raw events are never shuffled for the cohort join."""
    plan = plan_of(spark, sf_dir, "cohort_retention_matrix")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_wau_day_spine_broadcasts(spark, sf_dir):
    """Rolling exact WAU: the day spine is calendar-bounded, so its
    join onto the replicated (day, user) rows must broadcast."""
    plan = plan_of(spark, sf_dir, "rolling_7day_active_users")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_wau_hll_merges_sketches(spark, sf_dir):
    """Sketch WAU: window estimates come from hll_union_agg over day
    sketches (kB rows), with every join broadcast — nothing sort-merges
    raw ids for the estimate side."""
    plan = plan_of(spark, sf_dir, "wau_hll_rolling")
    assert "hll_union_agg" in plan and "hll_sketch_agg" in plan
    assert "SortMergeJoin" not in plan


def test_geo_ring_equi_join_no_shuffle(spark, sf_dir):
    """3x3-ring proximity join: the cell-key equi join must broadcast
    (zero hash exchanges at fixture scale) and never fall back to an
    all-pairs nested loop."""
    plan = plan_of(spark, sf_dir, "geo_grid_neighbor_pairs_ring")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_asof_forward_no_join_explosion(spark, sf_dir):
    """Forward as-of with tolerance keeps the union+window form of
    ``asof_join``: no join node of any kind, bounded exchanges."""
    plan = plan_of(spark, sf_dir, "asof_join_forward_tolerance")
    for node in ("CartesianProduct", "BroadcastNestedLoopJoin",
                 "BroadcastHashJoin", "SortMergeJoin"):
        assert node not in plan
    assert plan.count("Exchange hashpartitioning") <= 2, plan[:2000]


def test_salted_topk_two_level_no_join(spark, sf_dir):
    """Salted top-k: exactly the two window exchanges —
    (group, salt) then (group) over the k-bounded survivors — and no
    join or cartesian anywhere."""
    plan = plan_of(spark, sf_dir, "topk_per_group_salted")
    assert plan.count("Exchange hashpartitioning") == 2, plan[:2000]
    for node in ("CartesianProduct", "BroadcastNestedLoopJoin",
                 "BroadcastHashJoin", "SortMergeJoin"):
        assert node not in plan


def test_shard_assignment_single_exchange(spark, sf_dir):
    """Hash sharding is a scan projection + one partial-aggregated
    groupBy over 16 cells — nothing else."""
    plan = plan_of(spark, sf_dir, "train_shard_assignment")
    assert "partial_" in plan
    assert plan.count("Exchange hashpartitioning") == 1, plan[:1500]


def test_curriculum_topk_not_global_sort(spark, sf_dir):
    """The curriculum page must come from TakeOrdered with the 1-row
    quartile bounds broadcast — no global sort, no hash exchange of
    the corpus before the prefix."""
    plan = plan_of(spark, sf_dir, "curriculum_stage_order")
    assert "TakeOrderedAndProject" in plan
    assert plan.count("Exchange hashpartitioning") == 0, plan[:1500]


def test_repeat_upsample_broadcasts_weights(spark, sf_dir):
    """Per-source weights join back as the broadcast side; the corpus
    is never sort-merged for the weight join and the repeat explode is
    a generator, not a join."""
    plan = plan_of(spark, sf_dir, "doc_repeat_upsample")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "Generate explode" in plan


def test_adaptive_geo_ring_equi_join(spark, sf_dir):
    """The adaptive ring keeps the equi hash join on the cell key —
    variable ring width must not degrade to a nested-loop/cartesian."""
    plan = plan_of(spark, sf_dir, "geo_grid_neighbor_pairs_adaptive")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_curation_pipeline_single_corpus_shuffle(spark, sf_dir):
    """End-to-end curation: the md5(text) dedup window is the ONLY
    full-corpus exchange; bench grams, contaminated ids, and the
    16-cell shard groupBy are the other three (all tiny), every join
    broadcasts, and nothing sort-merges or goes cartesian."""
    plan = plan_of(spark, sf_dir, "curation_pipeline_end_to_end")
    assert plan.count("Exchange hashpartitioning") == 4, plan[:2500]
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan


def test_stable_row_index_no_global_sort(spark, sf_dir):
    """The whole point of global_row_index: a range exchange feeding
    per-partition sorts — never a single-partition global Sort and no
    window over one partition."""
    plan = plan_of(spark, sf_dir, "stable_row_index")
    assert "hashpartitioning(_pid" in plan, plan[:1500]
    assert "Exchange SinglePartition" not in plan, plan[:1500]
    assert "Window" not in plan  # offsets come from mapInPandas, not a window
    # exactly ONE exchange end to end (VERDICT r6 #7): the _pid
    # repartition; bucket boundaries ride broadcast metadata
    assert plan.count("Exchange") == 1, plan[:1500]


def test_ks_drift_single_fulldata_exchange(spark, sf_dir):
    """KS: the only full-data exchange is the (type, value) groupBy;
    the ordered cumulative window runs on the reduced support."""
    plan = plan_of(spark, sf_dir, "ks_drift_test")
    assert "partial_sum" in plan  # map-side combine before the exchange
    assert "CartesianProduct" not in plan


def test_mad_outliers_broadcasts_medians(spark, sf_dir):
    """The 5-row median/MAD relations must broadcast back — raw events
    never shuffle for those joins."""
    plan = plan_of(spark, sf_dir, "mad_robust_outliers")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_triangle_orientation_hash_joins(spark, sf_dir):
    """Degree-ordered triangle counting: wedge and closing joins stay
    equi hash joins on node keys — no cartesian, no nested loop."""
    plan = plan_of(spark, sf_dir, "triangle_count_degree_ordered")
    assert "CartesianProduct" not in plan
    # the only nested-loop joins are the 1-row summary combines
    import re
    data_bnlj = [ln for ln in plan.splitlines()
                 if "BroadcastNestedLoopJoin" in ln
                 and not re.search(r"Cross\s*$", ln.strip())]
    assert not data_bnlj, data_bnlj
    # the wedge/closing joins are equi joins on node keys
    assert re.search(r"Join \[(s|t)#", plan) or "SortMergeJoin [s#" in plan


def test_attribution_single_user_shuffle(spark, sf_dir):
    """Last-touch attribution: one hash exchange on user_id for the
    ordered window, then the tiny channel aggregate."""
    plan = plan_of(spark, sf_dir, "attribution_last_touch")
    assert plan.count("Exchange hashpartitioning") == 2, plan[:1500]


def test_jaccard_prefix_filter_no_cartesian(spark, sf_dir):
    """Prefix filtering must stay an equi join on the shingle key —
    candidates from shared prefix tokens, never an all-pairs form."""
    plan = plan_of(spark, sf_dir, "jaccard_prefix_filter_pairs")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the candidate join is EQUI-keyed on the shingle itself (VERDICT
    # r6 #7): prefix tokens meet by hash, never by pairwise comparison
    import re
    assert re.search(r"HashJoin \[shingle#\d+\], \[shingle#\d+\]", plan), \
        plan[:2000]


def test_mips_corpus_single_scan_broadcasts(spark, sf_dir):
    """MIPS pruning: queries/seeds/bounds broadcast; the corpus is
    scanned (broadcast-NLJ against 5 query rows is the intended shape)
    but never shuffled on a join key."""
    plan = plan_of(spark, sf_dir, "mips_norm_bound_topk")
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan


def test_kmeans_loop_broadcasts_centroids(spark, sf_dir):
    """Both Lloyd iterations keep the k-centroid table broadcast — the
    corpus is scanned per iteration, never shuffled for assignment;
    the only hash exchanges are the (cid, dim) update aggregates and
    per-vector windows."""
    plan = plan_of(spark, sf_dir, "kmeans_lloyd_iters")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_frequent_pairs_broadcast_prune(spark, sf_dir):
    """A-priori: the frequent-item filter and both lift supports join
    as broadcasts; the basket stream only shuffles for the pair
    count."""
    plan = plan_of(spark, sf_dir, "frequent_itemset_pairs")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_scd2_temporal_join_equi_bucketed(spark, sf_dir):
    """The point-in-time join must keep user_id as the equi key with
    the interval predicate inside the bucket — never a cartesian or
    per-row nested loop."""
    plan = plan_of(spark, sf_dir, "scd2_temporal_fact_join")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_containment_broadcasts_bench_grams(spark, sf_dir):
    """Containment decontamination: the eval gram set and its sizes
    broadcast; the corpus gram stream is never sort-merged."""
    plan = plan_of(spark, sf_dir, "containment_decontamination")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_shuffle_hash_hint_honored(spark, sf_dir):
    """The SHUFFLE_HASH hint must materialize as ShuffledHashJoin (not
    SortMergeJoin, not broadcast of the big filtered side)."""
    plan = plan_of(spark, sf_dir, "join_shuffle_hash_hint")
    assert "ShuffledHashJoin" in plan, plan[:1500]


def test_distribute_by_no_global_sort(spark, sf_dir):
    """DISTRIBUTE BY + SORT BY: hash exchange + per-partition sort,
    never a single-partition global sort exchange."""
    plan = plan_of(spark, sf_dir, "distribute_sort_within_partitions")
    assert "Exchange hashpartitioning" in plan
    assert "Exchange rangepartitioning" not in plan
    assert "Exchange SinglePartition" not in plan.split("HashAggregate")[0]


def test_snm_neardup_no_join(spark, sf_dir):
    """Sorted-neighborhood dedup is the zero-join near-dup family:
    one window sort carries the neighbor shingle sets via lead();
    there must be no join node and no single-partition global sort
    (the window is partitioned by the leading blocking byte).

    Since r14 the query reads through the unique_documents identity
    contract (a conflicting duplicate doc_id shares the blocking
    prefix, so without it the neighborhood order is not total): the
    plan gains the doc_id-keyed row_number window, which appears once
    per UNION branch (base + planted variants) — 2 identity windows +
    1 lead() neighborhood window, one exchange each.  Production
    reads silver and skips the identity windows entirely."""
    plan = plan_of(spark, sf_dir, "sorted_neighborhood_neardup")
    for node in ("CartesianProduct", "BroadcastNestedLoopJoin",
                 "BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin"):
        assert node not in plan, plan[:2000]
    assert "Exchange SinglePartition" not in plan, plan[:2000]
    # single-pass neighborhood shape: both neighbors come from ONE
    # lead() window (a per-neighbor union would double every stage);
    # the two row_number windows are the identity contract per branch
    assert plan.count("Window [lead(") == 1, plan[:2000]
    assert plan.count("Window [row_number()") == 2, plan[:2000]
    assert plan.count("Exchange hashpartitioning") == 3, plan[:2000]


def test_k_anonymity_stacked_aggs_no_join(spark, sf_dir):
    """k-anonymity: two stacked partial-aggregated groupBys, no join;
    the second agg runs on QI-cell-granular rows."""
    plan = plan_of(spark, sf_dir, "k_anonymity_risk")
    assert "partial_" in plan
    for node in ("BroadcastHashJoin", "SortMergeJoin", "CartesianProduct"):
        assert node not in plan
    assert plan.count("Exchange hashpartitioning") == 2, plan[:2000]


def test_contribution_clip_single_fulldata_exchange(spark, sf_dir):
    """Contribution clipping shuffles the full data exactly once — on
    the (user, day) rank key; the day rollup is map-side combinable
    on the already-partitioned rows."""
    plan = plan_of(spark, sf_dir, "user_contribution_clip")
    assert "partial_" in plan
    for node in ("BroadcastHashJoin", "SortMergeJoin", "CartesianProduct"):
        assert node not in plan


def test_weighted_median_reduces_before_window(spark, sf_dir):
    """Weighted median: the window must run AFTER the price-domain
    granularity reduction — the plan's first exchange is the partial
    agg to (flag, price) cells, and no join appears."""
    plan = plan_of(spark, sf_dir, "weighted_median_per_group")
    assert "partial_sum" in plan
    for node in ("BroadcastHashJoin", "SortMergeJoin", "CartesianProduct"):
        assert node not in plan
    # plan text is top-down: the segment below the LAST exchange is the
    # full-data scan side — it must hold the partial agg, not the window
    scan_side = plan.split("Exchange hashpartitioning")[-1]
    assert "partial_sum" in scan_side and "FileScan" in scan_side
    assert "Window" not in scan_side, plan[:2000]


def test_temperature_resample_broadcasts_rates(spark, sf_dir):
    """Temperature rebalancing: the lang-rate table broadcasts back
    onto the corpus scan — the corpus is never shuffled for the join,
    and both rollups partial-aggregate."""
    plan = plan_of(spark, sf_dir, "temperature_resample_by_lang")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "partial_" in plan


def test_semdedup_bounded_to_within_cluster(spark, sf_dir):
    """SemDeDup: centroid assignment rides a broadcast of the k-row
    centroid table (the corpus is never shuffled for assignment), and
    the pairwise prune is an equi join on cid — bounded to
    within-cluster, never an all-pairs cartesian over the corpus."""
    plan = plan_of(spark, sf_dir, "semdedup_cluster_prune")
    assert "CartesianProduct" not in plan
    assert "BroadcastExchange" in plan  # centroids (k rows, hinted); the
    # O(N*drop_rate) dropped set is UNhinted since r9 — AQE/threshold decides
    import re
    # the within-cluster self-join is keyed on cid (hash or sort-merge
    # both fine — at scale with k≈√N it is a plain shuffle join)
    assert re.search(r"Join \[cid#\d+L?\], \[cid#\d+L?\]", plan), plan[:2000]


def test_interdoc_dup_grams_md5_keyed(spark, sf_dir):
    """Inter-doc gram sharing: both shuffles key on the md5 digest and
    partial-aggregate map-side; no cartesian, no nested loop — raw
    text never shuffles."""
    plan = plan_of(spark, sf_dir, "interdoc_dup_gram_fraction")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "partial_" in plan
    assert "hashpartitioning(g#" in plan, plan[:2000]


def test_ivm_delta_join_shapes(spark, sf_dir):
    """IVM delta algebra: the new-dim delta (ΔB) side is an explicit
    broadcast probe of the fact; no cartesian anywhere; the three
    union legs feed one partial-aggregated rollup."""
    plan = plan_of(spark, sf_dir, "ivm_join_delta_apply")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "partial_" in plan


def test_grouped_split_scan_projection_no_join(spark, sf_dir):
    """Grouped split: the assignment is a hash PROJECTION (no user-dim
    join anywhere); the 1-row leakage audit rides a broadcast
    nested-loop combine, never a data join."""
    plan = plan_of(spark, sf_dir, "grouped_split_no_leakage")
    assert "CartesianProduct" not in plan
    for node in ("BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin"):
        assert node not in plan, plan[:2000]
    assert "partial_" in plan


def test_novelty_first_day_broadcasts_back(spark, sf_dir):
    """Daily novelty: first-occurrence days reduce to fingerprint
    granularity (map-side MIN) and join back by hash — no cartesian,
    no nested loop, raw events shuffle only on the fingerprint."""
    plan = plan_of(spark, sf_dir, "daily_content_novelty_rate")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "partial_min" in plan, plan[:2000]
    assert "hashpartitioning(h#" in plan, plan[:2000]


def test_seasonal_baseline_broadcasts(spark, sf_dir):
    """Seasonal decomposition: the 7-row weekday baseline joins back
    as the broadcast side; raw events shuffle once (to day cells) and
    never for the seasonality join."""
    plan = plan_of(spark, sf_dir, "seasonal_dow_decomposition")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "partial_sum" in plan


def test_semdedup_capped_prune_keyed_on_subcluster(spark, sf_dir):
    """Capped SemDeDup: no cartesian anywhere; the centroid table and
    the 8-row cluster-size table ride broadcasts, and the pairwise
    prune joins on (cid, sub_id) — bounded to within-SUB-cluster, so
    the hot-cluster quadratic can never come back.  The drop set is
    unhinted (r9): AQE/threshold picks its join side."""
    import re
    plan = plan_of(spark, sf_dir, "semdedup_capped_cluster_prune")
    assert "CartesianProduct" not in plan
    assert "BroadcastExchange" in plan
    assert re.search(r"Join \[cid#\d+L?, sub_id#\d+L?\]", plan), plan[:2000]


def test_er_multipass_broadcasts_dirty_side(spark, sf_dir):
    """Multi-pass ER: the dirty side (1/16th of the catalog) broadcasts
    in BOTH blocking passes and in the scoring join-back; no cartesian,
    no nested-loop fallback."""
    plan = plan_of(spark, sf_dir, "entity_resolution_multipass_block")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 3, plan[:2000]


def test_rrf_arms_are_distributed_topk(spark, sf_dir):
    """RRF fusion: each arm's top-50 must plan as
    TakeOrderedAndProject (per-partition heaps) — a global Sort of
    the corpus would be the classic ranking scale-killer; the only
    windows run over the bounded arm results."""
    plan = plan_of(spark, sf_dir, "hybrid_rrf_fusion")
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


def test_semdedup_two_salt_keyed_on_pass_and_subcluster(spark, sf_dir):
    """Two-salt SemDeDup: the doubled prune joins on
    (cid, p, sub_id) — each pass's pairwise work stays inside its own
    sub-clusters; no cartesian; centroids/sizes (bounded) broadcast,
    the O(N*drop_rate) drop stats are unhinted (r9)."""
    import re
    plan = plan_of(spark, sf_dir, "semdedup_capped_two_salt")
    assert "CartesianProduct" not in plan
    assert "BroadcastExchange" in plan
    assert re.search(r"Join \[cid#\d+L?, p#\d+, sub_id#\d+L?\]", plan), \
        plan[:2000]


def test_trajectory_pairs_inverted_index_join(spark, sf_dir):
    """Trajectory similarity: user pairs come from an equi join on
    the transition key (inverted index) — never a user x user
    cartesian; the O(|users|) size tables are unhinted (r9) — the
    size threshold picks broadcast at fixture scale only."""
    plan = plan_of(spark, sf_dir, "trajectory_transition_similarity")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    import re
    assert re.search(r"Join \[t#\d+L?\], \[t#\d+L?\]", plan), plan[:2000]


def test_rrf_ivf_semantic_arm_probes_one_cluster(spark, sf_dir):
    """IVF-armed RRF (VERDICT r8 #4): the semantic arm's cosine top-k
    must run over the query's inverted list only — the plan shows the
    probe filter as an equi join on cid feeding TakeOrderedAndProject,
    and both arms stay per-partition heaps (no global Sort of the
    corpus, no cartesian)."""
    import re
    plan = plan_of(spark, sf_dir, "hybrid_rrf_fusion_ivf")
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan
    # the probe filter: candidates join the 1-row assigned query on cid
    assert re.search(r"Join \[cid#\d+L?\], \[qcid#\d+L?\]", plan), plan[:2000]


def test_exact_substring_spans_inverted_index(spark, sf_dir):
    """Exact-substring spans: pairs come from an equi join on the gram
    digest (inverted index, boilerplate-capped) — never doc x doc; the
    island merge windows over (pair, diagonal) partitions."""
    import re
    plan = plan_of(spark, sf_dir, "exact_substring_spans")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert re.search(r"Join \[g#\d+\], \[g#\d+\]", plan), plan[:2000]


def test_ivf_multiprobe_keyed_on_cid(spark, sf_dir):
    """Multi-probe IVF: candidates come from the cid equi join of the
    probe set against the home lists — probes x list size, never a
    corpus scan per query."""
    import re
    plan = plan_of(spark, sf_dir, "ann_ivf_multiprobe")
    assert "CartesianProduct" not in plan
    assert re.search(r"Join \[cid#\d+L?\], \[cid#\d+L?\]", plan), plan[:2000]


def test_token_budget_two_phase_cumsum(spark, sf_dir):
    """Token-budget head selection: the corpus shuffles once on the
    quality-value key; the only unpartitioned (global-order) window
    runs over value-granular aggregate rows, never raw docs — the
    two-phase cumsum that avoids the single-partition corpus sort."""
    plan = plan_of(spark, sf_dir, "token_budget_head_selection")
    assert "CartesianProduct" not in plan
    assert "partial_sum" in plan
    assert "hashpartitioning(n_chars#" in plan, plan[:2000]


def test_pareto_frontier_grouped_cummax(spark, sf_dir):
    """Pareto frontier: the skyline is the grouped-cummax form — corpus
    rows shuffle once on the length key (partial_max before the
    exchange); the only global-order window runs over length-VALUE
    rows, never corpus-granular ones; no dominance self-join."""
    plan = plan_of(spark, sf_dir, "pareto_frontier_docs")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "partial_max" in plan
    assert "hashpartitioning(toks#" in plan, plan[:2000]


def test_weighted_sample_per_group_rank(spark, sf_dir):
    """Efraimidis-Spirakis weighted sample: the top-k key rank windows
    over per-language partitions (bounded groups), never a global
    sort of the corpus."""
    plan = plan_of(spark, sf_dir, "weighted_sample_wor")
    assert "CartesianProduct" not in plan
    assert "hashpartitioning(lang#" in plan, plan[:2000]


def test_dedup_incremental_digest_joins(spark, sf_dir):
    """Incremental-ingest dedup: both classifications are equi joins on
    the md5 content digest (raw text never shuffles), and the
    O(corpus) index side carries no broadcast hint — at fixture scale
    AQE may still pick broadcast, but no CartesianProduct and the
    join keys must be the digest."""
    import re
    plan = plan_of(spark, sf_dir, "dedup_incremental_index")
    assert "CartesianProduct" not in plan
    assert re.search(r"Join \[h#\d+\], \[h#\d+\]", plan), plan[:2000]


def test_retrieval_eval_bounded_query_broadcast(spark, sf_dir):
    """Retrieval eval: the 8-anchor query set broadcasts against one
    corpus scan; the per-query rank window partitions by query_id.
    The broadcast is the bounded eval batch, never the corpus."""
    plan = plan_of(spark, sf_dir, "retrieval_eval_metrics")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan  # bounded 8-row q side
    assert "hashpartitioning(query_id#" in plan, plan[:2000]


def test_knn_graph_bucket_local_join(spark, sf_dir):
    """kNN-graph build: candidates come from the bucket-id self-equi
    join (within-bucket only), never an all-pairs product; the top-3
    is a per-src rank window."""
    import re
    plan = plan_of(spark, sf_dir, "knn_graph_lsh")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert re.search(r"Join \[bucket#\d+\], \[bucket#\d+\]", plan), plan[:2000]


def test_auc_rank_sum_no_pair_blowup(spark, sf_dir):
    """AUC: the Mann-Whitney rank-sum form — a bounded anchor
    broadcast, per-anchor rank windows, and a partial-aggregable
    reduction; never an n_pos x n_neg pair join."""
    plan = plan_of(spark, sf_dir, "ranking_eval_auc")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan  # bounded 4-anchor side
    assert "partial_sum" in plan
    assert "hashpartitioning(anchor_id#" in plan, plan[:2000]


def test_calibration_single_scan_small_groupby(spark, sf_dir):
    """Calibration bins: one corpus scan against a 1-row broadcast
    anchor, then a 10-group partial-aggregable groupBy."""
    plan = plan_of(spark, sf_dir, "calibration_ece_bins")
    assert "CartesianProduct" not in plan
    assert "partial_sum" in plan
    assert "hashpartitioning(bin#" in plan, plan[:2000]


def test_t_closeness_band_marginal_broadcast(spark, sf_dir):
    """t-closeness: the global band marginal (sensitive-domain-bounded)
    broadcasts back onto (cell, band) rows; the TVD reduction is
    partial-aggregable; no corpus-granular join shuffle for the
    marginal side."""
    plan = plan_of(spark, sf_dir, "t_closeness_audit")
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan
    assert "partial_sum" in plan


def test_zone_map_metadata_granularity(spark, sf_dir):
    """Zone-map stats: each layout is one aggregation to file
    granularity with map-side partial min/max; the pruning evaluation
    folds over file-granular rows only — no joins at all."""
    plan = plan_of(spark, sf_dir, "zone_map_pruning_stats")
    assert "CartesianProduct" not in plan
    assert "Join" not in plan  # pure scan -> agg -> union -> agg
    assert "partial_min" in plan and "partial_max" in plan


def test_mmr_bounded_pool_pandas(spark, sf_dir):
    """MMR rerank: the greedy loop runs inside applyInPandas over the
    per-anchor top-8 pool (FlatMapGroupsInPandas); pooling is a
    per-anchor rank window; the corpus is scanned once against the
    bounded anchor broadcast."""
    plan = plan_of(spark, sf_dir, "mmr_diversified_topk")
    assert "CartesianProduct" not in plan
    assert "FlatMapGroupsInPandas" in plan
    assert "hashpartitioning(anchor_id#" in plan, plan[:2000]


def test_label_propagation_node_keyed_shuffles(spark, sf_dir):
    """Label propagation: the vote join is edge-list x label-table on
    the node key; the majority argmax windows over node-granular
    (src) partitions; everything inherits the bucket-local edge
    build — no all-pairs anywhere.

    Since the identity-uniqueness contract (r13 --dupkeys), the
    node-keyed exchange is the dedup window's hashpartitioning on
    vec_id, and Catalyst REUSES it for every downstream src-keyed
    window (src is vec_id renamed through the join's probe side) — so
    the pin accepts either spelling of the node key, and there must
    be no src-keyed RE-shuffle on top of a vec_id one."""
    plan = plan_of(spark, sf_dir, "label_propagation_knn")
    assert "CartesianProduct" not in plan
    assert "windowspecdefinition(src#" in plan, plan[:2000]
    assert ("hashpartitioning(src#" in plan
            or "hashpartitioning(vec_id#" in plan), plan[:2000]
    if "hashpartitioning(vec_id#" in plan:
        assert "Exchange hashpartitioning(src#" not in plan, (
            "node key shuffled twice — partitioning reuse regressed")


def test_kmv_two_phase_min_k(spark, sf_dir):
    """KMV sketch: min-k per set is the salted two-phase top-k — the
    phase-1 rank windows over (s, h%64) salt groups (the
    'topk_per_group_salted' shape), never one sort of all distinct
    hashes; the estimate assembly is 1-row broadcast cross-joins."""
    import re
    plan = plan_of(spark, sf_dir, "kmv_sketch_set_ops")
    assert "CartesianProduct" not in plan
    # the salted phase-1 partitioning key (s, _w0 = h % 64 projected
    # below the window) — distinct from the phase-2 (s)-only exchange
    assert re.search(r"hashpartitioning\(s#\d+L, _w0#\d+L", plan), \
        plan[:3000]


def test_pmi_vocab_keyed_counts_topk_heap(spark, sf_dir):
    """PMI: bigrams from a per-doc lead window (one doc_id shuffle);
    count joins are vocab-keyed; the top-20 is TakeOrderedAndProject
    (per-partition heaps), never a global sort."""
    plan = plan_of(spark, sf_dir, "pmi_adjacent_bigrams")
    assert "CartesianProduct" not in plan
    assert "TakeOrderedAndProject" in plan
    assert "hashpartitioning(doc_id#" in plan, plan[:2000]


def test_hard_negative_ivf_probe_join(spark, sf_dir):
    """IVF-armed hard-negative mining: candidates come from the cid
    equi join of the anchor probe set against home lists (probes x
    list size), never a corpus scan per anchor; the label filter
    prunes before scoring."""
    import re
    plan = plan_of(spark, sf_dir, "hard_negative_mining_ivf")
    assert "CartesianProduct" not in plan
    assert re.search(r"Join \[cid#\d+L?\], \[cid#\d+L?\]", plan), plan[:2000]


def test_woe_single_scan_tiny_groupby(spark, sf_dir):
    """WOE/IV: one scan, map-side bin assignment, 10-group
    partial-aggregable groupBy, 1-row totals broadcast back."""
    plan = plan_of(spark, sf_dir, "woe_information_value")
    assert "CartesianProduct" not in plan
    assert "partial_sum" in plan
    assert "hashpartitioning(bin#" in plan, plan[:2000]


def test_mixture_weights_domain_granular(spark, sf_dir):
    """Mixture weights: token counting is map-side in the scan
    projection; the only shuffle is the domain-keyed count merge."""
    plan = plan_of(spark, sf_dir, "domain_mixture_weights")
    assert "CartesianProduct" not in plan
    assert "partial_sum" in plan
    assert "hashpartitioning(source#" in plan, plan[:2000]


def test_embargo_split_pushes_nothing_shuffles_class(spark, sf_dir):
    """Embargo split: a 3-way CASE in the scan projection and a
    class-keyed count merge — no joins, no windows."""
    plan = plan_of(spark, sf_dir, "temporal_embargo_split")
    assert "Join" not in plan
    assert "partial_count" in plan or "partial_sum" in plan


def test_winnowing_doc_windows_then_capped_join(spark, sf_dir):
    """Winnowing: gram hashing + argmin are per-doc windows (doc_id
    shuffle), selection shrinks before any join, the DF cap guards
    the inverted-index self-join on the fingerprint hash — never
    doc x doc."""
    import re
    plan = plan_of(spark, sf_dir, "winnowing_fingerprints")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "hashpartitioning(doc_id#" in plan, plan[:2000]
    assert re.search(r"Join \[h#\d+L\], \[h#\d+L\]", plan), plan[:2000]


def test_kfold_mapside_hash_value_granular(spark, sf_dir):
    """Stratified k-fold: the fold id is computed in the scan
    projection (no shuffle to assign); the report joins
    (stratum, fold)-granular counts to stratum totals."""
    plan = plan_of(spark, sf_dir, "stratified_kfold_assign")
    assert "CartesianProduct" not in plan
    assert "partial_count" in plan or "partial_sum" in plan


def test_rbo_heap_heads_bounded_tail(spark, sf_dir):
    """RBO drift: each scorer arm is a top-k heap over one corpus scan
    (TakeOrderedAndProject), and everything after operates on the
    bounded joined heads + a fixed depth frame — no global sort, no
    cartesian of corpus rows."""
    plan = plan_of(spark, sf_dir, "ranking_drift_rbo")
    assert "CartesianProduct" not in plan
    assert plan.count("TakeOrderedAndProject") >= 2, plan[:2000]


def test_table_diff_single_fullouter_join(spark, sf_dir):
    """Snapshot diff: exactly one key-keyed FULL OUTER join, then a
    partial-aggregable global reduction."""
    plan = plan_of(spark, sf_dir, "table_diff_summary")
    assert "FullOuter" in plan
    assert "CartesianProduct" not in plan
    joins = (plan.count("SortMergeJoin") + plan.count("ShuffledHashJoin")
             + plan.count("BroadcastHashJoin"))
    assert joins == 1, plan[:2000]


def test_dp_noise_zero_extra_shuffle(spark, sf_dir):
    """DP release: the noise is a map-side expression on group-granular
    rows — exactly one aggregation exchange, no joins."""
    plan = plan_of(spark, sf_dir, "dp_noisy_counts_seeded")
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning") == 1, plan[:2000]
    assert "partial_count" in plan


def test_basket_pairs_join_on_basket_key(spark, sf_dir):
    """Basket lift: the pair join is the basket-key self-join (work is
    sum of squared basket sizes, never items x items), and the top-20
    is TakeOrderedAndProject."""
    import re
    plan = plan_of(spark, sf_dir, "basket_pair_lift")
    assert "CartesianProduct" not in plan
    assert "TakeOrderedAndProject" in plan
    assert re.search(r"Join \[k#\d+L\], \[k#\d+L\]", plan), plan[:2000]


def test_cusum_calendar_bounded_windows(spark, sf_dir):
    """CUSUM: the corpus reduces to (type, day) granularity map-side;
    every window (running sum, mean, argmax) runs over day-granular
    rows partitioned by type."""
    plan = plan_of(spark, sf_dir, "cusum_changepoint")
    assert "CartesianProduct" not in plan
    assert "partial_count" in plan
    assert "hashpartitioning(event_type#" in plan, plan[:2000]


def test_percentile_norm_source_partitioned(spark, sf_dir):
    """Within-source percentile: one rank window per source partition;
    no joins, no global window."""
    plan = plan_of(spark, sf_dir, "score_percentile_by_source")
    assert "Join" not in plan
    assert "hashpartitioning(source#" in plan, plan[:2000]


def test_perplexity_filter_vocab_joins_heap_head(spark, sf_dir):
    """Bigram-LM perplexity: training is two vocab-granular counts;
    scoring joins on vocab-bounded keys; the outlier report is a
    TakeOrderedAndProject heap, never a global sort."""
    plan = plan_of(spark, sf_dir, "bigram_lm_perplexity_filter")
    assert "CartesianProduct" not in plan
    assert "TakeOrderedAndProject" in plan
    assert "partial_count" in plan


def test_mutual_knn_edge_granular_join(spark, sf_dir):
    """Reciprocal kNN: one self-equi-join of the O(3N) edge list on
    the reversed (src, dst) pair key — edge-granular, never
    corpus-granular."""
    import re
    plan = plan_of(spark, sf_dir, "mutual_knn_pairs")
    assert "CartesianProduct" not in plan
    assert re.search(
        r"Join \[src#\d+L, dst#\d+L\], \[src#\d+L, dst#\d+L\]", plan), \
        plan[:2000]


def test_funnel_v2_no_rescans_no_cartesian(spark, sf_dir):
    """Composed funnel: signals computed once, gates composed as
    doc_id-keyed joins, one rollup; no cartesian of corpus rows and
    no broadcast hint on the drop set."""
    plan = plan_of(spark, sf_dir, "curation_funnel_v2")
    assert "CartesianProduct" not in plan
    assert "partial_count" in plan


def test_approx_quantile_single_agg(spark, sf_dir):
    """Quantile-error audit: exact + sketch percentile in ONE
    aggregation pass over one scan — no joins."""
    plan = plan_of(spark, sf_dir, "approx_quantile_error_by_group")
    assert "Join" not in plan
    assert plan.count("Scan parquet") == 1, plan[:2000]


def test_centroid_drift_summary_granular_join(spark, sf_dir):
    """Centroid drift: per-dim partial means reduce BEFORE any join —
    the dimension-wise join sees (label, half, dim)-granular summary
    rows, never raw vectors."""
    plan = plan_of(spark, sf_dir, "embedding_centroid_drift")
    assert "CartesianProduct" not in plan
    assert "partial_sum" in plan or "partial_avg" in plan
    assert "hashpartitioning(label#" in plan, plan[:2000]


def test_minhash_eval_sample_pushed_no_allpairs(spark, sf_dir):
    """MinHash P/R eval: the 10% sample filter reaches the parquet
    scan; truth pairs come from the shingle inverted-index join (no
    all-pairs materialization); scalars assemble via 1-row broadcast
    cross-joins."""
    plan = plan_of(spark, sf_dir, "minhash_eval_pr")
    assert "CartesianProduct" not in plan
    assert "PushedFilters" in plan
    assert "BroadcastNestedLoopJoin" in plan  # the 1-row scalar joins


def test_langid_eval_mapside_classify_bounded_matrix(spark, sf_dir):
    """Lang-ID confusion eval: classification is map-side in the scan
    projection; the matrix is (class x class)-granular with class
    totals joined on the bounded label domain."""
    plan = plan_of(spark, sf_dir, "langid_confusion_eval")
    assert "CartesianProduct" not in plan
    assert "partial_count" in plan
    assert "hashpartitioning(lang#" in plan, plan[:2000]


def test_winsorized_group_granular_bounds_join(spark, sf_dir):
    """Winsorized stats: the clamp rides map-side after a
    group-granular bounds join — no row-granular shuffle beyond the
    group key."""
    plan = plan_of(spark, sf_dir, "winsorized_robust_stats")
    assert "CartesianProduct" not in plan
    assert "partial_" in plan


def test_shard_skew_sixteen_groups_one_fold(spark, sf_dir):
    """Shard-load audit: map-side token counting, one 16-group
    partial-aggregable groupBy, a 1-row fold; no joins."""
    plan = plan_of(spark, sf_dir, "shard_load_skew")
    assert "Join" not in plan
    assert "partial_sum" in plan


def test_sequence_packing_no_global_sort(spark, sf_dir):
    """sequence_packing_ffd (VERDICT r9 #5): the pack is sharded by
    (length-bucket, salt) — one hash exchange feeding the per-group
    pandas FFD, and NO global sort / single-partition collapse
    anywhere (the naive form would orderBy(toks) the whole corpus)."""
    plan = plan_of(spark, sf_dir, "sequence_packing_ffd")
    assert "FlatMapGroupsInPandas" in plan
    assert "Exchange hashpartitioning(bucket" in plan
    assert "Exchange rangepartitioning" not in plan
    assert "SinglePartition" not in plan


def test_doc_chunking_is_map_side_only(spark, sf_dir):
    """doc_chunk_fixed_stride: explode(sequence(...)) + md5 is a pure
    map-side fan-out — zero exchanges in the whole plan."""
    plan = plan_of(spark, sf_dir, "doc_chunk_fixed_stride")
    assert "Generate explode" in plan
    assert "Exchange" not in plan


def test_chunk_dedup_no_broadcast_of_owner_index(spark, sf_dir):
    """chunk_dedup_survivor_map: the owners side is O(distinct chunk
    hashes) — corpus-sized — so there must be NO broadcast HINT on it
    (at fixture scale AQE may still pick broadcast via the size
    threshold; the pin is that the logical plan carries no hint and
    the pair join is hash-equi on the fingerprint)."""
    from glue_parquet_splitter_spark.queries import curation6_q
    import inspect

    src = inspect.getsource(curation6_q.chunk_dedup_survivor_map)
    assert "F.broadcast(" not in src and ".hint(" not in src
    plan = plan_of(spark, sf_dir, "chunk_dedup_survivor_map")
    assert "Exchange rangepartitioning" not in plan
    assert "SinglePartition" not in plan


def test_hashgram_classifier_weight_broadcast(spark, sf_dir):
    """hashgram_classifier_score (VERDICT r9 #7): the weight table is
    D=512-bucket-bounded, so inference must be a broadcast join (no
    shuffle of the corpus-side feature counts against the weights) and
    the dot product a partial-aggregable integer sum."""
    plan = plan_of(spark, sf_dir, "hashgram_classifier_score")
    assert "BroadcastHashJoin" in plan
    assert "partial_sum" in plan or "partial_min" in plan
    assert "Exchange rangepartitioning" not in plan


def test_funnel_v3_no_drop_set_broadcast(spark, sf_dir):
    """curation_funnel_v3 inherits the r9 contract: no broadcast HINT
    on the O(N dup_rate) winnowing drop set; gates compose as
    doc_id-keyed joins (no cartesian anywhere but the 1-row p95)."""
    from glue_parquet_splitter_spark.queries import curation6_q
    import inspect

    src = inspect.getsource(curation6_q.curation_funnel_v3)
    # the only F.broadcast sites are the 1-row p95 threshold scalar
    # (the drop set, clf scores, and nll signals are join-key sides)
    assert src.count("F.broadcast(") == 1
    plan = plan_of(spark, sf_dir, "curation_funnel_v3")
    assert "Exchange rangepartitioning" not in plan


def test_backfill_packing_single_salt_exchange(spark, sf_dir):
    """sequence_packing_backfill: anchors and smalls of a shard pack
    in ONE pandas group — a single hash exchange on the salt, no
    global sort, no second shuffle to marry the two classes."""
    plan = plan_of(spark, sf_dir, "sequence_packing_backfill")
    assert "FlatMapGroupsInPandas" in plan
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Exchange rangepartitioning" not in plan
    assert "SinglePartition" not in plan


def test_text_clean_is_map_side_only(spark, sf_dir):
    """text_clean_normalize: two regexp passes + trim — zero
    exchanges, like chunking (the first stage of every crawl
    pipeline must never shuffle)."""
    plan = plan_of(spark, sf_dir, "text_clean_normalize")
    assert "Exchange" not in plan


def test_cdc_chunking_is_map_side_only(spark, sf_dir):
    """cdc_gear_chunking: the gear hash telescopes to a per-position
    window sum, so the CHUNKER is array expressions on the scan —
    content-defined boundaries must not cost a shuffle.  Since the
    identity-uniqueness contract (r13 --dupkeys) the input passes
    through unique_documents first, whose doc_id window is the ONLY
    exchange in the plan (production reads bronze-deduped storage and
    skips it); the chunking itself still adds none."""
    plan = plan_of(spark, sf_dir, "cdc_gear_chunking")
    # r15: the batch chunker is one Arrow-batched map pass (NumPy gear
    # hash — see _cdc_chunks); the streaming twin keeps the pure
    # expression form.  Still zero chunker-side exchanges.
    assert "MapInPandas" in plan
    import re
    exchanges = re.findall(r"Exchange hashpartitioning\(([^,)]*)", plan)
    assert all(k.startswith("doc_id") for k in exchanges), exchanges
    assert "Exchange rangepartitioning" not in plan
    assert len(set(exchanges)) <= 1, exchanges


def test_cdc_resilience_doc_keyed_joins(spark, sf_dir):
    """cdc_shift_resilience: both chunkers are map-side; the md5
    overlap joins are keyed by (doc_id, md5) — evenly partitioned —
    and the only SinglePartition sits under the final 2x1-row means,
    fed by partial aggregation."""
    plan = plan_of(spark, sf_dir, "cdc_shift_resilience")
    assert "partial_avg" in plan or "partial_count" in plan
    assert "Exchange rangepartitioning" not in plan
    assert "CartesianProduct" not in plan


def test_bpe_step_topk_no_global_sort(spark, sf_dir):
    """bpe_pair_merge_step: top-20 pairs via TakeOrderedAndProject
    (per-partition top-k + merge), never a rangepartitioned sort; the
    word-count agg partial-aggregates map-side."""
    plan = plan_of(spark, sf_dir, "bpe_pair_merge_step")
    assert "TakeOrderedAndProject" in plan
    assert "partial_sum" in plan or "partial_count" in plan
    assert "Exchange rangepartitioning" not in plan


def test_bpe_learn_merges_bounded_argmax_broadcasts(spark, sf_dir):
    """bpe_learn_merges: each of the K levels reduces to a 1-ROW
    argmax (TakeOrderedAndProject) that rides a broadcast into the
    symbol rewrite — the corpus-sized vocab table is never on a
    broadcast side, and no level global-sorts."""
    import inspect

    from glue_parquet_splitter_spark.queries import tokenizer_q

    # the shared train loop's limit(1) argmax is the ONLY hint site
    assert inspect.getsource(
        tokenizer_q._bpe_train).count("F.broadcast(") == 1
    assert "F.broadcast(" not in inspect.getsource(
        tokenizer_q.bpe_learn_merges)
    plan = plan_of(spark, sf_dir, "bpe_learn_merges")
    assert "TakeOrderedAndProject" in plan
    assert "Exchange rangepartitioning" not in plan


def test_temperature_sampling_bounded_dim_join(spark, sf_dir):
    """temperature_mixture_sampling: the corpus joins only the
    |langs|-row rate table (broadcast at any scale); the scalar N and
    Z totals ride 1-row crossJoins; no range exchange anywhere."""
    plan = plan_of(spark, sf_dir, "temperature_mixture_sampling")
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "partial_sum" in plan
    assert "Exchange rangepartitioning" not in plan


def test_leakage_split_single_bounded_broadcast(spark, sf_dir):
    """leakage_safe_split_by_cluster: the only broadcast HINT is the
    1-row leak-count agg; the fold map and edge audit are doc_id-keyed
    equi joins (the component map is O(clustered docs) — corpus-sized,
    never hinted)."""
    import inspect

    from glue_parquet_splitter_spark.queries import graph_q

    src = inspect.getsource(graph_q.leakage_safe_split_by_cluster)
    assert src.count("F.broadcast(") == 1
    plan = plan_of(spark, sf_dir, "leakage_safe_split_by_cluster")
    assert "Exchange rangepartitioning" not in plan


def test_bpe_encode_vocab_join_unhinted(spark, sf_dir):
    """bpe_encode_apply: the vocab side grows with the corpus, so the
    corpus-token join must carry NO broadcast hint (the only hinted
    broadcast anywhere in the lineage is _bpe_train's 1-row argmax);
    no level global-sorts."""
    import inspect

    from glue_parquet_splitter_spark.queries import tokenizer_q

    src = inspect.getsource(tokenizer_q.bpe_encode_apply)
    assert "F.broadcast(" not in src and ".hint(" not in src
    plan = plan_of(spark, sf_dir, "bpe_encode_apply")
    assert "Exchange rangepartitioning" not in plan
    assert "partial_sum" in plan


def test_cdc_containment_df_capped_no_hints(spark, sf_dir):
    """cdc_containment_pairs: the inverted index is DF-capped BEFORE
    the pair self-join and nothing is broadcast-hinted (boilerplate
    fingerprints are the skew hazard; the cap bounds fan-out)."""
    import inspect

    from glue_parquet_splitter_spark.queries import tokenizer_q

    src = inspect.getsource(tokenizer_q.cdc_containment_pairs)
    assert "F.broadcast(" not in src and ".hint(" not in src
    plan = plan_of(spark, sf_dir, "cdc_containment_pairs")
    assert "Exchange rangepartitioning" not in plan
    assert "CartesianProduct" not in plan


def test_ngram_novelty_gram_keyed(spark, sf_dir):
    """ngram_novelty_saturation: trigram fan-out is map-side; the two
    aggs and the join-back all key on the gram (even partitioning);
    no range exchange, no cartesian."""
    plan = plan_of(spark, sf_dir, "ngram_novelty_saturation")
    assert "Exchange rangepartitioning" not in plan
    assert "CartesianProduct" not in plan
    assert "partial_min" in plan or "partial_count" in plan


def test_cross_source_overlap_df_capped_no_hints(spark, sf_dir):
    """cross_source_overlap_matrix: per-doc DF cap lands BEFORE the
    source-pair join and nothing is broadcast-hinted — boilerplate
    grams are the skew hazard, same contract as the chunk/span
    inverted indexes."""
    import inspect

    from glue_parquet_splitter_spark.queries import curation7_q

    src = inspect.getsource(curation7_q.cross_source_overlap_matrix)
    assert "F.broadcast(" not in src and ".hint(" not in src
    plan = plan_of(spark, sf_dir, "cross_source_overlap_matrix")
    assert "Exchange rangepartitioning" not in plan
    assert "CartesianProduct" not in plan


def test_shard_quota_window_is_dimension_bounded(spark, sf_dir):
    """shard_quota_largest_remainder: the only unpartitioned window
    ranks the |sources|-row POST-AGGREGATE dimension (justified via
    the boundedness comment); the corpus itself sees exactly one agg."""
    plan = plan_of(spark, sf_dir, "shard_quota_largest_remainder")
    assert "partial_count" in plan or "partial_sum" in plan
    assert "Exchange rangepartitioning" not in plan


def test_threshold_sweep_single_pair_pass(spark, sf_dir):
    """embedding_dedup_threshold_sweep: the 6-threshold grid fans out
    map-side over pair rows computed ONCE (blocked self-join) — no
    per-threshold recompute, no range exchange, no cartesian."""
    import inspect

    from glue_parquet_splitter_spark.queries import curation7_q

    src = inspect.getsource(curation7_q.embedding_dedup_threshold_sweep)
    assert src.count("F.broadcast(") == 1  # the 1-row corpus count only
    plan = plan_of(spark, sf_dir, "embedding_dedup_threshold_sweep")
    assert plan.count("Generate explode") == 1
    assert "Exchange rangepartitioning" not in plan
    assert "CartesianProduct" not in plan


def test_neyman_moments_single_corpus_agg(spark, sf_dir):
    """neyman_allocation_sampling: the corpus is touched by exactly
    one aggregate (integer moments); everything downstream runs on the
    |sources| dimension."""
    plan = plan_of(spark, sf_dir, "neyman_allocation_sampling")
    assert "partial_sum" in plan
    assert "Exchange rangepartitioning" not in plan


def test_band_tuning_shares_signature_lineage(spark, sf_dir):
    """lsh_band_tuning_audit: four bandings over ONE signature
    aggregation — each arm is a band-keyed bucket self-join (the
    production LSH shape), never a cartesian; no range exchange."""
    plan = plan_of(spark, sf_dir, "lsh_band_tuning_audit")
    assert "CartesianProduct" not in plan
    assert "Exchange rangepartitioning" not in plan


def test_cluster_size_histogram_costs_two_aggs(spark, sf_dir):
    """dedup_cluster_size_distribution: the audit on top of the CC map
    is two small aggs + a 1-row singleton count — no cartesian, no
    range exchange."""
    plan = plan_of(spark, sf_dir, "dedup_cluster_size_distribution")
    assert "CartesianProduct" not in plan
    assert "Exchange rangepartitioning" not in plan


def test_classifier_sweep_scores_once(spark, sf_dir):
    """classifier_threshold_sweep: scores computed once (broadcast
    weight join), the grid a single literal fan-out — exactly one
    Generate explode for the grid beyond the featurization's own, no
    range exchange."""
    plan = plan_of(spark, sf_dir, "classifier_threshold_sweep")
    assert "BroadcastHashJoin" in plan
    assert "Exchange rangepartitioning" not in plan
    assert "CartesianProduct" not in plan


def test_fill_report_rides_the_pack_plan(spark, sf_dir):
    """packing_fill_report: the audit adds two aggs on the pack's own
    FlatMapGroupsInPandas plan — still one hash exchange into the
    pack, no global sort."""
    plan = plan_of(spark, sf_dir, "packing_fill_report")
    assert "FlatMapGroupsInPandas" in plan
    assert "Exchange rangepartitioning" not in plan
    assert "SinglePartition" not in plan


def test_embedding_health_single_pass(spark, sf_dir):
    """embedding_health_audit: one map-side flag/norm row per vector,
    a 1-row modal-dim aggregate joined back as a bounded broadcast
    (the r12 malformed-class detector), and a single global aggregate
    — no corpus-side SHUFFLE join, no range exchange (the exact
    median is the only sort and it lives inside the percentile
    aggregate)."""
    plan = plan_of(spark, sf_dir, "embedding_health_audit")
    assert "SortMergeJoin" not in plan
    assert "ShuffledHashJoin" not in plan
    assert "Exchange rangepartitioning" not in plan
    # the only join is the 1-row modal-dim broadcast
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_training_mix_manifest_source_partitioned_selection(spark, sf_dir):
    """training_mix_manifest: the selection window partitions BY
    SOURCE (never a global sort of the corpus); the quota side is a
    |sources|-row bounded broadcast."""
    plan = plan_of(spark, sf_dir, "training_mix_manifest")
    assert "Exchange rangepartitioning" not in plan
    assert "CartesianProduct" not in plan


def test_bucket_skew_audit_never_pairs(spark, sf_dir):
    """lsh_bucket_skew_audit: the audit is aggregates over (band, sig)
    counts — NO pair self-join anywhere in the plan (that is the
    point: estimate the pair cost without paying it)."""
    plan = plan_of(spark, sf_dir, "lsh_bucket_skew_audit")
    assert "Join" not in plan
    assert "Exchange rangepartitioning" not in plan


def test_leaderboard_doc_keyed_signal_joins(spark, sf_dir):
    """source_quality_leaderboard: the funnel's signals compose as
    doc_id-keyed left joins (no hint on the O(N·dup_rate) drop set),
    then one |sources|-row aggregate."""
    import inspect

    from glue_parquet_splitter_spark.queries import curation5_q

    src = inspect.getsource(curation5_q.source_quality_leaderboard)
    assert "F.broadcast(" not in src and ".hint(" not in src
    plan = plan_of(spark, sf_dir, "source_quality_leaderboard")
    assert "Exchange rangepartitioning" not in plan
    assert "CartesianProduct" not in plan


def test_collision_audit_vocab_granular(spark, sf_dir):
    """hashgram_collision_audit: distinct grams collapse the corpus to
    vocab size before the two D-granular aggs — no joins at all in
    the audit."""
    plan = plan_of(spark, sf_dir, "hashgram_collision_audit")
    assert "Join" not in plan
    assert "Exchange rangepartitioning" not in plan


def test_normalization_impact_hash_keyed(spark, sf_dir):
    """dedup_normalization_impact: both arms are md5-keyed groupBys
    (32-byte keys shuffle, never text); no join, no range exchange."""
    plan = plan_of(spark, sf_dir, "dedup_normalization_impact")
    assert "Join" not in plan
    assert "Exchange rangepartitioning" not in plan
    assert "partial_count" in plan or "partial_sum" in plan


def test_fk_integrity_audit_key_collapsed_broadcast(spark, sf_dir):
    """fk_integrity_audit: every fact side collapses to FK-key
    cardinality BEFORE the dim probe (no fact-row join), all seven
    existence probes are broadcast joins (dim PK side is bounded),
    and every scan reads exactly its one key column."""
    import re

    plan = plan_of(spark, sf_dir, "fk_integrity_audit")
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastHashJoin") == 7
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    assert schemas and all("," not in s for s in schemas), schemas
