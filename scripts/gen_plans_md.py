#!/usr/bin/env python
"""Generate PLANS.md: formatted physical plans of representative
queries with the scale-relevant properties called out."""

import sys

sys.path.insert(0, "/root/repo")

from glue_parquet_splitter_spark.queries import load_all_modules  # noqa: E402
from glue_parquet_splitter_spark.session import get_spark  # noqa: E402

SHOWCASE = {
    "q5_region_revenue": (
        "Flagship join pipeline: every dim side is a BroadcastHashJoin — the "
        "lineitem scan is never shuffled for a dimension; the only exchange is "
        "the final group-by, fed by partial aggregation."
    ),
    "filter_project": (
        "Filter + projection land in the scan: PushedFilters carries the "
        "predicates, ReadSchema shows only 4 of 11 columns are read."
    ),
    "q1_pricing_summary": (
        "Partial (map-side) aggregation before the single exchange; the whole "
        "pipeline is one WholeStageCodegen span over the vectorized scan."
    ),
    "minhash_lsh_candidates": (
        "Shingle explode and both md5s are map-side inside the scan stage; the "
        "wide operations are one groupBy(doc_id) over 8 short hash columns and "
        "the band-bucket self-join."
    ),
    "ann_lsh_bucketed": (
        "Sign-bit bucket id computed in the scan projection; candidate join is "
        "a broadcast of the query set; per-query top-k is a bounded window."
    ),
    "sort_limit": (
        "Global top-k runs as TakeOrderedAndProject — per-partition heaps, no "
        "global sort of the input."
    ),
    "asof_join": (
        "As-of composed as broadcast inequality join + per-event top-1 window; "
        "the probe side streams, only the (cust, day) aggregate is broadcast."
    ),
    "merge_upsert_apply": (
        "CDC MERGE as exactly one key join: base and change set shuffle once "
        "on o_orderkey, update/insert/delete all resolve in the join's "
        "projection — no second pass, no cartesian."
    ),
    "sessionize_events": (
        "Lag-gap sessionization: the window scan and the per-session "
        "aggregate share the user_id hash partitioning — a single exchange "
        "feeds both, and the aggregate partial-aggregates map-side."
    ),
    "decontamination_ngram_overlap": (
        "Benchmark-overlap decontamination: the eval gram set broadcasts; "
        "the corpus side streams through a map-side hash join on 32-byte "
        "digests — corpus text is never shuffled."
    ),
    "ivfpq_topk_search": (
        "IVF-PQ composed index (FAISS recipe): coarse centroids broadcast "
        "for the one-pass list assignment; the residual-PQ codebook and the "
        "per-query ADC tables are metadata broadcasts; candidate scoring is "
        "integer-keyed code⋈ADC lookups inside the probed list — no "
        "full-vector arithmetic per candidate; the exact arm exists only to "
        "grade recall."
    ),
    "ann_pq_adc_topk": (
        "Product quantization with ADC: the 32-subvector codebook and the "
        "32-entry query distance table both broadcast; encoding is one "
        "corpus scan with per-(vector, subspace) argmin — the corpus is "
        "never shuffled, and at ingest the codes would be written once."
    ),
    "quality_decile_mix_histogram": (
        "Decile weights without a global row sort: the only full-data pass "
        "is a map-side-combinable groupBy to one row per distinct value; "
        "the window sort runs over the tiny histogram, and the decile is "
        "integer arithmetic on cumulative ranks."
    ),
    "geo_grid_neighbor_pairs_ring": (
        "Boundary-complete spatial join: the 9-cell replication is an "
        "explode in the scan projection (map-side, no shuffle), the join is "
        "one hash exchange on the short (cell_lat, cell_lon) key, and the "
        "exact haversine filters inside the bucket."
    ),
    "psi_feature_drift": (
        "Drift monitoring at event volume: bucket + period flags are scan "
        "projections; the single exchange is the (type, bucket) groupBy "
        "with map-side partials — the PSI algebra runs on ≤ types×10 rows."
    ),
    "rolling_7day_active_users": (
        "Sliding-window COUNT DISTINCT via granularity reduction: events "
        "dedup to (day, user) in one map-side-combinable pass, each row "
        "replicates to ≤7 window ends by explode, and the final distinct "
        "count never touches raw events; the bounded day spine is an "
        "explicit broadcast."
    ),
    "topk_per_group_salted": (
        "Heavy-skew top-k: the (group, salt) window bounds any task's sort "
        "to 1/8 of the hottest group; the re-rank window runs over the "
        "k·salts survivors — two exchanges, no join, exact result."
    ),
    "geo_grid_neighbor_pairs_adaptive": (
        "Latitude-adaptive spatial join: the ring width is computed in the "
        "scan projection from the probe's own cell (inverse-haversine "
        "bound), the variable-length replication is a sequence+explode "
        "generator, and the join stays an equi hash join on the cell key."
    ),
    "stable_row_index": (
        "Distributed zipWithIndex: bucket id is a pure function of the key "
        "(quantile boundaries), so the count job and the index job agree by "
        "construction; one hash exchange on the bucket, per-partition sort, "
        "Arrow-batched offset add — no single-partition Sort, no Window."
    ),
    "ks_drift_test": (
        "Exact two-sample KS: the only full-data exchange is the map-side-"
        "combinable (type, quantized value) groupBy; both cumulative CDFs "
        "come from one ordered window over the bounded support."
    ),
    "mips_norm_bound_topk": (
        "Exact MIPS with Cauchy-Schwarz pruning: norms are scan "
        "projections; seeds (TakeOrdered 32), bounds, and queries are all "
        "broadcast — the corpus is scanned once and never shuffled."
    ),
    "triangle_count_degree_ordered": (
        "Degree-ordered triangle counting: orientation bounds out-degree at "
        "O(sqrt E); triangles come from array_intersect over out-neighbor "
        "lists — equi joins on node keys only, wedges never materialize as "
        "rows, and the oriented edge list is checkpointed once for its "
        "three consumers."
    ),
    "sorted_neighborhood_neardup": (
        "Sorted-neighborhood near-dup: ZERO join nodes — the doc_id "
        "identity window (unique_documents, r14: duplicate doc_ids made "
        "the (skey, doc_id) neighbor order non-total) feeds one window "
        "sort partitioned by the leading blocking byte that carries each "
        "doc's neighbor shingle sets via lead(); Jaccard is a JVM "
        "array_intersect per emitted pair, O(N\u00b7w) total."
    ),
    "weighted_median_per_group": (
        "Weighted median: granularity-reduce to (flag, price) cells with "
        "a partial-aggregated groupBy FIRST; the ordered cumulative-weight "
        "window runs on the bounded price support, never on raw rows."
    ),
    "semdedup_cluster_prune": (
        "SemDeDup: the k-row centroid table broadcasts for assignment "
        "(corpus never shuffles for it); the pairwise prune is an equi "
        "join on the cluster id, so comparisons stay within-cluster — "
        "never all-pairs across the corpus."
    ),
    "interdoc_dup_gram_fraction": (
        "Corpus-self duplicate grams: both exchanges key on the 16-byte "
        "md5 digest with map-side partial aggregation; raw text never "
        "shuffles.  The gram->doc-count relation is corpus-sized, so no "
        "broadcast — the honest two-pass shape of self-similarity."
    ),
    "entity_resolution_blocked_match": (
        "Entity resolution: (brand, type) blocking carries the candidate "
        "join as an equi join; scoring is map-side arithmetic and the "
        "best-match rank is a window inside block-bounded candidates — "
        "ordered by the ROUNDED score so float noise cannot flip winners."
    ),
    "semdedup_capped_cluster_prune": (
        "Capped SemDeDup: the hot-cluster mitigation as a plan — cluster "
        "sizes broadcast back (8 rows), the secondary md5 hash computes "
        "sub-cluster ids in the projection, and the prune joins on "
        "(cid, sub_id), so no task's pairwise work exceeds the cap "
        "regardless of cluster skew."
    ),
    "cdc_gear_chunking": (
        "Content-defined chunking with ZERO exchanges: the Gear rolling "
        "hash telescopes to an independent per-position window sum, so "
        "boundary detection, chunk fan-out (posexplode) and md5 "
        "fingerprints all sit in one map-side stage on the scan."
    ),
    "bpe_learn_merges": (
        "Distributed BPE training: the corpus collapses to the O(vocab) "
        "word-frequency aggregate once; each of the K=4 merge levels is "
        "a pair-count aggregate plus a 1-row TakeOrderedAndProject "
        "argmax broadcast into the symbol rewrite — no global sort, no "
        "corpus-sized broadcast."
    ),
    "entity_resolution_multipass_block": (
        "Multi-pass blocking ER: the dirty side broadcasts into BOTH "
        "blocking passes and the scoring join-back; the union's pair "
        "dedup is one (dirty, clean)-keyed exchange — recall from the "
        "union of block keys, cost still block-bounded."
    ),
    "pk_uniqueness_audit": (
        "Duplicate-pk detector: per table ONE pk-keyed count-distinct "
        "aggregate (partial/final, map-side combinable) feeding a 1-row "
        "rollup — no join, no window; ten column-complete scans, each "
        "read exactly once."
    ),
}


def main() -> None:
    reg = load_all_modules()
    spark = get_spark("plans", shuffle_partitions=8)
    sf_dir = "/root/testdata/sf0.001"
    out = [
        "# PLANS — physical plans of representative queries",
        "",
        "Generated by `scripts/gen_plans_md.py` (`.explain('formatted')` at "
        "sf0.001; plans are scale-invariant modulo AQE's runtime coalescing).",
        "",
    ]
    from glue_parquet_splitter_spark.plans import formatted_plan

    import re

    for name, why in SHOWCASE.items():
        plan = formatted_plan(reg[name].fn(spark, sf_dir)).strip()
        # plan_id is a session-global counter that drifts run-to-run
        # even with identical code — normalize it or the release
        # gate's regenerate-and-diff would false-fail.  Expression ids
        # (#885L) are likewise session-global allocations (ADVICE r8:
        # any extra import or AQE change shifts them all, false-failing
        # the gate confusingly) — normalize them too; no prose cites a
        # specific id, only column NAMES, which survive.
        plan = re.sub(r"plan_id=\d+", "plan_id=*", plan)
        plan = re.sub(r"#\d+", "#*", plan)
        if len(plan) > 4000:  # cut at a line boundary, mark the elision
            plan = plan[:4000].rsplit("\n", 1)[0] + "\n… (truncated)"
        out += [f"## {name}", "", why, "", "```", plan, "```", ""]
    with open("/root/repo/PLANS.md", "w") as f:
        f.write("\n".join(out))
    print("wrote PLANS.md")


if __name__ == "__main__":
    main()
