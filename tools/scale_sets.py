"""Curated query sets for the sf1 / sf10 scale benches (BASELINE.md
Tables 4 and 5).

Selection rules:
  - span scans, joins, windows, aggregation, text, and the dedup
    flagship family (x02/x43/x43b added r7 per VERDICT r6 item 4 —
    second-decade growth evidence for the rolling-crawl operators);
  - EXCLUDE spec-oracle queries whose DuckDB side executes a quadratic
    specification (q55/q66/q66b everywhere — q15 alone carries that
    story in Table 4; x36/x36b additionally at sf10: 477 s+ oracles);
  - EXCLUDE the streaming twins (q41d/q41e — micro-batch floor, not
    plan cost; reported under streaming_s at sf0.1 only).

Regenerate (see .claude/skills/verify/SKILL.md):
  python tools/make_scale.py 10  /root/testdata/sf0.1 .bench_data/sf1
  python tools/make_scale.py 100 /root/testdata/sf0.1 .bench_data/sf10
  SPARK_GRAFT_SF_DIR=$PWD/.bench_data/sf1  BENCH_DETAIL_PATH=$PWD/BENCH_SF1.json \
      BENCH_DUCKDB=1 python bench.py $(python tools/scale_sets.py sf1)
  SPARK_GRAFT_SF_DIR=$PWD/.bench_data/sf10 BENCH_DETAIL_PATH=$PWD/BENCH_SF10.json \
      BENCH_DUCKDB=1 python bench.py $(python tools/scale_sets.py sf10)
"""

from __future__ import annotations

SF1 = [
    "q04_json_extract", "q09_filter_pruning", "q10_rowcount_profile",
    "q10b_profile", "q12_cascaded_lookup", "q14_mart_cte_cascade",
    "q15_fuzzy_lookup", "q17b_asof_join", "q18_hash_aggregate",
    "q21c_uniq_states", "q22_distinct", "q25b_cube",
    "q26b_approx_distinct", "q26c_percentiles",
    "q26e_weighted_percentiles", "q27_limit_by", "q28_running_sum",
    "q28h_moving_avg", "q42_similarity_topk", "q43_shipping_topk",
    "q44_regional_revenue", "q45_returned_items",
    "q46_correlated_subquery", "q47_lateral_topk", "q48_reconciliation",
    "q51_hierarchy_flatten", "q52_inferred_members",
    "q53_outliers_zscore", "q53b_outliers_iqr",
    "q53c_outliers_iqr_sketch", "q54_data_masking",
    "q56_cohort_retention", "q57_sessionize", "q58_period_over_period",
    "q59_date_dimension", "q60_skew_report", "q61_sequence_match",
    "q61b_sequence_count", "q62_retention", "q63_transitions",
    "q64_with_totals", "q65_topn_others",
    "x01_dedup_exact", "x02_dedup_minhash",
    "x07_text_tokens", "x08_text_quality", "x13_heavy_hitters",
    "x15b_concat_chunk_packing", "x17_pii_redaction",
    "x18_quality_filter", "x19_repetition_features",
    "x20_contamination_check", "x21_domain_mix", "x22_split_assignment",
    "x23_segment_dedup", "x24_boilerplate_removal", "x26_bm25_search",
    "x27_url_dedup", "x28_lm_score", "x29_stratified_exact_sample",
    "x30_semantic_clusters", "x32_weighted_sample", "x33_hybrid_rrf",
    "x34_semantic_dedup", "x35_normalize_text", "x36_dedup_canonical",
    "x37_sum_map", "x38_url_parts", "x39_curation_pipeline",
    "x40_standardize", "x41_jpeg_features", "x42_substring_dedup",
    "x43_incremental_dedup", "x43b_incremental_dedup_append",
]

SF10 = [
    "q09_filter_pruning", "q12_cascaded_lookup", "q14_mart_cte_cascade",
    "q17b_asof_join", "q18_hash_aggregate", "q22_distinct",
    "q26c_percentiles", "q28_running_sum", "q43_shipping_topk",
    "q44_regional_revenue", "q45_returned_items",
    "q46_correlated_subquery", "q47_lateral_topk", "q48_reconciliation",
    "q51_hierarchy_flatten", "q57_sessionize", "q62_retention",
    "q64_with_totals", "q65_topn_others",
    "x01_dedup_exact", "x02_dedup_minhash", "x08_text_quality",
    "x13_heavy_hitters", "x27_url_dedup", "x33_hybrid_rrf",
    "x34_semantic_dedup",     # r8: second-decade assignment evidence
    "x42_substring_dedup",
    "x43_incremental_dedup", "x43b_incremental_dedup_append",
]

if __name__ == "__main__":
    import sys

    which = sys.argv[1] if len(sys.argv) > 1 else "sf1"
    print(" ".join({"sf1": SF1, "sf10": SF10}[which]))
