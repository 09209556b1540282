"""Driver-window coverage aliases — round-13 rotation (VERDICT r12 #4).

The driver's per-round correctness sweep verifies the FIRST 50 registry
keys alphabetically. Key naming is the only lever the builder controls
over that window, so this module registers keys a second time under
`a0_`-prefixed names that sort into the window. Each alias is the SAME
function object and the SAME oracle SQL as its canonical key (asserted
by tests/test_differential.py::test_alias_identity); nothing is
reimplemented, so a driver PASS on `a0_x` is a driver PASS on the
canonical implementation of `x`.

Round-13 rotation (selection rule in CHECKS_r13.md):
  * RETIRED: all 50 round-12 aliases — CORRECTNESS_r12 was 50/50
    hash-green, closing the ever-driver-verified union at 380/380
    (tools/union_report.py).
  * ADDED, touched-since-last-driver-signal first (oracle-carrying
    keys only — rows-only keys cannot hash-match by design and are
    covered by golden pins + tests; stated per VERDICT r12 #6):
    (a) 9 streaming keys whose replay machinery was rewritten in r12
        (§19 one-job staging + clamp floor) and re-staged in r13
        (RAM-backed scratch/checkpoints) with NO driver signal since —
        VERDICT r12 #4's explicit must;
    (b) 4 keys restructured in r13 (grouping-sets family pre-Expand
        aggregate; mr_join's parallel map phases);
    (c) 28 keys whose result expressions r12 restructured AFTER their
        most recent driver signal (staged r4/HOF folds, multi-quantile
        buffers, unpivoted subtrees, applyInArrow kernel, VARIANT
        parse, window-instead-of-join rewrites);
    (d) 4 keys with r12 plan-structure-only changes (node-identical
        parsed-expr trees, loop-job removal) + the r13 explicit
        StorageLevel pin on their shared shingle cache;
    (e) 5 oldest-signal slots continuing CHECKS_r12's rotation plan
        down the r5 alphabet (q_agg_minmax onward).
"""

from __future__ import annotations

from jsmr_spark.registry import register_alias

_ALIASED = (
    # ---- (a) streaming replay tier, rewritten r12 §19 + r13 scratch (9) ----
    "stream_cdc_apply",
    "stream_dedup_within_wm",
    "stream_ewma",
    "stream_exactly_once_sink",
    "stream_python_sink",
    "stream_python_source",
    "stream_rate_source",
    "stream_stateful_counter",
    "stream_stream_join",
    # ---- (b) r13 restructures (4) ----
    "q_agg_grouping_sets",
    "q_agg_rollup",
    "q_agg_cube",
    "q_mr_join",
    # ---- (c) r12 expression restructures after last signal (28) ----
    "q_json_funcs",
    "q_text_tfidf",
    "q_knn_label",
    "q_rank_fusion",
    "q_rank_mrr",
    "q_embed_normalize",
    "q_sim_ann_multiprobe",
    "q_sim_ann_tune",
    "q_sim_recall_report",
    "q_ann_mrl",
    "q_sim_ann_pq",
    "q_sim_threshold_pairs",
    "q_dedup_embedding",
    "q_dedup_clusters",
    "q_stats_bootstrap",
    "q_text_containment",
    "q_text_bm25",
    "q_ts_hampel",
    "q_agg_percentile",
    "q_sketch_quantile_check",
    "q_agg_winsorized",
    "q_quantile_bins",
    "q_stats_ttest",
    "q_array_funcs",
    "q_ts_acf",
    "q_dedup_band_tune",
    "q_ml_mutual_info",
    "q_ml_learning_curve",
    # ---- (d) r12 plan-structure changes + r13 StorageLevel pin (4) ----
    "q_graph_concomp",
    "q_dedup_minhash",
    "q_merge_dedup",
    "q_dedup_recall_report",
    # ---- (e) oldest-signal slots, r5 alphabet continuation (5) ----
    "q_agg_minmax",
    "q_agg_mode",
    "q_agg_multi_distinct",
    "q_agg_regr",
    "q_agg_skew_salted",
)

assert len(_ALIASED) == 50, len(_ALIASED)

for _canonical in _ALIASED:
    # strip the q_ prefix so e.g. q_join_inner -> a0_join_inner;
    # non-q keys keep their full name (a0_stream_cdc_apply).
    _short = _canonical[2:] if _canonical.startswith("q_") else _canonical
    register_alias(f"a0_{_short}", _canonical)
