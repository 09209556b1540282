"""Driver-window coverage aliases — round-8 rotation (VERDICT r7 #1).

The driver's per-round correctness sweep verifies the FIRST 50 registry
keys alphabetically. Key naming is the only lever the builder controls
over that window, so this module registers never-driver-verified keys a
second time under `a0_`-prefixed names that sort into the window. Each
alias is the SAME function object and the SAME oracle SQL as its
canonical key (asserted by tests/test_differential.py::test_alias_identity);
nothing is reimplemented, so a driver PASS on `a0_x` is a driver PASS on
the canonical implementation of `x`.

Round-8 rotation:
  * RETIRED: all 50 round-7 aliases — CORRECTNESS_r07 was 50/50 green,
    so every one of their canonical keys joined the ever-verified
    union (168/343 after r7). Canonical keys stay registered and
    locally verified; the union only grows.
  * ADDED, per the VERDICT r7 ordering (contract tier outranks the
    addendum): FIRST the 37 never-driver-verified SURVEY §2.B contract
    keys — the full q_win_*/q_stream_*/q_str_*/text/scan/project/
    union/UDF tail, including the two §2.B rows-only-by-design keys
    (q_agg_approx_distinct, stream_watermark_late), which get the
    driver's rows-only row, the strongest signal they can ever carry.
    THEN the 8 never-verified keys whose code or oracle changed THIS
    round (the ADVICE r7 guard/scale fixes: q_ml_brier, q_ml_confusion,
    q_ts_drawdown, q_ml_mutual_info, q_stats_anova; the lineage-
    truncated q_graph_label_prop and q_graph_link_predict's profile
    pass; q_dedup_recall_report's new fixed-panel oracle) — their prior
    local signal no longer covers the current code. THEN 5 from the
    prepared round-8 plan (4 heavy TPC-H tier keys + the time-travel
    source machinery).

Round-9 rotation (PREPARED, do not apply until CORRECTNESS_r08 lands):
retire every alias r8 reports green, then install this EXACT 50-key
window (priority order from SURVEY §2.D): the 18-key text block
(q_text_langid, q_text_ccnet_bucket, q_text_chunk, q_text_dup_spans,
q_text_entropy, q_text_feature_hash, q_text_fingerprint,
q_text_lang_confusion, q_text_line_dedup, q_text_ngram_lm,
q_text_novelty, q_text_oov, q_text_perplexity, q_text_pmi,
q_text_rarity, q_text_repetition, q_text_token_bpe,
q_text_vocab_coverage), the 16 remaining TPC-H keys (q3-q8, q10, q11,
q13-q16, q18, q19, q21, q22), the 11-key timeseries tail
(q_ts_concurrency, q_ts_decompose, q_ts_heatmap, q_ts_interpolate,
q_ts_lttb, q_ts_mk_trend, q_ts_peaks, q_ts_resample,
q_ts_transitions, q_ts_wow_growth, q_ts_zscore), the round-8 plan
change q_agg_weighted_median (broadcast-total re-hash), and 4 of the
round-8 additions (q_graph_modularity, q_win_sessionize,
q_text_readability, q_quality_ascii). The remaining ~84 keys queue
for rounds 10-11. Keep any r8 hash-fail aliases in place until they
pass. All candidates are green under the local driver protocol
(CHECKS_r9.md).
"""

from __future__ import annotations

from jsmr_spark.registry import register_alias

_ALIASED = (
    # ---- the 37 never-driver-verified SURVEY §2.B contract keys ----
    "q_scan_project",
    "q_scan_count",
    "q_scan_events_ts",
    "q_source_json",
    "q_project_arith",
    "q_project_case",
    "q_join_smj",
    "q_join_theta",
    "q_scalar_subq",
    "q_agg_approx_distinct",  # rows-only by declared design
    "q_win_percent",
    "q_win_lag_lead",
    "q_win_running",
    "q_win_moving",
    "q_win_first_last",
    "q_win_topk_group",
    "q_sort_multi",
    "q_topk",
    "q_union_all",
    "q_union_distinct",
    "q_str_funcs",
    "q_str_regexp",
    "q_str_split",
    "q_math_funcs",
    "q_stream_tumbling",
    "q_stream_sliding",
    "q_stream_session",
    "q_stream_dedup",
    "q_stream_funnel",
    "stream_watermark_late",  # rows-only by declared design
    "q_text_wordcount",
    "q_text_token_stats",
    "q_text_tfidf",
    "q_knn_label",
    "q_udf_scalar",
    "q_pandas_udf",
    "q_udtf",
    # ---- changed THIS round (ADVICE fixes / lineage truncation /
    # ---- new fixed-panel oracle) and never driver-verified ----
    "q_ml_brier",
    "q_ml_confusion",
    "q_ts_drawdown",
    "q_ml_mutual_info",
    "q_stats_anova",
    "q_graph_label_prop",
    "q_graph_link_predict",
    "q_dedup_recall_report",
    # ---- prepared round-8 plan: TPC-H tier + time-travel source ----
    "q_tpch_q2",
    "q_tpch_q9",
    "q_tpch_q17",
    "q_tpch_q20",
    "source_time_travel",
)

assert len(_ALIASED) == 50, len(_ALIASED)

for _canonical in _ALIASED:
    # strip the q_ prefix so e.g. q_pack_tokens -> a0_pack_tokens;
    # non-q keys keep their full name (a0_source_time_travel).
    _short = _canonical[2:] if _canonical.startswith("q_") else _canonical
    register_alias(f"a0_{_short}", _canonical)
