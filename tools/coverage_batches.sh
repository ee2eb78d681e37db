#!/bin/bash
# Round-9 sf10 coverage triage batches (VERDICT r08 #5): the 98 registry
# keys without a second-decade point, grouped by family. Shared-JVM
# triage per the round-8 protocol (one JVM per scale per batch); isolate
# only flags. Usage: bash tools/coverage_batches.sh <A|B|C|D|E|F>
set -e
case "$1" in
A) Q="q_sim_lsh_portable,q_sim_ivf_portable,q_sim_recall,q_sim_ivf_trained,q_embed_outlier,q_embed_centroid,q_dedup_embed,q_dedup_keep_best,q_udf_pandas,q_mix_rebalance,q_dedup_containment,q_decontaminate";;
B) Q="q_multimodal,q_multimodal_audio,q_multimodal_image,q_multimodal_frames,q_multimodal_resize,q_token_count,q_quality_score,q_lang_id,q_fingerprint,q_quality_gopher,q_quality_repetition,q_doclen_trim,q_chunk_split,q_token_zipf,q_term_freq,q_text_ngram_jaccard,q_fuzzy_match";;
C) Q="q_volume_shipping,q_returned_items,q_priority_waiting,q_small_qty_revenue,q_excess_supplier,q_ship_priority,q_promo_share,q_min_cost_supplier,q_supplier_cnt,q_disjunctive_pred,q_subquery_exists,q_subquery_not_exists,q_subquery_bigorders,q_subquery_idlerich";;
D) Q="q_join_semi,q_join_anti,q_join_outer,q_join_salted,q_join_fullouter,q_join_star,q_join_interval,q_groupby_count,q_agg_rollup,q_agg_cube,q_agg_approx,q_agg_groupsets,q_pivot,q_agg_percentile,q_agg_custdist,q_agg_topview,q_agg_concentration,q_agg_strings,q_grouping_id,q_agg_corr,q_pivot_sums,q_rollup_multigrain";;
E) Q="q_window_sliding,q_window_dist,q_window_nth,q_sessionize,q_rolling_active,q_sample_stratified,q_sample_hash,q_split_train,q_setops,q_distinct,q_scalar_string,q_scalar_date,q_scalar_math,q_scalar_json,q_scalar_regex,q_scalar_array,q_scalar_bitwise,q_scalar_null,q_explode_pos";;
F) Q="q_filter_msgtype,q_sink_roundtrip,q_map_project,q_map_concat,q_map_explode,q_cast_quarantine,q_source_scan,q_finality_filter,q_undo_drop,q_decode_props,q_topk_cursor,q_catalog_tables,q_catalog_columns,q_profile";;
*) echo "usage: $0 A|B|C|D|E|F" >&2; exit 2;;
esac
exec python tools/decade.py .scratch/sf1 .scratch/sf10 "$Q"
