"""Driver-evidence rotation table (VERDICT r05 asks #1/#6).

The round driver hash-checks the FIRST 50 keys of
``__spark_entry__.queries()`` against DuckDB each round (the
CORRECTNESS window). This module is the machine-readable schedule
that decides those 50 slots:

- POLICY. Window priority: (1) entries whose kernel or oracle changed
  since their newest driver row (mechanical since r08 via the roller's
  ``--changed`` input), (2) never-checked entries — net-new inventory
  is front-scheduled the round it registers, so no entry stays
  unchecked beyond 2 rounds, (3) once the backlog is empty,
  re-rotation of the oldest driver evidence. History: the
  never-checked backlog cleared on schedule — r06 ran as
  49 first-time checks + 1 re-check of a changed-this-round entry
  (ann_ivfpq_topk; CORRECTNESS_r06 50/50 green, recounted by
  tests/test_rotation_tool.py), r07 ran the 50 remaining
  never-checked entries (CORRECTNESS_r07 50/50 green, window exactly
  as scheduled).
- r08 was the close-out: the full never-checked backlog cleared
  (CORRECTNESS_r08 50/50 executed as scheduled — 48 hash-green + the
  2 rows-only entries in their documented shape), so cumulative
  driver coverage reached 264/264 and the table entered steady-state
  re-rotation. The executed r08 window is pinned against the
  CORRECTNESS files (not this table, which rolls on) in
  tests/test_rotation_tool.py::test_r08_window_matches_executed_roll.
- r10 (CURRENT_WINDOW below) continues steady state: the 45 net-new
  r10 registrations lead (batch 1: es_dsl_bucket_selector /
  bucket_script — the Kibana HAVING and derived-metric pipeline
  idioms; es_dsl_match_highlight — highlight inside the _search body
  over the scored top-k; es_dsl_multi_terms / auto_date_histogram —
  the two remaining everyday bucket kinds; es_cat_indices — the
  read-only index inventory verb; batch 2: es_dsl_rare_terms /
  date_range — the long-tail and calendar-period bucket kinds;
  es_dsl_serial_diff_moving_fn — the time-series smoothing pipelines;
  es_dsl_stats_bucket — the five-column sibling; batch 3:
  es_dsl_zero_fill_axis — min_doc_count 0 zero-filled date axes with
  extended_bounds, the explicit Kibana default; batch 4:
  es_dsl_function_score — field_value_factor popularity boosting on
  the BM25 path; es_dsl_top_metrics — the latest-reading-per-bucket
  metric via exact-decimal max_by/min_by; batch 5:
  es_dsl_terms_include_exclude — key-filter regex/list pushed below
  the aggregation; es_dsl_histogram_offset — offset-shifted numeric
  buckets; batch 6: es_dsl_regexp / terms_set — full-match regex and
  dynamic-msm term queries; es_dsl_simple_query_string /
  query_string — the Kibana search-bar mini-languages as real
  lexer+parser compilers (operators/es_querystring.py); each batch
  front-scheduled the round it registers (post-freeze rule), evicting
  the newest-evidence re-rotation tail (batch 6 returned the four r04
  stream_* entries to the pool — newest evidence, lowest staleness
  risk; batch 7 — es_dsl_string_stats_boxplot / rate / mad, the
  remaining everyday ES metric kinds (exact where ES approximates);
  batch 8 — es_dsl_normalize / bucket_sort / percentiles_bucket, the
  remaining order-free pipeline aggs; batch 9 —
  es_dsl_adjacency_matrix / sampler / diversified_sampler /
  significant_text, the remaining everyday bucket kinds; batch 10 —
  es_field_caps / terms_enum / search_template / scroll_page2, the
  remaining read-API verbs (field_caps differentials the two engines'
  independent schema->type rules; scroll_page2 proves the stateless
  cursor equals the from/size page); batch 11 — es_dsl_date_math,
  the Kibana time-picker range syntax with the ES per-operator
  rounding table (absolute anchors keep the driver check
  deterministic; `now` pins via es_datemath.set_now); batch 12 —
  es_dsl_cumulative_cardinality (exact first-occurrence formulation
  where ES chains HLL) and es_dsl_more_like_this (in-plan rare-term
  selection + idf-sum scoring); batch 13 — es_dsl_runtime_fields
  (Kibana runtime fields: emit() scripts over doc values as one
  projection CTE) and es_dsl_moving_percentiles (exact sliding-frame
  quantiles); batch 14 — es_dsl_match_bool_prefix (search-as-you-type)
  and es_dsl_pinned (promoted ids over organic BM25), plus the
  _explain / _cat/count / _cat/health HTTP verbs; batch 15 —
  es_dsl_histogram_zero_fill (the numeric sibling of the zero-filled
  date axis) and es_dsl_t_test (Welch's statistic from one scan);
  batch 16 — es_dsl_suggest_term / suggest_completion, the suggest
  API (spell correction and prefix autocomplete over the corpus
  vocabulary); batch 17 — es_termvectors, the per-document
  term-vector read verb; batch 18 — the function_score
  generalization (es_dsl_function_score_decay — gauss/exp/linear
  recency curves with compile-time-folded constants;
  es_dsl_function_score_functions — the filtered/weighted functions
  array with score_mode/max_boost; es_dsl_script_score — the
  Painless-lite custom-formula path reading doc fields + params +
  _score; es_dsl_random_score — the seeded md5-uniform deterministic
  shuffle); batch 19 — the static-signal ranking primitives
  (es_dsl_rank_feature — saturation/log/sigmoid/linear with explicit
  pivots; es_dsl_distance_feature — freshness/proximity over
  microsecond-exact epochs; es_dsl_combined_fields — term-centric
  BM25 over a merged synthetic field); batch 20 — positional
  proximity as ordinary predicates (es_dsl_intervals — gap-bounded
  interval matching; es_dsl_span_near — Lucene spans composed under
  bool); batch 21 — geo (es_dsl_geo_distance — haversine circles
  over the f_lat/f_lon point convention, runtime_mappings-derived;
  es_dsl_geotile_grid — Kibana map tiles with geo_centroid/geo_bounds
  metrics; % joins the Painless-lite grammar for the point
  derivation); batch 22 — parent-child (es_dsl_has_child /
  has_parent: the ES join field as a declared key-pair relation,
  compiled to aggregate-then-semi-join; composes inside bool);
  batch 23 — es_dsl_rescore (windowed precision pass), min_score,
  sliced scroll (md5-hash disjoint partitions), and matrix_stats
  (exact pairwise covariance/correlation via DECIMAL
  sums-of-products); batch 24 — the _pit and _reindex API verbs
  (es_pit_search: the stateless snapshot-assertion PIT; reindex runs
  source->sink through the bulk write path, API-tested); batch 25 —
  es_dsl_object_fields (dotted names as typed JSON extraction inside
  term/terms/range/exists — the property-bag filter idiom); batch
  26 — es_dsl_terms_lookup (allowed values from another document, a
  one-row broadcast semi-join), es_dsl_script_fields (the older
  computed-field API normalized into the runtime-mappings CTE), and
  docvalue_fields as a projection alias; batch 27 —
  es_dsl_phrase_slop (Lucene sloppy phrase, exact for two terms incl.
  the cost-2 transposition), es_dsl_field_boosts (caret syntax +
  match boost scaling before the combine, the Lucene order),
  es_dsl_geo_rings (geo_distance ring buckets over haversine), and
  the metric `missing` substitution; batch 28 —
  stream_percolate_alerts (the ES Watcher idiom: stored DSL rules
  percolated continuously over the event stream in ONE pass — rules
  add row-local expressions, never passes — windowed alert counts
  oracle-checked, per-rule totals pinned to batch evaluation);
  batch 29 — ES|QL (operators/esql.py: the modern piped query
  language at POST /_query — FROM | WHERE | EVAL | STATS BY | SORT |
  LIMIT | KEEP/DROP/RENAME compiled to one declarative statement in
  both dialects; esql_filter_stats / eval_keep / median_rename
  registered; batch 2 adds DATE_TRUNC/CASE/STARTS_WITH/SUBSTRING and
  the ES 8.18 LOOKUP JOIN — esql_date_case / lookup_join; batch 3
  adds GROK/DISSECT as NULL-guarded regexp_extract projections,
  MV_EXPAND, and RLIKE — esql_grok_extract / dissect / mv_expand;
  batch 4 adds INLINESTATS as window functions — esql_inlinestats);
  batch 31 — es_rank_eval_dcg (the _rank_eval API: scored requests vs
  human ratings, precision@k / MRR / DCG per request in one
  statement; HTTP route returns the ES details+mean envelope);
  batch 32 — es_dsl_scored_bool (QUERY CONTEXT for bool: full-text
  musts/shoulds score as the Lucene sum, filter/must_not gate
  membership at the join-back so corpus statistics stay unfiltered —
  the everyday ES search shape); batch 33 — es_dsl_suggest_phrase
  (the third suggester: whole-query "did you mean" via a bounded
  candidate lattice, unigram-LM + edit-penalty score) and
  case_insensitive on term/wildcard; batch 34 — es_dsl_fs_over_bool
  (function_score composed over the scored-bool shape — the full
  production relevance query). The
  r10 window filled at batch 19, so later-registered
  entries carry the r11 label (front-scheduled next round — within
  the policy's 2-round bound; meanwhile the in-repo sf0.01
  differential gate covers them every test run) — each batch returning
  more re-rotations to the pool (the window's whole re-rotation
  cohort shares r04 evidence, so eviction order among equals is
  immaterial))), then pure oldest-evidence
  re-rotation (no changed-kernel re-checks this round: the r10
  boundary diff rewrote no registered entry's compiled SQL — verified
  by an old-vs-new registry oracle diff before the roll; re-verified
  after each batch). The executed r09 window (22 net-new + 3
  re-checks + 25 re-rotations) is pinned against CORRECTNESS_r09.json
  in tests/test_rotation_tool.py::test_r09_window_matches_executed_roll.
  With a 331-entry registry and a 50-slot window, steady-state
  re-rotation bounds every entry's evidence age at ~6 rounds.
- r11 (CURRENT_WINDOW below): the mechanical roll
  (tools/roll_rotation.py r11 --changed ...) front-schedules, in
  policy order: the 15 net-new r11 registrations (es_alias_search —
  query-through-alias over the new _aliases registry; esql_percentile
  / date_format_diff / mv_stats / enrich / multi_index — the ES|QL
  function tier + the two source-side idioms; esql_stats_where —
  per-aggregate WHERE filters; esql_sort_nulls — the explicit ES
  null-is-largest sort rule, which also pinned the engines' OPPOSITE
  bare-`ORDER BY` null defaults; esql_scalar_functions /
  mv_transforms / row_source — the portable scalar-function tier,
  the MV transform trio with pinned order/NULL semantics, and the
  ROW inline relation; es_mtermvectors — the multi-doc term-vector
  verb as ONE id-pushdown statement; esql_from_metadata — METADATA
  _index over single and multi-index FROM; esql_date_extract_locate —
  DATE_EXTRACT/LOCATE/ENDS_WITH; esql_bucket — BUCKET time spans +
  nice-width numeric buckets), the 3 changed-kernel
  re-checks from
  the round-boundary oracle diff (es_dsl_matrix_stats — product
  operands now dialect-exact DECIMAL(18/19,6) after the ADVICE r10
  precision-overflow fix; es_dsl_terms_lookup — the lookup id column
  is now alias-qualified; es_dsl_terms_set — literal-order
  determinism fix: set() -> dict.fromkeys), then the whole remaining
  never-checked backlog (31 entries: the r10 post-batch-19
  registrations — their compiled SORT clauses also changed this round
  when the explicit null ordering landed, so their first driver check
  runs against the current kernel), then 1 oldest-evidence (r04)
  re-rotations. The backlog is EMPTY after this window — every
  registered entry has been driver-scheduled within 2 rounds of
  registration, the docstring's own policy bound.
  DOCUMENTED DEVIATION from priority rule (1): the r11 explicit
  null-ordering rewrite (sort missing=_last) textually changed 27
  compiled kernels; 15 of them carry r08-r10 driver evidence, and
  front-scheduling those re-checks would have evicted 12 never-checked
  entries past the round the judge's r10 ask #2 pinned. The re-checks
  yield to the backlog because the change is PROVEN inert on the
  checked data: the round-boundary oracle diff shows the ONLY textual
  difference is the ` NULLS FIRST|LAST` suffix (plus the null-
  reachability branch in search_after's predicate), fixture sort keys
  are non-null, and the full 383-entry sf0.01 differential is green on
  the new text. The 15 (bool_filter, collapse, date_math,
  dis_max_boosting, fuzzy, match_bool_prefix, match_phrase_prefix,
  query_string, regexp, search_after, should_msm, simple_query_string,
  terms_set*, scroll_page2, search_template; *terms_set is in-window
  anyway for its literal-order fix) MUST be passed as --changed to the
  r12 roll.
- r12 (CURRENT_WINDOW below): with the backlog empty, the roll
  (tools/roll_rotation.py r12 --changed ...) front-schedules the 18
  changed-kernel re-checks — the 15 kernels the r11 explicit
  null-ordering rewrite touched (the r11 docstring's MUST-pass list:
  es_dsl_bool_filter/collapse/date_math/dis_max_boosting/fuzzy/
  match_bool_prefix/match_phrase_prefix/query_string/regexp/
  search_after/should_msm/simple_query_string/terms_set +
  es_scroll_page2/es_search_template) plus the 3 r12-boundary oracle
  changes (es_termvectors / es_mtermvectors — empty-token filter +
  found-is-existence, ADVICE r11; agg_approx_sketches — rewritten
  from rows-only to the in-plan error-bound oracle, VERDICT r11 ask
  #4), then the 9 net-new r12 registrations (es_alias_multi_search /
  es_multi_index_search — multi-target alias and comma/wildcard
  search through the UNION-ALL machinery; esql_sample /
  esql_change_point — the deterministic documented deviations;
  esql_fork — branch-and-concatenate; esql_top_values_wavg — the
  TOP/VALUES/WEIGHTED_AVG aggregate tier; esql_math_hash_functions —
  the trig/log/hash scalar tier; es_dsl_post_filter /
  es_dsl_source_filtering — the Kibana facet idiom and the _source
  object form), then 23 pure oldest-evidence re-rotations from
  the r04 tier — the 23 the roller's alphabetical-within-age order
  actually admitted after the 27 front-scheduled slots: dedup_exact
  / dedup_minhash_lsh / dedup_semantic_survivors / dedup_simhash,
  embedding_label_centroids, events_cohort_retention / events_funnel
  / events_sessionization, multimodal_binary_features /
  multimodal_frame_sample / multimodal_resize_pooled,
  pipeline_curate_corpus, and the TPC-H tail q2/q4/q7/q11/q13/q15/
  q16/q17/q18/q20/q21 (VERDICT r11 ask #1 PARTIALLY delivered: the
  stream_* family, text_*, search_bm25, set_*, win_* and the rest of
  the r04/r05 tier — 66 entries — did NOT fit behind the changed/
  net-new front-load and stayed unscheduled; corrected per ADVICE
  r12, and drained by the r13 window below). The
  changed set was derived MECHANICALLY: an old-vs-new oracle dump
  diff at the r11 boundary commit (82ea86e) showed exactly
  es_termvectors + es_mtermvectors changed and the 5 added/upgraded;
  the r11 15 carry per that round's documented deviation note.
- r13 (CURRENT_WINDOW below): the stale-tier-drain round (VERDICT
  r12 ask #1). NOTHING net-new registered. The roll
  (tools/roll_rotation.py r13 --changed ...) front-schedules only
  the 5 changed-kernel re-checks — the mechanical oracle dump diff
  at the r12 boundary commit (ba71324) showed exactly
  es_alias_multi_search + es_multi_index_search (the _uid
  whole-row-hash fix, ADVICE r12 medium) and esql_change_point (the
  enforced aggregated-series contract) changed plus
  text_compression_ratio added (the zlib-bound envelope);
  es_alias_search is carried by hand because its resolve path moved
  to the session-scoped alias registry (VERDICT r12 ask #4) even
  though its oracle text is unchanged — then 45 pure oldest-evidence
  re-rotations that drain the ENTIRE r04 tier (the stream_* family,
  search_bm25, text_fingerprint/lang_id/quality_score/repetition/
  token_count/unigram_logprob, tokens_top_terms, sample_stratified,
  q8/q9) and 27 of the 48-entry r05 tier (agg_* core, cast/date/
  math/array/conditional function tiers, dedup_components/keep_best/
  ngram_jaccard/normalized/span_coverage, ann_pq_topk,
  multimodal_decode_audio/image, join_right_outer, pivot_conditional,
  indexer_positional_ids, doc_chunk_windows, doc_embedding_hashed,
  events_anomaly_zscore). COUNTED REMAINDER for r14 (21 entries, all
  r05): recursive_date_spine, retrieval_training_triplets,
  sample_temperature_mix, search_tfidf_cosine_topk, set_except,
  set_intersect, set_union_all, set_union_distinct,
  sort_limit_offset, str_functions, stream_static_enrich,
  subquery_derived_table, subquery_not_in, text_bigram_logprob,
  values_inline_table, variant_json_bucket, win_lead_lag, win_ntile,
  win_rank_dense, win_running_sum, win_topk_per_group — these 21
  MUST lead the r14 window (pure oldest-evidence order already puts
  them there); until then they are covered by the in-repo sf0.01
  differential gate plus an r13 in-session sf0.1 sweep recorded in
  SCALE.md par.3.
- ROWS-ONLY tier: EMPTY since r13. agg_approx_sketches left it in
  r12 (VERDICT r11 ask #4) and text_compression_ratio left it in r13
  (VERDICT r12 ask #3): both now emit exact tiers plus in-plan
  invariant booleans (error bounds / zlib size bounds) the DuckDB
  oracle predicts as constants, so every one of the registry's
  entries carries a full hash oracle. Historical note for reading
  old CORRECTNESS files: ``err: "no_oracle"`` with
  ``spark_rows > 0`` was the harness's NOTATION for "no oracle
  supplied", not a failure (VERDICT r07 ask #2).
- Out-of-window entries keep regression coverage via the in-repo
  sf0.01 differential gate (tests/test_oracle_queries.py) and the
  recorded sf0.1 spot differentials (SCALE.md par.3).
"""

from __future__ import annotations

# name -> (newest driver-green CORRECTNESS round or None,
#          divergence-risk class, scheduled window or None)
ROTATION: dict[str, tuple[int | None, str, str | None]] = {
    'agg_approx_sketches': (12, 'integer-exact', None),
    'agg_count_distinct': (13, 'verified', None),
    'agg_cube': (13, 'verified', None),
    'agg_filtered': (13, 'verified', None),
    'agg_group_by_all': (8, 'integer-exact', None),
    'agg_group_concat': (13, 'verified', None),
    'agg_grouping_sets': (13, 'verified', None),
    'agg_having': (13, 'verified', None),
    'agg_percentile': (13, 'verified', None),
    'agg_rollup': (8, 'verified', None),
    'agg_stats': (13, 'verified', None),
    'ann_brute_force_topk': (9, 'verified', None),
    'ann_ivf_recall_eval': (8, 'float-stat', 'r14'),
    'ann_ivf_topk': (8, 'verified', 'r14'),
    'ann_ivfpq_topk': (6, 'verified', 'r14'),
    'ann_lsh_bucket_topk': (9, 'verified', None),
    'ann_lsh_recall_eval': (7, 'float-stat', None),
    'ann_pq_from_artifact': (6, 'verified', 'r14'),
    'ann_pq_topk': (13, 'verified', 'r14'),
    'ann_range_search': (6, 'float-stat', None),
    'array_map_struct_functions': (13, 'verified', None),
    'asof_join_events_orders': (9, 'verified', None),
    'audit_expectations': (7, 'integer-exact', None),
    'audit_referential_integrity': (8, 'integer-exact', None),
    'basket_part_affinity': (8, 'verified', None),
    'cast_types': (13, 'verified', None),
    'conditional_case': (13, 'verified', None),
    'corpus_novelty_curve': (7, 'integer-exact', None),
    'corpus_signal_correlations': (6, 'float-stat', None),
    'corpus_source_divergence': (6, 'float-stat', None),
    'corpus_source_overlap': (6, 'float-stat', None),
    'corpus_source_stats': (9, 'verified', None),
    'corpus_zipf_fit': (6, 'float-stat', None),
    'customer_rfm_segments': (7, 'integer-exact', None),
    'customers_abc_pareto': (7, 'integer-exact', None),
    'customers_gini_by_nation': (6, 'float-stat', None),
    'date_functions': (13, 'verified', None),
    'decontam_benchmark_overlap': (11, 'verified', None),
    'dedup_audio_fingerprint': (7, 'integer-exact', None),
    'dedup_cluster_size_stats': (7, 'integer-exact', None),
    'dedup_components': (13, 'verified', 'r14'),
    'dedup_containment': (7, 'integer-exact', 'r14'),
    'dedup_exact': (12, 'verified', None),
    'dedup_image_phash': (7, 'integer-exact', None),
    'dedup_incremental_batch': (7, 'integer-exact', 'r14'),
    'dedup_keep_best': (13, 'verified', None),
    'dedup_lsh_bucket_stats': (7, 'integer-exact', None),
    'dedup_minhash_estimate_eval': (6, 'float-stat', None),
    'dedup_minhash_lsh': (12, 'verified', None),
    'dedup_modality_agreement': (7, 'integer-exact', None),
    'dedup_ngram_jaccard': (13, 'verified', 'r14'),
    'dedup_normalized': (13, 'verified', None),
    'dedup_prefix_filter_jaccard': (7, 'integer-exact', 'r14'),
    'dedup_remap_to_canonical': (7, 'integer-exact', None),
    'dedup_semantic_survivors': (12, 'verified', None),
    'dedup_simhash': (12, 'verified', None),
    'dedup_simhash_pairs': (7, 'integer-exact', 'r14'),
    'dedup_span_coverage': (13, 'verified', None),
    'dedup_split_leakage': (7, 'integer-exact', 'r14'),
    'dedup_threshold_sensitivity': (6, 'float-stat', None),
    'doc_chunk_windows': (13, 'verified', None),
    'doc_embedding_hashed': (13, 'verified', None),
    'docs_quality_percentile_filter': (7, 'integer-exact', None),
    'embedding_cluster_purity': (6, 'float-stat', None),
    'embedding_knn_eval': (6, 'float-stat', None),
    'embedding_label_centroids': (12, 'verified', None),
    'embedding_matryoshka_recall': (6, 'float-stat', None),
    'embedding_medoid_per_label': (6, 'float-stat', None),
    'embedding_neardup_pairs': (8, 'verified', None),
    'embedding_outlier_scores': (6, 'float-stat', None),
    'embedding_pca_top_component': (6, 'float-stat', None),
    'embedding_quantize_int8': (8, 'verified', None),
    'embedding_remove_top_component': (6, 'float-stat', None),
    'es_alias_multi_search': (13, 'unclassified', None),
    'es_alias_search': (13, 'unclassified', None),
    'es_cat_indices': (10, 'unclassified', None),
    'es_dsl_adjacency_matrix': (10, 'unclassified', None),
    'es_dsl_auto_date_histogram': (10, 'unclassified', None),
    'es_dsl_bool_filter': (12, 'unclassified', None),
    'es_dsl_bucket_script': (10, 'unclassified', None),
    'es_dsl_bucket_selector': (10, 'unclassified', None),
    'es_dsl_bucket_sort': (10, 'unclassified', None),
    'es_dsl_collapse': (12, 'unclassified', None),
    'es_dsl_combined_fields': (11, 'unclassified', None),
    'es_dsl_composite_after': (9, 'unclassified', None),
    'es_dsl_count': (9, 'unclassified', None),
    'es_dsl_cumulative_cardinality': (10, 'unclassified', None),
    'es_dsl_date_histogram': (9, 'unclassified', None),
    'es_dsl_date_math': (12, 'unclassified', None),
    'es_dsl_date_range': (10, 'unclassified', None),
    'es_dsl_dis_max_boosting': (12, 'unclassified', None),
    'es_dsl_distance_feature': (10, 'unclassified', None),
    'es_dsl_diversified_sampler': (10, 'unclassified', None),
    'es_dsl_extended_stats': (9, 'unclassified', None),
    'es_dsl_field_boosts': (11, 'unclassified', None),
    'es_dsl_filter_agg': (9, 'unclassified', None),
    'es_dsl_filters_agg': (9, 'unclassified', None),
    'es_dsl_fixed_interval': (9, 'unclassified', None),
    'es_dsl_fs_over_bool': (11, 'unclassified', None),
    'es_dsl_function_score': (10, 'unclassified', None),
    'es_dsl_function_score_decay': (10, 'unclassified', None),
    'es_dsl_function_score_functions': (10, 'unclassified', None),
    'es_dsl_fuzzy': (12, 'unclassified', None),
    'es_dsl_geo_distance': (11, 'unclassified', None),
    'es_dsl_geo_rings': (11, 'unclassified', None),
    'es_dsl_geotile_grid': (11, 'unclassified', None),
    'es_dsl_global_agg': (9, 'unclassified', None),
    'es_dsl_has_child': (11, 'unclassified', None),
    'es_dsl_has_parent': (11, 'unclassified', None),
    'es_dsl_histogram_offset': (10, 'unclassified', None),
    'es_dsl_histogram_zero_fill': (10, 'unclassified', None),
    'es_dsl_intervals': (11, 'unclassified', None),
    'es_dsl_knn': (8, 'unclassified', None),
    'es_dsl_mad': (10, 'unclassified', None),
    'es_dsl_match_and_scored': (9, 'unclassified', None),
    'es_dsl_match_bool_prefix': (12, 'unclassified', None),
    'es_dsl_match_highlight': (10, 'unclassified', None),
    'es_dsl_match_phrase_prefix': (12, 'unclassified', None),
    'es_dsl_match_scored': (9, 'unclassified', None),
    'es_dsl_matrix_stats': (11, 'unclassified', None),
    'es_dsl_min_score': (11, 'unclassified', None),
    'es_dsl_more_like_this': (10, 'unclassified', None),
    'es_dsl_moving_percentiles': (10, 'unclassified', None),
    'es_dsl_multi_match': (9, 'unclassified', None),
    'es_dsl_multi_terms': (10, 'unclassified', None),
    'es_dsl_nested_agg': (9, 'unclassified', None),
    'es_dsl_nested_three_levels': (9, 'unclassified', None),
    'es_dsl_normalize': (10, 'unclassified', None),
    'es_dsl_object_fields': (11, 'unclassified', None),
    'es_dsl_percentile_ranks_wavg': (9, 'unclassified', None),
    'es_dsl_percentiles': (9, 'unclassified', None),
    'es_dsl_percentiles_bucket': (10, 'unclassified', None),
    'es_dsl_percolate': (8, 'unclassified', None),
    'es_dsl_phrase_slop': (11, 'unclassified', None),
    'es_dsl_pinned': (10, 'unclassified', None),
    'es_dsl_pipeline_cumsum': (9, 'unclassified', None),
    'es_dsl_post_filter': (12, 'unclassified', None),
    'es_dsl_query_string': (12, 'unclassified', None),
    'es_dsl_random_score': (11, 'unclassified', None),
    'es_dsl_range_agg': (8, 'unclassified', None),
    'es_dsl_rank_feature': (10, 'unclassified', None),
    'es_dsl_rare_terms': (10, 'unclassified', None),
    'es_dsl_rate': (10, 'unclassified', None),
    'es_dsl_regexp': (12, 'unclassified', None),
    'es_dsl_rescore': (11, 'unclassified', None),
    'es_dsl_runtime_fields': (10, 'unclassified', None),
    'es_dsl_sampler': (10, 'unclassified', None),
    'es_dsl_scored_bool': (11, 'unclassified', None),
    'es_dsl_script_fields': (11, 'unclassified', None),
    'es_dsl_script_score': (10, 'unclassified', None),
    'es_dsl_search_after': (12, 'unclassified', None),
    'es_dsl_serial_diff_moving_fn': (10, 'unclassified', None),
    'es_dsl_should_msm': (12, 'unclassified', None),
    'es_dsl_sibling_pipeline': (9, 'unclassified', None),
    'es_dsl_significant_terms': (8, 'unclassified', None),
    'es_dsl_significant_text': (10, 'unclassified', None),
    'es_dsl_simple_query_string': (12, 'unclassified', None),
    'es_dsl_sliced_scroll': (11, 'unclassified', None),
    'es_dsl_source_filtering': (12, 'unclassified', None),
    'es_dsl_span_near': (11, 'unclassified', None),
    'es_dsl_stats_bucket': (10, 'unclassified', None),
    'es_dsl_string_stats_boxplot': (10, 'unclassified', None),
    'es_dsl_suggest_completion': (10, 'unclassified', None),
    'es_dsl_suggest_phrase': (11, 'unclassified', None),
    'es_dsl_suggest_term': (10, 'unclassified', None),
    'es_dsl_t_test': (10, 'unclassified', None),
    'es_dsl_terms_agg': (9, 'unclassified', None),
    'es_dsl_terms_include_exclude': (10, 'unclassified', None),
    'es_dsl_terms_lookup': (11, 'unclassified', None),
    'es_dsl_terms_order_metric': (9, 'unclassified', None),
    'es_dsl_terms_set': (12, 'unclassified', None),
    'es_dsl_top_hits': (9, 'unclassified', None),
    'es_dsl_top_metrics': (10, 'unclassified', None),
    'es_dsl_zero_fill_axis': (10, 'unclassified', None),
    'es_field_caps': (10, 'unclassified', None),
    'es_mtermvectors': (12, 'unclassified', None),
    'es_multi_index_search': (13, 'unclassified', None),
    'es_pit_search': (11, 'unclassified', None),
    'es_rank_eval_dcg': (11, 'unclassified', None),
    'es_scroll_page2': (12, 'unclassified', None),
    'es_search_template': (12, 'unclassified', None),
    'es_terms_enum': (10, 'unclassified', None),
    'es_termvectors': (12, 'unclassified', None),
    'esql_bucket': (11, 'unclassified', None),
    'esql_change_point': (13, 'unclassified', None),
    'esql_date_case': (11, 'unclassified', None),
    'esql_date_extract_locate': (11, 'unclassified', None),
    'esql_date_format_diff': (11, 'unclassified', None),
    'esql_dissect': (11, 'unclassified', None),
    'esql_enrich': (11, 'unclassified', None),
    'esql_eval_keep': (11, 'unclassified', None),
    'esql_filter_stats': (11, 'unclassified', None),
    'esql_fork': (12, 'unclassified', None),
    'esql_from_metadata': (11, 'unclassified', None),
    'esql_grok_extract': (11, 'unclassified', None),
    'esql_inlinestats': (11, 'unclassified', None),
    'esql_lookup_join': (11, 'unclassified', None),
    'esql_math_hash_functions': (12, 'unclassified', None),
    'esql_median_rename': (11, 'unclassified', None),
    'esql_multi_index': (11, 'unclassified', None),
    'esql_mv_expand': (11, 'unclassified', None),
    'esql_mv_stats': (11, 'unclassified', None),
    'esql_mv_transforms': (11, 'unclassified', None),
    'esql_percentile': (11, 'unclassified', None),
    'esql_row_source': (11, 'unclassified', None),
    'esql_sample': (12, 'unclassified', None),
    'esql_scalar_functions': (11, 'unclassified', None),
    'esql_sort_nulls': (11, 'unclassified', None),
    'esql_stats_where': (11, 'unclassified', None),
    'esql_top_values_wavg': (12, 'unclassified', None),
    'events_anomaly_seasonal': (6, 'float-stat', None),
    'events_anomaly_zscore': (13, 'verified', None),
    'events_attribution_last_touch': (7, 'integer-exact', None),
    'events_attribution_position': (7, 'regex-string', None),
    'events_bot_detection': (6, 'verified', None),
    'events_chi_square': (6, 'float-stat', None),
    'events_cohort_retention': (12, 'verified', None),
    'events_ewma_daily': (6, 'float-stat', None),
    'events_funnel': (12, 'verified', None),
    'events_funnel_latency': (7, 'integer-exact', None),
    'events_funnel_one_pass': (7, 'integer-exact', None),
    'events_gapfill_forward': (7, 'integer-exact', None),
    'events_hourly_autocorr': (6, 'float-stat', None),
    'events_ks_test': (6, 'float-stat', None),
    'events_load_heatmap': (7, 'integer-exact', None),
    'events_mannwhitney_u': (6, 'float-stat', None),
    'events_markov_transitions': (7, 'integer-exact', None),
    'events_new_vs_returning': (7, 'integer-exact', None),
    'events_pattern_match': (6, 'regex-string', None),
    'events_rolling_active_users': (7, 'integer-exact', None),
    'events_rollup_multires': (7, 'integer-exact', None),
    'events_session_window_native': (7, 'integer-exact', None),
    'events_sessionization': (12, 'verified', None),
    'events_state_intervals': (7, 'integer-exact', None),
    'events_stickiness': (7, 'integer-exact', None),
    'events_survival_km': (6, 'float-stat', None),
    'events_time_bucket': (8, 'verified', None),
    'events_top_paths': (7, 'regex-string', None),
    'events_value_boxplot': (7, 'integer-exact', None),
    'events_welch_ttest': (6, 'float-stat', None),
    'filter_in_between_like': (8, 'verified', None),
    'filter_null_handling': (8, 'verified', None),
    'filter_null_safe_eq': (8, 'verified', None),
    'filter_regexp': (8, 'verified', None),
    'functions_try_safe': (7, 'integer-exact', None),
    'graph_copurchase_hops': (6, 'verified', 'r14'),
    'graph_copurchase_triangles': (6, 'verified', None),
    'graph_pagerank_nations': (6, 'float-stat', 'r14'),
    'indexer_positional_ids': (13, 'verified', None),
    'join_anti_not_exists': (8, 'verified', None),
    'join_bloom_prefilter': (7, 'integer-exact', 'r14'),
    'join_cross': (8, 'verified', None),
    'join_full_outer': (8, 'verified', None),
    'join_lateral_topk': (8, 'verified', None),
    'join_left_outer': (8, 'verified', None),
    'join_natural': (8, 'verified', None),
    'join_non_equi_theta': (8, 'verified', None),
    'join_right_outer': (13, 'verified', None),
    'join_semi_exists': (8, 'verified', None),
    'join_using': (8, 'verified', None),
    'json_functions': (8, 'verified', None),
    'layout_zorder_orders': (7, 'integer-exact', None),
    'math_functions': (13, 'verified', None),
    'multimodal_binary_features': (12, 'verified', None),
    'multimodal_decode_audio': (13, 'verified', None),
    'multimodal_decode_bmp': (7, 'integer-exact', None),
    'multimodal_decode_gif': (8, 'unclassified', None),
    'multimodal_decode_image': (13, 'verified', None),
    'multimodal_decode_jpeg': (9, 'unclassified', None),
    'multimodal_decode_png': (8, 'unclassified', None),
    'multimodal_decode_tiff': (8, 'unclassified', None),
    'multimodal_docx_extract_text': (8, 'unclassified', None),
    'multimodal_frame_sample': (12, 'verified', None),
    'multimodal_gif_frames': (8, 'unclassified', None),
    'multimodal_html_extract_text': (8, 'unclassified', None),
    'multimodal_pdf_extract_text': (8, 'unclassified', None),
    'multimodal_resize_pooled': (12, 'verified', None),
    'multimodal_xlsx_extract_cells': (8, 'unclassified', None),
    'orders_benford_digits': (7, 'integer-exact', None),
    'orders_monthly_yoy': (7, 'integer-exact', None),
    'orders_open_interval_sweep': (7, 'integer-exact', None),
    'orders_regression_trend': (6, 'float-stat', None),
    'orders_revenue_concentration': (7, 'integer-exact', None),
    'pack_sequences_chunked': (8, 'verified', None),
    'pipeline_curate_corpus': (12, 'verified', None),
    'pipeline_curation_report': (7, 'integer-exact', None),
    'pipeline_incremental_rollup': (7, 'integer-exact', None),
    'pivot_conditional': (13, 'verified', None),
    'profile_orders': (8, 'integer-exact', None),
    'proj_distinct': (8, 'verified', None),
    'q10_returned_items': (8, 'verified', None),
    'q11_important_values': (12, 'verified', None),
    'q12_priority_shipping': (9, 'verified', None),
    'q13_customer_distribution': (12, 'verified', None),
    'q14_promo_revenue': (9, 'verified', None),
    'q15_top_supplier': (12, 'verified', None),
    'q16_supplier_part_counts': (12, 'verified', None),
    'q17_small_quantity_revenue': (12, 'verified', None),
    'q18_large_orders': (12, 'verified', None),
    'q19_disjunctive_predicates': (9, 'verified', None),
    'q1_pricing_summary': (9, 'verified', None),
    'q20_excess_suppliers': (12, 'verified', None),
    'q21_waiting_suppliers': (12, 'verified', None),
    'q22_dormant_customers': (9, 'verified', None),
    'q2_min_cost_supplier': (12, 'verified', None),
    'q3_shipping_priority': (9, 'verified', None),
    'q4_order_priority': (12, 'verified', None),
    'q5_local_supplier_volume': (9, 'verified', None),
    'q6_forecast_revenue': (9, 'verified', None),
    'q7_volume_shipping': (12, 'verified', None),
    'q8_market_share': (13, 'verified', None),
    'q9_product_type_profit': (13, 'verified', None),
    'quality_classifier_calibration': (6, 'float-stat', None),
    'quality_classifier_train': (6, 'float-stat', None),
    'recursive_date_spine': (5, 'verified', 'r14'),
    'retrieval_training_triplets': (5, 'verified', 'r14'),
    'sample_curriculum_order': (6, 'float-stat', None),
    'sample_dsir_importance': (6, 'float-stat', 'r14'),
    'sample_neyman_allocation': (6, 'float-stat', None),
    'sample_stratified': (13, 'verified', None),
    'sample_temperature_mix': (5, 'verified', 'r14'),
    'sample_token_budget': (6, 'float-stat', None),
    'sample_weighted_mix': (9, 'verified', None),
    'sample_weighted_reservoir': (6, 'float-stat', None),
    'search_bm25': (13, 'verified', None),
    'search_bm25_from_artifact': (8, 'unclassified', None),
    'search_fuzzy_terms': (6, 'regex-string', None),
    'search_highlight_snippets': (8, 'unclassified', None),
    'search_hybrid_rrf': (9, 'verified', None),
    'search_mmr_rerank': (6, 'verified', None),
    'search_phrase_match': (7, 'regex-string', None),
    'search_tfidf_cosine_topk': (5, 'verified', 'r14'),
    'set_except': (5, 'verified', 'r14'),
    'set_except_all': (9, 'verified', None),
    'set_intersect': (5, 'verified', 'r14'),
    'set_union_all': (5, 'verified', 'r14'),
    'set_union_distinct': (5, 'verified', 'r14'),
    'sketch_cms_heavy_hitters': (6, 'float-stat', None),
    'sketch_histogram_quantiles': (6, 'float-stat', 'r14'),
    'sketch_hll_daily_merged': (6, 'float-stat', None),
    'sketch_hll_distinct_users': (6, 'float-stat', None),
    'skew_salted_join_agg': (8, 'integer-exact', None),
    'sort_limit_offset': (5, 'verified', 'r14'),
    'sort_nulls_ordering': (7, 'integer-exact', None),
    'split_train_val_test': (9, 'verified', None),
    'str_functions': (5, 'verified', 'r14'),
    'stream_dedup_counts': (13, 'verified', 'r14'),
    'stream_dedup_within_watermark': (13, 'verified', 'r14'),
    'stream_docs_incremental_dedup': (7, 'integer-exact', 'r14'),
    'stream_hll_daily_merged': (7, 'integer-exact', 'r14'),
    'stream_percolate_alerts': (11, 'unclassified', 'r14'),
    'stream_session_counts': (13, 'verified', 'r14'),
    'stream_sliding_counts': (13, 'verified', 'r14'),
    'stream_stateful_user_summary': (13, 'verified', 'r14'),
    'stream_static_enrich': (5, 'verified', 'r14'),
    'stream_tumbling_counts': (13, 'verified', 'r14'),
    'stream_view_click_join': (13, 'verified', 'r14'),
    'stream_view_click_left_outer': (7, 'integer-exact', 'r14'),
    'subquery_correlated_scalar': (9, 'verified', None),
    'subquery_derived_table': (5, 'verified', 'r14'),
    'subquery_in': (9, 'verified', None),
    'subquery_not_in': (5, 'verified', 'r14'),
    'subquery_scalar': (9, 'verified', None),
    'text_bigram_logprob': (5, 'verified', 'r14'),
    'text_compression_ratio': (13, 'rows-only', None),
    'text_fingerprint': (13, 'verified', None),
    'text_keywords_textrank': (7, 'integer-exact', None),
    'text_lang_confusion': (6, 'float-stat', None),
    'text_lang_id': (13, 'verified', None),
    'text_pii_redact': (6, 'regex-string', None),
    'text_quality_classifier': (6, 'float-stat', None),
    'text_quality_score': (13, 'verified', None),
    'text_repetition': (13, 'verified', None),
    'text_token_count': (13, 'verified', None),
    'text_unigram_logprob': (13, 'verified', None),
    'tokens_bigrams_udtf': (6, 'verified', None),
    'tokens_bpe_merge_learn': (6, 'float-stat', 'r14'),
    'tokens_bpe_pair_stats': (7, 'integer-exact', None),
    'tokens_pmi_top_pairs': (7, 'integer-exact', None),
    'tokens_top_terms': (13, 'verified', None),
    'unpivot_stack': (9, 'verified', None),
    'values_inline_table': (5, 'verified', 'r14'),
    'variant_json_bucket': (5, 'verified', 'r14'),
    'win_first_last_value': (9, 'verified', None),
    'win_lead_lag': (5, 'verified', 'r14'),
    'win_ntile': (5, 'verified', 'r14'),
    'win_percent_rank_cume_dist': (9, 'verified', None),
    'win_range_frame': (9, 'verified', None),
    'win_rank_dense': (5, 'verified', 'r14'),
    'win_rows_frame': (9, 'verified', None),
    'win_running_sum': (5, 'verified', 'r14'),
    'win_topk_per_group': (5, 'verified', 'r14'),
    'with_cte': (9, 'verified', None),
}

CURRENT_WINDOW: tuple[str, ...] = (
    'ann_ivf_recall_eval',
    'ann_ivf_topk',
    'ann_ivfpq_topk',
    'ann_pq_from_artifact',
    'ann_pq_topk',
    'dedup_components',
    'dedup_containment',
    'dedup_incremental_batch',
    'dedup_ngram_jaccard',
    'dedup_prefix_filter_jaccard',
    'dedup_simhash_pairs',
    'dedup_split_leakage',
    'graph_copurchase_hops',
    'graph_pagerank_nations',
    'join_bloom_prefilter',
    'sample_dsir_importance',
    'sketch_histogram_quantiles',
    'stream_dedup_counts',
    'stream_dedup_within_watermark',
    'stream_docs_incremental_dedup',
    'stream_hll_daily_merged',
    'stream_percolate_alerts',
    'stream_session_counts',
    'stream_sliding_counts',
    'stream_stateful_user_summary',
    'stream_static_enrich',
    'stream_tumbling_counts',
    'stream_view_click_join',
    'stream_view_click_left_outer',
    'tokens_bpe_merge_learn',
    'recursive_date_spine',
    'retrieval_training_triplets',
    'sample_temperature_mix',
    'search_tfidf_cosine_topk',
    'set_except',
    'set_intersect',
    'set_union_all',
    'set_union_distinct',
    'sort_limit_offset',
    'str_functions',
    'subquery_derived_table',
    'subquery_not_in',
    'text_bigram_logprob',
    'values_inline_table',
    'variant_json_bucket',
    'win_lead_lag',
    'win_ntile',
    'win_rank_dense',
    'win_running_sum',
    'win_topk_per_group',
)

def scheduled(window: str) -> list[str]:
    """All entries scheduled for ``window`` (e.g. 'r07')."""
    return [n for n, (_, _, w) in ROTATION.items() if w == window]
