"""The full query registry: SURVEY.md §2 operator inventory, one entry
per operator, each with its DuckDB oracle (or an explicit rows-only
note for non-SQL-expressible ops)."""

from __future__ import annotations

import os

from arc_kinesis_tagging_spark.plans.common import Query
from arc_kinesis_tagging_spark.plans.llmops import LLMOPS_QUERIES
from arc_kinesis_tagging_spark.plans.pipeline_ops import PIPELINE_QUERIES
from arc_kinesis_tagging_spark.plans.quality_ops import QUALITY_QUERIES
from arc_kinesis_tagging_spark.plans.relational import RELATIONAL_QUERIES
from arc_kinesis_tagging_spark.plans.relational2 import RELATIONAL2_QUERIES
from arc_kinesis_tagging_spark.plans.relational3 import RELATIONAL3_QUERIES
from arc_kinesis_tagging_spark.plans.tpch2 import TPCH2_QUERIES

# Registry order IS the driver's correctness-check order, and the driver
# evaluates only the FIRST 50 entries per round. The order rotates across
# rounds so every query gets a driver-green row:
#
#   round 1: relational(35) + relational2(9) + relational3[:6]  -> 47/50 green
#   round 2: pipeline_ops + llmops + relational3 head            -> 50/50 green
#   round 3 (CURRENT): the 11 queries with NO driver row yet lead the
#            window (TPC-H Q7/Q10/Q14/Q19, q_agg_stats, the quality_ops
#            family, q_graph_pagerank, q_corpus_pipeline), followed by
#            every NEW round-3 query (so new work is verified the round
#            it lands), then rows-only entries worth re-confirming; the
#            displaced tail all carries green r01/r02 rows.
#
# Override for ad-hoc runs: AKT_REGISTRY_ROTATION=r1|r2 restores old orders.

_CANONICAL: list[Query] = [
    *RELATIONAL_QUERIES,
    *RELATIONAL2_QUERIES,
    *RELATIONAL3_QUERIES,
    *LLMOPS_QUERIES,
    *PIPELINE_QUERIES,
    *QUALITY_QUERIES,
    *TPCH2_QUERIES,
]

_BY_NAME: dict[str, Query] = {q.name: q for q in _CANONICAL}
assert len(_BY_NAME) == len(_CANONICAL), "duplicate query names in registry"

# Head of the round-3 driver window, in priority order. Names listed
# here but not (yet) registered are skipped, so new queries can be
# pre-listed before their module lands.
_R3_HEAD = [
    # -- the 11 with no driver CORRECTNESS row across r01+r02 --
    "q_tpch_q7ish",
    "q_tpch_q10ish",
    "q_tpch_q14ish",
    "q_tpch_q19ish",
    "q_agg_stats",
    "q_profile_columns",
    "q_token_histogram",
    "q_domain_balance",
    "q_ts_gapfill",
    "q_graph_pagerank",
    "q_corpus_pipeline",
    # -- NEW round-3 queries: verified the round they land --
    "q_domain_balance_hash",
    "q_multimodal_ppm",
    "q_dedup_cluster_star",
    "q_tpch_q2ish",
    "q_tpch_q4ish",
    "q_tpch_q6ish",
    "q_tpch_q8ish",
    "q_tpch_q9ish",
    "q_tpch_q11ish",
    "q_tpch_q12ish",
    "q_tpch_q13ish",
    "q_tpch_q15ish",
    "q_tpch_q16ish",
    "q_tpch_q17ish",
    "q_tpch_q20ish",
    "q_tpch_q21ish",
    "q_tpch_q22ish",
    "q_dedup_incremental",
    "q_minhash_vs_exact",
    "q_ann_recall",
    "q_text_normalize",
    "q_doc_stats_sketch",
    "q_window_ntile",
    "q_events_funnel",
    # -- rows-only entries worth a re-confirming row this round --
    "q_sketch_hll",
    "q_dedup_minhash",
    "q_dedup_simhash",
    "q_similarity_ivf",
    "q_dedup_cluster",
    "q_agg_approx_percentile",
    "q_udf_decompress",
    "q_multimodal_pipeline",
    "q_dedup_semantic",
    "q_dedup_embedding_lsh",
    "q_sample",
]


# Round-4 driver window: freshness rotation. Every query passed the
# full local oracle sweep this round, but 40 queries' newest DRIVER row
# is r01-vintage and 39 are r02-vintage; a silent regression could hide
# behind a stale green. Order: (a) queries NEW or REWIRED in round 4 —
# verified the round they land, (b) all 40 r01-vintage rows, (c) as many
# r02-vintage rows as fit (the rest lead round 5's window).
_R4_HEAD = [
    # -- (a) new / rewired this round --
    "q_multimodal_png",       # stdlib PNG decode (new)
    "q_events_funnel_k",      # generalized k-stage funnel (new)
    "q_text_repetition",      # Gopher-style repetition gate (new)
    "q_source_mixing",        # temperature-weighted corpus mixing (new)
    "q_corpus_pipeline2",     # round-4 composite refresh (new)
    "q_sample_weighted",      # Efraimidis-Spirakis weighted sampling (new)
    "q_dedup_incremental",    # rewired to the bucketed-digest corpus path
    # -- (b) newest driver row is r01 --
    "q_join_broadcast", "q_join_smj", "q_join_semi", "q_join_anti",
    "q_join_outer", "q_join_theta", "q_join_interval", "q_join_asof",
    "q_agg_group", "q_agg_distinct", "q_agg_approx_distinct",
    "q_agg_rollup", "q_agg_cube", "q_agg_grouping_sets",
    "q_window_rank", "q_window_lag", "q_window_frame", "q_topk",
    "q_union", "q_intersect", "q_except",
    "q_string_funcs", "q_date_funcs", "q_math_funcs", "q_map_funcs",
    "q_tpch_q3ish", "q_tpch_q5ish", "q_agg_percentile",
    "q_window_tumbling", "q_window_sliding", "q_window_session",
    "q_pivot", "q_scalar_subquery", "q_recursive_cte",
    "q_string_funcs2", "q_conditional_funcs", "q_bitwise_funcs",
    "q_cast_funcs", "q_vector_centroid", "q_vector_normalize",
    # -- (c) newest driver row is r02: highest-value plans, exactly
    #    filling the 50-entry window (the rest lead round 5) --
    "q_pipeline_tag_enrich", "q_dedup_exact", "q_contamination",
]


# Round-5 driver window: after the r04 rotation, zero r01-vintage rows
# remain; the stalest greens are the 36 r02-vintage rows. Final round-5
# shape: (a) the 19 queries NEW this round (new work is verified the
# round it lands), then (b) 31 of the 36 r02-vintage rows — exactly 50.
# The five displaced r02 scalar families (q_sql_direct, q_hof_funcs,
# q_unpivot, q_struct_funcs, q_window_range_frame) plus the r03 rows
# lead round 6's window; all remain pytest/local-sweep green meanwhile.
_R5_HEAD = [
    # -- (a) new this round --
    "q_multimodal_jpeg",      # stdlib baseline JPEG decode
    "q_dedup_lines",          # C4-style cross-document line dedup
    "q_cohort_retention",     # cohort/retention matrix over events
    "q_text_entropy",         # character-entropy quality gate
    "q_session_stats",        # 30-min-gap sessionization + per-session stats
    "q_heavy_hitters",        # Misra-Gries candidates + exact verify
    "q_text_perplexity",      # self-trained char-bigram LM quality score
    "q_embed_covariance",     # integer-Gram covariance matrix
    "q_kmeans",               # distributed Lloyd's k-means (rows-only)
    "q_merge_upsert",         # MERGE INTO semantics via full outer join
    "q_events_pathing",       # Markov transition counts + shares
    "q_scd2_update",          # SCD type-2 close/open/pass-through
    "q_graph_triangles",      # triangle enumeration (two-join + semi)
    "q_dedup_url",            # crawl-frontier URL canonicalization dedup
    "q_anomaly_zscore",       # exact-integer grouped z-score flags
    "q_corpus_pipeline3",     # entropy+perplexity gate -> segment dedup
    "q_dedup_incremental_mh", # cross-batch NEAR-dup vs bucketed LSH corpus
    "q_bpe_subwords",         # fixed-merge BPE application (hash-green)
    "q_multimodal_png_gray",  # grayscale PNG decode (bpp=1 family member)
    # -- (b) newest driver row is r02 --
    "q_window_analytics", "q_string_distance", "q_array_funcs",
    "q_regex_funcs", "q_date_funcs2", "q_collect_agg",
    "q_sample_stratified", "q_split_assign", "q_shuffle_shard",
    "q_join_salted", "q_agg_salted", "q_lateral_topk",
    "q_embed_quantize", "q_array_tag_upsert", "q_explode",
    "q_dedup_ngram_jaccard", "q_dedup_embedding", "q_similarity_topk",
    "q_text_termfreq", "q_text_quality", "q_text_langid",
    "q_text_fingerprint", "q_quality_filter", "q_text_tfidf",
    "q_multimodal_decode", "q_text_chunk", "q_seq_pack", "q_pii_scrub",
    "q_url_funcs", "q_csv_parse", "q_tpch_q18ish",
    # q_sql_direct, q_hof_funcs, q_unpivot, q_window_range_frame,
    # q_struct_funcs (r02-vintage scalar-family
    # refreshes with low regression risk) lead round 6's window to fit
    # the 19 new queries + 31 r02 rows in the 50 slots, together with
    # q_bpe_train (late round-5; its correctness evidence is the exact
    # reference-parity pytest, stronger than a rows-only driver row).
    # q_tpch_q21ish's
    # r04 bench drift was settled by a standalone re-measure (0.93x its
    # r03 time); bench.py times it every round regardless.
]


# Round-6 driver window: the r05 rotation left vintages at
# 50 r05 + 50 r04 + 49 r03 + 5 r02 (+ q_bpe_train / q_bpe_encode with
# no driver row ever). Shape: (a) queries NEW this round, (b) the 5
# remaining r02-vintage scalar families, (c) the two never-driver-rowed
# BPE entries (rows-only by nature — their correctness evidence is the
# exact Sennrich-reference-parity pytest), (d) r03-vintage rows filling
# the remaining slots of the 50-entry window (stalest-first order from
# CORRECTNESS_r03); whatever r03 rows don't fit lead round 7.
_R6_HEAD = [
    # -- (a) new this round --
    "q_multimodal_jpeg420",   # 4:2:0 chroma-subsampled JPEG decode
    "q_ann_persisted",        # build-once/query-many persisted-IVF probe
    "q_doc_minwise_sim",      # bottom-k minwise corpus-pair Jaccard
    "q_ngram_lm_score",       # token-bigram LM scoring gate
    "q_robots_gate",          # robots longest-match crawl admission gate
    "q_json_flatten",         # nested-JSON flatten to typed columns
    "q_dedup_prefix",         # sort-adjacency prefix-containment dedup
    "q_multimodal_png_palette",  # paletted (indexed-color) PNG decode
    "q_multimodal_png16",     # 16-bit grayscale PNG decode
    "q_multimodal_jpeg_prog", # progressive (SOF2) JPEG decode
    "q_dedup_substring",      # duplicated w-token-window coverage
    "q_corpus_diff",          # snapshot delta (added/removed/changed)
    "q_corpus_pipeline4",     # robots -> LM gate -> substring budget
    "q_quant_calibrate",      # per-dimension uint8 calibration sweep
    "q_hard_negatives",       # contrastive rank-band negative mining
    # -- (b) newest driver row is r02 --
    "q_sql_direct", "q_hof_funcs", "q_unpivot", "q_struct_funcs",
    "q_window_range_frame",
    # -- (c) never had a driver row (rows-only by nature) --
    "q_bpe_train", "q_bpe_encode",
    # -- (d) newest driver row is r03 --
    "q_scan_parquet", "q_filter_project", "q_json_extract",
    "q_corrupt_routing", "q_sketch_hll", "q_dedup_minhash",
    "q_dedup_simhash", "q_similarity_ivf", "q_dedup_cluster",
    "q_agg_approx_percentile", "q_udf_decompress",
    "q_multimodal_pipeline", "q_dedup_semantic", "q_dedup_embedding_lsh",
    "q_sample", "q_tpch_q7ish", "q_tpch_q10ish", "q_tpch_q14ish",
    "q_tpch_q19ish", "q_agg_stats", "q_profile_columns",
    "q_token_histogram", "q_domain_balance", "q_ts_gapfill",
    "q_graph_pagerank", "q_corpus_pipeline", "q_domain_balance_hash",
    "q_multimodal_ppm", "q_dedup_cluster_star", "q_tpch_q2ish",
    "q_tpch_q4ish", "q_tpch_q6ish", "q_tpch_q8ish", "q_tpch_q9ish",
    "q_tpch_q11ish", "q_tpch_q12ish", "q_tpch_q13ish", "q_tpch_q15ish",
    "q_tpch_q16ish", "q_tpch_q17ish", "q_tpch_q20ish", "q_tpch_q21ish",
    "q_tpch_q22ish", "q_minhash_vs_exact", "q_ann_recall",
    "q_text_normalize", "q_doc_stats_sketch", "q_window_ntile",
    "q_events_funnel",
]


# Round-7 driver window: after r06 the vintages are 50 r06 + 50 r05 +
# 50 r04 + 21 r03. Shape: (a) queries NEW this round, (b) queries
# REWIRED this round (two-level bounded top-k, minwise sketch-combine,
# range-partitioned prefix dedup, substring hash flag, fingerprinted
# IVF path, progressive-JPEG encoder fix) — changed code is re-verified
# the round it changes regardless of vintage, (c) all 21 remaining
# r03-vintage rows (after r07 no row is older than r04), (d) r04-
# vintage rows filling the 50-slot window; the displaced r04 rows lead
# round 8.
_R7_HEAD = [
    # -- (a) new this round --
    "q_ngram_lm_pruned",      # tail-pruned bounded-model LM gate
    "q_multimodal_png_adam7", # Adam7-interlaced PNG decode
    "q_lm_buckets",           # CCNet-style histogram-tertile bucketing
    "q_embed_pq",             # product-quantization code assignment
    "q_similarity_pq_adc",    # PQ asymmetric-distance top-k search
    "q_text_bm25",            # Okapi BM25 ranked retrieval
    "q_dedup_embedding_pq",   # PQ-code-blocked embedding near-dup
    "q_ann_incremental",      # IVF append-without-retrain maintenance
    "q_similarity_ivfpq",     # IVF-PQ residual-quantized ADC search
    "q_similarity_opq",       # OPQ rotated product quantization
    "q_lm_arpa",              # KenLM ARPA export -> import -> score loop
    "q_text_winnowing",       # MOSS winnowing fingerprints (hash-green)

    "q_json_variant",         # Spark-4 VARIANT semi-structured extraction
    "q_ts_ewma",              # per-user EWMA fold (time-series smoother)
    "q_corpus_pipeline5",     # round-7 composite: buckets -> prefix dedup
    "q_seq_pack_ffd",         # whole-doc FFD context packing (rows-only)
    "q_multimodal_wav",       # REAL PCM16 RIFF/WAVE audio decode
    "q_multimodal_y4m",       # REAL Y4M video decode + frame sampling
    "q_text_html_strip",      # markup strip + entity decode gate
    "q_multimodal_thumbnail", # real PNG 2x2 box-downsample resize
    "q_multimodal_catalog",   # three-codec unified media catalog
    # -- (b) rewired this round --
    "q_similarity_topk", "q_hard_negatives", "q_doc_minwise_sim",
    "q_dedup_prefix", "q_dedup_substring", "q_ann_persisted",
    "q_multimodal_jpeg_prog",
    # -- (c) newest driver row is r03 --
    "q_tpch_q2ish", "q_tpch_q4ish", "q_tpch_q6ish", "q_tpch_q8ish",
    "q_tpch_q9ish", "q_tpch_q11ish", "q_tpch_q12ish", "q_tpch_q13ish",
    "q_tpch_q15ish", "q_tpch_q16ish", "q_tpch_q17ish", "q_tpch_q20ish",
    "q_tpch_q21ish", "q_tpch_q22ish", "q_ann_recall",
    "q_dedup_cluster_star", "q_doc_stats_sketch", "q_events_funnel",
    "q_minhash_vs_exact", "q_text_normalize", "q_window_ntile",
    # -- (d) newest driver row is r04: join/agg/window/core families --
    "q_join_broadcast", "q_join_smj", "q_join_semi", "q_join_anti",
    "q_join_outer", "q_join_theta", "q_join_interval", "q_join_asof",
    "q_agg_group", "q_agg_distinct", "q_agg_rollup", "q_agg_cube",
    "q_agg_grouping_sets", "q_window_rank", "q_window_lag",
    "q_window_frame", "q_topk", "q_tpch_q3ish", "q_tpch_q5ish",
    "q_pipeline_tag_enrich", "q_dedup_exact",
]


# Round-8 driver window: after r07 the vintages are 50 r07 + 44 r06 +
# 49 r05 + 49 r04, plus 11 post-window round-7 queries with NO driver
# row yet. Shape: (a) the 11 rowless queries lead (the round-7 verdict's
# top action), (b) queries NEW or REWIRED this round — the substring
# default flipped to the vectorized rolling-hash kernel and the ANN
# lifecycle composite is new, so both are re-verified the round they
# change, (c) r04-vintage rows filling the 50-slot window, ordered
# plan-complexity-first (joins/composites before scalar families) so the
# highest-regression-risk stale greens refresh first; the 12 displaced
# r04 scalar/set/vector-family rows lead round 9.
_R8_HEAD = [
    # -- (a) no driver CORRECTNESS row across r01..r07 --
    "q_multimodal_gif",
    "q_multimodal_gif_anim",
    "q_dsir_score",
    "q_dsir_sample",
    "q_ann_retrain",
    "q_embed_pca",
    "q_unigram_train",
    "q_unigram_encode",
    "q_source_tar_shards",
    "q_source_tar_multimodal",
    "q_source_tarshard_ds",
    # -- (b) new / rewired this round --
    "q_ann_lifecycle",        # build -> append -> retrain -> OPQ query chain
    "q_audio_features",       # WAV zcr/peak/energy + STFT band features
    "q_scan_orc",             # ORC round-trip scan w/ pushdown gate
    "q_dedup_substring",      # default flipped to vectorized rolling-hash
    # -- (c) newest driver row is r04, complexity-first --
    "q_pipeline_tag_enrich", "q_dedup_exact", "q_dedup_incremental",
    "q_contamination", "q_corpus_pipeline2", "q_source_mixing",
    "q_sample_weighted", "q_events_funnel_k", "q_text_repetition",
    "q_multimodal_png", "q_tpch_q3ish", "q_tpch_q5ish",
    "q_join_smj", "q_join_semi", "q_join_anti", "q_join_outer",
    "q_join_theta", "q_join_interval", "q_join_asof",
    "q_agg_group", "q_agg_distinct", "q_agg_approx_distinct",
    "q_agg_rollup", "q_agg_cube", "q_agg_grouping_sets",
    "q_agg_percentile", "q_recursive_cte", "q_scalar_subquery",
    "q_pivot", "q_window_session", "q_window_sliding",
    "q_window_tumbling", "q_window_rank", "q_window_lag",
    "q_window_frame",
    # Round 9 leads with the late-round-8 rows-only newcomers
    # (q_wordpiece_train, q_wordpiece_encode — no driver row yet,
    # pytest-verified), then the FOURTEEN displaced r04 rows (the
    # original note said "12" but enumerated 15 including
    # q_join_broadcast, whose vintage is actually r07 — the true
    # displaced-r04 set is the 14 names in _R9_HEAD section (c)).
]


# Round-9 driver window: after r08 the vintage ledger is 50 r08 +
# 49 r07 + 44 r06 + 49 r05 + 14 r04, plus 2 late-round-8 queries
# (the WordPiece pair) with NO driver row. Shape: (a) the 2 rowless
# queries lead (round-8 verdict task 1), (b) queries NEW this round —
# the fixed-vocab/fixed-table hash-checkable tokenizer-encode faces
# and the fixed-rotation OPQ assignment (round-8 verdict tasks 3+6),
# (c) the 14 displaced r04 rows (scalar/set/vector families — the
# stalest vintage), (d) 31 of the 49 r05 rows complexity-first
# (composites/dedup/joins/multimodal before scalar families); the 18
# remaining r05 scalar-family rows lead round 10. Budget:
# 2 + 3 + 14 + 31 = 50 exactly.
_R9_HEAD = [
    # -- (a) no driver CORRECTNESS row across r01..r08 --
    "q_wordpiece_train",
    "q_wordpiece_encode",
    # -- (b) new this round --
    "q_wordpiece_subwords",   # fixed-vocab greedy longest-match, oracled
    "q_unigram_subwords",     # fixed-piece-table Viterbi, oracled
    "q_opq_assign",           # fixed-rotation OPQ assignment, oracled
    # -- (c) newest driver row is r04 (the stalest vintage) --
    "q_topk", "q_union", "q_intersect", "q_except",
    "q_string_funcs", "q_string_funcs2", "q_date_funcs",
    "q_math_funcs", "q_map_funcs", "q_conditional_funcs",
    "q_bitwise_funcs", "q_cast_funcs",
    "q_vector_centroid", "q_vector_normalize",
    # -- (d) newest driver row is r05, complexity-first --
    "q_corpus_pipeline3", "q_merge_upsert", "q_scd2_update",
    "q_kmeans", "q_graph_triangles", "q_events_pathing",
    "q_cohort_retention", "q_sample_stratified", "q_shuffle_shard",
    "q_split_assign", "q_seq_pack", "q_text_chunk",
    "q_dedup_embedding", "q_dedup_incremental_mh", "q_dedup_lines",
    "q_dedup_ngram_jaccard", "q_dedup_url",
    "q_join_salted", "q_agg_salted", "q_lateral_topk",
    "q_tpch_q18ish", "q_collect_agg", "q_window_analytics",
    "q_multimodal_decode", "q_multimodal_jpeg", "q_multimodal_png_gray",
    "q_heavy_hitters", "q_embed_covariance", "q_embed_quantize",
    "q_pii_scrub", "q_quality_filter",
    # round 10 should lead with the 18 remaining r05 rows:
    # q_anomaly_zscore, q_array_funcs, q_array_tag_upsert,
    # q_bpe_subwords, q_csv_parse, q_date_funcs2, q_explode,
    # q_regex_funcs, q_session_stats, q_string_distance,
    # q_text_entropy, q_text_fingerprint, q_text_langid,
    # q_text_perplexity, q_text_quality, q_text_termfreq,
    # q_text_tfidf, q_url_funcs.
    # NOTE (round-9 budget trade-off, recorded post-hoc per ADVICE):
    # q_admission_gate landed after this head was frozen, so it shipped
    # round 9 with NO driver row (pytest oracle sweep only); it leads
    # _R10_HEAD instead of displacing an already-budgeted r05 refresh.
]


# Round-10 driver window: after r09 the vintage ledger is 50 r09 +
# 50 r08 + 49 r07 + 44 r06 + 18 r05, plus ONE rowless query
# (q_admission_gate, landed post-snapshot in round 9; oracle-PASS in
# the judge's own verify_oracle run). Shape: (a) the rowless query
# leads (round-9 verdict task 3), (b) queries NEW this round — the
# SQL-engine twin of the admission gate (verdict task 8), the image
# perceptual-hash near-dup (verdict task 4) plus its incremental
# corpus twin, and the video/audio perceptual near-dups, (c) queries
# REWIRED this round — q_text_bm25 / q_similarity_opq are the two
# reproducible bench regressions under root-cause (verdict task 2);
# changed code is re-verified the round it changes, (d) the 18
# remaining r05 scalar-family rows (the stalest vintage), (e) 24 of
# the 44 r06 rows complexity-first (dedup/ANN/LM/composites/
# multimodal/TPC-H before scalar families); the 20 displaced r06 rows
# (q_agg_stats / q_profile_columns / q_ts_gapfill joined them as
# q_dedup_vhash / q_dedup_ahash / q_dedup_phash_incremental landed)
# lead round 11. Budget: 1 + 5 + 2 + 18 + 24 = 50 exactly.
_R10_HEAD = [
    # -- (a) no driver CORRECTNESS row across r01..r09 --
    "q_admission_gate",
    # -- (b) new this round --
    "q_admission_gate_sql",   # Catalyst-expression gate twin, same oracle
    "q_dedup_phash",          # image perceptual-hash (DCT) near-dup
    "q_dedup_phash_incremental",  # batch-vs-bucketed-corpus image dedup
    "q_dedup_vhash",          # video temporal pHash near-dup
    "q_dedup_ahash",          # audio Haitsma-Kalker fingerprint near-dup
    # -- (c) rewired this round (bench-regression root-cause) --
    "q_text_bm25",
    "q_similarity_opq",
    # -- (d) newest driver row is r05 (the stalest vintage) --
    "q_anomaly_zscore", "q_array_funcs", "q_array_tag_upsert",
    "q_bpe_subwords", "q_csv_parse", "q_date_funcs2", "q_explode",
    "q_regex_funcs", "q_session_stats", "q_string_distance",
    "q_text_entropy", "q_text_fingerprint", "q_text_langid",
    "q_text_perplexity", "q_text_quality", "q_text_termfreq",
    "q_text_tfidf", "q_url_funcs",
    # -- (e) newest driver row is r06, complexity-first --
    "q_dedup_minhash", "q_dedup_cluster", "q_similarity_ivf",
    "q_ngram_lm_score", "q_corpus_pipeline", "q_corpus_pipeline4",
    "q_dedup_semantic", "q_dedup_embedding_lsh",
    "q_multimodal_jpeg420", "q_multimodal_png_palette",
    "q_multimodal_png16", "q_multimodal_ppm", "q_multimodal_pipeline",
    "q_graph_pagerank", "q_robots_gate", "q_quant_calibrate",
    "q_json_flatten", "q_corpus_diff",
    "q_tpch_q7ish", "q_tpch_q10ish", "q_tpch_q14ish", "q_tpch_q19ish",
    "q_domain_balance_hash", "q_domain_balance",
    # round 11 should lead with the 20 displaced r06 rows:
    # q_agg_stats, q_profile_columns, q_ts_gapfill, q_scan_parquet,
    # q_filter_project,
    # q_json_extract, q_corrupt_routing, q_sketch_hll,
    # q_dedup_simhash, q_agg_approx_percentile, q_udf_decompress,
    # q_sample, q_struct_funcs, q_window_range_frame, q_unpivot,
    # q_hof_funcs, q_sql_direct, q_token_histogram, q_bpe_train,
    # q_bpe_encode.
]

# Round-11 window (50 rows): exactly the rotation the r10 verdict
# pre-listed — (a) the 20 r06-vintage rows (the stalest anywhere),
# (b) the round's new work (incremental video/audio near-dup), then
# (c) 28 of the 47 r07-vintage rows, TPC-H first, complexity-first
# for the rest. After r11 the stalest remaining vintage is r07
# (19 rows), pre-listed at the bottom for round 12.
_R11_HEAD = [
    # -- (a) the 20 r06-vintage rows --
    "q_agg_stats", "q_profile_columns", "q_ts_gapfill",
    "q_scan_parquet", "q_filter_project", "q_json_extract",
    "q_corrupt_routing", "q_sketch_hll", "q_dedup_simhash",
    "q_agg_approx_percentile", "q_udf_decompress", "q_sample",
    "q_struct_funcs", "q_window_range_frame", "q_unpivot",
    "q_hof_funcs", "q_sql_direct", "q_token_histogram",
    "q_bpe_train", "q_bpe_encode",
    # -- (b) new round-11 work --
    "q_dedup_vhash_incremental",  # batch-vs-bucketed-corpus video dedup
    "q_dedup_ahash_incremental",  # batch-vs-bucketed-corpus audio dedup
    "q_corpus_pipeline6",  # multimodal refresh: text dedup -> image near-dup
    # -- (c) r07-vintage refresh: the 14 TPC-H rows first --
    "q_tpch_q2ish", "q_tpch_q4ish", "q_tpch_q6ish", "q_tpch_q8ish",
    "q_tpch_q9ish", "q_tpch_q11ish", "q_tpch_q12ish", "q_tpch_q13ish",
    "q_tpch_q15ish", "q_tpch_q16ish", "q_tpch_q17ish", "q_tpch_q20ish",
    "q_tpch_q21ish", "q_tpch_q22ish",
    # -- then 14 more r07 rows, complexity-first --
    "q_lm_arpa", "q_lm_buckets", "q_ann_persisted", "q_ann_incremental",
    "q_ann_recall", "q_similarity_ivfpq", "q_similarity_pq_adc",
    "q_embed_pq", "q_dedup_embedding_pq", "q_dedup_cluster_star",
    "q_multimodal_jpeg_prog", "q_multimodal_png_adam7",
    "q_multimodal_y4m",
    # round 12 should finish the r07 block (20 rows left —
    # q_multimodal_wav was displaced by q_corpus_pipeline6 to keep the
    # window at 50): q_multimodal_wav, q_corpus_pipeline5,
    # q_dedup_prefix, q_doc_minwise_sim, q_doc_stats_sketch,
    # q_events_funnel, q_hard_negatives, q_join_broadcast,
    # q_json_variant, q_minhash_vs_exact, q_multimodal_catalog,
    # q_multimodal_thumbnail, q_ngram_lm_pruned, q_seq_pack_ffd,
    # q_similarity_topk, q_text_html_strip, q_text_normalize,
    # q_text_winnowing, q_ts_ewma, q_window_ntile.
]

# Round-12 window (50 rows): exactly the rotation the r11 verdict
# pre-listed — (a) the 20 remaining r07-vintage rows (the stalest
# anywhere), (b) the round's new work (cross-modal compositions #2
# and #3), then (c) 28 of the 50 r08-vintage rows: q_tpch_q3ish FIRST (its
# environmental-flag counter sits at 1 — a fresh driver timing either
# clears or confirms it), then complexity-first. After r12 the
# stalest remaining vintage is r08 (22 rows), pre-listed at the
# bottom for round 13.
_R12_HEAD = [
    # -- (a) the 20 r07-vintage rows --
    "q_multimodal_wav", "q_corpus_pipeline5", "q_dedup_prefix",
    "q_doc_minwise_sim", "q_doc_stats_sketch", "q_events_funnel",
    "q_hard_negatives", "q_join_broadcast", "q_json_variant",
    "q_minhash_vs_exact", "q_multimodal_catalog",
    "q_multimodal_thumbnail", "q_ngram_lm_pruned", "q_seq_pack_ffd",
    "q_similarity_topk", "q_text_html_strip", "q_text_normalize",
    "q_text_winnowing", "q_ts_ewma", "q_window_ntile",
    # -- (b) new round-12 work --
    "q_corpus_pipeline7",  # cross-modal #2: text dedup -> audio near-dup
    "q_corpus_pipeline8",  # cross-modal #3: text dedup -> video near-dup
    "q_corpus_pipeline9",  # cross-modal #4: text dedup -> embedding near-dup
    "q_corpus_pipeline10",  # decontaminated curation: langid -> dedup ->
    #    jaccard near-dup -> benchmark decontamination -> report
    "q_dedup_simhash_incremental",  # batch-vs-bucketed-corpus text SimHash
    "q_dedup_jaccard_prefix",  # prefix-filtered exact jaccard (lossless)
    # -- (c) r08-vintage refresh: flag hygiene first, then
    #    complexity-first (pipelines, ANN lifecycle, dedup, sources,
    #    tokenizers, codecs, windows) --
    "q_tpch_q3ish", "q_tpch_q5ish",
    "q_corpus_pipeline2", "q_pipeline_tag_enrich",
    "q_ann_lifecycle", "q_ann_retrain",
    "q_dedup_exact", "q_dedup_incremental", "q_dedup_substring",
    "q_contamination", "q_dsir_sample", "q_dsir_score",
    "q_source_mixing", "q_source_tar_multimodal",
    "q_source_tar_shards", "q_source_tarshard_ds",
    "q_unigram_train", "q_unigram_encode",
    "q_multimodal_gif", "q_multimodal_gif_anim", "q_multimodal_png",
    "q_audio_features", "q_embed_pca",
    "q_recursive_cte",
    # round 13 should finish the r08 block (26 rows left —
    # q_scan_orc was displaced by q_corpus_pipeline8,
    # q_window_tumbling by q_corpus_pipeline9, q_window_sliding by
    # q_corpus_pipeline10, q_window_session by
    # q_dedup_simhash_incremental, and q_scalar_subquery by
    # q_dedup_jaccard_prefix to keep the window at 50):
    # q_scalar_subquery, q_window_session, q_window_sliding,
    # q_window_tumbling, q_agg_approx_distinct, q_agg_cube,
    # q_agg_distinct, q_agg_group, q_agg_grouping_sets,
    # q_agg_percentile, q_agg_rollup, q_events_funnel_k, q_join_anti,
    # q_join_asof, q_join_interval, q_join_outer, q_join_semi,
    # q_join_smj, q_join_theta, q_pivot, q_sample_weighted,
    # q_scan_orc, q_text_repetition, q_window_frame, q_window_lag,
    # q_window_rank.
]

# Round-13 window (50 rows): exactly the rotation the r12 verdict
# pre-listed — (a) the 26 remaining r08-vintage rows (the stalest
# anywhere; the full r08 block is retired this round), (b) the
# round's new work (the containment join and the tri-modal
# composite), then (c) 21 of the 50 r09-vintage rows,
# complexity-first (composites, ANN/embedding, dedup family,
# multimodal codecs, mutation ops, TPC-H). After r13 the stalest
# remaining vintage is r09 (29 rows), pre-listed at the bottom for
# round 14.
_R13_HEAD = [
    # -- (a) the 26 r08-vintage rows --
    "q_scalar_subquery", "q_window_session", "q_window_sliding",
    "q_window_tumbling", "q_agg_approx_distinct", "q_agg_cube",
    "q_agg_distinct", "q_agg_group", "q_agg_grouping_sets",
    "q_agg_percentile", "q_agg_rollup", "q_events_funnel_k",
    "q_join_anti", "q_join_asof", "q_join_interval", "q_join_outer",
    "q_join_semi", "q_join_smj", "q_join_theta", "q_pivot",
    "q_sample_weighted", "q_scan_orc", "q_text_repetition",
    "q_window_frame", "q_window_lag", "q_window_rank",
    # -- (b) new round-13 work --
    "q_dedup_containment",  # exact overlap-coefficient join,
    #    asymmetric prefix pruning (sub-document inclusion dedup)
    "q_corpus_pipeline11",  # tri-modal: text dedup -> image near-dup
    #    -> audio near-dup -> report
    "q_corpus_pipeline12",  # keep-longest containment curation:
    #    text dedup -> containment near-dup (drop the shorter) -> report
    # -- (c) r09-vintage refresh, complexity-first --
    "q_corpus_pipeline3", "q_dedup_embedding", "q_dedup_incremental_mh",
    "q_kmeans", "q_dedup_ngram_jaccard", "q_dedup_lines", "q_dedup_url",
    "q_heavy_hitters", "q_graph_triangles", "q_events_pathing",
    "q_multimodal_decode", "q_multimodal_jpeg", "q_multimodal_png_gray",
    "q_opq_assign", "q_embed_covariance", "q_embed_quantize",
    "q_merge_upsert", "q_scd2_update", "q_cohort_retention",
    "q_seq_pack", "q_tpch_q18ish",
    # round 14 should finish the r09 block (29 rows left —
    # q_join_salted was displaced by q_corpus_pipeline12 to keep the
    # window at 50): q_agg_salted, q_bitwise_funcs, q_cast_funcs,
    # q_collect_agg, q_conditional_funcs, q_date_funcs, q_except,
    # q_intersect, q_join_salted, q_lateral_topk, q_map_funcs,
    # q_math_funcs, q_pii_scrub, q_quality_filter,
    # q_sample_stratified, q_shuffle_shard, q_split_assign,
    # q_string_funcs, q_string_funcs2, q_text_chunk, q_topk, q_union,
    # q_unigram_subwords, q_vector_centroid, q_vector_normalize,
    # q_window_analytics, q_wordpiece_encode, q_wordpiece_subwords,
    # q_wordpiece_train.
]


# Round-14 window (50 rows): exactly the rotation the r13 verdict
# pre-listed — (a) all 29 remaining r09-vintage rows (the stalest
# anywhere; the r09 block is retired this round), (b) the round's new
# work (the supervised quality classifier family and its composite),
# then (c) 17 of the 50 r10-vintage rows, complexity-first
# (composites, the dedup/multimodal/ANN families, the flagged
# q_text_bm25). After r14 the stalest remaining vintage is r10
# (33 rows), pre-listed at the bottom for round 15.
_R14_HEAD = [
    # -- (a) the 29 r09-vintage rows --
    "q_agg_salted", "q_bitwise_funcs", "q_cast_funcs", "q_collect_agg",
    "q_conditional_funcs", "q_date_funcs", "q_except", "q_intersect",
    "q_join_salted", "q_lateral_topk", "q_map_funcs", "q_math_funcs",
    "q_pii_scrub", "q_quality_filter", "q_sample_stratified",
    "q_shuffle_shard", "q_split_assign", "q_string_funcs",
    "q_string_funcs2", "q_text_chunk", "q_topk", "q_union",
    "q_unigram_subwords", "q_vector_centroid", "q_vector_normalize",
    "q_window_analytics", "q_wordpiece_encode", "q_wordpiece_subwords",
    "q_wordpiece_train",
    # -- (b) new round-14 work --
    "q_quality_clf_score",  # supervised classifier: closed-form
    #    one-step train + apply, fully SQL-oracled
    "q_quality_clf_train",  # the real multi-epoch GD loop (rows-only)
    "q_corpus_pipeline13",  # mislabel-scrub curation: exact dedup ->
    #    label-agreement gate -> per-lang report
    "q_dedup_substring_clip",  # ExactSubstr CLIP: the curation action
    #    on the substring report's merged spans (remove + reassemble)
    # -- (c) r10-vintage refresh, complexity-first --
    "q_corpus_pipeline", "q_corpus_pipeline4", "q_dedup_cluster",
    "q_dedup_minhash", "q_dedup_phash", "q_dedup_phash_incremental",
    "q_dedup_vhash", "q_dedup_ahash", "q_dedup_semantic",
    "q_dedup_embedding_lsh", "q_multimodal_pipeline",
    "q_multimodal_jpeg420", "q_multimodal_png16",
    "q_multimodal_png_palette", "q_similarity_ivf", "q_similarity_opq",
    "q_text_bm25",
    # round 15 should finish the r10 block (33 rows left):
    # q_admission_gate, q_admission_gate_sql, q_anomaly_zscore,
    # q_array_funcs, q_array_tag_upsert, q_bpe_subwords,
    # q_corpus_diff, q_csv_parse, q_date_funcs2,
    # q_domain_balance, q_domain_balance_hash, q_explode,
    # q_graph_pagerank, q_json_flatten, q_multimodal_ppm,
    # q_ngram_lm_score, q_quant_calibrate, q_regex_funcs, q_robots_gate,
    # q_session_stats, q_string_distance, q_text_entropy,
    # q_text_fingerprint, q_text_langid, q_text_perplexity,
    # q_text_quality, q_text_termfreq, q_text_tfidf, q_tpch_q10ish,
    # q_tpch_q14ish, q_tpch_q19ish, q_tpch_q7ish, q_url_funcs.
]

# Round-15 driver window (the r14 verdict's item 1): every query path
# the r14 optimization round semantically rewrote (batch-native Arrow
# kernels, chained LM aggregates, pipeline stage overlap, clf literal
# weights) goes FIRST so the driver re-oracles the post-rewrite code —
# their last driver CORRECTNESS rows date from r10–r13 against the old
# implementations. The remaining slots finish the r10-vintage refresh
# complexity-first; the four pure function-family rows left over
# (q_array_funcs, q_date_funcs2, q_regex_funcs, q_url_funcs) roll to
# round 16.
_R15_HEAD = [
    # -- (a) the 23 r14/r15-rewritten query paths --
    "q_dedup_jaccard_prefix", "q_dedup_containment",
    "q_dedup_ngram_jaccard", "q_contamination", "q_dedup_minhash",
    "q_dedup_cluster", "q_dedup_simhash_incremental", "q_dsir_score",
    "q_ngram_lm_score", "q_ngram_lm_pruned", "q_lm_buckets",
    "q_corpus_pipeline6", "q_corpus_pipeline7", "q_corpus_pipeline8",
    "q_corpus_pipeline9", "q_corpus_pipeline10", "q_corpus_pipeline11",
    "q_corpus_pipeline12", "q_corpus_pipeline13",
    "q_quality_clf_score", "q_quality_clf_train",
    "q_text_termfreq", "q_text_repetition",
    # -- (b) r10-vintage refresh, complexity-first (27 of 31 left) --
    "q_corpus_diff", "q_graph_pagerank", "q_domain_balance",
    "q_domain_balance_hash", "q_admission_gate", "q_admission_gate_sql",
    "q_multimodal_ppm", "q_bpe_subwords", "q_quant_calibrate",
    "q_text_tfidf", "q_text_perplexity", "q_text_entropy",
    "q_text_fingerprint", "q_text_langid", "q_text_quality",
    "q_tpch_q7ish", "q_tpch_q10ish", "q_tpch_q14ish", "q_tpch_q19ish",
    "q_session_stats", "q_anomaly_zscore", "q_string_distance",
    "q_robots_gate", "q_json_flatten", "q_csv_parse", "q_explode",
    "q_array_tag_upsert",
]


def _ordered(head: list[str]) -> list[Query]:
    seen = [n for n in head if n in _BY_NAME]
    rest = [q.name for q in _CANONICAL if q.name not in set(seen)]
    return [_BY_NAME[n] for n in [*seen, *rest]]


# Rotation only REORDERS _CANONICAL — every rotation must contain every
# query (bench.py's HEADLINE indexes QUERIES by name regardless of
# rotation, and a dropped entry would KeyError there).
_ROT = os.environ.get("AKT_REGISTRY_ROTATION")
if _ROT == "r1":
    ALL_QUERIES: list[Query] = list(_CANONICAL)
elif _ROT == "r2":
    ALL_QUERIES = _ordered(
        [q.name for q in [*LLMOPS_QUERIES, *RELATIONAL3_QUERIES]]
    )
elif _ROT == "r3":
    ALL_QUERIES = _ordered(_R3_HEAD)
elif _ROT == "r4":
    ALL_QUERIES = _ordered(_R4_HEAD)
elif _ROT == "r5":
    ALL_QUERIES = _ordered(_R5_HEAD)
elif _ROT == "r6":
    ALL_QUERIES = _ordered(_R6_HEAD)
elif _ROT == "r7":
    ALL_QUERIES = _ordered(_R7_HEAD)
elif _ROT == "r8":
    ALL_QUERIES = _ordered(_R8_HEAD)
elif _ROT == "r9":
    ALL_QUERIES = _ordered(_R9_HEAD)
elif _ROT == "r10":
    ALL_QUERIES = _ordered(_R10_HEAD)
elif _ROT == "r11":
    ALL_QUERIES = _ordered(_R11_HEAD)
elif _ROT == "r12":
    ALL_QUERIES = _ordered(_R12_HEAD)
elif _ROT == "r13":
    ALL_QUERIES = _ordered(_R13_HEAD)
elif _ROT == "r14":
    ALL_QUERIES = _ordered(_R14_HEAD)
else:
    ALL_QUERIES = _ordered(_R15_HEAD)

QUERIES: dict[str, Query] = {q.name: q for q in ALL_QUERIES}

assert len(QUERIES) == len(ALL_QUERIES), "duplicate query names in registry"
