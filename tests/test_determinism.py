"""Partitioning-independence of the aggregation-heavy queries: the
same query must produce the IDENTICAL canonical result under a
different shuffle-partition count (different partial-aggregation
grouping and merge order). This is the property the decimal-internal
sum rules in plans/common.py exist to guarantee — float sums are not
associative, so a query summing raw doubles would hash differently
across partitionings and fail the driver's value-hash gate
nondeterministically."""

import pytest

from arc_kinesis_tagging_spark.plans.registry import QUERIES

import sys

sys.path.insert(0, "/root/repo")
from tools.verify_oracle import canon_rows  # noqa: E402

SF = "/root/testdata/sf0.001"

AGG_QUERIES = [
    "q_agg_group",
    "q_agg_rollup",
    "q_agg_cube",
    "q_tpch_q3ish",
    "q_tpch_q5ish",
    "q_tpch_q18ish",
    "q_vector_centroid",
    "q_text_tfidf",
    "q_seq_pack",
    "q_collect_agg",
    "q_window_tumbling",
    "q_sql_direct",
    "q_agg_salted",
    "q_shuffle_shard",
    "q_profile_columns",
    "q_ts_gapfill",
    "q_tpch_q14ish",
    "q_agg_stats",
    # round-3 driver-window additions
    "q_tpch_q8ish",
    "q_tpch_q9ish",
    "q_tpch_q17ish",
    "q_tpch_q21ish",
    "q_corpus_pipeline",
    "q_doc_stats_sketch",
    "q_domain_balance_hash",
    # round-4 additions
    "q_text_repetition",
    "q_events_funnel_k",
    "q_dedup_incremental",
    "q_source_mixing",
    "q_corpus_pipeline2",
    "q_sample_weighted",
    # round-7 additions: two-level bounded ranks (partition-count
    # changes the local-prune grouping — the result must not move),
    # histogram tertiles, decimal-sum composites, fold recurrences
    "q_similarity_topk",
    "q_hard_negatives",
    "q_ngram_lm_pruned",
    "q_lm_buckets",
    "q_text_bm25",
    "q_doc_minwise_sim",
    "q_dedup_prefix",
    "q_ts_ewma",
    "q_corpus_pipeline5",
    "q_embed_pq",
    "q_similarity_pq_adc",
    "q_dedup_embedding_pq",
    "q_multimodal_catalog",
    # post-close round-7 additions: DSIR's bucket-model aggregates and
    # Gumbel top-k, drift-retrain's integer error accounting, and the
    # shard/sample regroup paths
    "q_dsir_score",
    "q_dsir_sample",
    "q_ann_retrain",
    "q_source_tar_shards",
    # round-8 additions: the composed lifecycle's bounded ranks +
    # integer drift accounting, and the audio feature integers
    "q_ann_lifecycle",
    "q_audio_features",
]


@pytest.mark.parametrize("name", AGG_QUERIES)
def test_partitioning_independence(spark, name):
    q = QUERIES[name]
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        a = canon_rows(q.builder(spark, SF).toPandas())
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        b = canon_rows(q.builder(spark, SF).toPandas())
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert a == b
