from arc_kinesis_tagging_spark.operators.joins import asof_join, interval_join
from arc_kinesis_tagging_spark.operators.chunking import (
    chunk_documents,
    pack_token_spans,
)
from arc_kinesis_tagging_spark.operators.clusters import (
    connected_components,
    connected_components_star,
    dedup_keep_best,
)
from arc_kinesis_tagging_spark.operators.graph import pagerank
from arc_kinesis_tagging_spark.operators.dedup import (
    contamination_pairs,
    dedup_exact,
    minhash_near_duplicates,
    ngram_jaccard_pairs,
    simhash_near_duplicates,
)
from arc_kinesis_tagging_spark.operators.similarity import (
    cosine_threshold_pairs,
    cosine_topk_bruteforce,
    cosine_topk_ivf,
    srp_lsh_pairs,
)

__all__ = [
    "asof_join",
    "interval_join",
    "chunk_documents",
    "pack_token_spans",
    "connected_components",
    "connected_components_star",
    "dedup_keep_best",
    "pagerank",
    "contamination_pairs",
    "dedup_exact",
    "minhash_near_duplicates",
    "ngram_jaccard_pairs",
    "simhash_near_duplicates",
    "cosine_threshold_pairs",
    "cosine_topk_bruteforce",
    "cosine_topk_ivf",
    "srp_lsh_pairs",
]
