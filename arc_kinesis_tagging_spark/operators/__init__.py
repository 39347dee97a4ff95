from arc_kinesis_tagging_spark.operators.joins import asof_join, interval_join
from arc_kinesis_tagging_spark.operators.dedup import (
    dedup_exact,
    minhash_near_duplicates,
    ngram_jaccard_pairs,
    simhash_near_duplicates,
)
from arc_kinesis_tagging_spark.operators.similarity import (
    cosine_topk_bruteforce,
    cosine_topk_ivf,
)

__all__ = [
    "asof_join",
    "interval_join",
    "dedup_exact",
    "minhash_near_duplicates",
    "ngram_jaccard_pairs",
    "simhash_near_duplicates",
    "cosine_topk_bruteforce",
    "cosine_topk_ivf",
]
