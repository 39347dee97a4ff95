from arc_kinesis_tagging_spark.functions.arrays import (
    AUTOTAG,
    TAG_SCHEMA,
    make_tag,
    tag_upsert,
)
from arc_kinesis_tagging_spark.functions.text import (
    language_id_expr,
    quality_score_expr,
    shingles,
    token_count_exprs,
    tokens,
)
from arc_kinesis_tagging_spark.functions.vectors import cosine_similarity, dot, l2_norm

__all__ = [
    "AUTOTAG",
    "TAG_SCHEMA",
    "make_tag",
    "tag_upsert",
    "tokens",
    "shingles",
    "language_id_expr",
    "quality_score_expr",
    "token_count_exprs",
    "cosine_similarity",
    "dot",
    "l2_norm",
]
