"""DataFrame-level text-analysis operators over a documents table."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from arc_kinesis_tagging_spark.functions.text import (
    fingerprint_expr,
    language_id_expr,
    quality_score_expr,
    token_count_exprs,
    tokens,
)


def term_frequencies(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus-wide term frequencies: explode tokens -> count.

    Partial aggregation happens map-side (HashAggregate pair), so the
    shuffle carries one row per (partition, token), not per token
    occurrence — the difference between shuffling ~vocabulary-size and
    ~corpus-size at 100 TB.
    """
    return (
        df.select(F.explode(tokens(F.col(text_col))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def text_profile(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach token counts, quality metrics, language guess, and a
    stable fingerprint — one codegen'd projection, no shuffle."""
    out = df
    for name, expr in token_count_exprs(F.col(text_col)).items():
        out = out.withColumn(name, expr)
    for name, expr in quality_score_expr(F.col(text_col)).items():
        out = out.withColumn(name, expr)
    return out.withColumn("lang_guess", language_id_expr(F.col(text_col))).withColumn(
        "fingerprint", fingerprint_expr(F.col(text_col))
    )
