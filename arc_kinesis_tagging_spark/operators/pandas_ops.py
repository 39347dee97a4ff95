"""Grouped-pandas and UDTF operator surface.

The UDF ladder, slowest path last (SURVEY.md §2.B UDF row):

1. built-in expressions (everything else in this package),
2. scalar pandas_udf (streaming/pipeline.py gunzip),
3. grouped ``applyInPandas`` — whole group as one pandas frame; the
   extension point for per-group model scoring / sklearn-ish logic,
4. ``mapInPandas`` — partition-batch streaming (operators/multimodal.py),
5. Python UDTF — one row in, many rows out, SQL-callable.

Grouped ops shuffle by group key; keep groups memory-sized (AQE skew
split does not apply inside applyInPandas groups).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame


def arrow_barrier(df: DataFrame) -> DataFrame:
    """Identity ``mapInArrow`` pass: a plan-materialization barrier.

    Catalyst inlines aliased expressions into every downstream
    occurrence (projection collapse, predicate pushdown, per-field JSON
    schema pruning). When a column is EXPENSIVE to compute and consumed
    many times by later map-side stages — the round-8 audit found the
    gated streaming pipeline re-running ``from_json`` over the raw
    payload 40+ times per row — that inlining turns one parse into
    dozens. An identity Arrow pass hard-stops inlining: everything
    below it is computed once and crosses as materialized columns.

    Cost model: one pipelined Arrow round-trip through the Python
    worker (no shuffle, no disk), linear in data size — worth it only
    when k (re-evaluations saved) × expr cost exceeds the copy. Works
    identically on batch and streaming plans (micro-batch execution
    permits mapInArrow).
    """
    return df.mapInArrow(lambda it: it, df.schema)


def grouped_zscore(df: DataFrame, group_col: str, value_col: str, key_col: str) -> DataFrame:
    """Per-group z-score via applyInPandas (ddof=0 population std to
    match SQL STDDEV_POP). Returns (key, group, value, z)."""
    out_schema = f"{key_col} long, {group_col} string, {value_col} double, z double"

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf[value_col].astype(float)
        std = float(v.std(ddof=0))
        mean = float(v.mean())
        z = (v - mean) / std if std > 0 else v * 0.0
        return pd.DataFrame(
            {
                key_col: pdf[key_col],
                group_col: pdf[group_col],
                value_col: v,
                "z": z,
            }
        )

    return df.select(key_col, group_col, value_col).groupBy(group_col).applyInPandas(
        zscore, out_schema
    )


def register_tokenize_udtf(spark) -> None:
    """Python UDTF: TOKENIZE(text) -> (pos, token) rows, SQL-callable.
    The lateral-function surface for row-expanding Python logic."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, token string")
    class Tokenize:
        def eval(self, text: str):
            if text:
                for i, tok in enumerate(text.split()):
                    yield i, tok

    spark.udtf.register("tokenize", Tokenize)
