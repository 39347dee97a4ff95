"""Shared core of substring-level (ExactSubstr) deduplication: window
hashing, interval merge, and span clipping.

Consumers: the batch report/clip plans (plans/quality_ops.py:
q_dedup_substring / q_dedup_substring_clip, which add the md5/rolling
window-hash variants and the DuckDB oracles) and the streaming clip
gate (streaming/dedup_gate.py:make_substring_clip_gate).

Reference parity: the reference pipeline has no span-level text
operator (its scope is record tagging, consumer.py:1-227); this family
belongs to the LLM-curation tier the brief adds (Lee et al. 2021,
"Deduplicating Training Data Makes Language Models Better").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def window_hash_positions(
    df: DataFrame, id_col: str, text_col: str, w: int
) -> DataFrame:
    """(id, s, wh) for every w-token window of every document —
    1-based start ``s``, xxhash64 window digest ``wh``. Map-side
    transform-over-sequence then one generator (the shingling shape);
    documents shorter than ``w`` tokens (and null texts) emit no rows.
    The ``when`` guard is mandatory: Spark's ``sequence`` steps DOWN
    when end < start, so ungated short docs would emit phantom
    windows and abort on the slice."""
    ts = F.split(F.col(text_col), " ")
    n = F.size(ts)
    wins = F.when(
        n >= w,
        F.transform(
            F.sequence(F.lit(1), n - w + 1),
            lambda i: F.struct(
                i.alias("s"),
                F.xxhash64(
                    F.concat_ws(" ", F.slice(ts, i, F.lit(w)))
                ).alias("wh"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<s:int,wh:bigint>>"))
    return df.select(
        F.col(id_col), F.explode(wins).alias("__x")
    ).select(id_col, F.col("__x.s").alias("s"), F.col("__x.wh").alias("wh"))


def merge_window_spans(hits: DataFrame, id_col: str, w: int) -> DataFrame:
    """Merge matched window starts into maximal covered spans — the
    classic cummax-interval-merge: a window at ``s`` covers tokens
    [s, s+w); a new span starts when ``s`` lies beyond EVERY previous
    end (running MAX, not LAG — a span can swallow its successor
    entirely, so the previous ROW's end is not the covered frontier).

    ``hits``: (id, s) rows, 1-based. Returns (id, gid, s0, e1,
    n_wins): span = tokens [s0, e1). The window partitions by ``id``
    only — bounded by per-document token count at any corpus size."""
    ww = Window.partitionBy(id_col).orderBy("s")
    prev_end = F.max(F.col("s") + w).over(
        ww.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = hits.withColumn(
        "__new_span",
        F.when(prev_end.isNull() | (F.col("s") > prev_end), 1).otherwise(0),
    ).withColumn("gid", F.sum("__new_span").over(ww))
    return flagged.groupBy(id_col, "gid").agg(
        F.min("s").alias("s0"),
        F.max(F.col("s") + w).alias("e1"),
        F.count(F.lit(1)).alias("n_wins"),
    )


def clip_spans(
    docs: DataFrame, spans: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Rewrite ``text_col`` in place: tokens covered by any span
    ([s0, e1), 1-based) are dropped and the survivors rejoined in
    order; all other columns pass through untouched, so the output
    schema equals the input schema (gates compose on it).

    One doc-keyed join (each doc's few spans collected into an array)
    then a map-side positional filter lambda — no per-token explode,
    no second corpus shuffle. Documents with no spans — including
    null-text rows, which emit no windows at all (R16 pass-through) —
    keep their text verbatim."""
    span_arr = spans.groupBy(id_col).agg(
        F.sort_array(
            F.collect_list(F.struct(F.col("s0"), F.col("e1")))
        ).alias("__sp")
    )
    joined = docs.join(span_arr, id_col, "left")
    kept = F.filter(
        F.split(F.col(text_col), " "),
        lambda t, i: ~F.exists(
            F.col("__sp"),
            lambda x: (i + 1 >= x["s0"]) & (i + 1 < x["e1"]),
        ),
    )
    return joined.withColumn(
        text_col,
        F.when(F.col("__sp").isNull(), F.col(text_col)).otherwise(
            F.array_join(kept, " ")
        ),
    ).drop("__sp")
