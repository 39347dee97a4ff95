"""Document chunking and sequence packing — the two reshaping steps
between a cleaned corpus and an LLM training batch.

- ``chunk_documents``: split each document into overlapping token
  windows (retrieval indexing, long-doc training examples). Pure
  codegen expressions + one explode; no shuffle, no Python.
- ``pack_token_spans``: GPT-style sequence packing — concatenate
  documents in a deterministic order and cut the token stream into
  fixed-capacity context windows; a document spanning a boundary
  contributes a span to each window it crosses. Expressed as a running
  token-offset window + span explode, so the "concatenation" never
  materializes — each row knows its own [start, end) offsets and which
  windows it intersects.

Both operators are deterministic and SQL-expressible, so they carry
full DuckDB oracles in the registry (plans/llmops.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from arc_kinesis_tagging_spark.functions.text import tokens


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    chunk_size: int = 32,
    stride: int = 24,
) -> DataFrame:
    """One row per (document, chunk): token window of ``chunk_size``
    starting every ``stride`` tokens (overlap = chunk_size - stride).

    Chunk starts are 1, 1+stride, ... <= n_tokens; the final chunk may
    be short. Empty documents produce no chunks. The whole operator is
    a codegen'd projection + explode — at 100 TB it's a map-only stage
    whose output partitioning follows the input, so a downstream
    per-chunk embed/group stage is the first shuffle, not this.
    """
    if stride < 1 or chunk_size < 1:
        raise ValueError("chunk_size and stride must be >= 1")

    # Tokenize ONCE per document: Catalyst's projection collapse would
    # otherwise re-inline the tokenizer into every chunk column (3
    # evaluations per exploded row). The single-eval wrapper
    # element_at(transform(array(expr), fn), 1) binds the token array
    # to a lambda variable, all chunk structs are built inside that one
    # scope, and the explode emits finished structs — text is never
    # re-tokenized after the explode.
    def build(tk):
        # sequence() errors on start > stop with a positive step, so
        # the empty-document case must short-circuit to an empty array
        starts = F.when(
            F.size(tk) >= 1,
            F.sequence(F.lit(1).cast("int"), F.size(tk), F.lit(stride).cast("int")),
        ).otherwise(F.array().cast("array<int>"))
        return F.transform(
            starts,
            lambda s, i: F.struct(
                i.cast("long").alias("chunk_idx"),
                F.concat_ws(" ", F.slice(tk, s, chunk_size)).alias("chunk_text"),
                F.least(F.lit(chunk_size), F.size(tk) - s + 1)
                .cast("long")
                .alias("chunk_tokens"),
            ),
        )

    chunks = F.element_at(F.transform(F.array(tokens(F.col(text_col))), build), 1)
    return df.select(F.col(key_col), F.explode(chunks).alias("__c")).select(
        key_col, "__c.chunk_idx", "__c.chunk_text", "__c.chunk_tokens"
    )


def pack_token_spans(
    df: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    part_col: str = "source",
    capacity: int = 256,
) -> DataFrame:
    """Assign each document's token span to fixed-capacity context
    windows: documents are concatenated per ``part_col`` partition in
    ``key_col`` order, and the stream is cut every ``capacity`` tokens.
    Returns one row per (document, window) with how many of the
    document's tokens land in that window.

    Packing per partition (source/shard) rather than globally is the
    scale-correct form: a single global ORDER BY is one task, while
    per-source running offsets shuffle by ``part_col`` and pack in
    parallel — same training-batch semantics, since window ids are
    (partition, window_seq) pairs either way.
    """
    n_tok = F.size(tokens(F.col(text_col))).cast("long")
    w = (
        Window.partitionBy(part_col)
        .orderBy(F.col(key_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    spans = (
        df.select(F.col(part_col), F.col(key_col), n_tok.alias("n_tok"))
        .filter(F.col("n_tok") >= 1)
        .withColumn("end_off", F.sum("n_tok").over(w))
        .withColumn("start_off", F.col("end_off") - F.col("n_tok"))
    )
    first_w = F.floor(F.col("start_off") / capacity).cast("long")
    last_w = F.floor((F.col("end_off") - 1) / capacity).cast("long")
    return spans.select(
        part_col,
        key_col,
        F.explode(F.sequence(first_w, last_w)).alias("window_id"),
        "start_off",
        "end_off",
    ).select(
        part_col,
        key_col,
        "window_id",
        (
            F.least(F.col("end_off"), (F.col("window_id") + 1) * capacity)
            - F.greatest(F.col("start_off"), F.col("window_id") * capacity)
        )
        .cast("long")
        .alias("tokens_in_window"),
    )


def pack_bins_ffd(
    df: DataFrame,
    text_col: str = "text",
    key_col: str = "doc_id",
    part_col: str = "source",
    capacity: int = 256,
) -> DataFrame:
    """First-Fit-Decreasing bin packing of WHOLE documents into
    fixed-capacity training contexts — the no-cross-document-attention
    sibling of ``pack_token_spans`` (which splits a token stream at
    window boundaries): each document lands entirely in one bin, FFD
    (sort by length descending, place into the first bin that fits)
    keeps utilization within 11/9 OPT + 1 of optimal, and documents
    longer than the capacity get their own flagged overflow bin.

    The stateful first-fit scan is inherently sequential, so it runs
    per ``part_col`` group in ``applyInPandas`` — groups pack in
    parallel, the scan inside a group is a numpy-backed greedy loop.
    Group size is per-source document count; at corpus scale the
    group key becomes (source, shard) with bounded shards — FFD's
    utilization bound degrades only by the shard count's end effects,
    the standard trade for parallel packing. Deterministic: length
    ties break by ``key_col``; bins are numbered by creation order.
    Returns (part_col, key_col, n_tokens, bin_id, oversize).
    """
    import pandas as pd

    n_tok = F.size(tokens(F.col(text_col))).cast("long")
    base = df.select(
        F.col(part_col), F.col(key_col), n_tok.alias("n_tokens")
    ).filter(F.col("n_tokens") >= 1)

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            ["n_tokens", key_col], ascending=[False, True]
        ).reset_index(drop=True)
        remaining: list[int] = []  # remaining capacity per bin
        bin_ids, oversize = [], []
        for n in pdf["n_tokens"]:
            n = int(n)
            if n > capacity:  # own flagged bin, never shared
                remaining.append(-1)
                bin_ids.append(len(remaining) - 1)
                oversize.append(True)
                continue
            for b, rem in enumerate(remaining):
                if rem >= n:
                    remaining[b] = rem - n
                    bin_ids.append(b)
                    break
            else:
                remaining.append(capacity - n)
                bin_ids.append(len(remaining) - 1)
            oversize.append(False)
        pdf["bin_id"] = pd.Series(bin_ids, dtype="int64")
        pdf["oversize"] = pd.Series(oversize, dtype="bool")
        return pdf

    # derive the id/partition column types from the input instead of
    # hardcoding string/long: a string doc key or non-string partition
    # column would otherwise fail at runtime with an Arrow mismatch
    dt = dict(df.dtypes)
    schema = (
        f"{part_col} {dt[part_col]}, {key_col} {dt[key_col]}, "
        "n_tokens long, bin_id long, oversize boolean"
    )
    return base.groupBy(part_col).applyInPandas(pack, schema)
