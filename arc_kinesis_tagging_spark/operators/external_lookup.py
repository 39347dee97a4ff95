"""Batched external keyed lookup — the true-external form of the
reference's enrichment join (R12).

The reference fetches one document per record with a synchronous HTTP
GET (utility/tag.py:12-17,49-51), making throughput latency-bound; its
own comments ask for async (utility/tag.py:57-58). The scalable shape
is ``mapInPandas``: each Arrow batch of keys becomes ONE bulk request
(or a bounded pool of concurrent requests) issued from the executor,
with per-record error isolation (app.py:71-75 semantics — a failed key
yields a null row, never a failed task).

The transport is injected (``lookup_batch``): tests and offline runs
use a dict-backed client; production passes an HTTP/bulk-API client.
Keep batches at the Arrow batch size (spark.sql.execution.arrow.
maxRecordsPerBatch, default 10k) and the pool bounded — the external
service is the bottleneck, not Spark.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame


def lookup_enrich(
    df: DataFrame,
    key_col: str,
    lookup_batch: Callable[[list], dict],
    value_schema: str,
    value_cols: list[str],
) -> DataFrame:
    """Attach external values per key: (key, *value_cols) rows.

    ``lookup_batch(keys) -> {key: {col: val}}`` is called once per
    Arrow batch with the batch's distinct keys. Missing/failed keys
    produce null value columns.
    """
    out_schema = f"{key_col} long, " + value_schema

    def enrich(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            keys = pdf[key_col].dropna().unique().tolist()
            try:
                found = lookup_batch(keys)
            except Exception:
                found = {}  # total backend failure -> all dead-letter nulls
            rows = []
            for k in pdf[key_col]:
                doc = found.get(k)
                rows.append(
                    [k] + [doc.get(c) if isinstance(doc, dict) else None for c in value_cols]
                )
            yield pd.DataFrame(rows, columns=[key_col] + value_cols)

    return df.select(key_col).mapInPandas(enrich, out_schema)
