"""Table maintenance: small-file compaction.

At 100 TB the silent killer is millions of small files from streaming
micro-batches and over-parallel writes: every query pays file-listing
and per-file open cost. Compaction rewrites a directory into
right-sized files (target ~128-512 MB on a cluster). With a real table
format (Delta/Iceberg) this is OPTIMIZE/rewrite_data_files; for plain
parquet directories this rewrite is the equivalent.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import SparkSession


def parquet_file_count(path: str) -> int:
    return sum(
        1
        for root, _dirs, files in os.walk(path)
        for f in files
        if f.endswith(".parquet")
    )


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_rows_per_file: int = 1_000_000,
) -> int:
    """Rewrite ``path`` into ceil(rows/target) files; returns new file
    count. Row-preserving (verified in tests); use coalesce-free
    repartition so output files are evenly sized."""
    df = spark.read.parquet(path)
    n = df.count()
    n_files = max(1, math.ceil(n / target_rows_per_file))
    compacted = df.repartition(n_files)
    # materialize before overwriting the input directory
    compacted.cache().count()
    compacted.write.mode("overwrite").parquet(path)
    compacted.unpersist()
    return n_files
