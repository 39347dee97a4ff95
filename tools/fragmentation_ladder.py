"""Measure gate-corpus fragmentation cost: probe latency vs the number
of appended file sets on a bucketed digest table (the text/image/audio
gates' corpus shape), before and after the layout-preserving
compaction. This is the measurement behind the gates' default
``compact_every`` — run it, don't guess it.

Usage: python tools/fragmentation_ladder.py [rows_per_batch]
Prints one JSON line: {"ladder": [{"file_sets": n, "files": m,
"probe_s": s}...], "compacted": {...}, "rows": total}.
"""

from __future__ import annotations

import json
import os
import sys
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from arc_kinesis_tagging_spark.operators.dedup import (  # noqa: E402
    fresh_against_corpus,
)
from arc_kinesis_tagging_spark.session import get_session  # noqa: E402
from arc_kinesis_tagging_spark.sources.maintenance import (  # noqa: E402
    compact_bucketed_table,
    parquet_file_count,
    table_location,
)

CHECKPOINTS = [1, 8, 32, 64, 128, 256]


def _append(spark, name: str, lo: int, n: int) -> None:
    # THE production append path, imported, not re-implemented: the
    # ladder calibrates the gates' compact_every default, so it must
    # measure the code the gates actually run (bucket alignment
    # included) — a copy would silently drift
    from arc_kinesis_tagging_spark.streaming.dedup_gate import (
        _append_bucketed_bands,
    )

    _append_bucketed_bands(
        spark.range(lo, lo + n).select(
            F.sha2(F.col("id").cast("string"), 256).alias("digest")
        ),
        name,
        ["digest"],
        16,
    )


def _probe_s(spark, name: str, reps: int = 3) -> float:
    batch = spark.range(10_000_000, 10_002_000).select(
        F.sha2(F.col("id").cast("string"), 256).alias("digest"),
        F.col("id").alias("doc_id"),
    )
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fresh_against_corpus(batch, spark.table(name)).count()
        best = min(best, time.perf_counter() - t0)
    return round(best, 4)


def main() -> None:
    rows_per_batch = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    spark = get_session("fragmentation_ladder")
    name = "akt_fragladder_" + uuid.uuid4().hex[:10]
    ladder, done = [], 0
    for cp in CHECKPOINTS:
        while done < cp:
            _append(spark, name, done * rows_per_batch, rows_per_batch)
            done += 1
        loc = table_location(spark, name)
        ladder.append(
            {
                "file_sets": cp,
                "files": parquet_file_count(loc),
                "probe_s": _probe_s(spark, name),
            }
        )
        print(f"# {ladder[-1]}", file=sys.stderr)
    compact_bucketed_table(spark, name, ["digest"])
    compacted = {
        "files": parquet_file_count(table_location(spark, name)),
        "probe_s": _probe_s(spark, name),
    }
    out = {
        "ladder": ladder,
        "compacted": compacted,
        "rows": done * rows_per_batch,
        "rows_per_batch": rows_per_batch,
    }
    spark.sql(f"DROP TABLE {name}")
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
