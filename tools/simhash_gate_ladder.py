"""Measure the streaming SimHash text gate's steady-state cost as its
persisted band corpus grows — the SimHash analog of
minhash_gate_ladder.py (same harness shape): run the REAL gate
(make_simhash_dedup_gate — one 60-bit hash per doc, banded corpus
probe with batch-broadcast, in-batch pair join, bucket-aligned
appends, cadence compaction) over the sf documents table split into
equal micro-batches, recording per-batch wall clock against corpus
size. The 100 TB claim under test: per-batch cost grows with the
CORPUS SCAN only (7 band rows x 8-byte hashes per corpus doc), never
pair-quadratically.

Usage: python tools/simhash_gate_ladder.py [sf_dir] [n_batches]
Prints one JSON line:
{"batches": [{"batch": i, "rows_in": n, "accepted": a,
  "corpus_docs": c, "gate_s": s}...], "sf_dir": ..., "max_hamming": h}
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from arc_kinesis_tagging_spark.session import get_session  # noqa: E402
from arc_kinesis_tagging_spark.streaming.dedup_gate import (  # noqa: E402
    make_simhash_dedup_gate,
)

MAX_HAMMING = 6


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    spark = get_session("simhash-gate-ladder")
    docs = (
        spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        .select("doc_id", "text")
        .localCheckpoint(eager=True)
    )

    accepted_counts: list[int] = []

    def sink(df, batch_id):
        accepted_counts.append(df.count())

    prefix = "akt_shladder_" + uuid.uuid4().hex[:12]
    markers = tempfile.mkdtemp(prefix="sh_ladder_markers_")
    gate = make_simhash_dedup_gate(
        spark, prefix, markers, sink, max_hamming=MAX_HAMMING,
        compact_every=4,
    )

    out = []
    corpus_docs = 0
    for i in range(n_batches):
        batch = docs.filter(
            (F.col("doc_id") % n_batches) == i
        ).localCheckpoint(eager=True)
        rows_in = batch.count()
        t0 = time.perf_counter()
        gate(batch, i)
        dt = time.perf_counter() - t0
        corpus_docs += accepted_counts[-1]
        out.append(
            {
                "batch": i,
                "rows_in": rows_in,
                "accepted": accepted_counts[-1],
                "corpus_docs": corpus_docs,
                "gate_s": round(dt, 3),
            }
        )
        print(f"  batch {i}: {rows_in} in, {accepted_counts[-1]} accepted, "
              f"corpus {corpus_docs}, {dt:.2f}s", file=sys.stderr)

    print(json.dumps({"batches": out, "sf_dir": sf_dir,
                      "max_hamming": MAX_HAMMING, "compact_every": 4}))


if __name__ == "__main__":
    main()
