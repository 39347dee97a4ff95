"""Measure the streaming MinHash-LSH text gate's steady-state cost as
its persisted corpus grows: run the REAL gate (make_minhash_dedup_gate
— signature pass, corpus probe, in-batch pairs, bucket-aligned
appends, cadence compaction) over the sf documents table split into
equal micro-batches, and record per-batch wall clock against corpus
size. The 100 TB claim under test: the corpus is only ever scanned
(batch bands broadcast onto the bucketed band table; verify join
co-located on the key-bucketed shingle table), so per-batch cost must
grow with the CORPUS SCAN, not with anything pair-quadratic.

Usage: python tools/minhash_gate_ladder.py [sf_dir] [n_batches]
Prints one JSON line:
{"batches": [{"batch": i, "rows_in": n, "accepted": a,
  "corpus_docs": c, "gate_s": s}...], "sf_dir": ..., "threshold": t}
"""

from __future__ import annotations

import json
import os
import sys
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from arc_kinesis_tagging_spark.session import get_session  # noqa: E402
from arc_kinesis_tagging_spark.streaming.dedup_gate import (  # noqa: E402
    make_minhash_dedup_gate,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    spark = get_session("minhash-gate-ladder")
    docs = (
        spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        .select("doc_id", "text")
        .localCheckpoint(eager=True)
    )
    total = docs.count()
    per = total // n_batches

    accepted_counts: list[int] = []

    def sink(df, batch_id):
        accepted_counts.append(df.count())

    prefix = "akt_mhladder_" + uuid.uuid4().hex[:12]
    import tempfile

    markers = tempfile.mkdtemp(prefix="mh_ladder_markers_")
    gate = make_minhash_dedup_gate(
        spark, prefix, markers, sink, jaccard_threshold=0.5,
        compact_every=4,
    )

    out = []
    corpus_docs = 0
    for i in range(n_batches):
        lo, hi = i * per, (i + 1) * per if i < n_batches - 1 else total
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
                      "threshold": 0.5, "compact_every": 4}))


if __name__ == "__main__":
    main()
