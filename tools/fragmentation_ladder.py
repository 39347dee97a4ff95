"""Measure gate-corpus fragmentation cost: probe latency vs the number
of appended file sets on a bucketed digest table (the text/image/audio
gates' corpus shape), before and after the layout-preserving
compaction. This is the measurement behind the gates' default
``compact_every`` — run it, don't guess it.

Usage: python tools/fragmentation_ladder.py [rows_per_batch]
Prints one JSON line: {"ladder": [{"file_sets": n, "files": m,
"probe_s": s}...], "compacted": {...}, "rows": total}.

``--auto-regime`` runs the corpus >> batch regime instead (round-12
verdict task 5): seed a corpus many times the batch size, measure
probe latency along the append ramp AND the corpus rewrite cost, then
model the per-window overhead of three cadence policies — fixed-64,
the LINEAR rule clamp(corpus_rows/batch_rows) (the round-12
prescription, measured here at ~4x fixed-64's cost in this regime
and REJECTED), and the sqrt rule clamp(2*sqrt(corpus/batch), 16,
1024) that the gates' ``compact_every="auto"`` actually implements
(streaming/dedup_gate.py:_maybe_compact; the cost model's optimum
c* = sqrt(2*rewrite/slope)). The shipped rule is validated if sqrt's
total (rewrites + probe ramp) beats both alternatives once the
corpus outgrows the batch by more than the fixed cadence.
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
        spark,
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


def auto_regime() -> None:
    """Corpus >> batch: seed 512k rows, ramp 2k-row batches to the
    auto cadence (512k/2k = 256), measure probe at the fixed-64 and
    auto-256 peaks plus the corpus rewrite, and print the per-window
    policy model."""
    spark = get_session("fragmentation_ladder_auto")
    name = "akt_fragauto_" + uuid.uuid4().hex[:10]
    corpus_rows, batch_rows = 512_000, 2_000
    # seed in 16 aligned chunks (one production append each), compact
    # to the floor so the ramp starts clean
    for i in range(16):
        _append(spark, name, i * (corpus_rows // 16), corpus_rows // 16)
    compact_bucketed_table(spark, name, ["digest"])
    loc = table_location(spark, name)
    floor = {"files": parquet_file_count(loc), "probe_s": _probe_s(spark, name)}
    print(f"# floor {floor}", file=sys.stderr)
    # ramp: probe at the fixed-64 peak and the auto-cadence peak
    ramp, done = [], 0
    for cp in (64, 256):
        while done < cp:
            _append(spark, name, corpus_rows + done * batch_rows, batch_rows)
            done += 1
        ramp.append(
            {
                "batches": cp,
                "files": parquet_file_count(loc),
                "probe_s": _probe_s(spark, name),
            }
        )
        print(f"# {ramp[-1]}", file=sys.stderr)
    # one corpus rewrite, timed — the cost each cadence point pays
    t0 = time.perf_counter()
    compact_bucketed_table(spark, name, ["digest"])
    rewrite_s = round(time.perf_counter() - t0, 3)
    # the REJECTED linear cadence (round-12's prescription), kept as a
    # comparison point; the gates' shipped "auto" mode is the sqrt rule
    # computed below as sqrt_every
    from arc_kinesis_tagging_spark.streaming.dedup_gate import (
        AUTO_CADENCE_MAX,
        AUTO_CADENCE_MIN,
    )

    linear_cadence = max(
        AUTO_CADENCE_MIN, min(AUTO_CADENCE_MAX, corpus_rows // batch_rows)
    )
    # per-256-batch window model: probe overhead ramps linearly in
    # files (measured), so the mean over a c-batch ramp is
    # slope * c / 2; each policy pays (window/c) rewrites plus
    # window * slope * c / 2 of probe overhead vs the floor. The
    # minimum sits at c* = sqrt(2 * rewrite_s / slope) — the sqrt
    # rule the gates' "auto" mode implements (round-13: the LINEAR
    # rule c = corpus/batch was measured here at ~4x fixed-64's cost
    # and rejected; see streaming/dedup_gate.py AUTO_CADENCE notes).
    over64 = ramp[0]["probe_s"] - floor["probe_s"]
    over256 = ramp[1]["probe_s"] - floor["probe_s"]
    window = 256
    slope = over256 / 256  # probe overhead per batch of ramp
    import math

    def window_cost(c: int) -> float:
        return round((window / c) * rewrite_s + window * slope * c / 2, 2)

    c_star = round(math.sqrt(2 * rewrite_s / slope), 1) if slope > 0 else None
    linear_every = linear_cadence
    sqrt_every = max(16, min(1024, 2 * math.isqrt(
        (corpus_rows + done * batch_rows) // batch_rows)))
    out = {
        "regime": "corpus>>batch",
        "corpus_rows": corpus_rows,
        "rows_per_batch": batch_rows,
        "floor": floor,
        "ramp": ramp,
        "rewrite_s": rewrite_s,
        "slope_s_per_batch": round(slope, 5),
        "c_star": c_star,
        "window_batches": window,
        "policy_window_s": {
            "fixed_64": window_cost(64),
            "linear_rule": {"every": linear_every,
                            "cost_s": window_cost(linear_every)},
            "sqrt_rule": {"every": sqrt_every,
                          "cost_s": window_cost(sqrt_every)},
        },
    }
    spark.sql(f"DROP TABLE {name}")
    print(json.dumps(out))
    spark.stop()


def main() -> None:
    if "--auto-regime" in sys.argv:
        auto_regime()
        return
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
