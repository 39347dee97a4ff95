"""Standalone per-query timer for optimization work (round 14).

Times selected registry queries in THIS process (fresh JVM if you run
the script fresh — the honest way to compare against another code
state), min-of-N with the bench's noop-sink methodology, and
optionally dumps .explain("formatted") to plans/r14/<q>_<tag>.txt.

Usage:
    python tools/qtime.py [--reps N] [--plan TAG] [--sf DIR] q1 [q2 ...]

Prints one line per query: name, reps, min, all reps. This is a dev
tool only; the driver's numbers come from bench.py (unchanged
methodology).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from arc_kinesis_tagging_spark.plans.registry import QUERIES
from arc_kinesis_tagging_spark.session import get_session
from bench import CODEC_HEAVY, run_once


def main() -> None:
    args = sys.argv[1:]
    reps = 3
    plan_tag = None
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = []
    i = 0
    while i < len(args):
        if args[i] == "--reps":
            reps = int(args[i + 1]); i += 2
        elif args[i] == "--plan":
            plan_tag = args[i + 1]; i += 2
        elif args[i] == "--sf":
            sf_dir = args[i + 1]; i += 2
        else:
            names.append(args[i]); i += 1
    spark = get_session("qtime")
    # same warm-ups as bench.py main(): JVM/parquet caches + the 32x
    # Python worker pool spin-up
    run_once(spark, "q_topk", sf_dir)
    spark.range(64).repartition(32).mapInPandas(
        lambda it: (pdf for pdf in it), "id long"
    ).write.format("noop").mode("overwrite").save()
    plans_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", "r14",
    )
    for name in names:
        if plan_tag:
            os.makedirs(plans_dir, exist_ok=True)
            df = QUERIES[name].builder(spark, sf_dir)
            mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted")
            with open(os.path.join(plans_dir, f"{name}_{plan_tag}.txt"), "w") as fh:
                fh.write(df._jdf.queryExecution().explainString(mode))
        if name in CODEC_HEAVY:
            run_once(spark, name, sf_dir)  # untimed compile absorb
        ts = [run_once(spark, name, sf_dir) for _ in range(reps)]
        print(f"{name}: min={min(ts):.3f}  reps={[round(t,3) for t in ts]}",
              flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
