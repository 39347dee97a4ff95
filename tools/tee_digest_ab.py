"""Digest on/off A/B for the exactly-once stream tee (r10 verdict
task 1).

BENCH_r10.json shipped stream_tee_20k as a CONFIRMED regression
(3.467 s vs 2.437 s r09) while the round-10 change on exactly that
path was the intent-content digest (length-framed md5 over every
shard's payloads at plan time, streaming/kinesis_source.py). This
tool measures the digest's actual share ON THE ARTIFACT PATH:
canary-paired min-of-N tee runs with AKT_TEE_DIGEST=on vs off, same
process, interleaved A/B/A/B so host drift hits both arms equally.

Usage: python tools/tee_digest_ab.py [reps=3] -> one JSON line.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, "/root/repo")

from bench import CANARY, bench_stream_tee, run_once, settle  # noqa: E402


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from arc_kinesis_tagging_spark.session import get_session

    spark = get_session()
    settle()
    # warm-up: JVM/codegen + the process-cached source fixture, so
    # neither arm pays first-run costs
    bench_stream_tee(spark, sf_dir)
    on, off, canary = [], [], []
    for _ in range(reps):  # interleaved arms: drift hits both equally
        canary.append(run_once(spark, CANARY, sf_dir))
        os.environ["AKT_TEE_DIGEST"] = "on"
        on.append(bench_stream_tee(spark, sf_dir)[0])
        os.environ["AKT_TEE_DIGEST"] = "off"
        off.append(bench_stream_tee(spark, sf_dir)[0])
    os.environ.pop("AKT_TEE_DIGEST", None)
    t_on, t_off = min(on), min(off)
    print(json.dumps({
        "tee_digest_on_s": round(t_on, 3),
        "tee_digest_off_s": round(t_off, 3),
        "digest_share": round((t_on - t_off) / t_on, 4),
        "canary_min_s": round(min(canary), 3),
        "reps": reps,
        "on_all": [round(x, 3) for x in on],
        "off_all": [round(x, 3) for x in off],
    }))
    spark.stop()


if __name__ == "__main__":
    main()
