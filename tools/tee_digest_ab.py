"""Digest on/off A/B for the exactly-once stream tee (r10 verdict
task 1), measured CORRECTLY across process boundaries.

The first version of this tool set AKT_TEE_DIGEST in the driver
Python AFTER get_session() — but KinesisEmuStreamWriter.commit runs
in a JVM-spawned Python worker whose environment was captured at JVM
launch, so both arms silently measured digest=on (caught by the
round-11 self-review). Each arm therefore runs in its OWN subprocess
with the variable exported BEFORE the session exists; the parent
interleaves nothing — each child is canary-paired internally, so the
normalized comparison is still host-drift-safe.

Usage: python tools/tee_digest_ab.py [reps=3] -> one JSON line.
       (internal) python tools/tee_digest_ab.py --arm on|off [reps]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

sys.path.insert(0, "/root/repo")


def run_arm(reps: int) -> None:
    """Child process: AKT_TEE_DIGEST was exported by the parent BEFORE
    this interpreter started, so the JVM and its sink workers inherit
    it."""
    from arc_kinesis_tagging_spark.session import get_session
    from bench import CANARY, bench_stream_tee, run_once, settle

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_session()
    settle()
    bench_stream_tee(spark, sf_dir)  # warm-up: JVM + fixture
    canary = min(run_once(spark, CANARY, sf_dir) for _ in range(3))
    tee = [bench_stream_tee(spark, sf_dir)[0] for _ in range(3)]
    print(
        json.dumps(
            {
                "arm": os.environ.get("AKT_TEE_DIGEST", "on"),
                "tee_min_s": round(min(tee), 3),
                "tee_all": [round(x, 3) for x in tee],
                "canary_min_s": round(canary, 3),
            }
        )
    )
    spark.stop()


def main() -> None:
    if "--arm" in sys.argv:
        run_arm(int(sys.argv[-1]))
        return
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    out = {}
    for arm in ("on", "off"):
        env = dict(os.environ)
        env["AKT_TEE_DIGEST"] = arm
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--arm", str(reps)],
            env=env,
            capture_output=True,
            text=True,
            timeout=560,
        )
        line = [ln for ln in r.stdout.splitlines() if ln.startswith("{")][-1]
        out[arm] = json.loads(line)
        assert out[arm]["arm"] == arm
    t_on, t_off = out["on"]["tee_min_s"], out["off"]["tee_min_s"]
    c_on, c_off = out["on"]["canary_min_s"], out["off"]["canary_min_s"]
    # canary-normalize the off arm onto the on arm's host state
    t_off_norm = round(t_off * (c_on / c_off), 3) if c_off else t_off
    print(
        json.dumps(
            {
                "tee_digest_on_s": t_on,
                "tee_digest_off_s": t_off,
                "tee_digest_off_s_canary_norm": t_off_norm,
                "digest_share": round((t_on - t_off_norm) / t_on, 4),
                "arms": out,
            }
        )
    )


if __name__ == "__main__":
    main()
