"""Parallelism witness for spread_small_scan (round-15 verdict task 5).

The sf0.1 fixtures are single-row-group parquet, so every scan arrives
as ONE partition and the conditional spreads fire — but at that SF the
kernels finish in O(seconds) on one core and the extra Exchange cannot
show a win (the r14 scaling data had the spread queries running FASTER
at 8 cores than 32). This tool gives the spread a measurable workload:

- amplifies sf0.1 documents K-fold (deterministic, no RNG: replica i of
  a doc appends i salt tokens, same scheme as tools/scale_smoke.py)
  into a SINGLE-FILE, SINGLE-ROW-GROUP parquet under /tmp — the exact
  adversarial layout the spread exists for (unsplittable scan);
- times each spread-bearing registry query on that input, noop sink,
  bench.run_once methodology, min over reps, in three configs:
    32 cores / spread ON   (current code)
    32 cores / spread OFF  (spread monkeypatched to identity)
     8 cores / spread ON
- prints a table: the spread's value is ON-vs-OFF at 32 cores, and the
  8c/32c ratio witnesses that the parallelism is real.

Scratch outputs only; never touches /root/testdata. Not part of
bench.py — the driver's bench contract is unchanged.

Usage: python tools/spread_witness.py [K] [--cpus N] [--no-spread]
       (one process per config; the runner script below re-execs
        itself with the right env)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")

K_DEFAULT = 20
AMP_DIR = "/tmp/sfamp"
SRC = "/root/testdata/sf0.1"

# spread-bearing query paths (post-r14 gating): heaviest first
WITNESS_QUERIES = [
    "q_dedup_minhash",
    "q_dedup_jaccard_prefix",
    "q_contamination",
    "q_ngram_lm_score",
    "q_lm_buckets",
    "q_text_repetition",
    "q_dedup_simhash_incremental",
]


def build_fixture(k: int) -> None:
    """Amplified documents as ONE parquet file with ONE row group +
    symlinks for every other table (the witness queries only scan
    documents, but builders may load side tables)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(AMP_DIR, exist_ok=True)
    marker = os.path.join(AMP_DIR, f".k{k}")
    if os.path.exists(marker):
        return
    src = pq.read_table(os.path.join(SRC, "documents.parquet"))
    docs = src.to_pylist()
    n = len(docs)
    out = []
    for i in range(k):
        salt = " ".join(f"w{i}salt{j}" for j in range(i))
        for d in docs:
            r = dict(d)
            r["doc_id"] = d["doc_id"] + i * 10 * n
            if salt:
                r["text"] = d["text"] + " " + salt
                r["n_chars"] = len(r["text"])
            out.append(r)
    tbl = pa.Table.from_pylist(out, schema=src.schema)
    pq.write_table(
        tbl,
        os.path.join(AMP_DIR, "documents.parquet"),
        row_group_size=len(out),  # ONE row group: unsplittable scan
    )
    for name in os.listdir(SRC):
        if name != "documents.parquet":
            dst = os.path.join(AMP_DIR, name)
            if not os.path.exists(dst):
                os.symlink(os.path.join(SRC, name), dst)
    open(marker, "w").close()


def run_config(cpus: int, spread: bool, reps: int, queries) -> dict:
    """Child-process body: one Spark session, min-of-reps per query."""
    os.environ["SPARK_GRAFT_CPUS"] = str(cpus)
    from arc_kinesis_tagging_spark.session import get_session

    if not spread:
        # identity-patch BOTH binding sites: the skew module attribute
        # (resolved at call time by quality_ops/llmops) and dedup's
        # import-time alias.
        from arc_kinesis_tagging_spark.operators import dedup, skew

        skew.spread_small_scan = lambda df: df
        dedup._spread_small_scan = lambda df: df

    import bench

    spark = get_session("spread-witness")
    # Arrow worker-pool warm-up, same as bench main
    spark.range(64).repartition(int(cpus)).mapInPandas(
        lambda it: (p for p in it), "id long"
    ).write.format("noop").mode("overwrite").save()
    out = {}
    for name in queries:
        ts = [bench.run_once(spark, name, AMP_DIR) for _ in range(reps)]
        out[name] = round(min(ts), 3)
    spark.stop()
    return out


def main() -> None:
    if "--child" in sys.argv:
        i = sys.argv.index("--child")
        cpus, spread = int(sys.argv[i + 1]), sys.argv[i + 2] == "on"
        reps = int(sys.argv[i + 3])
        queries = sys.argv[i + 4].split(",")
        print(json.dumps(run_config(cpus, spread, reps, queries)))
        return

    k = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else K_DEFAULT
    reps = 2
    build_fixture(k)
    configs = [(32, "on"), (32, "off"), (8, "on")]
    results = {}
    for cpus, spread in configs:
        t0 = time.time()
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child",
             str(cpus), spread, str(reps), ",".join(WITNESS_QUERIES)],
            capture_output=True, text=True, cwd="/root/repo",
        )
        line = p.stdout.strip().splitlines()[-1] if p.stdout.strip() else "{}"
        results[(cpus, spread)] = json.loads(line)
        print(f"# config cpus={cpus} spread={spread} done in {time.time()-t0:.0f}s",
              file=sys.stderr)
    hdr = f"{'query':32s} {'32c/on':>8s} {'32c/off':>8s} {'8c/on':>8s} {'off/on':>7s} {'8c/32c':>7s}"
    print(hdr)
    for q in WITNESS_QUERIES:
        a = results[(32, 'on')].get(q)
        b = results[(32, 'off')].get(q)
        c = results[(8, 'on')].get(q)
        print(f"{q:32s} {a:8.2f} {b:8.2f} {c:8.2f} "
              f"{(b / a if a else 0):7.2f} {(c / a if a else 0):7.2f}")
    with open("/tmp/spread_witness.json", "w") as fh:
        json.dump({f"{c}_{s}": v for (c, s), v in results.items()}, fh, indent=1)


if __name__ == "__main__":
    main()
