"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Runs every registry query on Spark and (where an oracle exists) the
oracle SQL on DuckDB over the same parquet dir, then compares:
row count, sorted column names, and order-insensitive row multiset
(exact equality — if floats differ even by an ulp we want to see it
here and fix the query's determinism, not paper over it).

Usage: python tools/verify_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time
import traceback

sys.path.insert(0, "/root/repo")

import duckdb

from arc_kinesis_tagging_spark.plans.registry import QUERIES
from arc_kinesis_tagging_spark.session import get_session
from arc_kinesis_tagging_spark.sources.tables import TABLES


def canon_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if hasattr(v, "timestamp") and not isinstance(v, (int, str)):  # datetime-like
        return str(v)
    return str(v)


def canon_rows(df):
    cols = sorted(df.columns)
    rows = [tuple(canon_cell(r[c]) for c in cols) for r in df.to_dict("records")]
    return cols, sorted(rows, key=lambda t: tuple("" if x is None else str(x) for x in t))


def driver_canon_check(df):
    """Replicate the DRIVER's canonicalizer, which sorts raw cells via
    pandas ``sort_values`` — list/dict/ndarray cells make it throw
    ``TypeError: unhashable type``. Our own canon stringifies cells, so
    without this pre-check a query can pass locally and crash the
    driver's gate (that is exactly what happened to q_array_funcs /
    q_collect_agg in round 1). Raise here so it fails loudly locally."""
    if len(df):
        df.sort_values(by=sorted(df.columns)).head(1)


def main():
    # --reps N re-runs each selected query N times: the flake-check
    # for the nondeterminism class that passes single runs (float-SUM
    # addition order in parallel aggregation, unquantized argmin ties
    # — see memory/cross-engine-determinism-rules). Every rep must
    # pass independently.
    args = sys.argv[1:]
    reps = 1
    if "--reps" in args:
        i = args.index("--reps")
        reps = int(args[i + 1])
        args = args[:i] + args[i + 2:]
    sf_dir = args[0] if args else "/root/testdata/sf0.001"
    only = set(args[1:])
    spark = get_session("verify-oracle")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    n_pass = n_fail = n_rows_only = 0
    targets = [
        (name, q)
        for name, q in QUERIES.items()
        if not only or name in only
        for _ in range(reps)
    ]
    for name, q in targets:
        t0 = time.time()
        try:
            sdf = q.builder(spark, sf_dir).toPandas()
        except Exception:
            print(f"FAIL {name}: spark error")
            traceback.print_exc(limit=3)
            n_fail += 1
            continue
        try:
            driver_canon_check(sdf)
        except TypeError as e:
            print(f"FAIL {name}: driver canonicalizer would crash: {e} "
                  "(non-scalar output column? serialize it)")
            n_fail += 1
            continue
        if q.oracle is None:
            print(f"ROWS {name}: {len(sdf)} rows ({time.time()-t0:.1f}s) [rows-only]")
            n_rows_only += 1
            continue
        try:
            odf = con.execute(q.oracle).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        scols, srows = canon_rows(sdf)
        ocols, orows = canon_rows(odf)
        if scols != ocols:
            print(f"FAIL {name}: columns spark={scols} oracle={ocols}")
            n_fail += 1
            continue
        if len(srows) != len(orows):
            print(f"FAIL {name}: rowcount spark={len(srows)} oracle={len(orows)}")
            n_fail += 1
            continue
        if srows != orows:
            diffs = [(a, b) for a, b in zip(srows, orows) if a != b]
            print(f"FAIL {name}: {len(diffs)}/{len(srows)} rows differ; first: ")
            print("   spark :", diffs[0][0])
            print("   oracle:", diffs[0][1])
            n_fail += 1
            continue
        print(f"PASS {name}: {len(srows)} rows ({time.time()-t0:.1f}s)")
        n_pass += 1
    print(f"\n== {n_pass} pass, {n_fail} fail, {n_rows_only} rows-only ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
