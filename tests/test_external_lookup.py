"""Batched external lookup (mapInPandas) — R12's true-external form:
bulk per-batch fetches, missing-key isolation, backend-failure
isolation, and the grouped-agg pandas UDAF surface.

Lookup clients are plain closures (not classes): mapInPandas ships the
function to executors via cloudpickle, and closures over plain data
serialize by value while test-module classes are referenced by module
name the executor can't import.
"""

import pandas as pd
from pyspark.sql import functions as F

from arc_kinesis_tagging_spark.operators.external_lookup import lookup_enrich
from arc_kinesis_tagging_spark.sources.tables import load_table


def test_lookup_batches_and_isolates_missing(spark):
    docs = {i: {"lang": "en", "n": i * 10} for i in range(50)}
    calls = spark.sparkContext.accumulator(0)

    def bulk_get(keys):
        calls.add(1)
        return {k: docs[k] for k in keys if k in docs}

    df = spark.createDataFrame([(i,) for i in range(60)], "doc_id long").coalesce(2)
    out = lookup_enrich(df, "doc_id", bulk_get, "lang string, n long", ["lang", "n"])
    rows = {r["doc_id"]: (r["lang"], r["n"]) for r in out.collect()}
    assert len(rows) == 60
    assert rows[7] == ("en", 70)
    assert rows[55] == (None, None)  # missing key -> null enrichment, no failure
    assert calls.value <= 4  # bulk per Arrow batch, not per key


def test_lookup_backend_failure_isolated(spark):
    def bulk_get(keys):
        if any(k == 666 for k in keys):
            raise RuntimeError("backend exploded")
        return {k: {"lang": "en", "n": k} for k in keys}

    df = spark.createDataFrame([(1,), (666,)], "doc_id long").coalesce(1)
    out = lookup_enrich(df, "doc_id", bulk_get, "lang string, n long", ["lang", "n"])
    rows = {r["doc_id"]: r["lang"] for r in out.collect()}
    # the poisoned batch dead-letters to nulls instead of failing the job
    assert rows == {1: None, 666: None}


def test_grouped_agg_pandas_udaf(spark, sf_dir):
    """Grouped-aggregate pandas UDF (UDAF surface): trimmed mean per
    segment, cross-checked against a pandas model."""

    @F.pandas_udf("double")
    def trimmed_mean(v: pd.Series) -> float:
        lo, hi = v.quantile(0.1), v.quantile(0.9)
        kept = v[(v >= lo) & (v <= hi)]
        return float(kept.mean())

    c = load_table(spark, "customer", sf_dir)
    got = {
        r["c_mktsegment"]: r["tm"]
        for r in c.groupBy("c_mktsegment").agg(trimmed_mean("c_acctbal").alias("tm")).collect()
    }
    pdf = c.select("c_mktsegment", "c_acctbal").toPandas()
    for seg, grp in pdf.groupby("c_mktsegment"):
        v = grp["c_acctbal"]
        lo, hi = v.quantile(0.1), v.quantile(0.9)
        expect = float(v[(v >= lo) & (v <= hi)].mean())
        assert abs(got[seg] - expect) < 1e-9
