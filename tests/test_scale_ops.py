"""Scale-path operators: salted skew join equivalence, bucketed join
shuffle elision, grouped-pandas z-score, Python UDTF."""

import pytest
from pyspark.sql import functions as F

from arc_kinesis_tagging_spark.operators.pandas_ops import (
    grouped_zscore,
    register_tokenize_udtf,
)
from arc_kinesis_tagging_spark.operators.skew import (
    bucketed_join,
    salted_join,
    write_bucketed,
)
from arc_kinesis_tagging_spark.sources.tables import load_table


def test_salted_join_equivalence(spark, sf_dir):
    """Salted join returns exactly the rows of the plain join, on a
    deliberately skewed fact table (every key hot)."""
    orders = load_table(spark, "orders", sf_dir)
    customer = load_table(spark, "customer", sf_dir).select("c_custkey", "c_name")
    fact = orders.withColumn("c_custkey", F.col("o_custkey") % 10)  # heavy skew
    plain = fact.join(customer, "c_custkey").select("o_orderkey", "c_name")
    salted = salted_join(fact, customer, "c_custkey", n_salts=8).select(
        "o_orderkey", "c_name"
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_bucketed_join_elides_shuffle(spark, sf_dir):
    orders = load_table(spark, "orders", sf_dir)
    lineitem = load_table(spark, "lineitem", sf_dir).withColumnRenamed(
        "l_orderkey", "o_orderkey"
    )
    write_bucketed(orders, "b_orders", ["o_orderkey"], n_buckets=8)
    write_bucketed(lineitem, "b_lineitem", ["o_orderkey"], n_buckets=8)
    try:
        joined = bucketed_join(spark, "b_orders", "b_lineitem", "o_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan[:2000]
        assert joined.count() == lineitem.count()
    finally:
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_grouped_zscore_matches_window(spark, sf_dir):
    docs = load_table(spark, "customer", sf_dir)
    viaudf = grouped_zscore(docs, "c_mktsegment", "c_acctbal", "c_custkey")
    from pyspark.sql import Window

    w = Window.partitionBy("c_mktsegment")
    viawin = docs.select(
        "c_custkey",
        (
            (F.col("c_acctbal") - F.mean("c_acctbal").over(w))
            / F.stddev_pop("c_acctbal").over(w)
        ).alias("z"),
    )
    a = {r["c_custkey"]: r["z"] for r in viaudf.collect()}
    b = {r["c_custkey"]: r["z"] for r in viawin.collect()}
    assert set(a) == set(b)
    assert all(abs(a[k] - b[k]) < 1e-9 for k in a)


def test_tokenize_udtf(spark):
    register_tokenize_udtf(spark)
    rows = spark.sql(
        "SELECT t.pos, t.token FROM (SELECT 'a b c' AS txt), LATERAL tokenize(txt) t"
    ).collect()
    assert [(r["pos"], r["token"]) for r in rows] == [(0, "a"), (1, "b"), (2, "c")]


def test_minhash_vs_exact_harness_bounds(spark, sf_dir):
    """The LSH-quality harness must report coherent set arithmetic
    (intersection <= both sides) and a recall the banded parameters
    are tuned for (>= 0.5 on the synthetic near-dup corpus)."""
    from arc_kinesis_tagging_spark.plans.llmops import q_minhash_vs_exact

    r = q_minhash_vs_exact(spark, sf_dir).collect()[0]
    assert r["n_intersect"] <= r["n_minhash"]
    assert r["n_intersect"] <= r["n_exact"]
    assert 0.0 <= r["precision"] <= 1.0
    assert 0.0 <= r["recall"] <= 1.0
    if r["n_exact"] > 0:
        assert r["recall"] >= 0.5, r


def test_ann_recall_harness_bounds(spark, sf_dir):
    """IVF recall@5 over the probe set: per-query recall in [0,1],
    nprobe=4/16 cells must beat random cell selection (>= 0.5 mean)."""
    from arc_kinesis_tagging_spark.plans.llmops import q_ann_recall

    r = q_ann_recall(spark, sf_dir).collect()[0]
    assert r["n_queries"] > 0
    assert 0.0 <= r["min_recall_at_5"] <= 1.0
    assert r["mean_recall_at_5"] >= 0.5, r
