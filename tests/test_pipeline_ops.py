"""Property tests for the round-3 corpus-pipeline operators
(plans/pipeline_ops.py). Oracle equality is covered by the parametrized
gate in test_oracles.py; these tests assert the properties the oracles
cannot express: sketch accuracy vs exact counts, split/shard totality,
quantization code range, and repartition-invariance of the hash
selections."""

import pytest
from pyspark.sql import functions as F

from arc_kinesis_tagging_spark.plans.pipeline_ops import (
    q_agg_salted,
    q_embed_quantize,
    q_lateral_topk,
    q_sample_stratified,
    q_shuffle_shard,
    q_sketch_hll,
    q_split_assign,
)
from arc_kinesis_tagging_spark.functions.text import tokens
from arc_kinesis_tagging_spark.sources.tables import load_table


def test_hll_estimates_within_tolerance(spark, sf_dir):
    """lgK=12 HLL has ~1.6% relative standard error; assert every
    per-source estimate and the merged __ALL__ row land within 5% of
    the exact distinct-token count."""
    est = {r["source"]: r["est_distinct"] for r in q_sketch_hll(spark, sf_dir).collect()}
    d = load_table(spark, "documents", sf_dir)
    toks = d.select("source", F.explode(tokens(F.col("text"))).alias("tok"))
    exact = {
        r["source"]: r["n"]
        for r in toks.groupBy("source")
        .agg(F.countDistinct("tok").alias("n"))
        .collect()
    }
    exact["__ALL__"] = toks.select("tok").distinct().count()
    assert set(est) == set(exact)
    for src, n in exact.items():
        assert abs(est[src] - n) <= max(1, 0.05 * n), (src, est[src], n)


def test_split_assign_total_and_proportioned(spark, sf_dir):
    out = q_split_assign(spark, sf_dir)
    n_docs = load_table(spark, "documents", sf_dir).count()
    counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == n_docs  # every doc in exactly one split
    # 80/10/10 within 5 binomial standard deviations (n=500 -> sd~9)
    assert abs(counts["train"] - 0.8 * n_docs) < 5 * (0.8 * 0.2 * n_docs) ** 0.5 + 1
    assert counts["val"] > 0 and counts["test"] > 0


def test_shuffle_shard_positions_are_dense(spark, sf_dir):
    """Within every shard, positions must be exactly 1..shard_size (a
    dense permutation), and shards must partition the corpus."""
    out = q_shuffle_shard(spark, sf_dir)
    n_docs = load_table(spark, "documents", sf_dir).count()
    per = (
        out.groupBy("shard")
        .agg(F.count("*").alias("n"), F.min("pos").alias("lo"), F.max("pos").alias("hi"),
             F.countDistinct("pos").alias("npos"))
        .collect()
    )
    assert sum(r["n"] for r in per) == n_docs
    for r in per:
        assert (r["lo"], r["hi"], r["npos"]) == (1, r["n"], r["n"]), r
    assert out.select("doc_id").distinct().count() == n_docs


def test_sample_stratified_repartition_invariant(spark, sf_dir):
    """The hash-gate must select the same rows regardless of input
    partitioning (the property seeded df.sample does NOT have)."""
    base = sorted(r["doc_id"] for r in q_sample_stratified(spark, sf_dir).collect())
    d = load_table(spark, "documents", sf_dir).repartition(13, "lang")
    from arc_kinesis_tagging_spark.functions.text import stable_hash64

    rate = (F.pmod(stable_hash64(F.col("source")), F.lit(3)) * 25 + 25).cast("long")
    bucket = F.pmod(
        stable_hash64(F.concat(F.lit("sample:"), F.col("doc_id").cast("string"))),
        F.lit(100),
    ).cast("long")
    re = sorted(
        r["doc_id"] for r in d.filter(bucket < rate).select("doc_id").collect()
    )
    assert base == re


def test_embed_quantize_code_range_and_zero_vector(spark, sf_dir):
    rows = q_embed_quantize(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert -127 <= r["q_min"] <= r["q_max"] <= 127
        assert r["err_u6_sum"] >= 0
    # synthetic zero vector (vec_id=0 passes the %5 filter) quantizes
    # to all-zero codes with zero error via the clamped denominator
    import os
    import tempfile

    tmp = tempfile.mkdtemp(prefix="quantize-zero-")
    spark.createDataFrame(
        [(0, [0.0] * 8)], "vec_id long, embedding array<float>"
    ).write.mode("overwrite").parquet(os.path.join(tmp, "embeddings.parquet"))
    [r] = q_embed_quantize(spark, tmp).collect()
    assert r["q_min"] == r["q_max"] == 0
    assert r["err_u6_sum"] == 0
    assert r["q_head"] == "|".join(["0"] * 8)


def test_lateral_topk_is_top2_per_customer(spark, sf_dir):
    out = q_lateral_topk(spark, sf_dir)
    per = out.groupBy("c_custkey").agg(F.count("*").alias("n")).collect()
    assert all(1 <= r["n"] <= 2 for r in per)
    # each customer's rows are its max-price orders: spot-check via join
    o = load_table(spark, "orders", sf_dir)
    best = (
        o.groupBy("o_custkey").agg(F.max("o_totalprice").alias("mx"))
        .withColumnRenamed("o_custkey", "c_custkey")
    )
    top1 = out.groupBy("c_custkey").agg(F.max("o_totalprice").alias("got"))
    bad = top1.join(best, "c_custkey").filter(F.col("got") != F.col("mx")).count()
    assert bad == 0


def test_agg_salted_matches_plain(spark, sf_dir):
    li = load_table(spark, "lineitem", sf_dir)
    from arc_kinesis_tagging_spark.plans.common import dec

    plain = {
        (r["l_returnflag"], r["l_linestatus"]): (float(r["s"]), r["n"])
        for r in li.groupBy("l_returnflag", "l_linestatus")
        .agg(F.sum(dec("l_extendedprice")).cast("double").alias("s"), F.count("*").alias("n"))
        .collect()
    }
    salted = {
        (r["l_returnflag"], r["l_linestatus"]): (float(r["sum_price"]), r["n"])
        for r in q_agg_salted(spark, sf_dir).collect()
    }
    assert plain == salted
