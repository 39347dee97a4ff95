"""Round-3 training-corpus pipeline operators.

The corpus-management primitives a 100 TB training-data pipeline runs
daily, each as a first-class registry query:

- deterministic stratified sampling, train/val/test split assignment,
  and shuffle-sharding (reproducible data-loader order) — all keyed on
  the portable md5 hash (``functions/text.py:stable_hash64``) so every
  engine and every run selects the same rows;
- skew-safe join and two-phase salted aggregation as *queries* (the
  operators live in ``operators/skew.py``) whose oracles are the plain
  unsalted SQL — proving row-identical results;
- LATERAL top-k-per-group (the correlated-subquery form of the
  window-rank pattern; Spark 4 and DuckDB both execute the identical
  SQL text);
- int8 embedding scalar quantization (the compression step before
  shipping vectors to an ANN index) with an exact dequantization-error
  oracle;
- mergeable HLL sketches (two-level: per-group sketch, union to
  global) — the distributed-cardinality pattern where exact distinct
  would need a full shuffle of the key space.

Scale notes: sampling/split/shard are narrow map-side projections (no
shuffle except shard-local window ranking, which partitions BY the
shard key and so spreads across the cluster). The salted aggregation's
first phase fans hot groups over 16 sub-keys; with map-side partial
aggregation the extra fan-out costs one narrow recombine of
``n_groups x n_salts`` rows. HLL sketches reduce per group to a
fixed-size (2^lgK bytes) buffer — the 100 TB answer to COUNT(DISTINCT)
over high-cardinality keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from arc_kinesis_tagging_spark.functions.text import stable_hash64, tokens
from arc_kinesis_tagging_spark.operators.skew import salted_join
from arc_kinesis_tagging_spark.plans.common import Query, dec
from arc_kinesis_tagging_spark.sources.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, name, sf_dir)


# Portable DuckDB spelling of stable_hash64 (first 15 hex chars of md5
# as a 60-bit integer). Kept as a format template so every oracle uses
# the exact same construction.
_DUCK_H64 = "CAST(('0x' || substr(md5({expr}), 1, 15)) AS BIGINT)"


def _doc_hash(salt: str) -> F.Column:
    return stable_hash64(F.concat(F.lit(salt + ":"), F.col("doc_id").cast("string")))


def _duck_doc_hash(salt: str) -> str:
    return _DUCK_H64.format(expr=f"'{salt}:' || CAST(doc_id AS VARCHAR)")


# --- deterministic stratified sampling --------------------------------------

def q_sample_stratified(spark, sf_dir):
    """Per-stratum deterministic sampling: each source gets a rate
    (25/50/75 pct, derived from the source name itself so the oracle
    can reproduce it) and a document is kept iff its hash-bucket falls
    under the stratum's rate. Unlike ``df.sample``/``sampleBy`` (seeded
    per-partition RNG — resplitting the input changes the sample), the
    hash-gate selects the same rows on any cluster at any parallelism,
    which is what training-corpus reproducibility actually requires.
    Pure map-side: no shuffle, filter sits directly on the scan."""
    d = _t(spark, sf_dir, "documents")
    rate = (F.pmod(stable_hash64(F.col("source")), F.lit(3)) * 25 + 25).cast("long")
    bucket = F.pmod(_doc_hash("sample"), F.lit(100)).cast("long")
    return (
        d.select(
            "doc_id",
            "source",
            bucket.alias("smp_bucket"),
            rate.alias("stratum_rate"),
        )
        .filter(F.col("smp_bucket") < F.col("stratum_rate"))
    )


ORACLE_SAMPLE_STRATIFIED = f"""
WITH b AS (
  SELECT doc_id, source,
         CAST({_duck_doc_hash('sample')} % 100 AS BIGINT) AS smp_bucket,
         CAST(({_DUCK_H64.format(expr='source')} % 3) * 25 + 25 AS BIGINT) AS stratum_rate
  FROM documents
)
SELECT doc_id, source, smp_bucket, stratum_rate
FROM b WHERE smp_bucket < stratum_rate
"""


# --- train/val/test split assignment ----------------------------------------

def q_split_assign(spark, sf_dir):
    """Deterministic 80/10/10 train/val/test carve: split is a pure
    function of doc_id, so the assignment is stable across reruns,
    repartitions, and engines — documents never leak between splits
    when the corpus is re-processed. Map-side only."""
    d = _t(spark, sf_dir, "documents")
    bucket = F.pmod(_doc_hash("split"), F.lit(100)).cast("long")
    split = (
        F.when(bucket < 80, F.lit("train"))
        .when(bucket < 90, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return d.select(
        "doc_id",
        "lang",
        bucket.alias("split_bucket"),
        split.alias("split"),
    )


ORACLE_SPLIT_ASSIGN = f"""
SELECT doc_id, lang,
       CAST({_duck_doc_hash('split')} % 100 AS BIGINT) AS split_bucket,
       CASE WHEN {_duck_doc_hash('split')} % 100 < 80 THEN 'train'
            WHEN {_duck_doc_hash('split')} % 100 < 90 THEN 'val'
            ELSE 'test' END AS split
FROM documents
"""


# --- deterministic shuffle + shard assignment -------------------------------

def q_shuffle_shard(spark, sf_dir):
    """Deterministic corpus shuffle for data loaders: order documents
    by a keyed hash (a fixed pseudo-random permutation), deal them into
    8 shards, and number positions within each shard. The window
    partitions BY the shard key, so ranking parallelizes across shards
    (each shard's rank is one task's sort — at 100 TB, shard count
    scales with the cluster and no single task sees the whole corpus).
    doc_id tie-break keeps the permutation total."""
    d = _t(spark, sf_dir, "documents")
    h = _doc_hash("shuffle")
    shard = F.pmod(h, F.lit(8)).cast("long")
    base = d.select("doc_id", h.alias("__h"), shard.alias("shard"))
    w = Window.partitionBy("shard").orderBy("__h", "doc_id")
    return base.select(
        "doc_id",
        "shard",
        F.row_number().over(w).cast("long").alias("pos"),
    )


ORACLE_SHUFFLE_SHARD = f"""
WITH b AS (
  SELECT doc_id,
         {_duck_doc_hash('shuffle')} AS h,
         CAST({_duck_doc_hash('shuffle')} % 8 AS BIGINT) AS shard
  FROM documents
)
SELECT doc_id, shard,
       CAST(ROW_NUMBER() OVER (PARTITION BY shard ORDER BY h, doc_id) AS BIGINT) AS pos
FROM b
"""


# --- skew-handling as first-class queries -----------------------------------

def q_join_salted(spark, sf_dir):
    """Salted fact-dim join (operators/skew.py:salted_join): lineitem
    rows fan a hot supplier key over 8 salts; the supplier side is
    replicated once per salt. The oracle is the PLAIN join — salting
    must be row-invisible. At 100 TB this is the fallback when the hot
    side is too big to broadcast and AQE's skew splitting can't help
    (e.g. a single sentinel key dominating)."""
    fact = _t(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_orderkey", "l_linenumber", "l_extendedprice"
    )
    dim = _t(spark, sf_dir, "supplier").selectExpr(
        "s_suppkey AS l_suppkey", "s_name", "s_nationkey"
    )
    j = salted_join(fact, dim, "l_suppkey", n_salts=8)
    return j.select(
        "l_orderkey",
        "l_linenumber",
        "s_name",
        F.col("l_extendedprice").alias("price"),
    )


ORACLE_JOIN_SALTED = """
SELECT l_orderkey, l_linenumber, s_name, l_extendedprice AS price
FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
"""


def q_agg_salted(spark, sf_dir):
    """Two-phase salted aggregation: phase 1 groups by (key, salt) —
    spreading a hot group over 16 reducers — phase 2 recombines the
    per-salt partials. Decimal partials keep the recombine exact, so
    the oracle is the plain GROUP BY. The pattern matters when one
    group holds a double-digit share of a 100 TB table and map-side
    combine alone leaves a straggler reducer."""
    li = _t(spark, sf_dir, "lineitem")
    salt = F.pmod(
        stable_hash64(
            F.concat_ws(
                ":",
                F.col("l_orderkey").cast("string"),
                F.col("l_linenumber").cast("string"),
            )
        ),
        F.lit(16),
    )
    partial = li.groupBy("l_returnflag", "l_linestatus", salt.alias("__salt")).agg(
        F.sum(dec("l_extendedprice")).alias("ps"),
        F.count(F.lit(1)).alias("pn"),
    )
    return (
        partial.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("ps").cast("double").alias("sum_price"),
            F.sum("pn").cast("long").alias("n"),
        )
        .withColumn("avg_price", F.col("sum_price") / F.col("n"))
    )


ORACLE_AGG_SALTED = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,2))) AS DOUBLE) AS sum_price,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,2))) AS DOUBLE) / COUNT(*) AS avg_price
FROM lineitem
GROUP BY l_returnflag, l_linestatus
"""


# --- LATERAL top-k per group ------------------------------------------------

SQL_LATERAL_TOPK = """
SELECT c.c_custkey, c.c_mktsegment, t.o_orderkey, t.o_totalprice
FROM customer c,
LATERAL (SELECT o_orderkey, o_totalprice FROM orders o
         WHERE o.o_custkey = c.c_custkey
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
"""


def q_lateral_topk(spark, sf_dir):
    """Correlated LATERAL subquery (top-2 orders per customer): the
    identical SQL text runs on Spark 4's lateral-join support and on
    the DuckDB oracle. Catalyst rewrites the correlation into a
    DomainJoin + window-rank plan (no per-customer re-execution), so
    the declarative form keeps the set-based physical strategy.
    o_orderkey tie-break makes the top-2 row SET deterministic."""
    for t in ("customer", "orders"):
        _t(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(SQL_LATERAL_TOPK)


# --- int8 embedding quantization --------------------------------------------

def q_embed_quantize(spark, sf_dir):
    """Symmetric int8 scalar quantization of embeddings — the
    compression pass before an ANN index ships vectors to storage
    (4x smaller than float32, inner products stay monotone per vector).
    q = floor(x * scale + 0.5) with scale = 127/max|x| — floor is
    tie-free so both engines produce bit-identical codes (plain
    round() differs between engines on .5 ties). The dequantization
    error is re-derived from x inline (no zip) and 1e-6-quantized, so
    the oracle check is exact. Zero vectors quantize to all-zero via
    the clamped denominator. Map-side only: one narrow projection."""
    e = _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") % 5 == 0)
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    maxabs = F.array_max(F.transform(F.col("embedding"), lambda x: F.abs(x.cast("double"))))
    scale = F.lit(127.0) / F.greatest(maxabs, F.lit(1e-30))
    qcodes = F.transform(v, lambda x: F.floor(x * scale + F.lit(0.5)).cast("long"))
    errq = F.transform(
        v,
        lambda x: F.floor(
            F.abs(x - F.floor(x * scale + F.lit(0.5)) / scale) * 1e6
        ).cast("long"),
    )
    return e.select(
        "vec_id",
        F.size(v).cast("long").alias("n_dims"),
        F.array_max(qcodes).alias("q_max"),
        F.array_min(qcodes).alias("q_min"),
        F.aggregate(errq, F.lit(0).cast("long"), lambda a, x: a + x).alias("err_u6_sum"),
        F.concat_ws(
            "|", F.transform(F.slice(qcodes, 1, 8), lambda x: x.cast("string"))
        ).alias("q_head"),
    )


ORACLE_EMBED_QUANTIZE = """
WITH b AS (
  SELECT vec_id,
         CAST(embedding AS DOUBLE[]) AS v,
         127.0 / GREATEST(list_max(list_transform(CAST(embedding AS DOUBLE[]), x -> abs(x))), 1e-30) AS scale
  FROM embeddings WHERE vec_id % 5 = 0
)
SELECT vec_id,
       CAST(len(v) AS BIGINT) AS n_dims,
       CAST(list_max(list_transform(v, x -> floor(x * scale + 0.5))) AS BIGINT) AS q_max,
       CAST(list_min(list_transform(v, x -> floor(x * scale + 0.5))) AS BIGINT) AS q_min,
       CAST(COALESCE(list_sum(list_transform(v,
            x -> CAST(floor(abs(x - floor(x * scale + 0.5) / scale) * 1e6) AS BIGINT))), 0) AS BIGINT) AS err_u6_sum,
       COALESCE(array_to_string(list_transform(list_slice(v, 1, 8),
            x -> CAST(CAST(floor(x * scale + 0.5) AS BIGINT) AS VARCHAR)), '|'), '') AS q_head
FROM b
"""


# --- mergeable HLL sketches -------------------------------------------------

def q_sketch_hll(spark, sf_dir):
    """Distributed-cardinality sketching: per-source HLL sketch over
    distinct whitespace tokens (lgK=12 -> ~1.6 pct rel. error in 4 KB),
    then a second-level ``hll_union_agg`` merges the per-source
    sketches into one global estimate ('__ALL__' row) WITHOUT touching
    the raw tokens again — the mergeability that makes sketches the
    100 TB replacement for COUNT(DISTINCT) (whose exact form shuffles
    every distinct key). Estimates are engine-specific (Datasketches
    HLL is not reproducible in DuckDB) -> rows-only; accuracy is
    asserted against exact counts in tests/test_pipeline_ops.py."""
    d = _t(spark, sf_dir, "documents")
    toks = d.select("source", F.explode(tokens(F.col("text"))).alias("tok"))
    sk = toks.groupBy("source").agg(F.hll_sketch_agg("tok", 12).alias("sk"))
    per = sk.select("source", F.hll_sketch_estimate("sk").alias("est_distinct"))
    glob = sk.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk", F.lit(True))).alias("est_distinct")
    ).select(F.lit("__ALL__").alias("source"), "est_distinct")
    return per.unionByName(glob)


def q_sample_weighted(spark, sf_dir):
    """Weighted sampling WITHOUT replacement via Efraimidis-Spirakis
    priority sampling: each row draws a deterministic uniform u from
    the portable hash and gets priority u^(1/w) (equivalently ranked by
    ln(u)/w, monotone and overflow-free); the global top-k by priority
    IS a weighted sample without replacement — longer documents
    (w = n_chars + 1) proportionally likelier, yet any row possible.
    The standard way to subsample a corpus by quality/length weight in
    ONE distributed pass: priorities are map-side arithmetic and the
    top-k is TakeOrderedAndProject (no global sort). u is the same
    64-bit-derived double in both engines, so ordering agrees; the
    printed priority is rounded for float-format stability."""
    d = _t(spark, sf_dir, "documents")
    u = (_doc_hash("wsample") + F.lit(1)).cast("double") / F.lit(float(1 << 60))
    prio = F.log(u) / (F.col("n_chars") + F.lit(1)).cast("double")
    return (
        d.select("doc_id", "n_chars", prio.alias("__p"))
        .orderBy(F.col("__p").desc(), F.col("doc_id").asc())
        .limit(20)
        .select("doc_id", "n_chars", F.round("__p", 9).alias("priority9"))
    )


ORACLE_SAMPLE_WEIGHTED = f"""
WITH pri AS (
  SELECT doc_id, n_chars,
         ln(CAST({_duck_doc_hash('wsample')} + 1 AS DOUBLE) / 1152921504606846976.0)
           / CAST(n_chars + 1 AS DOUBLE) AS p
  FROM documents
)
SELECT doc_id, n_chars, ROUND(p, 9) AS priority9
FROM pri
ORDER BY p DESC, doc_id ASC
LIMIT 20
"""


def q_source_mixing(spark, sf_dir):
    """Temperature-based source mixing — the corpus-assembly step that
    decides how many rows each source contributes to a training mix.
    Raw proportional sampling lets one giant crawl drown the small
    high-quality sources; temperature alpha=0.5 reweights source s to
    n_s^0.5 / sum_t n_t^0.5 (the multilingual-sampling convention), and
    a 10,000-row budget turns weights into per-source target counts.

    Everything stays in INTEGER arithmetic so the oracle matches
    bit-for-bit: sqrt is IEEE correctly-rounded (the one transcendental
    that is), scaling by 2^20 is exact, floor lands on a BIGINT; the
    denominator is an integer sum (order-free) and the final targets
    use integer multiply-divide. Plan: one count aggregate per source
    (map-side partial), a 1-row broadcast total, map-side arithmetic —
    no window, no second shuffle; at 100 TB this costs one pass over
    source ids."""
    d = _t(spark, sf_dir, "documents")
    per = d.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    w = F.floor(F.sqrt(F.col("n_docs").cast("double")) * F.lit(1048576)).cast(
        "long"
    )
    weighted = per.select("source", "n_docs", w.alias("__w"))
    denom = weighted.agg(F.sum("__w").alias("__denom"))
    return (
        weighted.crossJoin(F.broadcast(denom))
        .select(
            "source",
            "n_docs",
            # `div`, not `/`: long / long in Spark is DOUBLE division,
            # and a quotient like 123.999… would floor-cast to 123
            # where exact integer division says 124
            F.expr("__w * 1000000L div __denom").alias("weight_ppm"),
            F.expr("__w * 10000L div __denom").alias("target_rows"),
        )
    )


ORACLE_SOURCE_MIXING = """
WITH per AS (
  SELECT source, COUNT(*) AS n_docs FROM documents GROUP BY source
), weighted AS (
  SELECT source, n_docs,
         CAST(FLOOR(SQRT(CAST(n_docs AS DOUBLE)) * 1048576) AS BIGINT) AS w
  FROM per
)
SELECT source, n_docs,
       CAST(w * 1000000 // (SELECT SUM(w) FROM weighted) AS BIGINT) AS weight_ppm,
       CAST(w * 10000 // (SELECT SUM(w) FROM weighted) AS BIGINT) AS target_rows
FROM weighted
"""


def q_quant_calibrate(spark, sf_dir):
    """Per-DIMENSION asymmetric-quantization calibration — the
    companion pass to q_embed_quantize's per-vector symmetric codes:
    before exporting a corpus to uint8, each embedding dimension needs
    its own (min, max, scale, zero_point) from a calibration sweep
    (per-dim ranges differ by orders of magnitude in real encoders;
    one global scale wastes most of the 8-bit range). One posexplode +
    one dimension-keyed aggregate — d groups total, trivially
    parallel, map-side partials carry (min,max) pairs only. Integer
    1e6-quantization of the float outputs keeps the cross-engine hash
    exact; zero_point uses floor (tie-free in both engines)."""
    e = _t(spark, sf_dir, "embeddings")
    dims = e.select(
        F.posexplode(
            F.transform(F.col("embedding"), lambda x: x.cast("double"))
        ).alias("dim", "v")
    )
    agg = dims.groupBy("dim").agg(
        F.min("v").alias("vmin"),
        F.max("v").alias("vmax"),
        F.count(F.lit(1)).alias("n"),
    )
    scale = (F.col("vmax") - F.col("vmin")) / F.lit(255.0)
    zp = F.floor(
        -F.col("vmin") / F.greatest(scale, F.lit(1e-30)) + F.lit(0.5)
    )
    return agg.select(
        F.col("dim").cast("int").alias("dim"),
        "n",
        F.floor(F.col("vmin") * 1e6).cast("long").alias("vmin_q6"),
        F.floor(F.col("vmax") * 1e6).cast("long").alias("vmax_q6"),
        F.floor(scale * 1e9).cast("long").alias("scale_q9"),
        zp.cast("long").alias("zero_point"),
    )


ORACLE_QUANT_CALIBRATE = """
WITH dims AS (
  SELECT generate_subscripts(embedding, 1) - 1 AS dim,
         CAST(UNNEST(embedding) AS DOUBLE) AS v
  FROM embeddings
), agg AS (
  SELECT dim, MIN(v) AS vmin, MAX(v) AS vmax, COUNT(*) AS n
  FROM dims GROUP BY dim
)
SELECT CAST(dim AS INTEGER) AS dim, n,
       CAST(FLOOR(vmin * 1e6) AS BIGINT) AS vmin_q6,
       CAST(FLOOR(vmax * 1e6) AS BIGINT) AS vmax_q6,
       CAST(FLOOR((vmax - vmin) / 255.0 * 1e9) AS BIGINT) AS scale_q9,
       CAST(FLOOR(-vmin / GREATEST((vmax - vmin) / 255.0, 1e-30) + 0.5)
            AS BIGINT) AS zero_point
FROM agg
"""


PIPELINE_QUERIES = [
    Query("q_quant_calibrate", q_quant_calibrate, ORACLE_QUANT_CALIBRATE),
    Query("q_source_mixing", q_source_mixing, ORACLE_SOURCE_MIXING),
    Query("q_sample_weighted", q_sample_weighted, ORACLE_SAMPLE_WEIGHTED),
    Query("q_sample_stratified", q_sample_stratified, ORACLE_SAMPLE_STRATIFIED),
    Query("q_split_assign", q_split_assign, ORACLE_SPLIT_ASSIGN),
    Query("q_shuffle_shard", q_shuffle_shard, ORACLE_SHUFFLE_SHARD),
    Query("q_join_salted", q_join_salted, ORACLE_JOIN_SALTED),
    Query("q_agg_salted", q_agg_salted, ORACLE_AGG_SALTED),
    Query("q_lateral_topk", q_lateral_topk, SQL_LATERAL_TOPK),
    Query("q_embed_quantize", q_embed_quantize, ORACLE_EMBED_QUANTIZE),
    Query("q_sketch_hll", q_sketch_hll, None,
          "Datasketches HLL estimates are engine-private -> rows-only; "
          "tolerance vs exact distinct asserted in tests"),
]
