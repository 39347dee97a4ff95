"""Second relational batch: pivot, subqueries, recursive CTE, extended
scalar families, and vector aggregation — all DuckDB-oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from arc_kinesis_tagging_spark.plans.common import Query, dec
from arc_kinesis_tagging_spark.sources.tables import load_table


def _t(spark, sf_dir, name):
    return load_table(spark, name, sf_dir)


def q_pivot(spark, sf_dir):
    """Pivot (explicit value list — at scale never let Spark scan for
    distinct pivot values); oracle is the equivalent conditional
    aggregation with FILTER."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.sum(dec("o_totalprice")).cast("double"))
    )


ORACLE_PIVOT = """
SELECT o_orderpriority,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(38,2))) FILTER (WHERE o_orderstatus='F') AS DOUBLE) AS "F",
       CAST(SUM(CAST(o_totalprice AS DECIMAL(38,2))) FILTER (WHERE o_orderstatus='O') AS DOUBLE) AS "O",
       CAST(SUM(CAST(o_totalprice AS DECIMAL(38,2))) FILTER (WHERE o_orderstatus='P') AS DOUBLE) AS "P"
FROM orders GROUP BY o_orderpriority
"""


def q_scalar_subquery(spark, sf_dir):
    """Scalar + correlated subqueries through the SQL surface."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("sq_orders")
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice
        FROM sq_orders
        WHERE o_totalprice > 2 * (SELECT AVG(o_totalprice) FROM sq_orders)
        """
    )


ORACLE_SCALAR_SUBQUERY = """
SELECT o_orderkey, o_totalprice
FROM orders
WHERE o_totalprice > 2 * (SELECT AVG(o_totalprice) FROM orders)
"""


def q_recursive_cte(spark, sf_dir):
    """Recursive CTE (Spark 4 WITH RECURSIVE) — series generation joined
    back to a dimension."""
    _t(spark, sf_dir, "nation").createOrReplaceTempView("rc_nation")
    return spark.sql(
        """
        WITH RECURSIVE seq(n) AS (
          SELECT 0 UNION ALL SELECT n + 1 FROM seq WHERE n < 24
        )
        SELECT n, n_name FROM seq JOIN rc_nation ON n_nationkey = n
        """
    )


ORACLE_RECURSIVE = """
WITH RECURSIVE seq(n) AS (
  SELECT 0 UNION ALL SELECT n + 1 FROM seq WHERE n < 24
)
SELECT n, n_name FROM seq JOIN nation ON n_nationkey = n
"""


def q_string_funcs2(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.lpad("c_mktsegment", 12, ".").alias("seg_lpad"),
        F.rpad("c_mktsegment", 12, ".").alias("seg_rpad"),
        F.trim(F.concat(F.lit("  "), F.col("c_mktsegment"), F.lit(" "))).alias("seg_trim"),
        F.reverse(F.col("c_name")).alias("name_rev"),
        F.repeat(F.col("c_mktsegment"), 2).alias("seg_twice"),
        F.split_part(F.col("c_name"), F.lit("#"), F.lit(2)).alias("name_num"),
        F.translate(F.col("c_mktsegment"), "AEIOU", "aeiou").alias("seg_novowel"),
        F.expr("left(c_name, 4)").alias("name_left"),
        F.expr("right(c_name, 3)").alias("name_right"),
    )


ORACLE_STRING2 = """
SELECT c_custkey,
       LPAD(c_mktsegment, 12, '.') AS seg_lpad,
       RPAD(c_mktsegment, 12, '.') AS seg_rpad,
       TRIM('  ' || c_mktsegment || ' ') AS seg_trim,
       REVERSE(c_name) AS name_rev,
       REPEAT(c_mktsegment, 2) AS seg_twice,
       SPLIT_PART(c_name, '#', 2) AS name_num,
       TRANSLATE(c_mktsegment, 'AEIOU', 'aeiou') AS seg_novowel,
       LEFT(c_name, 4) AS name_left,
       RIGHT(c_name, 3) AS name_right
FROM customer
"""


def q_conditional_funcs(spark, sf_dir):
    l = _t(spark, sf_dir, "lineitem")
    return l.select(
        "l_orderkey",
        "l_linenumber",
        F.greatest("l_quantity", F.col("l_discount") * 100).alias("g"),
        F.least("l_tax", "l_discount").alias("lst"),
        F.nullif(F.col("l_returnflag"), F.lit("N")).alias("flag_or_null"),
        F.coalesce(F.nullif(F.col("l_returnflag"), F.lit("N")), F.lit("none")).alias("flag_coal"),
        F.when(F.col("l_quantity") > 25, "big").otherwise("small").alias("size_class"),
    )


ORACLE_CONDITIONAL = """
SELECT l_orderkey, l_linenumber,
       GREATEST(l_quantity, l_discount * 100) AS g,
       LEAST(l_tax, l_discount) AS lst,
       NULLIF(l_returnflag, 'N') AS flag_or_null,
       COALESCE(NULLIF(l_returnflag, 'N'), 'none') AS flag_coal,
       CASE WHEN l_quantity > 25 THEN 'big' ELSE 'small' END AS size_class
FROM lineitem
"""


def q_bitwise_funcs(spark, sf_dir):
    l = _t(spark, sf_dir, "lineitem")
    k = F.col("l_orderkey")
    ln = F.col("l_linenumber").cast("long")
    return l.select(
        "l_orderkey",
        "l_linenumber",
        k.bitwiseAND(ln).alias("band"),
        k.bitwiseOR(ln).alias("bor"),
        k.bitwiseXOR(ln).alias("bxor"),
        F.shiftleft(ln, 3).alias("shl"),
        F.shiftright(k, 2).alias("shr"),
    )


ORACLE_BITWISE = """
SELECT l_orderkey, l_linenumber,
       l_orderkey & CAST(l_linenumber AS BIGINT) AS band,
       l_orderkey | CAST(l_linenumber AS BIGINT) AS bor,
       xor(l_orderkey, CAST(l_linenumber AS BIGINT)) AS bxor,
       CAST(l_linenumber AS BIGINT) << 3 AS shl,
       l_orderkey >> 2 AS shr
FROM lineitem
"""


def q_cast_funcs(spark, sf_dir):
    """Casting family incl. try_cast lenient failure -> null."""
    ev = _t(spark, sf_dir, "events")
    mixed = F.when(F.col("event_id") % 4 == 0, F.lit("not-a-number")).otherwise(
        F.col("event_id").cast("string")
    )
    return ev.select(
        "event_id",
        F.col("event_id").cast("string").alias("id_str"),
        # double -> string via decimal: raw double rendering diverges
        # between engines at large magnitudes (Spark '1.0E15' vs
        # DuckDB '1000000000000000.0'); fixed-scale decimal text is
        # identical in both
        F.col("value").cast("decimal(38,6)").cast("string").alias("val_str"),
        mixed.try_cast("long").alias("maybe_num"),
        F.col("ts").cast("date").cast("string").alias("day_str"),
    )


ORACLE_CAST = """
SELECT event_id,
       CAST(event_id AS VARCHAR) AS id_str,
       CAST(CAST(value AS DECIMAL(38,6)) AS VARCHAR) AS val_str,
       TRY_CAST(CASE WHEN event_id % 4 = 0 THEN 'not-a-number'
                     ELSE CAST(event_id AS VARCHAR) END AS BIGINT) AS maybe_num,
       CAST(CAST(CAST(ts AS TIMESTAMP) AS DATE) AS VARCHAR) AS day_str
FROM events
"""


def q_vector_centroid(spark, sf_dir):
    """Per-label centroid of embeddings, exploded as (label, pos, c):
    position-wise grouped mean — the aggregation primitive behind IVF
    training and class prototypes. Decimal-internal sums for
    order-independence (plans/common.py)."""
    e = _t(spark, sf_dir, "embeddings")
    ex = e.select(
        "label", F.posexplode("embedding").alias("pos0", "v")
    ).select(
        "label",
        (F.col("pos0") + 1).alias("pos"),
        # explicit 1e-6 quantization: floor is tie-free, so the sum is
        # an exact integer in both engines (decimal casts of floats
        # round differently across engines at the scale boundary)
        F.floor(F.col("v").cast("double") * 1000000).cast("long").alias("vq"),
    )
    return ex.groupBy("label", "pos").agg(
        (F.sum("vq").cast("double") / (F.count(F.lit(1)) * 1000000.0)).alias("c")
    )


ORACLE_VECTOR_CENTROID = """
SELECT label, CAST(pos AS INTEGER) AS pos,
       CAST(SUM(CAST(FLOOR(CAST(v AS DOUBLE) * 1000000) AS BIGINT)) AS DOUBLE)
         / (COUNT(*) * 1000000.0) AS c
FROM (
  SELECT label, generate_subscripts(embedding, 1) AS pos, UNNEST(embedding) AS v
  FROM embeddings
)
GROUP BY label, pos
"""


def q_vector_normalize(spark, sf_dir):
    """L2-normalized embeddings, exploded (vec_id, pos, nv rounded) —
    the projection every cosine pipeline does once upfront so queries
    become plain dot products.

    The norm denominator is clamped (greatest(norm, 1e-12)): a zero
    vector would otherwise abort the whole job under ANSI mode
    (DIVIDE_BY_ZERO) — with the clamp it normalizes to all-zero, the
    same convention as cosine_similarity's zero-norm guard. The oracle
    mirrors the clamp."""
    from arc_kinesis_tagging_spark.functions.vectors import l2_norm

    e = _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 100)
    denom = F.greatest(l2_norm(F.col("embedding")), F.lit(1e-12))
    normed = e.select(
        "vec_id",
        F.transform(
            "embedding", lambda v: F.round(v.cast("double") / denom, 6)
        ).alias("nv"),
    )
    return normed.select("vec_id", F.posexplode("nv").alias("pos0", "nv")).select(
        "vec_id", (F.col("pos0") + 1).alias("pos"), "nv"
    )


ORACLE_VECTOR_NORMALIZE = """
WITH norms AS (
  SELECT vec_id, embedding,
         GREATEST(sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x))), 1e-12) AS nrm
  FROM embeddings WHERE vec_id < 100
)
SELECT vec_id, CAST(pos AS INTEGER) AS pos, ROUND(CAST(v AS DOUBLE) / nrm, 6) AS nv
FROM (
  SELECT vec_id, nrm, generate_subscripts(embedding, 1) AS pos, UNNEST(embedding) AS v
  FROM norms
)
"""


RELATIONAL2_QUERIES = [
    Query("q_pivot", q_pivot, ORACLE_PIVOT),
    Query("q_scalar_subquery", q_scalar_subquery, ORACLE_SCALAR_SUBQUERY),
    Query("q_recursive_cte", q_recursive_cte, ORACLE_RECURSIVE),
    Query("q_string_funcs2", q_string_funcs2, ORACLE_STRING2),
    Query("q_conditional_funcs", q_conditional_funcs, ORACLE_CONDITIONAL),
    Query("q_bitwise_funcs", q_bitwise_funcs, ORACLE_BITWISE),
    Query("q_cast_funcs", q_cast_funcs, ORACLE_CAST),
    Query("q_vector_centroid", q_vector_centroid, ORACLE_VECTOR_CENTROID),
    Query("q_vector_normalize", q_vector_normalize, ORACLE_VECTOR_NORMALIZE),
]
