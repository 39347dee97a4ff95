"""TPC-H-shaped composites, part 2: Q2/Q4/Q6/Q8/Q9/Q11/Q12/Q13/Q15/
Q16/Q17/Q20/Q21/Q22 analogs — completing the full 22-query family
(Q1/Q3/Q5/Q7/Q10/Q14/Q18/Q19 live in plans/relational.py).

"-ish" because the synthetic schema (TESTDATA.md) has no partsupp
table and no commit/receipt dates: lineitem's distinct (partkey,
suppkey) pairs stand in for the part-supplier relation, and
l_returnflag='R' stands in for lateness. Every query keeps the plan
shape that makes the original interesting — min-per-group join-back
(Q2), EXISTS semi join (Q4), scalar-subquery thresholds (Q11/Q15/Q17/
Q22), outer-join histogram (Q13), multi-exists (Q21), anti joins
(Q16/Q22) — with the cross-engine determinism rules from
plans/common.py (decimal sums, double casts at the end, unique ORDER
BY tiebreakers before every LIMIT).

Scale notes: nation/region/supplier (and every per-group aggregate of
them) broadcast; lineitem/orders/customer joins shuffle on their keys;
every scalar threshold is a 1-row aggregate broadcast back. No windows,
no driver loops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from arc_kinesis_tagging_spark.plans.common import Query, dec, dsum
from arc_kinesis_tagging_spark.sources.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, name, sf_dir)


def _rev():
    return dec("l_extendedprice") * (
        F.lit(1).cast("decimal(18,2)") - dec("l_discount")
    )


_REV_SQL = (
    "CAST(l_extendedprice AS DECIMAL(38,2)) * "
    "(CAST(1 AS DECIMAL(38,2)) - CAST(l_discount AS DECIMAL(38,2)))"
)


# --- Q2-ish: min-cost supplier (min-per-group join-back) ---------------------

def q_tpch_q2ish(spark, sf_dir):
    """Q2-shaped: for each small part, the EUROPE supplier(s) offering
    the minimum unit cost (min l_extendedprice/l_quantity over that
    part-supplier's lineitems — the partsupp stand-in). Correlated-min
    shape: per-(part,supp) agg -> per-part min -> equality join back.
    Unit costs are double divisions of identical inputs, bit-equal
    across engines. European supplier set broadcasts both times."""
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    s = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_size") <= 10)
    costs = (
        l.join(F.broadcast(s.select("s_suppkey")), l["l_suppkey"] == F.col("s_suppkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost"))
    )
    minc = costs.groupBy("l_partkey").agg(F.min("unit_cost").alias("min_cost"))
    return (
        costs.join(minc, "l_partkey")
        .filter(F.col("unit_cost") == F.col("min_cost"))
        .join(p, F.col("l_partkey") == p["p_partkey"])
        .join(F.broadcast(s), F.col("l_suppkey") == s["s_suppkey"])
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name",
                F.col("unit_cost").alias("supply_cost"), "s_suppkey")
        .orderBy(F.col("s_acctbal").desc(), F.col("p_partkey").asc(),
                 F.col("s_suppkey").asc())
        .limit(100)
    )


ORACLE_TPCH_Q2 = """
WITH eu AS (
  SELECT s_suppkey, s_name, s_acctbal, n_name
  FROM supplier JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
), costs AS (
  SELECT l_partkey, l_suppkey, MIN(l_extendedprice / l_quantity) AS unit_cost
  FROM lineitem JOIN eu ON l_suppkey = eu.s_suppkey
  GROUP BY l_partkey, l_suppkey
), minc AS (
  SELECT l_partkey, MIN(unit_cost) AS min_cost FROM costs GROUP BY l_partkey
)
SELECT s_acctbal, s_name, n_name, p_partkey, p_name,
       unit_cost AS supply_cost, s_suppkey
FROM costs
JOIN minc USING (l_partkey)
JOIN part ON l_partkey = p_partkey
JOIN eu ON l_suppkey = eu.s_suppkey
WHERE unit_cost = min_cost AND p_size <= 10
ORDER BY s_acctbal DESC, p_partkey ASC, s_suppkey ASC
LIMIT 100
"""


# --- Q4-ish: order priority checking (EXISTS semi join) ----------------------

def q_tpch_q4ish(spark, sf_dir):
    """Q4-shaped: orders placed in 1997H1 having at least one returned
    line (l_returnflag='R' standing in for commit<receipt lateness),
    counted by priority. EXISTS -> left-semi join; the lineitem side
    projects only the join key so the shuffle carries one column."""
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    ret = (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey")
    )
    return (
        o.join(ret, o["o_orderkey"] == ret["l_orderkey"], "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


ORACLE_TPCH_Q4 = """
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate < TIMESTAMP '1997-07-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
GROUP BY o_orderpriority
"""


# --- Q6-ish: forecast revenue change (scan-only filter+agg) ------------------

def q_tpch_q6ish(spark, sf_dir):
    """Q6-shaped: discount revenue in a year/discount/quantity band.
    Pure filter + single-row aggregate — at 100 TB this is the query
    where predicate pushdown and row-group skipping ARE the plan; all
    three predicates reach the parquet scan."""
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.02)
        & (F.col("l_discount") <= 0.06)
        & (F.col("l_quantity") < 24)
    )
    return l.agg(
        F.sum(dec("l_extendedprice") * dec("l_discount"))
        .cast("double")
        .alias("revenue")
    )


ORACLE_TPCH_Q6 = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,2))
                * CAST(l_discount AS DECIMAL(38,2))) AS DOUBLE) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
  AND l_discount >= 0.02 AND l_discount <= 0.06
  AND l_quantity < 24
"""


# --- Q8-ish: national market share (conditional-sum ratio) -------------------

def q_tpch_q8ish(spark, sf_dir):
    """Q8-shaped: NATION_5's share of AMERICA-customer PROMO-part
    revenue by order year. Ratio of two exact decimal conditional sums,
    divided as doubles at the end (one deterministic rounding)."""
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    c = (
        _t(spark, sf_dir, "customer")
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("c_custkey")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem")
    # No otherwise(0): a zero literal of lower scale makes Spark coerce
    # the when/otherwise common type DOWN to that scale (decimal(38,4)
    # revenue + decimal(38,2) zero -> decimal(38,2)), rounding every row
    # before the sum. SUM skips nulls identically in both engines.
    nat_rev = F.when(F.col("supp_nation") == "NATION_5", _rev())
    return (
        l.join(F.broadcast(p), l["l_partkey"] == p["p_partkey"])
        .join(o, l["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(s), l["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n2), s["s_nationkey"] == F.col("s_nkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            (F.sum(nat_rev).cast("double") / F.sum(_rev()).cast("double"))
            .alias("mkt_share")
        )
    )


ORACLE_TPCH_Q8 = f"""
SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
       CAST(SUM(CASE WHEN n2.n_name = 'NATION_5' THEN {_REV_SQL} END) AS DOUBLE)
         / CAST(SUM({_REV_SQL}) AS DOUBLE) AS mkt_share
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN region ON n1.n_regionkey = r_regionkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
WHERE r_name = 'AMERICA' AND p_type = 'PROMO'
GROUP BY year(o_orderdate)
"""


# --- Q9-ish: product type profit (multi-join decimal arithmetic) -------------

def q_tpch_q9ish(spark, sf_dir):
    """Q9-shaped: profit on 'red' parts by supplier nation and year;
    cost = 0.6 * retail price * quantity (the partsupp supplycost
    stand-in), all exact decimal arithmetic until the final cast."""
    n = _t(spark, sf_dir, "nation")
    s = _t(spark, sf_dir, "supplier")
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").contains("red"))
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem")
    amount = _rev() - dec("p_retailprice") * dec("l_quantity") * F.lit(
        0.6
    ).cast("decimal(2,1)")
    return (
        l.join(F.broadcast(p), l["l_partkey"] == p["p_partkey"])
        .join(o, l["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(s), l["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(F.sum(amount).cast("double").alias("sum_profit"))
    )


ORACLE_TPCH_Q9 = f"""
SELECT n_name AS nation, CAST(year(o_orderdate) AS INTEGER) AS o_year,
       CAST(SUM({_REV_SQL}
                - CAST(p_retailprice AS DECIMAL(38,2))
                  * CAST(l_quantity AS DECIMAL(38,2))
                  * CAST(0.6 AS DECIMAL(2,1))) AS DOUBLE) AS sum_profit
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE p_name LIKE '%red%'
GROUP BY n_name, year(o_orderdate)
"""


# --- Q11-ish: important stock (scalar-subquery threshold) --------------------

def q_tpch_q11ish(spark, sf_dir):
    """Q11-shaped: value supplied per part by NATION_2's suppliers,
    keeping parts above a fraction of the nation's total — the scalar
    subquery broadcast as a 1-row threshold. Exact decimal value sums;
    the fraction comparison happens in double on both engines."""
    n = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_2")
    s = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey")
    )
    l = _t(spark, sf_dir, "lineitem")
    vals = (
        l.join(F.broadcast(s), l["l_suppkey"] == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(F.sum(dec("l_extendedprice")).alias("val"))
    )
    total = vals.agg(F.sum("val").alias("total"))
    return (
        vals.crossJoin(F.broadcast(total))
        .filter(
            F.col("val").cast("double") > F.lit(0.002) * F.col("total").cast("double")
        )
        .select("l_partkey", F.col("val").cast("double").alias("part_value"))
    )


ORACLE_TPCH_Q11 = """
WITH nsupp AS (
  SELECT s_suppkey FROM supplier JOIN nation ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_2'
), vals AS (
  SELECT l_partkey, SUM(CAST(l_extendedprice AS DECIMAL(38,2))) AS val
  FROM lineitem JOIN nsupp ON l_suppkey = s_suppkey
  GROUP BY l_partkey
)
SELECT l_partkey, CAST(val AS DOUBLE) AS part_value
FROM vals, (SELECT SUM(val) AS total FROM vals) t
WHERE CAST(val AS DOUBLE) > 0.002 * CAST(total AS DOUBLE)
"""


# --- Q12-ish: shipping priority classes (conditional counts) -----------------

def q_tpch_q12ish(spark, sf_dir):
    """Q12-shaped: urgent vs non-urgent order counts per line status
    for 1998 shipments (linestatus standing in for shipmode)."""
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1999-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


ORACLE_TPCH_Q12 = """
SELECT l_linestatus,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1998-01-01'
  AND l_shipdate < TIMESTAMP '1999-01-01'
GROUP BY l_linestatus
"""


# --- Q13-ish: customer order-count distribution (outer-join histogram) -------

def q_tpch_q13ish(spark, sf_dir):
    """Q13-shaped: distribution of per-customer order counts (orders
    with unspecified priority excluded), customers with zero orders
    included via the left outer join — the double-aggregation shape."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "4-NOT SPECIFIED"
    )
    per_cust = (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


ORACLE_TPCH_Q13 = """
SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
FROM (
  SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
  FROM customer LEFT JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '4-NOT SPECIFIED'
  GROUP BY c_custkey
)
GROUP BY c_count
"""


# --- Q15-ish: top supplier (max-equality scalar subquery) --------------------

def q_tpch_q15ish(spark, sf_dir):
    """Q15-shaped: supplier(s) achieving the maximum 1998H1 revenue.
    The max is a 1-row broadcast; the equality compares exact decimals,
    so ties surface exactly as in the oracle."""
    s = _t(spark, sf_dir, "supplier")
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-07-01").cast("timestamp"))
    )
    revs = l.groupBy("l_suppkey").agg(F.sum(_rev()).alias("total_rev"))
    mx = revs.agg(F.max("total_rev").alias("max_rev"))
    return (
        revs.crossJoin(F.broadcast(mx))
        .filter(F.col("total_rev") == F.col("max_rev"))
        .join(F.broadcast(s), F.col("l_suppkey") == s["s_suppkey"])
        .select(
            "s_suppkey", "s_name", F.col("total_rev").cast("double").alias("total_revenue")
        )
    )


ORACLE_TPCH_Q15 = f"""
WITH revs AS (
  SELECT l_suppkey, SUM({_REV_SQL}) AS total_rev
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1998-01-01'
    AND l_shipdate < TIMESTAMP '1998-07-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_revenue
FROM revs JOIN supplier ON l_suppkey = s_suppkey
WHERE total_rev = (SELECT MAX(total_rev) FROM revs)
"""


# --- Q16-ish: parts/supplier relationship (anti join + distinct count) -------

def q_tpch_q16ish(spark, sf_dir):
    """Q16-shaped: distinct supplier counts per (brand, type, size)
    for small non-PROMO parts outside Brand#1, excluding suppliers in
    deficit (negative acctbal — the complaints stand-in) via an anti
    join on the broadcast supplier dim."""
    l = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey").distinct()
    bad = (
        _t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & (F.col("p_size") <= 15)
    )
    return (
        l.join(F.broadcast(bad), l["l_suppkey"] == F.col("s_suppkey"), "left_anti")
        .join(p, F.col("l_partkey") == p["p_partkey"])
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


ORACLE_TPCH_Q16 = """
SELECT p_brand, p_type, p_size,
       CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO' AND p_size <= 15
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
"""


# --- Q17-ish: small-quantity-order revenue (correlated avg threshold) --------

def q_tpch_q17ish(spark, sf_dir):
    """Q17-shaped: revenue from Brand#2 lineitems below 20% of their
    part's average quantity, scaled to yearly. The per-part average is
    an exact decimal sum / count computed identically on both engines;
    the 0.2 multiply and final /7 happen in double with matched
    parenthesization."""
    p = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#2")
    l = _t(spark, sf_dir, "lineitem")
    lp = l.join(F.broadcast(p.select("p_partkey")), l["l_partkey"] == F.col("p_partkey"))
    avgq = lp.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        (
            F.lit(0.2)
            * (
                F.sum(dec("l_quantity")).cast("double")
                / F.count(F.lit(1)).cast("double")
            )
        ).alias("q_thresh")
    )
    return (
        lp.join(F.broadcast(avgq), lp["l_partkey"] == F.col("t_partkey"))
        .filter(F.col("l_quantity") < F.col("q_thresh"))
        .agg(
            (F.sum(dec("l_extendedprice")).cast("double") / F.lit(7.0))
            .alias("avg_yearly")
        )
    )


ORACLE_TPCH_Q17 = """
WITH lp AS (
  SELECT l_partkey, l_quantity, l_extendedprice
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_brand = 'Brand#2'
), avgq AS (
  SELECT l_partkey AS t_partkey,
         0.2 * (CAST(SUM(CAST(l_quantity AS DECIMAL(38,2))) AS DOUBLE)
                / CAST(COUNT(*) AS DOUBLE)) AS q_thresh
  FROM lp GROUP BY l_partkey
)
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,2))) AS DOUBLE) / 7.0
         AS avg_yearly
FROM lp JOIN avgq ON l_partkey = t_partkey
WHERE l_quantity < q_thresh
"""


# --- Q20-ish: excess-stock suppliers (semi join on aggregated facts) ---------

def q_tpch_q20ish(spark, sf_dir):
    """Q20-shaped: NATION_1 suppliers who moved >60 units of some part
    during 2000 — aggregate the fact table per (supplier, part), filter,
    then semi-join the supplier dim against the qualifying keys."""
    n = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_1")
    s = _t(spark, sf_dir, "supplier").join(
        F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey")
    )
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("2000-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("2001-01-01").cast("timestamp"))
    )
    heavy = (
        l.groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(dec("l_quantity")).alias("sq"))
        .filter(F.col("sq") > 60)
        .select("l_suppkey")
        .distinct()
    )
    return (
        s.join(heavy, s["s_suppkey"] == heavy["l_suppkey"], "left_semi")
        .select("s_suppkey", "s_name", "s_acctbal")
        .orderBy("s_suppkey")
    )


ORACLE_TPCH_Q20 = """
SELECT s_suppkey, s_name, s_acctbal
FROM supplier JOIN nation ON s_nationkey = n_nationkey
WHERE n_name = 'NATION_1'
  AND s_suppkey IN (
    SELECT l_suppkey FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '2000-01-01'
      AND l_shipdate < TIMESTAMP '2001-01-01'
    GROUP BY l_suppkey, l_partkey
    HAVING SUM(CAST(l_quantity AS DECIMAL(38,2))) > 60
  )
ORDER BY s_suppkey
"""


# --- Q21-ish: suppliers who kept orders waiting (multi-exists) ---------------

def q_tpch_q21ish(spark, sf_dir):
    """Q21-shaped: NATION_0 suppliers who were the SOLE returner in a
    multi-supplier order (l_returnflag='R' standing in for late
    delivery). The exists/not-exists pair compiles to one per-order
    aggregate (distinct suppliers, distinct returners) joined back to
    the returned lines — two shuffles on orderkey instead of two
    correlated scans."""
    n = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_0")
    s = _t(spark, sf_dir, "supplier").join(
        F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey")
    )
    l = _t(spark, sf_dir, "lineitem")
    ordagg = l.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(
            F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
        ).alias("n_ret"),
    )
    cand = (
        l.filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    return (
        cand.join(ordagg, "l_orderkey")
        .filter((F.col("n_supp") > 1) & (F.col("n_ret") == 1))
        .join(F.broadcast(s), F.col("l_suppkey") == s["s_suppkey"])
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name").asc())
        .limit(20)
    )


ORACLE_TPCH_Q21 = """
WITH ordagg AS (
  SELECT l_orderkey,
         COUNT(DISTINCT l_suppkey) AS n_supp,
         COUNT(DISTINCT CASE WHEN l_returnflag = 'R' THEN l_suppkey END) AS n_ret
  FROM lineitem GROUP BY l_orderkey
), cand AS (
  SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem WHERE l_returnflag = 'R'
)
SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM cand
JOIN ordagg USING (l_orderkey)
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE n_supp > 1 AND n_ret = 1 AND n_name = 'NATION_0'
GROUP BY s_name
ORDER BY numwait DESC, s_name ASC
LIMIT 20
"""


# --- Q22-ish: global sales opportunity (anti join + global threshold) --------

def q_tpch_q22ish(spark, sf_dir):
    """Q22-shaped: well-funded customers (balance above the positive-
    balance average) dormant since 1999 (the 7-year-no-orders analog),
    by nation. The average is an exact decimal sum / count (1-row
    broadcast); the dormancy test is an anti join on recent orders."""
    c = _t(spark, sf_dir, "customer")
    o = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp"))
        .select("o_custkey")
    )
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(
        (
            F.sum(dec("c_acctbal")).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("avg_bal")
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o, F.col("c_custkey") == o["o_custkey"], "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dsum("c_acctbal").alias("totacctbal"),
        )
    )


ORACLE_TPCH_Q22 = """
SELECT c_nationkey,
       CAST(COUNT(*) AS BIGINT) AS numcust,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(38,2))) AS DOUBLE) AS totacctbal
FROM customer
WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(38,2))) AS DOUBLE)
                          / CAST(COUNT(*) AS DOUBLE)
                   FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '1999-01-01')
GROUP BY c_nationkey
"""


TPCH2_QUERIES = [
    Query("q_tpch_q2ish", q_tpch_q2ish, ORACLE_TPCH_Q2),
    Query("q_tpch_q4ish", q_tpch_q4ish, ORACLE_TPCH_Q4),
    Query("q_tpch_q6ish", q_tpch_q6ish, ORACLE_TPCH_Q6),
    Query("q_tpch_q8ish", q_tpch_q8ish, ORACLE_TPCH_Q8),
    Query("q_tpch_q9ish", q_tpch_q9ish, ORACLE_TPCH_Q9),
    Query("q_tpch_q11ish", q_tpch_q11ish, ORACLE_TPCH_Q11),
    Query("q_tpch_q12ish", q_tpch_q12ish, ORACLE_TPCH_Q12),
    Query("q_tpch_q13ish", q_tpch_q13ish, ORACLE_TPCH_Q13),
    Query("q_tpch_q15ish", q_tpch_q15ish, ORACLE_TPCH_Q15),
    Query("q_tpch_q16ish", q_tpch_q16ish, ORACLE_TPCH_Q16),
    Query("q_tpch_q17ish", q_tpch_q17ish, ORACLE_TPCH_Q17),
    Query("q_tpch_q20ish", q_tpch_q20ish, ORACLE_TPCH_Q20),
    Query("q_tpch_q21ish", q_tpch_q21ish, ORACLE_TPCH_Q21),
    Query("q_tpch_q22ish", q_tpch_q22ish, ORACLE_TPCH_Q22),
]
