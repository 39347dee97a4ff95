"""Relational operator queries (SURVEY.md §2.B): scans, joins, aggs,
windows, set ops, scalar functions — each with a DuckDB oracle.

Every builder takes (spark, sf_dir) and returns a DataFrame whose
column names match the oracle SQL exactly (the driver sorts columns by
name before value-hashing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from arc_kinesis_tagging_spark.operators.joins import asof_join, interval_join
from arc_kinesis_tagging_spark.plans.common import Query, dec, dsum
from arc_kinesis_tagging_spark.sources.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, name, sf_dir)


# --- scans / projection / filter -------------------------------------------

def q_scan_parquet(spark, sf_dir):
    """Filtered projected scan; predicate + column pruning reach parquet
    (PushedFilters in .explain — the opposite of the reference's
    decode-everything-then-filter at app.py:33-56)."""
    return (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_size") > 30)
        .select("p_partkey", "p_name", "p_size")
    )


def q_filter_project(spark, sf_dir):
    """Conjunctive filter + projection with computed column — the batch
    port of the reference's predicate at app.py:56 and 9-field
    projection at app.py:57-67."""
    return (
        _t(spark, sf_dir, "events")
        .filter((F.col("event_type") == "purchase") & (F.col("value") > 50.0))
        .select(
            "event_id",
            "user_id",
            "value",
            (F.col("value") * F.lit(0.92)).alias("value_eur"),
        )
    )


def q_json_extract(spark, sf_dir):
    """JSON field extraction from a string column (reference app.py:40-42
    parses whole documents; here extraction is expression-level)."""
    return _t(spark, sf_dir, "events").select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("k"),
    )


def q_corrupt_routing(spark, sf_dir):
    """PERMISSIVE parse + dead-letter routing, the port of the
    oversized-record fallback at app.py:42-46: unparseable payloads are
    wrapped as {'url': raw} instead of failing the stream."""
    ev = _t(spark, sf_dir, "events").select(
        "event_id",
        F.when(F.col("event_id") % 3 == 0, F.col("props"))
        .when(
            F.col("event_id") % 3 == 1,
            F.concat(F.lit("s3://big-docs/"), F.col("event_id").cast("string")),
        )
        .otherwise(F.lit("garbage{"))
        .alias("raw"),
    )
    k = F.get_json_object("raw", "$.k").cast("long")
    return ev.select(
        "event_id",
        k.alias("k"),
        F.when(k.isNull(), F.col("raw")).alias("url"),
        k.isNull().alias("is_dead_letter"),
    )


ORACLE_CORRUPT = """
WITH ev AS (
  SELECT event_id,
         CASE
           WHEN event_id % 3 = 0 THEN props
           WHEN event_id % 3 = 1 THEN 's3://big-docs/' || CAST(event_id AS VARCHAR)
           ELSE 'garbage{'
         END AS raw
  FROM events
)
SELECT event_id,
       CASE WHEN json_valid(raw) THEN CAST(json_extract_string(raw, '$.k') AS BIGINT) END AS k,
       CASE WHEN NOT json_valid(raw) OR json_extract_string(raw, '$.k') IS NULL THEN raw END AS url,
       (CASE WHEN json_valid(raw) THEN CAST(json_extract_string(raw, '$.k') AS BIGINT) END) IS NULL AS is_dead_letter
FROM ev
"""


# --- joins ------------------------------------------------------------------

def q_join_broadcast(spark, sf_dir):
    """Star-schema enrichment with explicit broadcast of the dims — the
    idiomatic port of the reference's per-record external point lookup
    (utility/tag.py:12-17): ship the small side to every task, zero
    shuffle of the fact table."""
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .select("c_custkey", "c_name", "n_name", "r_name")
    )


def q_join_smj(spark, sf_dir):
    """Shuffle sort-merge join (hinted) of the two large tables — the
    strategy that scales when neither side broadcasts."""
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem")
    return (
        o.hint("merge")
        .join(l, o["o_orderkey"] == l["l_orderkey"])
        .filter(F.col("l_quantity") > 45.0)
        .select("o_orderkey", "l_linenumber", "l_quantity", "o_totalprice")
    )


def q_join_semi(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return c.join(
        o, c["c_custkey"] == o["o_custkey"], "left_semi"
    ).select("c_custkey", "c_name")


def q_join_anti(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return c.join(
        o, c["c_custkey"] == o["o_custkey"], "left_anti"
    ).select("c_custkey", "c_name")


def q_join_outer(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return c.join(o, c["c_custkey"] == o["o_custkey"], "left").select(
        "c_custkey", "o_orderkey", "o_totalprice"
    )


def q_join_theta(spark, sf_dir):
    """Equi core + range residual: same-nation supplier/customer pairs
    with account balances within 100. The equi conjunct keeps this a
    hash/merge join (residual evaluated post-match) instead of the
    quadratic BNL a pure theta join would force."""
    s = _t(spark, sf_dir, "supplier")
    c = _t(spark, sf_dir, "customer")
    return s.join(
        c,
        (s["s_nationkey"] == c["c_nationkey"])
        & (c["c_acctbal"] >= s["s_acctbal"] - 100.0)
        & (c["c_acctbal"] <= s["s_acctbal"] + 100.0),
    ).select("s_suppkey", "c_custkey", "s_acctbal", "c_acctbal")


def q_join_interval(spark, sf_dir):
    """Interval (range) join via grid bucketing (operators/joins.py):
    purchase events falling inside same-user 2-hour windows opened by
    error events. Equi on (bucket, user) + residual range — scales
    linearly where the naive theta join is quadratic."""
    ev = _t(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select(
        F.col("user_id"),
        F.col("ts").alias("win_start"),
        (F.col("ts") + F.expr("INTERVAL 2 HOURS")).alias("win_end"),
        F.col("event_id").alias("error_id"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts"
    )
    joined = interval_join(
        purchases,
        "ts",
        errors,
        "win_start",
        "win_end",
        bucket_width_seconds=7200,
        extra_on=["user_id"],
    )
    return joined.select("user_id", "event_id", "error_id")


ORACLE_INTERVAL = """
WITH events_us AS (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events)
SELECT p.user_id, p.event_id, e.error_id
FROM (SELECT user_id, event_id, ts FROM events_us WHERE event_type = 'purchase') p
JOIN (SELECT user_id, ts AS win_start, ts + INTERVAL 2 HOUR AS win_end,
             event_id AS error_id
      FROM events_us WHERE event_type = 'error') e
  ON p.user_id = e.user_id AND p.ts >= e.win_start AND p.ts < e.win_end
"""


def q_join_asof(spark, sf_dir):
    """Backward as-of join (operators/joins.py union+window formulation,
    single shuffle): each event gets the latest order of the same
    user/customer at or before the event time."""
    ev = _t(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    o = _t(spark, sf_dir, "orders").select("o_custkey", "o_orderdate")
    out = asof_join(
        ev.withColumnRenamed("user_id", "o_custkey"),
        o,
        on=["o_custkey"],
        left_ts="ts",
        right_ts="o_orderdate",
        right_cols=["o_orderdate"],
    )
    return (
        out.filter(F.col("asof_o_orderdate").isNotNull())
        .select(
            "event_id",
            F.col("o_custkey").alias("user_id"),
            F.col("asof_o_orderdate").alias("matched_orderdate"),
        )
    )


ORACLE_ASOF = """
WITH events_us AS (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events)
SELECT e.event_id, e.user_id, o.o_orderdate AS matched_orderdate
FROM events_us e
ASOF JOIN orders o
  ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
"""


# --- aggregation ------------------------------------------------------------

def q_agg_group(spark, sf_dir):
    """TPC-H Q1-style grouped aggregation; Catalyst plans the partial +
    final HashAggregate pair (map-side combine) automatically. Decimal
    internals for order-independent sums (plans/common.py)."""
    l = _t(spark, sf_dir, "lineitem")
    disc_price = dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - dec("l_discount"))
    return (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            (F.sum(dec("l_quantity")).cast("double") / F.count(F.lit(1))).alias("avg_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


ORACLE_AGG_GROUP = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(38,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,2))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,2)) * (CAST(1 AS DECIMAL(38,2)) - CAST(l_discount AS DECIMAL(38,2)))) AS DOUBLE) AS sum_disc_price,
       CAST(SUM(CAST(l_quantity AS DECIMAL(38,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-01'
GROUP BY l_returnflag, l_linestatus
"""


def q_agg_distinct(spark, sf_dir):
    l = _t(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct("l_partkey").alias("n_part"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def q_agg_approx_distinct(spark, sf_dir):
    """HLL approximate distinct — the 100 TB answer to COUNT(DISTINCT):
    mergeable sketches, no exact-distinct shuffle explosion. No SQL
    oracle (approximate by design) -> rows-only check."""
    l = _t(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", 0.02).alias("approx_parts")
    )


def q_agg_rollup(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return o.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        dsum("o_totalprice").alias("total"),
    )


ORACLE_ROLLUP = """
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(38,2))) AS DOUBLE) AS total
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
"""


def q_agg_cube(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        dsum("o_totalprice").alias("total"),
    )


ORACLE_CUBE = ORACLE_ROLLUP.replace("ROLLUP", "CUBE")


def q_agg_grouping_sets(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    o.createOrReplaceTempView("gs_orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
        FROM gs_orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


ORACLE_GROUPING_SETS = """
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
"""


# --- windows ----------------------------------------------------------------

def q_window_rank(spark, sf_dir):
    """Top-5 customers per market segment; unique tiebreaker (custkey)
    makes the selected set deterministic."""
    c = _t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey").asc()
    )
    return (
        c.withColumn("rn", F.row_number().over(w))
        .withColumn("rk", F.rank().over(w))
        .filter(F.col("rn") <= 5)
        .select("c_mktsegment", "c_custkey", "c_acctbal", "rn", "rk")
    )


ORACLE_WINDOW_RANK = """
SELECT c_mktsegment, c_custkey, c_acctbal, rn, rk FROM (
  SELECT c_mktsegment, c_custkey, c_acctbal,
         ROW_NUMBER() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey ASC) AS rn,
         RANK()       OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey ASC) AS rk
  FROM customer
) WHERE rn <= 5
"""


def q_window_lag(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    prev = F.lag("value").over(w)
    return ev.select(
        "event_id",
        "user_id",
        "value",
        prev.alias("prev_value"),
        (F.col("value") - prev).alias("delta"),
        F.lead("event_id").over(w).alias("next_event_id"),
    )


ORACLE_WINDOW_LAG = """
SELECT event_id, user_id, value,
       LAG(value)  OVER w AS prev_value,
       value - LAG(value) OVER w AS delta,
       LEAD(event_id) OVER w AS next_event_id
FROM (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events)
WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
"""


def q_window_frame(spark, sf_dir):
    """Running total per customer: explicit ROWS frame; decimal sum keeps
    the prefix sums exact and order-independent."""
    o = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.sum(dec("o_totalprice")).over(w).cast("double").alias("running_total"),
    )


ORACLE_WINDOW_FRAME = """
SELECT o_orderkey, o_custkey,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(38,2))) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total
FROM orders
"""


# --- sort / top-k / set ops -------------------------------------------------

def q_topk(spark, sf_dir):
    """Global top-k: Catalyst plans TakeOrderedAndProject — per-partition
    heaps + driver merge of k rows, never a full sort at scale."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(10)
        .select("o_orderkey", "o_totalprice")
    )


def q_union(spark, sf_dir):
    n = _t(spark, sf_dir, "nation").select(F.col("n_name").alias("name"))
    r = _t(spark, sf_dir, "region").select(F.col("r_name").alias("name"))
    return n.unionByName(r)


def q_intersect(spark, sf_dir):
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


def q_except(spark, sf_dir):
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.subtract(s)


# --- scalar function families ----------------------------------------------

def q_string_funcs(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("uname"),
        F.lower("c_mktsegment").alias("lseg"),
        F.substring("c_name", 10, 9).alias("custnum_str"),
        F.concat_ws("|", "c_mktsegment", "c_name").alias("tagged"),
        F.length("c_name").cast("long").alias("name_len"),
        F.regexp_extract("c_name", r"#(\d+)", 1).alias("custnum_digits"),
        F.replace(F.col("c_name"), F.lit("Customer"), F.lit("Cust")).alias("short_name"),
    )


ORACLE_STRING = """
SELECT c_custkey,
       UPPER(c_name) AS uname,
       LOWER(c_mktsegment) AS lseg,
       SUBSTRING(c_name, 10, 9) AS custnum_str,
       c_mktsegment || '|' || c_name AS tagged,
       CAST(LENGTH(c_name) AS BIGINT) AS name_len,
       REGEXP_EXTRACT(c_name, '#(\\d+)', 1) AS custnum_digits,
       REPLACE(c_name, 'Customer', 'Cust') AS short_name
FROM customer
"""


def q_date_funcs(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("oyear"),
        F.month("o_orderdate").cast("long").alias("omonth"),
        F.dayofmonth("o_orderdate").cast("long").alias("oday"),
        F.date_trunc("month", F.col("o_orderdate")).alias("month_start"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("date"))
        .cast("long")
        .alias("days_since_epoch_start"),
    )


ORACLE_DATE = """
SELECT o_orderkey,
       CAST(YEAR(o_orderdate) AS BIGINT) AS oyear,
       CAST(MONTH(o_orderdate) AS BIGINT) AS omonth,
       CAST(DAY(o_orderdate) AS BIGINT) AS oday,
       DATE_TRUNC('month', o_orderdate) AS month_start,
       CAST(DATE_DIFF('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS days_since_epoch_start
FROM orders
"""


def q_math_funcs(spark, sf_dir):
    l = _t(spark, sf_dir, "lineitem")
    # revenue via exact decimal arithmetic, not round(): double rounding
    # at an exact .xx5 boundary is HALF_UP in Spark but HALF_EVEN in
    # DuckDB, so cross-engine-checked money math stays in decimal.
    revenue = (dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - dec("l_discount"))).cast(
        "double"
    )
    return l.select(
        "l_orderkey",
        "l_linenumber",
        revenue.alias("revenue"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.floor("l_quantity").cast("long").alias("qty_floor"),
        F.ceil("l_tax").cast("long").alias("tax_ceil"),
        F.sqrt("l_extendedprice").alias("price_sqrt"),
        (F.col("l_orderkey") % 7).alias("okey_mod7"),
    )


ORACLE_MATH = """
SELECT l_orderkey, l_linenumber,
       CAST(CAST(l_extendedprice AS DECIMAL(38,2)) * (CAST(1 AS DECIMAL(38,2)) - CAST(l_discount AS DECIMAL(38,2))) AS DOUBLE) AS revenue,
       ABS(l_discount - 0.05) AS disc_dev,
       CAST(FLOOR(l_quantity) AS BIGINT) AS qty_floor,
       CAST(CEIL(l_tax) AS BIGINT) AS tax_ceil,
       SQRT(l_extendedprice) AS price_sqrt,
       l_orderkey % 7 AS okey_mod7
FROM lineitem
"""


def q_map_funcs(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    m = F.create_map(
        F.lit("type"), F.col("event_type"),
        F.lit("uid"), F.col("user_id").cast("string"),
    )
    return ev.select(
        "event_id",
        F.element_at(m, "type").alias("type_val"),
        F.element_at(m, "uid").alias("uid_val"),
        F.size(m).cast("long").alias("m_size"),
    )


ORACLE_MAP = """
SELECT event_id,
       MAP(['type','uid'], [event_type, CAST(user_id AS VARCHAR)])['type'][1] AS type_val,
       MAP(['type','uid'], [event_type, CAST(user_id AS VARCHAR)])['uid'][1] AS uid_val,
       CAST(CARDINALITY(MAP(['type','uid'], [event_type, CAST(user_id AS VARCHAR)])) AS BIGINT) AS m_size
FROM events
"""


# --- event-time windows (batch analogs of streaming windows) ----------------

def q_window_tumbling(spark, sf_dir):
    """Tumbling event-time window (streaming: groupBy(window(ts,'1h'))
    after withWatermark; identical semantics here in batch)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(dec("value", 6)).cast("double").alias("sum_value"),
        )
        .select(F.col("w.start").alias("ws"), "n", "sum_value")
    )


ORACLE_TUMBLING = """
SELECT DATE_TRUNC('hour', CAST(ts AS TIMESTAMP)) AS ws, COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_value
FROM events
GROUP BY 1
"""


def q_window_sliding(spark, sf_dir):
    """Sliding window 1h/30m: every event lands in exactly two windows.
    Oracle reconstructs the two epoch-aligned window starts per event."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("ws"), "n")
    )


ORACLE_SLIDING = """
WITH cand AS (
  SELECT make_timestamp(
           (CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 1800) AS BIGINT) * 1800) * 1000000
         ) AS w0
  FROM events
)
SELECT ws, COUNT(*) AS n
FROM (
  SELECT UNNEST([w0, w0 - INTERVAL 30 MINUTE]) AS ws FROM cand
)
GROUP BY ws
"""


def q_window_session(spark, sf_dir):
    """Session windows with a 1-day gap per user (streaming:
    session_window + watermark; batch semantics identical). Oracle is
    the classic gaps-and-islands formulation."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.session_window("ts", "1 day").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(dec("value", 6)).cast("double").alias("sum_value"),
        )
        .select("user_id", F.col("w.start").alias("session_start"), "n", "sum_value")
    )


ORACLE_SESSION = """
WITH events_us AS (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events),
marked AS (
  SELECT user_id, ts, value,
         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) > INTERVAL 1 DAY
              OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
              THEN 1 ELSE 0 END AS is_new
  FROM events_us
), numbered AS (
  SELECT user_id, ts, value,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM marked
)
SELECT user_id, MIN(ts) AS session_start, COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_value
FROM numbered
GROUP BY user_id, sid
"""


# --- composite analytics (TPC-H-shaped, adapted to available columns) -------

def q_tpch_q3ish(spark, sf_dir):
    """Q3-shaped: revenue of building-segment orders by order, top 10.
    customer filter -> broadcast into orders -> SMJ with lineitem ->
    two-level agg -> TakeOrderedAndProject."""
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    l = _t(spark, sf_dir, "lineitem")
    rev = dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - dec("l_discount"))
    return (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey").asc())
        .limit(10)
    )


ORACLE_TPCH_Q3 = """
SELECT o_orderkey, o_orderdate, o_orderpriority,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,2)) * (CAST(1 AS DECIMAL(38,2)) - CAST(l_discount AS DECIMAL(38,2)))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY o_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderkey ASC LIMIT 10
"""


def q_tpch_q5ish(spark, sf_dir):
    """Q5-shaped: revenue by nation for one region's local commerce
    (customer and supplier in the same nation). Two broadcast dims +
    two large-table joins + same-nation residual."""
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = _t(spark, sf_dir, "nation")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem")
    rev = dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - dec("l_discount"))
    return (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(s), l["l_suppkey"] == s["s_suppkey"])
        .join(c, (o["o_custkey"] == c["c_custkey"]) & (c["c_nationkey"] == s["s_nationkey"]))
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .groupBy("n_name")
        .agg(F.sum(rev).cast("double").alias("revenue"))
    )


ORACLE_TPCH_Q5 = """
SELECT n_name,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,2)) * (CAST(1 AS DECIMAL(38,2)) - CAST(l_discount AS DECIMAL(38,2)))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
GROUP BY n_name
"""


def q_tpch_q7ish(spark, sf_dir):
    """Q7-shaped (volume shipping): revenue flowing between two named
    nations in either direction, by supplier-nation / customer-nation /
    year. Two broadcast copies of nation (tiny dim, one per role) prune
    the fact join early via the OR-pair filter; the lineitem⋈orders⋈
    customer spine stays a shuffle join. Decimal revenue for
    order-independence."""
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    )
    s = _t(spark, sf_dir, "supplier")
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem")
    rev = dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - dec("l_discount"))
    pair = (
        (F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7")
    ) | ((F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_3"))
    return (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(s), l["l_suppkey"] == s["s_suppkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n1), s["s_nationkey"] == F.col("s_nkey"))
        .join(F.broadcast(n2), c["c_nationkey"] == F.col("c_nkey"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.sum(rev).cast("double").alias("revenue"))
    )


ORACLE_TPCH_Q7 = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS INTEGER) AS l_year,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,2)) * (CAST(1 AS DECIMAL(38,2)) - CAST(l_discount AS DECIMAL(38,2)))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE (n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
   OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3')
GROUP BY n1.n_name, n2.n_name, year(l_shipdate)
"""


def q_tpch_q10ish(spark, sf_dir):
    """Q10-shaped (returned-item reporting): top-20 customers by
    revenue lost to returns in a 6-month window. Date+flag filters push
    to the scans; nation broadcasts; TakeOrderedAndProject caps the
    result with c_custkey as the deterministic tiebreaker."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-07-01")
    )
    l = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = _t(spark, sf_dir, "nation")
    rev = dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - dec("l_discount"))
    return (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy("c_custkey", "c_name", "n_name", "c_acctbal")
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


ORACLE_TPCH_Q10 = """
SELECT c_custkey, c_name, n_name, c_acctbal,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,2)) * (CAST(1 AS DECIMAL(38,2)) - CAST(l_discount AS DECIMAL(38,2)))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1996-07-01'
GROUP BY c_custkey, c_name, n_name, c_acctbal
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""


def q_tpch_q14ish(spark, sf_dir):
    """Q14-shaped (promotion effect): share of revenue from PROMO-type
    parts, by ship month. The part dim broadcasts; the date filter
    pushes to the lineitem scan; promo vs total revenue are two
    conditional branches of ONE decimal aggregation pass (no second
    scan, no self-join). The share division happens once on the two
    exact sums — `100.0 * promo / total` in the same operand order in
    both engines, so the single double rounding agrees."""
    l = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    )
    p = _t(spark, sf_dir, "part")
    rev = dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - dec("l_discount"))
    promo_rev = F.when(F.col("p_type") == "PROMO", rev).otherwise(
        F.lit(0).cast("decimal(38,4)")
    )
    agg = (
        l.join(F.broadcast(p), l["l_partkey"] == p["p_partkey"])
        .groupBy(F.date_trunc("month", "l_shipdate").alias("ship_month"))
        .agg(
            F.sum(promo_rev).alias("pr"),
            F.sum(rev).alias("tr"),
        )
    )
    return agg.select(
        "ship_month",
        F.col("pr").cast("double").alias("promo_rev"),
        F.col("tr").cast("double").alias("total_rev"),
        (
            F.lit(100.0) * F.col("pr").cast("double") / F.col("tr").cast("double")
        ).alias("promo_pct"),
    )


ORACLE_TPCH_Q14 = """
WITH a AS (
  SELECT date_trunc('month', l_shipdate) AS ship_month,
         SUM(CASE WHEN p_type = 'PROMO'
             THEN CAST(l_extendedprice AS DECIMAL(38,2)) * (CAST(1 AS DECIMAL(38,2)) - CAST(l_discount AS DECIMAL(38,2)))
             ELSE CAST(0 AS DECIMAL(38,4)) END) AS pr,
         SUM(CAST(l_extendedprice AS DECIMAL(38,2)) * (CAST(1 AS DECIMAL(38,2)) - CAST(l_discount AS DECIMAL(38,2)))) AS tr
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  GROUP BY date_trunc('month', l_shipdate)
)
SELECT ship_month,
       CAST(pr AS DOUBLE) AS promo_rev,
       CAST(tr AS DOUBLE) AS total_rev,
       100.0 * CAST(pr AS DOUBLE) / CAST(tr AS DOUBLE) AS promo_pct
FROM a
"""


def q_tpch_q19ish(spark, sf_dir):
    """Q19-shaped (discounted revenue, disjunctive predicates): revenue
    from three OR'd brand/size/quantity bands — the classic test that
    an engine evaluates a disjunction of conjunctions as ONE join pass
    with a residual filter, not three scans unioned. The part dim
    broadcasts; the disjunction references both sides so it stays a
    post-join residual, while `p_partkey = l_partkey` remains the
    hash key. Grouped by brand so the result exercises the residual's
    routing, with decimal sums for order-independence."""
    l = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    rev = dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - dec("l_discount"))
    bands = (
        (
            (F.col("p_brand") == "Brand#13")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1.0, 30.0)
        )
        | (
            (F.col("p_brand") == "Brand#22")
            & F.col("p_size").between(10, 30)
            & F.col("l_quantity").between(10.0, 40.0)
        )
        | (
            (F.col("p_brand") == "Brand#25")
            & F.col("p_size").between(20, 50)
            & F.col("l_quantity").between(20.0, 50.0)
        )
    )
    return (
        l.join(F.broadcast(p), l["l_partkey"] == p["p_partkey"])
        .filter(bands)
        .groupBy("p_brand")
        .agg(
            F.sum(rev).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


ORACLE_TPCH_Q19 = """
SELECT p_brand,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,2)) * (CAST(1 AS DECIMAL(38,2)) - CAST(l_discount AS DECIMAL(38,2)))) AS DOUBLE) AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1.0 AND 30.0)
   OR (p_brand = 'Brand#22' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10.0 AND 40.0)
   OR (p_brand = 'Brand#25' AND p_size BETWEEN 20 AND 50 AND l_quantity BETWEEN 20.0 AND 50.0)
GROUP BY p_brand
"""


def q_agg_percentile(spark, sf_dir):
    """Exact continuous percentiles (median/p90) — linear interpolation,
    identical formula in Spark percentile() and DuckDB quantile_cont."""
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.percentile("o_totalprice", F.lit(0.5)).alias("p50"),
        F.percentile("o_totalprice", F.lit(0.9)).alias("p90"),
        F.min("o_totalprice").alias("pmin"),
        F.max("o_totalprice").alias("pmax"),
    )


ORACLE_PERCENTILE = """
SELECT o_orderstatus,
       quantile_cont(o_totalprice, 0.5) AS p50,
       quantile_cont(o_totalprice, 0.9) AS p90,
       MIN(o_totalprice) AS pmin,
       MAX(o_totalprice) AS pmax
FROM orders
GROUP BY o_orderstatus
"""


def q_agg_stats(spark, sf_dir):
    """Statistical aggregate family: sample stddev/variance,
    covariance, Pearson correlation, and least-squares regression
    slope/intercept of price on quantity, per return flag. All are
    single-pass mergeable aggregates (partial+final, like sum/count) —
    the scalable form; a naive two-pass mean-then-deviation would scan
    twice. Float caveat: these merge DOUBLE partials, so the last bits
    depend on merge order — every output is rounded to 6 decimals,
    which absorbs the ulp-level wobble in both engines (the repo's
    float-determinism rule from plans/common.py applied to the one
    aggregate family that cannot be computed in decimal)."""
    li = _t(spark, sf_dir, "lineitem")
    r6 = lambda c: F.round(c, 6)  # noqa: E731
    return li.groupBy("l_returnflag").agg(
        r6(F.stddev_samp("l_quantity")).alias("sd_qty"),
        r6(F.var_samp("l_quantity")).alias("var_qty"),
        r6(F.covar_samp("l_quantity", "l_extendedprice")).alias("cov_qp"),
        r6(F.corr("l_quantity", "l_extendedprice")).alias("corr_qp"),
        r6(F.regr_slope("l_extendedprice", "l_quantity")).alias("slope"),
        r6(F.regr_intercept("l_extendedprice", "l_quantity")).alias("intercept"),
        F.regr_count("l_extendedprice", "l_quantity").alias("n_pairs"),
    )


ORACLE_AGG_STATS = """
SELECT l_returnflag,
       round(stddev_samp(l_quantity), 6) AS sd_qty,
       round(var_samp(l_quantity), 6) AS var_qty,
       round(covar_samp(l_quantity, l_extendedprice), 6) AS cov_qp,
       round(corr(l_quantity, l_extendedprice), 6) AS corr_qp,
       round(regr_slope(l_extendedprice, l_quantity), 6) AS slope,
       round(regr_intercept(l_extendedprice, l_quantity), 6) AS intercept,
       CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n_pairs
FROM lineitem
GROUP BY l_returnflag
"""


RELATIONAL_QUERIES = [
    Query("q_scan_parquet", q_scan_parquet,
          "SELECT p_partkey, p_name, p_size FROM part WHERE p_size > 30"),
    Query("q_filter_project", q_filter_project,
          "SELECT event_id, user_id, value, value * 0.92 AS value_eur "
          "FROM events WHERE event_type = 'purchase' AND value > 50.0"),
    # json_valid guard: Spark's get_json_object returns NULL for
    # malformed JSON; DuckDB's json_extract_string ERRORS and would
    # abort the oracle on one corrupt row
    Query("q_json_extract", q_json_extract,
          "SELECT event_id, CASE WHEN json_valid(props) THEN "
          "CAST(json_extract_string(props, '$.k') AS BIGINT) END AS k FROM events"),
    Query("q_corrupt_routing", q_corrupt_routing, ORACLE_CORRUPT),
    Query("q_join_broadcast", q_join_broadcast,
          "SELECT c_custkey, c_name, n_name, r_name FROM customer "
          "JOIN nation ON c_nationkey = n_nationkey "
          "JOIN region ON n_regionkey = r_regionkey"),
    Query("q_join_smj", q_join_smj,
          "SELECT o_orderkey, l_linenumber, l_quantity, o_totalprice FROM orders "
          "JOIN lineitem ON o_orderkey = l_orderkey WHERE l_quantity > 45.0"),
    Query("q_join_semi", q_join_semi,
          "SELECT c_custkey, c_name FROM customer "
          "WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)"),
    Query("q_join_anti", q_join_anti,
          "SELECT c_custkey, c_name FROM customer "
          "WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)"),
    Query("q_join_outer", q_join_outer,
          "SELECT c_custkey, o_orderkey, o_totalprice FROM customer "
          "LEFT JOIN orders ON c_custkey = o_custkey"),
    Query("q_join_theta", q_join_theta,
          "SELECT s_suppkey, c_custkey, s_acctbal, c_acctbal FROM supplier s "
          "JOIN customer c ON s.s_nationkey = c.c_nationkey "
          "AND c.c_acctbal >= s.s_acctbal - 100.0 AND c.c_acctbal <= s.s_acctbal + 100.0"),
    Query("q_join_interval", q_join_interval, ORACLE_INTERVAL),
    Query("q_join_asof", q_join_asof, ORACLE_ASOF),
    Query("q_agg_group", q_agg_group, ORACLE_AGG_GROUP),
    Query("q_agg_distinct", q_agg_distinct,
          "SELECT l_returnflag, COUNT(DISTINCT l_suppkey) AS n_supp, "
          "COUNT(DISTINCT l_partkey) AS n_part, COUNT(*) AS n_rows "
          "FROM lineitem GROUP BY l_returnflag"),
    Query("q_agg_approx_distinct", q_agg_approx_distinct, None,
          "HLL sketch; approximate by design -> rows-only"),
    Query("q_agg_rollup", q_agg_rollup, ORACLE_ROLLUP),
    Query("q_agg_cube", q_agg_cube, ORACLE_CUBE),
    Query("q_agg_grouping_sets", q_agg_grouping_sets, ORACLE_GROUPING_SETS),
    Query("q_window_rank", q_window_rank, ORACLE_WINDOW_RANK),
    Query("q_window_lag", q_window_lag, ORACLE_WINDOW_LAG),
    Query("q_window_frame", q_window_frame, ORACLE_WINDOW_FRAME),
    Query("q_topk", q_topk,
          "SELECT o_orderkey, o_totalprice FROM orders "
          "ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10"),
    Query("q_union", q_union,
          "SELECT n_name AS name FROM nation UNION ALL SELECT r_name AS name FROM region"),
    Query("q_intersect", q_intersect,
          "SELECT c_nationkey AS nationkey FROM customer "
          "INTERSECT SELECT s_nationkey AS nationkey FROM supplier"),
    Query("q_except", q_except,
          "SELECT c_nationkey AS nationkey FROM customer "
          "EXCEPT SELECT s_nationkey AS nationkey FROM supplier"),
    Query("q_string_funcs", q_string_funcs, ORACLE_STRING),
    Query("q_date_funcs", q_date_funcs, ORACLE_DATE),
    Query("q_math_funcs", q_math_funcs, ORACLE_MATH),
    Query("q_map_funcs", q_map_funcs, ORACLE_MAP),
    Query("q_tpch_q3ish", q_tpch_q3ish, ORACLE_TPCH_Q3),
    Query("q_tpch_q5ish", q_tpch_q5ish, ORACLE_TPCH_Q5),
    Query("q_tpch_q7ish", q_tpch_q7ish, ORACLE_TPCH_Q7),
    Query("q_tpch_q10ish", q_tpch_q10ish, ORACLE_TPCH_Q10),
    Query("q_tpch_q14ish", q_tpch_q14ish, ORACLE_TPCH_Q14),
    Query("q_tpch_q19ish", q_tpch_q19ish, ORACLE_TPCH_Q19),
    Query("q_agg_percentile", q_agg_percentile, ORACLE_PERCENTILE),
    Query("q_agg_stats", q_agg_stats, ORACLE_AGG_STATS),
    Query("q_window_tumbling", q_window_tumbling, ORACLE_TUMBLING),
    Query("q_window_sliding", q_window_sliding, ORACLE_SLIDING),
    Query("q_window_session", q_window_session, ORACLE_SESSION),
]
