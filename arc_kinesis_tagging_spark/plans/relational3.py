"""Third relational batch: array function family, regex family,
extended dates, collect/agg-to-array, sampling."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from arc_kinesis_tagging_spark.plans.common import Query
from arc_kinesis_tagging_spark.functions.text import tokens
from arc_kinesis_tagging_spark.sources.tables import load_table


def _t(spark, sf_dir, name):
    return load_table(spark, name, sf_dir)


def q_array_funcs(spark, sf_dir):
    """Array family over tokenized documents: sort, slice, size,
    position, distinct-count, contains, reverse-sort via sort+reverse.

    Array-valued columns are serialized with ``concat_ws('|')`` so every
    output column is scalar-typed: the driver's canonicalizer hashes by
    pandas ``sort_values``, which cannot sort list cells. Tokens are
    whitespace-split, so '|' joining is unambiguous.
    """
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") % 7 == 0)
    toks = tokens(F.col("text"))
    return d.select(
        "doc_id",
        F.concat_ws("|", F.sort_array(toks)).alias("sorted_toks"),
        F.concat_ws("|", F.slice(toks, 1, 5)).alias("first5"),
        F.size(toks).cast("long").alias("n"),
        F.array_position(toks, "spark").cast("long").alias("spark_pos"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct"),
        F.array_contains(toks, "vector").alias("has_vector"),
        F.concat_ws("|", F.reverse(F.sort_array(toks))).alias("rsorted"),
    )


ORACLE_ARRAY = """
WITH base AS (
  SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), t -> t <> '') AS toks
  FROM documents WHERE doc_id % 7 = 0
)
SELECT doc_id,
       -- coalesce: array_to_string of an empty list is NULL in DuckDB;
       -- Spark's concat_ws gives '' (empty documents hit this)
       coalesce(array_to_string(list_sort(toks), '|'), '') AS sorted_toks,
       coalesce(array_to_string(list_slice(toks, 1, 5), '|'), '') AS first5,
       CAST(len(toks) AS BIGINT) AS n,
       CAST(COALESCE(list_position(toks, 'spark'), 0) AS BIGINT) AS spark_pos,
       CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct,
       list_contains(toks, 'vector') AS has_vector,
       coalesce(array_to_string(list_reverse_sort(toks), '|'), '') AS rsorted
FROM base
"""


def q_regex_funcs(spark, sf_dir):
    c = _t(spark, sf_dir, "part")
    return c.select(
        "p_partkey",
        F.regexp_replace("p_name", r"[aeiou]", "_").alias("novowels"),
        F.regexp_count(F.col("p_name"), F.lit(r"[a-z]+")).cast("long").alias("n_words"),
        F.col("p_name").rlike(r"pink|red").alias("is_warm"),
        F.regexp_extract("p_type", r"(\w+)$", 1).alias("last_word"),
    )


ORACLE_REGEX = """
SELECT p_partkey,
       regexp_replace(p_name, '[aeiou]', '_', 'g') AS novowels,
       CAST(len(regexp_extract_all(p_name, '[a-z]+')) AS BIGINT) AS n_words,
       regexp_matches(p_name, 'pink|red') AS is_warm,
       regexp_extract(p_type, '(\\w+)$', 1) AS last_word
FROM part
"""


def q_date_funcs2(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.last_day(d).cast("string").alias("month_end"),
        F.date_add(d.cast("date"), 30).cast("string").alias("plus30"),
        F.add_months(d.cast("date"), 1).cast("string").alias("plus_month"),
        F.weekofyear(d).cast("long").alias("iso_week"),
        F.unix_timestamp(d).alias("epoch_s"),
        F.quarter(d).cast("long").alias("q"),
    )


ORACLE_DATE2 = """
SELECT o_orderkey,
       CAST(last_day(CAST(o_orderdate AS DATE)) AS VARCHAR) AS month_end,
       -- integer date addition on purpose: DuckDB 1.0's CSE wrongly
       -- unifies two (date + INTERVAL <const>) expressions that differ
       -- only in the interval constant, so the two additions must be
       -- structurally different expressions
       (CAST(o_orderdate AS DATE) + 30)::VARCHAR AS plus30,
       CAST(CAST(o_orderdate AS DATE) + INTERVAL 1 MONTH AS DATE)::VARCHAR AS plus_month,
       CAST(weekofyear(o_orderdate) AS BIGINT) AS iso_week,
       CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s,
       CAST(quarter(o_orderdate) AS BIGINT) AS q
FROM orders
"""


def q_collect_agg(spark, sf_dir):
    """Aggregate-to-array (sorted for determinism) + string_agg.

    The collect_list result is serialized with ``concat_ws('|')`` so the
    output is scalar-typed (driver canonicalizer cannot hash list cells);
    the array op itself still runs — serialization is the last step.
    """
    n = _t(spark, sf_dir, "nation")
    return n.groupBy("n_regionkey").agg(
        F.concat_ws("|", F.sort_array(F.collect_list("n_name"))).alias("nations"),
        F.concat_ws(",", F.sort_array(F.collect_list("n_name"))).alias("nations_csv"),
        F.count(F.lit(1)).alias("n"),
    )


ORACLE_COLLECT = """
SELECT n_regionkey,
       array_to_string(list_sort(array_agg(n_name)), '|') AS nations,
       list_aggregate(list_sort(array_agg(n_name)), 'string_agg', ',') AS nations_csv,
       COUNT(*) AS n
FROM nation
GROUP BY n_regionkey
"""


def q_sample(spark, sf_dir):
    """Seeded Bernoulli sample + stratified sampleBy — engine-specific
    RNG, so rows-only (the driver checks row production, tests check
    statistical bounds). Sampling is a first-class training-data op:
    down-sampling over-represented sources is routine at 100 TB."""
    l = _t(spark, sf_dir, "lineitem")
    flat = l.sample(fraction=0.1, seed=42).select("l_orderkey", "l_linenumber")
    strat = (
        l.sampleBy("l_returnflag", {"N": 0.05, "A": 0.2, "R": 0.2}, seed=42)
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n_sampled"))
    )
    return flat.join(l, ["l_orderkey", "l_linenumber"]).groupBy().agg(
        F.count(F.lit(1)).alias("n_rows")
    ).crossJoin(strat)


def q_window_analytics(spark, sf_dir):
    """The remaining window family: ntile, percent_rank, cume_dist,
    first/last/nth_value with full-partition frames."""
    from pyspark.sql import Window

    c = _t(spark, sf_dir, "customer")
    order = [F.col("c_acctbal").asc(), F.col("c_custkey").asc()]
    w = Window.partitionBy("c_mktsegment").orderBy(*order)
    wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return c.select(
        "c_custkey",
        "c_mktsegment",
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
        F.first("c_custkey").over(wf).alias("poorest"),
        F.last("c_custkey").over(wf).alias("richest"),
        F.nth_value("c_custkey", 2).over(wf).alias("second_poorest"),
    )


ORACLE_WINDOW_ANALYTICS = """
SELECT c_custkey, c_mktsegment,
       CAST(NTILE(4) OVER w AS BIGINT) AS quartile,
       PERCENT_RANK() OVER w AS pr,
       CUME_DIST() OVER w AS cd,
       FIRST_VALUE(c_custkey) OVER wf AS poorest,
       LAST_VALUE(c_custkey) OVER wf AS richest,
       NTH_VALUE(c_custkey, 2) OVER wf AS second_poorest
FROM customer
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal ASC, c_custkey ASC),
       wf AS (PARTITION BY c_mktsegment ORDER BY c_acctbal ASC, c_custkey ASC
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
"""


def q_string_distance(spark, sf_dir):
    """Edit-distance family (fuzzy matching / dedup building block).

    Length-banded, not all-pairs: ``levenshtein(a,b) >= |len(a)-len(b)|``,
    so with max distance 8 only pairs within 8 chars of each other can
    qualify. Each left row explodes into its own length band (width 9)
    plus both neighbors and equi-joins on the band — same result set as
    the cross join (the oracle keeps that form), but the plan shuffles
    on band keys instead of building N^2/2 pairs, then prunes the
    survivors with the cheap length filter before the O(len^2)
    levenshtein runs."""
    max_lev = 8
    band_w = max_lev + 1
    p = _t(spark, sf_dir, "part").filter(F.col("p_partkey") % 10 == 0)
    a = p.select(
        F.col("p_partkey").alias("key_a"),
        F.col("p_name").alias("name_a"),
        F.length("p_name").alias("len_a"),
    )
    b = p.select(
        F.col("p_partkey").alias("key_b"),
        F.col("p_name").alias("name_b"),
        F.length("p_name").alias("len_b"),
        F.floor(F.length("p_name") / band_w).alias("band"),
    )
    band_a = F.floor(F.col("len_a") / band_w)
    a_exploded = a.withColumn(
        "band", F.explode(F.array(band_a - 1, band_a, band_a + 1))
    )
    return (
        a_exploded.join(b, "band")
        .filter(
            (F.col("key_a") < F.col("key_b"))
            & (F.abs(F.col("len_a") - F.col("len_b")) <= max_lev)
        )
        .withColumn("lev", F.levenshtein("name_a", "name_b").cast("long"))
        .filter(F.col("lev") <= max_lev)
        .select("key_a", "key_b", "lev")
    )


ORACLE_STRING_DISTANCE = """
SELECT a.p_partkey AS key_a, b.p_partkey AS key_b,
       CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS lev
FROM (SELECT * FROM part WHERE p_partkey % 10 = 0) a
JOIN (SELECT * FROM part WHERE p_partkey % 10 = 0) b ON a.p_partkey < b.p_partkey
WHERE levenshtein(a.p_name, b.p_name) <= 8
"""


def q_struct_funcs(spark, sf_dir):
    """Struct family: named_struct creation, field access, nested
    access through a struct-of-struct, JSON serialization of a struct.
    Field order is definition order in both engines, so to_json output
    strings agree."""
    c = _t(spark, sf_dir, "customer")
    s = F.struct(
        F.col("c_custkey").alias("k"),
        F.col("c_mktsegment").alias("seg"),
        F.struct(F.col("c_acctbal").alias("bal")).alias("acct"),
    )
    return c.select(
        "c_custkey",
        s.getField("seg").alias("seg"),
        s.getField("acct").getField("bal").alias("bal"),
        F.to_json(
            F.struct(F.col("c_custkey").alias("k"), F.col("c_mktsegment").alias("seg"))
        ).alias("as_json"),
    )


ORACLE_STRUCT = """
SELECT c_custkey,
       struct_extract(struct_pack(k := c_custkey, seg := c_mktsegment,
                                  acct := struct_pack(bal := c_acctbal)), 'seg') AS seg,
       struct_extract(struct_extract(struct_pack(k := c_custkey, seg := c_mktsegment,
                                                 acct := struct_pack(bal := c_acctbal)), 'acct'), 'bal') AS bal,
       '{"k":' || c_custkey || ',"seg":"' || c_mktsegment || '"}' AS as_json
FROM customer
"""


def q_url_funcs(spark, sf_dir):
    """URL parsing family over synthesized URLs (host / path / query
    parameter extraction). Spark's parse_url is Hive-compatible; the
    oracle re-derives the same parts with regexes, which doubles as a
    cross-check that parse_url agrees with the grammar."""
    p = _t(spark, sf_dir, "part").filter(F.col("p_partkey") % 20 == 0)
    url = F.concat(
        F.lit("https://cdn"),
        (F.col("p_partkey") % 5).cast("string"),
        F.lit(".example.com/parts/"),
        F.regexp_replace("p_type", r"\s+", "-"),
        F.lit("?size="),
        F.col("p_size").cast("string"),
        F.lit("&brand="),
        F.regexp_replace("p_brand", "#", ""),
    )
    return p.select(
        "p_partkey",
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY"), F.lit("size")).alias("q_size"),
        F.parse_url(url, F.lit("QUERY"), F.lit("brand")).alias("q_brand"),
    )


ORACLE_URL = """
WITH u AS (
  SELECT p_partkey,
         'https://cdn' || (p_partkey % 5) || '.example.com/parts/'
           || regexp_replace(p_type, '\\s+', '-', 'g')
           || '?size=' || p_size || '&brand=' || replace(p_brand, '#', '') AS url
  FROM part WHERE p_partkey % 20 = 0
)
SELECT p_partkey,
       regexp_extract(url, '^https://([^/]+)/', 1) AS host,
       regexp_extract(url, '^https://[^/]+(/[^?]*)', 1) AS path,
       regexp_extract(url, '[?&]size=([^&]*)', 1) AS q_size,
       regexp_extract(url, '[?&]brand=([^&]*)', 1) AS q_brand
FROM u
"""


def q_csv_parse(spark, sf_dir):
    """Inline CSV parsing (from_csv): reconstruct a CSV line, parse it
    back into typed fields. The round-trip must reproduce the source
    columns — the oracle just splits the same line."""
    n = _t(spark, sf_dir, "orders")
    line = F.concat_ws(
        "|",
        F.col("o_orderkey").cast("string"),
        F.col("o_orderstatus"),
        F.col("o_orderpriority"),
    )
    parsed = F.from_csv(
        line,
        "k bigint, status string, prio string",
        {"sep": "|"},
    )
    return n.select(
        "o_orderkey",
        parsed.getField("k").alias("k"),
        parsed.getField("status").alias("status"),
        parsed.getField("prio").alias("prio"),
    )


ORACLE_CSV = """
WITH l AS (
  SELECT o_orderkey,
         o_orderkey || '|' || o_orderstatus || '|' || o_orderpriority AS line
  FROM orders
)
SELECT o_orderkey,
       CAST(string_split(line, '|')[1] AS BIGINT) AS k,
       string_split(line, '|')[2] AS status,
       string_split(line, '|')[3] AS prio
FROM l
"""


def q_hof_funcs(spark, sf_dir):
    """Higher-order array functions as first-class surface: transform,
    filter, aggregate (fold), zip_with, exists, forall. These power the
    engine's dedup/vector internals; this row makes the family itself
    oracle-checked."""
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") % 11 == 0)
    toks = tokens(F.col("text"))
    lens = F.transform(toks, lambda t: F.length(t).cast("long"))
    return d.select(
        "doc_id",
        F.size(F.filter(toks, lambda t: F.length(t) > 4)).cast("long").alias("n_long"),
        F.aggregate(lens, F.lit(0).cast("long"), lambda a, x: a + x).alias("total_len"),
        F.concat_ws(
            "|", F.zip_with(toks, lens, lambda t, n: F.concat_ws(":", t, n.cast("string")))
        ).alias("tagged"),
        F.exists(toks, lambda t: t == F.lit("spark")).alias("has_spark"),
        F.forall(toks, lambda t: F.length(t) >= 1).alias("all_nonempty"),
    )


ORACLE_HOF = """
WITH base AS (
  SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), t -> t <> '') AS toks
  FROM documents WHERE doc_id % 11 = 0
)
SELECT doc_id,
       CAST(len(list_filter(toks, t -> len(t) > 4)) AS BIGINT) AS n_long,
       -- coalesce: list_sum over an empty list is NULL in DuckDB, but
       -- Spark's aggregate() fold returns its 0 seed on empty docs
       CAST(coalesce(list_sum(list_transform(toks, t -> len(t))), 0) AS BIGINT) AS total_len,
       -- coalesce: array_to_string of an empty list is NULL in DuckDB
       -- (concat_ws in Spark gives '')
       coalesce(array_to_string(list_transform(toks, t -> t || ':' || len(t)), '|'), '') AS tagged,
       list_contains(toks, 'spark') AS has_spark,
       coalesce(list_aggregate(list_transform(toks, t -> len(t) >= 1), 'bool_and'), TRUE) AS all_nonempty
FROM base
"""


# One SQL text, two engines: executed verbatim by spark.sql over temp
# views AND by DuckDB over the same parquet — the dialect-portable
# subset is the query language contract.
SQL_DIRECT = """
SELECT n.n_name AS nation,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o.o_totalprice AS DECIMAL(38,2))) AS DOUBLE) AS total_price
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE o.o_orderstatus = 'F'
GROUP BY n.n_name
ORDER BY total_price DESC, nation ASC
"""


def q_sql_direct(spark, sf_dir):
    """The SQL entry path: the exact oracle text runs through
    spark.sql() over temp views — demonstrating that the engine's SQL
    surface accepts the same ANSI dialect the oracle runs, not just
    the DataFrame API."""
    for t in ("orders", "customer", "nation"):
        _t(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(SQL_DIRECT)


def q_window_range_frame(spark, sf_dir):
    """RANGE window frames (value-based bounds, vs the ROWS frames of
    q_window_frame): running aggregates over a +-5 acctbal band around
    each row's value within its segment."""
    from pyspark.sql import Window

    c = _t(spark, sf_dir, "customer")
    w = (
        Window.partitionBy("c_mktsegment")
        .orderBy(F.col("c_acctbal").asc())
        .rangeBetween(-5, 5)
    )
    return c.select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        F.count(F.lit(1)).over(w).alias("n_in_band"),
        F.sum(F.col("c_acctbal").cast("decimal(38,2)")).over(w).cast("double").alias("band_sum"),
    )


ORACLE_WINDOW_RANGE = """
SELECT c_custkey, c_mktsegment, c_acctbal,
       COUNT(*) OVER w AS n_in_band,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(38,2))) OVER w AS DOUBLE) AS band_sum
FROM customer
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal ASC
             RANGE BETWEEN 5 PRECEDING AND 5 FOLLOWING)
"""


def q_unpivot(spark, sf_dir):
    """UNPIVOT (wide -> long): part measures melted into (metric,
    value) rows — the inverse of q_pivot."""
    p = _t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.col("p_size").cast("double").alias("size"),
        F.col("p_retailprice").cast("double").alias("retailprice"),
    ).unpivot(
        "p_partkey", ["size", "retailprice"], "metric", "value"
    )


ORACLE_UNPIVOT = """
SELECT p_partkey, metric, value FROM (
  SELECT p_partkey, CAST(p_size AS DOUBLE) AS size,
         CAST(p_retailprice AS DOUBLE) AS retailprice
  FROM part
) UNPIVOT (value FOR metric IN (size, retailprice))
"""


def q_tpch_q18ish(spark, sf_dir):
    """TPC-H Q18 shape (large-volume customers): HAVING-filtered
    aggregate as a semi-join driver, then a 3-way join re-aggregated.

    Scale shape: the HAVING aggregate runs FIRST and produces a tiny
    key set (204 of ~15k orders at sf0.01), which then drives a
    left-semi join so lineitem/orders are filtered before the wide
    join — the classic magic-set reduction Catalyst won't invent on
    its own when written naively as IN (subquery) over a big build
    side. Decimal sums + unique tiebreak per plans/common.py.
    """
    from arc_kinesis_tagging_spark.plans.common import dsum

    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(38,2)")).alias("__q"))
        .filter(F.col("__q") > 250)
        .select("l_orderkey")
    )
    return (
        l.join(big, "l_orderkey", "left_semi")
        .join(o, l["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(dsum("l_quantity").alias("sum_qty"))
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(100)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.col("o_orderdate").cast("string").alias("o_orderdate"),
            "o_totalprice",
            "sum_qty",
        )
    )


ORACLE_TPCH_Q18 = """
SELECT c_name, c_custkey, o_orderkey,
       CAST(o_orderdate AS VARCHAR) AS o_orderdate, o_totalprice,
       CAST(SUM(CAST(l_quantity AS DECIMAL(38,2))) AS DOUBLE) AS sum_qty
FROM customer, orders, lineitem
WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey
        HAVING SUM(CAST(l_quantity AS DECIMAL(38,2))) > 250)
  AND c_custkey = o_custkey AND o_orderkey = l_orderkey
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 100
"""


def q_window_ntile(spark, sf_dir):
    """Distribution window functions — the last uncovered corner of the
    window family: ntile (equi-depth bucketing), percent_rank and
    cume_dist (distribution positions), nth_value (positional lookup
    under the default RANGE UNBOUNDED PRECEDING frame, null before the
    nth row). Ordering is (c_acctbal, c_custkey) — unique, so ranks,
    tile boundaries, and peer groups are identical across engines; the
    percent_rank/cume_dist doubles are single divisions of identical
    integers."""
    from pyspark.sql import Window

    c = load_table(spark, "customer", sf_dir)
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").asc(), F.col("c_custkey").asc()
    )
    return c.select(
        "c_custkey",
        "c_mktsegment",
        F.ntile(8).over(w).alias("octile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
        F.nth_value("c_custkey", 3).over(w).alias("third_key"),
    )


ORACLE_WINDOW_NTILE = """
SELECT c_custkey, c_mktsegment,
       CAST(ntile(8) OVER w AS INTEGER) AS octile,
       percent_rank() OVER w AS pct_rank,
       cume_dist() OVER w AS cume,
       nth_value(c_custkey, 3) OVER w AS third_key
FROM customer
WINDOW w AS (PARTITION BY c_mktsegment
             ORDER BY c_acctbal ASC, c_custkey ASC)
"""




# --- round-5 warehouse surface ----------------------------------------------

def q_merge_upsert(spark, sf_dir):
    """Batch MERGE semantics (the Delta/Iceberg MERGE INTO shape) as a
    pure DataFrame plan: target = established docs, source = a change
    batch; matched rows take the source's values (update), unmatched
    source rows insert, unmatched target rows persist — one full outer
    join on the key, action tagged per row. At 100 TB both sides
    shuffle once on the merge key (or zero times if the target is
    bucketed on it, operators/skew.py:write_bucketed); there is no
    row-at-a-time upsert loop anywhere."""
    d = load_table(spark, "documents", sf_dir)
    target = d.filter(F.col("doc_id") % 10 < 8).select("doc_id", "lang", "n_chars")
    # source %3: doc_ids ending in 9 (e.g. 9, 39, 69) miss the target,
    # so the INSERT branch is genuinely exercised alongside update/keep
    source = d.filter(F.col("doc_id") % 3 == 0).select(
        "doc_id",
        F.lit("xx").alias("lang"),
        (F.col("n_chars") + 1000).alias("n_chars"),
    )
    t = target.alias("t")
    s = source.alias("s")
    joined = t.join(s, F.col("t.doc_id") == F.col("s.doc_id"), "full_outer")
    return joined.select(
        F.coalesce(F.col("t.doc_id"), F.col("s.doc_id")).alias("doc_id"),
        F.coalesce(F.col("s.lang"), F.col("t.lang")).alias("lang"),
        F.coalesce(F.col("s.n_chars"), F.col("t.n_chars")).alias("n_chars"),
        F.when(F.col("t.doc_id").isNull(), F.lit("insert"))
        .when(F.col("s.doc_id").isNull(), F.lit("keep"))
        .otherwise(F.lit("update"))
        .alias("action"),
    )


ORACLE_MERGE_UPSERT = """
WITH target AS (
  SELECT doc_id, lang, n_chars FROM documents WHERE doc_id % 10 < 8
), source AS (
  SELECT doc_id, 'xx' AS lang, n_chars + 1000 AS n_chars
  FROM documents WHERE doc_id % 3 = 0
)
SELECT COALESCE(t.doc_id, s.doc_id) AS doc_id,
       COALESCE(s.lang, t.lang) AS lang,
       COALESCE(s.n_chars, t.n_chars) AS n_chars,
       CASE WHEN t.doc_id IS NULL THEN 'insert'
            WHEN s.doc_id IS NULL THEN 'keep'
            ELSE 'update' END AS action
FROM target t FULL OUTER JOIN source s ON t.doc_id = s.doc_id
"""


def q_events_pathing(spark, sf_dir):
    """User pathing: first-order Markov transition counts between
    consecutive event types per user (lag over the unique
    (ts, event_id) order), with each transition's share of its source
    state — the "what do users do next" table behind funnel design.
    One window shuffle on user_id, one bounded aggregate
    (|event_types|^2 rows max)."""
    ev = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    trans = (
        ev.withColumn("next_type", F.lead("event_type").over(w))
        .filter(F.col("next_type").isNotNull())
        .groupBy(
            F.col("event_type").alias("from_type"),
            F.col("next_type").alias("to_type"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wsrc = Window.partitionBy("from_type")
    return trans.select(
        "from_type",
        "to_type",
        "n",
        F.round(
            F.col("n") / F.sum("n").over(wsrc).cast("double"), 6
        ).alias("share"),
    )


ORACLE_EVENTS_PATHING = """
WITH ordered AS (
  SELECT user_id, event_type,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts ASC, event_id ASC) AS next_type
  FROM events
), trans AS (
  SELECT event_type AS from_type, next_type AS to_type, COUNT(*) AS n
  FROM ordered WHERE next_type IS NOT NULL
  GROUP BY 1, 2
)
SELECT from_type, to_type, n,
       ROUND(n / CAST(SUM(n) OVER (PARTITION BY from_type) AS DOUBLE),
             6) AS share
FROM trans
"""


def scd2_apply(dim: DataFrame, changes: DataFrame, batch_ts: int) -> DataFrame:
    """Apply one change batch to an SCD2 dimension table.

    ``dim`` = (doc_id, lang, valid_from, valid_to, is_current);
    ``changes`` = (doc_id, new_lang). Current rows whose key appears in
    the batch with a DIFFERENT attribute close (valid_to = batch_ts,
    is_current = false) and open a successor; everything else — closed
    history rows, unchanged keys, keys absent from the batch — passes
    through untouched. One keyed join plus a union of the three row
    classes; both legs reuse the same join so the dim scans once.

    The no-op-change guard (new_lang == lang) is what makes
    re-delivery IDEMPOTENT: applying the same batch twice yields a
    byte-identical table, because the second application sees the
    already-opened rows as no-ops (pinned in
    tests/test_tag_upsert.py::test_scd2_redelivery_idempotent)."""
    # closed history rows never match the change predicate again
    # (is_current guard), so re-deliveries cannot double-close
    j = dim.join(changes, "doc_id", "left")
    change_hit = (
        F.col("is_current")
        & F.col("new_lang").isNotNull()
        & (F.col("new_lang") != F.col("lang"))
    )
    unchanged = j.filter(~change_hit).select(
        "doc_id", "lang", "valid_from", "valid_to", "is_current"
    )
    changed = j.filter(change_hit)
    closed = changed.select(
        "doc_id",
        "lang",
        "valid_from",
        F.lit(batch_ts).cast("long").alias("valid_to"),
        F.lit(False).alias("is_current"),
    )
    opened = changed.select(
        "doc_id",
        F.col("new_lang").alias("lang"),
        F.lit(batch_ts).cast("long").alias("valid_from"),
        F.lit(None).cast("long").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    return unchanged.unionByName(closed).unionByName(opened)


def q_scd2_update(spark, sf_dir):
    """Slowly-changing-dimension type 2: apply a change batch to a
    current dimension — changed keys close their old row
    (valid_to = batch ts, is_current = false) and open a new one;
    unchanged keys pass through (scd2_apply above). The no-op-change
    guard (same lang) keeps idempotent re-deliveries from churning
    rows — property-tested under double delivery."""
    d = load_table(spark, "documents", sf_dir)
    dim = d.select(
        "doc_id",
        "lang",
        F.lit(0).cast("long").alias("valid_from"),
        F.lit(None).cast("long").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    changes = d.filter(F.col("doc_id") % 7 == 0).select(
        "doc_id", F.upper(F.col("lang")).alias("new_lang")
    )
    return scd2_apply(dim, changes, 1_700_000_000)


ORACLE_SCD2_UPDATE = """
WITH dim AS (
  SELECT doc_id, lang, CAST(0 AS BIGINT) AS valid_from,
         CAST(NULL AS BIGINT) AS valid_to, TRUE AS is_current
  FROM documents
), changes AS (
  SELECT doc_id, upper(lang) AS new_lang FROM documents WHERE doc_id % 7 = 0
), j AS (
  SELECT dim.*, c.new_lang FROM dim LEFT JOIN changes c USING (doc_id)
)
SELECT doc_id, lang, valid_from, valid_to, is_current
FROM j WHERE new_lang IS NULL OR new_lang = lang
UNION ALL
SELECT doc_id, lang, valid_from, CAST(1700000000 AS BIGINT), FALSE
FROM j WHERE new_lang IS NOT NULL AND new_lang <> lang
UNION ALL
SELECT doc_id, new_lang, CAST(1700000000 AS BIGINT), CAST(NULL AS BIGINT), TRUE
FROM j WHERE new_lang IS NOT NULL AND new_lang <> lang
"""




def q_dedup_url(spark, sf_dir):
    """Crawl-frontier URL dedup: canonicalize messy URL variants
    (scheme/host case, explicit :443, www prefix, utm_* tracking
    params, fragments, trailing slash) and keep one representative per
    canonical URL — the first dedup pass of any web-scale corpus, run
    BEFORE fetching so it must be pure string canonicalization. Four
    deterministic variants are synthesized per key; three collapse to
    one canonical form, the ?id= variant stays distinct (non-tracking
    query params are preserved). All regexes are RE2-safe (no
    lookahead) so Spark and DuckDB agree; the whole pass is codegen
    projections plus ONE canonical-key aggregate. Host-only lowering
    (vs whole-URL) is the production refinement for case-significant
    paths; this corpus's paths are lowercase by construction."""
    d = load_table(spark, "documents", sf_dir)
    k = (F.col("doc_id") / 4).cast("long")
    variant = F.col("doc_id") % 4
    site = F.concat(F.lit("site"), (k % 7).cast("string"))
    path_ = F.concat(F.lit("/path/"), k.cast("string"))
    url = (
        F.when(variant == 0, F.concat(F.lit("https://www."), F.upper(site),
                                      F.lit(".example.com"), path_,
                                      F.lit("/?utm_source=x#frag")))
        .when(variant == 1, F.concat(F.lit("HTTPS://"), site,
                                     F.lit(".EXAMPLE.com:443"), path_))
        .when(variant == 2, F.concat(F.lit("https://"), site,
                                     F.lit(".example.com"), path_, F.lit("/")))
        .otherwise(F.concat(F.lit("https://"), site, F.lit(".example.com"),
                            path_, F.lit("?id=1&utm_campaign=y")))
    )
    canon = url
    canon = F.regexp_replace(canon, r"#.*$", "")            # fragment
    canon = F.lower(canon)                                   # case (see doc)
    canon = F.regexp_replace(canon, r"://www\.", "://")      # www prefix
    canon = F.regexp_replace(canon, r":443/", "/")           # default port
    canon = F.regexp_replace(canon, r":443$", "")
    canon = F.regexp_replace(canon, r"[?&]utm_[^&]*", "")    # tracking params
    canon = F.regexp_replace(canon, r"\?&", "?")             # dangling repair
    canon = F.regexp_replace(canon, r"[?/]+$", "")           # trailing ? and /
    return (
        d.select("doc_id", canon.alias("canonical_url"))
        .groupBy("canonical_url")
        .agg(F.min("doc_id").alias("keeper"),
             F.count(F.lit(1)).alias("n_variants"))
    )


ORACLE_DEDUP_URL = r"""
WITH u AS (
  SELECT doc_id,
         CASE doc_id % 4
           WHEN 0 THEN 'https://www.' || upper('site' || ((doc_id // 4) % 7))
                       || '.example.com/path/' || (doc_id // 4) || '/?utm_source=x#frag'
           WHEN 1 THEN 'HTTPS://site' || ((doc_id // 4) % 7)
                       || '.EXAMPLE.com:443/path/' || (doc_id // 4)
           WHEN 2 THEN 'https://site' || ((doc_id // 4) % 7)
                       || '.example.com/path/' || (doc_id // 4) || '/'
           ELSE 'https://site' || ((doc_id // 4) % 7)
                       || '.example.com/path/' || (doc_id // 4) || '?id=1&utm_campaign=y'
         END AS url
  FROM documents
), c AS (
  SELECT doc_id,
         regexp_replace(regexp_replace(regexp_replace(regexp_replace(
           regexp_replace(regexp_replace(
             lower(regexp_replace(url, '#.*$', '')),
           '://www\.', '://'),
           ':443/', '/'),
           ':443$', ''),
           '[?&]utm_[^&]*', '', 'g'),
           '\?&', '?'),
           '[?/]+$', '') AS canonical_url
  FROM u
)
SELECT canonical_url, MIN(doc_id) AS keeper, COUNT(*) AS n_variants
FROM c GROUP BY canonical_url
"""


def q_json_flatten(spark, sf_dir):
    """Nested-JSON flatten to typed columns — the semi-structured ETL
    step (events-with-payload, API logs) done with the declarative
    parser, not string hacks: a nested payload (object-in-object,
    array, boolean) is parsed ONCE with from_json against an explicit
    schema and every field projects out typed (struct dot-paths, array
    indexing, array aggregate via the aggregate HOF). The payload
    string itself is constructed deterministically from event columns
    with plain concat so Spark's parser and DuckDB's JSON extractor
    read the IDENTICAL byte sequence — the comparison exercises the
    two engines' parse+cast paths, not a shared serializer. One
    map-side projection, no shuffle, no UDF."""
    ev = load_table(spark, "events", sf_dir)
    js = F.concat(
        F.lit('{"user":{"id":'),
        F.coalesce(F.col("user_id"), F.lit(-1)).cast("string"),
        F.lit(',"seg":"s'),
        (F.coalesce(F.col("user_id"), F.lit(-1)) % 5).cast("string"),
        F.lit('"},"items":['),
        (F.col("event_id") % 10).cast("string"),
        F.lit(","),
        (F.coalesce(F.col("user_id"), F.lit(-1)) % 7).cast("string"),
        F.lit('],"flag":'),
        F.when(F.col("event_id") % 2 == 0, F.lit("true")).otherwise(
            F.lit("false")
        ),
        F.lit("}"),
    )
    schema = (
        "user struct<id:bigint,seg:string>, items array<bigint>, "
        "flag boolean"
    )
    parsed = ev.select(
        "event_id", F.from_json(js, schema).alias("p")
    )
    return parsed.select(
        "event_id",
        F.col("p.user.id").alias("uid"),
        F.col("p.user.seg").alias("seg"),
        F.element_at("p.items", 1).alias("item0"),
        F.element_at("p.items", 2).alias("item1"),
        F.aggregate(
            "p.items", F.lit(0).cast("bigint"), lambda acc, x: acc + x
        ).alias("items_sum"),
        F.col("p.flag").alias("flag"),
    )


ORACLE_JSON_FLATTEN = """
WITH payload AS (
  SELECT event_id,
         '{"user":{"id":' || COALESCE(user_id, -1)
         || ',"seg":"s' || (COALESCE(user_id, -1) % 5)
         || '"},"items":[' || (event_id % 10)
         || ',' || (COALESCE(user_id, -1) % 7)
         || '],"flag":' || (CASE WHEN event_id % 2 = 0 THEN 'true'
                                 ELSE 'false' END)
         || '}' AS js
  FROM events
)
SELECT event_id,
       CAST(js ->> '$.user.id' AS BIGINT) AS uid,
       js ->> '$.user.seg' AS seg,
       CAST(js ->> '$.items[0]' AS BIGINT) AS item0,
       CAST(js ->> '$.items[1]' AS BIGINT) AS item1,
       CAST(js ->> '$.items[0]' AS BIGINT)
         + CAST(js ->> '$.items[1]' AS BIGINT) AS items_sum,
       CAST(js ->> '$.flag' AS BOOLEAN) AS flag
FROM payload
"""


def q_robots_gate(spark, sf_dir):
    """Crawl-frontier admission gate with robots.txt LONGEST-MATCH
    semantics: every candidate URL (deterministic per doc, mirroring
    q_dedup_url's fixture style) is checked against a per-host rule
    table of (path_prefix, allow) entries; the longest matching prefix
    decides, default allow — RFC 9309's rule-precedence model. The
    rule table is broadcast (robots rules are KB-sized per host, never
    corpus-sized), the match is a broadcast theta-join on host +
    prefix, and precedence is one ranked window over the match fanout
    (bounded by rules-per-host). At 100 TB the frontier shuffles
    nothing: scan -> broadcast join -> local rank."""
    d = load_table(spark, "documents", sf_dir)
    urls = d.select(
        "doc_id",
        F.concat(
            F.lit("site"), (F.col("doc_id") % 7).cast("string")
        ).alias("host"),
        F.concat(
            F.when(F.col("doc_id") % 4 == 0, F.lit("/admin/"))
            .when(F.col("doc_id") % 4 == 1, F.lit("/public/"))
            .when(F.col("doc_id") % 4 == 2, F.lit("/tmp/cache/"))
            .otherwise(F.lit("/posts/")),
            F.floor(F.col("doc_id") / 4).cast("long").cast("string"),
        ).alias("path"),
    )
    rules = spark.createDataFrame(
        [
            # (host, prefix, allow): /admin disallowed everywhere;
            # /tmp disallowed on even sites but /tmp/cache re-allowed
            # on site2 (the longest-match override robots is famous
            # for); site5 disallows everything except /public
            *[(f"site{h}", "/admin/", False) for h in range(7)],
            *[(f"site{h}", "/tmp/", False) for h in (0, 2, 4, 6)],
            ("site2", "/tmp/cache/", True),
            ("site5", "/", False),
            ("site5", "/public/", True),
        ],
        "host string, prefix string, allow boolean",
    )
    m = urls.join(
        F.broadcast(rules),
        (urls["host"] == rules["host"])
        & (F.expr("substring(path, 1, length(prefix))") == F.col("prefix")),
        "left",
    ).select(
        "doc_id",
        urls["host"].alias("host"),
        "path",
        "prefix",
        "allow",
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.length("prefix").desc_nulls_last(), F.col("prefix").asc_nulls_last()
    )
    return (
        m.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "doc_id",
            "host",
            "path",
            F.coalesce(F.col("allow"), F.lit(True)).alias("admitted"),
            F.coalesce(F.col("prefix"), F.lit("<default>")).alias(
                "matched_rule"
            ),
        )
    )


ORACLE_ROBOTS_GATE = """
WITH urls AS (
  SELECT doc_id,
         'site' || (doc_id % 7) AS host,
         (CASE doc_id % 4 WHEN 0 THEN '/admin/' WHEN 1 THEN '/public/'
                          WHEN 2 THEN '/tmp/cache/' ELSE '/posts/' END)
           || (doc_id // 4) AS path
  FROM documents
), rules AS (
  SELECT * FROM (VALUES
    ('site0', '/admin/', FALSE), ('site1', '/admin/', FALSE),
    ('site2', '/admin/', FALSE), ('site3', '/admin/', FALSE),
    ('site4', '/admin/', FALSE), ('site5', '/admin/', FALSE),
    ('site6', '/admin/', FALSE),
    ('site0', '/tmp/', FALSE), ('site2', '/tmp/', FALSE),
    ('site4', '/tmp/', FALSE), ('site6', '/tmp/', FALSE),
    ('site2', '/tmp/cache/', TRUE),
    ('site5', '/', FALSE), ('site5', '/public/', TRUE)
  ) AS t(host, prefix, allow)
), m AS (
  SELECT u.doc_id, u.host, u.path, r.prefix, r.allow,
         ROW_NUMBER() OVER (
           PARTITION BY u.doc_id
           ORDER BY length(r.prefix) DESC NULLS LAST,
                    r.prefix ASC NULLS LAST
         ) AS rn
  FROM urls u
  LEFT JOIN rules r
    ON u.host = r.host AND substr(u.path, 1, length(r.prefix)) = r.prefix
)
SELECT doc_id, host, path,
       COALESCE(allow, TRUE) AS admitted,
       COALESCE(prefix, '<default>') AS matched_rule
FROM m WHERE rn = 1
"""


def q_json_variant(spark, sf_dir):
    """Semi-structured extraction through Spark 4's VARIANT type —
    the engine-native successor to get_json_object for the
    reference's schema-on-read model (SURVEY §1.2): ``try_parse_json``
    ingests each props payload once into the binary variant encoding
    (malformed/null payloads become null variants instead of errors,
    mirroring the reference's PERMISSIVE posture), and typed
    ``try_variant_get`` paths extract fields without re-parsing the
    string per field. Per-row output: extracted key, validity, and a
    derived bucket — all scalar-typed for the driver hash."""
    ev = _t(spark, sf_dir, "events")
    v = F.try_parse_json(F.col("props"))
    k = F.try_variant_get(v, "$.k", "bigint")
    return ev.select(
        "event_id",
        k.alias("k"),
        v.isNotNull().alias("valid"),
        F.pmod(k, F.lit(10)).alias("k_bucket"),
    )


ORACLE_JSON_VARIANT = """
SELECT event_id,
       CASE WHEN props IS NOT NULL AND json_valid(props)
            THEN TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)
       END AS k,
       (props IS NOT NULL AND json_valid(props)) AS valid,
       CASE WHEN props IS NOT NULL AND json_valid(props)
            -- positive mod: Spark pmod(-1, 10) = 9, SQL % keeps sign
            THEN ((TRY_CAST(json_extract_string(props, '$.k') AS BIGINT)
                   % 10) + 10) % 10
       END AS k_bucket
FROM events
"""


RELATIONAL3_QUERIES = [
    Query("q_json_variant", q_json_variant, ORACLE_JSON_VARIANT),
    Query("q_json_flatten", q_json_flatten, ORACLE_JSON_FLATTEN),
    Query("q_robots_gate", q_robots_gate, ORACLE_ROBOTS_GATE),
    Query("q_dedup_url", q_dedup_url, ORACLE_DEDUP_URL),
    Query("q_merge_upsert", q_merge_upsert, ORACLE_MERGE_UPSERT),
    Query("q_events_pathing", q_events_pathing, ORACLE_EVENTS_PATHING),
    Query("q_scd2_update", q_scd2_update, ORACLE_SCD2_UPDATE),
    Query("q_window_analytics", q_window_analytics, ORACLE_WINDOW_ANALYTICS),
    Query("q_window_ntile", q_window_ntile, ORACLE_WINDOW_NTILE),
    Query("q_string_distance", q_string_distance, ORACLE_STRING_DISTANCE),
    Query("q_array_funcs", q_array_funcs, ORACLE_ARRAY),
    Query("q_regex_funcs", q_regex_funcs, ORACLE_REGEX),
    Query("q_date_funcs2", q_date_funcs2, ORACLE_DATE2),
    Query("q_collect_agg", q_collect_agg, ORACLE_COLLECT),
    Query("q_sample", q_sample, None, "seeded sampling; engine-specific RNG -> rows-only"),
    Query("q_struct_funcs", q_struct_funcs, ORACLE_STRUCT),
    Query("q_url_funcs", q_url_funcs, ORACLE_URL),
    Query("q_csv_parse", q_csv_parse, ORACLE_CSV),
    Query("q_tpch_q18ish", q_tpch_q18ish, ORACLE_TPCH_Q18),
    Query("q_window_range_frame", q_window_range_frame, ORACLE_WINDOW_RANGE),
    Query("q_unpivot", q_unpivot, ORACLE_UNPIVOT),
    Query("q_hof_funcs", q_hof_funcs, ORACLE_HOF),
    Query("q_sql_direct", q_sql_direct, SQL_DIRECT),
]
