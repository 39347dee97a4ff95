"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

All real logic lives in ``arc_kinesis_tagging_spark``; this module is
a thin adapter over its query registry (plans/registry.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from arc_kinesis_tagging_spark.plans.registry import QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the reference pipeline
    end-to-end (parse -> filter -> project -> broadcast enrichment ->
    tag upsert -> aggregate); driver checks rows>0."""
    return QUERIES["q_pipeline_tag_enrich"].builder(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.builder for name, q in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every SQL-expressible query; rows-only
    ops (approx sketches, LSH banding, gzip UDF) are omitted on purpose
    — see each Query.note in the registry."""
    return {name: q.oracle for name, q in QUERIES.items() if q.oracle is not None}
