"""Batch table catalog over the driver's parquet test data.

Reads are plain ``spark.read.parquet`` so Catalyst keeps predicate
pushdown / column pruning / partition pruning — the reference, by
contrast, decompresses and parses every full record before filtering
(reference app.py:33-56); here filters reach the scan.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _ensure_session_confs(spark: SparkSession) -> None:
    """Runtime confs the catalog depends on, set defensively so queries
    behave identically under ANY caller-provided session (the driver
    harness builds its own SparkSession, not ours):

    - nanosAsLong: events.parquet is TIMESTAMP(NANOS), unreadable by
      Spark otherwise;
    - UTC session timezone: epoch arithmetic and collected timestamps
      must agree with DuckDB's naive-UTC reading regardless of the
      host JVM's default zone.
    """
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    except Exception:
        pass  # static-conf session (rare); session.py already set them


def load_table(spark: SparkSession, name: str, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    _ensure_session_confs(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    # events.ts is parquet TIMESTAMP(NANOS): Spark reads it as a long
    # (spark.sql.legacy.parquet.nanosAsLong); truncate to microseconds
    # (matching DuckDB's CAST(ts AS TIMESTAMP) semantics) and restore a
    # proper TimestampType column.
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        from pyspark.sql import functions as F

        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return df


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    return {name: load_table(spark, name, sf_dir) for name in TABLES}
