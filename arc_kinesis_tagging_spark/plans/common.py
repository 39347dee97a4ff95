"""Shared helpers for the query registry.

Cross-engine determinism rules used by every oracle-checked query:

- **Money/metric aggregates**: cast to DECIMAL per row *before*
  aggregating, cast the exact decimal result to DOUBLE at the end.
  Floating-point addition is not associative, so summing raw doubles
  gives different results for different partition orders — within Spark
  across runs, and between Spark and DuckDB. Decimal sums are exact and
  order-independent; the final double cast is a single deterministic
  rounding. (This is also the right call at 100 TB: money in decimal.)
- **Rank/limit**: every ORDER BY that feeds row_number/limit carries a
  unique tiebreaker column so the selected row *set* is deterministic.
- **Hashes**: only md5/sha2 (bit-identical everywhere), never
  xxhash64/murmur (engine-private).
- **Timestamps**: session timezone pinned to UTC (session.py) so epoch
  arithmetic agrees with DuckDB's naive-timestamp epoch.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Query:
    """A registry entry: Spark builder + optional DuckDB oracle SQL."""

    name: str
    builder: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    note: str = ""


def dec(col: Column | str, scale: int = 2) -> Column:
    # precision 38, not 18: under ANSI mode a value that does not fit
    # the decimal ABORTS the job (NUMERIC_VALUE_OUT_OF_RANGE), and 18
    # digits is only ~1e12 at scale 6 — an outlier metric kills the
    # query. 38 is Spark's max and matches DuckDB's exact-sum result
    # type, so oracle parity is unaffected.
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal(38,{scale})")


def dsum(col: Column | str, scale: int = 2) -> Column:
    """Order-independent double sum: exact decimal sum, then one cast."""
    return F.sum(dec(col, scale)).cast("double")
