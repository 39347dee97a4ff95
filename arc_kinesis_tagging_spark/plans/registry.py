"""The full query registry: SURVEY.md §2 operator inventory, one entry
per operator, each with its DuckDB oracle (or an explicit rows-only
note for non-SQL-expressible ops)."""

from __future__ import annotations

from arc_kinesis_tagging_spark.plans.common import Query
from arc_kinesis_tagging_spark.plans.llmops import LLMOPS_QUERIES
from arc_kinesis_tagging_spark.plans.relational import RELATIONAL_QUERIES
from arc_kinesis_tagging_spark.plans.relational2 import RELATIONAL2_QUERIES
from arc_kinesis_tagging_spark.plans.relational3 import RELATIONAL3_QUERIES

ALL_QUERIES: list[Query] = [
    *RELATIONAL_QUERIES,
    *RELATIONAL2_QUERIES,
    *RELATIONAL3_QUERIES,
    *LLMOPS_QUERIES,
]

QUERIES: dict[str, Query] = {q.name: q for q in ALL_QUERIES}

assert len(QUERIES) == len(ALL_QUERIES), "duplicate query names in registry"
