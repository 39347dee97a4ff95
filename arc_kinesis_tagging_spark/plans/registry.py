"""The full query registry: SURVEY.md §2 operator inventory, one entry
per operator, each with its DuckDB oracle (or an explicit rows-only
note for non-SQL-expressible ops)."""

from __future__ import annotations

from arc_kinesis_tagging_spark.plans.common import Query
from arc_kinesis_tagging_spark.plans.llmops import LLMOPS_QUERIES
from arc_kinesis_tagging_spark.plans.pipeline_ops import PIPELINE_QUERIES
from arc_kinesis_tagging_spark.plans.quality_ops import QUALITY_QUERIES
from arc_kinesis_tagging_spark.plans.relational import RELATIONAL_QUERIES
from arc_kinesis_tagging_spark.plans.relational2 import RELATIONAL2_QUERIES
from arc_kinesis_tagging_spark.plans.relational3 import RELATIONAL3_QUERIES

# Registry order IS the driver's correctness-check order, and the driver
# evaluates only the FIRST 50 entries per round. The order rotates across
# rounds so every query gets a driver-green row:
#
#   round 1: relational(35) + relational2(9) + relational3[:6]  -> 47/50 green
#   round 2: llmops(27) + relational3(10) + relational2(9) + relational[:4]
#            -> covers everything round 1 missed; every displaced
#               relational entry already has a green r01 row.
#   round 3: pipeline_ops(8) + llmops(27) + relational3(15) = exactly 50.
#            The round-2 CORRECTNESS artifact was never delivered, so the
#            llmops/relational3 window is retained (their rows may not
#            exist yet); the new pipeline_ops queries lead; the displaced
#            relational2/relational tail all carries green r01 rows.
#   round 4 (planned): quality_ops + the round-3 relational additions +
#            whatever round 3's CORRECTNESS run leaves unverified.
#
# Override for ad-hoc runs: AKT_REGISTRY_ROTATION=r1|r2 restores old orders.
import os

_ROT = os.environ.get("AKT_REGISTRY_ROTATION")
if _ROT == "r1":
    ALL_QUERIES: list[Query] = [
        *RELATIONAL_QUERIES,
        *RELATIONAL2_QUERIES,
        *RELATIONAL3_QUERIES,
        *LLMOPS_QUERIES,
        *PIPELINE_QUERIES,
        *QUALITY_QUERIES,
    ]
elif _ROT == "r2":
    ALL_QUERIES = [
        *LLMOPS_QUERIES,
        *RELATIONAL3_QUERIES,
        *RELATIONAL2_QUERIES,
        *RELATIONAL_QUERIES,
        *PIPELINE_QUERIES,
        *QUALITY_QUERIES,
    ]
else:
    ALL_QUERIES = [
        *PIPELINE_QUERIES,
        *LLMOPS_QUERIES,
        *RELATIONAL3_QUERIES,
        *RELATIONAL2_QUERIES,
        *RELATIONAL_QUERIES,
        *QUALITY_QUERIES,
    ]

QUERIES: dict[str, Query] = {q.name: q for q in ALL_QUERIES}

assert len(QUERIES) == len(ALL_QUERIES), "duplicate query names in registry"
