from arc_kinesis_tagging_spark.plans.registry import QUERIES, Query

__all__ = ["QUERIES", "Query"]
