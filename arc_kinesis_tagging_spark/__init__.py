"""arc_kinesis_tagging_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the capabilities of
washingtonpost/arc-kinesis-tagging (a Kinesis stream consumer that
enriches Arc Publishing content events with tags), extended into a
full batch + streaming analytics surface designed for 100 TB scale:

- the reference's semantic core (decompress -> parse -> filter ->
  project -> keyed enrichment lookup -> idempotent tag-array upsert ->
  keyed upsert sink, with per-record error isolation), see
  ``streaming/`` and ``functions/arrays.py``;
- the relational operator surface (joins, aggregations, windows,
  set ops, scalar functions), see ``plans/registry.py``;
- LLM-data-pipeline operators (exact/near dedup, similarity search,
  text analysis, multimodal columns), see ``operators/``.

Reference citations in docstrings use ``<file>:<line>`` paths into
/root/reference (read-only).
"""

from arc_kinesis_tagging_spark.session import get_session

__all__ = ["get_session"]
__version__ = "0.1.0"
