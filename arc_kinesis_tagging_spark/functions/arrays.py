"""Tag-array upsert — the reference's core mutation, as pure column expressions.

The reference mutates a nested dict in Python (`modify_ans`,
reference utility/tag.py:31-46): ensure ``taxonomy.tags`` exists, then
append the tag only if an identical element is not already present.
That append-if-absent is the idempotency guarantee that makes the
at-least-once sink safe (re-tagging is a no-op).

Here the same semantics are a single null-safe Catalyst expression —
no UDF, fully codegen'd, and it also fixes the reference's latent
KeyError when ``taxonomy`` is entirely absent (utility/tag.py:33-35
assigns into ``ans['taxonomy']`` without creating it; we implement the
documented intent instead).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType, StructField, StructType

TAG_SCHEMA = ArrayType(
    StructType(
        [
            StructField("slug", StringType()),
            StructField("text", StringType()),
        ]
    )
)

# The constant tag the reference applies (utility/tag.py:59-62); the
# "decide" step is an extension point for arbitrary business logic
# (utility/tag.py:53-58) — callers pass any struct column instead.
AUTOTAG = ("kinesis-autotag", "kinesis autotag")


def make_tag(slug: str = AUTOTAG[0], text: str = AUTOTAG[1]) -> Column:
    return F.struct(F.lit(slug).alias("slug"), F.lit(text).alias("text"))


def tag_upsert(tags: Column, tag: Column) -> Column:
    """Append ``tag`` to ``tags`` iff not already present (whole-element
    equality, matching ``if tag not in tags`` at utility/tag.py:43-44).

    ``array_union`` dedups by element equality and preserves first-seen
    order, so it is exactly append-if-absent; ``coalesce`` covers the
    absent/null ``taxonomy.tags`` branches (utility/tag.py:33-41).
    """
    empty = F.array().cast("array<struct<slug:string,text:string>>")
    return F.array_union(F.coalesce(tags, empty), F.array(tag))


def tag_contains(tags: Column, tag: Column) -> Column:
    """Null-safe membership check (the ``tag in tags`` test)."""
    return F.coalesce(F.array_contains(tags, tag), F.lit(False))
