"""The story-tagging pipeline as composable DataFrame transforms.

Each stage is a pure DataFrame -> DataFrame function that works
identically on batch and streaming inputs, so batch tests cover the
streaming logic (SURVEY.md §7). The composition mirrors the reference's
per-record loop (app.py:33-75) as a declarative plan:

    decompress (R6) -> parse w/ corrupt routing (R7/R8) ->
    filter (R9) -> project + lineage (R10/R11)

with the enrichment/writeback stages (R12-R17) in sinks.py.

Stage ordering matters for the optimizer: the gzip UDF is a black box
to Catalyst, so any predicate on source metadata (shard, sequence)
must be applied BEFORE decode — after it, nothing pushes down.
"""

from __future__ import annotations

import gzip

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

# Declared schema for the fields the pipeline touches (the reference
# reads exactly these, app.py:56-67 + utility/tag.py:33-44). The rest
# of the ANS document intentionally stays in the raw JSON string —
# schema-on-read for the long tail, declared schema for the hot path.
ANS_SCHEMA = (
    "id string, operation string, published boolean, created boolean, "
    "type string, trigger struct<referent_update:boolean>, "
    "body struct<headlines:struct<basic:string>, revision:string>, "
    "taxonomy struct<tags:array<struct<slug:string,text:string>>>"
)


@F.pandas_udf(StringType())
def gunzip_text(data: pd.Series) -> pd.Series:
    """Arrow-batched gzip decode; failures yield null instead of
    killing the stream (the reference's decompress-failure branch
    prints and falls through buggily, app.py:35-38 — here a null
    routes to the dead-letter side)."""

    def one(blob):
        if blob is None:
            return None
        try:
            return gzip.decompress(bytes(blob)).decode("utf-8")
        except Exception:
            return None

    return data.map(one)


def decode_and_route(records: DataFrame) -> DataFrame:
    """records(data, shard_id, seq) -> decoded rows with routing class.

    Output columns: shard_id, seq, doc (struct, null unless 'ok'),
    url (string, only for 'url_pointer'), raw_text, route in
    {'ok','url_pointer','dead_letter'}.

    Routing mirrors app.py:35-46: un-gunzippable -> dead letter;
    gunzipped but not a JSON object -> treat payload as the S3 URL of
    an oversized document ({'url': s}); else parsed document.
    """
    decoded = records.withColumn("raw_text", gunzip_text(F.col("data")))
    # PERMISSIVE from_json yields an all-null struct (not null) for
    # malformed input, so malformed-ness must be detected via the
    # corrupt-record column: _corrupt carries the raw payload exactly
    # when parsing failed. A bare S3-URL string is malformed for a
    # struct schema, so oversized-document pointers land there.
    parsed = decoded.withColumn(
        "parsed",
        F.from_json(
            F.col("raw_text"),
            ANS_SCHEMA + ", _corrupt string",
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt"},
        ),
    )
    route = (
        F.when(F.col("raw_text").isNull(), F.lit("dead_letter"))
        .when(F.col("parsed._corrupt").isNotNull(), F.lit("url_pointer"))
        .otherwise(F.lit("ok"))
    )
    return (
        parsed.withColumn("route", route)
        .withColumn("doc", F.col("parsed").dropFields("_corrupt"))
        .withColumn("url", F.when(F.col("route") == "url_pointer", F.col("raw_text")))
        .select("shard_id", "seq", "route", "doc", "url", "raw_text")
    )


def filter_publish_events(decoded: DataFrame, first_publish_only: bool = False) -> Column | DataFrame:
    """The conjunctive publish predicate (app.py:56; README.md:227-233
    documents the intended general form without the debug id pin).
    ``first_publish_only`` adds the created==True conjunct the
    reference suggests for first-publish detection (app.py:54)."""
    pred = (
        (F.col("route") == "ok")
        & (F.col("doc.operation") == "insert-story")
        & F.col("doc.published")
    )
    if first_publish_only:
        pred = pred & F.col("doc.created")
    return decoded.filter(pred)


def project_story_fields(filtered: DataFrame) -> DataFrame:
    """The 9-field projection + shard lineage (app.py:56-67).

    Spark nested-field access is null-safe end-to-end, subsuming the
    reference's manual guard on trigger (app.py:64) and fixing its
    unguarded body.headlines chain (app.py:65) which crashes on
    partial documents.
    """
    return filtered.select(
        F.col("doc.id").alias("_id"),
        F.col("doc.operation").alias("operation"),
        F.col("doc.created").alias("created"),
        F.col("doc.type").alias("type"),
        F.col("doc.published").alias("published"),
        F.col("doc.trigger.referent_update").alias("referent_update"),
        F.col("doc.body.headlines.basic").alias("headline"),
        F.col("doc.body.revision").alias("revision"),
        F.col("doc.taxonomy.tags").alias("tags"),
        F.col("shard_id").alias("shard_origination"),
        F.col("seq").alias("seq"),
    )


def story_pipeline(records: DataFrame, first_publish_only: bool = False) -> DataFrame:
    """decode -> route -> filter -> project, as one composition."""
    return project_story_fields(
        filter_publish_events(decode_and_route(records), first_publish_only)
    )


def dead_letters(records: DataFrame) -> DataFrame:
    """Side output: everything that did not parse as a document —
    the dead-letter/url classes (R8/R16), kept instead of dropped."""
    d = decode_and_route(records)
    return d.filter(F.col("route") != "ok").select("shard_id", "seq", "route", "url")
