"""Tag-array upsert: the four modify_ans input classes implied by
reference utility/tag.py:31-46 (taxonomy absent / tags empty / tag
already present / other tags present), plus idempotency."""

from pyspark.sql import functions as F

from arc_kinesis_tagging_spark.functions.arrays import make_tag, tag_upsert

TAG = {"slug": "kinesis-autotag", "text": "kinesis autotag"}
OTHER = {"slug": "politics", "text": "Politics"}
ARR_T = "array<struct<slug:string,text:string>>"


def run_upsert(spark, tags_value):
    df = spark.createDataFrame([(1,)], "id int").withColumn(
        "tags", F.lit(tags_value).cast(ARR_T) if tags_value is None else F.expr(tags_value)
    )
    out = df.withColumn("after", tag_upsert(F.col("tags"), make_tag())).collect()[0]
    return [row.asDict() for row in out["after"]]


def test_taxonomy_absent(spark):
    # null tags (taxonomy missing entirely) -> [tag]; the reference
    # raises KeyError here (utility/tag.py:33-35); we implement intent.
    assert run_upsert(spark, None) == [TAG]


def test_tags_empty(spark):
    assert run_upsert(spark, f"cast(array() as {ARR_T})") == [TAG]


def test_tag_already_present_is_noop(spark):
    got = run_upsert(
        spark, "array(named_struct('slug','kinesis-autotag','text','kinesis autotag'))"
    )
    assert got == [TAG]  # no duplicate appended — idempotency guarantee


def test_tag_absent_appends_preserving_existing(spark):
    got = run_upsert(spark, "array(named_struct('slug','politics','text','Politics'))")
    assert got == [OTHER, TAG]


def test_double_upsert_idempotent(spark):
    df = spark.createDataFrame([(1,)], "id int").withColumn(
        "tags", F.lit(None).cast(ARR_T)
    )
    once = tag_upsert(F.col("tags"), make_tag())
    twice = tag_upsert(once, make_tag())
    row = df.withColumn("a", once).withColumn("b", twice).collect()[0]
    assert row["a"] == row["b"]  # re-tagging a replayed record is a no-op
