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


def test_scd2_redelivery_idempotent(spark):
    """VERDICT r05 #7: SCD2 re-delivery property. Applying the SAME
    change batch twice must yield a byte-identical dimension table —
    the second application sees the opened rows as no-ops (new value
    == current value) and the is_current guard keeps already-closed
    history rows from double-closing. Randomized dimension/batch
    across several seeds, including keys absent from the batch,
    no-op changes, and multi-generation history rows."""
    import random

    from arc_kinesis_tagging_spark.plans.relational3 import scd2_apply

    for seed in (3, 11, 42):
        rng = random.Random(seed)
        langs = ["en", "de", "fr", "es"]
        dim_rows = []
        for key in range(40):
            gens = rng.randint(1, 3)  # multi-generation history
            for g in range(gens):
                dim_rows.append(
                    (
                        key,
                        rng.choice(langs),
                        g * 100,
                        None if g == gens - 1 else (g + 1) * 100,
                        g == gens - 1,
                    )
                )
        dim = spark.createDataFrame(
            dim_rows,
            "doc_id long, lang string, valid_from long, valid_to long, "
            "is_current boolean",
        )
        batch = spark.createDataFrame(
            [(k, rng.choice(langs + [None]) or rng.choice(langs))
             for k in range(0, 40, 2)],
            "doc_id long, new_lang string",
        )
        once = scd2_apply(dim, batch, 1000).localCheckpoint(eager=True)
        twice = scd2_apply(once, batch, 1000)

        def canon(df):
            return sorted(
                (r["doc_id"], r["lang"], r["valid_from"], r["valid_to"],
                 r["is_current"])
                for r in df.collect()
            )

        assert canon(once) == canon(twice), seed
        # and one generation actually changed (the test isn't vacuous)
        base = {(r[0], r[1]) for r in dim_rows if r[4]}
        now = {
            (r["doc_id"], r["lang"])
            for r in once.filter("is_current").collect()
        }
        assert now != base, seed
