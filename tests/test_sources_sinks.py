"""File readers (JSON/CSV with corrupt capture) and sinks (partitioned
parquet with pruning, batch keyed upsert)."""

from pyspark.sql import functions as F

from arc_kinesis_tagging_spark.sources.readers import (
    read_csv,
    read_json,
    upsert_by_key_parquet,
    write_partitioned_parquet,
)


def test_json_reader_corrupt_capture(spark, tmp_path):
    p = tmp_path / "in.jsonl"
    p.write_text(
        '{"id": 1, "name": "a"}\n'
        'not json at all\n'
        '{"id": 2, "name": "b"}\n'
    )
    df = read_json(spark, str(p), "id long, name string")
    rows = df.collect()
    good = {(r["id"], r["name"]) for r in rows if r["_corrupt_record"] is None}
    bad = [r["_corrupt_record"] for r in rows if r["_corrupt_record"] is not None]
    assert good == {(1, "a"), (2, "b")}
    assert bad == ["not json at all"]


def test_csv_reader(spark, tmp_path):
    p = tmp_path / "in.csv"
    p.write_text("id,name\n1,a\n2,b\n")
    df = read_csv(spark, str(p), "id long, name string")
    assert {(r["id"], r["name"]) for r in df.collect()} == {(1, "a"), (2, "b")}


def test_partitioned_write_prunes(spark, sf_dir, tmp_path):
    from arc_kinesis_tagging_spark.sources.tables import load_table

    orders = load_table(spark, "orders", sf_dir)
    out = str(tmp_path / "orders_part")
    write_partitioned_parquet(orders, out, ["o_orderstatus"])
    back = spark.read.parquet(out)
    pruned = back.filter(F.col("o_orderstatus") == "F")
    # partition pruning: only files under o_orderstatus=F are read
    files = pruned.select(F.input_file_name()).distinct().collect()
    assert files and all("o_orderstatus=F" in r[0] for r in files)
    assert pruned.count() == orders.filter(F.col("o_orderstatus") == "F").count()


def test_upsert_by_key_parquet(spark, tmp_path):
    path = str(tmp_path / "docs")
    v1 = spark.createDataFrame(
        [("a", 1, "first"), ("b", 1, "first")], "id string, version int, body string"
    )
    upsert_by_key_parquet(spark, v1, path, "id", "version")
    v2 = spark.createDataFrame(
        [("b", 2, "updated"), ("c", 1, "new")], "id string, version int, body string"
    )
    upsert_by_key_parquet(spark, v2, path, "id", "version")
    got = {
        r["id"]: (r["version"], r["body"])
        for r in spark.read.parquet(path).collect()
    }
    assert got == {"a": (1, "first"), "b": (2, "updated"), "c": (1, "new")}
