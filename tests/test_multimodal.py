"""Multimodal binary-column plumbing: fake-container encode/decode via
mapInPandas, metadata correctness, per-record error isolation."""

import hashlib

from pyspark.sql import functions as F

from arc_kinesis_tagging_spark.operators.multimodal import (
    attach_fake_media,
    decode_media,
)
from arc_kinesis_tagging_spark.sources.tables import load_table


def test_roundtrip_metadata(spark, sf_dir):
    docs = load_table(spark, "documents", sf_dir).limit(20)
    decoded = decode_media(attach_fake_media(docs, "doc_id", "text"), "doc_id", "media")
    rows = {r["media_id"]: r for r in decoded.collect()}
    src = {r["doc_id"]: r["text"] for r in docs.collect()}
    assert set(rows) == set(src)
    for doc_id, text in src.items():
        r = rows[doc_id]
        assert r["media_type"] == "image"
        assert r["width"] == doc_id % 64 + 16
        assert r["height"] == doc_id % 48 + 16
        assert r["n_payload_bytes"] == len(text.encode())
        assert r["payload_sha"] == hashlib.sha256(text.encode()).hexdigest()


def test_corrupt_payload_isolated(spark):
    df = spark.createDataFrame(
        [(1, bytearray(b"not-a-container")), (2, None)], "doc_id long, media binary"
    )
    rows = {r["media_id"]: r for r in decode_media(df).collect()}
    assert rows[1]["media_type"] is None  # null row, job did not fail
    assert rows[2]["media_type"] is None
