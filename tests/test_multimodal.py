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


def test_resize_media(spark, sf_dir):
    from arc_kinesis_tagging_spark.operators.multimodal import resize_media

    docs = load_table(spark, "documents", sf_dir).limit(10)
    media = attach_fake_media(docs, "doc_id", "text")
    resized = resize_media(media, "doc_id", "media", max_dim=16)
    rows = {r["media_id"]: r for r in resized.collect()}
    for r in rows.values():
        assert r["resized"]["width"] <= 16 and r["resized"]["height"] <= 16
        # re-encoded container must itself decode (pipeline composability)
    redecoded = decode_media(resized, "media_id", "media").collect()
    assert all(x["media_type"] == "image" for x in redecoded)
    assert {x["width"] for x in redecoded} <= set(range(1, 17))


def test_frame_sample_media(spark, sf_dir):
    from arc_kinesis_tagging_spark.operators.multimodal import frame_sample_media

    docs = load_table(spark, "documents", sf_dir).limit(5)
    media = attach_fake_media(docs, "doc_id", "text")
    frames = frame_sample_media(media, "doc_id", "media", every_n=3).collect()
    by_doc = {}
    for f in frames:
        by_doc.setdefault(f["media_id"], []).append(f)
    assert set(by_doc) == {r["doc_id"] for r in docs.collect()}
    for doc_frames in by_doc.values():
        idxs = sorted(f["frame_index"] for f in doc_frames)
        assert idxs == list(range(0, doc_frames[0]["n_frames"], 3))
        assert all(len(f["frame_sha"]) == 64 for f in doc_frames)
