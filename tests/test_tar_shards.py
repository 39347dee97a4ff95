"""WebDataset-style tar shards (sources/tar_shards.py): byte-level
cross-parity with the stdlib ``tarfile`` in BOTH directions, corrupt-
shard isolation, and the shard build/read round trip."""

import io
import tarfile

import pytest

from arc_kinesis_tagging_spark.sources.tar_shards import (
    build_doc_shards,
    build_tar,
    parse_tar,
    read_doc_shards,
)


def _stdlib_tar(members):
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT) as t:
        for name, data in members:
            info = tarfile.TarInfo(name)
            info.size = len(data)
            info.mode = 0o644
            info.mtime = 0
            info.uid = info.gid = 0
            info.uname = info.gname = ""
            t.addfile(info, io.BytesIO(data))
    return buf.getvalue()


MEMBERS = [
    ("00000001.txt", b"hello world"),
    ("00000001.cls", b"en"),
    ("00000002.txt", b"x" * 513),   # spans two data blocks
    ("00000002.cls", b""),          # empty member
    ("00000003.txt", bytes(range(256)) * 4),
]


def test_tar_writer_matches_stdlib_byte_for_byte():
    """Our from-spec ustar writer produces the same bytes as the
    stdlib tarfile for the same members (mode 644, mtime 0) — header
    layout, checksums, member padding, and the zero trailer — up to
    tarfile's extra archive-level padding (it rounds the whole file
    to a 20-block record size; both paddings are all-zero and both
    archives are spec-valid)."""
    mine, std = build_tar(MEMBERS), _stdlib_tar(MEMBERS)
    assert std[: len(mine)] == mine
    assert std[len(mine):].strip(b"\0") == b""
    assert len(mine) % 512 == 0


def test_tar_parser_reads_stdlib_output_and_vice_versa():
    # our parser on stdlib bytes
    assert parse_tar(_stdlib_tar(MEMBERS)) == MEMBERS
    # stdlib parser on our bytes
    with tarfile.open(fileobj=io.BytesIO(build_tar(MEMBERS))) as t:
        got = [
            (m.name, t.extractfile(m).read()) for m in t.getmembers()
        ]
    assert got == MEMBERS


def test_tar_parser_rejects_corruption():
    good = build_tar(MEMBERS)
    flipped = bytearray(good)
    flipped[30] ^= 0xFF  # inside the first header's name field
    for bad in (
        bytes(flipped),            # checksum mismatch
        good[: len(good) - 1024],  # missing trailer
        good[:700],                # truncated member data
    ):
        try:
            parse_tar(bad)
            raise AssertionError("expected tar parse error")
        except ValueError:
            pass


def test_doc_shard_round_trip_and_isolation(spark):
    df = spark.createDataFrame(
        [(i, f"doc {i} text" * (i % 3 + 1), ["en", "de", "fr"][i % 3])
         for i in range(25)],
        "doc_id long, text string, lang string",
    )
    shards = build_doc_shards(df, shard_size=10)
    srows = shards.collect()
    assert {r["shard_id"] for r in srows} == {0, 1, 2}
    assert sum(r["n_samples"] for r in srows) == 25
    # members inside a shard are sorted by id and parse with stdlib
    s0 = next(r for r in srows if r["shard_id"] == 0)
    with tarfile.open(fileobj=io.BytesIO(bytes(s0["shard"]))) as t:
        names = [m.name for m in t.getmembers()]
    keys = [n.partition(".")[0] for n in names]
    assert keys == sorted(keys) and len(names) == 2 * s0["n_samples"]
    assert [n.partition(".")[2] for n in names] == ["txt", "cls"] * s0["n_samples"]
    back = {r["doc_id"]: r for r in read_doc_shards(shards).collect()}
    assert set(back) == set(range(25))
    for i in range(25):
        r = back[i]
        assert r["shard_id"] == i // 10
        assert r["n_members"] == 2
        assert r["txt_bytes"] == len(f"doc {i} text" * (i % 3 + 1))
        assert r["cls"] == ["en", "de", "fr"][i % 3]
    # corrupt shard isolates to one null row
    bad = spark.createDataFrame(
        [(9, bytearray(b"not a tar at all" * 40))],
        "shard_id long, shard binary",
    )
    rows = read_doc_shards(bad).collect()
    assert len(rows) == 1 and rows[0]["doc_id"] is None
    assert rows[0]["shard_id"] == 9


def test_multimodal_shards_decode_images_with_isolation(spark):
    """Tar + PNG composed: shards carry genuine PNG members whose
    decoded means match the analytic fixture; a corrupt PNG inside an
    otherwise-good shard nulls only that sample's image columns while
    text columns and sibling samples survive."""
    import numpy as np

    from arc_kinesis_tagging_spark.operators.multimodal import _png_pixels
    from arc_kinesis_tagging_spark.sources.tar_shards import (
        build_multimodal_shards,
        read_multimodal_shards,
    )

    df = spark.createDataFrame(
        [(i, f"text {i}") for i in range(12)], "doc_id long, text string"
    )
    shards = build_multimodal_shards(df, shard_size=5)
    out = {r["doc_id"]: r for r in read_multimodal_shards(shards).collect()}
    assert set(out) == set(range(12))
    for i in range(12):
        px = _png_pixels(i).astype("float64")
        r = out[i]
        assert r["shard_id"] == i // 5
        assert r["txt_bytes"] == len(f"text {i}")
        assert (r["width"], r["height"]) == (px.shape[1], px.shape[0])
        assert r["mean_r"] == px[:, :, 0].mean()
        assert r["mean_b"] == px[:, :, 2].mean()
    # corrupt one sample's PNG member inside a rebuilt shard
    from arc_kinesis_tagging_spark.operators.multimodal import (
        encode_png_rgb8,
    )
    from arc_kinesis_tagging_spark.sources.tar_shards import build_tar

    members = []
    for i in range(3):
        members.append((f"{i:08d}.txt", f"text {i}".encode()))
        png = encode_png_rgb8(_png_pixels(i))
        if i == 1:
            png = png[:20] + b"\xff" * 10 + png[30:]  # break a chunk CRC
        members.append((f"{i:08d}.png", png))
    bad = spark.createDataFrame(
        [(0, bytearray(build_tar(members)))], "shard_id long, shard binary"
    )
    rows = {r["doc_id"]: r for r in read_multimodal_shards(bad).collect()}
    assert rows[1]["width"] is None and rows[1]["txt_bytes"] == 6
    assert rows[0]["width"] is not None and rows[2]["width"] is not None


def test_tarshard_datasource_partitions_and_rows(spark, tmp_path):
    """The batch connector: one input partition per shard file, one
    row per member, binary payloads intact; composes with DataFrame
    ops (per-sample regroup) on top."""
    import os

    from arc_kinesis_tagging_spark.sources.tar_shards import (
        TarShardDataSource,
        build_tar,
    )

    d = str(tmp_path / "shards")
    os.makedirs(d)
    for sid in range(3):
        members = []
        for i in range(sid * 2, sid * 2 + 2):
            members.append((f"{i:08d}.txt", f"text-{i}".encode()))
            members.append((f"{i:08d}.bin", bytes([i]) * 100))
        with open(os.path.join(d, f"shard-{sid:06d}.tar"), "wb") as fh:
            fh.write(build_tar(members))
    # a non-tar file in the directory is ignored by the lister
    with open(os.path.join(d, "README"), "w") as fh:
        fh.write("not a shard")
    spark.dataSource.register(TarShardDataSource)
    df = spark.read.format("tarshard").option("path", d).load()
    assert df.rdd.getNumPartitions() == 3
    rows = df.collect()
    assert len(rows) == 12
    by_name = {r["name"]: r for r in rows}
    assert by_name["00000003.bin"]["size"] == 100
    assert bytes(by_name["00000003.bin"]["data"]) == bytes([3]) * 100
    assert by_name["00000002.txt"]["key"] == "00000002"
    assert by_name["00000002.txt"]["ext"] == "txt"
    assert by_name["00000002.txt"]["shard"] == "shard-000001.tar"
    from pyspark.sql import functions as F

    per_sample = (
        df.groupBy("key").agg(F.count(F.lit(1)).alias("n")).collect()
    )
    assert len(per_sample) == 6 and all(r["n"] == 2 for r in per_sample)


def test_corrupt_regroup_isolates_whole_shard(spark):
    """A shard whose MEMBERS parse but whose sample key is not numeric
    must isolate to exactly ONE null row — no partial sample rows from
    the same shard (round-7 advice: rows were appended inside the try
    block, so a mid-regroup failure leaked the already-accumulated
    samples alongside the null)."""
    from arc_kinesis_tagging_spark.sources.tar_shards import (
        build_tar,
        read_doc_shards,
        read_multimodal_shards,
    )

    bad = build_tar(
        [
            ("00000001.txt", b"good first sample"),
            ("00000002.txt", b"good second sample"),
            ("not-a-number.txt", b"poisons the regroup"),
        ]
    )
    shards = spark.createDataFrame(
        [(7, bad)], "shard_id long, shard binary"
    )
    rows = read_doc_shards(shards).collect()
    assert len(rows) == 1
    assert rows[0]["doc_id"] is None and rows[0]["shard_id"] == 7
    mrows = read_multimodal_shards(shards).collect()
    assert len(mrows) == 1
    assert mrows[0]["doc_id"] is None and mrows[0]["shard_id"] == 7


def test_tar_member_size_guard():
    """The 12-char octal size field caps at 8 GiB; a larger member
    must raise instead of silently growing the header (round-7
    advice). Checked via a zero-copy fake len, not a real 8 GiB
    buffer."""
    from arc_kinesis_tagging_spark.sources.tar_shards import tar_member

    class FakeBytes(bytes):
        def __len__(self):
            return 8**11

    with pytest.raises(ValueError, match="too large"):
        tar_member("x.bin", FakeBytes())


def test_pack_bins_ffd_string_key_and_long_partition(spark):
    """pack_bins_ffd must derive the id/partition column types from
    the input (round-7 advice: the hardcoded '{part} string, {key}
    long' schema crashed on a string doc key or numeric partition)."""
    from arc_kinesis_tagging_spark.operators.chunking import pack_bins_ffd

    df = spark.createDataFrame(
        [
            (1, "doc-a", "one two three"),
            (1, "doc-b", "four five"),
            (2, "doc-c", "six"),
        ],
        "src long, doc string, text string",
    )
    out = pack_bins_ffd(
        df, text_col="text", key_col="doc", part_col="src", capacity=4
    ).collect()
    assert {r["doc"] for r in out} == {"doc-a", "doc-b", "doc-c"}
    assert dict((r["doc"], r["bin_id"]) for r in out)["doc-a"] == 0
