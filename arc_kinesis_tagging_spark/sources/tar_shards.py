"""WebDataset-style tar-shard container source.

Large multimodal training corpora ship as TAR SHARDS (the WebDataset
convention): each shard is a POSIX tar whose member files group by
sample key — ``00000123.txt``, ``00000123.cls``, ``00000123.jpg`` are
one sample — and the shard, not the sample, is the unit of
parallelism. This module gives the engine that source: a pure
from-spec ustar writer and parser (header layout, octal fields,
checksum, 512-byte block padding, two-zero-block trailer — verified
byte-for-byte against the stdlib ``tarfile`` in
tests/test_tar_shards.py) and the Spark plumbing to build shards from
a table and to explode shards back into per-sample rows.

Scale shape: shard assembly is ONE groupBy on the shard key (groups
are bounded by the shard size, so no skew pileup) followed by a
map-only Arrow encode; parsing is map-only per shard blob, and
because every member of a sample lives in one shard, sample
regrouping happens INSIDE the parser — no second shuffle at any
corpus size. This is the binary-column discipline of
operators/multimodal.py applied to the container layer above it.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_BLK = 512


def _octal(n: int, width: int) -> bytes:
    return (f"%0{width - 1}o" % n).encode() + b"\0"


def tar_member(name: str, data: bytes) -> bytes:
    """One ustar member: 512-byte header + data padded to 512."""
    nb = name.encode()
    if len(nb) > 100:
        raise ValueError("member name too long for ustar")
    if len(data) >= 8**11:  # 12-char octal size field caps at 8 GiB;
        # a longer _octal would silently GROW the header past 512
        # bytes via the slice assignment, writing a corrupt shard
        raise ValueError("member data too large for a ustar size field")
    hdr = bytearray(_BLK)
    hdr[0 : len(nb)] = nb
    hdr[100:108] = _octal(0o644, 8)          # mode
    hdr[108:116] = _octal(0, 8)              # uid
    hdr[116:124] = _octal(0, 8)              # gid
    hdr[124:136] = _octal(len(data), 12)     # size
    hdr[136:148] = _octal(0, 12)             # mtime (deterministic)
    hdr[148:156] = b" " * 8                  # chksum placeholder
    hdr[156] = ord("0")                      # typeflag: regular file
    hdr[257:263] = b"ustar\0"                # magic
    hdr[263:265] = b"00"                     # version
    chk = sum(hdr)
    hdr[148:156] = (b"%06o" % chk) + b"\0 "
    pad = (-len(data)) % _BLK
    return bytes(hdr) + data + b"\0" * pad


def build_tar(members: list[tuple[str, bytes]]) -> bytes:
    """A complete tar: members in order + two zero trailer blocks."""
    out = bytearray()
    for name, data in members:
        out += tar_member(name, data)
    out += b"\0" * (2 * _BLK)
    return bytes(out)


def parse_tar(b: bytes) -> list[tuple[str, bytes]]:
    """Walk a ustar stream: verify each header checksum, read sizes
    from octal, stop at the zero trailer. Raises on a corrupt header
    or truncated member (-> null row under per-record isolation)."""
    out = []
    pos = 0
    while pos + _BLK <= len(b):
        hdr = b[pos : pos + _BLK]
        if hdr == b"\0" * _BLK:  # trailer
            break
        stored = int(hdr[148:155].rstrip(b"\0 ") or b"0", 8)
        calc = sum(hdr[:148]) + 8 * 0x20 + sum(hdr[156:])
        if stored != calc:
            raise ValueError("tar header checksum mismatch")
        name = hdr[:100].rstrip(b"\0").decode()
        size = int(hdr[124:135].rstrip(b"\0 ") or b"0", 8)
        data_at = pos + _BLK
        if data_at + size > len(b):
            raise ValueError("truncated tar member")
        out.append((name, b[data_at : data_at + size]))
        pos = data_at + size + ((-size) % _BLK)
    else:
        raise ValueError("tar stream has no trailer")
    return out


def build_doc_shards(
    df: DataFrame,
    shard_size: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    cls_col: str = "lang",
) -> DataFrame:
    """Pack the corpus into WebDataset-style shards: shard key =
    id // shard_size; each sample contributes ``<id:08d>.txt`` (the
    UTF-8 text) and ``<id:08d>.cls`` (the class/label string), members
    sorted by id within the shard for determinism. One bounded-group
    shuffle + a map-only tar encode. Returns (shard_id, shard binary,
    n_samples)."""
    grouped = (
        df.select(
            (F.col(id_col) / shard_size).cast("long").alias("shard_id"),
            F.struct(
                F.col(id_col).alias("id"),
                F.col(text_col).alias("txt"),
                F.col(cls_col).alias("cls"),
            ).alias("s"),
        )
        .groupBy("shard_id")
        .agg(F.sort_array(F.collect_list("s")).alias("samples"))
    )

    def enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for sid, samples in zip(pdf["shard_id"], pdf["samples"]):
                members = []
                for s in samples:
                    i = int(s["id"])
                    members.append(
                        (f"{i:08d}.txt", (s["txt"] or "").encode())
                    )
                    members.append(
                        (f"{i:08d}.cls", (s["cls"] or "").encode())
                    )
                rows.append((int(sid), build_tar(members), len(samples)))
            yield pd.DataFrame(
                rows, columns=["shard_id", "shard", "n_samples"]
            )

    return grouped.mapInPandas(
        enc, "shard_id long, shard binary, n_samples int"
    )


def read_doc_shards(
    shards: DataFrame,
    shard_col: str = "shard",
    shard_id_col: str = "shard_id",
) -> DataFrame:
    """Explode tar shards back into per-SAMPLE rows: parse the ustar
    stream, group members by the sample key (basename before the first
    dot) inside the parser — no shuffle — and emit per-sample
    (doc_id, shard_id, n_members, txt_bytes, cls, payload_md5).
    Corrupt shards isolate to one null row."""
    import hashlib

    def dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for sid, blob in zip(pdf[shard_id_col], pdf[shard_col]):
                sid_out = None if pd.isna(sid) else int(sid)
                try:
                    groups: dict[str, dict[str, bytes]] = {}
                    for name, data in parse_tar(bytes(blob)):
                        key, _, ext = name.partition(".")
                        groups.setdefault(key, {})[ext] = data
                    # accumulate locally and emit only once the WHOLE
                    # shard regrouped: an exception mid-loop (e.g. a
                    # non-numeric member basename) must isolate to ONE
                    # null row, not partial sample rows plus a null
                    shard_rows = []
                    for key in sorted(groups):
                        g = groups[key]
                        txt = g.get("txt", b"")
                        shard_rows.append(
                            (
                                int(key),
                                sid_out,
                                len(g),
                                len(txt),
                                g.get("cls", b"").decode(),
                                hashlib.md5(txt).hexdigest(),
                            )
                        )
                    rows.extend(shard_rows)
                except Exception:
                    rows.append((None, sid_out, None, None, None, None))
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "shard_id", "n_members", "txt_bytes",
                    "cls", "payload_md5",
                ],
            )

    return shards.select(shard_id_col, shard_col).mapInPandas(
        dec,
        "doc_id long, shard_id long, n_members int, txt_bytes int, "
        "cls string, payload_md5 string",
    )


def build_multimodal_shards(
    df: DataFrame,
    shard_size: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Multimodal WebDataset shards: each sample contributes
    ``<id>.txt`` (UTF-8 text) and ``<id>.png`` — a GENUINE PNG from
    the deterministic gradient fixture (operators/multimodal.py:
    _png_pixels / encode_png_rgb8) — so the shard carries real image
    bytes through the real container, exactly the text+image pairing
    a vision-language corpus ships. Same one-bounded-groupBy +
    map-only-encode shape as build_doc_shards."""
    from arc_kinesis_tagging_spark.operators.multimodal import (
        _png_pixels,
        encode_png_rgb8,
    )

    grouped = (
        df.select(
            (F.col(id_col) / shard_size).cast("long").alias("shard_id"),
            F.struct(
                F.col(id_col).alias("id"),
                F.col(text_col).alias("txt"),
            ).alias("s"),
        )
        .groupBy("shard_id")
        .agg(F.sort_array(F.collect_list("s")).alias("samples"))
    )

    def enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for sid, samples in zip(pdf["shard_id"], pdf["samples"]):
                members = []
                for s in samples:
                    i = int(s["id"])
                    members.append(
                        (f"{i:08d}.txt", (s["txt"] or "").encode())
                    )
                    members.append(
                        (f"{i:08d}.png", encode_png_rgb8(_png_pixels(i)))
                    )
                rows.append((int(sid), build_tar(members), len(samples)))
            yield pd.DataFrame(
                rows, columns=["shard_id", "shard", "n_samples"]
            )

    return grouped.mapInPandas(
        enc, "shard_id long, shard binary, n_samples int"
    )


def read_multimodal_shards(
    shards: DataFrame,
    shard_col: str = "shard",
    shard_id_col: str = "shard_id",
) -> DataFrame:
    """Parse multimodal shards AND decode the image member in the same
    map-only pass: ustar walk -> per-sample regroup -> real PNG decode
    (CRC chunk walk, inflate, unfilter) -> per-sample text stats +
    image dims + exact channel means. The full container-to-features
    path of a vision-language ingest, one Arrow pass, zero shuffles.
    A corrupt shard isolates to one null row; a corrupt PNG inside an
    otherwise-good shard isolates to null image columns for that
    sample only."""
    from arc_kinesis_tagging_spark.operators.multimodal import (
        decode_png_rgb8_bytes,
    )

    def dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for sid, blob in zip(pdf[shard_id_col], pdf[shard_col]):
                sid_out = None if pd.isna(sid) else int(sid)
                try:
                    groups: dict[str, dict[str, bytes]] = {}
                    for name, data in parse_tar(bytes(blob)):
                        key, _, ext = name.partition(".")
                        groups.setdefault(key, {})[ext] = data
                    # local accumulation: emit only after the whole
                    # shard regrouped, so a mid-loop exception (e.g. a
                    # non-numeric basename) isolates to ONE null row
                    # instead of partial rows plus a null
                    shard_rows = []
                    for key in sorted(groups):
                        g = groups[key]
                        txt = g.get("txt", b"")
                        try:
                            px = decode_png_rgb8_bytes(
                                g["png"]
                            ).astype("float64")
                            h, w, _ = px.shape
                            img = (
                                w, h,
                                float(px[:, :, 0].mean()),
                                float(px[:, :, 1].mean()),
                                float(px[:, :, 2].mean()),
                            )
                        except Exception:
                            img = (None, None, None, None, None)
                        shard_rows.append(
                            (int(key), sid_out, len(txt), *img)
                        )
                    rows.extend(shard_rows)
                except Exception:
                    rows.append(
                        (None, sid_out, None, None, None, None, None, None)
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "shard_id", "txt_bytes", "width", "height",
                    "mean_r", "mean_g", "mean_b",
                ],
            )

    return shards.select(shard_id_col, shard_col).mapInPandas(
        dec,
        "doc_id long, shard_id long, txt_bytes int, width int, "
        "height int, mean_r double, mean_g double, mean_b double",
    )


# --- Spark Python Data Source: spark.read.format("tarshard") -----------------
# The connector form of the shard reader: tar shards as a FIRST-CLASS
# batch source (Spark 4 Python Data Source API, SPARK-44076 — the same
# API the kinesis_emu streaming connector uses). One input partition
# per shard FILE — the WebDataset parallelism contract — each task
# walking its tar and emitting one row per member; sample regrouping
# and feature extraction then compose as ordinary DataFrame ops.

try:  # the DS API import is gated so plain module import never fails
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        InputPartition,
    )
    from pyspark.sql.types import StructType

    class TarShardPartition(InputPartition):
        def __init__(self, path: str) -> None:
            self.path = path

    TARSHARD_SCHEMA = (
        "shard string, name string, key string, ext string, "
        "size int, data binary"
    )

    class TarShardReader(DataSourceReader):
        """Batch reader over a directory of ``*.tar`` shard files.
        Options: ``path`` (the directory). Each partition = one shard
        file; rows are members with the WebDataset sample key split
        out (basename before the first dot)."""

        def __init__(self, options: dict) -> None:
            self.dir = options["path"]

        def partitions(self) -> list:
            import os

            return [
                TarShardPartition(os.path.join(self.dir, f))
                for f in sorted(os.listdir(self.dir))
                if f.endswith(".tar")
            ]

        def read(self, partition):
            import os

            with open(partition.path, "rb") as fh:
                blob = fh.read()
            shard = os.path.basename(partition.path)
            for name, data in parse_tar(blob):
                key, _, ext = name.partition(".")
                yield (shard, name, key, ext, len(data), data)

    class TarShardDataSource(DataSource):
        """``spark.read.format("tarshard").option("path", dir).load()``
        after ``spark.dataSource.register(TarShardDataSource)``."""

        @classmethod
        def name(cls) -> str:
            return "tarshard"

        def schema(self) -> str:
            return TARSHARD_SCHEMA

        def reader(self, schema: StructType) -> TarShardReader:
            return TarShardReader(self.options)

except ImportError:  # pragma: no cover - pyspark<4 without the DS API
    TarShardDataSource = None  # type: ignore[assignment]
