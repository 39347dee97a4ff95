"""Multimodal (image/audio/video) column handling.

Media travel as opaque ``binary`` payload columns plus a typed metadata
struct — the pattern that scales: bytes stay columnar in parquet,
metadata predicates (media_type, width, duration) push down without
touching payloads, and decode happens late, batched, in Arrow, via
``mapInPandas``.

This generalizes the reference's binary handling: Kinesis payloads are
gzip blobs decompressed per record (reference app.py:33-38); here the
binary column + batched-UDF shape is first-class.

Real codecs (PIL/librosa/ffmpeg) are NOT in this container, so the
actual decode body is stubbed: payloads use a deterministic fake
container format (ASCII header + payload bytes) whose "decode" is real
parsing of our own header. The Spark-side plumbing — schemas, Arrow
batching, partition behavior, per-record error isolation — is real and
tested; swap ``_decode_fake`` for a PIL/librosa call in production.
"""

from __future__ import annotations

import hashlib
import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MAGIC = b"AKTS"  # fake media container magic
_HEADER_RE = re.compile(rb"^AKTS;t=(\w+);w=(\d+);h=(\d+);n=(\d+);")

DECODED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_payload_bytes", IntegerType()),
        StructField("payload_sha", StringType()),
    ]
)


def attach_fake_media(df: DataFrame, id_col: str, seed_text_col: str) -> DataFrame:
    """Build a deterministic binary media column from existing columns
    (test stand-in for reading real media files / S3 pointers).

    Container: ``AKTS;t=<type>;w=<w>;h=<h>;n=<bytes>;<payload>``.
    """
    payload = F.encode(F.col(seed_text_col), "utf-8")
    w = (F.col(id_col) % 64 + 16).cast("int")
    h = (F.col(id_col) % 48 + 16).cast("int")
    header = F.encode(
        F.concat_ws(
            ";",
            F.lit("AKTS"),
            F.concat(F.lit("t="), F.lit("image")),
            F.concat(F.lit("w="), w.cast("string")),
            F.concat(F.lit("h="), h.cast("string")),
            F.concat(F.lit("n="), F.length(payload).cast("string")),
            F.lit(""),
        ),
        "utf-8",
    )
    return df.withColumn("media", F.concat(header, payload)).withColumn(
        "media_meta",
        F.struct(
            F.lit("image").alias("media_type"),
            w.alias("width"),
            h.alias("height"),
        ),
    )


def _decode_fake(media: bytes) -> tuple[str, int, int, bytes]:
    m = _HEADER_RE.match(media or b"")
    if not m:
        raise ValueError("not an AKTS container")
    media_type = m.group(1).decode()
    width, height, n = int(m.group(2)), int(m.group(3)), int(m.group(4))
    payload = media[m.end() : m.end() + n]
    return media_type, width, height, payload


def decode_media(df: DataFrame, id_col: str = "doc_id", media_col: str = "media") -> DataFrame:
    """Decode media payloads with Arrow-batched ``mapInPandas``.

    Input partitions stream through as pandas batches; in production the
    batch body is a PIL/librosa decode + resize / frame-sample / feature
    extraction. Per-record failures are isolated (reference app.py:71-75
    pattern): a bad payload yields a null row, never a failed job.
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, blob in zip(pdf[id_col], pdf[media_col]):
                mid_out = None if pd.isna(mid) else int(mid)
                try:
                    mt, w, h, payload = _decode_fake(bytes(blob))
                    out.append(
                        (mid_out, mt, w, h, len(payload), hashlib.sha256(payload).hexdigest())
                    )
                except Exception:
                    out.append((mid_out, None, None, None, None, None))
            yield pd.DataFrame(out, columns=[f.name for f in DECODED_SCHEMA.fields])

    return df.select(id_col, media_col).mapInPandas(decode, DECODED_SCHEMA)


def resize_media(
    df: DataFrame,
    id_col: str = "doc_id",
    media_col: str = "media",
    max_dim: int = 32,
) -> DataFrame:
    """Resize stage: decode -> downscale -> re-encode, batched in Arrow.

    The fake 'resample' keeps every k-th payload byte (k = ceil of the
    scale factor), mirroring what a PIL ``thumbnail()`` + re-encode
    does to the byte stream; dimensions scale preserving aspect ratio.
    Swap the body for PIL in production — the Spark plumbing (schema,
    batching, binary-in/binary-out, error isolation) is what this
    exercises. Failed payloads yield null resized/media (isolation).
    """

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, blob in zip(pdf[id_col], pdf[media_col]):
                mid_out = None if pd.isna(mid) else int(mid)
                try:
                    mt, w, h, payload = _decode_fake(bytes(blob))
                    scale = max(1, -(-max(w, h) // max_dim))  # ceil div
                    nw, nh = max(1, w // scale), max(1, h // scale)
                    npayload = payload[::scale]
                    header = (
                        f"AKTS;t={mt};w={nw};h={nh};n={len(npayload)};".encode()
                    )
                    out.append(
                        (mid_out, w, h, (nw, nh, len(npayload)), header + npayload)
                    )
                except Exception:
                    out.append((mid_out, None, None, None, None))
            yield pd.DataFrame(
                out, columns=["media_id", "width", "height", "resized", "media"]
            )

    schema = (
        "media_id long, width int, height int, "
        "resized struct<width:int,height:int,n_bytes:int>, media binary"
    )
    return df.select(id_col, media_col).mapInPandas(resize, schema)


def frame_sample_media(
    df: DataFrame,
    id_col: str = "doc_id",
    media_col: str = "media",
    every_n: int = 10,
) -> DataFrame:
    """Frame-sampling stage (video analog): one output row per sampled
    'frame' — a row-expanding mapInPandas (1 -> N), the shape a real
    ffmpeg keyframe sampler produces. Fake frames are fixed-width
    slices of the payload; frame_sha stands in for the decoded frame
    tensor/feature."""
    import hashlib

    FRAME_BYTES = 16

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, blob in zip(pdf[id_col], pdf[media_col]):
                mid_out = None if pd.isna(mid) else int(mid)
                try:
                    _mt, _w, _h, payload = _decode_fake(bytes(blob))
                    frames = [
                        payload[i : i + FRAME_BYTES]
                        for i in range(0, len(payload), FRAME_BYTES)
                    ]
                    for fi in range(0, len(frames), every_n):
                        out.append(
                            (
                                mid_out,
                                fi,
                                len(frames),
                                hashlib.sha256(frames[fi]).hexdigest(),
                            )
                        )
                except Exception:
                    out.append((mid_out, None, None, None))
            yield pd.DataFrame(
                out, columns=["media_id", "frame_index", "n_frames", "frame_sha"]
            )

    return df.select(id_col, media_col).mapInPandas(
        sample, "media_id long, frame_index int, n_frames int, frame_sha string"
    )


# --- real-format decode: binary PPM (Netpbm P6) ------------------------------
# PIL/ffmpeg are not in this container, but P6 is a real, widely-produced
# image format whose decode is pure header-parse + numpy frombuffer — so
# the Arrow-batched decode path gets exercised end-to-end on REAL image
# bytes, not just the AKTS fake container.

_PPM_RE = re.compile(rb"^P6\s+(\d+)\s+(\d+)\s+(\d+)\s")  # final \s: exactly
# ONE whitespace byte after maxval per the Netpbm spec — \s+ there could
# swallow pixel bytes that happen to be 0x0A/0x20.

PPM_DECODED_SCHEMA = (
    "media_id long, width int, height int, "
    "mean_r double, mean_g double, mean_b double"
)


def attach_ppm_media(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Generate a REAL binary P6 (Netpbm) image per row, deterministic
    from the id: width = id%16+4, height = id%12+4, pixel (x, y) =
    (id%64 + x + y, id%32 + 2x, id%16 + 3y) — all channel values < 256
    by construction. The analytic channel means (base + (w-1)/2 + (h-1)/2
    etc.) are exactly representable doubles, which is what lets
    ``q_multimodal_ppm``'s DuckDB oracle check the decoder bit-for-bit."""
    import numpy as np

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].astype("int64").to_numpy()
            blobs = []
            for i in ids:
                i = int(i)
                w, h = i % 16 + 4, i % 12 + 4
                xs = np.arange(w, dtype=np.int64)[None, :]
                ys = np.arange(h, dtype=np.int64)[:, None]
                px = np.stack(
                    [i % 64 + xs + ys, i % 32 + 2 * xs + 0 * ys, i % 16 + 0 * xs + 3 * ys],
                    axis=2,
                ).astype(np.uint8)
                blobs.append(b"P6\n%d %d\n255\n" % (w, h) + px.tobytes())
            yield pd.DataFrame({"media_id": ids, "media": blobs})

    return df.select(id_col).mapInPandas(gen, "media_id long, media binary")


def decode_ppm(
    df: DataFrame, id_col: str = "media_id", media_col: str = "media"
) -> DataFrame:
    """Real image decode, Arrow-batched: parse the P6 header, reshape
    the pixel buffer with numpy, emit per-channel means. Channel sums
    are exact integers (< 2^53) so the means are deterministic doubles
    regardless of summation order. Per-record error isolation as in
    ``decode_media``: a corrupt payload yields a null row, never a
    failed job."""
    import numpy as np

    def dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, blob in zip(pdf[id_col], pdf[media_col]):
                mid_out = None if pd.isna(mid) else int(mid)
                try:
                    b = bytes(blob)
                    m = _PPM_RE.match(b)
                    if not m or int(m.group(3)) != 255:
                        raise ValueError("not an 8-bit P6")
                    w, h = int(m.group(1)), int(m.group(2))
                    px = (
                        np.frombuffer(b, dtype=np.uint8, count=w * h * 3, offset=m.end())
                        .reshape(h, w, 3)
                        .astype(np.float64)
                    )
                    out.append(
                        (mid_out, w, h,
                         px[:, :, 0].mean(), px[:, :, 1].mean(), px[:, :, 2].mean())
                    )
                except Exception:
                    out.append((mid_out, None, None, None, None, None))
            yield pd.DataFrame(
                out,
                columns=["media_id", "width", "height", "mean_r", "mean_g", "mean_b"],
            )

    return df.select(id_col, media_col).mapInPandas(dec, PPM_DECODED_SCHEMA)


# --- real-format decode #2: PNG (RFC 2083 / ISO 15948), pure stdlib ----------
# zlib IS in the stdlib, and PNG's pixel model for 8-bit truecolor is
# chunk framing + one inflate + five per-scanline filters — all
# implementable exactly from the public spec. This gives the batched
# media path a second REAL format (after Netpbm P6) with compression
# and inter-scanline prediction, which P6 lacks.

import struct
import zlib

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def _paeth_vec(a, b, c):
    """Vectorized Paeth predictor (PNG spec §6.6): nearest of
    left/above/upper-left to a+b-c, ties left > above > upper-left."""
    import numpy as np

    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    return np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))


def encode_png_rgb8(px) -> bytes:
    """Minimal 8-bit truecolor PNG encoder (fixture generator for the
    decode path). Each scanline is filtered with type y % 5, so decoding
    our own output exercises ALL five unfilter branches — None, Sub, Up,
    Average, Paeth — on every image taller than 4 rows; the IDAT stream
    is split across two chunks to exercise multi-chunk reassembly."""
    import numpy as np

    h, w, _ = px.shape
    raw = bytearray()
    prior = np.zeros(w * 3, np.int32)
    zeros3 = np.zeros(3, np.int32)
    for y in range(h):
        row = px[y].reshape(-1).astype(np.int32)
        left = np.concatenate([zeros3, row[:-3]])
        ft = y % 5
        if ft == 0:
            filt = row
        elif ft == 1:  # Sub
            filt = (row - left) % 256
        elif ft == 2:  # Up
            filt = (row - prior) % 256
        elif ft == 3:  # Average
            filt = (row - (left + prior) // 2) % 256
        else:  # Paeth
            ul = np.concatenate([zeros3, prior[:-3]])
            filt = (row - _paeth_vec(left, prior, ul)) % 256
        raw.append(ft)
        raw.extend(filt.astype(np.uint8).tobytes())
        prior = row
    comp = zlib.compress(bytes(raw), 6)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    mid = len(comp) // 2
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", comp[:mid])
        + _png_chunk(b"IDAT", comp[mid:])
        + _png_chunk(b"IEND", b"")
    )


def decode_png_rgb8_bytes(b: bytes):
    """Decode an 8-bit truecolor non-interlaced PNG to an (h, w, 3)
    uint8 array: chunk walk with CRC verification, IDAT concatenation,
    one zlib inflate, then per-scanline unfiltering. Sub is three
    interleaved prefix sums (vectorized cumsum); Up is one vector add;
    Average/Paeth carry an intra-row sequential dependency by
    definition, so they run as per-byte loops over the (short)
    scanline — at Spark level the parallelism is across IMAGES in the
    Arrow batch, not within one scanline."""
    import numpy as np

    if b[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos, idat = 8, bytearray()
    w = h = None
    while pos + 12 <= len(b):
        (length,) = struct.unpack(">I", b[pos : pos + 4])
        ctype = b[pos + 4 : pos + 8]
        data = b[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack(">I", b[pos + 8 + length : pos + 12 + length])
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad CRC in {ctype!r}")
        if ctype == b"IHDR":
            w, h, depth, ctcode, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if depth != 8 or ctcode != 2 or interlace != 0:
                raise ValueError("only 8-bit RGB non-interlaced supported")
        elif ctype == b"IDAT":
            idat.extend(data)
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if w is None:
        raise ValueError("missing IHDR")
    raw = zlib.decompress(bytes(idat))
    stride = w * 3
    if len(raw) != h * (stride + 1):
        raise ValueError("IDAT length mismatch")
    out = np.empty((h, stride), np.int32)
    prior = np.zeros(stride, np.int32)
    for y in range(h):
        ft = raw[y * (stride + 1)]
        row = np.frombuffer(
            raw, np.uint8, stride, y * (stride + 1) + 1
        ).astype(np.int32)
        if ft == 0:
            rec = row
        elif ft == 1:  # Sub: per-channel prefix sum mod 256
            rec = (np.cumsum(row.reshape(-1, 3), axis=0).reshape(-1)) % 256
        elif ft == 2:  # Up
            rec = (row + prior) % 256
        elif ft == 3:  # Average
            rec = np.empty(stride, np.int32)
            for x in range(stride):
                left = rec[x - 3] if x >= 3 else 0
                rec[x] = (row[x] + (left + int(prior[x])) // 2) % 256
        elif ft == 4:  # Paeth
            rec = np.empty(stride, np.int32)
            for x in range(stride):
                a = int(rec[x - 3]) if x >= 3 else 0
                c = int(prior[x - 3]) if x >= 3 else 0
                up = int(prior[x])
                p = a + up - c
                pa, pb, pc = abs(p - a), abs(p - up), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (up if pb <= pc else c)
                rec[x] = (row[x] + pred) % 256
        else:
            raise ValueError(f"unknown filter type {ft}")
        out[y] = rec
        prior = rec
    return out.reshape(h, w, 3).astype(np.uint8)


def _png_pixels(i: int):
    """Deterministic test image for doc i: w = i%12+4, h = i%10+4,
    pixel (x, y) = (i%64 + x + y, i%32 + 2x, i%16 + 3y); all values
    < 256 by construction and the analytic channel means (base +
    (w-1)/2 + (h-1)/2 etc.) are exact dyadic rationals, so the DuckDB
    oracle can check the full encode->decode->aggregate path
    bit-for-bit."""
    import numpy as np

    w, h = i % 12 + 4, i % 10 + 4
    xs = np.arange(w, dtype=np.int64)[None, :]
    ys = np.arange(h, dtype=np.int64)[:, None]
    return np.stack(
        [i % 64 + xs + ys, i % 32 + 2 * xs + 0 * ys, i % 16 + 0 * xs + 3 * ys],
        axis=2,
    ).astype(np.uint8)


def attach_png_media(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Generate a REAL compressed PNG per row (deterministic pixels from
    the id, all five scanline filters exercised — see
    ``encode_png_rgb8``)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].astype("int64").to_numpy()
            blobs = [encode_png_rgb8(_png_pixels(int(i))) for i in ids]
            yield pd.DataFrame({"media_id": ids, "media": blobs})

    return df.select(id_col).mapInPandas(gen, "media_id long, media binary")


def decode_png(
    df: DataFrame, id_col: str = "media_id", media_col: str = "media"
) -> DataFrame:
    """Real compressed-image decode, Arrow-batched: CRC-checked chunk
    walk -> inflate -> unfilter -> per-channel means, through the
    identical mapInPandas plumbing as ``decode_ppm``/``decode_media``.
    Per-record error isolation: a corrupt payload (bad CRC, truncated
    IDAT, wrong color type) yields a null row, never a failed job."""

    def dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, blob in zip(pdf[id_col], pdf[media_col]):
                # id computed defensively BEFORE the try: a null/NaN id
                # inside the except handler would otherwise raise and
                # fail the whole job, breaking the isolation contract
                mid_out = None if pd.isna(mid) else int(mid)
                try:
                    px = decode_png_rgb8_bytes(bytes(blob)).astype("float64")
                    h, w, _ = px.shape
                    out.append(
                        (mid_out, w, h,
                         px[:, :, 0].mean(), px[:, :, 1].mean(), px[:, :, 2].mean())
                    )
                except Exception:
                    out.append((mid_out, None, None, None, None, None))
            yield pd.DataFrame(
                out,
                columns=["media_id", "width", "height", "mean_r", "mean_g", "mean_b"],
            )

    return df.select(id_col, media_col).mapInPandas(dec, PPM_DECODED_SCHEMA)


def decode_image_real(*_args, **_kwargs):
    """Production JPEG decode (PIL/opencv) — unavailable in this
    container. ``decode_ppm`` (Netpbm P6) and ``decode_png`` (stdlib
    zlib PNG) above ARE real-format decodes over the same batched
    plumbing; swap the body for PIL to handle JPEG in production."""
    raise NotImplementedError(
        "JPEG decoding requires PIL/opencv, not installed here; "
        "decode_ppm()/decode_png() decode real formats through the "
        "identical Spark plumbing"
    )
