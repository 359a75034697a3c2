"""Multimodal (binary) column handling (LLM-pipeline extension).

Design: image/audio/video payloads travel as opaque ``binary`` columns
with a typed metadata struct next to them. All *plumbing* — schema,
partitioning, Arrow batch shapes, mapInPandas signatures — is real and
tested. ``decode_media`` ships with a dependency-free default decoder
that struct-parses BMP (width/height/bpp) and WAV (channels/rate/
samples/duration) headers; richer codecs (PIL/ffmpeg/torchaudio, not in
this environment) slot in through the same ``decoder(bytes) -> dict``
injection point without touching the Spark plumbing.

Scale notes:
- payloads stay columnar (parquet binary) end-to-end; nothing is ever
  collected to the driver;
- feature extraction is ``mapInPandas`` with Arrow transfer — one pass,
  no shuffle, batch-vectorized hashing;
- binary columns dominate row size: keep
  ``spark.sql.files.maxPartitionBytes`` sized so a partition of payloads
  fits executor memory, and repartition by a content hash before any
  grouped processing so a few giant assets can't skew a partition.

No counterpart in the reference (closest is media sideloading,
lib/Flow/ETL/Adapter/WordPress/Loaders/WPMediaLoader.php:433-503, which
moves bytes via HTTP but never processes them).
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (BinaryType, LongType, StringType, StructField,
                               StructType)

#: Schema of the feature rows produced by ``extract_features``.
FEATURE_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("n_bytes", LongType()),
    StructField("digest", StringType()),
    StructField("fake_width", LongType()),
    StructField("fake_height", LongType()),
])


def attach_binary(df: DataFrame, id_col: str, text_col: str,
                  mime: str = "application/octet-stream") -> DataFrame:
    """Demo payload builder: UTF-8 bytes of ``text_col`` as the binary
    payload plus a typed metadata struct — the canonical multimodal row
    shape (payload: binary, meta: struct<mime,n_bytes>)."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        F.col(id_col),
        payload.alias("payload"),
        F.struct(F.lit(mime).alias("mime"),
                 F.length(payload).cast("long").alias("n_bytes"))
        .alias("meta"))


def extract_features(df: DataFrame, id_col: str = "doc_id",
                     payload_col: str = "payload") -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    mapInPandas (iterator of pandas batches — the shape a real decoder
    needs: it can stream frames / tiles without materializing the whole
    partition). Features here are the deterministic stand-ins for a
    decode: byte length, md5 digest, and fake dimensions derived from the
    digest (first two hex bytes), so the full pipeline is oracle-checkable.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            digests = [hashlib.md5(bytes(p)).hexdigest()
                       for p in pdf[payload_col]]
            yield pd.DataFrame({
                "doc_id": pdf[id_col].astype("int64"),
                "n_bytes": pdf[payload_col].map(len).astype("int64"),
                "digest": digests,
                "fake_width": [int(d[0:2], 16) for d in digests],
                "fake_height": [int(d[2:4], 16) for d in digests],
            })

    return df.mapInPandas(gen, schema=FEATURE_SCHEMA)


#: Unified decode output: image fields null for audio rows and vice
#: versa (the reader prunes what it doesn't select).
DECODED_SCHEMA = StructType([
    StructField("format", StringType()),
    StructField("width", LongType()),
    StructField("height", LongType()),
    StructField("channels", LongType()),
    StructField("sample_rate", LongType()),
    StructField("bits_per_sample", LongType()),
    StructField("n_samples", LongType()),
    StructField("duration_ms", LongType()),
])


def encode_bmp(width: int, height: int, bpp: int = 24) -> bytes:
    """Minimal BITMAPINFOHEADER BMP with zeroed pixel rows (4-byte
    row padding per the format)."""
    row = (width * (bpp // 8) + 3) // 4 * 4
    img = row * height
    header = struct.pack("<2sIHHI", b"BM", 54 + img, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, width, height, 1, bpp,
                       0, img, 2835, 2835, 0, 0)
    return header + info + b"\x00" * img


def decode_bmp(data: bytes) -> dict:
    """Parse a BMP header to typed metadata (format/width/height/bpp)
    — the deterministic stand-in decode for the image-bytes column
    family (container ships no image libs; the Spark-side plumbing is
    real)."""
    if len(data) < 54 or data[:2] != b"BM":
        raise ValueError("not a BMP payload")
    width, height = struct.unpack_from("<ii", data, 18)
    bpp, = struct.unpack_from("<H", data, 28)
    # negative height = top-down row order; dimensions are magnitude
    return {"format": "bmp", "width": width, "height": abs(height),
            "bits_per_sample": bpp}


def encode_wav(channels: int, sample_rate: int, n_samples: int,
               bits: int = 16) -> bytes:
    """Minimal PCM RIFF/WAVE with a zeroed data chunk."""
    block = channels * bits // 8
    data = b"\x00" * (n_samples * block)
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate,
                      sample_rate * block, block, bits)
    return (b"RIFF" + struct.pack("<I", 4 + 24 + 8 + len(data)) + b"WAVE"
            + b"fmt " + struct.pack("<I", 16) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)


def decode_wav(data: bytes) -> dict:
    """Parse RIFF/WAVE chunks to typed audio metadata (channels, rate,
    duration) — the audio twin of :func:`decode_bmp`."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos, fmt, data_size = 12, None, None
    while pos + 8 <= len(data):
        cid, size = struct.unpack_from("<4sI", data, pos)
        pos += 8
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", data, pos)
        elif cid == b"data":
            data_size = size
        pos += size + (size & 1)  # chunks are word-aligned
    if fmt is None or data_size is None:
        raise ValueError("WAV missing fmt/data chunk")
    channels, rate, bits = fmt[1], fmt[2], fmt[5]
    block = max(1, channels * bits // 8)
    n = data_size // block
    return {"format": "wav", "channels": channels, "sample_rate": rate,
            "bits_per_sample": bits, "n_samples": n,
            "duration_ms": n * 1000 // rate if rate else None}


def default_decoder(data: bytes) -> dict:
    """Magic-byte dispatch over the built-in header parsers; unknown or
    corrupt payloads degrade to ``format='unknown'`` (quarantine row)
    instead of failing the task."""
    try:
        if data[:2] == b"BM":
            return decode_bmp(data)
        if data[:4] == b"RIFF":
            return decode_wav(data)
    except (ValueError, struct.error):
        pass
    return {"format": "unknown"}


def decode_media(df: DataFrame, payload_col: str = "payload",
                 decoder: Callable[[bytes], dict] | None = None,
                 schema: StructType | None = None,
                 id_col: str | None = None) -> DataFrame:
    """Decode binary payloads executor-side (Arrow-batched).

    Defaults to the dependency-free header decoder (BMP/WAV →
    DECODED_SCHEMA). Inject ``decoder(payload_bytes) -> dict`` +
    ``schema`` for richer codecs; ``id_col`` is carried through so the
    result joins back without re-reading payload bytes.
    """
    decoder = decoder or default_decoder
    schema = schema or DECODED_SCHEMA
    fields = [f.name for f in schema.fields]
    out_schema = schema
    if id_col is not None:
        out_schema = StructType(
            [df.schema[id_col]] + list(schema.fields))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # NULL payloads never reach the decoder: they yield all-NULL
            # feature rows (quarantine), the same degrade-don't-die
            # contract as default_decoder's 'unknown'.
            rows = [decoder(bytes(p)) if p is not None else {}
                    for p in pdf[payload_col]]
            out = {f: [r.get(f) for r in rows] for f in fields}
            if id_col is not None:
                out = {id_col: pdf[id_col], **out}
            yield pd.DataFrame(out)

    return df.mapInPandas(gen, schema=out_schema)


def resize_bmp(data: bytes, new_w: int, new_h: int) -> bytes:
    """Nearest-neighbor resample of a 24bpp bottom-up BMP — a REAL
    pixel-data transform (numpy gather over padded rows), dependency-
    free. Richer codecs swap in via ``resize_media``'s injection point.
    """
    import numpy as np

    meta = decode_bmp(data)
    if meta["bits_per_sample"] != 24:
        raise ValueError("resize_bmp handles 24bpp payloads")
    w, h = meta["width"], meta["height"]
    off, = struct.unpack_from("<I", data, 10)
    row = (w * 3 + 3) // 4 * 4
    px = np.frombuffer(data, dtype=np.uint8,
                       count=row * h, offset=off).reshape(h, row)
    xs = (np.arange(new_w) * w) // new_w
    ys = (np.arange(new_h) * h) // new_h
    # Per new column: the 3 bytes at source offset xs[x]*3 (+0,+1,+2).
    out = px[ys][:, np.repeat(xs * 3, 3) + np.tile([0, 1, 2], new_w)]
    pad = (-(new_w * 3)) % 4
    if pad:
        out = np.concatenate(
            [out, np.zeros((new_h, pad), dtype=np.uint8)], axis=1)
    return encode_bmp(new_w, new_h)[:54] + out.tobytes()


def resize_media(df: DataFrame, width: int, height: int,
                 payload_col: str = "payload",
                 id_col: str = "doc_id",
                 resizer: Callable[[bytes, int, int], bytes] | None = None
                 ) -> DataFrame:
    """Executor-side payload resize (Arrow-batched): (id, payload) with
    every decodable image payload resampled to width×height; payloads
    the resizer rejects pass through unchanged (degrade-don't-die, same
    contract as ``default_decoder``)."""
    resizer = resizer or resize_bmp
    schema = StructType([df.schema[id_col],
                         StructField("payload", BinaryType())])

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for p in pdf[payload_col]:
                if p is None:
                    out.append(None)
                    continue
                try:
                    out.append(resizer(bytes(p), width, height))
                except (ValueError, struct.error):
                    out.append(bytes(p))
            yield pd.DataFrame({id_col: pdf[id_col], "payload": out})

    return df.select(id_col, payload_col).mapInPandas(gen, schema=schema)


#: Frame-sequence container magic (the engine's deterministic stand-in
#: for a video file): b"FS" + u32 frame count, then per frame
#: u32 byte length + payload.
_FRAMESEQ_MAGIC = b"FS"


def encode_frameseq(frames: list[bytes]) -> bytes:
    """Pack frames into the length-prefixed FRSEQ container."""
    out = [_FRAMESEQ_MAGIC, struct.pack("<I", len(frames))]
    for f in frames:
        out.append(struct.pack("<I", len(f)))
        out.append(f)
    return b"".join(out)


def decode_frameseq(data: bytes) -> list[bytes]:
    """Unpack a FRSEQ container into its frame payloads."""
    if data[:2] != _FRAMESEQ_MAGIC:
        raise ValueError("not a FRSEQ payload")
    n, = struct.unpack_from("<I", data, 2)
    frames, pos = [], 6
    for _ in range(n):
        ln, = struct.unpack_from("<I", data, pos)
        pos += 4
        frames.append(data[pos:pos + ln])
        pos += ln
    return frames


def sample_frames(df: DataFrame, every_k: int = 2,
                  payload_col: str = "payload",
                  id_col: str = "doc_id") -> DataFrame:
    """Frame sampling over video-like payloads: explode every ``k``-th
    frame of each FRSEQ container to (id, frame_idx, frame) rows —
    the fan-out shape a real video pipeline needs (one input row →
    many frame rows, still one Arrow pass, no shuffle). Undecodable
    payloads contribute no rows (quarantine by omission)."""
    if every_k < 1:
        raise ValueError("every_k must be >= 1")
    schema = StructType([df.schema[id_col],
                         StructField("frame_idx", LongType()),
                         StructField("frame", BinaryType())])

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for i, p in zip(pdf[id_col], pdf[payload_col]):
                if p is None:
                    continue
                try:
                    fs = decode_frameseq(bytes(p))
                except (ValueError, struct.error):
                    continue
                for j in range(0, len(fs), every_k):
                    ids.append(i)
                    idxs.append(j)
                    frames.append(fs[j])
            yield pd.DataFrame(
                {id_col: pd.Series(ids, dtype=pdf[id_col].dtype),
                 "frame_idx": pd.Series(idxs, dtype="int64"),
                 "frame": frames})

    return df.select(id_col, payload_col).mapInPandas(gen, schema=schema)


def synthesize_media(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic per-row media payloads for round-trip checks: even
    ids get a BMP (width = id%64+1, height = (id//2)%64+1), odd ids a
    16-bit PCM WAV (channels = 1+(id//2)%2, rate = 8000*(1+id%4),
    samples = 100+id%50). The decode of these payloads is analytically
    known, which is what makes ``decode_media`` oracle-checkable."""
    schema = StructType([df.schema[id_col],
                         StructField("payload", BinaryType())])

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for i in pdf[id_col]:
                i = int(i)
                if i % 2 == 0:
                    payloads.append(encode_bmp(i % 64 + 1,
                                               (i // 2) % 64 + 1))
                else:
                    payloads.append(encode_wav(1 + (i // 2) % 2,
                                               8000 * (1 + i % 4),
                                               100 + i % 50))
            yield pd.DataFrame({id_col: pdf[id_col], "payload": payloads})

    return df.select(id_col).mapInPandas(gen, schema=schema)
