"""Multimodal (binary) column handling (LLM-pipeline extension).

Design: image/audio/video payloads travel as opaque ``binary`` columns
with a typed metadata struct next to them. All *plumbing* — schema,
partitioning, Arrow batch shapes, mapInPandas signatures — is real and
tested; the actual media decode is stubbed (codec libraries are not in
this environment) behind ``decode_media``, which raises
``NotImplementedError`` unless a decoder callable is injected.

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


def decode_media(df: DataFrame, payload_col: str = "payload",
                 decoder: Callable[[bytes], dict] | None = None,
                 schema: StructType | None = None) -> DataFrame:
    """Decode binary payloads with an injected decoder (STUB).

    The real decode (PIL/ffmpeg/torchaudio) is not available in this
    environment; callers must inject ``decoder(payload_bytes) -> dict``
    matching ``schema``. Without one this raises — by design, per the
    multimodal scope: plumbing is real, codec work is stubbed.
    """
    if decoder is None or schema is None:
        raise NotImplementedError(
            "media decoding requires an injected decoder + schema "
            "(codec libraries are not available in this environment)")

    fields = [f.name for f in schema.fields]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [decoder(bytes(p)) for p in pdf[payload_col]]
            yield pd.DataFrame({f: [r.get(f) for r in rows]
                                for f in fields})

    return df.mapInPandas(gen, schema=schema)
