"""Multimodal decode: dependency-free BMP/WAV header codecs plus the
Arrow-batched decode_media plumbing (see operators/multimodal.py)."""

from __future__ import annotations

import pytest

from wp_etl_migration_spark.operators.multimodal import (
    attach_binary, decode_bmp, decode_media, decode_wav, default_decoder,
    encode_bmp, encode_wav, extract_features, synthesize_media)


def test_bmp_roundtrip():
    d = decode_bmp(encode_bmp(17, 9))
    assert (d["format"], d["width"], d["height"], d["bits_per_sample"]) \
        == ("bmp", 17, 9, 24)


def test_bmp_topdown_negative_height():
    raw = bytearray(encode_bmp(4, 3))
    import struct
    struct.pack_into("<i", raw, 22, -3)  # top-down encoding
    assert decode_bmp(bytes(raw))["height"] == 3


def test_wav_roundtrip():
    d = decode_wav(encode_wav(2, 16000, 320))
    assert (d["format"], d["channels"], d["sample_rate"],
            d["bits_per_sample"], d["n_samples"], d["duration_ms"]) \
        == ("wav", 2, 16000, 16, 320, 20)


def test_default_decoder_dispatch_and_quarantine():
    assert default_decoder(encode_bmp(2, 2))["format"] == "bmp"
    assert default_decoder(encode_wav(1, 8000, 10))["format"] == "wav"
    assert default_decoder(b"GIF89a....")["format"] == "unknown"
    assert default_decoder(b"BM\x00")["format"] == "unknown"  # truncated


def test_decode_bad_payloads_raise():
    with pytest.raises(ValueError):
        decode_bmp(b"nope")
    with pytest.raises(ValueError):
        decode_wav(b"RIFF\x00\x00\x00\x00JUNK")


def test_decode_media_default(spark):
    df = spark.createDataFrame([(0,), (1,), (7,)], ["doc_id"])
    out = {r.doc_id: r for r in
           decode_media(synthesize_media(df), id_col="doc_id").collect()}
    assert out[0].format == "bmp" and (out[0].width, out[0].height) == (1, 1)
    assert out[1].format == "wav" and out[1].sample_rate == 16000
    assert out[7].format == "wav" and out[7].channels == 2
    assert out[7].n_samples == 107
    assert out[7].width is None  # image fields null on audio rows


def test_extract_features_plumbing(spark):
    df = spark.createDataFrame([(1, "hello")], ["doc_id", "text"])
    feats = extract_features(
        attach_binary(df, "doc_id", "text"), "doc_id", "payload").collect()
    assert feats[0].n_bytes == 5 and len(feats[0].digest) == 32
