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


def _bmp_2x2() -> bytes:
    """2x2 24bpp BMP with distinct pixels. Bottom-up file order:
    row0 = visual bottom (BL=red, BR=green), row1 = top (TL=blue,
    TR=white). Rows pad to 8 bytes."""
    from wp_etl_migration_spark.operators.multimodal import encode_bmp
    header = encode_bmp(2, 2)[:54]
    row0 = bytes([0, 0, 255, 0, 255, 0, 0, 0])       # BGR red, green
    row1 = bytes([255, 0, 0, 255, 255, 255, 0, 0])   # blue, white
    return header + row0 + row1


def test_resize_bmp_nearest_neighbor():
    from wp_etl_migration_spark.operators.multimodal import (
        decode_bmp, resize_bmp)
    small = resize_bmp(_bmp_2x2(), 1, 1)
    meta = decode_bmp(small)
    assert (meta["width"], meta["height"]) == (1, 1)
    # nearest with floor mapping picks source (0,0) = file row0 col0 = red
    assert small[54:57] == bytes([0, 0, 255])
    big = resize_bmp(_bmp_2x2(), 4, 4)
    meta = decode_bmp(big)
    assert (meta["width"], meta["height"]) == (4, 4)
    # each source pixel becomes a 2x2 block; file row0 starts with 2 reds
    assert big[54:60] == bytes([0, 0, 255, 0, 0, 255])


def test_resize_media_passthrough_and_resize(spark):
    from wp_etl_migration_spark.operators.multimodal import (
        decode_media, resize_media)
    rows = [(1, _bmp_2x2()), (2, b"not an image"), (3, None)]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r.doc_id: r.payload
           for r in resize_media(df, 4, 4).collect()}
    dec = {r.doc_id: (r.width, r.height)
           for r in decode_media(
               spark.createDataFrame([(1, bytes(out[1]))],
                                     "doc_id long, payload binary"),
               id_col="doc_id").collect()}
    assert dec[1] == (4, 4)
    assert bytes(out[2]) == b"not an image"     # degrade, don't die
    assert out[3] is None


def test_frameseq_sample_frames(spark):
    from wp_etl_migration_spark.operators.multimodal import (
        decode_bmp, decode_frameseq, encode_bmp, encode_frameseq,
        sample_frames)
    frames = [encode_bmp(w, 2) for w in (1, 2, 3, 4, 5)]
    assert decode_frameseq(encode_frameseq(frames)) == frames
    df = spark.createDataFrame(
        [(7, encode_frameseq(frames)), (8, b"junk"), (9, None)],
        "doc_id long, payload binary")
    got = sorted((r.doc_id, r.frame_idx, decode_bmp(bytes(r.frame))["width"])
                 for r in sample_frames(df, every_k=2).collect())
    # every 2nd frame of doc 7 (idx 0,2,4 -> widths 1,3,5); junk/null drop
    assert got == [(7, 0, 1), (7, 2, 3), (7, 4, 5)]


def test_from_binary_files_feeds_decode(spark, tmp_path):
    """binaryFile ingestion -> decode_media: media files on disk load
    as binary rows whose content decodes through the existing
    multimodal operators; the glob filter keeps non-media siblings
    out."""
    from wp_etl_migration_spark.operators.multimodal import (
        decode_media, encode_bmp, encode_wav)
    from wp_etl_migration_spark.sources.files import from_binary_files
    d = tmp_path / "media"
    d.mkdir()
    (d / "a.bmp").write_bytes(encode_bmp(4, 3))
    (d / "b.wav").write_bytes(encode_wav(1, 8000, 800))
    (d / "junk.txt").write_text("not media")

    df = from_binary_files(spark, str(d), path_glob="*.{bmp,wav}")
    assert df.count() == 2
    rows = (decode_media(
        df.selectExpr("path as doc_id", "content as payload"),
        payload_col="payload", id_col="doc_id")
        .collect())
    meta = {r.doc_id.rsplit("/", 1)[-1]: r for r in rows}
    assert meta["a.bmp"].format == "bmp"
    assert meta["a.bmp"].width == 4 and meta["a.bmp"].height == 3
    assert meta["b.wav"].format == "wav"
