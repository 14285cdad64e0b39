"""Multimodal plumbing: binary payload columns + mapInPandas stages."""

from __future__ import annotations

import hashlib

import pytest

from clockpipe_spark.catalog import load_table
from clockpipe_spark.operators.multimodal import (
    blob_table,
    decode_image,
    extract_bytes_meta,
    fake_decode_features,
)


def test_blob_table_schema(spark, sf_dir):
    blobs = blob_table(load_table(spark, sf_dir, "documents"))
    kinds = dict(blobs.dtypes)
    assert kinds["payload"] == "binary"
    assert kinds["meta"].startswith("struct<mime:string,n_bytes:int")


def test_extract_bytes_meta_matches_python(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(20)
    expected = {
        r["doc_id"]: r["text"].encode() for r in docs.collect()
    }
    got = extract_bytes_meta(blob_table(docs)).collect()
    assert len(got) == len(expected)
    for r in got:
        raw = expected[r["doc_id"]]
        assert r["n_bytes"] == len(raw)
        assert r["first_byte"] == raw[0]
        assert r["sha256_prefix"] == hashlib.sha256(raw).hexdigest()[:16]


def test_fake_decode_deterministic(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(10)
    a = {r["doc_id"]: (r["width"], r["height"], r["mean_byte"])
         for r in fake_decode_features(blob_table(docs)).collect()}
    b = {r["doc_id"]: (r["width"], r["height"], r["mean_byte"])
         for r in fake_decode_features(blob_table(docs)).collect()}
    assert a == b
    assert all(1 <= wh[0] <= 640 and 1 <= wh[1] <= 480 for wh in a.values())


def test_real_decode_is_gated(spark, sf_dir):
    # the general (PIL) decode hook must fail loudly, not silently fake;
    # BMP/WAV have real stdlib decoders tested below
    blobs = blob_table(load_table(spark, sf_dir, "documents"))
    with pytest.raises(NotImplementedError):
        decode_image(blobs)


def test_bmp_roundtrip_with_row_padding(spark):
    # width 3 -> raw row 9 bytes -> stride 12: the decoder must skip the
    # 3 zero padding bytes per row or the mean collapses toward zero
    from clockpipe_spark.operators.multimodal import decode_bmp_features, encode_bmp

    payload = encode_bmp(3, 2, (10, 20, 33))
    df = spark.createDataFrame([(1, payload)], "doc_id long, payload binary")
    r = decode_bmp_features(df).collect()[0]
    assert (r["width"], r["height"], r["bpp"]) == (3, 2, 24)
    assert r["mean_px"] == int((10 + 20 + 33) / 3 * 10000)


def test_bmp_rejects_non_bmp(spark):
    from clockpipe_spark.operators.multimodal import decode_bmp_features

    df = spark.createDataFrame(
        [(1, b"PNG\x00" + b"\x00" * 60)], "doc_id long, payload binary"
    )
    with pytest.raises(Exception, match="not a BMP"):
        decode_bmp_features(df).collect()


def test_wav_roundtrip_and_chunk_walk(spark):
    import struct

    from clockpipe_spark.operators.multimodal import decode_wav_features, encode_wav

    wav = encode_wav(400, 77, sample_rate=8000)
    # splice an unknown chunk between fmt and data: the walker must skip
    # it by declared size (the actual RIFF contract)
    fmt_end = wav.index(b"data")
    junk = b"LIST" + struct.pack("<I", 6) + b"junk!!"
    spliced = wav[:fmt_end] + junk + wav[fmt_end:]
    spliced = spliced[:4] + struct.pack("<I", len(spliced) - 8) + spliced[8:]
    df = spark.createDataFrame([(1, spliced)], "doc_id long, payload binary")
    r = decode_wav_features(df).collect()[0]
    assert r["sample_rate"] == 8000
    assert r["n_samples"] == 400
    assert r["duration_ms"] == 50
    assert r["mean_amp"] == 77 * 10000


def test_resize_bmp_nearest_neighbor(spark):
    """2x2 gradient resized to 1x1 must sample exactly pixel (0,0):
    value (0*7+0*13)%256 = 0 -> mean 0; resized to 2x2 it's identity."""
    from clockpipe_spark.operators.multimodal import (
        encode_bmp_gradient,
        resize_bmp_features,
    )

    blob = spark.createDataFrame(
        [(1, bytearray(encode_bmp_gradient(2, 2)))], "doc_id long, payload binary"
    )
    one = resize_bmp_features(blob, out_w=1, out_h=1).first()
    assert (one["out_w"], one["out_h"], one["mean_px_x10000"]) == (1, 1, 0)
    # identity resize: mean over all 4 pixels (0, 7, 13, 20) = 10 exactly
    ident = resize_bmp_features(blob, out_w=2, out_h=2).first()
    assert ident["mean_px_x10000"] == (0 + 7 + 13 + 20) * 10000 // 4


def test_sample_frames_every_nth_and_tail_drop(spark):
    """70 bytes of i%256 at frame_bytes=32: frames 0,1 complete (tail of
    6 bytes dropped); every=2 samples frame 0 only. Frame 0 mean =
    sum(0..31)/32 = 15.5."""
    from clockpipe_spark.operators.multimodal import sample_frames

    payload = bytes(i % 256 for i in range(70))
    blob = spark.createDataFrame(
        [(1, bytearray(payload))], "doc_id long, payload binary"
    )
    rows = sample_frames(blob, frame_bytes=32, every=2).collect()
    assert [(r["frame_idx"], r["mean_byte_x10000"]) for r in rows] == [(0, 155000)]
    # every=1 also yields frame 1: mean = sum(32..63)/32 = 47.5
    rows = sorted(
        (r["frame_idx"], r["mean_byte_x10000"])
        for r in sample_frames(blob, frame_bytes=32, every=1).collect()
    )
    assert rows == [(0, 155000), (1, 475000)]
    # payload shorter than one frame -> no rows
    tiny = spark.createDataFrame([(2, bytearray(b"abc"))], "doc_id long, payload binary")
    assert sample_frames(tiny, frame_bytes=32).count() == 0


def test_resample_box_filter_on_nonconstant_signal(spark):
    """Hand-built ramp waveform: decimate-by-2 box filter must average
    consecutive pairs with integer floor-division and drop the odd tail."""
    import struct

    from clockpipe_spark.operators.multimodal import (
        encode_wav,
        resample_wav_features,
    )

    # ramp 0,10,20,...,90 then one odd trailing sample (dropped)
    samples = list(range(0, 100, 10)) + [999]
    data = struct.pack(f"<{len(samples)}h", *samples)
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    wav = b"RIFF" + struct.pack("<I", len(body)) + body

    blob = spark.createDataFrame(
        [(1, bytearray(wav))], "doc_id long, payload binary"
    )
    [r] = resample_wav_features(blob, factor=2).collect()
    assert (r["in_rate"], r["out_rate"]) == (8000, 4000)
    assert (r["in_samples"], r["out_samples"]) == (11, 5)
    # pairs: (0,10)->5 (20,30)->25 (40,50)->45 (60,70)->65 (80,90)->85
    # mean |.| = (5+25+45+65+85)/5 = 45 -> x1e4
    assert r["mean_amp"] == 450000

    # negative samples floor-divide like numpy // (round toward -inf)
    neg = struct.pack("<4h", -5, -6, 3, 4)
    body2 = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body2 += b"data" + struct.pack("<I", len(neg)) + neg
    wav2 = b"RIFF" + struct.pack("<I", len(body2)) + body2
    blob2 = spark.createDataFrame(
        [(2, bytearray(wav2))], "doc_id long, payload binary"
    )
    [r2] = resample_wav_features(blob2, factor=2).collect()
    # (-5-6)//2 = -6 (floor), (3+4)//2 = 3 -> mean |.| = (6+3)/2 = 4.5
    assert r2["out_samples"] == 2
    assert r2["mean_amp"] == 45000


def test_dhash_signature_pinned_and_banding(spark):
    """dHash of the phash fixture must equal the analytically-known
    pattern (md5(group) XOR the per-doc bit), proving BMP encode ->
    decode -> block-mean -> bit extraction round-trips exactly; and the
    generic banded join must refuse max_hamming > 3 (recall would
    silently break past the pigeonhole bound)."""
    import hashlib

    import pytest

    from clockpipe_spark.operators.multimodal import (
        dhash_signatures,
        encode_bmp_gray,
    )
    from clockpipe_spark.operators.neardup import banded_hamming_pairs
    from clockpipe_spark.queries.approximate import _PHASH_GROUPS, _phash_pixels

    ids = [0, 1, 17, 63, 64, 200]
    blobs = spark.createDataFrame(
        [(d, bytearray(encode_bmp_gray(_phash_pixels(d)))) for d in ids],
        "doc_id long, payload binary",
    )
    got = {r["doc_id"]: r["dhash"] for r in dhash_signatures(blobs).collect()}

    def expected(doc_id):
        g = doc_id % _PHASH_GROUPS
        pat = int.from_bytes(
            hashlib.md5(f"imggrp:{g}".encode()).digest()[:8], "little"
        )
        pat ^= 1 << ((doc_id * 7) % 64)
        return pat - (1 << 64) if pat >= 1 << 63 else pat  # int64 view

    assert got == {d: expected(d) for d in ids}

    sig = dhash_signatures(blobs)
    with pytest.raises(ValueError, match="max_hamming"):
        banded_hamming_pairs(sig, "doc_id", "dhash", max_hamming=4)


def test_phash_batch_synthesis_byte_identical_to_scalar():
    """The r9 vectorized fixture camera (_phash_payloads_batch) must
    produce BYTE-identical BMPs to the scalar per-doc path it replaced
    — covering group-pattern reuse, the per-doc XOR flip, the gradient
    cumsum, pixel upsample, BGR repeat, bottom-up flip, and header."""
    from clockpipe_spark.operators.multimodal import encode_bmp_gray
    from clockpipe_spark.queries.approximate import (
        _phash_payloads_batch,
        _phash_pixels,
    )

    ids = [0, 1, 15, 16, 17, 63, 64, 65, 128, 200, 1023, 4096, 99999]
    batch = _phash_payloads_batch(ids)
    for d, payload in zip(ids, batch):
        assert payload == encode_bmp_gray(_phash_pixels(d)), f"doc {d}"
