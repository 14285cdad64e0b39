"""Multimodal column plumbing: opaque ``binary`` payloads + typed
metadata, processed with Arrow-batched mapInPandas.

Design (SURVEY.md §2.10): image/audio/video travel as binary columns with
a metadata struct; decode / feature-extraction / resize / frame-sample
are pandas-UDF stages. The decode libraries (PIL/librosa/av) are NOT in
this container, so the codec step is stubbed two ways:

- ``decode_image``/``decode_audio`` raise NotImplementedError unless the
  library import succeeds (import-try gated) — the real hook point.
- ``fake_decode_features`` is a deterministic stand-in (documented, used
  in tests/queries) that derives pseudo width/height/channel stats purely
  from the bytes, so the Spark-side plumbing — schema, batching,
  partitioning, UDF signature — is fully real and testable.

The testdata has no binary table, so ``blob_table`` materializes one from
``documents`` (utf-8 payload = the text) — byte-level plumbing identical
to a real image column.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

try:  # pragma: no cover - not present in this container
    from PIL import Image  # noqa: F401

    _HAS_PIL = True
except ImportError:
    _HAS_PIL = False


def blob_table(docs: DataFrame) -> DataFrame:
    """documents -> (doc_id, payload binary, meta struct). The metadata
    struct mirrors what an ingest pipeline records at fetch time."""
    return docs.select(
        "doc_id",
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.octet_length(F.encode("text", "utf-8")).alias("n_bytes"),
            F.col("source").alias("origin"),
        ).alias("meta"),
    )


def extract_bytes_meta(blobs: DataFrame) -> DataFrame:
    """mapInPandas stage: per-blob byte-level features (length, first
    byte, sha256 prefix). Pure-Python byte inspection per Arrow batch —
    the exact shape a real decoder plugs into."""
    schema = "doc_id long, n_bytes long, first_byte int, sha256_prefix string"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "n_bytes": payloads.map(len).astype("int64"),
                    "first_byte": payloads.map(
                        lambda b: b[0] if len(b) else -1
                    ).astype("int32"),
                    "sha256_prefix": payloads.map(
                        lambda b: hashlib.sha256(b).hexdigest()[:16]
                    ),
                }
            )

    return blobs.select("doc_id", "payload").mapInPandas(run, schema)


def decode_image(blobs: DataFrame) -> DataFrame:
    """General image decode — requires PIL for JPEG/PNG/etc., which this
    container lacks; uncompressed BMP has a REAL stdlib decoder below
    (decode_bmp_features)."""
    if not _HAS_PIL:
        raise NotImplementedError(
            "general image decode requires PIL; BMP decodes for real via "
            "decode_bmp_features, and fake_decode_features remains the "
            "deterministic any-bytes path"
        )
    raise NotImplementedError("wire PIL decode here when the lib is present")


# ---------------------------------------------------------------------------
# REAL codecs, stdlib-only: uncompressed 24-bpp BMP and PCM WAV. These
# replace the fake decode as the flagship multimodal path — the byte
# layout parsed here (struct headers, row padding, chunk walking) is the
# actual on-disk format, not a stand-in.


def encode_bmp(width: int, height: int, rgb: tuple[int, int, int]) -> bytes:
    """Minimal BITMAPFILEHEADER + BITMAPINFOHEADER + 24-bpp pixel array
    (bottom-up, rows padded to 4 bytes) with every pixel = ``rgb``.
    Fixture-side encoder for the decode tests/queries."""
    import struct

    row_raw = width * 3
    pad = (4 - row_raw % 4) % 4
    pixel_bytes = (bytes(rgb[::-1]) * width + b"\x00" * pad) * height  # BGR order
    dib = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0,
                      len(pixel_bytes), 2835, 2835, 0, 0)
    offset = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", offset + len(pixel_bytes), 0, 0, offset)
    return header + dib + pixel_bytes


def decode_bmp_features(blobs: DataFrame) -> DataFrame:
    """REAL image decode (no PIL): parse the BMP headers with stdlib
    struct, then aggregate the pixel array — excluding the per-row
    padding bytes, which is exactly the mistake a naive byte-mean makes.
    mapInPandas, one Arrow batch at a time; the pixel sum is a single
    numpy reduction over a (height, stride) view, not a per-byte Python
    loop — same integer total, ~50x cheaper at real image sizes."""
    import struct

    import numpy as np

    schema = "doc_id long, width int, height int, bpp int, mean_px double"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in ("doc_id", "width", "height", "bpp", "mean_px")}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                data = bytes(payload)
                magic, _file_sz, _r1, _r2, offset = struct.unpack_from("<2sIHHI", data, 0)
                if magic != b"BM":
                    raise ValueError(f"not a BMP: magic={magic!r}")
                _dib_sz, width, height, _planes, bpp = struct.unpack_from(
                    "<IiiHH", data, 14
                )
                if bpp != 24:
                    raise ValueError(f"only 24-bpp supported, got {bpp}")
                height = abs(height)  # negative = top-down; same pixels
                row_raw = width * 3
                stride = row_raw + (4 - row_raw % 4) % 4
                need = stride * height
                buf = data[offset : offset + need]
                if len(buf) < need:  # truncated file: missing bytes sum as 0,
                    buf += b"\x00" * (need - len(buf))  # matching slice semantics
                total = int(
                    np.frombuffer(buf, dtype=np.uint8)
                    .reshape(height, stride)[:, :row_raw]
                    .sum(dtype=np.int64)
                ) if height else 0
                n_px = row_raw * height
                rows["doc_id"].append(int(doc_id))
                rows["width"].append(width)
                rows["height"].append(height)
                rows["bpp"].append(bpp)
                rows["mean_px"].append(total / n_px if n_px else 0.0)
            if rows["doc_id"]:
                yield pd.DataFrame(rows)

    out = blobs.select("doc_id", "payload").mapInPandas(run, schema)
    # floor-scale: mean of equal-pixel fixtures is a structured int ratio
    return out.withColumn("mean_px", F.floor(F.col("mean_px") * 1e4))


def encode_wav(n_samples: int, amplitude: int, sample_rate: int = 8000) -> bytes:
    """Minimal RIFF/WAVE: fmt chunk (PCM, mono, 16-bit) + data chunk of
    ``n_samples`` constant-``amplitude`` samples."""
    import struct

    data = struct.pack(f"<{n_samples}h", *([amplitude] * n_samples))
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav_features(blobs: DataFrame) -> DataFrame:
    """REAL audio decode (no librosa): walk the RIFF chunks with stdlib
    struct, read fmt (rate/channels/bits) and the PCM data chunk, emit
    duration + mean |amplitude|. Unknown chunks are skipped by their
    declared size — the actual container contract."""
    import struct

    schema = (
        "doc_id long, sample_rate int, n_samples long, duration_ms long, "
        "mean_amp double"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = {
                k: []
                for k in (
                    "doc_id", "sample_rate", "n_samples", "duration_ms", "mean_amp",
                )
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                data = bytes(payload)
                if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
                    raise ValueError("not a RIFF/WAVE file")
                pos, rate, samples = 12, 0, b""
                while pos + 8 <= len(data):
                    cid, size = struct.unpack_from("<4sI", data, pos)
                    pos += 8
                    if cid == b"fmt ":
                        _fmt, _ch, rate, _bps, _align, bits = struct.unpack_from(
                            "<HHIIHH", data, pos
                        )
                        if bits != 16:
                            raise ValueError(f"only 16-bit PCM supported, got {bits}")
                    elif cid == b"data":
                        samples = data[pos : pos + size]
                    pos += size + size % 2  # chunks are word-aligned
                n = len(samples) // 2
                # one vectorized |x| sum over the PCM buffer — same integer
                # total as the per-sample loop (int64 accumulator, no
                # overflow: |int16| <= 32768)
                abs_sum = int(
                    np.abs(
                        np.frombuffer(samples, dtype="<i2", count=n).astype(np.int64)
                    ).sum()
                ) if n else 0
                rows["doc_id"].append(int(doc_id))
                rows["sample_rate"].append(rate)
                rows["n_samples"].append(n)
                rows["duration_ms"].append(n * 1000 // rate if rate else 0)
                rows["mean_amp"].append(abs_sum / n if n else 0.0)
            if rows["doc_id"]:
                yield pd.DataFrame(rows)

    out = blobs.select("doc_id", "payload").mapInPandas(run, schema)
    return out.withColumn("mean_amp", F.floor(F.col("mean_amp") * 1e4))


def _wav_pcm(data: bytes):
    """RIFF walk -> (sample_rate, int16 numpy PCM). Same chunk contract
    as decode_wav_features (fmt + data, unknown chunks skipped by
    declared size, word alignment honored)."""
    import struct

    import numpy as np

    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, rate, samples = 12, 0, b""
    while pos + 8 <= len(data):
        cid, size = struct.unpack_from("<4sI", data, pos)
        pos += 8
        if cid == b"fmt ":
            _fmt, _ch, rate, _bps, _align, bits = struct.unpack_from(
                "<HHIIHH", data, pos
            )
            if bits != 16:
                raise ValueError(f"only 16-bit PCM supported, got {bits}")
        elif cid == b"data":
            samples = data[pos : pos + size]
        pos += size + size % 2
    n = len(samples) // 2
    return rate, np.frombuffer(samples, dtype="<i2", count=n)


def resample_wav_features(blobs: DataFrame, factor: int = 2) -> DataFrame:
    """REAL audio resample stage: decode PCM, then decimate by ``factor``
    with a box filter (mean of each consecutive ``factor``-sample group,
    floor-divided in int32 — a low-pass + downsample whose arithmetic
    both engines can reproduce exactly). Emits the resampled stream's
    shape + mean |amplitude|. One numpy reshape-mean per payload; Arrow
    batches in and out — the multimodal feature-stage contract."""
    import numpy as np

    schema = (
        "doc_id long, in_rate int, out_rate int, in_samples long, "
        "out_samples long, mean_amp double"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {
                k: []
                for k in (
                    "doc_id", "in_rate", "out_rate", "in_samples",
                    "out_samples", "mean_amp",
                )
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                rate, pcm = _wav_pcm(bytes(payload))
                n = len(pcm)
                m = n // factor
                if m:
                    grouped = pcm[: m * factor].astype(np.int32).reshape(m, factor)
                    res = grouped.sum(axis=1) // factor  # box filter, int
                    mean_amp = float(np.abs(res.astype(np.int64)).sum() / m)
                else:
                    mean_amp = 0.0
                rows["doc_id"].append(int(doc_id))
                rows["in_rate"].append(rate)
                rows["out_rate"].append(rate // factor if rate else 0)
                rows["in_samples"].append(n)
                rows["out_samples"].append(m)
                rows["mean_amp"].append(mean_amp)
            if rows["doc_id"]:
                yield pd.DataFrame(rows)

    out = blobs.select("doc_id", "payload").mapInPandas(run, schema)
    return out.withColumn("mean_amp", F.floor(F.col("mean_amp") * 1e4))


def fake_decode_features(blobs: DataFrame) -> DataFrame:
    """Deterministic FAKE decode (documented stub): derives pseudo
    (width, height, mean_byte) from payload bytes. Exercises the real
    plumbing — Arrow batch in, typed feature columns out — without codecs."""
    schema = "doc_id long, width int, height int, mean_byte double"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            n = pdf["payload"].map(len)
            # full precision out of the UDF; the JVM side emits
            # floor(x*1e4) — sum(bytes)/len is a structured int ratio that
            # can land exactly on round() ties, which Spark and DuckDB
            # resolve differently
            mean = pdf["payload"].map(
                lambda b: (
                    int(np.frombuffer(b, dtype=np.uint8).sum(dtype=np.int64)) / len(b)
                ) if len(b) else 0.0
            )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "width": (n % 640 + 1).astype("int32"),
                    "height": (n % 480 + 1).astype("int32"),
                    "mean_byte": mean,
                }
            )

    from pyspark.sql import functions as F

    out = blobs.select("doc_id", "payload").mapInPandas(run, schema)
    return out.withColumn("mean_byte", F.floor(F.col("mean_byte") * 1e4))


def encode_bmp_gradient(width: int, height: int) -> bytes:
    """24-bpp BMP whose pixel at storage position (x, y) has
    B=G=R = (x*7 + y*13) % 256 — position-dependent content so resize
    grids are verifiable (a constant fill would hide sampling bugs)."""
    import struct

    row_raw = width * 3
    pad = (4 - row_raw % 4) % 4
    rows = []
    for y in range(height):
        row = bytearray()
        for x in range(width):
            v = (x * 7 + y * 13) % 256
            row += bytes((v, v, v))
        rows.append(bytes(row) + b"\x00" * pad)
    pixel_bytes = b"".join(rows)
    dib = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0,
                      len(pixel_bytes), 2835, 2835, 0, 0)
    offset = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", offset + len(pixel_bytes), 0, 0, offset)
    return header + dib + pixel_bytes


def resize_bmp_features(blobs: DataFrame, out_w: int = 4, out_h: int = 3) -> DataFrame:
    """REAL image resize (the mandate's resize stage): nearest-neighbor
    downsample of the decoded 24-bpp pixel array inside the Arrow batch.
    The NN grid is the classic floor map src = (dst * src_dim) // dst_dim
    over STORAGE row order (BMP bottom-up orientation does not matter to
    the feature definition — it is a deterministic function of the
    stored array). Output mean is exact integer math
    (sum * 10000 // count), so an oracle can replay it bit-for-bit.
    numpy fancy-indexing — no per-pixel Python loop."""
    import struct

    import numpy as np

    schema = "doc_id long, out_w int, out_h int, mean_px_x10000 long"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in ("doc_id", "out_w", "out_h", "mean_px_x10000")}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                data = bytes(payload)
                magic, _sz, _r1, _r2, offset = struct.unpack_from("<2sIHHI", data, 0)
                if magic != b"BM":
                    raise ValueError(f"not a BMP: magic={magic!r}")
                _d, width, height, _p, bpp = struct.unpack_from("<IiiHH", data, 14)
                if bpp != 24:
                    raise ValueError(f"only 24-bpp supported, got {bpp}")
                height = abs(height)
                row_raw = width * 3
                stride = row_raw + (4 - row_raw % 4) % 4
                px = (
                    np.frombuffer(data, dtype=np.uint8, count=stride * height,
                                  offset=offset)
                    .reshape(height, stride)[:, :row_raw]
                    .reshape(height, width, 3)
                )
                ys = (np.arange(out_h) * height) // out_h
                xs = (np.arange(out_w) * width) // out_w
                resized = px[np.ix_(ys, xs)]
                total = int(resized.sum(dtype=np.int64))
                rows["doc_id"].append(int(doc_id))
                rows["out_w"].append(out_w)
                rows["out_h"].append(out_h)
                rows["mean_px_x10000"].append(total * 10000 // (out_w * out_h * 3))
            if rows["doc_id"]:
                yield pd.DataFrame(rows)

    return blobs.select("doc_id", "payload").mapInPandas(run, schema)


def sample_frames(
    blobs: DataFrame, frame_bytes: int = 32, every: int = 3
) -> DataFrame:
    """REAL frame sampling (the mandate's video stage): the payload is a
    sequence of fixed-size frames; emit every Nth frame's byte-mean —
    one OUTPUT ROW PER SAMPLED FRAME (UDTF shape via mapInPandas, the
    same fan-out a video pipeline's keyframe extractor has). Tail bytes
    short of a full frame are dropped, as a real container reader does.
    Exact integer means (sum * 10000 // frame_bytes) for oracle parity;
    numpy reshape per payload, no per-byte loop."""
    import numpy as np

    schema = "doc_id long, frame_idx int, mean_byte_x10000 long"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in ("doc_id", "frame_idx", "mean_byte_x10000")}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                data = bytes(payload)
                n_frames = len(data) // frame_bytes
                if n_frames == 0:
                    continue
                arr = (
                    np.frombuffer(data, dtype=np.uint8, count=n_frames * frame_bytes)
                    .reshape(n_frames, frame_bytes)
                )
                for f in range(0, n_frames, every):
                    total = int(arr[f].sum(dtype=np.int64))
                    rows["doc_id"].append(int(doc_id))
                    rows["frame_idx"].append(f)
                    rows["mean_byte_x10000"].append(total * 10000 // frame_bytes)
            if rows["doc_id"]:
                yield pd.DataFrame(rows)

    return blobs.select("doc_id", "payload").mapInPandas(run, schema)


def scene_cuts(
    blobs: DataFrame, frame_bytes: int = 32, threshold_x10000: int = 300_000
) -> DataFrame:
    """Scene-cut detection over a frame sequence: per-frame byte means
    (the luma proxy), then a cut wherever the absolute mean jump from
    the previous frame reaches the threshold — the shot-boundary
    detector every video ingest pipeline runs before keyframe
    extraction. The whole frame tensor is one numpy reshape + row-mean
    + diff per payload (no per-frame Python loop), emitted one row per
    frame with the jump magnitude so downstream can re-threshold
    without re-decoding. Integer means (sum * 10000 // frame_bytes)
    keep it exactly reproducible."""
    import numpy as np

    schema = (
        "doc_id long, frame_idx int, mean_byte_x10000 long, "
        "jump_x10000 long, is_cut int"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                k: []
                for k in (
                    "doc_id",
                    "frame_idx",
                    "mean_byte_x10000",
                    "jump_x10000",
                    "is_cut",
                )
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                data = bytes(payload)
                n_frames = len(data) // frame_bytes
                if n_frames == 0:
                    continue
                arr = np.frombuffer(
                    data, dtype=np.uint8, count=n_frames * frame_bytes
                ).reshape(n_frames, frame_bytes)
                sums = arr.sum(axis=1, dtype=np.int64)
                means = sums * 10000 // frame_bytes
                jumps = np.abs(np.diff(means, prepend=means[:1]))
                out["doc_id"].extend([int(doc_id)] * n_frames)
                out["frame_idx"].extend(range(n_frames))
                out["mean_byte_x10000"].extend(int(m) for m in means)
                out["jump_x10000"].extend(int(j) for j in jumps)
                out["is_cut"].extend(
                    int(f > 0 and j >= threshold_x10000)
                    for f, j in enumerate(jumps)
                )
            if out["doc_id"]:
                yield pd.DataFrame(out)

    return blobs.select("doc_id", "payload").mapInPandas(run, schema)


def encode_bmp_gray(px) -> bytes:
    """24-bpp BMP from a top-down (h, w) uint8 grayscale grid (B=G=R),
    stored bottom-up with 4-byte row padding — the genuine on-disk
    layout, numpy-vectorized per row."""
    import struct

    import numpy as np

    px = np.asarray(px, dtype=np.uint8)
    h, w = px.shape
    row_raw = w * 3
    pad = (4 - row_raw % 4) % 4
    rows = [
        np.repeat(px[r], 3).tobytes() + b"\x00" * pad
        for r in range(h - 1, -1, -1)  # bottom-up storage order
    ]
    pixel_bytes = b"".join(rows)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0,
                      len(pixel_bytes), 2835, 2835, 0, 0)
    offset = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", offset + len(pixel_bytes), 0, 0, offset)
    return header + dib + pixel_bytes


def dhash_signatures(blobs: DataFrame) -> DataFrame:
    """Perceptual difference-hash (dHash) per image: REAL BMP decode
    (headers, padding, bottom-up un-flip), block-mean downsample to the
    canonical 8x9 grayscale grid, then bit i = r*8+c set iff
    cell[r][c+1] > cell[r][c] — 64 bits packed into one int64. The
    image twin of simhash_signatures: a compact signature whose Hamming
    distance tracks visual similarity, feeding the same banded pair
    join (operators/neardup.py banded_hamming_pairs).

    Requires width divisible by 9 and height by 8 (block-exact
    downsample — fractional resamplers belong to the PIL-gated hook).
    All per-image math is numpy over the Arrow batch; no per-pixel
    Python."""
    import struct

    import numpy as np

    GRID_H, GRID_W = 8, 9
    bit_weights = 1 << np.arange(64, dtype=np.uint64)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, sigs = [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                data = bytes(payload)
                magic, _sz, _r1, _r2, offset = struct.unpack_from("<2sIHHI", data, 0)
                if magic != b"BM":
                    raise ValueError(f"not a BMP: magic={magic!r}")
                _dib, w, h, _pl, bpp = struct.unpack_from("<IiiHH", data, 14)
                if bpp != 24:
                    raise ValueError(f"only 24-bpp supported, got {bpp}")
                top_down = h < 0
                h = abs(h)
                if w % GRID_W or h % GRID_H:
                    raise ValueError(f"dims {w}x{h} not block-divisible")
                stride = w * 3 + (4 - (w * 3) % 4) % 4
                buf = np.frombuffer(
                    data, dtype=np.uint8, count=stride * h, offset=offset
                ).reshape(h, stride)
                gray = buf[:, : w * 3 : 3]  # B channel; fixture is B=G=R
                if not top_down:
                    gray = gray[::-1]  # bottom-up storage -> top-down
                cells = (
                    gray.reshape(GRID_H, h // GRID_H, GRID_W, w // GRID_W)
                    .mean(axis=(1, 3))
                )
                bits = (cells[:, 1:] > cells[:, :-1]).ravel()
                sig = bit_weights[bits].sum(dtype=np.uint64)
                ids.append(int(doc_id))
                sigs.append(np.int64(sig))
            yield pd.DataFrame({"doc_id": ids, "dhash": np.array(sigs, dtype=np.int64)})

    return blobs.select("doc_id", "payload").mapInPandas(run, "doc_id long, dhash long")
