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
    """Real image decode — requires PIL, which this container lacks."""
    if not _HAS_PIL:
        raise NotImplementedError(
            "image decode requires PIL; use fake_decode_features for the "
            "deterministic test path"
        )
    raise NotImplementedError("wire PIL decode here when the lib is present")


def fake_decode_features(blobs: DataFrame) -> DataFrame:
    """Deterministic FAKE decode (documented stub): derives pseudo
    (width, height, mean_byte) from payload bytes. Exercises the real
    plumbing — Arrow batch in, typed feature columns out — without codecs."""
    schema = "doc_id long, width int, height int, mean_byte double"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = pdf["payload"].map(len)
            # full precision out of the UDF; the JVM side emits
            # floor(x*1e4) — sum(bytes)/len is a structured int ratio that
            # can land exactly on round() ties, which Spark and DuckDB
            # resolve differently
            mean = pdf["payload"].map(
                lambda b: (sum(b) / len(b)) if len(b) else 0.0
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
