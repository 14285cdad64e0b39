"""Postgres COPY-text decoding (SURVEY.md §2.1 S2).

The reference implements a streaming, chunk-boundary-safe byte state
machine (adapter/postgres.rs:373-515) because it parses a raw socket
stream. In Spark, framing is the data source's job — ``spark.read.text``
delivers whole lines regardless of underlying block splits — so the
engine only needs the *field* semantics, which we reproduce exactly
(escape table adapter/postgres.rs:373-471; tests 992-1097):

- ``\\b \\f \\n \\r \\t \\v \\\\`` control escapes
- ``\\xH[H]``  1- or 2-digit hex byte escapes
- ``\\O[O[O]]`` 1- to 3-digit octal byte escapes
- byte escapes may encode UTF-8 *bytes* (e.g. ``\\303\\251`` -> é)
- ``\\N`` as the whole field -> NULL
- any other escaped char -> itself

Decoding happens on raw bytes and re-decodes UTF-8 at the end, exactly
like the reference. Runs as an Arrow-batched pandas UDF (byte-level
logic has no Catalyst expression form).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_CTRL = {
    ord("b"): 0x08,
    ord("f"): 0x0C,
    ord("n"): 0x0A,
    ord("r"): 0x0D,
    ord("t"): 0x09,
    ord("v"): 0x0B,
}
_HEX = b"0123456789abcdefABCDEF"
_OCT = b"01234567"


def decode_copy_field(raw: bytes | None) -> str | None:
    """Decode one COPY text field (already split on the field separator).

    Mirrors decode_copy_text_field (adapter/postgres.rs:373-471)
    including the \\N null sentinel (444-447) and multi-byte UTF-8
    restored from byte escapes (tests 1018-1065).
    """
    if raw is None or raw == b"\\N":
        return None
    out = bytearray()
    i, n = 0, len(raw)
    while i < n:
        c = raw[i]
        if c != 0x5C or i + 1 >= n:  # not a backslash (or trailing one)
            out.append(c)
            i += 1
            continue
        nxt = raw[i + 1]
        if nxt in _CTRL:
            out.append(_CTRL[nxt])
            i += 2
        elif nxt == 0x5C:
            out.append(0x5C)
            i += 2
        elif nxt == ord("x") and i + 2 < n and raw[i + 2] in _HEX:
            j = i + 2
            end = min(j + 2, n)
            while j < end and raw[j] in _HEX:
                j += 1
            out.append(int(raw[i + 2 : j], 16))
            i = j
        elif nxt in _OCT:
            j = i + 1
            end = min(j + 3, n)
            while j < end and raw[j] in _OCT:
                j += 1
            out.append(int(raw[i + 1 : j], 8) & 0xFF)
            i = j
        else:  # unknown escape: literal next char
            out.append(nxt)
            i += 2
    return out.decode("utf-8", errors="replace")


def split_copy_line(line: bytes) -> list[bytes]:
    """Split a COPY line into raw fields on unescaped tabs. Literal tabs
    inside values are always escaped as ``\\t`` by COPY, so a raw 0x09 is
    always a separator — but a trailing backslash escape must not hide
    one (``\\\\`` before a tab)."""
    fields: list[bytes] = []
    cur = bytearray()
    i, n = 0, len(line)
    while i < n:
        c = line[i]
        if c == 0x5C and i + 1 < n:  # escape: consume both bytes verbatim
            cur.append(c)
            cur.append(line[i + 1])
            i += 2
        elif c == 0x09:
            fields.append(bytes(cur))
            cur = bytearray()
            i += 1
        else:
            cur.append(c)
            i += 1
    fields.append(bytes(cur))
    return fields


def read_copy_text(
    spark: SparkSession, path: str, column_names: list[str]
) -> DataFrame:
    """COPY-text file -> DataFrame of decoded string columns (NULLs for
    \\N). Distributed: each Arrow batch of lines decodes independently —
    the chunk-state problem the reference solves by hand
    (adapter/postgres.rs:473-515) is absorbed by line framing."""
    n_cols = len(column_names)
    schema = T.StructType(
        [T.StructField(c, T.StringType(), True) for c in column_names]
    )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for line in pdf["value"]:
                raw_fields = split_copy_line(line.encode("utf-8"))
                vals = [decode_copy_field(f) for f in raw_fields[:n_cols]]
                vals += [None] * (n_cols - len(vals))
                rows.append(vals)
            yield pd.DataFrame(rows, columns=column_names)

    return spark.read.text(path).mapInPandas(decode, schema)
