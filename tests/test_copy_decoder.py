"""COPY text decoding — the reference's own regression vectors
(adapter/postgres.rs:992-1097, FIXTURES.md §B)."""

from __future__ import annotations

import os

from clockpipe_spark.cdc.copy_decoder import (
    decode_copy_field,
    read_copy_text,
    split_copy_line,
)


def test_control_escapes():
    # adapter/postgres.rs:992-1016
    assert decode_copy_field(rb"line1\nline2\tvalue\\path") == "line1\nline2\tvalue\\path"
    assert decode_copy_field(rb"a\b\f\r\v") == "a\x08\x0c\r\x0b"


def test_hex_escapes_1_and_2_digit():
    assert decode_copy_field(rb"\xA") == "\n"
    assert decode_copy_field(rb"\x41") == "A"
    assert decode_copy_field(rb"\x41\x42C") == "ABC"


def test_utf8_restored_from_byte_escapes():
    # é encoded as two escaped BYTES, hex and octal forms
    # (adapter/postgres.rs:1018-1065)
    assert decode_copy_field(rb"caf\xC3\xA9") == "café"
    assert decode_copy_field(rb"caf\303\251") == "café"


def test_null_sentinel():
    assert decode_copy_field(rb"\N") is None
    assert decode_copy_field(rb"N") == "N"
    assert decode_copy_field(rb"x\N") == "xN"  # only the whole field is NULL


def test_unknown_escape_is_literal():
    assert decode_copy_field(rb"\q") == "q"


def test_split_copy_line_respects_escapes():
    # escaped backslash before a real tab separator
    fields = split_copy_line(rb"a\\" + b"\t" + rb"b\tc")
    assert fields == [rb"a\\", rb"b\tc"]


def test_read_copy_text_end_to_end(spark, tmp_path):
    path = os.path.join(tmp_path, "copy.tsv")
    with open(path, "wb") as f:
        f.write(rb"1" + b"\t" + rb"caf\303\251" + b"\t" + rb"\N" + b"\n")
        f.write(rb"2" + b"\t" + rb"json \x7b\x22k\x22: 1\x7d" + b"\t" + rb"x\ty" + b"\n")
    df = read_copy_text(spark, path, ["id", "name", "extra"])
    rows = {r["id"]: r for r in df.collect()}
    assert rows["1"]["name"] == "café" and rows["1"]["extra"] is None
    assert rows["2"]["name"] == 'json {"k": 1}'
    assert rows["2"]["extra"] == "x\ty"
