"""pgoutput binary decoder (S4) — wire-format vectors mirroring the
reference parser's behavior (pgoutput.rs:237-554): message-type dispatch,
K/O/N tuple handling, cell kinds n/u/t/b, TOAST resolution, and the
truncate first-relid quirk."""

from __future__ import annotations

import struct

import pytest

from clockpipe_spark.cdc.pgoutput import (
    decode_pgoutput,
    encode_begin,
    encode_commit,
    encode_delete,
    encode_insert,
    encode_truncate,
    encode_update,
    parse_pg_output,
)


def test_skipped_message_types():
    # pgoutput.rs:242-262: B/C/O/R/Y all return None
    for b in b"BCORY":
        assert parse_pg_output(bytes([b]) + b"\x00" * 8) is None


def test_unknown_message_type_raises():
    with pytest.raises(ValueError):
        parse_pg_output(b"X\x00\x00")


def test_insert_text_and_null_cells():
    frame = encode_insert(7, [("t", "42", None), ("n", None, None)])
    rec = parse_pg_output(frame)
    assert rec["msg_type"] == "I"
    assert rec["relation_id"] == 7
    assert rec["tuple_type"] == "N"
    assert rec["cells"] == [("t", "42", None), ("n", None, None)]


def test_insert_utf8_multibyte():
    frame = encode_insert(1, [("t", "héllo→世界", None)])
    assert parse_pg_output(frame)["cells"][0][1] == "héllo→世界"


def test_binary_cell():
    frame = encode_insert(1, [("b", None, b"\x00\xffraw")])
    assert parse_pg_output(frame)["cells"][0] == ("b", None, b"\x00\xffraw")


def test_update_without_old_tuple():
    frame = encode_update(3, [("t", "x", None)])
    rec = parse_pg_output(frame)
    assert rec["msg_type"] == "U"
    assert rec["old_cells"] == []
    assert rec["cells"] == [("t", "x", None)]


def test_update_old_tuple_then_new():
    # pgoutput.rs:385-407: K/O tuple is read, then the mandatory N tuple
    for marker in (b"K", b"O"):
        frame = encode_update(
            3,
            [("t", "new", None)],
            old_cells=[("t", "old", None)],
            old_marker=marker,
        )
        rec = parse_pg_output(frame)
        assert rec["tuple_type"] == "N"
        assert rec["old_cells"] == [("t", "old", None)]
        assert rec["cells"] == [("t", "new", None)]


def test_update_missing_new_tuple_raises():
    body = b"U" + struct.pack(">I", 3) + b"O"
    body += struct.pack(">H", 1) + b"t" + struct.pack(">I", 1) + b"x"
    body += b"Q"  # should be 'N'
    with pytest.raises(ValueError, match="Expected 'N' tuple"):
        parse_pg_output(body + struct.pack(">H", 0))


def test_toast_unchanged_resolved_from_old():
    # pgoutput.rs:517-533: 'u' cells filled positionally from old tuple
    frame = encode_update(
        5,
        [("t", "k", None), ("u", None, None)],
        old_cells=[("n", None, None), ("t", "big-toast", None)],
    )
    rec = parse_pg_output(frame)
    assert rec["cells"] == [("t", "k", None), ("t", "big-toast", None)]


def test_toast_unchanged_without_old_is_null():
    # pgoutput.rs:536-551: no old tuple -> warn + NULL
    frame = encode_update(5, [("u", None, None)])
    assert parse_pg_output(frame)["cells"] == [("n", None, None)]


def test_delete_key_tuple():
    rec = parse_pg_output(encode_delete(9, [("t", "11", None)]))
    assert rec["msg_type"] == "D"
    assert rec["tuple_type"] == "K"
    assert rec["cells"] == [("t", "11", None)]


def test_truncate_reads_all_relids():
    # DOCUMENTED DIVERGENCE from pgoutput.rs:427-448 (which keeps only
    # the FIRST relid and silently drops the rest): the full relid list
    # is decoded so a routed pipe can truncate every affected table.
    rec = parse_pg_output(encode_truncate([77, 88, 99], flags=1))
    assert rec["msg_type"] == "T"
    assert rec["relation_id"] == 77  # first relid keeps the reference shape
    assert rec["relation_ids"] == [77, 88, 99]
    assert rec["cells"] == []


def test_truncate_zero_relations_raises():
    with pytest.raises(ValueError, match="zero relations"):
        parse_pg_output(b"T" + struct.pack(">I", 0) + b"\x00")


def test_unknown_cell_kind_raises():
    body = b"I" + struct.pack(">I", 1) + b"N" + struct.pack(">H", 1) + b"z"
    with pytest.raises(ValueError, match="Unknown column type"):
        parse_pg_output(body)


def test_decode_stream_drops_noise_and_decodes(spark):
    frames = [
        (1, 100, encode_begin()),
        (2, 100, encode_insert(16384, [("t", "1", None), ("t", "3.5", None)])),
        (3, 100, encode_update(16385, [("t", "2", None), ("u", None, None)],
                               old_cells=[("n", None, None), ("t", "9.25", None)])),
        (4, 100, encode_delete(16384, [("t", "1", None)])),
        (5, 100, encode_truncate([16385])),
        (6, 100, encode_commit()),
    ]
    df = spark.createDataFrame(frames, "lsn long, xid long, data binary")
    out = {r["lsn"]: r for r in decode_pgoutput(df).collect()}
    assert sorted(out) == [2, 3, 4, 5]  # begin/commit dropped in-pass
    assert out[2]["msg_type"] == "I"
    assert out[2]["cell_texts"][1] == "3.5"
    assert out[3]["cell_texts"][1] == "9.25"  # TOAST resolved
    assert out[4]["msg_type"] == "D" and out[4]["tuple_type"] == "K"
    assert out[5]["msg_type"] == "T" and out[5]["relation_id"] == 16385
    # the UPDATE's old tuple surfaces for split-tombstone apply; rows
    # with no old tuple carry empty arrays, not NULLs
    assert out[3]["old_kinds"] == ["n", "t"]
    assert out[3]["old_texts"] == [None, "9.25"]
    assert out[2]["old_kinds"] == [] and out[2]["old_texts"] == []


def test_decode_stream_multi_relation_truncate_fans_out(spark):
    """One 'TRUNCATE a, b, c' frame becomes one T record PER relid at
    the same LSN (divergence from the reference's first-relid quirk) so
    each routed table sees its truncate."""
    frames = [(7, 101, encode_truncate([111, 222, 333]))]
    df = spark.createDataFrame(frames, "lsn long, xid long, data binary")
    out = decode_pgoutput(df).collect()
    assert [(r["lsn"], r["msg_type"], r["relation_id"]) for r in out] == [
        (7, "T", 111), (7, "T", 222), (7, "T", 333),
    ]
