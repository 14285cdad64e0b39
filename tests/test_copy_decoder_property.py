"""Property-based COPY text decoding: a pure-Python escape ENCODER
(written to the COPY TO spec, independent of the decoder) round-trips
arbitrary unicode field values — including tabs, newlines, backslashes
and NULLs — through split_copy_line + decode_copy_field."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from clockpipe_spark.cdc.copy_decoder import decode_copy_field, split_copy_line

# COPY TO escapes (PostgreSQL docs, "Text Format"): backslash itself,
# then control characters as C-style escapes
_ESCAPES = {
     "\\": "\\\\",
    "\b": "\\b",
    "\f": "\\f",
    "\n": "\\n",
    "\r": "\\r",
    "\t": "\\t",
    "\v": "\\v",
}


def _encode_field(value: str | None) -> bytes:
    if value is None:
        return b"\\N"
    return "".join(_ESCAPES.get(ch, ch) for ch in value).encode("utf-8")


_field = st.one_of(
    st.none(),
    st.text(max_size=30),  # arbitrary unicode incl. tabs/newlines
)


@settings(max_examples=300, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(_field, min_size=1, max_size=6))
def test_copy_line_round_trip(fields):
    line = b"\t".join(_encode_field(f) for f in fields)
    raw = split_copy_line(line)
    assert len(raw) == len(fields)
    decoded = [decode_copy_field(r) for r in raw]
    assert decoded == fields


@settings(max_examples=200, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.text(max_size=20))
def test_octal_byte_escapes_decode_utf8(value):
    # encode EVERY byte as an octal escape — the hardest path: the
    # decoder must reassemble multi-byte UTF-8 from per-byte escapes
    raw = "".join(f"\\{b:03o}" for b in value.encode("utf-8")).encode("ascii")
    assert decode_copy_field(raw) == value
