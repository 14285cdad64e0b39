"""Property checks for the retrieval tier: the length-band blocking in
neardup_edit_distance must find EXACTLY the brute-force pair set — the
adversarial cases are lengths at exact band multiples and diffs of
exactly the band width, which the fixture corpus can't guarantee —
and the ordered-edge triangle count must match an itertools census of
the same pair graph.
"""

from __future__ import annotations

import itertools

import pyarrow as pa
import pyarrow.parquet as pq
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from clockpipe_spark.queries.retrieval import (
    _EDIT_BAND,
    _EDIT_MAX,
    _EDIT_PREFIX,
    neardup_edit_distance,
    neardup_triangle_stats,
)


def _lev(a: str, b: str) -> int:
    # classic two-row DP; inputs are short generated strings
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


@st.composite
def doc_sets(draw):
    n = draw(st.integers(min_value=2, max_value=14))
    rows = []
    for i in range(n):
        # lengths hug band boundaries: multiples of the band width +-1,
        # so same-band, adjacent-band, and exactly-band-apart diffs all
        # occur; two-letter alphabet keeps some distances <= threshold
        # and others above it
        base = draw(st.integers(min_value=1, max_value=3)) * _EDIT_BAND
        length = max(1, base + draw(st.integers(min_value=-1, max_value=1)))
        text = "".join(
            draw(st.sampled_from("ab")) for _ in range(min(length, 30))
        ).ljust(length, draw(st.sampled_from("xy")))
        rows.append((i, text, draw(st.sampled_from(["en", "de"])), "gen", length))
    return rows


def _write_docs(tmpdir, rows):
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
                "lang": pa.array([r[2] for r in rows], pa.string()),
                "source": pa.array([r[3] for r in rows], pa.string()),
                "n_chars": pa.array([r[4] for r in rows], pa.int64()),
            }
        ),
        str(tmpdir / "documents.parquet"),
    )
    return str(tmpdir)


def _brute_pairs(rows):
    out = {}
    for (ia, ta, la, _, na), (ib, tb, lb, _, nb) in itertools.combinations(
        rows, 2
    ):
        if la != lb or abs(na - nb) > _EDIT_BAND:
            continue
        d = _lev(
            ta.strip().lower()[:_EDIT_PREFIX], tb.strip().lower()[:_EDIT_PREFIX]
        )
        if d <= _EDIT_MAX:
            out[(min(ia, ib), max(ia, ib))] = d
    return out


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(doc_sets())
def test_edit_blocking_complete(spark, tmp_path_factory, rows):
    sf_dir = _write_docs(tmp_path_factory.mktemp("docs"), rows)
    expect = _brute_pairs(rows)
    got = {
        (r["doc_a"], r["doc_b"]): r["edit_distance"]
        for r in neardup_edit_distance(spark, sf_dir).collect()
    }
    assert got == expect


@settings(max_examples=4, deadline=None, suppress_health_check=list(HealthCheck))
@given(doc_sets())
def test_triangle_census(spark, tmp_path_factory, rows):
    sf_dir = _write_docs(tmp_path_factory.mktemp("docs"), rows)
    pairs = set(_brute_pairs(rows))
    lang = {r[0]: r[2] for r in rows}
    tri_by_lang: dict[str, int] = {}
    nodes = {n for p in pairs for n in p}
    for a, b, c in itertools.combinations(sorted(nodes), 3):
        if {(a, b), (b, c), (a, c)} <= pairs:
            tri_by_lang[lang[a]] = tri_by_lang.get(lang[a], 0) + 1
    got = {
        r["lang"]: r["n_triangles"]
        for r in neardup_triangle_stats(spark, sf_dir).collect()
    }
    # stats rows exist only for langs with edges; compare triangle
    # counts on the union of keys
    for lg in set(got) | set(tri_by_lang):
        assert got.get(lg, 0) == tri_by_lang.get(lg, 0), lg
