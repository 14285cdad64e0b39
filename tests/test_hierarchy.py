"""Hierarchy-rollup property check: the iterated-join closure vs a
pure-python fixpoint on SPARSE doc-id sets — the adversarial case the
dense fixture can't produce is a chain with a MISSING intermediate
node (537 exists, 53 doesn't), where edge-relation semantics must stop
the chain rather than stepping arithmetically past the gap."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from clockpipe_spark.queries.relational5 import _HIER_FANOUT, hierarchy_rollup


def _write_docs(tmpdir, ids):
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(sorted(ids), pa.int64()),
                "text": pa.array(["x" for _ in ids], pa.string()),
                "lang": pa.array(["en" for _ in ids], pa.string()),
                "source": pa.array(["gen" for _ in ids], pa.string()),
                "n_chars": pa.array([i % 97 + 1 for i in sorted(ids)], pa.int64()),
            }
        ),
        str(tmpdir / "documents.parquet"),
    )
    return str(tmpdir)


def _python_rollup(ids):
    idset = set(ids)
    chars = {i: i % 97 + 1 for i in ids}
    rollup: dict[int, list] = {}
    for node in ids:
        anc, depth = node, 0
        while True:
            entry = rollup.setdefault(anc, [0, 0, 0])
            entry[0] += 1
            entry[1] = max(entry[1], depth)
            entry[2] += chars[node]
            # step through the EDGE RELATION: only nodes that exist
            # (and are > 0) have an outgoing edge
            if anc <= 0 or anc not in idset:
                break
            anc, depth = anc // _HIER_FANOUT, depth + 1
    return {a: tuple(v) for a, v in rollup.items()}


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.sets(st.integers(min_value=0, max_value=99_999), min_size=1, max_size=40)
)
def test_hierarchy_rollup_sparse_ids(spark, tmp_path_factory, ids):
    sf_dir = _write_docs(tmp_path_factory.mktemp("docs"), ids)
    expect = _python_rollup(ids)
    got = {
        r["ancestor"]: (r["n_subtree"], r["max_depth"], r["total_chars"])
        for r in hierarchy_rollup(spark, sf_dir).collect()
    }
    assert got == expect
