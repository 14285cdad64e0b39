"""Property-based checks (hypothesis): both connected-components
implementations against a pure-Python union-find reference, and the
grid pair join against the naive blocked join, on random inputs.

Few examples, no deadline: each example runs real Spark jobs; the value
is the random structure (cycles, self-edges, duplicate edges, isolated
vertices), not the example count.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from clockpipe_spark.operators.components import (
    connected_components,
    connected_components_star,
)
from clockpipe_spark.operators.fanout import grid_pair_join


def _union_find_min_labels(vertices, edges):
    parent = {v: v for v in vertices}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    groups: dict[int, list[int]] = {}
    for v in vertices:
        groups.setdefault(find(v), []).append(v)
    return {v: min(g) for g in groups.values() for v in g}


@st.composite
def graphs(draw):
    n = draw(st.integers(min_value=1, max_value=24))
    vertices = list(range(n))
    edges = draw(
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=n - 1),
                st.integers(min_value=0, max_value=n - 1),
            ),
            max_size=40,
        )
    )
    return vertices, edges


@settings(
    max_examples=8, deadline=None, suppress_health_check=list(HealthCheck)
)
@given(graphs())
def test_components_match_union_find(spark, graph):
    vertices, edges = graph
    expected = _union_find_min_labels(vertices, edges)
    vdf = spark.createDataFrame([(v,) for v in vertices], "id long")
    edf = spark.createDataFrame(edges or [], "src long, dst long")
    star = {
        r["id"]: r["lbl"]
        for r in connected_components_star(vdf, edf).collect()
    }
    assert star == expected
    minlbl = {
        r["id"]: r["lbl"]
        for r in connected_components(vdf, edf, max_iter=60).collect()
    }
    assert minlbl == expected


@settings(
    max_examples=6, deadline=None, suppress_health_check=list(HealthCheck)
)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=40),
            st.integers(min_value=0, max_value=3),
        ),
        min_size=0,
        max_size=30,
        unique_by=lambda t: t[0],
    ),
    grid=st.integers(min_value=1, max_value=6),
)
def test_grid_pair_join_property(spark, rows, grid):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(rows or [], "id long, lbl int")
    a = df.select("lbl", F.col("id").alias("id_a"))
    b = df.select("lbl", F.col("id").alias("id_b"))
    expected = sorted(
        (r.id_a, r.id_b)
        for r in a.join(b, "lbl").filter(F.col("id_a") < F.col("id_b")).collect()
    )
    got = sorted(
        (r.id_a, r.id_b)
        for r in grid_pair_join(a, b, "lbl", "id_a", "id_b", grid=grid).collect()
    )
    assert got == expected
