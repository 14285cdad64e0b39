"""Property-based replica merge replay: random change sequences split
into random batch boundaries, applied through ReplicaStore.merge_changes,
must equal a pure-Python last-writer-wins replay — including tombstone
semantics, duplicate-seq-free ordering, and at-least-once re-delivery
of ANY batch (idempotence under replay is the T2 contract)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from clockpipe_spark.streaming.replica import ReplicaStore


@st.composite
def change_logs(draw):
    n = draw(st.integers(min_value=1, max_value=24))
    ops = []
    for seq in range(1, n + 1):
        op = draw(st.sampled_from(["I", "U", "D"]))
        key = draw(st.integers(min_value=0, max_value=4))
        val = draw(st.integers(min_value=0, max_value=99))
        ops.append((seq, op, key, float(val)))
    # random batch boundaries (sorted unique cut points)
    cuts = sorted(
        set(draw(st.lists(st.integers(min_value=1, max_value=n), max_size=3)))
    )
    batches, start = [], 0
    for c in cuts:
        if start < c:
            batches.append(ops[start:c])
            start = c
    if start < n:
        batches.append(ops[start:])
    replay_idx = draw(st.integers(min_value=0, max_value=max(len(batches) - 1, 0)))
    return batches, replay_idx


def _py_replay(batches):
    state: dict[int, tuple[float | None, int, bool]] = {}
    for batch in batches:
        for seq, op, key, val in batch:
            cur = state.get(key)
            if cur is not None and cur[1] >= seq:
                continue  # older change never overwrites newer state
            if op == "D":
                state[key] = (None, seq, True)
            else:
                state[key] = (val, seq, False)
    return {
        k: (v, seq) for k, (v, seq, deleted) in state.items() if not deleted
    }


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(change_logs())
def test_merge_replay_matches_python_model(spark, tmp_path_factory, data):
    batches, replay_idx = data
    store = ReplicaStore(str(tmp_path_factory.mktemp("replica")))
    for batch in batches:
        df = spark.createDataFrame(
            batch, "seq long, op string, user_id long, value double"
        )
        store.merge_changes(spark, df, keys=["user_id"])
    # at-least-once: re-deliver one earlier batch verbatim
    replay = batches[replay_idx]
    store.merge_changes(
        spark,
        spark.createDataFrame(replay, "seq long, op string, user_id long, value double"),
        keys=["user_id"],
    )
    visible = store.read(spark)
    got = (
        {}
        if visible is None
        else {
            r["user_id"]: (r["value"], r["last_seq"]) for r in visible.collect()
        }
    )
    assert got == _py_replay(batches)
