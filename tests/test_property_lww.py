"""Property-based check (hypothesis): for ANY small change stream —
arbitrary op mix, colliding timestamps, duplicated seqs, any segment
split — the engine's final state equals the naive single-process oracle
reducer, row for row under (conv_id, turn_idx) ordering."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from xgeo_ray import fixtures as fx
from xgeo_ray.partition import add_part_key
from xgeo_ray.schemas import CHANGE_EVENTS_SCHEMA
from xgeo_ray.stages.collapse import (
    collapse_with_metrics,
    lww_collapse,
    merge_versions,
)

events_strategy = st.lists(
    st.tuples(
        st.sampled_from(["I", "U", "D"]),
        st.integers(0, 4),  # conv
        st.integers(0, 3),  # turn
        st.integers(0, 5),  # ts bucket (collisions likely)
    ),
    min_size=1,
    max_size=60,
)


def _build(events: list[tuple[str, int, int, int]]) -> pa.Table:
    n = len(events)
    return pa.table(
        {
            "seq": pa.array(range(n), pa.int64()),
            "op": pa.array([e[0] for e in events]),
            "conv_id": pa.array([f"c{e[1]}" for e in events]),
            "turn_idx": pa.array([e[2] for e in events], pa.int32()),
            "role": pa.array(["user"] * n),
            "text": pa.array([f"t-{e[1]}-{e[2]}-{i}" for i, e in enumerate(events)]),
            "tool": pa.array([""] * n),
            "ts": pa.array(
                [fx.BASE_TS_US + e[3] * 1000 for e in events], pa.int64()
            ).cast(pa.timestamp("us")),
        },
        schema=CHANGE_EVENTS_SCHEMA,
    )


@given(events_strategy, st.integers(1, 4))
@settings(max_examples=60, deadline=None, suppress_health_check=list(HealthCheck))
def test_collapse_matches_oracle(events, n_chunks):
    """merge_versions over ANY chunking of the stream == oracle reducer.
    (Pure kernels — no Ray — so hypothesis can afford many examples.)"""
    t = _build(events)
    bounds = [round(i * t.num_rows / n_chunks) for i in range(n_chunks + 1)]
    chunks = [t.slice(bounds[i], bounds[i + 1] - bounds[i]) for i in range(n_chunks)]
    # each chunk pre-collapsed independently, then merged — the engine's
    # two-level collapse must equal collapsing the whole stream at once
    pre = [lww_collapse(c, drop_tombstones=False) for c in chunks if c.num_rows]
    got = merge_versions(pre, drop_tombstones=True).to_pandas()
    want = fx.naive_final_state(None, t).to_pandas()
    got = got.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    want = want.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["conv_id", "turn_idx", "text"]], want[["conv_id", "turn_idx", "text"]]
    )


@given(events_strategy)
@settings(max_examples=40, deadline=None, suppress_health_check=list(HealthCheck))
def test_collapse_with_metrics_counts(events):
    """The single-sort metrics equal independent recomputation."""
    t = _build(events)
    collapsed, n_keys, n_trips, _ = collapse_with_metrics(t, drop_tombstones=False)
    df = t.to_pandas()
    assert n_keys == df.groupby(["conv_id", "turn_idx"]).ngroups
    assert n_trips == df.groupby(["conv_id", "turn_idx", "seq"]).ngroups
    assert collapsed.num_rows == n_keys  # one winner per key


@given(events_strategy, st.integers(1, 8), st.integers(1, 4))
@settings(max_examples=40, deadline=None, suppress_health_check=list(HealthCheck))
def test_salting_never_splits_a_key(events, num_partitions, num_salts):
    t = add_part_key(_build(events), num_partitions, num_salts)
    df = t.to_pandas()
    per_key = df.groupby(["conv_id", "turn_idx"])["part_key"].nunique()
    assert (per_key == 1).all()


# ------------------------------------------------------ additive policy

additive_strategy = st.lists(
    st.tuples(
        st.sampled_from(["I", "U", "D"]),
        st.integers(0, 3),   # conv
        st.integers(0, 2),   # turn
        st.integers(0, 4),   # ts bucket (collisions likely)
        st.integers(-5, 9),  # amount (negatives too)
        st.booleans(),       # redeliver this event later?
    ),
    min_size=1,
    max_size=50,
)


@given(additive_strategy)
@settings(max_examples=60, deadline=None)
def test_additive_collapse_matches_pandas_oracle(events):
    """additive_collapse == pandas oracle for ANY op mix / ts collisions /
    redelivered seqs: per key, dedup (key, seq), sum amounts, last op by
    (ts, seq) decides tombstone survival."""
    from xgeo_ray.stages.collapse import additive_collapse

    n = len(events)
    t = pa.table(
        {
            "seq": pa.array(range(n), pa.int64()),
            "op": pa.array([e[0] for e in events]),
            "conv_id": pa.array([f"c{e[1]}" for e in events]),
            "turn_idx": pa.array([e[2] for e in events], pa.int32()),
            "ts": pa.array(
                [fx.BASE_TS_US + e[3] * 1000 for e in events], pa.int64()
            ).cast(pa.timestamp("us")),
            "amount": pa.array([e[4] for e in events], pa.int64()),
        }
    )
    dup_idx = [i for i, e in enumerate(events) if e[5]]
    if dup_idx:
        t = pa.concat_tables([t, t.take(pa.array(dup_idx, pa.int64()))])

    got = (
        additive_collapse(t, drop_tombstones=True)
        .select(["conv_id", "turn_idx", "amount"])
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )

    df = t.to_pandas()
    df = df.sort_values(["ts", "seq"], kind="stable")
    df = df.drop_duplicates(subset=["conv_id", "turn_idx", "seq"], keep="first")
    g = df.groupby(["conv_id", "turn_idx"], sort=True)
    want = g.agg(amount=("amount", "sum"), op=("op", "last")).reset_index()
    want = (
        want[want["op"] != "D"]
        .drop(columns=["op"])
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    want["turn_idx"] = want["turn_idx"].astype(got["turn_idx"].dtype)
    pd.testing.assert_frame_equal(got, want)


# ------------------------------------------------------ full-history kernel

from xgeo_ray.stages.collapse import history_dedup  # noqa: E402


@given(events_strategy, st.integers(0, 3))
@settings(max_examples=60, deadline=None, suppress_health_check=list(HealthCheck))
def test_history_dedup_invariants(events, n_dups):
    """For ANY stream (ts collisions, ts-altered redeliveries):
    1. output rows == distinct (key, seq) triples of the input,
    2. LWW over the retained history == LWW over the raw input
       (keeping versions must never change the final state),
    3. output is sorted by (key, ts, seq)."""
    t = _build(events)
    # redeliver the first n_dups events with ALTERED ts (worst case)
    if n_dups and t.num_rows:
        k = min(n_dups, t.num_rows)
        dup = t.slice(0, k)
        i = dup.schema.get_field_index("ts")
        shifted = pa.compute.add(
            dup.column("ts").cast(pa.int64()), 999_000
        ).cast(pa.timestamp("us"))
        dup = dup.set_column(i, dup.schema.field("ts"), shifted)
        t = pa.concat_tables([t, dup])
    kept, n_keys, n_trips, _ = history_dedup(t)
    df = t.to_pandas()
    assert n_trips == df.groupby(["conv_id", "turn_idx", "seq"]).ngroups
    assert kept.num_rows == n_trips
    assert n_keys == df.groupby(["conv_id", "turn_idx"]).ngroups
    # final state unchanged by retaining history
    got = lww_collapse(kept, drop_tombstones=True).to_pandas()
    want = fx.naive_final_state(None, t).to_pandas()
    got = got.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    want = want.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["conv_id", "turn_idx", "text"]],
        want[["conv_id", "turn_idx", "text"]],
    )
    # sortedness of the retained history
    kd = kept.to_pandas()
    key = list(zip(kd.conv_id, kd.turn_idx, kd.ts, kd.seq))
    assert key == sorted(key)


# ------------------------------------------------------ coalesce policy

coalesce_strategy = st.lists(
    st.tuples(
        st.sampled_from(["I", "U", "D"]),
        st.integers(0, 3),                      # conv
        st.integers(0, 2),                      # turn
        st.one_of(st.none(), st.integers(0, 4)),  # role value or unchanged
        st.one_of(st.none(), st.integers(0, 9)),  # text value or unchanged
    ),
    min_size=1,
    max_size=60,
)


def _build_coalesce(events) -> pa.Table:
    n = len(events)
    return pa.table(
        {
            "seq": pa.array(range(n), pa.int64()),
            "op": pa.array([e[0] for e in events]),
            "conv_id": pa.array([f"c{e[1]}" for e in events]),
            "turn_idx": pa.array([e[2] for e in events], pa.int32()),
            "role": pa.array(
                [None if e[3] is None else f"r{e[3]}" for e in events],
                pa.string(),
            ),
            "text": pa.array(
                [None if e[4] is None else f"t{e[4]}" for e in events],
                pa.string(),
            ),
            "tool": pa.array([None] * n, pa.string()),
            "ts": pa.array(
                [fx.BASE_TS_US + i for i in range(n)], pa.int64()
            ).cast(pa.timestamp("us")),
        },
        schema=CHANGE_EVENTS_SCHEMA,
    )


def _coalesce_oracle(t: pa.Table) -> pd.DataFrame:
    """Replay per key in seq order: D resets to absent, I is a full
    image, U patches non-null columns."""
    state: dict[tuple, dict | None] = {}
    for r in t.to_pylist():
        k = (r["conv_id"], r["turn_idx"])
        if r["op"] == "D":
            state[k] = None
        elif r["op"] == "I":
            state[k] = {"role": r["role"], "text": r["text"]}
        else:
            cur = state.get(k) or {"role": None, "text": None}
            state[k] = {
                "role": r["role"] if r["role"] is not None else cur["role"],
                "text": r["text"] if r["text"] is not None else cur["text"],
            }
    rows = [
        {"conv_id": k[0], "turn_idx": k[1], **v}
        for k, v in state.items()
        if v is not None
    ]
    return (
        pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role", "text"])
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
        .astype({"turn_idx": "int64"})
    )


@given(coalesce_strategy, st.integers(1, 5))
@settings(max_examples=60, deadline=None, suppress_health_check=list(HealthCheck))
def test_coalesce_any_epoch_split_matches_oracle(events, n_chunks):
    """coalesce: per-epoch collapse (ANY contiguous seq split — the
    engine's seq-disjoint epochs) merged on read == whole-stream
    collapse == the per-key replay oracle."""
    from xgeo_ray.stages.collapse import coalesce_collapse

    t = _build_coalesce(events)
    bounds = [round(i * t.num_rows / n_chunks) for i in range(n_chunks + 1)]
    chunks = [
        t.slice(bounds[i], bounds[i + 1] - bounds[i]) for i in range(n_chunks)
    ]
    pre = [coalesce_collapse(c, False) for c in chunks if c.num_rows]
    got = merge_versions(
        pre, drop_tombstones=True, policy="coalesce"
    ).to_pandas()
    whole = coalesce_collapse(t, True).to_pandas()
    want = _coalesce_oracle(t)
    cols = ["conv_id", "turn_idx", "role", "text"]
    for frame in (got, whole):
        out = (
            frame[cols]
            .sort_values(["conv_id", "turn_idx"])
            .reset_index(drop=True)
            .astype({"turn_idx": "int64"})
        )
        pd.testing.assert_frame_equal(out, want)
