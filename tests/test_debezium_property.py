"""Property-based check (hypothesis): for ANY small change stream and
ANY export plan (random window splits, optional bootstrap snapshot at a
random pin), exporting table A as Debezium JSONL and importing the
directory into a fresh table B reproduces A's final state row for row.
This is the flagship interop invariant — the windows partition the
epoch range arbitrarily, the snapshot (when present) becomes the import
base and covered dirs are skipped, and replayed seqs drop at the sink
watermark."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from xgeo_ray import fixtures as fx
from xgeo_ray.pipelines import ingest as ing
from xgeo_ray.pipelines import ivm
from xgeo_ray.schemas import CHANGE_EVENTS_SCHEMA
from xgeo_ray.state.delta_table import DeltaTable

plan_strategy = st.tuples(
    st.lists(  # events: (op, conv, turn, ts bucket)
        st.tuples(
            st.sampled_from(["I", "U", "D"]),
            st.integers(0, 3),
            st.integers(0, 2),
            st.integers(0, 4),
        ),
        min_size=4,
        max_size=40,
    ),
    st.integers(2, 4),  # ingest epochs
    st.data(),
)


def _build(events) -> pa.Table:
    n = len(events)
    return pa.table(
        {
            "seq": pa.array(range(n), pa.int64()),
            "op": pa.array([e[0] for e in events]),
            "conv_id": pa.array([f"c{e[1]}" for e in events]),
            "turn_idx": pa.array([e[2] for e in events], pa.int32()),
            "role": pa.array(["user"] * n),
            "text": pa.array([f"t-{i}" for i in range(n)]),
            "tool": pa.array([""] * n),
            "ts": pa.array(
                [fx.BASE_TS_US + e[3] * 1000 for e in events], pa.int64()
            ).cast(pa.timestamp("us")),
        },
        schema=CHANGE_EVENTS_SCHEMA,
    )


def _state(t) -> pd.DataFrame:
    cols = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    # reindex, not [cols]: Ray renders all-empty block lists as a
    # column-less DataFrame (an empty final state is a legal outcome
    # hypothesis found — all keys deleted)
    return (
        ing.snapshot(t)
        .to_pandas()
        .reindex(columns=cols)
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )


@pytest.mark.usefixtures("ray_session")
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(plan_strategy)
def test_debezium_export_import_roundtrip_property(tmp_path_factory, plan):
    events, n_epochs, data = plan
    root = str(tmp_path_factory.mktemp("dbzprop"))
    table = _build(events)
    # split the stream into n_epochs segments at random cut points
    n = table.num_rows
    cuts = sorted(
        data.draw(
            st.lists(
                st.integers(1, max(1, n - 1)),
                min_size=n_epochs - 1,
                max_size=n_epochs - 1,
            )
        )
    )
    segs = []
    prev = 0
    for k, c in enumerate([*cuts, n]):
        if c <= prev:
            continue
        p = f"{root}/wal/segment-{k:05d}.parquet"
        import os

        os.makedirs(f"{root}/wal", exist_ok=True)
        pq.write_table(table.slice(prev, c - prev), p)
        segs.append(p)
        prev = c
    src = DeltaTable.create(f"{root}/src", num_partitions=2, num_salts=1)
    ing.run_stream(src, segs, segments_per_epoch=1)
    latest = src.latest_epoch()

    # export plan: optional bootstrap at a random committed pin, then
    # cover (pin, latest] with random consecutive windows
    out = f"{root}/dbz"
    use_boot = data.draw(st.booleans())
    start = 0
    if use_boot:
        pin = data.draw(st.integers(1, latest))
        ivm.export_debezium(src, out, bootstrap=True, upto_epoch=pin)
        start = pin
    e = start
    while e < latest:
        upto = data.draw(st.integers(e + 1, latest))
        ivm.export_debezium(src, out, since_epoch=e, upto_epoch=upto)
        e = upto

    groups = ivm.debezium_to_segments(out, f"{root}/dwal")
    dst = DeltaTable.create(f"{root}/dst", num_partitions=2, num_salts=1)
    if groups:
        ing.run_stream(dst, [], segment_groups=groups)
    pd.testing.assert_frame_equal(_state(dst), _state(src), check_dtype=False)
