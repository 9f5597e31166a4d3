"""Incremental assembled-conversations maintenance (ingest.sync_assembled).

The sink must equal the batch assemble_conversations over the source's
final state after ANY sync cadence; only touched conversations
re-assemble per sync; fully-deleted conversations tombstone their doc;
a repeated sync is a no-op (consumer cursor + batch id)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from xgeo_ray import fixtures as fx
from xgeo_ray.pipelines import ingest as ing
from xgeo_ray.schemas import ASSEMBLED_SCHEMA
from xgeo_ray.state.delta_table import DeltaTable


def _df(ds_or_tbl, cols=("conv_id", "n_turns", "doc")):
    df = (
        ds_or_tbl.to_pandas()
        if hasattr(ds_or_tbl, "to_pandas")
        else ds_or_tbl
    )
    return (
        df[list(cols)].sort_values("conv_id").reset_index(drop=True)
    )


def test_sync_assembled_follows_source(tmp_path):
    root = str(tmp_path)
    events = fx.make_change_events(1200, n_convs=12, turns_per_conv=6)
    segs = fx.write_segments(events, f"{root}/wal", n_segments=4)
    src = DeltaTable.create(f"{root}/src", num_partitions=8, num_salts=2)
    sink = DeltaTable.create(
        f"{root}/sink",
        num_partitions=4,
        num_salts=1,
        base_schema=ASSEMBLED_SCHEMA,
    )
    ing.run_stream(src, segs[:2], segments_per_epoch=1)  # epochs 1-2
    st = ing.sync_assembled(src, sink)
    assert st["synced_epochs"] == 2 and st["convs"] > 0
    want = _df(ing.assemble_conversations(src))
    got = _df(ing.snapshot(sink))
    pd.testing.assert_frame_equal(got, want)

    # later epochs: only their touched convs re-assemble
    ing.run_stream(src, segs, segments_per_epoch=1)  # epochs 3-4
    st2 = ing.sync_assembled(src, sink)
    assert st2["synced_epochs"] == 2
    pd.testing.assert_frame_equal(
        _df(ing.snapshot(sink)), _df(ing.assemble_conversations(src))
    )
    # caught-up sync is a no-op
    assert ing.sync_assembled(src, sink)["synced_epochs"] == 0


def test_sync_assembled_tombstones_fully_deleted_conv(tmp_path):
    root = str(tmp_path)
    events = fx.make_change_events(600, n_convs=8, turns_per_conv=4)
    segs = fx.write_segments(events, f"{root}/wal", n_segments=1)
    src = DeltaTable.create(f"{root}/src", num_partitions=4, num_salts=2)
    sink = DeltaTable.create(
        f"{root}/sink",
        num_partitions=4,
        num_salts=1,
        base_schema=ASSEMBLED_SCHEMA,
    )
    ing.run_stream(src, segs, segments_per_epoch=1)
    ing.sync_assembled(src, sink)
    victims = (
        ing.snapshot(src)
        .to_pandas()[["conv_id", "turn_idx"]]
        .groupby("conv_id")
        .head(100)
    )
    victim = victims["conv_id"].iloc[0]
    kill = victims[victims["conv_id"] == victim]
    start = int(src.watermarks().max()) + 1
    batch = pa.table(
        {
            "seq": pa.array(np.arange(start, start + len(kill)), pa.int64()),
            "op": pa.array(["D"] * len(kill)),
            "conv_id": pa.array(kill["conv_id"], pa.string()),
            "turn_idx": pa.array(kill["turn_idx"], pa.int32()),
            "ts": pa.array(
                np.full(len(kill), 4_000_000_000_000_000), pa.timestamp("us")
            ),
        }
    )
    segs2 = fx.write_segments(batch, f"{root}/wal2", n_segments=1)
    ing.run_stream(src, segs2, segments_per_epoch=1)
    st = ing.sync_assembled(src, sink)
    assert st["deleted"] == 1
    got = _df(ing.snapshot(sink))
    assert victim not in set(got["conv_id"])
    pd.testing.assert_frame_equal(got, _df(ing.assemble_conversations(src)))


def test_assemble_convs_filter_matches_full(tmp_path):
    """assemble_conversations(convs=...) equals the full assembly
    row-filtered — the partition prune changes I/O, not results."""
    root = str(tmp_path)
    events = fx.make_change_events(800, n_convs=10, turns_per_conv=5)
    segs = fx.write_segments(events, f"{root}/wal", n_segments=1)
    src = DeltaTable.create(f"{root}/src", num_partitions=8, num_salts=2)
    ing.run_stream(src, segs)
    full = _df(ing.assemble_conversations(src))
    some = sorted(full["conv_id"].unique()[:4])
    got = _df(ing.assemble_conversations(src, convs=some))
    want = full[full["conv_id"].isin(some)].reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
    assert (
        ing.assemble_conversations(src, convs=[]).count() == 0
    )
