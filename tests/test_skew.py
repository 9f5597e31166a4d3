"""Hot-key skew (FIXTURES.md §4): one conversation holding ~30% of events,
split across partitions by salted sub-keys, with parity preserved."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from xgeo_ray import fixtures as fx
from xgeo_ray.pipelines import ingest as ing
from xgeo_ray.state.delta_table import DeltaTable


def test_skewed_stream_parity_and_spread(tmp_path):
    root = str(tmp_path)
    base = fx.make_transcripts(16, 6)
    pq.write_table(base, f"{root}/base.parquet")
    ev = fx.make_change_events(
        3000, n_convs=16, turns_per_conv=6, dup_fraction=0.02, hot_conv_fraction=0.3
    )
    conv = np.array(ev.column("conv_id").to_pylist())
    assert (conv == "conv-000000").mean() > 0.25  # the stream really is skewed

    segs = fx.write_segments(ev, f"{root}/wal", n_segments=4)
    table = DeltaTable.create(f"{root}/t", num_partitions=8, num_salts=4)
    ing.bootstrap_base(table, f"{root}/base.parquet")
    manifests = ing.run_stream(table, segs, segments_per_epoch=2)

    # the hot conversation's rows spread over multiple partitions
    hot_parts = set()
    for part, files in table.partition_files().items():
        for f in files:
            t = pq.read_table(f, columns=["conv_id"])
            if "conv-000000" in set(t.column("conv_id").to_pylist()):
                hot_parts.add(part)
    assert len(hot_parts) >= 3, f"hot conv only on partitions {hot_parts}"

    # no partition received a grossly dominant share of applied rows
    applied = {}
    for m in manifests:
        for k, e in m.partitions.items():
            applied[k] = applied.get(k, 0) + e.rows_in
    shares = np.array(list(applied.values())) / sum(applied.values())
    assert shares.max() < 0.5

    # and parity still holds
    got = (
        ing.snapshot(table)
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    want = fx.naive_final_state(base, ev).to_pandas()
    pd.testing.assert_frame_equal(got[want.columns.tolist()], want)


def test_unsalted_vs_salted_same_result(tmp_path):
    root = str(tmp_path)
    ev = fx.make_change_events(800, n_convs=6, turns_per_conv=5, hot_conv_fraction=0.3)
    segs = fx.write_segments(ev, f"{root}/wal", n_segments=2)
    t1 = DeltaTable.create(f"{root}/t1", num_partitions=6, num_salts=1)
    t2 = DeltaTable.create(f"{root}/t2", num_partitions=6, num_salts=6)
    ing.run_stream(t1, segs)
    ing.run_stream(t2, segs)
    a = ing.snapshot(t1).to_pandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    b = ing.snapshot(t2).to_pandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
