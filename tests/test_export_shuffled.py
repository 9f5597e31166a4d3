"""Deterministic shuffled training-shard export (ingest.export_shuffled):
reproducible global order, resumable per shard, fresh order per salt."""

import glob
import os

import pandas as pd
import pyarrow.parquet as pq

from xgeo_ray import fixtures as fx
from xgeo_ray.pipelines import ingest as ing
from xgeo_ray.state.delta_table import DeltaTable


def _mk(root):
    events = fx.make_change_events(
        700, n_convs=12, turns_per_conv=5, dup_fraction=0.0
    )
    segs = fx.write_segments(events, f"{root}/wal", n_segments=2)
    table = DeltaTable.create(f"{root}/t", num_partitions=4, num_salts=2)
    ing.run_stream(table, segs, segments_per_epoch=2)
    return table


def _read_all(out_dir):
    return {
        os.path.basename(p): pq.read_table(p).to_pandas()
        for p in sorted(glob.glob(f"{out_dir}/shard-*.parquet"))
    }


def test_export_shuffled_roundtrip_resume_and_salt(tmp_path):
    table = _mk(str(tmp_path))
    out = f"{tmp_path}/shards"
    got = ing.export_shuffled(table, out, num_shards=4)
    assert got["written"] + got["skipped"] == 4 and got["skipped"] == 0

    shards = _read_all(out)
    union = pd.concat(shards.values(), ignore_index=True)
    want = ing.snapshot(table).to_pandas()
    k = ["conv_id", "turn_idx"]
    pd.testing.assert_frame_equal(
        union.sort_values(k).reset_index(drop=True)[want.columns.tolist()],
        want.sort_values(k).reset_index(drop=True),
    )
    assert got["rows_written"] == len(want)

    # deterministic: a second export to a fresh dir is byte-identical order
    out2 = f"{tmp_path}/shards2"
    ing.export_shuffled(table, out2, num_shards=4)
    for name, df in _read_all(out2).items():
        pd.testing.assert_frame_equal(df, shards[name])

    # resumable: rerun skips everything; delete one file -> only it rewrites
    again = ing.export_shuffled(table, out, num_shards=4)
    assert again == {"shards": 4, "written": 0, "skipped": 4, "rows_written": 0}
    victim = f"{out}/shard-00002.parquet"
    os.remove(victim)
    third = ing.export_shuffled(table, out, num_shards=4)
    assert third["written"] == 1 and third["skipped"] == 3
    pd.testing.assert_frame_equal(
        pq.read_table(victim).to_pandas(), shards["shard-00002.parquet"]
    )

    # a different salt is a genuinely different permutation
    out3 = f"{tmp_path}/shards3"
    ing.export_shuffled(table, out3, num_shards=4, salt=1)
    other = _read_all(out3)
    assert any(
        not shards[n].equals(other.get(n, pd.DataFrame())) for n in shards
    )


def test_export_shuffled_column_pruning(tmp_path):
    table = _mk(str(tmp_path))
    out = f"{tmp_path}/narrow"
    ing.export_shuffled(table, out, num_shards=2, columns=["conv_id", "role"])
    one = pq.read_table(sorted(glob.glob(f"{out}/*.parquet"))[0])
    assert set(one.column_names) == {"conv_id", "turn_idx", "role"}
