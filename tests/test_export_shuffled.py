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

    # a different salt is a genuinely different permutation — not a
    # TRANSLATED one: an additive salt preserves the cyclic sort order
    # (same row neighborhoods every "epoch"), so check that consecutive
    # pairs from the salt-0 order are almost never consecutive under
    # salt 1 (a rotation would preserve nearly all of them)
    out3 = f"{tmp_path}/shards3"
    ing.export_shuffled(table, out3, num_shards=4, salt=1)
    other = _read_all(out3)

    def successor_map(shard_dfs):
        succ = {}
        for df in shard_dfs.values():
            ids = list(zip(df.conv_id, df.turn_idx))
            succ.update(zip(ids, ids[1:]))
        return succ

    s0, s1 = successor_map(shards), successor_map(other)
    preserved = sum(1 for k, v in s0.items() if s1.get(k) == v)
    assert preserved / len(s0) < 0.10, f"salt barely reshuffles: {preserved}/{len(s0)}"


def test_export_shuffled_writes_empty_shards(tmp_path):
    """More shards than rows: every shard file must still exist (a
    training job globs num_shards files; and without them the resume
    fast-path can never engage — each rerun re-shuffles everything)."""
    events = fx.make_change_events(
        40, n_convs=3, turns_per_conv=2, dup_fraction=0.0
    )
    segs = fx.write_segments(events, f"{tmp_path}/wal", n_segments=1)
    table = DeltaTable.create(f"{tmp_path}/t", num_partitions=2, num_salts=1)
    ing.run_stream(table, segs)
    out = f"{tmp_path}/shards"
    got = ing.export_shuffled(table, out, num_shards=64)
    assert len(glob.glob(f"{out}/shard-*.parquet")) == 64
    assert got["written"] == 64
    again = ing.export_shuffled(table, out, num_shards=64)
    assert again["skipped"] == 64 and again["written"] == 0


def test_export_shuffled_rejects_mismatched_resume(tmp_path):
    """Resuming an export dir with a different salt / shard count would
    silently corrupt shard membership (rows dropped into 'done' shards,
    others duplicated) — the recorded shuffle spec must refuse."""
    import pytest

    table = _mk(str(tmp_path))
    out = f"{tmp_path}/shards"
    ing.export_shuffled(table, out, num_shards=4)
    with pytest.raises(ValueError, match="different shuffle spec"):
        ing.export_shuffled(table, out, num_shards=4, salt=1)
    with pytest.raises(ValueError, match="different shuffle spec"):
        ing.export_shuffled(table, out, num_shards=8)


def test_export_shuffled_column_pruning(tmp_path):
    table = _mk(str(tmp_path))
    out = f"{tmp_path}/narrow"
    ing.export_shuffled(table, out, num_shards=2, columns=["conv_id", "role"])
    one = pq.read_table(sorted(glob.glob(f"{out}/*.parquet"))[0])
    assert set(one.column_names) == {"conv_id", "turn_idx", "role"}


def test_export_shuffled_jsonl(tmp_path):
    """fmt='jsonl.gz': same rows, same deterministic per-shard order as
    the parquet export with the same salt; format pinned in the meta."""
    import gzip
    import json

    import pytest

    table = _mk(str(tmp_path))
    pq_dir = f"{tmp_path}/shards_pq"
    jl_dir = f"{tmp_path}/shards_jl"
    ing.export_shuffled(table, pq_dir, num_shards=3, salt=5)
    got = ing.export_shuffled(table, jl_dir, num_shards=3, salt=5, fmt="jsonl.gz")
    assert got["written"] == 3
    for s in range(3):
        with gzip.open(f"{jl_dir}/shard-{s:05d}.jsonl.gz", "rt") as f:
            rows = [json.loads(line) for line in f]
        want = pq.read_table(f"{pq_dir}/shard-{s:05d}.parquet").to_pandas()
        assert [r["conv_id"] for r in rows] == want["conv_id"].tolist()
        assert [r["turn_idx"] for r in rows] == want["turn_idx"].tolist()
    # a second run is a full skip (all shard files exist)
    again = ing.export_shuffled(table, jl_dir, num_shards=3, salt=5, fmt="jsonl.gz")
    assert again["skipped"] == 3 and again["written"] == 0
    # resuming the SAME dir with a different fmt refuses
    with pytest.raises(ValueError, match="different"):
        ing.export_shuffled(table, jl_dir, num_shards=3, salt=5, fmt="jsonl")


def test_jsonl_shards_base64_binary(tmp_path):
    """Binary payload columns in JSONL shards are base64 strings, not
    the lossy Python bytes repr json.dumps(default=str) would emit."""
    import base64
    import json as _json

    import pyarrow as pa
    import pyarrow.parquet as pq

    from xgeo_ray import fixtures as fx
    from xgeo_ray.pipelines import ingest as ing
    from xgeo_ray.state.delta_table import DeltaTable

    events = fx.make_change_events(200, n_convs=4, turns_per_conv=3)
    blob = pa.array(
        [bytes([i % 256, 255]) if i % 4 else None for i in range(events.num_rows)],
        pa.binary(),
    )
    events = events.append_column("media", blob)
    os.makedirs(tmp_path / "wal")
    seg = str(tmp_path / "wal" / "segment-00000.parquet")
    pq.write_table(events, seg)
    t = DeltaTable.create(str(tmp_path / "t"), num_partitions=2)
    ing.run_stream(t, [seg])
    out = str(tmp_path / "shards")
    ing.export_shuffled(t, out, num_shards=2, fmt="jsonl")
    want = {
        (r["conv_id"], r["turn_idx"]): r["media"]
        for r in ing.snapshot(t).to_pandas().to_dict("records")
    }
    seen = 0
    for name in sorted(os.listdir(out)):
        if not name.endswith(".jsonl"):
            continue
        with open(os.path.join(out, name)) as f:
            for line in f:
                r = _json.loads(line)
                w = want[(r["conv_id"], r["turn_idx"])]
                if r["media"] is None:
                    assert w is None or (w != w)  # null stays null
                else:
                    assert base64.b64decode(r["media"]) == w
                    seen += 1
    assert seen > 0
