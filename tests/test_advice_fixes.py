"""Regression tests for the round-1 advisory findings (ADVICE.md):

1. bootstrap_base on a table with committed WAL epochs must keep ALL base
   rows (live watermarks used to drop them partition-dependently).
2. tail() must ingest every format read_segment supports, including
   .zst/.bz2-compressed segments (the old allowlist skipped them).
3. Unsupported envelope types fail at PLAN time, before the epoch's
   read/shuffle/write — and leave no partial state behind.
4. durability="commit" round-trips through _table.json and ingests fine.
"""

import json
import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from xgeo_ray import fixtures as fx
from xgeo_ray.pipelines import ingest as ing
from xgeo_ray.sources.wal import is_supported_segment
from xgeo_ray.state.delta_table import DeltaTable

N_CONVS, TURNS = 10, 6


def test_bootstrap_after_committed_epochs_keeps_base_rows(tmp_path):
    """The data-loss scenario: WAL epochs first (watermarks >= 0 in some
    partitions), bootstrap second. Final state must equal the
    order-independent LWW merge of base + events."""
    base = fx.make_transcripts(N_CONVS, TURNS)
    base_path = str(tmp_path / "base.parquet")
    pq.write_table(base, base_path)
    events = fx.make_change_events(400, n_convs=N_CONVS, turns_per_conv=TURNS)
    segs = fx.write_segments(events, str(tmp_path / "wal"), n_segments=2)

    table = DeltaTable.create(str(tmp_path / "tbl"), num_partitions=8, num_salts=2)
    ing.run_stream(table, segs, segments_per_epoch=2)  # watermarks now >= 0
    assert (table.watermarks() >= 0).any()
    ing.bootstrap_base(table, base_path)

    got = (
        ing.snapshot(table)
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    want = fx.naive_final_state(base, events).to_pandas()
    pd.testing.assert_frame_equal(got[want.columns.tolist()], want)
    # specifically: base keys untouched by any event must all be present
    ev_keys = set(
        zip(events.column("conv_id").to_pylist(), events.column("turn_idx").to_pylist())
    )
    base_only = [
        k
        for k in zip(
            base.column("conv_id").to_pylist(), base.column("turn_idx").to_pylist()
        )
        if k not in ev_keys
    ]
    got_keys = set(zip(got["conv_id"], got["turn_idx"]))
    assert base_only and all(k in got_keys for k in base_only)


def test_tail_ingests_zst_segment(tmp_path):
    """A .jsonl.zst WAL segment in a tailed directory must be ingested."""
    events = fx.make_change_events(200, n_convs=N_CONVS, turns_per_conv=TURNS)
    wal = tmp_path / "wal"
    wal.mkdir()
    # first 100 rows as plain parquet, rest as zstd-compressed JSONL
    pq.write_table(events.slice(0, 100), str(wal / "seg-0.parquet"))
    rest = events.slice(100)
    rows = rest.to_pylist()
    payload = (
        "\n".join(json.dumps({**r, "ts": r["ts"].isoformat()}) for r in rows) + "\n"
    ).encode()
    with pa.output_stream(str(wal / "seg-1.jsonl.zst"), compression="zstd") as f:
        f.write(payload)

    assert is_supported_segment("seg-1.jsonl.zst")
    table = DeltaTable.create(str(tmp_path / "tbl"), num_partitions=4, num_salts=1)
    ms = ing.tail(
        table, str(wal), poll_interval_s=0.05, idle_polls_to_stop=2, stable_for_s=0.0
    )
    assert sum(m.totals["events_read"] for m in ms) == events.num_rows
    done = table.committed_segments()
    assert any(p.endswith(".jsonl.zst") for p in done)
    want = fx.naive_final_state(None, events)
    got = (
        ing.snapshot(table)
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    assert got["text"].tolist() == want.column("text").to_pylist()


def test_unsupported_envelope_fails_at_plan_time(tmp_path):
    """A segment with a type the manifest cannot record (a map — lists
    and structs became legal payloads in rounds 4/5) must raise BEFORE
    any shuffle/write."""
    bad = pa.table(
        {
            "seq": pa.array([1], pa.int64()),
            "op": pa.array(["I"]),
            "conv_id": pa.array(["c1"]),
            "turn_idx": pa.array([0], pa.int32()),
            "ts": pa.array([0], pa.timestamp("us")),
            "tags": pa.array(
                [[("k", 1)]], pa.map_(pa.string(), pa.int64())
            ),  # unsupported leaf
        }
    )
    seg = str(tmp_path / "bad.parquet")
    pq.write_table(bad, seg)
    table = DeltaTable.create(str(tmp_path / "tbl"), num_partitions=4, num_salts=1)
    with pytest.raises(TypeError, match="unsupported envelope"):
        ing.ingest_segments(table, [seg])
    # plan-time failure leaves nothing behind: no manifests, no deltas
    assert table.latest_epoch() == 0
    assert not os.path.isdir(os.path.join(table.root, "parts"))


def test_durability_commit_mode_roundtrip(tmp_path):
    table = DeltaTable.create(
        str(tmp_path / "tbl"), num_partitions=4, num_salts=1, durability="commit"
    )
    assert DeltaTable.open(table.root).durability == "commit"
    events = fx.make_change_events(150, n_convs=N_CONVS, turns_per_conv=TURNS)
    segs = fx.write_segments(events, str(tmp_path / "wal"), n_segments=1)
    ing.run_stream(table, segs)
    want = fx.naive_final_state(None, events)
    assert ing.snapshot(table).count() == want.num_rows
    with pytest.raises(ValueError):
        DeltaTable.create(str(tmp_path / "t2"), durability="nope")


def test_manifest_cache_sees_new_commits(tmp_path):
    """The immutable-manifest parse cache must never hide NEW commits
    (the listing is re-scanned every call; only parsing is cached) and
    must agree with a cache-cold instance."""
    events = fx.make_change_events(200, n_convs=6, turns_per_conv=4)
    segs = fx.write_segments(events, str(tmp_path / "wal"), n_segments=4)
    table = DeltaTable.create(str(tmp_path / "t"), num_partitions=4, num_salts=1)
    ing.run_stream(table, segs[:2], segments_per_epoch=1)
    assert table.latest_epoch() == 2
    assert len(table._manifest_cache) == 2  # parsed once, cached
    ing.run_stream(table, segs, segments_per_epoch=2)  # one more epoch
    assert table.latest_epoch() == 3
    fresh = DeltaTable.open(table.root)
    assert [m.epoch for m in table.manifests()] == [
        m.epoch for m in fresh.manifests()
    ]
    assert (table.watermarks() == fresh.watermarks()).all()


def test_manifest_commit_is_exclusive(tmp_path):
    """Two writers racing to commit the SAME epoch: exactly one wins; the
    loser raises instead of silently overwriting the fence."""
    from xgeo_ray.state.manifest import Manifest, write_manifest

    root = str(tmp_path)
    m1 = Manifest(epoch=1, kind="delta", totals={"marker": 1})
    m2 = Manifest(epoch=1, kind="delta", totals={"marker": 2})
    write_manifest(root, m1)
    with pytest.raises(FileExistsError):
        write_manifest(root, m2)
    from xgeo_ray.state.manifest import read_manifests

    got = read_manifests(root)
    assert len(got) == 1 and got[0].totals["marker"] == 1
    # no tmp litter left behind
    leftovers = [
        n for n in os.listdir(os.path.join(root, "manifests")) if ".tmp" in n
    ]
    assert leftovers == []


def test_invalid_rows_counted_in_manifest_totals(tmp_path):
    """Malformed rows (null key / unknown op) are dropped by the
    normalizer AND surfaced in the committed manifest's totals["invalid"]
    — previously they vanished silently (round-2 verdict, What's wrong
    #3). The count is epoch-level: an invalid row may have a null key,
    so it has no partition to charge."""
    import numpy as np

    events = fx.make_change_events(300, n_convs=N_CONVS, turns_per_conv=TURNS)
    conv = events.column("conv_id").to_pylist()
    op = events.column("op").to_pylist()
    conv[3] = None  # null key
    conv[17] = None
    op[42] = "X"  # unknown op
    events = events.set_column(
        events.schema.get_field_index("conv_id"), "conv_id", pa.array(conv)
    )
    events = events.set_column(
        events.schema.get_field_index("op"), "op", pa.array(op)
    )
    segs = fx.write_segments(events, str(tmp_path / "wal"), n_segments=2)
    table = DeltaTable.create(str(tmp_path / "tbl"), num_partitions=4, num_salts=1)

    # ingest_segments path
    m = ing.ingest_segments(table, segs)
    assert m.totals["invalid"] == 3
    assert m.totals["events_read"] == events.num_rows

    # pipelined run_stream path, fresh table
    table2 = DeltaTable.create(str(tmp_path / "tbl2"), num_partitions=4, num_salts=1)
    ms = ing.run_stream(table2, segs, segments_per_epoch=1)
    assert sum(mm.totals.get("invalid", 0) for mm in ms) == 3


def test_parquet_codec_policy(tmp_path, ray_session):
    """Table-policy compression: deltas AND compaction outputs write
    with the declared codec; default stays snappy; typos fail at
    declare time; reshard carries the policy."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from xgeo_ray import fixtures as fx
    from xgeo_ray.pipelines import ingest as ing
    from xgeo_ray.state.delta_table import DeltaTable

    ev = fx.make_change_events(300, n_convs=20, turns_per_conv=5,
                               dup_fraction=0.0, seed=61)
    seg = str(tmp_path / "w.parquet")
    pq.write_table(ev, seg)

    with pytest.raises(Exception):
        DeltaTable.create(str(tmp_path / "bad"), parquet_codec="zsdt")
    # (out-of-range LEVELS are clamped by the codec lib, not an error)

    root = str(tmp_path / "t")
    table = DeltaTable.create(
        root, num_partitions=2, num_salts=1, parquet_codec="zstd:3"
    )
    ing.ingest_segments(table, [seg])
    table = DeltaTable.open(root)

    def codecs_of(files):
        out = set()
        for f in files:
            md = pq.ParquetFile(f).metadata
            for g in range(md.num_row_groups):
                out.add(md.row_group(g).column(0).compression)
        return out

    deltas = [
        os.path.join(root, e.path)
        for m in table.manifests()
        for e in m.partitions.values()
        if e.path
    ]
    assert codecs_of(deltas) == {"ZSTD"}

    ing.compact(table)
    table = DeltaTable.open(root)
    folded = [
        os.path.join(root, p)
        for chain in table.partition_chain_files().values()
        for p in chain
    ] or [
        os.path.join(root, e.path)
        for e in table.manifests()[-1].partitions.values()
        if e.path
    ]
    assert codecs_of(folded) == {"ZSTD"}

    # snapshot parity is unaffected by the codec
    snap = ing.snapshot(table).to_pandas()
    import pandas as pd

    want = fx.naive_final_state(None, ev).to_pandas()
    got = snap.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    want = want.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[want.columns.tolist()], want, check_dtype=False
    )

    # reshard carries the policy; default tables stay snappy
    new = ing.reshard(table, str(tmp_path / "t4"), num_partitions=4)
    assert new.parquet_codec() == "zstd:3"
    plain = DeltaTable.create(str(tmp_path / "p"), num_partitions=2,
                              num_salts=1)
    ing.ingest_segments(plain, [seg])
    plain = DeltaTable.open(str(tmp_path / "p"))
    pd_deltas = [
        os.path.join(plain.root, e.path)
        for m in plain.manifests()
        for e in m.partitions.values()
        if e.path
    ]
    assert codecs_of(pd_deltas) == {"SNAPPY"}
