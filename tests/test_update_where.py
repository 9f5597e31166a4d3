"""Distributed predicate updates (``ingest.update_where``): rewrite the
payload of every key whose current merged row matches, exactly-once by
batch_id, full-row LWW replacement images through the oob machinery."""

import glob

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from xgeo_ray import fixtures as fx
from xgeo_ray.pipelines import ingest as ing
from xgeo_ray.state.delta_table import DeltaTable


def _df(ds):
    return (
        ds.to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )


def _mk(root, merge_policy="lww"):
    import os

    os.makedirs(root, exist_ok=True)
    base = fx.make_transcripts(10, 6)
    pq.write_table(base, f"{root}/base.parquet")
    events = fx.make_change_events(
        800, n_convs=10, turns_per_conv=6, dup_fraction=0.0
    )
    segs = fx.write_segments(events, f"{root}/wal", n_segments=2)
    table = DeltaTable.create(
        f"{root}/table", num_partitions=4, num_salts=2,
        merge_policy=merge_policy,
    )
    if merge_policy == "lww":
        ing.bootstrap_base(table, f"{root}/base.parquet")
        ing.run_stream(table, segs, segments_per_epoch=1)
    return table


def test_update_where_scalar_set(tmp_path):
    table = _mk(str(tmp_path))
    before = _df(ing.snapshot(table))
    assert (before["role"] == "tool").any()

    m = ing.update_where(
        table,
        lambda t: pc.equal(t.column("role"), "tool"),
        {"text": "[tool output redacted]", "tool": None},
        batch_id="redact-1",
        ts_us=9_999_999_999_000_000,
    )
    assert m is not None
    got = _df(ing.snapshot(table))
    want = before.copy()
    hit = want["role"] == "tool"
    want.loc[hit, "text"] = "[tool output redacted]"
    want.loc[hit, "tool"] = None
    want.loc[hit, "ts"] = pd.Timestamp(9_999_999_999_000_000, unit="us")
    pd.testing.assert_frame_equal(got, want)

    # exactly-once: same batch_id is a committed no-op
    assert (
        ing.update_where(
            table,
            lambda t: pc.equal(t.column("role"), "tool"),
            {"text": "other"},
            batch_id="redact-1",
        )
        is None
    )
    # stream replay protection untouched (out-of-band seq=-1)
    before_epoch = table.latest_epoch()
    segs = sorted(glob.glob(f"{tmp_path}/wal/*.parquet"))
    ing.run_stream(table, segs, segments_per_epoch=1)
    assert table.latest_epoch() == before_epoch


def test_update_where_computed_set(tmp_path):
    table = _mk(str(tmp_path))
    before = _df(ing.snapshot(table))

    def upper_user_text(rows: pa.Table):
        return {"text": pc.utf8_upper(rows.column("text"))}

    ing.update_where(
        table,
        lambda t: pc.equal(t.column("role"), "user"),
        upper_user_text,
        batch_id="up-1",
        ts_us=9_999_999_999_000_000,
    )
    got = _df(ing.snapshot(table))
    hit = before["role"] == "user"
    assert (got.loc[hit, "text"] == before.loc[hit, "text"].str.upper()).all()
    # untouched columns ride along on the full image
    assert (got.loc[hit, "role"] == "user").all()
    pd.testing.assert_frame_equal(
        got.loc[~hit].reset_index(drop=True),
        before.loc[~hit].reset_index(drop=True),
    )


def test_update_where_validation(tmp_path):
    table = _mk(str(tmp_path))
    with pytest.raises(ValueError, match="identity"):
        ing.update_where(table, lambda t: None, {"conv_id": "x"}, batch_id="b1")
    with pytest.raises(ValueError, match="stamped"):
        ing.update_where(table, lambda t: None, {"ts": 0}, batch_id="b2")
    with pytest.raises(ValueError, match="not in the table envelope"):
        ing.update_where(table, lambda t: None, {"nope": 1}, batch_id="b3")
    with pytest.raises(ValueError, match="at least one"):
        ing.update_where(table, lambda t: None, {}, batch_id="b4")
    with pytest.raises(ValueError, match="dict or a callable"):
        ing.update_where(table, lambda t: None, "text", batch_id="b5")
    add = _mk(str(tmp_path) + "/a", merge_policy="additive")
    with pytest.raises(ValueError, match="merge_policy='lww'"):
        ing.update_where(add, lambda t: None, {"text": "x"}, batch_id="b6")


def test_update_where_empty_match_exactly_once(tmp_path):
    table = _mk(str(tmp_path))
    before = _df(ing.snapshot(table))
    m = ing.update_where(
        table,
        lambda t: pc.equal(t.column("role"), "no-such-role"),
        {"text": "x"},
        batch_id="none-1",
    )
    assert m is not None
    pd.testing.assert_frame_equal(_df(ing.snapshot(table)), before)
    assert (
        ing.update_where(
            table,
            lambda t: pc.equal(t.column("role"), "no-such-role"),
            {"text": "x"},
            batch_id="none-1",
        )
        is None
    )


def test_cli_update(tmp_path, capsys):
    import json

    from xgeo_ray.__main__ import main

    table = _mk(str(tmp_path))
    before = _df(ing.snapshot(table))
    n_tool = int((before["role"] == "tool").sum())
    assert (
        main(
            [
                "update", table.root, "role", "tool",
                "--set", "text=[redacted]",
                "--batch-id", "cli-u1",
            ]
        )
        in (0, None)
    )
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["updated"] == n_tool
    got = _df(ing.snapshot(table))
    assert (got.loc[got["role"] == "tool", "text"] == "[redacted]").all()
    # bad set column fails fast driver-side
    with pytest.raises(SystemExit):
        main(
            [
                "update", table.root, "role", "tool",
                "--set", "nope=1", "--batch-id", "cli-u2",
            ]
        )


def test_later_stream_event_supersedes_update(tmp_path):
    table = _mk(str(tmp_path))
    snap = _df(ing.snapshot(table))
    victim_conv = snap["conv_id"].iloc[0]
    victim_turn = int(snap["turn_idx"].iloc[0])
    ing.update_where(
        table,
        lambda t: pc.and_(
            pc.equal(t.column("conv_id"), victim_conv),
            pc.equal(t.column("turn_idx"), pa.scalar(victim_turn, pa.int32())),
        ),
        {"text": "updated"},
        batch_id="u1",
        ts_us=9_999_999_999_000_000,
    )
    got = _df(ing.snapshot(table))
    row = got[(got.conv_id == victim_conv) & (got.turn_idx == victim_turn)]
    assert row["text"].iloc[0] == "updated"
    # a correction stamped LATER supersedes the update (upsert semantics)
    rows = pa.table(
        {
            "conv_id": [victim_conv],
            "turn_idx": pa.array([victim_turn], pa.int64()),
            "role": ["user"],
            "text": ["newer"],
        }
    )
    ing.apply_changes(
        table, rows, batch_id="fix-1", ts_us=9_999_999_999_000_001
    )
    got = _df(ing.snapshot(table))
    row = got[(got.conv_id == victim_conv) & (got.turn_idx == victim_turn)]
    assert len(row) == 1 and row["text"].iloc[0] == "newer"
