"""Named epoch tags (state.tags) and per-key version history
(ingest.key_history): tags are immutable named savepoints that PIN
vacuum retention; key_history is the audit view of one key's readable
committed versions.
"""

import json
import os

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from xgeo_ray import fixtures as fx
from xgeo_ray.pipelines import ingest as ing
from xgeo_ray.state import tags as tg
from xgeo_ray.state.delta_table import DeltaTable


def _mk(root, history="collapsed", n=800, n_segments=4):
    events = fx.make_change_events(n, n_convs=8, turns_per_conv=4)
    segs = fx.write_segments(events, f"{root}/wal", n_segments=n_segments)
    t = DeltaTable.create(
        f"{root}/t", num_partitions=2, num_salts=1, history=history
    )
    ing.run_stream(t, segs, segments_per_epoch=1)
    return t, events


def test_tag_lifecycle(tmp_path):
    t, _ = _mk(str(tmp_path))
    assert tg.tag(t, "rel-1", epoch=2) == 2
    assert tg.tag(t, "head") == 4  # default: latest
    assert tg.tags(t) == {"head": 4, "rel-1": 2}
    assert tg.resolve(t, "rel-1") == 2
    assert tg.tag(t, "rel-1", epoch=2) == 2  # idempotent at same epoch
    with pytest.raises(ValueError, match="never move"):
        tg.tag(t, "rel-1", epoch=3)
    with pytest.raises(ValueError, match="not a committed epoch"):
        tg.tag(t, "future", epoch=9)
    with pytest.raises(ValueError, match="filesystem-safe"):
        tg.tag(t, "../evil")
    assert tg.delete_tag(t, "rel-1")
    assert not tg.delete_tag(t, "rel-1")
    with pytest.raises(KeyError):
        tg.resolve(t, "rel-1")


def test_tag_pins_vacuum_retention(tmp_path):
    t, _ = _mk(str(tmp_path))
    want2 = (
        ing.snapshot(t, as_of_epoch=2)
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    tg.tag(t, "pin", epoch=2)
    ing.compact(t)
    st = ing.vacuum(t)
    # the tagged epoch's files survived: the snapshot still reads
    got = (
        ing.snapshot(t, as_of_epoch=2)
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want2)
    # dropping the tag releases the pin: the next vacuum reclaims more
    tg.delete_tag(t, "pin")
    st2 = ing.vacuum(t)
    assert st2["deleted"] > 0 or st["deleted"] == 0
    with pytest.raises(Exception):
        ing.snapshot(t, as_of_epoch=2).to_pandas()


def test_key_history_full_fidelity(tmp_path):
    t, events = _mk(str(tmp_path), history="full")
    df = events.to_pandas().drop_duplicates(subset=["seq"])
    key_counts = df.groupby(["conv_id", "turn_idx"]).size()
    conv, turn = key_counts.idxmax()  # most-written key
    h = ing.key_history(t, conv, turn_idx=int(turn)).to_pandas()
    own = df[(df["conv_id"] == conv) & (df["turn_idx"] == turn)].sort_values(
        "seq"
    )
    # full-history tables retain every distinct (key, seq) version
    assert list(h["seq"]) == list(own["seq"])
    assert list(h["op"]) == list(own["op"])  # tombstones visible
    assert (h["_epoch"] > 0).all() and not h["_folded"].any()
    # the last non-delete version equals the merged lookup winner
    cur = ing.lookup(t, conv, turn_idx=int(turn)).to_pandas()
    last = h.iloc[-1]
    if last["op"] == "D":
        assert len(cur) == 0
    else:
        assert len(cur) == 1 and cur["text"].iloc[0] == last["text"]

    # a MINOR compaction on a FULL table is version-preserving: same
    # history, now served from folded chain files (a FULL compact folds
    # to winners — that is the history horizon, by design)
    ing.compact(t, minor=True)
    h2 = ing.key_history(t, conv, turn_idx=int(turn)).to_pandas()
    assert list(h2["seq"]) == list(h["seq"])
    assert h2["_folded"].all()
    ing.compact(t)
    h3 = ing.key_history(t, conv, turn_idx=int(turn)).to_pandas()
    # one folded winner — the retained tombstone itself when deleted
    assert len(h3) == 1 and h3["op"].iloc[0] == last["op"]


def test_key_history_collapsed_epochs(tmp_path):
    t, events = _mk(str(tmp_path))
    df = events.to_pandas().drop_duplicates(subset=["seq"])
    key_counts = df.groupby(["conv_id", "turn_idx"]).size()
    conv, turn = key_counts.idxmax()
    h = ing.key_history(t, conv, turn_idx=int(turn)).to_pandas()
    # collapsed tables keep one winner per (epoch, key)
    assert h["_epoch"].is_unique
    assert len(h) >= 1
    # each row is the winner among its epoch's events for the key
    own = df[(df["conv_id"] == conv) & (df["turn_idx"] == turn)]
    assert set(h["seq"]).issubset(set(own["seq"]))


def test_tags_travel_with_clone(tmp_path):
    t, _ = _mk(str(tmp_path), n=200, n_segments=2)
    tg.tag(t, "v1", epoch=1)
    c = ing.clone_table(t, str(tmp_path / "clone"))
    assert tg.tags(c) == {"v1": 1}
    # pins are independent per side
    tg.delete_tag(c, "v1")
    assert tg.tags(t) == {"v1": 1} and tg.tags(c) == {}


def test_cli_tag_and_history(tmp_path, capsys):
    from xgeo_ray.__main__ import main

    t, events = _mk(str(tmp_path), n=200, n_segments=2)
    assert main(["tag", t.root, "v1", "--epoch", "1"]) in (0, None)
    assert json.loads(capsys.readouterr().out.strip().splitlines()[-1]) == {
        "tag": "v1",
        "epoch": 1,
    }
    assert main(["tag", t.root]) in (0, None)
    assert json.loads(capsys.readouterr().out.strip().splitlines()[-1]) == {
        "v1": 1
    }
    cid = events.column("conv_id")[0].as_py()
    assert main(["get", t.root, cid, "--history"]) in (0, None)
    rows = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rows and all("_epoch" in r and "op" in r for r in rows)
    # restore accepts the tag name as the target
    want1 = (
        ing.snapshot(t, as_of_epoch=1)
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    assert main(["restore", t.root, "v1", "--force"]) in (0, None)
    st = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert st["restored_to"] == 1
    got = (
        ing.snapshot(DeltaTable.open(t.root))
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want1)
    assert main(["tag", t.root, "v1", "--delete"]) in (0, None)
    assert json.loads(capsys.readouterr().out.strip().splitlines()[-1]) == {
        "deleted": True
    }


def test_fsck_validates_tags(tmp_path):
    t, _ = _mk(str(tmp_path), n=300, n_segments=2)
    tg.tag(t, "pin", epoch=1)
    st = ing.fsck(t)
    assert st["ok"], st["issues"]
    # vacuum WITHOUT tag respect after a compact: the pin breaks and
    # fsck says so
    ing.compact(t)
    ing.vacuum(t, respect_tags=False)
    st = ing.fsck(t)
    assert not st["ok"]
    assert any("pins missing file" in i for i in st["issues"])
    # an out-of-range tag is an issue too
    tg.delete_tag(t, "pin")
    import json as _json
    with open(os.path.join(t.root, "tags", "future.json"), "w") as f:
        _json.dump({"epoch": 99}, f)
    st = ing.fsck(t)
    assert any("outside the committed range" in i for i in st["issues"])
