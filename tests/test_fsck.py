"""fsck: offline table integrity check (metadata + file stats only)."""

import os

import pyarrow as pa
import pytest

from xgeo_ray import fixtures as fx
from xgeo_ray.pipelines import ingest as ing
from xgeo_ray.state import consumers as cons
from xgeo_ray.state.delta_table import DeltaTable


@pytest.fixture()
def table(tmp_path):
    ev = fx.make_change_events(600, n_convs=8, turns_per_conv=5)
    segs = fx.write_segments(ev, str(tmp_path / "wal"), n_segments=2)
    t = DeltaTable.create(str(tmp_path / "t"), num_partitions=4, num_salts=1)
    ing.run_stream(t, segs, segments_per_epoch=1)
    return t


def test_healthy_table_passes(table):
    out = ing.fsck(table)
    assert out["ok"] and out["issues"] == []
    assert out["epochs"] == 2 and out["files_referenced"] > 0
    # compaction leaves superseded deltas unreferenced-by-the-view but
    # still manifest-referenced — fsck counts only truly orphan files
    ing.compact(table)
    out = ing.fsck(table)
    assert out["ok"], out["issues"]


def test_detects_missing_and_truncated_files(table):
    plan = table.partition_files()
    victim = next(p for paths in plan.values() for p in paths)
    size = os.path.getsize(victim)
    os.truncate(victim, size - 1)
    out = ing.fsck(table)
    assert not out["ok"] and any("bytes" in i for i in out["issues"])
    os.remove(victim)
    out = ing.fsck(table)
    assert not out["ok"] and any("missing file" in i for i in out["issues"])


def test_detects_runaway_consumer_cursor(table):
    cons.ack(table, "greedy", table.latest_epoch())
    assert ing.fsck(table)["ok"]
    # force a cursor past the fence (simulates acking an uncommitted poll)
    cons.ack(table, "greedy", table.latest_epoch() + 5)
    out = ing.fsck(table)
    assert not out["ok"] and any("ahead of the committed" in i for i in out["issues"])


def test_vacuum_respects_consumers_by_default_and_warns_on_override(table):
    """Default vacuum keeps deltas a lagging consumer still needs; a
    deliberate override is a fsck WARNING (alarm clears when the group
    catches up), never an ok=False corruption verdict."""
    cons.ack(table, "lagger", 1)  # acked epoch 1 of 2
    ing.compact(table)
    stats = ing.vacuum(table)  # default: respect consumers
    out = ing.fsck(table)
    assert out["ok"] and out["warnings"] == []
    # epoch-2 deltas must have survived (the lagger's feed reads them)
    assert any("epoch=000002" in p for ps in [
        [e.path for m in table.manifests() if m.kind == "delta"
         for e in m.partitions.values() if e.path]
    ] for p in ps)
    stats2 = ing.vacuum(table, respect_consumers=False)
    assert stats2["deleted"] > 0
    out = ing.fsck(table)
    assert out["ok"], out["issues"]  # not corruption...
    assert out["warnings"]  # ...but the consumer gap is surfaced
    cons.ack(table, "lagger", table.latest_epoch())
    out = ing.fsck(table)
    assert out["ok"] and out["warnings"] == []  # alarm clears
