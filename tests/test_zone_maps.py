"""Per-column zone maps (``stats_columns``): manifest [min, max] per
delta file, partition pruning via ``DeltaTable.partitions_in_range``,
band reads via ``snapshot(ranges=)`` and the ``delete_where(ranges=)``
prune hook."""

import json

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


def _mk(root, stats_columns=("turn_idx", "role")):
    import os

    os.makedirs(root, exist_ok=True)
    base = fx.make_transcripts(12, 6)
    pq.write_table(base, f"{root}/base.parquet")
    events = fx.make_change_events(
        600, n_convs=12, turns_per_conv=6, dup_fraction=0.0
    )
    segs = fx.write_segments(events, f"{root}/wal", n_segments=2)
    table = DeltaTable.create(
        f"{root}/table", num_partitions=8, num_salts=2,
        stats_columns=list(stats_columns),
    )
    ing.bootstrap_base(table, f"{root}/base.parquet")
    ing.run_stream(table, segs, segments_per_epoch=1)
    return table


def test_stats_recorded_in_manifests(tmp_path):
    table = _mk(str(tmp_path))
    assert table.stats_columns() == ["role", "turn_idx"]
    seen = 0
    for m in table.manifests():
        for e in m.partitions.values():
            if not e.path:
                continue
            assert e.stats, f"no stats on {e.path}"
            st = json.loads(e.stats)
            assert set(st) <= {"role", "turn_idx"}
            t = pq.read_table(
                f"{table.root}/{e.path}", columns=["turn_idx", "role"]
            )
            lo, hi = st["turn_idx"]
            assert lo == pc.min(t.column("turn_idx")).as_py()
            assert hi == pc.max(t.column("turn_idx")).as_py()
            seen += 1
    assert seen > 0


def test_partitions_in_range_sound_and_effective(tmp_path):
    table = _mk(str(tmp_path))
    full = _df(ing.snapshot(table))
    # soundness on a STRING column: every partition holding a matching
    # merged row must be in the survivor set
    for role in full["role"].unique():
        parts = set(table.partitions_in_range("role", role, role))
        got = _df(ing.snapshot(table, partitions=sorted(parts)))
        want = full[full["role"] == role].reset_index(drop=True)
        sub = got[got["role"] == role].reset_index(drop=True)
        pd.testing.assert_frame_equal(sub, want)
    # effectiveness: an impossible band prunes everything
    assert table.partitions_in_range("turn_idx", 10_000, None) == []
    assert table.partitions_in_range("role", "zzzz", None) == []


def test_snapshot_ranges_band_read(tmp_path):
    table = _mk(str(tmp_path))
    full = _df(ing.snapshot(table))
    got = _df(ing.snapshot(table, ranges={"turn_idx": (2, 4)}))
    want = full[(full["turn_idx"] >= 2) & (full["turn_idx"] <= 4)]
    pd.testing.assert_frame_equal(got, want.reset_index(drop=True))
    # open-ended band + columns projection (band col not projected)
    got2 = ing.snapshot(
        table, ranges={"turn_idx": (5, None)}, columns=["text"]
    ).to_pandas()
    assert set(got2.columns) == {"text"}
    assert len(got2) == (full["turn_idx"] >= 5).sum()
    # empty band (schema preserved, zero rows)
    empty = ing.snapshot(table, ranges={"turn_idx": (10_000, None)})
    assert empty.count() == 0
    assert "conv_id" in empty.schema().names
    with pytest.raises(ValueError, match="time-travel"):
        ing.snapshot(table, ranges={"turn_idx": (0, 1)}, as_of_epoch=1)


def test_delete_where_ranges_prune(tmp_path):
    table = _mk(str(tmp_path))
    full = _df(ing.snapshot(table))
    pred = lambda t: pc.greater_equal(t.column("turn_idx"), 5)  # noqa: E731
    pred.columns = ["turn_idx"]
    m = ing.delete_where(
        table, pred, batch_id="zap-5", ranges={"turn_idx": (5, None)}
    )
    assert m is not None
    got = _df(ing.snapshot(table))
    want = full[full["turn_idx"] < 5].reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)


def test_stats_survive_compaction_and_additive_refused(tmp_path):
    table = _mk(str(tmp_path))
    ing.compact(table)
    # folded files carry fresh stats
    for paths in table.partition_files().values():
        assert len(paths) == 1
    assert table.partitions_in_range("turn_idx", 0, 0) != []
    got = _df(ing.snapshot(table, ranges={"turn_idx": (2, 4)}))
    assert ((got["turn_idx"] >= 2) & (got["turn_idx"] <= 4)).all()

    add = DeltaTable.create(
        f"{tmp_path}/add", num_partitions=4, num_salts=1,
        merge_policy="additive", stats_columns=["turn_idx"],
    )
    with pytest.raises(ValueError, match="additive"):
        add.partitions_in_range("turn_idx", 0, 1)


def test_set_stats_columns_later_is_sound(tmp_path):
    """Stats enabled mid-history: old files carry none -> partitions
    with old files never prune (conservative), new files do."""
    table = _mk(str(tmp_path), stats_columns=())
    assert table.stats_columns() == []
    # no stats anywhere: every touched partition survives every band
    touched = sorted(table.partition_files())
    assert table.partitions_in_range("turn_idx", 10_000, None) == touched
    table.set_stats_columns(["turn_idx"])
    events = fx.make_change_events_shard(
        600, 200, n_convs=12, turns_per_conv=6, dup_fraction=0.0
    )
    segs = fx.write_segments(events, f"{tmp_path}/wal2", n_segments=1)
    ing.run_stream(table, segs, segments_per_epoch=1)
    # mixed history: still conservative (old unstatted files keep all)
    assert table.partitions_in_range("turn_idx", 10_000, None) == sorted(
        table.partition_files()
    )
    # a full compact rewrites everything with stats -> pruning engages
    ing.compact(table)
    assert table.partitions_in_range("turn_idx", 10_000, None) == []
    full = _df(ing.snapshot(table))
    got = _df(ing.snapshot(table, ranges={"turn_idx": (1, 2)}))
    want = full[(full["turn_idx"] >= 1) & (full["turn_idx"] <= 2)]
    pd.testing.assert_frame_equal(got, want.reset_index(drop=True))
