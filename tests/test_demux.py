"""Multi-table WAL demux (sources.demux.demux_wal): one interleaved CDC
stream routed into per-table WAL directories, each an ordinary
single-table WAL with independent watermarks — per-route ingest must
equal ingesting only that route's events directly.
"""

import json
import os

import pandas as pd
import pyarrow as pa
import pytest

from xgeo_ray import fixtures as fx
from xgeo_ray.pipelines import ingest as ing
from xgeo_ray.sources import demux
from xgeo_ray.state.delta_table import DeltaTable


def _routed_events(n=1200):
    events = fx.make_change_events(n, n_convs=12, turns_per_conv=5)
    tenants = pa.array(
        [f"tenant{sum(map(ord, c)) % 3}" for c in events.column("conv_id").to_pylist()]
    )
    return events.append_column("tenant", tenants)


def _snap(t):
    return (
        ing.snapshot(t)
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )


def test_demux_routes_match_direct_ingest(tmp_path):
    events = _routed_events()
    segs = fx.write_segments(events, str(tmp_path / "wal"), n_segments=4)
    routed = demux.demux_wal(segs, str(tmp_path / "routes"), route_col="tenant")
    assert set(routed) == {"tenant0", "tenant1", "tenant2"}
    # route files are lexicographically ordered == delivery order
    for paths in routed.values():
        assert paths == sorted(paths)

    for r, paths in routed.items():
        t = DeltaTable.create(str(tmp_path / f"t_{r}"), num_partitions=2)
        ing.run_stream(t, paths, segments_per_epoch=2)
        # oracle: ingest ONLY this tenant's events, written directly
        mask = pa.compute.equal(events.column("tenant"), r)
        own = events.filter(mask).drop_columns(["tenant"])
        osegs = fx.write_segments(own, str(tmp_path / f"owal_{r}"), n_segments=2)
        o = DeltaTable.create(str(tmp_path / f"o_{r}"), num_partitions=2)
        ing.run_stream(o, osegs, segments_per_epoch=2)
        pd.testing.assert_frame_equal(_snap(t), _snap(o))
        assert "tenant" not in _snap(t).columns


def test_demux_resume_and_order_guard(tmp_path):
    events = _routed_events(600)
    segs = fx.write_segments(events, str(tmp_path / "wal"), n_segments=3)
    out = str(tmp_path / "routes")
    routed = demux.demux_wal(segs, out, route_col="tenant")
    # pure resume: markers short-circuit, identical mapping
    assert demux.demux_wal(segs, out, route_col="tenant") == routed
    # extending the list demuxes only the new segment
    more = fx.write_segments(events, str(tmp_path / "wal2"), n_segments=3)
    ext_out = str(tmp_path / "routes2")
    first = demux.demux_wal(more[:2], ext_out, route_col="tenant")
    full = demux.demux_wal(more, ext_out, route_col="tenant")
    for r in first:
        assert full[r][: len(first[r])] == first[r]
    # reordering under existing markers is refused
    with pytest.raises(ValueError, match="input order changed"):
        demux.demux_wal(list(reversed(segs)), out, route_col="tenant")
    # crash between route files and marker: marker missing -> replayed,
    # rewrite is byte-identical and the mapping converges
    base = os.path.basename(segs[0]).split(".")[0]
    os.remove(os.path.join(out, "_demux", f"{base}.json"))
    assert demux.demux_wal(segs, out, route_col="tenant") == routed


def test_cli_demux(tmp_path, capsys):
    from xgeo_ray.__main__ import main

    events = _routed_events(400)
    wal = str(tmp_path / "wal")
    fx.write_segments(events, wal, n_segments=2)
    out = str(tmp_path / "routes")
    assert main(["demux", wal, out, "--route-col", "tenant"]) in (0, None)
    st = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert set(st) == {"tenant0", "tenant1", "tenant2"}
    assert all(n == 2 for n in st.values())
    for r in st:
        assert len(os.listdir(os.path.join(out, r))) == 2


def test_demux_validation(tmp_path):
    events = fx.make_change_events(100, n_convs=4, turns_per_conv=3)
    segs = fx.write_segments(events, str(tmp_path / "wal"), n_segments=1)
    with pytest.raises(Exception, match="no route column"):
        demux.demux_wal(segs, str(tmp_path / "r1"), route_col="tenant")
    bad = events.append_column(
        "tenant", pa.array(["ok/../evil"] * events.num_rows)
    )
    bsegs = fx.write_segments(bad, str(tmp_path / "bwal"), n_segments=1)
    with pytest.raises(Exception, match="filesystem-safe"):
        demux.demux_wal(bsegs, str(tmp_path / "r2"), route_col="tenant")
    withnull = events.append_column(
        "tenant",
        pa.array(["a"] * (events.num_rows - 1) + [None], pa.string()),
    )
    nsegs = fx.write_segments(withnull, str(tmp_path / "nwal"), n_segments=1)
    with pytest.raises(Exception, match="null"):
        demux.demux_wal(nsegs, str(tmp_path / "r3"), route_col="tenant")


def test_tail_demux_follows_live_wal(tmp_path):
    """The live router: each poll demuxes newly published segments
    exactly-once; on_routes reports only the new paths; the cumulative
    map equals a one-shot demux of the full WAL."""
    events = _routed_events(800)
    half = events.num_rows // 2
    wal = str(tmp_path / "wal")
    out = str(tmp_path / "routes")
    fx.write_segments(events.slice(0, half), wal, n_segments=2)
    calls = []
    got1 = demux.tail_demux(
        wal, out, route_col="tenant",
        poll_interval_s=0.01, idle_polls_to_stop=2,
        on_routes=lambda new: calls.append(new),
    )
    assert len(calls) == 1 and set(got1) == {"tenant0", "tenant1", "tenant2"}
    # two more segments land (names continue lexicographically)
    import pyarrow.parquet as pq
    later = events.slice(half)
    mid = later.num_rows // 2
    pq.write_table(later.slice(0, mid), os.path.join(wal, "segment-00002.parquet"))
    pq.write_table(later.slice(mid), os.path.join(wal, "segment-00003.parquet"))
    got2 = demux.tail_demux(
        wal, out, route_col="tenant",
        poll_interval_s=0.01, idle_polls_to_stop=2,
        on_routes=lambda new: calls.append(new),
    )
    # the second tailer run is fresh state: its `new` is everything
    assert len(calls) == 2
    # one-shot demux of the full WAL agrees with the cumulative map
    segs = sorted(
        os.path.join(wal, n) for n in os.listdir(wal)
        if n.endswith(".parquet")
    )
    assert demux.demux_wal(segs, out, route_col="tenant") == got2
    for r, paths in got2.items():
        assert paths == sorted(paths)
        assert len(paths) == 4  # every tenant present in all 4 segments
