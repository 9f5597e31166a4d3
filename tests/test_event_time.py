"""Event-time watermarks + lateness lineage (VERDICT r2 "missing" #5).

The engine tracks per-partition max applied event ts (ts_watermarks),
derives a global low watermark (event_time_watermark = min over touched
partitions, minus allowed lateness), counts out-of-order arrivals into
the per-epoch ``late`` lineage total, and exposes an event-time trigger
in the tailer (on_watermark_advance fires once per watermark advance).
Late events are still APPLIED (LWW by ts handles ordering) — lateness is
lineage, not a drop."""

import os
import threading
import time

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from xgeo_ray import fixtures as fx
from xgeo_ray.pipelines import ingest as ing
from xgeo_ray.state.delta_table import DeltaTable


def _shift_ts(events, delta_us):
    i = events.schema.get_field_index("ts")
    shifted = pc.add(events.column("ts").cast("int64"), delta_us).cast(
        events.schema.field("ts").type
    )
    return events.set_column(i, events.schema.field("ts"), shifted)


def test_late_lineage_and_ts_watermarks(tmp_path):
    """Epoch 2 made entirely of events older (in event time) than epoch 1:
    every applied row counts as late; a subsequent newer epoch counts 0."""
    ev = fx.make_change_events(900, n_convs=16, turns_per_conv=5, dup_fraction=0.0)
    n = ev.num_rows
    e1 = ev.slice(0, n // 3)
    # push epoch 2 strictly below everything epoch 1 applied
    span = int(pc.max(ev.column("ts")).cast("int64").as_py()) - int(
        pc.min(ev.column("ts")).cast("int64").as_py()
    )
    e2 = _shift_ts(ev.slice(n // 3, n // 3), -(span + 1_000_000))
    e3 = _shift_ts(ev.slice(2 * n // 3), +1_000_000)  # strictly newer
    segs = []
    for k, e in enumerate((e1, e2, e3)):
        segs += fx.write_segments(e, str(tmp_path / f"wal{k}"), n_segments=1)

    table = DeltaTable.create(str(tmp_path / "t"), num_partitions=4, num_salts=1)
    m1 = ing.ingest_segments(table, [segs[0]])
    assert m1.totals["late"] == 0  # nothing committed before epoch 1
    tw = table.ts_watermarks()
    assert (tw >= 0).all()  # 16 convs across 4 partitions: all touched
    assert int(tw.max()) == int(pc.max(e1.column("ts")).cast("int64").as_py())

    m2 = ing.ingest_segments(table, [segs[1]])
    # all partitions have epoch-1 data and every epoch-2 ts is below it
    assert m2.totals["late"] == m2.totals["rows_in"]
    assert m2.totals["applied"] > 0  # late events still apply
    # watermarks never regress on late data
    assert (table.ts_watermarks() == tw).all()

    m3 = ing.ingest_segments(table, [segs[2]])
    assert m3.totals["late"] == 0
    assert (table.ts_watermarks() > tw).all()


def test_late_counted_post_dedup(tmp_path):
    """Redelivered copies of a late event must NOT inflate `late`: the
    count is distinct (key, seq) triples below the watermark, matching
    the manifest's post-dedup 'applied events' semantics."""
    ev = fx.make_change_events(600, n_convs=8, turns_per_conv=5, dup_fraction=0.0)
    n = ev.num_rows
    e1 = ev.slice(0, n // 2)
    span = int(pc.max(ev.column("ts")).cast("int64").as_py()) - int(
        pc.min(ev.column("ts")).cast("int64").as_py()
    )
    e2 = _shift_ts(ev.slice(n // 2), -(span + 1_000_000))
    segs = fx.write_segments(e1, str(tmp_path / "w1"), n_segments=1)
    # redeliver epoch 2 three times as SEPARATE segments (separate map
    # chunks — the pre-shuffle collapse can't see across them, so the
    # duplicate copies reach the reduce's (key, seq) dedup)
    dup_segs = []
    for k in range(3):
        dup_segs += fx.write_segments(e2, str(tmp_path / f"w2_{k}"), n_segments=1)
    table = DeltaTable.create(str(tmp_path / "t"), num_partitions=4, num_salts=1)
    ing.ingest_segments(table, [segs[0]])
    m2 = ing.ingest_segments(table, dup_segs)
    assert m2.totals["dup_dropped"] > 0  # copies really reached the reduce
    # every DISTINCT event is late, counted once — not once per copy
    assert (
        m2.totals["late"]
        == m2.totals["rows_in"] - m2.totals["dup_dropped"]
    )
    assert m2.totals["late"] < m2.totals["rows_in"]


def test_event_time_watermark_derivation(tmp_path):
    ev = fx.make_change_events(400, n_convs=12, turns_per_conv=5)
    segs = fx.write_segments(ev, str(tmp_path / "wal"), n_segments=1)
    table = DeltaTable.create(str(tmp_path / "t"), num_partitions=4, num_salts=1)
    assert table.event_time_watermark() == -1  # no data yet
    ing.ingest_segments(table, segs)
    tw = table.ts_watermarks()
    w = table.event_time_watermark()
    assert w == int(tw[tw >= 0].min())
    assert table.event_time_watermark(allowed_lateness_us=5_000_000) == w - 5_000_000


def test_bootstrap_excluded_from_event_time(tmp_path):
    """Base-table rows predate the stream: bootstrap must not set the
    event-time watermark (updates to old turns would all read as late),
    and compaction must not either (it folds bootstrap rows back in)."""
    base = fx.make_transcripts(10, 6)
    base_path = str(tmp_path / "base.parquet")
    pq.write_table(base, base_path)
    table = DeltaTable.create(str(tmp_path / "t"), num_partitions=4, num_salts=1)
    ing.bootstrap_base(table, base_path)
    assert table.event_time_watermark() == -1
    assert (table.ts_watermarks() == -1).all()

    ev = fx.make_change_events(300, n_convs=10, turns_per_conv=6)
    segs = fx.write_segments(ev, str(tmp_path / "wal"), n_segments=1)
    ing.ingest_segments(table, segs)
    w = table.event_time_watermark()
    assert w > 0
    ing.compact(table)  # compact manifests carry no event-time history
    assert table.event_time_watermark() == w


def test_run_stream_pipelined_lateness(tmp_path):
    """run_stream's in-memory ts-watermark tracking matches the manifest
    view: an old-ts segment replayed as a later epoch in the SAME stream
    call is counted late against the in-flight watermarks."""
    ev = fx.make_change_events(600, n_convs=16, turns_per_conv=5, dup_fraction=0.0)
    n = ev.num_rows
    new = ev.slice(0, n // 2)
    span = int(pc.max(ev.column("ts")).cast("int64").as_py()) - int(
        pc.min(ev.column("ts")).cast("int64").as_py()
    )
    old = _shift_ts(ev.slice(n // 2), -(span + 1_000_000))
    wal = tmp_path / "wal"
    s1 = fx.write_segments(new, str(wal), n_segments=1)[0]
    s2 = fx.write_segments(old, str(tmp_path / "wal2"), n_segments=1)[0]
    table = DeltaTable.create(str(tmp_path / "t"), num_partitions=4, num_salts=1)
    ms = ing.run_stream(table, [s1, s2], segments_per_epoch=1)
    assert len(ms) == 2
    assert ms[0].totals["late"] == 0
    assert ms[1].totals["late"] == ms[1].totals["rows_in"]


def test_tail_watermark_trigger(tmp_path):
    """on_watermark_advance fires once per advance with a strictly
    increasing watermark as batches land."""
    ev = fx.make_change_events(400, n_convs=8, turns_per_conv=5, dup_fraction=0.0)
    n = ev.num_rows
    wal = str(tmp_path / "wal")
    os.makedirs(wal)

    def writer():
        for k in range(2):
            seg = ev.slice(k * n // 2, n // 2)
            tmp = f"{wal}/.tmp-{k}"
            pq.write_table(seg, tmp)
            os.replace(tmp, f"{wal}/segment-{k:05d}.parquet")
            time.sleep(0.5)

    table = DeltaTable.create(str(tmp_path / "t"), num_partitions=4, num_salts=1)
    seen = []
    w = threading.Thread(target=writer)
    w.start()
    ing.tail(
        table,
        wal,
        poll_interval_s=0.1,
        segments_per_epoch=1,
        idle_polls_to_stop=15,
        stable_for_s=0.05,
        allowed_lateness_us=250,
        on_watermark_advance=lambda wm, t: seen.append(wm),
    )
    w.join()
    assert len(seen) >= 2  # two staggered batches => two advances
    assert seen == sorted(set(seen))  # strictly increasing, no repeats
    assert seen[-1] == table.event_time_watermark(allowed_lateness_us=250)


def test_trigger_drives_incremental_view_refresh(tmp_path):
    """The intended consumer wiring: tail's watermark trigger refreshes a
    materialized view exactly once per advance; the final view matches a
    full recompute and each refresh only touched changed partitions."""
    import pyarrow as pa

    from xgeo_ray.functions.relational import partial_group_agg
    from xgeo_ray.pipelines import views as vw

    def agg(t: pa.Table) -> pa.Table:
        return t.group_by("role").aggregate([("turn_idx", "count")])

    ev = fx.make_change_events(600, n_convs=8, turns_per_conv=5, dup_fraction=0.0)
    n = ev.num_rows
    wal = str(tmp_path / "wal")
    os.makedirs(wal)

    def writer():
        for k in range(2):
            seg = ev.slice(k * n // 2, n // 2)
            tmp = f"{wal}/.tmp-{k}"
            pq.write_table(seg, tmp)
            os.replace(tmp, f"{wal}/segment-{k:05d}.parquet")
            time.sleep(0.5)

    table = DeltaTable.create(str(tmp_path / "t"), num_partitions=4, num_salts=1)
    view_dir = str(tmp_path / "view")
    stats = []
    w = threading.Thread(target=writer)
    w.start()
    ing.tail(
        table,
        wal,
        poll_interval_s=0.1,
        idle_polls_to_stop=15,
        stable_for_s=0.05,
        on_watermark_advance=lambda wm, t: stats.append(
            vw.refresh_view(t, view_dir, agg)
        ),
    )
    w.join()
    assert len(stats) >= 2 and all(s["refreshed"] > 0 for s in stats)
    got = (
        partial_group_agg(vw.read_view(view_dir), ["role"],
                          [("turn_idx_count", "sum", "n")])
        .to_pandas().sort_values("role").reset_index(drop=True)
    )
    # full recompute from scratch as the oracle
    fresh_dir = str(tmp_path / "view_full")
    vw.refresh_view(table, fresh_dir, agg)
    want = (
        partial_group_agg(vw.read_view(fresh_dir), ["role"],
                          [("turn_idx_count", "sum", "n")])
        .to_pandas().sort_values("role").reset_index(drop=True)
    )
    import pandas as pd

    pd.testing.assert_frame_equal(got, want)


def test_old_manifests_without_late_field(tmp_path):
    """Pre-round-3 manifests have no ``late`` key: loading must default
    it to 0 (totals and watermark math unaffected)."""
    import json

    ev = fx.make_change_events(200, n_convs=8, turns_per_conv=5)
    segs = fx.write_segments(ev, str(tmp_path / "wal"), n_segments=1)
    table = DeltaTable.create(str(tmp_path / "t"), num_partitions=4, num_salts=1)
    m = ing.ingest_segments(table, segs)
    # strip the new field from the on-disk manifest, as an old writer would
    path = os.path.join(table.root, "manifests", f"epoch={m.epoch:06d}.json")
    with open(path) as f:
        raw = json.load(f)
    for e in raw["partitions"].values():
        e.pop("late", None)
    with open(path, "w") as f:
        json.dump(raw, f)
    fresh = DeltaTable.open(table.root)
    ms = fresh.manifests()
    assert all(e.late == 0 for m2 in ms for e in m2.partitions.values())
    assert fresh.event_time_watermark() >= 0
