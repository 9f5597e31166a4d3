"""End-to-end: bootstrap + epoch ingest vs the naive oracle reducer and a
DuckDB SQL oracle (FIXTURES.md §5) — the round-trip parity the north rule
demands: per-turn text equality under stable (conv_id, turn_idx) order."""

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from xgeo_ray import fixtures as fx
from xgeo_ray.pipelines import ingest as ing
from xgeo_ray.state.delta_table import DeltaTable

N_CONVS, TURNS, N_EVENTS = 12, 8, 1500


@pytest.fixture(scope="module")
def built_table(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("tbl"))
    base = fx.make_transcripts(N_CONVS, TURNS)
    base_path = f"{root}/base.parquet"
    pq.write_table(base, base_path)
    events = fx.make_change_events(
        N_EVENTS, n_convs=N_CONVS, turns_per_conv=TURNS, dup_fraction=0.03
    )
    seg_dir = f"{root}/wal"
    segs = fx.write_segments(events, seg_dir, n_segments=6)
    table = DeltaTable.create(f"{root}/table", num_partitions=8, num_salts=2)
    ing.bootstrap_base(table, base_path)
    manifests = ing.run_stream(table, segs, segments_per_epoch=2)
    return table, base, events, manifests


def _final_df(table):
    got = ing.snapshot(table).to_pandas()
    return got.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)


def test_parity_vs_naive_reducer(built_table):
    table, base, events, _ = built_table
    got = _final_df(table)
    want = fx.naive_final_state(base, events).to_pandas()
    pd.testing.assert_frame_equal(got[want.columns.tolist()], want)


def test_parity_vs_duckdb_oracle(built_table):
    table, base, events, _ = built_table
    got = _final_df(table)
    con = duckdb.connect()
    con.register("base", base)
    con.register("events", events)
    want = con.execute(
        """
        WITH all_rows AS (
          SELECT conv_id, turn_idx, role, text, tool, ts, CAST(-1 AS BIGINT) seq, 'I' op FROM base
          UNION ALL
          SELECT DISTINCT conv_id, turn_idx, role, text, tool, ts, seq, op FROM events
        )
        SELECT conv_id, turn_idx, role, text, tool, ts FROM all_rows
        QUALIFY row_number() OVER (PARTITION BY conv_id, turn_idx ORDER BY ts DESC, seq DESC) = 1
          AND op <> 'D'
        ORDER BY conv_id, turn_idx
        """
    ).df()
    pd.testing.assert_frame_equal(got[want.columns.tolist()], want)


def test_lineage_totals(built_table):
    table, base, events, manifests = built_table
    totals = {}
    for m in manifests:
        for k, v in m.totals.items():
            totals[k] = totals.get(k, 0) + v
    assert totals["events_read"] == events.num_rows
    # every non-duplicate event was either applied, superseded, or dup-dropped
    assert totals["dup_dropped"] + totals["below_wm_dropped"] > 0
    assert totals["applied"] > 0


def test_idempotent_replay(built_table, tmp_path):
    """At-least-once: replaying an already-committed segment set must not
    change the table (watermark drop) — run_stream skips them entirely,
    and a forced re-ingest applies zero rows."""
    table, base, events, manifests = built_table
    before = _final_df(table)
    # forced re-ingest of the first WAL segment (simulates redelivery)
    seg0 = manifests[0].segments[0]
    m = ing.ingest_segments(table, [seg0])
    assert m.totals["applied"] == 0
    assert m.totals["below_wm_dropped"] == m.totals["rows_in"]
    after = _final_df(table)
    pd.testing.assert_frame_equal(before, after)


def test_compaction_preserves_state(built_table):
    table, base, events, _ = built_table
    before = _final_df(table)
    ing.compact(table)
    after = _final_df(table)
    pd.testing.assert_frame_equal(before, after)
    # all partitions now read from exactly one file
    for k, files in table.partition_files().items():
        assert len(files) == 1


def test_snapshot_partition_local_sorted(built_table):
    table, *_ = built_table
    for part, files in table.partition_files().items():
        t = pq.read_table(files[-1])
        df = t.to_pandas()
        assert df[["conv_id", "turn_idx"]].equals(
            df[["conv_id", "turn_idx"]].sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
        )


def test_export_snapshot_resumable(tmp_path):
    """export_snapshot writes one sorted file per partition and skips
    already-written partitions on re-run (resume after failure)."""
    import os

    import pandas as pd
    import pyarrow.parquet as pq

    from xgeo_ray import fixtures as fx
    from xgeo_ray.pipelines import ingest as ing
    from xgeo_ray.state.delta_table import DeltaTable

    root = str(tmp_path)
    base = fx.make_transcripts(10, 6)
    pq.write_table(base, f"{root}/base.parquet")
    ev = fx.make_change_events(800, n_convs=10, turns_per_conv=6)
    segs = fx.write_segments(ev, f"{root}/wal", n_segments=2)
    table = DeltaTable.create(f"{root}/t", num_partitions=4, num_salts=2)
    ing.bootstrap_base(table, f"{root}/base.parquet")
    ing.run_stream(table, segs, segments_per_epoch=2)

    out = f"{root}/export"
    s1 = ing.export_snapshot(table, out)
    assert s1["skipped"] == 0 and s1["written"] == s1["partitions"]

    # content parity with the merge-on-read snapshot
    files = sorted(os.listdir(out))
    got = (
        pd.concat([pq.read_table(f"{out}/{f}").to_pandas() for f in files])
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    want = (
        ing.snapshot(table)
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[want.columns.tolist()], want)

    # resume: delete one partition file; only that one is rewritten
    os.remove(f"{out}/{files[0]}")
    s2 = ing.export_snapshot(table, out)
    assert s2["written"] == 1 and s2["skipped"] == s1["partitions"] - 1


def test_single_partition_table(tmp_path):
    """num_partitions=1 exercises the radix exchange's single-return edge
    (num_returns=None path) end-to-end."""
    import pandas as pd
    import pyarrow.parquet as pq

    from xgeo_ray import fixtures as fx
    from xgeo_ray.pipelines import ingest as ing
    from xgeo_ray.state.delta_table import DeltaTable

    root = str(tmp_path)
    base = fx.make_transcripts(5, 4)
    pq.write_table(base, f"{root}/base.parquet")
    ev = fx.make_change_events(200, n_convs=5, turns_per_conv=4)
    segs = fx.write_segments(ev, f"{root}/wal", n_segments=2)
    table = DeltaTable.create(f"{root}/t", num_partitions=1, num_salts=1)
    ing.bootstrap_base(table, f"{root}/base.parquet")
    ing.run_stream(table, segs, segments_per_epoch=2)
    got = (
        ing.snapshot(table)
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    want = fx.naive_final_state(base, ev).to_pandas()
    pd.testing.assert_frame_equal(got[want.columns.tolist()], want)


def test_fused_bootstrap_stream_matches_separate(tmp_path):
    """run_stream(bootstrap=...) must equal bootstrap_base + run_stream
    (same final state, same watermarks), be resumable (second call
    no-op), and keep base rows watermark-exempt."""
    base = fx.make_transcripts(10, 6)
    base_path = str(tmp_path / "base.parquet")
    pq.write_table(base, base_path)
    events = fx.make_change_events(600, n_convs=10, turns_per_conv=6, dup_fraction=0.03)
    segs = fx.write_segments(events, str(tmp_path / "wal"), n_segments=4)

    t1 = DeltaTable.create(str(tmp_path / "t1"), num_partitions=8, num_salts=2)
    ing.run_stream(t1, segs, segments_per_epoch=2, bootstrap=base_path)
    t2 = DeltaTable.create(str(tmp_path / "t2"), num_partitions=8, num_salts=2)
    ing.bootstrap_base(t2, base_path)
    ing.run_stream(t2, segs, segments_per_epoch=2)

    a = ing.snapshot(t1).to_pandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    b = ing.snapshot(t2).to_pandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    assert (t1.watermarks() == t2.watermarks()).all()
    want = fx.naive_final_state(base, events).to_pandas()
    pd.testing.assert_frame_equal(a[want.columns.tolist()], want)
    # resume is a no-op for both the bootstrap and the segments
    before = t1.latest_epoch()
    ms = ing.run_stream(t1, segs, segments_per_epoch=2, bootstrap=base_path)
    assert ms == [] and t1.latest_epoch() == before


def test_snapshot_column_pruning(built_table):
    """snapshot(columns=...) must equal the projection of the full
    snapshot while reading only key/order/op + requested columns."""
    table, base, events, _ = built_table
    full = (
        ing.snapshot(table).to_pandas()[["conv_id", "turn_idx", "text"]]
        .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    )
    pruned = (
        ing.snapshot(table, columns=["conv_id", "turn_idx", "text"])
        .to_pandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    )
    assert list(pruned.columns) == ["conv_id", "turn_idx", "text"]
    pd.testing.assert_frame_equal(pruned, full)


def test_point_lookup_single_conversation(built_table):
    """lookup(conv_id) returns exactly the snapshot's rows for that
    conversation while touching only its hash partitions."""
    table, base, events, _ = built_table
    snap = ing.snapshot(table).to_pandas()
    conv = snap["conv_id"].iloc[len(snap) // 2]
    want = (
        snap[snap["conv_id"] == conv]
        .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    )
    got = ing.lookup(table, conv).to_pandas().reset_index(drop=True)
    pd.testing.assert_frame_equal(got[want.columns.tolist()], want)
    # single-turn variant
    turn = int(want["turn_idx"].iloc[0])
    one = ing.lookup(table, conv, turn_idx=turn).to_pandas()
    assert len(one) == 1 and one["text"].iloc[0] == want["text"].iloc[0]
    # missing key -> typed empty
    assert ing.lookup(table, "no-such-conv").num_rows == 0


def test_batch_lookup_many(built_table):
    """lookup_many(N convs) == snapshot filtered to them, with one
    merge task per TOUCHED partition (missing keys just yield nothing)."""
    table, base, events, _ = built_table
    snap = ing.snapshot(table).to_pandas()
    convs = sorted(snap["conv_id"].unique()[:3].tolist())
    want = (
        snap[snap["conv_id"].isin(convs)]
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    got = (
        ing.lookup_many(table, convs + ["no-such-conv"])
        .to_pandas()
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[want.columns.tolist()], want)
    # duplicates in the request are deduped; empty request -> typed empty
    got2 = ing.lookup_many(table, convs + convs).to_pandas()
    assert len(got2) == len(want)
    assert ing.lookup_many(table, []).num_rows == 0


def test_final_snapshot_fused_matches_snapshot(tmp_path):
    """run_stream(final_snapshot=True) returns the same merged state as
    a separate snapshot() pass, commits identically, and the returned
    dataset reflects only committed state (including a no-op resume that
    snapshots prior state from files alone)."""
    base = fx.make_transcripts(10, 6)
    base_path = str(tmp_path / "base.parquet")
    pq.write_table(base, base_path)
    events = fx.make_change_events(
        700, n_convs=10, turns_per_conv=6, dup_fraction=0.03
    )
    segs = fx.write_segments(events, str(tmp_path / "wal"), n_segments=4)

    t1 = DeltaTable.create(str(tmp_path / "t1"), num_partitions=8, num_salts=2)
    ms, snap = ing.run_stream(
        t1, segs, segments_per_epoch=2, bootstrap=base_path, final_snapshot=True
    )
    assert len(ms) == t1.latest_epoch()
    fused = (
        snap.to_pandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    )
    separate = (
        ing.snapshot(t1)
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(fused, separate)
    want = fx.naive_final_state(base, events).to_pandas()
    pd.testing.assert_frame_equal(fused[want.columns.tolist()], want)
    # resume no-op still hands back the committed state
    ms2, snap2 = ing.run_stream(
        t1, segs, segments_per_epoch=2, bootstrap=base_path, final_snapshot=True
    )
    assert ms2 == []
    again = (
        snap2.to_pandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(again, separate)
