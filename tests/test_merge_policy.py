"""Pluggable merge policies (SURVEY §2.10c) + compaction crash safety.

The engine's conflict resolution is a named, registered policy persisted
in the table metadata: "lww" (default, the fused fast path) and
"additive" (numeric data columns accumulate per key; redelivered seqs
never double count). A custom policy registers via
register_merge_policy and rides the same ingest/snapshot/compact paths.
"""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from xgeo_ray import fixtures as fx
from xgeo_ray.pipelines import ingest as ing
from xgeo_ray.stages.collapse import (
    MERGE_POLICIES,
    additive_collapse,
    register_merge_policy,
)
from xgeo_ray.state.delta_table import DeltaTable

BASE_TS = 1_700_000_000_000_000


def _ev(seq, op, conv, turn, ts_off, amount):
    return dict(
        seq=seq, op=op, conv_id=conv, turn_idx=turn,
        ts=BASE_TS + ts_off, amount=amount,
    )


def _events_table(rows):
    cols = {k: [r[k] for r in rows] for k in rows[0]}
    return pa.table(
        {
            "seq": pa.array(cols["seq"], pa.int64()),
            "op": pa.array(cols["op"], pa.string()),
            "conv_id": pa.array(cols["conv_id"], pa.string()),
            "turn_idx": pa.array(cols["turn_idx"], pa.int32()),
            "ts": pa.array(cols["ts"], pa.timestamp("us")),
            "amount": pa.array(cols["amount"], pa.int64()),
        }
    )


def test_additive_collapse_unit():
    t = _events_table(
        [
            _ev(1, "I", "c1", 0, 100, 10),
            _ev(2, "U", "c1", 0, 200, 5),
            _ev(2, "U", "c1", 0, 200, 5),   # redelivered dup: must not double count
            _ev(3, "I", "c2", 0, 100, 7),
            _ev(4, "D", "c2", 0, 300, 0),   # tombstone last -> key drops
        ]
    )
    out = additive_collapse(t, drop_tombstones=True)
    df = out.to_pandas().sort_values("conv_id")
    assert df["conv_id"].tolist() == ["c1"]
    assert df["amount"].tolist() == [15]
    # without drop, the tombstoned key survives as a tombstone row
    out2 = additive_collapse(t, drop_tombstones=False).to_pandas()
    assert set(out2["conv_id"]) == {"c1", "c2"}
    assert out2.set_index("conv_id")["op"]["c2"] == "D"


def test_unknown_policy_rejected(tmp_path):
    with pytest.raises(ValueError, match="merge_policy"):
        DeltaTable.create(str(tmp_path / "t"), merge_policy="nope")


def _additive_oracle(events: pa.Table) -> pd.DataFrame:
    df = events.to_pandas()
    df = df.sort_values(["ts", "seq"], kind="stable")
    df = df.drop_duplicates(subset=["conv_id", "turn_idx", "seq"], keep="first")
    g = df.groupby(["conv_id", "turn_idx"], sort=True)
    out = g.agg(amount=("amount", "sum"), op=("op", "last")).reset_index()
    return out[out["op"] != "D"].drop(columns=["op"]).reset_index(drop=True)


def test_additive_ingest_end_to_end(tmp_path):
    """Counter-style CDC: increments + redelivered duplicates + a crash
    boundary between epochs; the final snapshot must equal the pandas
    oracle sum (exactly-once accumulation)."""
    rng = np.random.default_rng(11)
    rows = []
    for seq in range(600):
        conv = f"c{rng.integers(0, 20)}"
        turn = int(rng.integers(0, 5))
        op = "D" if rng.random() < 0.03 else ("I" if seq % 2 else "U")
        rows.append(_ev(seq, op, conv, turn, 1000 * seq, int(rng.integers(1, 9))))
    events = _events_table(rows)
    # redeliver 5% later in the stream (same seq + payload)
    dup_idx = rng.choice(len(rows), size=30, replace=False)
    events = pa.concat_tables([events, events.take(np.sort(dup_idx))])

    segs = fx.write_segments(events, str(tmp_path / "wal"), n_segments=4)
    table = DeltaTable.create(
        str(tmp_path / "tbl"),
        num_partitions=4,
        num_salts=2,
        merge_policy="additive",
    )
    assert DeltaTable.open(table.root).merge_policy == "additive"
    ing.run_stream(table, segs[:2], segments_per_epoch=1)
    ing.run_stream(table, segs, segments_per_epoch=2)  # resume-style continue
    got = (
        ing.snapshot(table)
        .to_pandas()[["conv_id", "turn_idx", "amount"]]
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    want = _additive_oracle(events)
    pd.testing.assert_frame_equal(
        got.astype({"amount": "int64"}), want.astype({"amount": "int64"})
    )
    # compact under the additive policy must preserve the accumulated state
    ing.compact(table)
    got2 = (
        ing.snapshot(table)
        .to_pandas()[["conv_id", "turn_idx", "amount"]]
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, got2)


def test_custom_policy_registers_and_runs(tmp_path):
    """A user-registered policy (keep the FIRST writer) is a first-class
    merge strategy: persisted by name, applied at ingest and read."""
    from xgeo_ray.stages.collapse import lww_collapse

    def fww(t, drop_tombstones):
        df = t.to_pandas().sort_values(["ts", "seq"], kind="stable")
        df = df.drop_duplicates(subset=["conv_id", "turn_idx"], keep="first")
        if drop_tombstones:
            df = df[df["op"] != "D"]
        return pa.Table.from_pandas(df, preserve_index=False).cast(t.schema)

    register_merge_policy("first_writer", fww, precombinable=False)
    try:
        events = _events_table(
            [
                _ev(1, "I", "a", 0, 100, 1),
                _ev(2, "U", "a", 0, 200, 2),
                _ev(3, "I", "b", 0, 100, 3),
            ]
        )
        segs = fx.write_segments(events, str(tmp_path / "wal"), n_segments=1)
        table = DeltaTable.create(
            str(tmp_path / "t"), num_partitions=2, num_salts=1,
            merge_policy="first_writer",
        )
        ing.run_stream(table, segs)
        got = ing.snapshot(table).to_pandas().sort_values("conv_id")
        assert got["amount"].tolist() == [1, 3]  # first writer of 'a' won
    finally:
        MERGE_POLICIES.pop("first_writer", None)


def test_crash_during_compact_is_invisible_then_retry(tmp_path, monkeypatch):
    """Compaction dies after writing every compacted file but before the
    manifest commit: the table must still read the PRE-compact state
    (orphan files invisible), and a retried compact must succeed and
    preserve state + watermarks."""
    events = fx.make_change_events(500, n_convs=12, turns_per_conv=6)
    segs = fx.write_segments(events, str(tmp_path / "wal"), n_segments=2)
    table = DeltaTable.create(str(tmp_path / "t"), num_partitions=4, num_salts=2)
    ing.run_stream(table, segs, segments_per_epoch=1)
    before = (
        ing.snapshot(table).to_pandas().sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    wm_before = table.watermarks().copy()
    epochs_before = table.latest_epoch()

    # simulate the crash at the fence without killing pytest: the env hook
    # calls os._exit in real runs; here we intercept commit_epoch itself
    real_commit = DeltaTable.commit_epoch

    def boom(self, *a, **k):
        raise RuntimeError("crash before compact commit")

    monkeypatch.setattr(DeltaTable, "commit_epoch", boom)
    with pytest.raises(RuntimeError):
        ing.compact(table)
    monkeypatch.setattr(DeltaTable, "commit_epoch", real_commit)

    # orphan compact files exist but are invisible behind the fence
    import glob

    orphans = glob.glob(os.path.join(table.root, "parts", "*", "compact-*.parquet"))
    assert orphans
    assert table.latest_epoch() == epochs_before
    mid = (
        ing.snapshot(table).to_pandas().sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(before, mid)

    # retry: deterministic paths overwrite the orphans; state + watermarks hold
    ing.compact(table)
    after = (
        ing.snapshot(table).to_pandas().sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(before, after)
    assert (table.watermarks() == wm_before).all()
    files = table.partition_files()
    assert all(len(v) == 1 for v in files.values())  # folded to one file each


def test_vacuum_reclaims_superseded_deltas_only(tmp_path):
    """After compact, vacuum deletes exactly the superseded delta files:
    the visible view, resume watermarks, and crash-orphan files from
    epochs ABOVE the committed fence all survive."""
    import glob

    events = fx.make_change_events(400, n_convs=10, turns_per_conv=5)
    segs = fx.write_segments(events, str(tmp_path / "wal"), n_segments=4)
    table = DeltaTable.create(str(tmp_path / "t"), num_partitions=4, num_salts=1)
    ing.run_stream(table, segs, segments_per_epoch=1)  # 4 delta epochs
    before = (
        ing.snapshot(table).to_pandas().sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    wm = table.watermarks().copy()
    ing.compact(table)
    # plant a crash-orphan from a FUTURE (uncommitted) epoch
    orphan = os.path.join(
        table.root, "parts", "part=00000", f"epoch={table.latest_epoch()+1:06d}.parquet"
    )
    pq.write_table(pa.table({"x": [1]}), orphan)

    all_files = lambda: glob.glob(
        os.path.join(table.root, "parts", "*", "*epoch=*.parquet")
    )
    n_before = len(all_files())
    stats = ing.vacuum(table)
    assert stats["deleted"] > 0 and stats["bytes_freed"] > 0
    remaining = all_files()
    # exactly the visible compact files + the future-epoch orphan remain
    visible = {p for v in table.partition_files().values() for p in v}
    assert set(remaining) == visible | {orphan}
    assert len(remaining) < n_before
    after = (
        ing.snapshot(table).to_pandas().sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(before, after)
    assert (table.watermarks() == wm).all()
    # idempotent
    assert ing.vacuum(table)["deleted"] == 0


def test_additive_dedup_catches_ts_altered_redelivery():
    """A redelivered (key, seq) pair whose ts was altered in flight is
    not adjacent under the (key, ts, seq) merge sort; the dedup must run
    under its own (key, seq) sort to catch it (round-2 ADVICE)."""
    t = _events_table(
        [
            _ev(1, "I", "c1", 0, 100, 10),
            _ev(2, "U", "c1", 0, 200, 5),
            _ev(5, "U", "c1", 0, 250, 3),   # interleaves between the copies
            _ev(2, "U", "c1", 0, 300, 5),   # same seq, ALTERED ts
        ]
    )
    out = additive_collapse(t, drop_tombstones=True).to_pandas()
    assert out["conv_id"].tolist() == ["c1"]
    assert out["amount"].tolist() == [18]  # 10 + 5 + 3, second copy dropped


# ------------------------------------------------------------------
# "coalesce" (partial-update / patch) policy


def _patch_ev(seq, op, conv, turn, role=None, text=None, amount=None):
    return dict(
        seq=seq, op=op, conv_id=conv, turn_idx=turn,
        ts=BASE_TS + seq * 100, role=role, text=text, amount=amount,
    )


def _patch_table(rows):
    cols = {k: [r[k] for r in rows] for k in rows[0]}
    return pa.table(
        {
            "seq": pa.array(cols["seq"], pa.int64()),
            "op": pa.array(cols["op"], pa.string()),
            "conv_id": pa.array(cols["conv_id"], pa.string()),
            "turn_idx": pa.array(cols["turn_idx"], pa.int32()),
            "ts": pa.array(cols["ts"], pa.timestamp("us")),
            "role": pa.array(cols["role"], pa.string()),
            "text": pa.array(cols["text"], pa.string()),
            "amount": pa.array(cols["amount"], pa.int64()),
        }
    )


def test_coalesce_collapse_unit():
    from xgeo_ray.stages.collapse import coalesce_collapse

    t = _patch_table(
        [
            _patch_ev(1, "I", "c1", 0, role="user", text="hello", amount=1),
            _patch_ev(2, "U", "c1", 0, text="edited"),      # patches text only
            _patch_ev(3, "U", "c1", 0, amount=7),           # patches amount only
            _patch_ev(4, "I", "c2", 0, role="asst", text="x", amount=2),
            _patch_ev(5, "D", "c2", 0),                     # delete
            _patch_ev(6, "I", "c2", 0, text="fresh"),       # re-insert after delete
        ]
    )
    out = (
        coalesce_collapse(t, drop_tombstones=True)
        .to_pandas()
        .sort_values("conv_id")
        .reset_index(drop=True)
    )
    # c1: role from seq1, text from seq2, amount from seq3
    assert out.loc[0, ["role", "text"]].tolist() == ["user", "edited"]
    assert out.loc[0, "amount"] == 7
    assert out.loc[0, "seq"] == 3  # last writer stamps the row
    # c2: the delete RESET the row — pre-delete role/amount must not leak
    assert out.loc[1, "text"] == "fresh"
    assert pd.isna(out.loc[1, "role"]) and pd.isna(out.loc[1, "amount"])
    # tombstone-last key kept as tombstone without drop
    t2 = pa.concat_tables([t, _patch_table([_patch_ev(7, "D", "c1", 0)])])
    out2 = coalesce_collapse(t2, drop_tombstones=False).to_pandas()
    r = out2[out2["conv_id"] == "c1"].iloc[0]
    assert r["op"] == "D" and pd.isna(r["text"])
    assert coalesce_collapse(t2, drop_tombstones=True).num_rows == 1


def test_coalesce_ingest_epochs_equal_one_shot_and_sql_oracle(tmp_path):
    """Multi-epoch ingest == single-epoch ingest (per-epoch collapse is
    associative with merge-on-read under seq ordering), and both equal
    a DuckDB oracle: last non-null per column after the key's last
    delete, last writer by seq."""
    import duckdb

    rng = np.random.default_rng(7)
    rows = []
    for seq in range(400):
        conv = f"c{rng.integers(0, 12)}"
        turn = int(rng.integers(0, 4))
        if rng.random() < 0.05:
            rows.append(_patch_ev(seq, "D", conv, turn))
            continue
        # each update patches a random subset of columns
        rows.append(
            _patch_ev(
                seq,
                "U" if rng.random() < 0.7 else "I",
                conv,
                turn,
                role=f"r{rng.integers(0, 3)}" if rng.random() < 0.5 else None,
                text=f"t{seq}" if rng.random() < 0.6 else None,
                amount=int(rng.integers(1, 99)) if rng.random() < 0.4 else None,
            )
        )
    events = _patch_table(rows)
    cols = ["conv_id", "turn_idx", "role", "text", "amount", "ts"]

    def run(root, n_segments, per_epoch):
        segs = fx.write_segments(events, f"{root}/wal", n_segments=n_segments)
        t = DeltaTable.create(
            f"{root}/t", num_partitions=4, num_salts=2, merge_policy="coalesce"
        )
        ing.run_stream(t, segs, segments_per_epoch=per_epoch)
        return (
            ing.snapshot(t)
            .to_pandas()[cols]
            .sort_values(["conv_id", "turn_idx"])
            .reset_index(drop=True)
        )

    multi = run(str(tmp_path / "m"), 6, 1)   # 6 epochs
    single = run(str(tmp_path / "s"), 1, 1)  # 1 epoch
    pd.testing.assert_frame_equal(multi, single)

    con = duckdb.connect()
    con.register("ev", events)
    want = con.execute(
        """
        WITH lastd AS (
            -- reset boundary on a doubled axis: D at seq excludes seq
            -- itself, I includes itself (full image) — the kernel's rule
            SELECT conv_id, turn_idx,
                   coalesce(max(CASE WHEN op = 'D' THEN 2 * seq
                                     WHEN op = 'I' THEN 2 * seq - 1
                                END), -1) AS bseq
            FROM ev GROUP BY conv_id, turn_idx
        )
        SELECT e.conv_id, e.turn_idx,
               arg_max(e.role, e.seq) FILTER (e.role IS NOT NULL) AS role,
               arg_max(e.text, e.seq) FILTER (e.text IS NOT NULL) AS text,
               arg_max(e.amount, e.seq) FILTER (e.amount IS NOT NULL) AS amount,
               arg_max(e.ts, e.seq) AS ts
        FROM ev e JOIN lastd d USING (conv_id, turn_idx)
        WHERE 2 * e.seq > d.bseq AND e.op <> 'D'
        GROUP BY e.conv_id, e.turn_idx
        ORDER BY e.conv_id, e.turn_idx
        """
    ).df()
    want["turn_idx"] = want["turn_idx"].astype(multi["turn_idx"].dtype)
    want["amount"] = want["amount"].astype(multi["amount"].dtype)
    pd.testing.assert_frame_equal(multi, want.reset_index(drop=True))


def test_coalesce_rejects_out_of_band_batches(tmp_path):
    """apply_changes / delete_where mint seq=-1, which sorts EARLIEST
    under coalesce's strict-seq order: the batch would be silently
    inert (a delete that retains data). Both must fail fast on a
    coalesce table instead."""
    root = str(tmp_path)
    t = DeltaTable.create(
        f"{root}/t", num_partitions=2, num_salts=1, merge_policy="coalesce"
    )
    events = _events_table(
        [_ev(1, "I", "c1", 0, 100, 10), _ev(2, "U", "c1", 0, 200, 5)]
    )
    segs = fx.write_segments(events, f"{root}/wal", n_segments=1)
    ing.run_stream(t, segs, segments_per_epoch=1)

    batch = pa.table(
        {
            "conv_id": pa.array(["c1"], pa.string()),
            "turn_idx": pa.array([0], pa.int32()),
            "amount": pa.array([99], pa.int64()),
        }
    )
    with pytest.raises(ValueError, match="coalesce"):
        ing.apply_changes(t, batch, batch_id="patch-1")
    with pytest.raises(ValueError, match="coalesce"):
        ing.delete_where(
            t,
            predicate=lambda b: pa.compute.equal(b.column("conv_id"), "c1"),
            columns=["conv_id"],
            batch_id="kill-c1",
        )
    # nothing landed: state unchanged, no stray epochs
    snap = ing.snapshot(t).to_pandas()
    assert snap["amount"].tolist() == [15] or snap["amount"].tolist() == [5]
