"""Model-based lifecycle test: random interleavings of ingest /
correction / minor compact / full compact / vacuum, each step checked
against a pandas LWW model — the interactions between the round-3
lifecycle features (out-of-band corrections, tiered folds, reclaim)
are where single-feature tests can't reach.
"""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from xgeo_ray import fixtures as fx
from xgeo_ray.pipelines import ingest as ing
from xgeo_ray.state.delta_table import DeltaTable


def _model_state(rows: pd.DataFrame) -> pd.DataFrame:
    """LWW by (ts, seq), tombstones dropped."""
    df = rows.sort_values(["ts", "seq"], kind="stable")
    df = df.drop_duplicates(subset=["conv_id", "turn_idx"], keep="last")
    df = df[df.op != "D"]
    return (
        df[["conv_id", "turn_idx", "text"]]
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )


def _engine_state(t) -> pd.DataFrame:
    df = ing.snapshot(t, columns=["conv_id", "turn_idx", "text"]).to_pandas()
    return df.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)


def _events(seq0, n, rng, ts0):
    convs = [f"c{rng.integers(0, 6)}" for _ in range(n)]
    ops = ["D" if rng.random() < 0.06 else "U" for _ in range(n)]
    return pa.table(
        {
            "seq": pa.array(np.arange(seq0, seq0 + n, dtype=np.int64)),
            "op": pa.array(ops),
            "conv_id": pa.array(convs),
            "turn_idx": pa.array(rng.integers(0, 4, n).astype("int32")),
            "text": pa.array([f"s{seq0 + i}" for i in range(n)]),
            "ts": pa.array(
                ts0 + np.arange(n, dtype=np.int64) * 10, pa.timestamp("us")
            ),
        }
    )


@pytest.mark.parametrize(
    "seed,history",
    [(1, "collapsed"), (2, "collapsed"), (3, "full"), (4, "full"),
     (5, "collapsed"), (6, "full")],
)
def test_random_lifecycle_against_model(tmp_path, seed, history):
    rng = np.random.default_rng(seed)
    t = DeltaTable.create(
        str(tmp_path / "t"), num_partitions=4, num_salts=1, history=history
    )
    model_rows: list[pd.DataFrame] = []
    seq = 0
    ts = 1_000_000
    n_batches = 0
    for step in range(12):
        op = rng.choice(
            ["ingest", "ingest", "ingest", "correct", "minor", "full", "vacuum"]
        )
        if op == "ingest":
            n = int(rng.integers(30, 90))
            ev = _events(seq, n, rng, ts)
            seq += n
            ts += n * 10 + 1_000
            d = str(tmp_path / f"wal{step}")
            segs = fx.write_segments(ev, d, n_segments=2)
            ing.ingest_segments(t, segs)
            model_rows.append(ev.to_pandas())
        elif op == "correct":
            n_batches += 1
            key_conv = f"c{rng.integers(0, 6)}"
            key_turn = int(rng.integers(0, 4))
            ts += 1_000
            batch = pa.table(
                {
                    "conv_id": pa.array([key_conv]),
                    "turn_idx": pa.array([key_turn], pa.int32()),
                    "text": pa.array([f"fix{n_batches}"]),
                }
            )
            ing.apply_changes(t, batch, batch_id=f"fix-{n_batches}", ts_us=ts)
            model_rows.append(
                pd.DataFrame(
                    {
                        "seq": [np.int64(-1)],
                        "op": ["U"],
                        "conv_id": [key_conv],
                        "turn_idx": [key_turn],
                        "text": [f"fix{n_batches}"],
                        "ts": [pd.Timestamp(ts, unit="us")],
                    }
                )
            )
        elif op == "minor":
            ing.compact(t, minor=True)
        elif op == "full":
            ing.compact(t)
        elif op == "vacuum":
            ing.vacuum(t)
        if model_rows:
            want = _model_state(pd.concat(model_rows, ignore_index=True))
            got = _engine_state(t)
            got["turn_idx"] = got["turn_idx"].astype(want["turn_idx"].dtype)
            pd.testing.assert_frame_equal(got, want), f"step {step} op {op}"


@pytest.mark.parametrize("seed", [11, 12, 13])
def test_random_lifecycle_with_restore_and_delete(tmp_path, seed):
    """The round-3 extension of the model test: RESTORE (rollback to a
    random committed epoch — the model rewinds to its recorded prefix)
    and DELETE_WHERE (predicate tombstones — the model appends D rows
    for every currently-live matching key) interleaved with ingest,
    corrections, folds and vacuum. Restore targets whose files vacuum
    already reclaimed must fail fast and change nothing."""
    rng = np.random.default_rng(seed)
    t = DeltaTable.create(str(tmp_path / "t"), num_partitions=4, num_salts=1)
    # the model is an append-only batch log plus an ACTIVE index list —
    # restore may target an epoch inside an already-rolled-back range
    # (the engine reproduces the ORIGINAL state there), so snapshots
    # must be index SETS, not prefix lengths
    all_batches: list[pd.DataFrame] = []
    active: list[int] = []
    hist: dict[int, list[int]] = {}  # committed epoch -> active indices
    seq = 0
    ts = 1_000_000
    n_batches = 0

    def model_rows():
        return [all_batches[i] for i in active]

    for step in range(14):
        op = rng.choice(
            [
                "ingest", "ingest", "ingest",
                "correct", "delete", "restore",
                "minor", "full", "vacuum",
            ]
        )
        if op == "ingest":
            n = int(rng.integers(30, 90))
            ev = _events(seq, n, rng, ts)
            seq += n
            ts += n * 10 + 1_000
            segs = fx.write_segments(ev, str(tmp_path / f"wal{step}"), n_segments=2)
            ing.ingest_segments(t, segs)
            all_batches.append(ev.to_pandas())
            active.append(len(all_batches) - 1)
        elif op == "correct":
            n_batches += 1
            key_conv = f"c{rng.integers(0, 6)}"
            key_turn = int(rng.integers(0, 4))
            ts += 1_000
            batch = pa.table(
                {
                    "conv_id": pa.array([key_conv]),
                    "turn_idx": pa.array([key_turn], pa.int32()),
                    "text": pa.array([f"fix{n_batches}"]),
                }
            )
            ing.apply_changes(t, batch, batch_id=f"fix-{n_batches}", ts_us=ts)
            all_batches.append(
                pd.DataFrame(
                    {
                        "seq": [np.int64(-1)],
                        "op": ["U"],
                        "conv_id": [key_conv],
                        "turn_idx": [key_turn],
                        "text": [f"fix{n_batches}"],
                        "ts": [pd.Timestamp(ts, unit="us")],
                    }
                )
            )
            active.append(len(all_batches) - 1)
        elif op == "delete":
            if not active:
                continue
            victim = f"c{rng.integers(0, 6)}"
            ts += 1_000
            n_batches += 1
            import pyarrow.compute as pc

            ing.delete_where(
                t,
                lambda b, v=victim: pc.equal(b.column("conv_id"), v),
                batch_id=f"del-{n_batches}",
                ts_us=ts,
            )
            cur = _model_state(pd.concat(model_rows(), ignore_index=True))
            doomed = cur[cur.conv_id == victim]
            if len(doomed):
                all_batches.append(
                    pd.DataFrame(
                        {
                            "seq": np.full(len(doomed), -1, np.int64),
                            "op": ["D"] * len(doomed),
                            "conv_id": doomed.conv_id.to_numpy(),
                            "turn_idx": doomed.turn_idx.to_numpy(),
                            "text": [None] * len(doomed),
                            "ts": [pd.Timestamp(ts, unit="us")] * len(doomed),
                        }
                    )
                )
                active.append(len(all_batches) - 1)
        elif op == "restore":
            targets = [e for e in hist if e < t.latest_epoch()]
            if not targets:
                continue
            target = int(rng.choice(targets))
            try:
                ing.restore(t, target)
            except ValueError:
                continue  # vacuumed history: engine refuses, model unchanged
            active = list(hist[target])
        elif op == "minor":
            ing.compact(t, minor=True)
        elif op == "full":
            ing.compact(t)
        elif op == "vacuum":
            ing.vacuum(t)
        hist[t.latest_epoch()] = list(active)
        if active:
            want = _model_state(pd.concat(model_rows(), ignore_index=True))
            got = _engine_state(t)
            got["turn_idx"] = got["turn_idx"].astype(want["turn_idx"].dtype)
            pd.testing.assert_frame_equal(got, want), f"step {step} op {op}"
    assert ing.fsck(t)["ok"], ing.fsck(t)["issues"]


@pytest.mark.parametrize("seed", [21, 22, 23])
def test_random_lifecycle_with_constraints(tmp_path, seed):
    """Round-5 extension: CHECK constraints interleaved with ingest /
    corrections / folds / vacuum. The model mirrors the gate: while a
    rule is declared, I/U rows violating it are EXCLUDED from the model
    batch (D rows pass; rows applied before the declaration stay).
    Declare/clear may happen at any step; every state must match the
    model exactly, and the quarantine totals must equal the model's
    excluded-row count."""
    rng = np.random.default_rng(seed)
    t = DeltaTable.create(str(tmp_path / "t"), num_partitions=4, num_salts=1)
    model_rows: list[pd.DataFrame] = []
    rule_cap: int | None = None  # active max_len on text, None = no rule
    excluded = 0
    seq = 0
    ts = 1_000_000
    n_batches = 0
    for step in range(14):
        op = rng.choice(
            ["ingest", "ingest", "ingest", "correct",
             "declare", "clear", "minor", "full", "vacuum"]
        )
        if op == "ingest":
            n = int(rng.integers(30, 90))
            ev = _events(seq, n, rng, ts)
            seq += n
            ts += n * 10 + 1_000
            segs = fx.write_segments(
                ev, str(tmp_path / f"wal{step}"), n_segments=2
            )
            ing.ingest_segments(t, segs)
            df = ev.to_pandas()
            if rule_cap is not None:
                bad = (df.op != "D") & (df.text.str.len() > rule_cap)
                excluded += int(bad.sum())
                df = df[~bad]
            model_rows.append(df)
        elif op == "correct":
            n_batches += 1
            key_conv = f"c{rng.integers(0, 6)}"
            key_turn = int(rng.integers(0, 4))
            ts += 1_000
            fix = f"fix{n_batches}"
            batch = pa.table(
                {
                    "conv_id": pa.array([key_conv]),
                    "turn_idx": pa.array([key_turn], pa.int32()),
                    "text": pa.array([fix]),
                }
            )
            ing.apply_changes(t, batch, batch_id=f"fix-{n_batches}", ts_us=ts)
            if rule_cap is not None and len(fix) > rule_cap:
                excluded += 1  # gated correction
            else:
                model_rows.append(
                    pd.DataFrame(
                        {
                            "seq": [np.int64(-1)],
                            "op": ["U"],
                            "conv_id": [key_conv],
                            "turn_idx": [key_turn],
                            "text": [fix],
                            "ts": [pd.Timestamp(ts, unit="us")],
                        }
                    )
                )
        elif op == "declare":
            # caps chosen around the fixture's text lengths (s<seq>)
            rule_cap = int(rng.integers(2, 6))
            t.set_constraints(
                {"cap": {"col": "text", "max_len": rule_cap}}
            )
        elif op == "clear":
            rule_cap = None
            t.set_constraints({})
        elif op == "minor":
            ing.compact(t, minor=True)
        elif op == "full":
            ing.compact(t)
        elif op == "vacuum":
            ing.vacuum(t)
        if model_rows:
            want = _model_state(pd.concat(model_rows, ignore_index=True))
            got = _engine_state(t)
            got["turn_idx"] = got["turn_idx"].astype(want["turn_idx"].dtype)
            pd.testing.assert_frame_equal(got, want), f"step {step} op {op}"
    total_invalid = sum(
        m.totals.get("invalid", 0)
        for m in DeltaTable.open(str(tmp_path / "t")).manifests()
    )
    assert total_invalid == excluded
    assert ing.fsck(t)["ok"]
