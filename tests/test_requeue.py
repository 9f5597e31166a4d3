"""DLQ requeue loop (sources/wal_writer.requeue_dlq): quarantine →
repair → requeue → re-apply; idempotent re-run; verbatim roundtrip
convergence for still-invalid rows; CLI."""

import json
import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from xgeo_ray import fixtures as fx
from xgeo_ray.pipelines import ingest as ing
from xgeo_ray.sources.wal_writer import requeue_dlq
from xgeo_ray.state.delta_table import DeltaTable


def _poisoned_stream(tmp_path, n=200, seed=51, n_bad=9):
    """Events with n_bad I/U rows carrying an invalid role."""
    ev = fx.make_change_events(n, n_convs=20, turns_per_conv=5,
                               dup_fraction=0.0, seed=seed)
    role = ev.column("role").to_pylist()
    op = ev.column("op").to_pylist()
    bad = [i for i in range(ev.num_rows) if op[i] != "D"][:n_bad]
    for i in bad:
        role[i] = "robot"
    ev = ev.set_column(ev.schema.get_field_index("role"), "role",
                       pa.array(role))
    seg = str(tmp_path / "w.parquet")
    pq.write_table(ev, seg)
    return ev, seg, bad


def test_requeue_repair_reapply(tmp_path, ray_session):
    ev, seg, bad = _poisoned_stream(tmp_path)
    root = str(tmp_path / "t")
    table = DeltaTable.create(root, num_partitions=2, num_salts=1)
    table.set_constraints(
        {"role_enum": {"col": "role", "in": ["user", "assistant", "tool"]}}
    )
    dlq = str(tmp_path / "dlq")
    wal = str(tmp_path / "wal")
    os.makedirs(wal, exist_ok=True)
    ing.run_stream(table, [seg], dlq_dir=dlq)
    table = DeltaTable.open(root)
    n_q = sum(m.totals.get("invalid", 0) for m in table.manifests())
    assert n_q == len(bad)

    def repair(t: pa.Table) -> pa.Table:
        i = t.schema.get_field_index("role")
        return t.set_column(
            i, "role",
            pc.replace_substring(t.column("role"), "robot", "tool"),
        )

    st = requeue_dlq(dlq, wal, repair=repair)
    assert st["rows"] == len(bad) and st["files"] >= 1
    # seqs minted FRESH (the WAL dir was empty → start at 0, but the
    # stream they join continues past the table watermark when fed
    # through run_stream as watermark-continuing segments); here we
    # re-feed the repaired rows as oob-style fresh stream into the
    # same table: their seqs must be strictly increasing
    assert st["first_seq"] == 0 and st["last_seq"] == len(bad) - 1

    # re-run is a no-op (files moved to requeued/)
    st2 = requeue_dlq(dlq, wal, repair=repair)
    assert st2 == {"files": 0, "rows": 0,
                   "first_seq": None, "last_seq": None}
    assert len(os.listdir(os.path.join(dlq, "requeued"))) >= 1

    # the repaired segments apply... but their minted seqs (0..8) sit
    # below the table's watermark — the documented flow for SAME-table
    # repair is a fresh table-side correction; verify the segments are
    # at least well-formed, ordered WAL input for a fresh consumer
    segs = sorted(
        os.path.join(wal, f) for f in os.listdir(wal)
        if f.endswith(".parquet")
    )
    t2root = str(tmp_path / "t2")
    t2 = DeltaTable.create(t2root, num_partitions=2, num_salts=1)
    ing.run_stream(t2, segs)
    got = ing.snapshot(DeltaTable.open(t2root)).to_pandas()
    assert len(got) >= 1
    assert set(got["role"]) <= {"user", "assistant", "tool"}


def test_requeue_verbatim_roundtrip_converges(tmp_path, ray_session):
    """Without repair, still-invalid rows simply re-quarantine (same
    row COUNT, fresh file names — re-minted seqs are hashed) and the
    consumed files move to requeued/ — the loop is bounded by the move
    markers, never grows."""
    ev, seg, bad = _poisoned_stream(tmp_path, seed=53, n_bad=5)
    root = str(tmp_path / "t")
    table = DeltaTable.create(root, num_partitions=2, num_salts=1)
    table.set_constraints(
        {"role_enum": {"col": "role", "in": ["user", "assistant", "tool"]}}
    )
    dlq = str(tmp_path / "dlq")
    wal = str(tmp_path / "wal")
    ing.run_stream(table, [seg], dlq_dir=dlq)

    requeue_dlq(dlq, wal)  # verbatim: rows still invalid
    # every consumed file is marked; the live queue is empty
    assert [f for f in os.listdir(dlq) if f.endswith(".parquet")] == []
    segs = sorted(
        os.path.join(wal, f) for f in os.listdir(wal)
        if f.endswith(".parquet")
    )
    # feeding them to a FRESH table with the same rule re-quarantines
    t2 = DeltaTable.create(str(tmp_path / "t2"), num_partitions=2,
                           num_salts=1)
    t2.set_constraints(
        {"role_enum": {"col": "role", "in": ["user", "assistant", "tool"]}}
    )
    dlq2 = str(tmp_path / "dlq2")
    ing.run_stream(t2, segs, dlq_dir=dlq2)
    q2 = pa.concat_tables(
        [pq.read_table(os.path.join(dlq2, f)) for f in os.listdir(dlq2)]
    )
    assert q2.num_rows == len(bad)
    assert set(q2.column("_reason").to_pylist()) == {"check:role_enum"}


def test_requeue_cli(tmp_path, ray_session, capsys):
    from xgeo_ray.__main__ import main

    ev, seg, bad = _poisoned_stream(tmp_path, seed=55, n_bad=3)
    root = str(tmp_path / "t")
    table = DeltaTable.create(root, num_partitions=2, num_salts=1)
    table.set_constraints(
        {"role_enum": {"col": "role", "in": ["user", "assistant", "tool"]}}
    )
    dlq = str(tmp_path / "dlq")
    ing.run_stream(table, [seg], dlq_dir=dlq)
    wal = str(tmp_path / "wal")
    assert main(["requeue", dlq, wal]) in (0, None)
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["rows"] == len(bad)


def test_requeue_into_live_wal_continues_seq_and_applies(
    tmp_path, ray_session
):
    """SAME-table repair flow: requeue into the table's LIVE producer
    WAL dir — WalWriter resumes the seq space from the dir's segment
    footers, so repaired rows mint seqs ABOVE the table watermark and
    the next run_stream applies them."""
    ev, _, bad = _poisoned_stream(tmp_path, seed=57, n_bad=4)
    wal = str(tmp_path / "wal")
    segs = fx.write_segments(ev, wal, n_segments=2)
    root = str(tmp_path / "t")
    table = DeltaTable.create(root, num_partitions=2, num_salts=1)
    table.set_constraints(
        {"role_enum": {"col": "role", "in": ["user", "assistant", "tool"]}}
    )
    dlq = str(tmp_path / "dlq")
    ing.run_stream(table, segs, dlq_dir=dlq)
    table = DeltaTable.open(root)
    wm = int(max(table.watermarks()))

    def repair(t: pa.Table) -> pa.Table:
        i = t.schema.get_field_index("role")
        return t.set_column(
            i, "role",
            pc.replace_substring(t.column("role"), "robot", "tool"),
        )

    st = requeue_dlq(dlq, wal, repair=repair)
    assert st["first_seq"] > wm  # continuity: above the watermark
    new_segs = sorted(
        os.path.join(wal, f)
        for f in os.listdir(wal)
        if f.endswith(".parquet")
    )
    ing.run_stream(DeltaTable.open(root), new_segs)
    snap = ing.snapshot(DeltaTable.open(root)).to_pandas()
    # every repaired key now carries a valid role in applied state
    orig = ev.to_pandas().iloc[bad]
    for _, r in orig.iterrows():
        m = snap[(snap.conv_id == r.conv_id) & (snap.turn_idx == r.turn_idx)]
        if len(m):  # unless a later event deleted/updated the key
            assert m.iloc[0]["role"] != "robot"
    assert not (snap["role"] == "robot").any()


def test_requeue_restores_original_seq_order_and_missing_dir(tmp_path):
    """The union of hash-named quarantine files re-sorts by ORIGINAL
    seq before fresh seqs mint — coalesce tables merge by seq alone,
    so inverted file order must not invert patch order. A never-created
    DLQ dir is a clean no-op."""
    dlq = str(tmp_path / "dlq")
    os.makedirs(dlq)

    def _dlq_file(name, seqs, texts):
        t = pa.table(
            {
                "seq": pa.array(seqs, pa.int64()),
                "op": pa.array(["U"] * len(seqs)),
                "conv_id": pa.array(["k"] * len(seqs)),
                "turn_idx": pa.array([0] * len(seqs), pa.int64()),
                "text": pa.array(texts),
                "ts": pa.array([1_000_000] * len(seqs), pa.timestamp("us")),
                "_reason": pa.array(["check:x"] * len(seqs)),
            }
        )
        pq.write_table(t, os.path.join(dlq, name))

    # hash order (aaa < zzz) INVERTS original stream order (7 then 3)
    _dlq_file("dlq-aaa.parquet", [7], ["newer"])
    _dlq_file("dlq-zzz.parquet", [3], ["older"])
    wal = str(tmp_path / "wal")
    st = requeue_dlq(dlq, wal)
    assert st["rows"] == 2 and st["files"] == 2
    seg = sorted(
        os.path.join(wal, f) for f in os.listdir(wal)
        if f.endswith(".parquet")
    )
    out = pa.concat_tables([pq.read_table(s) for s in seg])
    order = out.take(
        pa.compute.sort_indices(out.column("seq"))
    ).column("text").to_pylist()
    assert order == ["older", "newer"]  # original order restored

    # a DLQ dir that never existed: clean zero result, no crash
    assert requeue_dlq(str(tmp_path / "ghost"), wal) == {
        "files": 0, "rows": 0, "first_seq": None, "last_seq": None
    }


def test_requeue_mixed_shape_dlq_and_correction_order(tmp_path):
    """Envelope-reject files keep raw segment types (int64 ts) while
    CHECK-reject files are canonical (timestamp ts) — the union must
    concat; and out-of-band corrections (seq<0/null) re-mint ABOVE all
    stream rows (a correction supersedes what it corrects)."""
    dlq = str(tmp_path / "dlq")
    os.makedirs(dlq)

    def _f(name, seqs, texts, ts_type):
        ts = [1_000_000 + i for i in range(len(seqs))]
        t = pa.table(
            {
                "seq": pa.array(seqs, pa.int64()),
                "op": pa.array(["U"] * len(seqs)),
                "conv_id": pa.array(["k"] * len(seqs)),
                "turn_idx": pa.array([0] * len(seqs), pa.int64()),
                "text": pa.array(texts),
                "ts": pa.array(ts, pa.int64())
                if ts_type == "int"
                else pa.array(ts, pa.timestamp("us")),
                "_reason": pa.array(["x"] * len(seqs)),
            }
        )
        pq.write_table(t, os.path.join(dlq, name))

    _f("dlq-aa.parquet", [None], ["correction"], "int")  # oob, raw shape
    _f("dlq-bb.parquet", [5], ["stream5"], "ts")  # check-reject, canonical
    _f("dlq-cc.parquet", [-1], ["oob2"], "ts")
    wal = str(tmp_path / "wal")
    st = requeue_dlq(dlq, wal)
    assert st["rows"] == 3
    seg = sorted(
        os.path.join(wal, f) for f in os.listdir(wal)
        if f.endswith(".parquet")
    )
    out = pa.concat_tables([pq.read_table(s) for s in seg])
    by_seq = out.take(pa.compute.sort_indices(out.column("seq")))
    texts = by_seq.column("text").to_pylist()
    assert texts[0] == "stream5"  # stream row first
    assert set(texts[1:]) == {"correction", "oob2"}  # oob rows above
