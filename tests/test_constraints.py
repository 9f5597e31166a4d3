"""Declarative CHECK constraints (state/constraints.py): spec
validation, vectorized mask semantics, stream enforcement with DLQ
routing, mid-stream declaration, retroactive audit, rename retarget,
CLI."""

import json
import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from xgeo_ray import fixtures as fx
from xgeo_ray.pipelines import ingest as ing
from xgeo_ray.state.constraints import check_mask, validate_spec
from xgeo_ray.state.delta_table import DeltaTable


# ------------------------------------------------------------- spec checks
def test_validate_spec_rejections():
    with pytest.raises(ValueError, match="needs a 'col'"):
        validate_spec({"x": {"min": 0}})
    with pytest.raises(ValueError, match="engine column"):
        validate_spec({"x": {"col": "op", "in": ["I"]}})
    with pytest.raises(ValueError, match="unknown rule"):
        validate_spec({"x": {"col": "a", "geq": 0}})
    with pytest.raises(ValueError, match="no rules"):
        validate_spec({"x": {"col": "a"}})
    with pytest.raises(ValueError, match="non-empty list"):
        validate_spec({"x": {"col": "a", "in": []}})
    with pytest.raises(Exception):
        validate_spec({"x": {"col": "a", "matches": "("}})  # bad regex
    with pytest.raises(ValueError, match="':'"):
        validate_spec({"a:b": {"col": "a", "not_null": True}})
    # normalized copy round-trips
    spec = validate_spec({"r": {"col": "score", "min": 0, "max": 1}})
    assert spec == {"r": {"col": "score", "min": 0, "max": 1}}


# ------------------------------------------------------------ mask semantics
def _batch(**cols):
    return pa.table(cols)


def test_check_mask_null_passes_except_not_null():
    b = _batch(
        op=pa.array(["I", "I", "I"]),
        score=pa.array([0.5, None, 2.0], pa.float64()),
    )
    ok, why = check_mask(b, {"rng": {"col": "score", "min": 0, "max": 1}})
    assert ok.to_pylist() == [True, True, False]  # NULL passes min/max
    assert why.to_pylist() == [None, None, "check:rng"]
    ok2, _ = check_mask(b, {"nn": {"col": "score", "not_null": True}})
    assert ok2.to_pylist() == [True, False, True]


def test_check_mask_deletes_exempt_and_audit_mode():
    b = _batch(
        op=pa.array(["D", "I"]),
        role=pa.array([None, "robot"], pa.string()),
    )
    spec = {"enum": {"col": "role", "in": ["user", "assistant"]}}
    ok, _ = check_mask(b, spec)
    assert ok.to_pylist() == [True, False]  # D exempt
    ok2, _ = check_mask(b, spec, exempt_deletes=False)
    assert ok2.to_pylist() == [True, False]  # null still passes 'in'


def test_check_mask_first_fail_reason_and_lengths_regex():
    b = _batch(
        op=pa.array(["I", "I", "I", "I"]),
        text=pa.array(["ok", "", "way too long here", "bad\x00byte"]),
    )
    spec = {
        "a_len": {"col": "text", "min_len": 1, "max_len": 10},
        "b_clean": {"col": "text", "matches": r"^[^\x00]*$"},
    }
    ok, why = check_mask(b, spec)
    assert ok.to_pylist() == [True, False, False, False]
    # sorted name order: a_len fires first where both would fail
    assert why.to_pylist() == [None, "check:a_len", "check:a_len",
                               "check:b_clean"]


def test_check_mask_missing_column():
    b = _batch(op=pa.array(["I"]), x=pa.array([1]))
    ok, _ = check_mask(b, {"r": {"col": "ghost", "min": 0}})
    assert ok.to_pylist() == [True]
    ok2, why2 = check_mask(b, {"r": {"col": "ghost", "not_null": True}})
    assert ok2.to_pylist() == [False]
    assert why2.to_pylist() == ["check:r"]


# --------------------------------------------------------- stream enforcement
def _mk_events(n=300, seed=5):
    ev = fx.make_change_events(n, n_convs=20, turns_per_conv=5,
                               dup_fraction=0.0, seed=seed)
    return ev


def test_ingest_enforces_constraints_with_dlq(tmp_path, ray_session):
    ev = _mk_events()
    # poison some I/U rows with an invalid role; deletes stay exempt
    role = ev.column("role").to_pylist()
    op = ev.column("op").to_pylist()
    poisoned = [i for i in range(ev.num_rows) if op[i] != "D"][:17]
    for i in poisoned:
        role[i] = "robot"
    ev = ev.set_column(
        ev.schema.get_field_index("role"), "role", pa.array(role)
    )
    seg = str(tmp_path / "w.parquet")
    pq.write_table(ev, seg)

    root = str(tmp_path / "t")
    table = DeltaTable.create(root, num_partitions=4, num_salts=1)
    table.set_constraints(
        {"role_enum": {"col": "role", "in": ["user", "assistant", "tool"]}}
    )
    dlq = str(tmp_path / "dlq")
    ing.run_stream(table, [seg], dlq_dir=dlq)
    table = DeltaTable.open(root)

    # quarantined rows counted in lineage and written with reasons
    total_invalid = sum(
        m.totals.get("invalid", 0) for m in table.manifests()
    )
    assert total_invalid == len(poisoned)
    files = [os.path.join(dlq, f) for f in os.listdir(dlq)]
    q = pa.concat_tables([pq.read_table(f) for f in files])
    assert q.num_rows == len(poisoned)
    assert set(q.column("_reason").to_pylist()) == {"check:role_enum"}

    # applied state contains no violator
    snap = ing.snapshot(table).to_pandas()
    assert not (snap["role"] == "robot").any()

    # parity: final state == naive replay over the CLEAN stream
    keep = pa.array([i not in set(poisoned) for i in range(ev.num_rows)])
    clean = ev.filter(keep)
    import pandas as pd

    want = fx.naive_final_state(None, clean).to_pandas()
    got = snap.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    want = want.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[want.columns.tolist()], want, check_dtype=False
    )


def test_constraints_declared_mid_stream_gate_next_epoch(tmp_path, ray_session):
    ev = _mk_events(400, seed=9)
    half = ev.num_rows // 2
    segs = []
    for i, sl in enumerate([ev.slice(0, half), ev.slice(half)]):
        p = str(tmp_path / f"w{i}.parquet")
        pq.write_table(sl, p)
        segs.append(p)
    root = str(tmp_path / "t")
    table = DeltaTable.create(root, num_partitions=2, num_salts=1)
    ing.ingest_segments(table, [segs[0]])
    # declare AFTER epoch 1: retroactive rows stay, future ones gate
    table.set_constraints({"len": {"col": "text", "max_len": 3}})
    ing.ingest_segments(DeltaTable.open(root), [segs[1]])
    table = DeltaTable.open(root)
    ms = table.manifests()
    assert ms[0].totals.get("invalid", 0) == 0
    assert ms[1].totals.get("invalid", 0) > 0

    # retroactive audit sees the epoch-1 leftovers
    audit = ing.validate_table(table)
    snap = ing.snapshot(table).to_pandas()
    assert audit == {"len": int((snap["text"].str.len() > 3).sum())}


def test_rename_retargets_constraints(tmp_path, ray_session):
    ev = _mk_events(200, seed=13)
    seg = str(tmp_path / "w.parquet")
    pq.write_table(ev, seg)
    root = str(tmp_path / "t")
    table = DeltaTable.create(root, num_partitions=2, num_salts=1)
    table.set_constraints({"nn": {"col": "text", "not_null": True}})
    ing.ingest_segments(table, [seg])
    table = DeltaTable.open(root)
    ing.rename_column(table, "text", "body")
    table = DeltaTable.open(root)
    assert table.constraints() == {"nn": {"col": "body", "not_null": True}}
    # audit runs against the renamed (aliased) column
    assert ing.validate_table(table) == {"nn": 0}


def test_check_cli(tmp_path, ray_session, capsys):
    from xgeo_ray.__main__ import main

    ev = _mk_events(150, seed=21)
    seg = str(tmp_path / "w.parquet")
    pq.write_table(ev, seg)
    root = str(tmp_path / "t")
    table = DeltaTable.create(root, num_partitions=2, num_salts=1)
    ing.ingest_segments(table, [seg])

    spec = json.dumps({"enum": {"col": "role",
                                "in": ["user", "assistant", "tool"]}})
    assert main(["check", root, "--set", spec, "--audit"]) in (0, None)
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["constraints"]["enum"]["col"] == "role"
    assert out["violations"] == {"enum": 0}
    assert main(["check", root, "--clear"]) in (0, None)
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["constraints"] == {}


# ----------------------------------------------- round-5 review-fix guards
def test_drop_columns_releases_constraints(tmp_path, ray_session):
    ev = _mk_events(150, seed=31)
    seg = str(tmp_path / "w.parquet")
    pq.write_table(ev, seg)
    root = str(tmp_path / "t")
    table = DeltaTable.create(root, num_partitions=2, num_salts=1)
    ing.ingest_segments(table, [seg])
    table = DeltaTable.open(root)
    table.set_constraints(
        {
            "nn": {"col": "tool", "not_null": True},
            "len": {"col": "text", "max_len": 1000},
        }
    )
    out = ing.drop_columns(table, ["tool"])
    assert out["released_constraints"] == ["nn"]
    table = DeltaTable.open(root)
    assert set(table.constraints()) == {"len"}
    # the surviving gate still works; no permanent total quarantine
    seg2 = str(tmp_path / "w2.parquet")
    ev2 = fx.make_change_events(100, n_convs=20, turns_per_conv=5,
                                dup_fraction=0.0, seed=32)
    # continue seqs past the watermark
    import pyarrow.compute as pc2

    bump = int(pc2.max(ev.column("seq")).as_py()) + 1
    ev2 = ev2.set_column(
        ev2.schema.get_field_index("seq"),
        "seq",
        pc2.add(ev2.column("seq"), bump),
    )
    pq.write_table(ev2, seg2)
    ms = ing.ingest_segments(table, [seg2])
    assert ms.totals.get("invalid", 0) == 0


def test_reshard_carries_constraints(tmp_path, ray_session):
    ev = _mk_events(200, seed=33)
    seg = str(tmp_path / "w.parquet")
    pq.write_table(ev, seg)
    root = str(tmp_path / "t")
    table = DeltaTable.create(root, num_partitions=2, num_salts=1)
    table.set_constraints({"len": {"col": "text", "max_len": 1000}})
    ing.ingest_segments(table, [seg])
    table = DeltaTable.open(root)
    new_root = str(tmp_path / "t2")
    ing.reshard(table, new_root, num_partitions=4)
    assert DeltaTable.open(new_root).constraints() == {
        "len": {"col": "text", "max_len": 1000}
    }


def test_coalesce_refuses_not_null(tmp_path):
    root = str(tmp_path / "t")
    table = DeltaTable.create(
        root, num_partitions=2, num_salts=1, merge_policy="coalesce"
    )
    with pytest.raises(ValueError, match="coalesce"):
        table.set_constraints({"nn": {"col": "text", "not_null": True}})
    # value rules stay legal (null = unchanged passes them)
    table.set_constraints({"len": {"col": "text", "max_len": 10}})


def test_declare_time_kernel_validation(tmp_path):
    root = str(tmp_path / "t")
    table = DeltaTable.create(root, num_partitions=2, num_salts=1)
    # RE2 refuses perl lookahead that Python's re accepts
    with pytest.raises(Exception, match="regular expression|regex"):
        table.set_constraints({"x": {"col": "text", "matches": "(?=a)b"}})
    # min/max against a string column fails at declare, not per epoch
    with pytest.raises(Exception):
        table.set_constraints({"x": {"col": "text", "min": 5}})
    # length rules on a non-string column fail at declare
    with pytest.raises(Exception):
        table.set_constraints({"x": {"col": "turn_idx", "max_len": 3}})
    # a sound spec still declares
    table.set_constraints({"ok": {"col": "text", "max_len": 100}})
    assert set(DeltaTable.open(root).constraints()) == {"ok"}


def test_check_cli_set_empty_clears(tmp_path, ray_session, capsys):
    from xgeo_ray.__main__ import main

    root = str(tmp_path / "t")
    table = DeltaTable.create(root, num_partitions=2, num_salts=1)
    table.set_constraints({"len": {"col": "text", "max_len": 9}})
    assert main(["check", root, "--set", "{}"]) in (0, None)
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["constraints"] == {}
    assert DeltaTable.open(root).constraints() == {}


def test_validate_refs(tmp_path, ray_session):
    """Cross-table FK audit: dangling = rows whose ref value has no
    match; nulls are unknown, not dangling."""
    ev = _mk_events(200, seed=41)
    seg = str(tmp_path / "w.parquet")
    pq.write_table(ev, seg)
    root = str(tmp_path / "facts")
    ing.ingest_segments(
        DeltaTable.create(root, num_partitions=2, num_salts=1), [seg]
    )
    facts = DeltaTable.open(root)
    snap = ing.snapshot(facts).to_pandas()

    # dimension table: conv_id values, but drop some and null none
    dims = sorted(set(snap["conv_id"]))[:-3]  # 3 convs dangle
    dt = pa.table(
        {
            "conv_id": pa.array(dims),
            "turn_idx": pa.array([0] * len(dims), pa.int64()),
            "role": pa.array(["user"] * len(dims)),
            "text": pa.array(["d"] * len(dims)),
            "ts": pa.array([1] * len(dims), pa.timestamp("us")),
            "op": pa.array(["I"] * len(dims)),
            "seq": pa.array(list(range(len(dims))), pa.int64()),
        }
    )
    seg2 = str(tmp_path / "d.parquet")
    pq.write_table(dt, seg2)
    droot = str(tmp_path / "dims")
    ing.ingest_segments(
        DeltaTable.create(droot, num_partitions=2, num_salts=1), [seg2]
    )
    dim = DeltaTable.open(droot)

    out = ing.validate_refs(facts, "conv_id", dim)
    missing = set(snap["conv_id"]) - set(dims)
    want_dangling = int(snap["conv_id"].isin(missing).sum())
    assert out == {
        "rows": len(snap),
        "null_refs": 0,
        "dangling": want_dangling,
    }
    # self-reference: zero dangling
    out2 = ing.validate_refs(facts, "conv_id", facts)
    assert out2["dangling"] == 0


def test_rewrite_rename_keeps_constraints(tmp_path, ray_session):
    """The rewrite-mode rename must retarget rules BEFORE its drop step
    (drop releases rules on the dropped name)."""
    ev = _mk_events(150, seed=43)
    seg = str(tmp_path / "w.parquet")
    pq.write_table(ev, seg)
    root = str(tmp_path / "t")
    table = DeltaTable.create(root, num_partitions=2, num_salts=1)
    table.set_constraints({"len": {"col": "text", "max_len": 1000}})
    ing.ingest_segments(table, [seg])
    table = DeltaTable.open(root)
    ing.rename_column(table, "text", "body", rewrite=True)
    assert DeltaTable.open(root).constraints() == {
        "len": {"col": "body", "max_len": 1000}
    }


def test_rewrite_rename_bypasses_constraints_no_data_loss(
    tmp_path, ray_session
):
    """A rewrite rename re-ingests full images of EXISTING state — a
    historic row violating a later-declared rule must survive the
    mechanical rewrite (prospective enforcement stays prospective).
    update_where stays gated (it authors new state)."""
    ev = _mk_events(200, seed=47)
    seg = str(tmp_path / "w.parquet")
    pq.write_table(ev, seg)
    root = str(tmp_path / "t")
    table = DeltaTable.create(root, num_partitions=2, num_salts=1)
    ing.ingest_segments(table, [seg])
    table = DeltaTable.open(root)
    before = ing.snapshot(table).count()
    # declare a rule EVERY current row violates
    table.set_constraints({"len": {"col": "text", "max_len": 0}})
    ing.rename_column(table, "text", "body", rewrite=True)
    table = DeltaTable.open(root)
    snap = ing.snapshot(table).to_pandas()
    assert len(snap) == before
    assert snap["body"].notna().any()  # values survived the rewrite
    assert table.constraints() == {"len": {"col": "body", "max_len": 0}}

    # update_where by contrast IS gated: a violating computed image
    # quarantines rather than applying
    import pyarrow.compute as pc2

    ing.update_where(
        table,
        lambda b: pc2.equal(b.column("role"), b.column("role")),
        {"body": "definitely too long"},
        batch_id="redact-1",
    )
    table = DeltaTable.open(root)
    snap2 = ing.snapshot(table).to_pandas()
    assert not (snap2["body"] == "definitely too long").any()
    inv = sum(m.totals.get("invalid", 0) for m in table.manifests())
    assert inv >= before


def test_apply_changes_gated_with_dlq(tmp_path, ray_session):
    """Gated corrections are recoverable: apply_changes(dlq_dir=)
    quarantines the violating row with its check reason."""
    root = str(tmp_path / "t")
    table = DeltaTable.create(root, num_partitions=2, num_salts=1)
    table.set_constraints({"len": {"col": "text", "max_len": 3}})
    dlq = str(tmp_path / "dlq")
    batch = pa.table(
        {
            "conv_id": pa.array(["a", "b"]),
            "turn_idx": pa.array([0, 0], pa.int64()),
            "text": pa.array(["ok", "way too long"]),
        }
    )
    ing.apply_changes(table, batch, batch_id="fix-1", dlq_dir=dlq)
    table = DeltaTable.open(root)
    snap = ing.snapshot(table).to_pandas()
    assert set(snap["conv_id"]) == {"a"}
    q = pa.concat_tables(
        [pq.read_table(os.path.join(dlq, f)) for f in os.listdir(dlq)]
    )
    assert q.num_rows == 1
    assert q.column("_reason")[0].as_py() == "check:len"


def test_constraints_gate_transform_output(tmp_path, ray_session):
    """With a user transform in the ingest DAG, CHECK rules evaluate
    the transform's OUTPUT — a rule on a stage-populated column must
    see the stage's values, not normalize's null-fill."""
    import pyarrow.compute as pc2

    ev = _mk_events(200, seed=71)
    seg = str(tmp_path / "w.parquet")
    pq.write_table(ev, seg)
    root = str(tmp_path / "t")
    base = pa.schema(
        list(pa.schema(
            [(f.name, f.type) for f in ev.schema]
        ))
    )
    table = DeltaTable.create(root, num_partitions=2, num_salts=1)
    # transform uppercases text; the rule forbids lowercase — every row
    # passes ONLY if the gate runs post-transform
    table.set_constraints(
        {"upper_only": {"col": "text", "matches": "^[^a-z]*$"}}
    )

    def upper(t: pa.Table) -> pa.Table:
        i = t.schema.get_field_index("text")
        return t.set_column(i, "text", pc2.utf8_upper(t.column("text")))

    ing.run_stream(table, [seg], transform=upper)
    table = DeltaTable.open(root)
    assert sum(m.totals.get("invalid", 0) for m in table.manifests()) == 0
    snap = ing.snapshot(table).to_pandas()
    assert len(snap) > 0
    assert snap["text"].str.islower().sum() == 0

    # and the gate still FIRES on transform output that violates
    root2 = str(tmp_path / "t2")
    t2 = DeltaTable.create(root2, num_partitions=2, num_salts=1)
    t2.set_constraints(
        {"no_upper": {"col": "text", "matches": "^[^A-Z]*$"}}
    )
    ing.run_stream(t2, [seg], transform=upper)
    t2 = DeltaTable.open(root2)
    inv = sum(m.totals.get("invalid", 0) for m in t2.manifests())
    n_ius = sum(1 for o in ev.column("op").to_pylist() if o != "D")
    assert inv == n_ius  # every transformed I/U row violates
