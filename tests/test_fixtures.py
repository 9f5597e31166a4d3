import numpy as np
import pyarrow.compute as pc

from xgeo_ray import fixtures as fx
from xgeo_ray.schemas import CHANGE_EVENTS_SCHEMA, TRANSCRIPTS_SCHEMA


def test_transcripts_shape_and_determinism():
    t = fx.make_transcripts(7, 5)
    assert t.num_rows == 35
    assert t.schema == TRANSCRIPTS_SCHEMA
    assert t.equals(fx.make_transcripts(7, 5))


def test_change_events_determinism_and_dups():
    ev = fx.make_change_events(500, n_convs=10, turns_per_conv=5, dup_fraction=0.05)
    assert ev.equals(fx.make_change_events(500, n_convs=10, turns_per_conv=5, dup_fraction=0.05))
    assert ev.schema == CHANGE_EVENTS_SCHEMA
    seq = ev.column("seq").to_numpy()
    assert len(seq) == 525  # 500 + 5% duplicates
    assert len(np.unique(seq)) == 500
    # originals appear in seq order; duplicates strictly after originals
    first_pos = {}
    for i, s in enumerate(seq):
        if s not in first_pos:
            first_pos[s] = i
    lastseen = -1
    for s, i in sorted(first_pos.items()):
        assert i > lastseen or s == 0
    ops = set(ev.column("op").to_pylist())
    assert ops == {"I", "U", "D"}


def test_delete_rows_have_null_payload():
    ev = fx.make_change_events(300, dup_fraction=0)
    d = ev.filter(pc.equal(ev.column("op"), "D"))
    assert d.num_rows > 0
    assert d.column("text").null_count == d.num_rows
    assert d.column("role").null_count == d.num_rows


def test_evolve_events_schema():
    ev = fx.make_change_events(100, dup_fraction=0)
    e2 = fx.evolve_events(ev)
    assert e2.schema.field("turn_idx").type == "int64"
    assert "meta" in e2.schema.names
    u = e2.filter(pc.equal(e2.column("op"), "U"))
    assert u.column("meta").null_count == 0


def test_naive_final_state_lww(tmp_path):
    import pyarrow as pa

    base = fx.make_transcripts(2, 2)
    # one update wins by ts, one delete, one late event loses by ts
    ev = pa.table(
        {
            "seq": pa.array([10, 11, 12], pa.int64()),
            "op": ["U", "D", "U"],
            "conv_id": ["conv-000000", "conv-000001", "conv-000000"],
            "turn_idx": pa.array([0, 0, 1], pa.int32()),
            "role": ["user", None, "user"],
            "text": ["winner", None, "late-loser"],
            "tool": ["", None, ""],
            "ts": pa.array(
                [fx.BASE_TS_US + 10**9, fx.BASE_TS_US + 10**9, fx.BASE_TS_US - 1],
                pa.timestamp("us"),
            ),
        },
        schema=fx.CHANGE_EVENTS_SCHEMA,
    )
    st = fx.naive_final_state(base, ev).to_pandas().set_index(["conv_id", "turn_idx"])
    assert st.loc[("conv-000000", 0), "text"] == "winner"
    assert ("conv-000001", 0) not in st.index  # deleted
    assert st.loc[("conv-000000", 1), "text"] != "late-loser"  # base ts is newer
