"""Conversation assembly: turns → one role-tagged training document.

Covers both execution paths — the zero-shuffle partition-local path
(num_salts=1) and the conv-keyed radix exchange a SALTED table needs
(the salt XOR scatters one conv's turns across partitions) — against a
pandas string-join oracle over the replayed LWW state."""

import pandas as pd

from xgeo_ray import fixtures as fx
from xgeo_ray.pipelines import ingest as ing
from xgeo_ray.state.delta_table import DeltaTable


def _oracle(table) -> pd.DataFrame:
    st = (
        ing.snapshot(table, columns=["conv_id", "turn_idx", "role", "text"])
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
    )
    st["line"] = st["role"].fillna("") + ": " + st["text"].fillna("")
    g = st.groupby("conv_id", sort=True)
    out = pd.DataFrame(
        {
            "n_turns": g.size(),
            "doc": g["line"].agg("\n".join),
        }
    ).reset_index()
    return out[["conv_id", "n_turns", "doc"]]


def _got(table) -> pd.DataFrame:
    df = ing.assemble_conversations(table).to_pandas()
    df["n_turns"] = df["n_turns"].astype("int64")
    return df.sort_values("conv_id").reset_index(drop=True)


def _build(tmp_path, name, num_salts):
    ev = fx.make_change_events(600, n_convs=12, turns_per_conv=5, seed=17)
    segs = fx.write_segments(ev, str(tmp_path / f"wal{name}"), n_segments=2)
    t = DeltaTable.create(
        str(tmp_path / name), num_partitions=4, num_salts=num_salts
    )
    ing.run_stream(t, segs, segments_per_epoch=1)
    return t


def test_assemble_unsalted_partition_local(tmp_path, ray_session):
    t = _build(tmp_path, "u", num_salts=1)
    exp = _oracle(t)
    got = _got(t)
    pd.testing.assert_frame_equal(
        got, exp.reset_index(drop=True), check_dtype=False
    )


def test_assemble_salted_radix_exchange(tmp_path, ray_session):
    t = _build(tmp_path, "s", num_salts=3)
    exp = _oracle(t)
    got = _got(t)
    pd.testing.assert_frame_equal(
        got, exp.reset_index(drop=True), check_dtype=False
    )
    # every conversation assembles exactly once even though its turns
    # span up to num_salts partitions
    assert got["conv_id"].is_unique


def test_assemble_empty_table(tmp_path, ray_session):
    t = DeltaTable.create(str(tmp_path / "e"), num_partitions=2, num_salts=2)
    ds = ing.assemble_conversations(t)
    assert ds.count() == 0
    # Dataset.to_pandas drops columns on an all-empty dataset; the
    # dataset schema itself must stay typed
    assert [f for f in ds.schema().names] == ["conv_id", "n_turns", "doc"]
