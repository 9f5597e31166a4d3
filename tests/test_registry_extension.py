import pyarrow as pa
import pyarrow.compute as pc
import pytest
import ray

from xgeo_ray import fixtures as fx
from xgeo_ray.extension import StageChain, register_stage, stage_names
from xgeo_ray.state.manifest import schema_to_json
from xgeo_ray.state.registry import CheckpointManager, SchemaRegistry


def test_schema_registry_versioning(tmp_path):
    from xgeo_ray.state.delta_table import DeltaTable

    DeltaTable.create(str(tmp_path / "t"), num_partitions=2, num_salts=1)
    reg = SchemaRegistry.remote(str(tmp_path / "t"))
    v0, s0 = ray.get(reg.current.remote())
    evolved = pa.schema([("conv_id", pa.string()), ("turn_idx", pa.int64()), ("meta", pa.string())])
    v1, s1 = ray.get(reg.observe.remote(schema_to_json(evolved)))
    assert v1 == v0 + 1
    assert ["meta", "string"] in s1
    # re-observing the same schema does not bump
    v2, _ = ray.get(reg.observe.remote(schema_to_json(evolved)))
    assert v2 == v1
    ray.kill(reg)


def test_checkpoint_manager(tmp_path):
    import pyarrow.parquet as pq

    from xgeo_ray.pipelines import ingest as ing
    from xgeo_ray.state.delta_table import DeltaTable

    ev = fx.make_change_events(200, n_convs=4, turns_per_conv=4)
    segs = fx.write_segments(ev, f"{tmp_path}/wal", n_segments=2)
    t = DeltaTable.create(f"{tmp_path}/t", num_partitions=4, num_salts=1)
    ing.run_stream(t, segs)
    cm = CheckpointManager.remote(f"{tmp_path}/t")
    wm = ray.get(cm.watermarks.remote())
    assert (wm >= 0).any()
    lin = ray.get(cm.lineage.remote())
    assert lin["events_read"] == ev.num_rows
    assert set(ray.get(cm.committed_segments.remote())) == set(segs)
    ray.kill(cm)


def test_stage_chain_composes_and_runs_on_ray():
    @register_stage("upper_role")
    def upper_role(t: pa.Table) -> pa.Table:
        return t.set_column(
            t.schema.get_field_index("role"), "role", pc.utf8_upper(t.column("role"))
        )

    @register_stage("drop_tools")
    def drop_tools(t: pa.Table) -> pa.Table:
        return t.filter(pc.not_equal(t.column("role"), "TOOL"))

    assert {"upper_role", "drop_tools"} <= set(stage_names())
    chain = StageChain(["upper_role", "drop_tools"])
    base = fx.make_transcripts(4, 6)
    out = chain.apply(ray.data.from_arrow(base)).take_all()
    roles = {r["role"] for r in out}
    assert roles == {"USER", "ASSISTANT"}


def test_stage_chain_unknown_stage():
    with pytest.raises(KeyError):
        StageChain(["nope"])


def test_user_stage_chain_inside_ingest_dag(tmp_path):
    """The registered-stage hook (the reference's Lua per-record script,
    SURVEY §2.10) runs inside the change-apply DAG: a redaction stage
    transforms every applied event, and the final state equals the
    oracle applied to the transformed stream."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    from xgeo_ray import fixtures as fx
    from xgeo_ray.extension import StageChain, register_stage
    from xgeo_ray.pipelines import ingest as ing
    from xgeo_ray.state.delta_table import DeltaTable

    @register_stage("redact-upper")
    def redact(t: pa.Table) -> pa.Table:
        i = t.schema.get_field_index("text")
        return t.set_column(i, "text", pc.utf8_upper(t.column("text")))

    root = str(tmp_path)
    ev = fx.make_change_events(300, n_convs=6, turns_per_conv=4, dup_fraction=0.02)
    segs = fx.write_segments(ev, f"{root}/wal", n_segments=2)
    table = DeltaTable.create(f"{root}/t", num_partitions=4, num_salts=2)
    ing.run_stream(
        table, segs, segments_per_epoch=2, transform=StageChain(["redact-upper"])
    )
    got = (
        ing.snapshot(table)
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    want = fx.naive_final_state(None, ev).to_pandas()
    assert got["text"].str.isupper().all()
    pd.testing.assert_frame_equal(
        got[["conv_id", "turn_idx"]].assign(text=got["text"]),
        want[["conv_id", "turn_idx"]]
        .assign(text=want["text"].str.upper())
        .reset_index(drop=True),
    )
