"""Stream-table enrichment (stages.BroadcastLookup) inside the ingest
DAG, and consumer-cursor rewind composing with table restore."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from xgeo_ray import fixtures as fx
from xgeo_ray.pipelines import ingest as ing
from xgeo_ray.schemas import TRANSCRIPTS_SCHEMA
from xgeo_ray.stages.enrich import BroadcastLookup
from xgeo_ray.state import consumers as cons
from xgeo_ray.state.delta_table import DeltaTable


def _dim(convs):
    tiers = ["gold" if i % 2 == 0 else "free" for i in range(len(convs))]
    return pa.table({"conv_id": convs, "tier": tiers})


def test_broadcast_lookup_enriches_ingest(tmp_path):
    root = str(tmp_path)
    events = fx.make_change_events(400, n_convs=6, turns_per_conv=4, dup_fraction=0.0)
    segs = fx.write_segments(events, f"{root}/wal", n_segments=2)
    # enriched column DECLARED in the base schema, FILLED by the stage
    schema = TRANSCRIPTS_SCHEMA.append(pa.field("tier", pa.string()))
    table = DeltaTable.create(
        f"{root}/t", num_partitions=4, num_salts=1, base_schema=schema
    )
    convs = sorted(set(events.column("conv_id").to_pylist()))
    known = convs[: len(convs) // 2]  # half the keys enrich, half stay null
    stage = BroadcastLookup(_dim(known), on="conv_id")
    ing.run_stream(table, segs, segments_per_epoch=2, transform=stage)

    got = ing.snapshot(table).to_pandas()
    want_tier = {
        c: ("gold" if i % 2 == 0 else "free") for i, c in enumerate(known)
    }
    matched = got[got.conv_id.isin(known)]
    assert len(matched) > 0
    assert (matched["tier"] == matched["conv_id"].map(want_tier)).all()
    assert got[~got.conv_id.isin(known)]["tier"].isna().all()


def test_broadcast_lookup_rejects_duplicate_keys():
    dim = pa.table({"conv_id": ["a", "a"], "tier": ["x", "y"]})
    with pytest.raises(ValueError, match="duplicate"):
        BroadcastLookup(dim, on="conv_id")


def test_partitioned_lookup_parity_with_broadcast(tmp_path):
    """PartitionedLookup (bucketed object-store dimension, per-batch
    bucket fetch) enriches the ingest DAG identically to the broadcast
    path, against a dimension WIDER than any sane broadcast threshold
    relative to the stream (100k keys, many more than the stream
    touches — only touched buckets are ever fetched)."""
    import ray

    from xgeo_ray.stages.enrich import PartitionedLookup

    root = str(tmp_path)
    events = fx.make_change_events(600, n_convs=8, turns_per_conv=5, dup_fraction=0.0)
    segs = fx.write_segments(events, f"{root}/wal", n_segments=2)
    convs = sorted(set(events.column("conv_id").to_pylist()))
    # large dimension: the stream's convs plus ~100k cold keys
    big = pa.table(
        {
            "conv_id": convs + [f"cold{i}" for i in range(100_000)],
            "tier": [("gold" if i % 2 == 0 else "free") for i in range(len(convs))]
            + ["cold" for _ in range(100_000)],
        }
    )
    schema = TRANSCRIPTS_SCHEMA.append(pa.field("tier", pa.string()))

    outs = {}
    for name, stage in (
        ("bcast", BroadcastLookup(big, on="conv_id")),
        (
            "part",
            PartitionedLookup(
                ray.data.from_arrow(big).repartition(16), on="conv_id"
            ),
        ),
    ):
        t = DeltaTable.create(
            f"{root}/{name}", num_partitions=4, num_salts=1, base_schema=schema
        )
        ing.run_stream(t, segs, segments_per_epoch=2, transform=stage)
        outs[name] = (
            ing.snapshot(t)
            .to_pandas()
            .sort_values(["conv_id", "turn_idx"])
            .reset_index(drop=True)
        )
    import pandas as pd

    pd.testing.assert_frame_equal(outs["bcast"], outs["part"])
    assert outs["part"]["tier"].notna().all()


def test_partitioned_lookup_rejects_duplicate_keys():
    import ray

    from xgeo_ray.stages.enrich import PartitionedLookup

    dim = pa.table({"conv_id": ["a", "a", "b"], "tier": ["x", "y", "z"]})
    with pytest.raises(ValueError, match="duplicate"):
        PartitionedLookup(ray.data.from_arrow(dim), on="conv_id")


def test_partitioned_lookup_left_nulls_and_empty_batch():
    import ray

    from xgeo_ray.stages.enrich import PartitionedLookup

    dim = pa.table({"conv_id": ["a"], "tier": ["gold"]})
    stage = PartitionedLookup(ray.data.from_arrow(dim), on="conv_id")
    got = stage(pa.table({"conv_id": ["a", "zz"], "v": [1, 2]}))
    assert got.column("tier").to_pylist() == ["gold", None]
    empty = stage(pa.table({"conv_id": pa.array([], pa.string())}))
    assert empty.num_rows == 0 and "tier" in empty.column_names


def test_broadcast_lookup_in_stage_chain(tmp_path):
    from xgeo_ray.extension import StageChain, register_stage

    root = str(tmp_path)
    events = fx.make_change_events(200, n_convs=4, turns_per_conv=4, dup_fraction=0.0)
    segs = fx.write_segments(events, f"{root}/wal", n_segments=1)
    schema = TRANSCRIPTS_SCHEMA.append(pa.field("tier", pa.string()))
    table = DeltaTable.create(
        f"{root}/t", num_partitions=4, num_salts=1, base_schema=schema
    )
    convs = sorted(set(events.column("conv_id").to_pylist()))
    register_stage("enrich-tier", BroadcastLookup(_dim(convs), on="conv_id"))

    def upper_text(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        i = t.schema.get_field_index("text")
        return t.set_column(i, "text", pc.utf8_upper(t.column("text")))

    register_stage("upper-text", upper_text)
    ing.run_stream(
        table, segs, transform=StageChain(["enrich-tier", "upper-text"])
    )
    got = ing.snapshot(table).to_pandas()
    assert got["tier"].notna().all()
    live = got[got.text.notna() & (got.text != "")]
    assert live["text"].str.isupper().all()


def test_rewind_replays_feed_and_unblocks_restore(tmp_path):
    root = str(tmp_path)
    events = fx.make_change_events(400, n_convs=6, turns_per_conv=4, dup_fraction=0.0)
    segs = fx.write_segments(events, f"{root}/wal", n_segments=3)
    table = DeltaTable.create(f"{root}/t", num_partitions=4, num_salts=1)
    ing.run_stream(table, segs, segments_per_epoch=1)  # epochs 1..3

    c = cons.Consumer(table, "sink")
    feed1, upto = c.poll()
    n_all = feed1.count()
    assert c.ack(upto) and c.position() == 3
    # nothing new
    feed2, upto2 = c.poll()
    assert upto2 == 3 and feed2.count() == 0
    # rewind to 1 -> epochs 2..3 replay
    assert cons.rewind(table, "sink", 1) == 1
    feed3, upto3 = c.poll()
    assert upto3 == 3 and 0 < feed3.count() < n_all
    # rewind is idempotent and never moves forward: a target ahead of
    # the cursor (e.g. a typo'd epoch) raises instead of fast-forwarding
    # the group past unconsumed epochs
    assert c.rewind(1) == 1
    import pytest as _pytest

    with _pytest.raises(ValueError, match="AHEAD"):
        c.rewind(30)
    assert c.position() == 1

    # restore guard composes: acked-past-target blocks, rewind unblocks
    c.ack(3)
    with pytest.raises(ValueError, match="consumer group"):
        ing.restore(table, 2)
    c.rewind(2)
    m = ing.restore(table, 2)
    assert m.kind == "restore"
    assert ing.fsck(table)["ok"]
