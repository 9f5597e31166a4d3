"""Schema evolution end-to-end (FIXTURES.md §3): added nullable column,
widened int — final schema is the union, pre-evolution rows null-filled."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from xgeo_ray import fixtures as fx
from xgeo_ray.pipelines import ingest as ing
from xgeo_ray.state.delta_table import DeltaTable


def test_evolution_end_to_end(tmp_path):
    root = str(tmp_path)
    base = fx.make_transcripts(8, 5)
    pq.write_table(base, f"{root}/base.parquet")
    ev = fx.make_change_events(600, n_convs=8, turns_per_conv=5, dup_fraction=0.02)
    segs = fx.write_segments(ev, f"{root}/wal", n_segments=4, evolve_from=2)

    table = DeltaTable.create(f"{root}/t", num_partitions=4, num_salts=2)
    ing.bootstrap_base(table, f"{root}/base.parquet")
    v0 = table.schema_version()
    ing.run_stream(table, segs[:2], segments_per_epoch=2)  # pre-evolution
    v1 = table.schema_version()
    ing.run_stream(table, segs[2:], segments_per_epoch=2)  # evolved segments
    v2 = table.schema_version()
    assert v1 == v0 + 1 or v1 == v0  # bootstrap may already bump
    assert v2 == v1 + 1  # evolution bumps the registry version

    env = table.current_schema()
    assert env.field("turn_idx").type == pa.int64()
    assert env.field("meta").type == pa.string()

    got = (
        ing.snapshot(table)
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    # oracle: evolve the whole stream (values identical; schema union) and reduce
    want = fx.naive_final_state(base, fx.evolve_events(ev)).to_pandas()
    # pre-evolution winners must have null meta; evolved U winners non-null
    assert got["meta"].notna().sum() > 0
    assert got["meta"].isna().sum() > 0
    pd.testing.assert_frame_equal(
        got[["conv_id", "turn_idx", "role", "text", "tool", "ts"]],
        want[["conv_id", "turn_idx", "role", "text", "tool", "ts"]],
    )


def test_evolution_meta_nullness_matches_segment_boundary(tmp_path):
    """The meta value of each surviving row must equal what the *evolved
    portion* of the stream said — winners from pre-evolution segments have
    meta null."""
    root = str(tmp_path)
    ev = fx.make_change_events(400, n_convs=6, turns_per_conv=4, dup_fraction=0)
    segs = fx.write_segments(ev, f"{root}/wal", n_segments=4, evolve_from=2)
    table = DeltaTable.create(f"{root}/t", num_partitions=4, num_salts=1)
    ing.run_stream(table, segs, segments_per_epoch=4)
    got = ing.snapshot(table, keep_lineage=True).to_pandas()

    # reconstruct the delivered stream exactly as the segments said it
    # (pre-evolution segments gain a null meta via permissive unification)
    delivered = pa.concat_tables(
        [pq.read_table(s) for s in segs], promote_options="permissive"
    )
    want = fx.naive_final_state(None, delivered).to_pandas()
    got = got.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["conv_id", "turn_idx", "text", "meta"]],
        want[["conv_id", "turn_idx", "text", "meta"]].reset_index(drop=True),
    )


def test_segment_missing_column_null_fills(tmp_path):
    """A WAL segment that LACKS a column of the table schema (producer
    downgrade / column drop) still ingests: the envelope stays the union
    and the segment's rows null-fill the missing column."""
    root = str(tmp_path)
    ev = fx.make_change_events(300, n_convs=6, turns_per_conv=4, dup_fraction=0)
    half = ev.num_rows // 2
    pq.write_table(ev.slice(0, half), f"{root}/s0.parquet")
    # second segment drops the 'tool' column entirely
    pq.write_table(ev.slice(half).drop_columns(["tool"]), f"{root}/s1.parquet")

    table = DeltaTable.create(f"{root}/t", num_partitions=4, num_salts=1)
    ing.run_stream(
        table, [f"{root}/s0.parquet", f"{root}/s1.parquet"], segments_per_epoch=2
    )
    got = (
        ing.snapshot(table)
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    assert "tool" in got.columns  # union schema retained
    # winners from the second half exist and carry null tool
    ev_df = fx.naive_final_state(None, ev).to_pandas()
    pd.testing.assert_frame_equal(
        got[["conv_id", "turn_idx", "text"]],
        ev_df[["conv_id", "turn_idx", "text"]].reset_index(drop=True),
    )
    # at least one surviving row originated in the tool-less segment
    late_winners = got.merge(
        ev.slice(half).to_pandas()[["conv_id", "turn_idx", "seq"]],
        on=["conv_id", "turn_idx"],
    )
    assert len(late_winners) > 0
    assert got["tool"].isna().any()


def test_evolution_across_pipelined_epochs_in_one_call(tmp_path):
    """Schema change BETWEEN two epochs of ONE pipelined run_stream call
    (epoch 2's evolved maps launch while epoch 1's pre-evolution reduces
    are in flight): cumulative envelope planning must give epoch 1 the
    old schema, epoch 2 the union, and the snapshot the evolved union
    with pre-evolution rows null-filled."""
    root = str(tmp_path)
    base = fx.make_transcripts(8, 5)
    pq.write_table(base, f"{root}/base.parquet")
    ev = fx.make_change_events(600, n_convs=8, turns_per_conv=5, dup_fraction=0.02)
    segs = fx.write_segments(ev, f"{root}/wal", n_segments=4, evolve_from=2)

    table = DeltaTable.create(f"{root}/t", num_partitions=4, num_salts=2)
    ms = ing.run_stream(
        table, segs, segments_per_epoch=2, bootstrap=f"{root}/base.parquet"
    )
    assert [m.epoch for m in ms] == [1, 2, 3]
    assert "meta" not in ms[1].schema().names  # pre-evolution epoch
    assert ms[2].schema().field("meta").type == pa.string()
    assert ms[2].schema_version == ms[1].schema_version + 1

    got = (
        ing.snapshot(table)
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    evolved = fx.evolve_events(ev)
    want = fx.naive_final_state(base, evolved).to_pandas()
    # naive reducer applies the evolved stream wholesale; engine evolved
    # only segments >= 2 — compare the invariant core columns and that
    # meta exists with nulls for pre-evolution keys
    assert "meta" in got.columns
    core = ["conv_id", "turn_idx", "text"]
    pd.testing.assert_frame_equal(got[core], want[core])
