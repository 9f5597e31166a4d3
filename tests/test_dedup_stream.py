"""Streaming exactly-once dedup corpus: sync_derived + ContentKeyStage
re-keys the change feed by content hash, so the sink's LWW keeps one
row per distinct text — incrementally, crash-safe, no batch dedup job."""

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from xgeo_ray import fixtures as fx
from xgeo_ray.functions.dedup import ContentKeyStage
from xgeo_ray.pipelines import ingest as ing
from xgeo_ray.schemas import TRANSCRIPTS_SCHEMA
from xgeo_ray.state.delta_table import DeltaTable


def _expected_corpus(events: pa.Table, n_epochs: int) -> pd.DataFrame:
    """Pandas oracle at the feed's granularity: the change feed carries
    per-key COMMITTED state changes, so the corpus holds, per distinct
    text among the per-(key, epoch) LWW winners that are not deletes,
    the latest (ts, seq) winner that carried it."""
    df = events.to_pandas()
    n = len(df)
    bounds = [round(i * n / n_epochs) for i in range(n_epochs + 1)]
    df["epoch"] = 0
    for k in range(n_epochs):
        df.iloc[bounds[k] : bounds[k + 1], df.columns.get_loc("epoch")] = k
    # at-least-once replays (duplicated rows, same seq) are dropped by
    # the source: in-epoch exact dedup or the partition seq watermark —
    # either way only the FIRST occurrence applies
    df = df.drop_duplicates(subset=["conv_id", "turn_idx", "seq"], keep="first")
    winners = (
        df.sort_values(["ts", "seq"])
        .groupby(["conv_id", "turn_idx", "epoch"], as_index=False)
        .last()
    )
    winners = winners[winners["op"] != "D"]
    win = (
        winners.sort_values(["ts", "seq"])
        .groupby("text", as_index=False)
        .last()[["text", "conv_id", "turn_idx"]]
        .rename(columns={"conv_id": "orig_conv_id", "turn_idx": "orig_turn_idx"})
    )
    return win.sort_values("text").reset_index(drop=True)


def _sink_schema():
    return (
        TRANSCRIPTS_SCHEMA.append(pa.field("orig_conv_id", pa.string()))
        .append(pa.field("orig_turn_idx", pa.int64()))
    )


def test_dedup_corpus_follows_source(tmp_path):
    root = str(tmp_path)
    # duplicate-heavy stream: dup_fraction repeats texts across keys
    events = fx.make_change_events(
        900, n_convs=10, turns_per_conv=6, dup_fraction=0.3
    )
    segs = fx.write_segments(events, f"{root}/wal", n_segments=3)
    src = DeltaTable.create(f"{root}/src", num_partitions=4, num_salts=1)
    sink = DeltaTable.create(
        f"{root}/sink", num_partitions=4, num_salts=1, base_schema=_sink_schema()
    )
    # incremental: sync after each source epoch, not once at the end
    for s in segs:
        ing.run_stream(src, [s], segments_per_epoch=1)
        ing.sync_derived(src, sink, transform=ContentKeyStage())

    got = (
        ing.snapshot(sink, columns=["text", "orig_conv_id", "orig_turn_idx"])
        .to_pandas()
        .sort_values("text")
        .reset_index(drop=True)
    )
    got["orig_turn_idx"] = got["orig_turn_idx"].astype("int64")
    want = _expected_corpus(events, n_epochs=3)
    want["orig_turn_idx"] = want["orig_turn_idx"].astype("int64")
    pd.testing.assert_frame_equal(got, want)
    assert len(got) == want["text"].nunique()

    # repeat sync is an exactly-once no-op
    before = sink.latest_epoch()
    ing.sync_derived(src, sink, transform=ContentKeyStage())
    assert sink.latest_epoch() == before


def test_dedup_corpus_ignores_source_deletes(tmp_path):
    root = str(tmp_path)
    ev = pa.table(
        {
            "seq": pa.array([0, 1, 2], pa.int64()),
            "op": pa.array(["I", "I", "D"], pa.string()),
            "conv_id": pa.array(["a", "b", "a"], pa.string()),
            "turn_idx": pa.array([0, 0, 0], pa.int64()),
            "role": pa.array(["user"] * 3, pa.string()),
            "text": pa.array(["shared text", "shared text", ""], pa.string()),
            "ts": pa.array([1_000, 2_000, 3_000], pa.timestamp("us")),
        }
    )
    pq.write_table(ev, f"{root}/wal.parquet")
    src = DeltaTable.create(f"{root}/src", num_partitions=2, num_salts=1)
    sink = DeltaTable.create(
        f"{root}/sink", num_partitions=2, num_salts=1, base_schema=_sink_schema()
    )
    ing.run_stream(src, [f"{root}/wal.parquet"], segments_per_epoch=1)
    ing.sync_derived(src, sink, transform=ContentKeyStage())
    got = ing.snapshot(sink, columns=["text", "orig_conv_id"]).to_pandas()
    # key "a" deleted its copy, but "b" still carries the content: the
    # corpus keeps it (deletes are dropped by the stage by design)
    assert list(got["text"]) == ["shared text"]
    assert list(got["orig_conv_id"]) == ["b"]  # latest carrier wins LWW
