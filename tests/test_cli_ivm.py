"""CLI wiring for the IVM surface: agg-view / index / find /
assemble-sync / changes --with-before, driven in-process through
main() (the session Ray fixture makes _init_ray a no-op)."""

import json

import pyarrow.parquet as pq
import pandas as pd

from xgeo_ray import fixtures as fx
from xgeo_ray.__main__ import main
from xgeo_ray.pipelines import ingest as ing
from xgeo_ray.schemas import ASSEMBLED_SCHEMA
from xgeo_ray.state.delta_table import DeltaTable


def test_cli_ivm_surface(tmp_path, capsys):
    root = str(tmp_path)
    events = fx.make_change_events(600, n_convs=8, turns_per_conv=4)
    segs = fx.write_segments(events, f"{root}/wal", n_segments=1)
    src = DeltaTable.create(f"{root}/src", num_partitions=4, num_salts=2)
    ing.run_stream(src, segs, segments_per_epoch=1)
    snap = ing.snapshot(src).to_pandas()

    assert main([
        "agg-view", f"{root}/src", f"{root}/agg", "--group-by", "role",
    ]) in (0, None)
    st = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert st["last_epoch"] == src.latest_epoch()

    assert main([
        "index", f"{root}/src", f"{root}/idx", "role", "--buckets", "4",
    ]) in (0, None)
    capsys.readouterr()
    val = snap["role"].dropna().iloc[0]
    assert main(["find", f"{root}/src", f"{root}/idx", str(val)]) in (0, None)
    rows = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert len(rows) == int((snap["role"] == val).sum())

    DeltaTable.create(
        f"{root}/asm", num_partitions=2, num_salts=1,
        base_schema=ASSEMBLED_SCHEMA,
    )
    assert main([
        "assemble-sync", f"{root}/asm", f"{root}/src",
    ]) in (0, None)
    st = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert st["convs"] > 0
    got = ing.snapshot(DeltaTable.open(f"{root}/asm")).to_pandas()
    want = ing.assemble_conversations(src).to_pandas()
    assert len(got) == len(want)

    assert main([
        "sync-scd2", f"{root}/src", f"{root}/scd2", "--init",
        "--num-partitions", "4",
    ]) in (0, None)
    st = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert st["last_epoch"] == src.latest_epoch() and st["versions"] > 0
    from xgeo_ray.pipelines import ivm as _ivm

    scd2 = _ivm.read_scd2(DeltaTable.open(f"{root}/scd2")).to_pandas()
    live = scd2[scd2["valid_to"].isna()]
    assert len(live) == len(snap)  # one open version per live key
    # re-run follows (no-op when caught up), without --init
    assert main(["sync-scd2", f"{root}/src", f"{root}/scd2"]) in (0, None)
    st = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert st["synced_epochs"] == 0

    assert main([
        "changes", f"{root}/src", f"{root}/feed", "--with-before",
    ]) in (0, None)
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    import glob

    feed = pd.concat(
        [pq.read_table(p).to_pandas() for p in glob.glob(f"{root}/feed/*.parquet")]
    )
    assert out["rows"] == len(feed)
    assert "_before_text" in feed.columns and "_after_exists" in feed.columns


def test_cli_find_coerces_value_to_indexed_column_type(tmp_path, capsys):
    """`find` takes the probe value as an argv STRING; on an int-typed
    index the raw string would hash to the wrong bucket (string vs int
    siphash path). The CLI must cast to the indexed column's type — and
    fail fast on an uncastable value."""
    import numpy as np
    import pyarrow as pa
    import pytest

    root = str(tmp_path)
    n = 60
    events = pa.table(
        {
            "seq": pa.array(np.arange(1, n + 1), pa.int64()),
            "op": pa.array(["I"] * n),
            "conv_id": pa.array([f"c{i % 12}" for i in range(n)]),
            "turn_idx": pa.array(np.arange(n) // 12, pa.int32()),
            "ts": pa.array(
                np.full(n, 1_700_000_000_000_000) + np.arange(n),
                pa.timestamp("us"),
            ),
            "amount": pa.array((np.arange(n) % 7).astype("int64"), pa.int64()),
        }
    )
    segs = fx.write_segments(events, f"{root}/wal", n_segments=1)
    src = DeltaTable.create(f"{root}/src", num_partitions=2, num_salts=1)
    ing.run_stream(src, segs, segments_per_epoch=1)
    snap = ing.snapshot(src).to_pandas()

    assert main([
        "index", f"{root}/src", f"{root}/amt_idx", "amount", "--buckets", "4",
    ]) in (0, None)
    capsys.readouterr()
    assert main(["find", f"{root}/src", f"{root}/amt_idx", "3"]) in (0, None)
    rows = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert len(rows) == int((snap["amount"] == 3).sum()) > 0
    assert all(r["amount"] == 3 for r in rows)
    with pytest.raises(SystemExit, match="does not cast"):
        main(["find", f"{root}/src", f"{root}/amt_idx", "not-an-int"])
