"""Dead-letter quarantine (NormalizeEvents dlq_dir): rejected rows are
written — original shape plus a `_reason` column — instead of only
counted, with content-hash file names so an at-least-once replay never
duplicates the queue.
"""

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from xgeo_ray import fixtures as fx
from xgeo_ray.pipelines import ingest as ing
from xgeo_ray.state.delta_table import DeltaTable


def _wal_with_bad_rows(tmp_path):
    events = fx.make_change_events(400, n_convs=6, turns_per_conv=4)
    df = events.to_pandas()
    # poison: 3 null conv_ids, 2 bad ops, 1 null seq
    df.loc[0:2, "conv_id"] = None
    df.loc[5:6, "op"] = "X"
    df["seq"] = df["seq"].astype("Int64")
    df.loc[9, "seq"] = None
    bad_idx = {0, 1, 2, 5, 6, 9}
    t = pa.Table.from_pandas(df, preserve_index=False).cast(events.schema)
    os.makedirs(tmp_path / "wal")
    segs = []
    half = t.num_rows // 2
    for k, sl in enumerate((t.slice(0, half), t.slice(half))):
        p = str(tmp_path / "wal" / f"segment-{k:05d}.parquet")
        pq.write_table(sl, p)
        segs.append(p)
    return segs, len(bad_idx)


def test_dlq_quarantines_rejected_rows(tmp_path):
    segs, n_bad = _wal_with_bad_rows(tmp_path)
    t = DeltaTable.create(str(tmp_path / "t"), num_partitions=2)
    dlq = str(tmp_path / "dlq")
    ms = ing.run_stream(t, segs, segments_per_epoch=1, dlq_dir=dlq)
    assert sum(m.totals.get("invalid", 0) for m in ms) == n_bad
    files = sorted(os.listdir(dlq))
    assert files and all(f.startswith("dlq-") for f in files)
    q = pa.concat_tables(
        [pq.read_table(os.path.join(dlq, f)) for f in files],
        promote_options="permissive",
    )
    assert q.num_rows == n_bad
    reasons = sorted(q.column("_reason").to_pylist())
    assert reasons.count("null_conv_id") == 3
    assert reasons.count("invalid_op") == 2
    assert reasons.count("null_seq") == 1
    # rejected rows keep their original payload for repair
    assert "text" in q.column_names and "op" in q.column_names

    # at-least-once replay: same chunks -> same content hashes -> the
    # queue does NOT grow (and the committed state doesn't change)
    t2 = DeltaTable.create(str(tmp_path / "t2"), num_partitions=2)
    ing.run_stream(t2, segs, segments_per_epoch=1, dlq_dir=dlq)
    assert sorted(os.listdir(dlq)) == files


def test_no_dlq_by_default(tmp_path):
    segs, n_bad = _wal_with_bad_rows(tmp_path)
    t = DeltaTable.create(str(tmp_path / "t"), num_partitions=2)
    ms = ing.run_stream(t, segs, segments_per_epoch=1)
    assert sum(m.totals.get("invalid", 0) for m in ms) == n_bad
    assert not (tmp_path / "dlq").exists()


def test_cli_ingest_dlq(tmp_path, capsys):
    from xgeo_ray.__main__ import main

    segs, n_bad = _wal_with_bad_rows(tmp_path)
    t = DeltaTable.create(str(tmp_path / "t"), num_partitions=2)
    dlq = str(tmp_path / "dlq")
    assert main(["ingest", t.root, *segs, "--dlq", dlq]) in (0, None)
    st = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert os.path.isdir(dlq) and len(os.listdir(dlq)) > 0
