"""Debezium-envelope CDC export (ivm.export_debezium).

The exported NDJSON must be a faithful re-encoding of the
before/after feed (itself certified against epoch time travel in
test_ivm): op c/u/d maps to the image-existence transition, images
carry the key + payload columns, absent->absent no-ops are dropped,
and the consumer-cursor path is exactly-once across crash replays at
every point of the files -> meta -> ack commit order.
"""

import glob
import gzip
import json
import os

import pandas as pd
import pytest

from xgeo_ray import fixtures as fx
from xgeo_ray.pipelines import ingest as ing
from xgeo_ray.pipelines import ivm
from xgeo_ray.state import consumers as cons
from xgeo_ray.state.delta_table import DeltaTable


@pytest.fixture(scope="module")
def src_table(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("dbz_src"))
    events = fx.make_change_events(1200, n_convs=12, turns_per_conv=5)
    segs = fx.write_segments(events, f"{root}/wal", n_segments=4)
    src = DeltaTable.create(f"{root}/src", num_partitions=4, num_salts=2)
    ing.run_stream(src, segs, segments_per_epoch=1)  # epochs 1..4
    return src, root


def _read_window(window_dir: str) -> list[dict]:
    recs = []
    for p in sorted(glob.glob(os.path.join(window_dir, "part-*.jsonl*"))):
        op = gzip.open if p.endswith(".gz") else open
        with op(p, "rt") as f:
            recs.extend(json.loads(line) for line in f if line.strip())
    return recs


def _feed_df(src, since=0, upto=None) -> pd.DataFrame:
    return ivm.changes_with_before(
        src, since_epoch=since, upto_epoch=upto
    ).to_pandas()


def test_export_matches_feed(src_table, tmp_path):
    src, _ = src_table
    out = str(tmp_path / "dbz")
    st = ivm.export_debezium(src, out)
    assert st["since"] == 0 and st["upto"] == 4 and not st["skipped"]
    recs = _read_window(os.path.join(out, "window=1-4"))
    assert len(recs) == st["rows"]

    feed = _feed_df(src)
    live = feed[feed["_before_exists"] | feed["_after_exists"]]
    assert len(recs) == len(live)

    def rec_key(r):
        img = r["after"] or r["before"]
        return (img["conv_id"], img["turn_idx"], r["source"]["epoch"])

    by_key = {rec_key(r): r for r in recs}
    assert len(by_key) == len(recs)  # one record per (key, epoch)
    payload = ["role", "text", "tool"]
    for row in live.to_dict("records"):
        r = by_key[(row["conv_id"], row["turn_idx"], row["_epoch"])]
        want_op = (
            "c" if not row["_before_exists"]
            else ("u" if row["_after_exists"] else "d")
        )
        assert r["op"] == want_op
        assert r["source"]["seq"] == row["seq"]
        assert r["ts_ms"] == row["ts"].value // 1_000_000
        if row["_after_exists"]:
            for c in payload:
                want = row[c]
                assert r["after"][c] == (None if pd.isna(want) else want)
        else:
            assert r["after"] is None
        if row["_before_exists"]:
            for c in payload:
                want = row[f"_before_{c}"]
                assert r["before"][c] == (None if pd.isna(want) else want)
        else:
            assert r["before"] is None

    # per-key records are epoch-ordered within their part file (a key
    # lives in exactly one partition == one file)
    for p in glob.glob(os.path.join(out, "window=1-4", "part-*.jsonl")):
        with open(p) as f:
            seen: dict[tuple, int] = {}
            for line in f:
                r = json.loads(line)
                img = r["after"] or r["before"]
                k = (img["conv_id"], img["turn_idx"])
                e = r["source"]["epoch"]
                assert seen.get(k, 0) < e
                seen[k] = e

    # idempotent: identical call skips (meta hit), same counts
    st2 = ivm.export_debezium(src, out)
    assert st2["skipped"] and st2["rows"] == st["rows"]
    # parameter pin: same window, different params -> refuse
    with pytest.raises(ValueError, match="different parameters"):
        ivm.export_debezium(src, out, gzip=True)


def test_export_consumer_exactly_once(src_table, tmp_path):
    src, _ = src_table
    out = str(tmp_path / "inc")
    g = "dbz-test"
    st1 = ivm.export_debezium(src, out, consumer=g, upto_epoch=2)
    assert st1["since"] == 0 and st1["upto"] == 2
    assert cons.position(src, g) == 2
    st2 = ivm.export_debezium(src, out, consumer=g)
    assert st2["since"] == 2 and st2["upto"] == 4
    # the two windows together equal the full feed's live rows
    total = len(_read_window(f"{out}/window=1-2")) + len(
        _read_window(f"{out}/window=3-4")
    )
    feed = _feed_df(src)
    assert total == int((feed["_before_exists"] | feed["_after_exists"]).sum())
    # caught up -> no-op, cursor unchanged
    st3 = ivm.export_debezium(src, out, consumer=g)
    assert st3["rows"] == 0 and cons.position(src, g) == 4
    # crash between meta and ack: rewind the cursor, re-export — the
    # completed window is skipped (no rewrite) and the ack is restored
    cons.rewind(src, g, 2)
    st4 = ivm.export_debezium(src, out, consumer=g)
    assert st4["skipped"] and st4["rows"] == st2["rows"]
    assert cons.position(src, g) == 4


def test_export_crashed_window_rewrites(src_table, tmp_path):
    src, _ = src_table
    out = str(tmp_path / "crash")
    wdir = os.path.join(out, "window=1-4")
    os.makedirs(wdir)
    with open(os.path.join(wdir, "part-0.jsonl"), "w") as f:
        f.write('{"garbage": true}\n')  # partial window, no meta
    st = ivm.export_debezium(src, out)
    assert not st["skipped"]
    recs = _read_window(wdir)
    assert len(recs) == st["rows"] > 0
    assert not any("garbage" in r for r in recs)


def test_export_gzip_and_columns(src_table, tmp_path):
    src, _ = src_table
    out = str(tmp_path / "gz")
    st = ivm.export_debezium(src, out, columns=["role"], gzip=True)
    files = glob.glob(os.path.join(out, "window=1-4", "part-*.jsonl.gz"))
    assert files and all(f.endswith(".jsonl.gz") for f in files)
    recs = _read_window(os.path.join(out, "window=1-4"))
    assert len(recs) == st["rows"] > 0
    for r in recs:
        img = r["after"] or r["before"]
        assert set(img) == {"conv_id", "turn_idx", "role"}


def test_cli_debezium(src_table, tmp_path, capsys):
    from xgeo_ray.__main__ import main

    src, _ = src_table
    out = str(tmp_path / "cli")
    assert main(
        ["changes", src.root, out, "--debezium", "--consumer", "cli-g"]
    ) in (0, None)
    st = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert st["rows"] > 0 and cons.position(src, "cli-g") == 4
    with pytest.raises(SystemExit, match="no ts band"):
        main(["changes", src.root, out, "--debezium", "--ts-min", "0"])
    with pytest.raises(SystemExit, match="requires --debezium"):
        main(["changes", src.root, out, "--bootstrap"])
    assert main(
        ["changes", src.root, out, "--debezium", "--bootstrap"]
    ) in (0, None)
    st = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert st.get("snapshot") and st["upto"] == 4
    assert os.path.isdir(os.path.join(out, "snapshot=0-4"))

    # the import side closes the loop from the CLI too
    dst = DeltaTable.create(str(tmp_path / "cli_dst"), num_partitions=2)
    assert main(
        ["import-debezium", dst.root, out, str(tmp_path / "cli_wal")]
    ) in (0, None)
    st = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert st["epochs"] and st["events"] > 0
    assert ing.snapshot(dst).count() == ing.snapshot(src).count()


def test_export_bootstrap_snapshot_then_stream(src_table, tmp_path):
    """The standard Debezium handshake: snapshot phase (op='r' full
    state) then stream windows — a fresh table built from the export
    equals the source, and the consumer cursor jumps the snapshot."""
    src, _ = src_table
    out = str(tmp_path / "bs")
    g = "bs-group"
    st = ivm.export_debezium(
        src, out, consumer=g, upto_epoch=2, bootstrap=True
    )
    assert st["snapshot"] and st["upto"] == 2 and not st["skipped"]
    assert cons.position(src, g) == 2
    recs = _read_window(os.path.join(out, "snapshot=0-2"))
    assert len(recs) == st["rows"] > 0
    state2 = ing.snapshot(src, as_of_epoch=2, keep_lineage=True).to_pandas()
    assert len(recs) == len(state2)
    assert all(r["op"] == "r" and r["before"] is None for r in recs)
    by_key = {
        (r["after"]["conv_id"], r["after"]["turn_idx"]): r for r in recs
    }
    for row in state2.to_dict("records"):
        r = by_key[(row["conv_id"], row["turn_idx"])]
        assert r["after"]["text"] == row["text"]
        assert r["source"]["seq"] == row["seq"]
    # idempotent replay at the same pin: meta hit, cursor intact
    st2 = ivm.export_debezium(
        src, out, consumer=g, upto_epoch=2, bootstrap=True
    )
    assert st2["skipped"] and cons.position(src, g) == 2
    # the stream continues from the snapshot point
    st3 = ivm.export_debezium(src, out, consumer=g)
    assert st3["since"] == 2 and st3["upto"] == 4

    # bootstrap + stream import into a fresh table == source state
    groups = ivm.debezium_to_segments(out, str(tmp_path / "bs_wal"))
    assert len(groups) == 2  # snapshot=0-2 base, then window 3-4
    dst = DeltaTable.create(str(tmp_path / "bs_dst"), num_partitions=2)
    ing.run_stream(dst, [], segment_groups=groups)

    def _state(t):
        cols = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
        return (
            ing.snapshot(t).to_pandas()[cols]
            .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
        )

    pd.testing.assert_frame_equal(_state(dst), _state(src), check_dtype=False)

    # a later savepoint (unpinned re-bootstrap at upto=4) becomes the
    # import BASE: older snapshot + covered window are skipped — vital,
    # since snapshots carry no tombstones and replaying the old one
    # first could strand deletes below the seq watermark
    st4 = ivm.export_debezium(src, out, consumer=g, bootstrap=True)
    assert st4["upto"] == 4 and not st4["skipped"]
    groups2 = ivm.debezium_to_segments(out, str(tmp_path / "bs_wal"))
    assert len(groups2) == 1
    assert all("dbz-0-4-" in s for s in groups2[0])
    dst2 = DeltaTable.create(str(tmp_path / "bs_dst2"), num_partitions=2)
    ing.run_stream(dst2, [], segment_groups=groups2)
    pd.testing.assert_frame_equal(_state(dst2), _state(src), check_dtype=False)


def test_binary_columns_roundtrip_base64(tmp_path):
    """Raw-bytes payload columns survive the JSON envelope: the exporter
    base64-encodes them (standard Debezium bytes handling), records the
    column list in the window meta, and the importer decodes back to
    binary — roundtrip byte equality, nulls preserved."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    events = fx.make_change_events(300, n_convs=6, turns_per_conv=4)
    blob = pa.array(
        [
            bytes([i % 256, 0, 255, i // 256]) if i % 3 else None
            for i in range(events.num_rows)
        ],
        pa.binary(),
    )
    events = events.append_column("media", blob)
    os.makedirs(tmp_path / "wal")
    seg = str(tmp_path / "wal" / "segment-00000.parquet")
    pq.write_table(events, seg)
    src = DeltaTable.create(str(tmp_path / "src"), num_partitions=2)
    ing.run_stream(src, [seg])

    out = str(tmp_path / "dbz")
    st = ivm.export_debezium(src, out)
    assert st["binary_columns"] == ["media"]
    st2 = ivm.export_debezium(src, out, bootstrap=True)
    assert st2["binary_columns"] == ["media"]
    recs = _read_window(os.path.join(out, "window=1-1"))
    imgs = [r["after"]["media"] for r in recs if r["after"]]
    assert any(isinstance(v, str) and v for v in imgs)  # base64 strings

    groups = ivm.debezium_to_segments(out, str(tmp_path / "dwal"))
    dst = DeltaTable.create(str(tmp_path / "dst"), num_partitions=2)
    ing.run_stream(dst, [], segment_groups=groups)
    cols = ["conv_id", "turn_idx", "media"]
    a = (ing.snapshot(src).to_pandas()[cols]
         .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True))
    b = (ing.snapshot(dst).to_pandas()[cols]
         .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(b, a, check_dtype=False)
    assert any(isinstance(v, bytes) for v in b["media"])


def test_import_straddling_window_converges(src_table, tmp_path):
    """A stream window that OVERLAPS the snapshot base (a <= U < b)
    replays after it: its covered rows drop as replays at the seq
    watermark, its tail applies — final state equals the source."""
    src, _ = src_table
    out = str(tmp_path / "strad")
    ivm.export_debezium(src, out, bootstrap=True, upto_epoch=2)
    ivm.export_debezium(src, out)  # window=1-4 straddles snapshot=0-2
    assert os.path.isdir(os.path.join(out, "window=1-4"))
    groups = ivm.debezium_to_segments(out, str(tmp_path / "wal"))
    assert len(groups) == 2
    assert all("dbz-0-2-" in s for s in groups[0])  # base first
    dst = DeltaTable.create(str(tmp_path / "dst"), num_partitions=2)
    ing.run_stream(dst, [], segment_groups=groups)
    cols = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    a = (ing.snapshot(src).to_pandas()[cols]
         .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True))
    b = (ing.snapshot(dst).to_pandas()[cols]
         .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(b, a, check_dtype=False)


def test_tail_debezium_follows_live_feed(src_table, tmp_path):
    """The live CDC-import half: the tailer ingests committed windows as
    they land, never touches a window whose commit marker is missing
    (mid-write exporter race), and a restarted tailer resumes
    exactly-once off run_stream's committed-segment cursor."""
    src, _ = src_table
    out = str(tmp_path / "feed")
    wal = str(tmp_path / "wal")
    dst = DeltaTable.create(str(tmp_path / "dst"), num_partitions=2)

    # a mid-write window (files, no _debezium.json) must be invisible
    fake = os.path.join(out, "window=1-9")
    os.makedirs(fake)
    with open(os.path.join(fake, "part-0.jsonl"), "w") as f:
        f.write(json.dumps({
            "before": None,
            "after": {"conv_id": "ghost", "turn_idx": 0, "role": "u",
                      "text": "partial", "tool": None},
            "op": "c", "source": {"epoch": 9, "seq": 10**9, "ts_us": 1},
            "ts_ms": 0,
        }) + "\n")
    ms = ivm.tail_debezium(out, dst, wal, poll_interval_s=0.01,
                           idle_polls_to_stop=2)
    assert ms == [] and ing.snapshot(dst).count() == 0
    import shutil
    shutil.rmtree(fake)

    ivm.export_debezium(src, out, upto_epoch=2)
    ms1 = ivm.tail_debezium(out, dst, wal, poll_interval_s=0.01,
                            idle_polls_to_stop=2)
    assert len(ms1) == 1
    ivm.export_debezium(src, out, since_epoch=2)
    ms2 = ivm.tail_debezium(out, dst, wal, poll_interval_s=0.01,
                            idle_polls_to_stop=2)
    assert len(ms2) == 1

    cols = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    a = (ing.snapshot(src).to_pandas()[cols]
         .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True))
    b = (ing.snapshot(dst).to_pandas()[cols]
         .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(b, a, check_dtype=False)
    # caught up: another tailer run commits nothing
    assert ivm.tail_debezium(out, dst, wal, poll_interval_s=0.01,
                             idle_polls_to_stop=1) == []


def test_import_infers_schema_past_100_rows(tmp_path):
    """Regression: a part file leading with >100 creates (before=null)
    must not pin `before` to a Null dtype — polars' default 100-row
    inference window did exactly that and the first later delete failed
    the whole read. The importer scans the full file."""
    wdir = tmp_path / "feed" / "window=1-1"
    os.makedirs(wdir)
    with open(wdir / "part-0.jsonl", "w") as f:
        for i in range(150):
            f.write(json.dumps({
                "before": None,
                "after": {"conv_id": f"c{i:03d}", "turn_idx": 0,
                          "role": "user", "text": "x", "tool": None},
                "op": "c",
                "source": {"epoch": 1, "seq": i, "ts_us": 1_000_000 + i},
                "ts_ms": 1000,
            }) + "\n")
        f.write(json.dumps({
            "before": {"conv_id": "c000", "turn_idx": 0,
                       "role": "user", "text": "x", "tool": None},
            "after": None,
            "op": "d",
            "source": {"epoch": 1, "seq": 200, "ts_us": 2_000_000},
            "ts_ms": 2000,
        }) + "\n")
    groups = ivm.debezium_to_segments(
        str(tmp_path / "feed"), str(tmp_path / "wal")
    )
    assert len(groups) == 1 and len(groups[0]) == 1
    dst = DeltaTable.create(str(tmp_path / "t"), num_partitions=2)
    ing.run_stream(dst, [], segment_groups=groups)
    snap = ing.snapshot(dst).to_pandas()
    assert len(snap) == 149  # the late delete landed
    assert "c000" not in set(snap["conv_id"])


def test_debezium_roundtrip_ingest(src_table, tmp_path):
    """The interop loop closes: export table A as Debezium JSONL,
    convert the stream back to WAL segments, ingest into a fresh table
    B — final states are identical (epoch-effective images replayed in
    seq order converge under LWW)."""
    src, _ = src_table
    out = str(tmp_path / "rt")
    # two windows exercise multi-window ordering in the importer
    ivm.export_debezium(src, out, upto_epoch=2)
    ivm.export_debezium(src, out, since_epoch=2)
    groups = ivm.debezium_to_segments(out, str(tmp_path / "rt_wal"))
    assert len(groups) == 2  # one ingest epoch per export window
    assert all(s.endswith(".parquet") for g in groups for s in g)
    # re-run converts nothing new but returns the same ordered groups
    assert ivm.debezium_to_segments(out, str(tmp_path / "rt_wal")) == groups

    dst = DeltaTable.create(
        str(tmp_path / "dst"), num_partitions=2, num_salts=1
    )
    ing.run_stream(dst, [], segment_groups=groups)
    cols = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    a = (
        ing.snapshot(src)
        .to_pandas()[cols]
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    b = (
        ing.snapshot(dst)
        .to_pandas()[cols]
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(b, a, check_dtype=False)
