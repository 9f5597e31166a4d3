"""Fail-open width regressions: zero-padded filenames that WIDEN past
their pad (epoch 1,000,000 acks, segment index 100,000) must stay
visible to the fixed-pattern scanners, and JSONL sniffing must not be
fooled by a first record larger than any fixed read cap. Companion to
the DELTA_FILENAME_RE width fix (commit 2771718)."""

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq

from xgeo_ray import fixtures as fx
from xgeo_ray.pipelines import ingest as ing
from xgeo_ray.sources import wal_writer as ww
from xgeo_ray.sources.wal import _sniff_nested_json
from xgeo_ray.state import consumers as cons
from xgeo_ray.state.delta_table import DeltaTable


def _tiny_table(tmp_path):
    root = str(tmp_path / "t")
    events = fx.make_change_events(60, n_convs=4, turns_per_conv=4)
    segs = fx.write_segments(events, str(tmp_path / "wal"), n_segments=1)
    t = DeltaTable.create(root, num_partitions=2, num_salts=1)
    ing.run_stream(t, segs)
    return t


def test_consumer_ack_visible_past_epoch_999999(tmp_path):
    t = _tiny_table(tmp_path)
    assert cons.ack(t, "g", 999_999)
    assert cons.position(t, "g") == 999_999
    # epoch 1,000,000 widens the filename to 7 digits: position() must
    # still see it (fail-open = silent replay + vacuum pinned forever)
    assert cons.ack(t, "g", 1_000_000)
    assert cons.position(t, "g") == 1_000_000
    # and rewind must still match (and delete) the widened record
    assert cons.rewind(t, "g", 999_999) == 999_999


def test_wal_writer_scan_past_segment_99999(tmp_path):
    wal = str(tmp_path / "wal")
    os.makedirs(wal)
    for idx, seqs in ((99_999, [0, 1]), (100_000, [2, 3])):
        pq.write_table(
            pa.table({"seq": pa.array(seqs, pa.int64())}),
            os.path.join(wal, f"segment-{idx:05d}.parquet"),
        )
    # lexically "segment-100000" < "segment-99999"; numerically it is
    # the NEWEST segment — restart continuity must resume above it or
    # a re-minted index silently overwrites published data
    next_idx, next_seq = ww._scan_dir(wal)
    assert next_idx == 100_001
    assert next_seq == 4


def test_manifests_visible_and_ordered_past_epoch_999999(tmp_path):
    """Manifests past epoch 999999 widen to 7 digits: the scanner must
    still see them AND return them in numeric order ("1000000" sorts
    lexicographically BEFORE "999999") — a fixed-width or
    name-sorted scan stalls latest_epoch() and the next commit
    collides with a committed epoch."""
    from xgeo_ray.state.manifest import manifest_path, read_manifests

    t = _tiny_table(tmp_path)
    src = manifest_path(t.root, 1)
    with open(src) as f:
        base = json.load(f)
    for e in (999_999, 1_000_000):
        m = dict(base)
        m["epoch"] = e
        with open(manifest_path(t.root, e), "w") as f:
            json.dump(m, f)
    ms = read_manifests(t.root)
    epochs = [m.epoch for m in ms]
    assert epochs == sorted(epochs) and epochs[-2:] == [999_999, 1_000_000]
    assert DeltaTable.open(t.root).latest_epoch() == 1_000_000


def test_sniff_jsonl_with_multi_mb_first_record(tmp_path):
    # first JSONL record exceeds 1 MiB: the sniffer must keep reading
    # to the first newline, see a complete record + more content, and
    # classify the file as JSON-lines (not one big nested document)
    p = str(tmp_path / "big.json")
    with open(p, "w") as f:
        f.write(json.dumps({"conv_id": "a", "text": "x" * (2 << 20)}))
        f.write("\n")
        f.write(json.dumps({"conv_id": "b", "text": "y"}))
        f.write("\n")
    assert _sniff_nested_json(p, None) is False


def test_sniff_single_nested_doc_over_cap(tmp_path):
    # one big single-line wrapper object (> the old 1 MiB cap, no
    # newline at all) is still detected as nested
    p = str(tmp_path / "doc.json")
    recs = [{"conv_id": f"c{i}", "text": "z" * 4096} for i in range(600)]
    with open(p, "w") as f:
        f.write(json.dumps({"records": recs}))
    assert _sniff_nested_json(p, None) is True
