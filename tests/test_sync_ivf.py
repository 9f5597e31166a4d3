"""Incremental IVF vector-index maintenance (ann.sync_ivf /
ivf_topk_live).

Probing ALL lists of a synced index with tombstone filtering must
equal the exact brute-force scan over the table's live snapshot
(same vec_id hashing) after any sync cadence; replayed windows
(cursor rewind) must no-op; deletes and updates must retract."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from xgeo_ray import fixtures as fx
from xgeo_ray.functions import ann
from xgeo_ray.functions.dedup import hash_tokens
from xgeo_ray.pipelines import ingest as ing
from xgeo_ray.state import consumers as cons
from xgeo_ray.state.delta_table import DeltaTable

import ray

DIM = 8
NLIST = 4

BASE = pa.schema(
    [
        pa.field("conv_id", pa.string()),
        pa.field("turn_idx", pa.int32()),
        pa.field("embedding", pa.list_(pa.float32())),
        pa.field("ts", pa.timestamp("us")),
    ]
)


def _vec(key: int, version: int) -> list[float]:
    rng = np.random.default_rng(1000 * key + version)
    return rng.normal(size=DIM).astype(np.float32).tolist()


def _events(rows, seq0):
    """rows: list of (key:int, op, version)."""
    n = len(rows)
    return pa.table(
        {
            "seq": pa.array(np.arange(seq0, seq0 + n), pa.int64()),
            "op": pa.array([r[1] for r in rows], pa.string()),
            "conv_id": pa.array([f"c{r[0] // 4}" for r in rows], pa.string()),
            "turn_idx": pa.array([r[0] % 4 for r in rows], pa.int32()),
            "embedding": pa.array(
                [
                    None if r[1] == "D" else _vec(r[0], r[2])
                    for r in rows
                ],
                pa.list_(pa.float32()),
            ),
            "ts": pa.array(
                (np.arange(seq0, seq0 + n) + 1) * 1_000_000,
                pa.timestamp("us"),
            ),
        }
    )


def _setup(tmp_path):
    root = str(tmp_path)
    seg_tables = [
        _events([(k, "I", 0) for k in range(40)], 0),
        _events(
            [(k, "U", 1) for k in range(10)]
            + [(k, "I", 0) for k in range(40, 50)],
            40,
        ),
        _events([(k, "D", 0) for k in range(5, 15)], 60),
    ]
    segs = []
    for i, t in enumerate(seg_tables):
        segs += fx.write_segments(t, f"{root}/wal{i}", n_segments=1)
    table = DeltaTable.create(
        f"{root}/t", num_partitions=4, num_salts=1, base_schema=BASE
    )
    return table, segs, f"{root}/ivf"


def _vid(conv, turn) -> np.ndarray:
    ck = np.array(
        [f"{c}\x1f{t}" for c, t in zip(conv, turn)], dtype=object
    )
    return hash_tokens(ck).view(np.int64)


def _oracle_topk(table, queries, k):
    snap = ing.snapshot(table).to_pandas()
    snap = snap[snap["embedding"].notna()]
    t = pa.table(
        {
            "vec_id": pa.array(
                _vid(snap["conv_id"], snap["turn_idx"]), pa.int64()
            ),
            "embedding": pa.array(
                [list(v) for v in snap["embedding"]],
                pa.list_(pa.float32()),
            ),
        }
    )
    return ann.brute_force_topk(
        ray.data.from_arrow(t), queries, k=k
    ).to_pandas()


def _live_topk(index_dir, queries, k):
    got = ann.ivf_topk_live(
        index_dir, queries, k=k, nprobe=NLIST
    ).to_pandas()
    return got[["query_idx", "vec_id", "rank"]].reset_index(drop=True)


QUERIES = np.stack(
    [np.asarray(_vec(k, 0), np.float64) for k in (0, 7, 20, 44)]
    + [np.random.default_rng(9).normal(size=DIM)]
)


def test_sync_ivf_per_epoch_cadence_matches_brute_force(tmp_path):
    table, segs, idx = _setup(tmp_path)
    for i in range(len(segs)):
        ing.run_stream(table, segs[: i + 1], segments_per_epoch=1)
        st = ann.sync_ivf(table, idx, num_centroids=NLIST)
        assert st["last_epoch"] == table.latest_epoch()
        got = _live_topk(idx, QUERIES, 5)
        want = _oracle_topk(table, QUERIES, 5)
        pd.testing.assert_frame_equal(got, want)
    # caught-up sync is a no-op
    assert ann.sync_ivf(table, idx)["synced_epochs"] == 0


def test_sync_ivf_one_shot_bootstrap_matches_brute_force(tmp_path):
    table, segs, idx = _setup(tmp_path)
    ing.run_stream(table, segs, segments_per_epoch=1)
    st = ann.sync_ivf(table, idx, num_centroids=NLIST)
    assert st["appended"] == -1  # bootstrap path
    pd.testing.assert_frame_equal(
        _live_topk(idx, QUERIES, 5), _oracle_topk(table, QUERIES, 5)
    )


def test_sync_ivf_deleted_and_stale_versions_never_match(tmp_path):
    table, segs, idx = _setup(tmp_path)
    ing.run_stream(table, segs[:1], segments_per_epoch=1)
    ann.sync_ivf(table, idx, num_centroids=NLIST)
    ing.run_stream(table, segs, segments_per_epoch=1)
    ann.sync_ivf(table, idx)
    got = _live_topk(idx, QUERIES, 50)
    live_ids = set(got["vec_id"])
    snap = ing.snapshot(table).to_pandas()
    dead = [k for k in range(5, 15)]
    dead_ids = set(
        _vid([f"c{k // 4}" for k in dead], [k % 4 for k in dead])
    )
    assert not (live_ids & dead_ids)  # deleted keys never surface
    # updated keys surface with their NEW vector: query with key 0's
    # OLD embedding must not rank its own id first anymore
    q_old = np.asarray(_vec(0, 0), np.float64)[None, :]
    top = ann.ivf_topk_live(idx, q_old, k=1, nprobe=NLIST).to_pandas()
    vid0 = int(_vid(["c0"], [0])[0])
    # key 0 is live (version 1) but its old vector is tombstoned: an
    # exact match on the old embedding would have sim 1.0 at rank 1
    oracle = _oracle_topk(table, q_old, 1)
    assert top["vec_id"].tolist() == oracle["vec_id"].tolist()


def test_sync_ivf_replayed_window_noops(tmp_path):
    import hashlib
    import os

    table, segs, idx = _setup(tmp_path)
    ing.run_stream(table, segs[:1], segments_per_epoch=1)
    ann.sync_ivf(table, idx, num_centroids=NLIST)
    ing.run_stream(table, segs, segments_per_epoch=1)
    ann.sync_ivf(table, idx)
    before = _live_topk(idx, QUERIES, 5)
    man_before, ver_before = ann._read_ivf_manifest(idx)
    group = (
        "ivf-"
        + hashlib.sha1(os.path.abspath(idx).encode()).hexdigest()[:10]
    )
    cons.rewind(table, group, 1)
    st = ann.sync_ivf(table, idx)
    assert st["synced_epochs"] == table.latest_epoch() - 1
    # the replayed append is a manifest no-op (same batch id)
    man_after, _ = ann._read_ivf_manifest(idx)
    assert man_after["parts"] == man_before["parts"]
    assert man_after.get("batches") == man_before.get("batches")
    pd.testing.assert_frame_equal(_live_topk(idx, QUERIES, 5), before)


def test_ivf_compact_folds_and_preserves_results(tmp_path):
    import glob
    import hashlib
    import os

    table, segs, idx = _setup(tmp_path)
    ing.run_stream(table, segs[:1], segments_per_epoch=1)
    ann.sync_ivf(table, idx, num_centroids=NLIST)
    ing.run_stream(table, segs, segments_per_epoch=1)
    ann.sync_ivf(table, idx)
    before = _live_topk(idx, QUERIES, 10)
    man, _ = ann._read_ivf_manifest(idx)
    assert man.get("tombstones")  # updates/deletes accumulated some
    st = ann.ivf_compact(idx)
    assert st["dropped_tombstones"] > 0
    man2, _ = ann._read_ivf_manifest(idx)
    assert not man2.get("tombstones")
    assert all(len(fl) == 1 for fl in man2["files"].values())
    # probe results identical; row counts equal the live snapshot
    pd.testing.assert_frame_equal(_live_topk(idx, QUERIES, 10), before)
    snap = ing.snapshot(table).to_pandas()
    assert sum(man2["parts"].values()) == int(snap["embedding"].notna().sum())
    # compact does NOT delete its inputs (readers planned on the old
    # manifest); ivf_vacuum reclaims them after the grace period
    assert ann.ivf_fsck(idx)["orphans"] > 0
    st_v = ann.ivf_vacuum(idx, min_age_s=0.0)
    assert st_v["removed"] > 0 and st_v["bytes"] > 0
    files = glob.glob(f"{idx}/part-*.parquet")
    assert len(files) == len(man2["parts"])
    pd.testing.assert_frame_equal(_live_topk(idx, QUERIES, 10), before)
    # exactly-once keys survive compaction: a replayed window still noops
    group = (
        "ivf-"
        + hashlib.sha1(os.path.abspath(idx).encode()).hexdigest()[:10]
    )
    cons.rewind(table, group, 1)
    ann.sync_ivf(table, idx)
    man3, _ = ann._read_ivf_manifest(idx)
    assert man3["parts"] == man2["parts"]
    pd.testing.assert_frame_equal(_live_topk(idx, QUERIES, 10), before)


def test_cli_sync_ivf_and_compact(tmp_path, capsys):
    import json

    from xgeo_ray.__main__ import main

    table, segs, idx = _setup(tmp_path)
    ing.run_stream(table, segs[:1], segments_per_epoch=1)
    assert main(
        ["sync-ivf", table.root, idx, "--num-centroids", str(NLIST)]
    ) in (0, None)
    st = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert st["appended"] == -1  # bootstrap
    ing.run_stream(table, segs, segments_per_epoch=1)
    assert main(["sync-ivf", table.root, idx]) in (0, None)
    st = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert st["last_epoch"] == table.latest_epoch()
    before = _live_topk(idx, QUERIES, 5)
    assert main(["ivf-compact", idx]) in (0, None)
    st = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert st["lists"] >= 1
    pd.testing.assert_frame_equal(_live_topk(idx, QUERIES, 5), before)
    pd.testing.assert_frame_equal(before, _oracle_topk(table, QUERIES, 5))


def test_ivf_fsck(tmp_path):
    import os
    import pyarrow.parquet as pq_

    table, segs, idx = _setup(tmp_path)
    ing.run_stream(table, segs[:1], segments_per_epoch=1)
    ann.sync_ivf(table, idx, num_centroids=NLIST)
    ing.run_stream(table, segs, segments_per_epoch=1)
    ann.sync_ivf(table, idx)
    st = ann.ivf_fsck(idx)
    assert st["ok"] and not st["missing"] and not st["row_count_drift"]
    assert st["tombstones"] > 0
    # compact leaves inputs as orphans; vacuum (grace elapsed) reclaims
    ann.ivf_compact(idx)
    ann.ivf_vacuum(idx, min_age_s=0.0)
    st = ann.ivf_fsck(idx)
    assert st["ok"] and st["orphans"] == 0 and st["tombstones"] == 0
    # a fresh unreferenced file survives vacuum inside the grace window
    import pyarrow.parquet as pq2

    keep = os.path.join(idx, "part-00000-gfresh.parquet")
    src_file = os.path.join(
        idx, sorted(n for n in os.listdir(idx) if n.endswith(".parquet"))[0]
    )
    pq2.write_table(pq2.read_table(src_file), keep)
    assert ann.ivf_vacuum(idx, min_age_s=3600.0)["removed"] == 0
    assert ann.ivf_vacuum(idx, min_age_s=0.0)["removed"] == 1
    # a stray generation file (crashed append) is an orphan, not an error
    stray = os.path.join(idx, "part-00000-gdeadbeef.parquet")
    pq_.write_table(
        pq_.read_table(
            os.path.join(
                idx,
                sorted(
                    n for n in os.listdir(idx) if n.endswith(".parquet")
                )[0],
            )
        ),
        stray,
    )
    st = ann.ivf_fsck(idx)
    assert st["ok"] and st["orphans"] == 1 and st["orphan_bytes"] > 0
    # a missing referenced file IS an error
    man, _ = ann._read_ivf_manifest(idx)
    victim = next(iter(man["files"].values()))[0]
    os.remove(os.path.join(idx, victim))
    st = ann.ivf_fsck(idx)
    assert not st["ok"] and victim in st["missing"]


def test_vacuum_respects_lagging_ivf_consumer(tmp_path):
    """The sync's consumer group pins window deltas: a lagging index
    (synced through epoch 1 only) keeps later epochs' superseded files
    through a compaction+vacuum, and the catch-up sync still matches
    brute force afterward — the generic cursor retention contract
    applied to the vector index."""
    table, segs, idx = _setup(tmp_path)
    ing.run_stream(table, segs[:1], segments_per_epoch=1)
    ann.sync_ivf(table, idx, num_centroids=NLIST)  # cursor at epoch 1
    ing.run_stream(table, segs, segments_per_epoch=1)  # epochs 2-3
    ing.compact(table)
    ing.vacuum(table, respect_consumers=True)
    # the lagging consumer's window (epochs 2-3 deltas) must survive
    st = ann.sync_ivf(table, idx)
    assert st["synced_epochs"] >= 2
    pd.testing.assert_frame_equal(
        _live_topk(idx, QUERIES, 5), _oracle_topk(table, QUERIES, 5)
    )


def test_sync_ivf_replay_after_source_advance_no_duplicates(tmp_path):
    """Crash between append and ack, with MORE epochs committed before
    the retry: the retry must recognize the committed window from its
    recorded batch id (keyed by the cursor), ack that window's end
    WITHOUT re-appending, and leave the remainder to the next sync —
    re-keying on the advanced upto would duplicate the prefix's
    vectors under the same vec_id/_epoch, never retracted."""
    import hashlib
    import os

    table, segs, idx = _setup(tmp_path)
    ing.run_stream(table, segs[:1], segments_per_epoch=1)
    ann.sync_ivf(table, idx, num_centroids=NLIST)  # bootstrap, epoch 1
    ing.run_stream(table, segs[:2], segments_per_epoch=1)  # epoch 2
    ann.sync_ivf(table, idx)  # append window (1, 2]
    group = (
        "ivf-"
        + hashlib.sha1(os.path.abspath(idx).encode()).hexdigest()[:10]
    )
    # simulate the crash-before-ack: cursor back to 1, source advances
    cons.rewind(table, group, 1)
    ing.run_stream(table, segs, segments_per_epoch=1)  # epoch 3
    st = ann.sync_ivf(table, idx)
    assert st.get("replayed") and st["last_epoch"] == 2
    st2 = ann.sync_ivf(table, idx)  # the remainder: window (2, 3]
    assert st2["last_epoch"] == 3 and not st2.get("replayed")
    # no duplicate (vec_id, _epoch) entries anywhere in the index
    import glob
    import pyarrow.parquet as pq2

    rows = pa.concat_tables(
        [pq2.read_table(p) for p in glob.glob(f"{idx}/part-*.parquet")]
    ).to_pandas()
    assert not rows.duplicated(subset=["vec_id", "_epoch"]).any()
    pd.testing.assert_frame_equal(
        _live_topk(idx, QUERIES, 5), _oracle_topk(table, QUERIES, 5)
    )
