"""Commit-token + storage-seam coverage (round-2 ADVICE, medium):
delta files are written under attempt-unique names, so a fence-losing
driver can never clobber the bytes the winning manifest references, and
vacuum reclaims losing-attempt files and crashed-writer tmp litter."""

import glob
import hashlib
import os
import re
import time

import pytest

from xgeo_ray import fixtures as fx
from xgeo_ray.pipelines import ingest as ing
from xgeo_ray.state.delta_table import DeltaTable

N_CONVS, TURNS = 10, 6


def _file_hashes(root):
    return {
        p: hashlib.sha256(open(p, "rb").read()).hexdigest()
        for p in glob.glob(os.path.join(root, "parts", "*", "*.parquet"))
    }


def _mk_table_with_epoch(tmp_path):
    events = fx.make_change_events(400, n_convs=N_CONVS, turns_per_conv=TURNS)
    segs = fx.write_segments(events, str(tmp_path / "wal"), n_segments=2)
    table = DeltaTable.create(str(tmp_path / "tbl"), num_partitions=4, num_salts=1)
    ing.ingest_segments(table, segs, epoch=1)
    return table, segs


def test_delta_paths_carry_commit_token(tmp_path):
    table, _ = _mk_table_with_epoch(tmp_path)
    paths = [p for v in table.partition_files().values() for p in v]
    assert paths
    for p in paths:
        assert re.search(r"epoch=000001-[0-9a-f]{8}\.parquet$", p), p
        assert os.path.isfile(p)


def test_losing_driver_cannot_clobber_winner_data(tmp_path):
    """A second driver replaying the SAME epoch writes its own token
    files, fails at the fence, and leaves the winner's bytes intact."""
    table, segs = _mk_table_with_epoch(tmp_path)
    winner_files = {
        p: h for p, h in _file_hashes(table.root).items() if p in
        {q for v in table.partition_files().values() for q in v}
    }
    # the losing driver: different pending view (only one segment), same
    # epoch number — the worst case the advisory describes
    loser = DeltaTable.open(table.root)
    with pytest.raises((ValueError, FileExistsError)):
        ing.ingest_segments(loser, segs[:1], epoch=1)
    after = _file_hashes(table.root)
    for p, h in winner_files.items():
        assert after[p] == h, f"winner file {p} was clobbered"
    # committed state still reads the winner's data
    assert set(table.partition_files().keys())


def test_vacuum_reclaims_loser_files_and_tmp_litter(tmp_path):
    table, segs = _mk_table_with_epoch(tmp_path)
    # loser attempt that actually writes data: fresh (above-watermark)
    # seqs, racing on the already-committed epoch number
    import pyarrow as pa

    cont = fx.make_change_events(200, n_convs=N_CONVS, turns_per_conv=TURNS, seed=11)
    wm = int(table.watermarks().max())
    cont = cont.set_column(
        cont.schema.get_field_index("seq"),
        "seq",
        pa.array(cont.column("seq").to_numpy() + wm + 1, pa.int64()),
    )
    cont_segs = fx.write_segments(cont, str(tmp_path / "wal2"), n_segments=1)
    loser = DeltaTable.open(table.root)
    with pytest.raises((ValueError, FileExistsError)):
        ing.ingest_segments(loser, cont_segs, epoch=1)
    loser_files = [
        p
        for p in _file_hashes(table.root)
        if p not in {q for v in table.partition_files().values() for q in v}
    ]
    assert loser_files, "loser attempt should have written token files"
    # plant crashed-writer tmp litter, older than the committed manifest
    part_dir = os.path.dirname(
        next(p for v in table.partition_files().values() for p in v)
    )
    litter = os.path.join(part_dir, "epoch=000009.parquet.tmp-99999")
    open(litter, "wb").write(b"partial")
    old = time.time() - 3600
    os.utime(litter, (old, old))
    n_files_before = len(_file_hashes(table.root))
    stats = ing.vacuum(table)
    assert stats["deleted"] > 0
    assert not os.path.exists(litter)
    visible = {p for v in table.partition_files().values() for p in v}
    on_disk = set(_file_hashes(table.root))
    assert on_disk == visible, "vacuum must leave exactly the visible files"
    assert len(on_disk) < n_files_before
    # and the table still merges fine afterwards
    assert ing.snapshot(table).count() > 0
