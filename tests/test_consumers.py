"""Consumer-group cursors for the changes feed (state/consumers.py).

The cursor is durable table state committed through the same exclusive
fence as epoch manifests: poll replays everything after the last ack, a
crash between process and ack replays (at-least-once), ack makes it
exactly-once, and min_cursor exposes the vacuum-retention coupling.
"""

import pyarrow.parquet as pq
import pytest

from xgeo_ray import fixtures as fx
from xgeo_ray.pipelines import ingest as ing
from xgeo_ray.state import consumers as cons
from xgeo_ray.state.delta_table import DeltaTable


@pytest.fixture(scope="module")
def table(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("cons"))
    events = fx.make_change_events(900, n_convs=10, turns_per_conv=6)
    segs = fx.write_segments(events, f"{root}/wal", n_segments=3)
    t = DeltaTable.create(f"{root}/t", num_partitions=4, num_salts=1)
    ing.run_stream(t, segs, segments_per_epoch=1)  # epochs 1..3
    return t


def test_poll_ack_loop(table):
    c = cons.Consumer(table, "indexer")
    assert c.position() == 0
    ds, upto = c.poll()
    assert upto == 3
    n_all = ds.count()
    assert n_all > 0
    # crash before ack: a fresh consumer handle replays the same feed
    c2 = cons.Consumer(table, "indexer")
    ds2, upto2 = c2.poll()
    assert upto2 == 3 and ds2.count() == n_all
    assert c2.ack(upto2) is True
    assert c2.position() == 3
    # caught up: poll returns an empty feed and the same position
    ds3, upto3 = cons.Consumer(table, "indexer").poll()
    assert upto3 == 3 and ds3.count() == 0
    # re-ack (or acking backwards) is refused, cursor never regresses
    assert c2.ack(3) is False
    assert c2.ack(2) is False
    assert cons.position(table, "indexer") == 3


def test_partial_poll_and_independent_groups(table):
    c = cons.Consumer(table, "partial")
    ds, upto = c.poll(upto_epoch=2)
    assert upto == 2
    n_first = ds.count()
    c.ack(upto)
    ds, upto = c.poll()
    assert upto == 3
    n_rest = ds.count()
    full = ing.changes(table).count()
    assert n_first + n_rest == full
    # groups are independent cursors on the same table
    assert cons.position(table, "indexer") == 3
    assert sorted(cons.groups(table)) == ["indexer", "partial"]
    c.ack(3)
    assert cons.min_cursor(table) == 3


def test_vacuum_respects_consumer_lag(tmp_path):
    """vacuum(respect_consumers=True) keeps superseded delta files the
    slowest group hasn't acked — the feed stays replayable — and
    reclaims them once the cursor advances."""
    ev = fx.make_change_events(900, n_convs=10, turns_per_conv=6)
    segs = fx.write_segments(ev, str(tmp_path / "wal"), n_segments=3)
    t = DeltaTable.create(str(tmp_path / "t"), num_partitions=4, num_salts=1)
    ing.run_stream(t, segs, segments_per_epoch=1)  # epochs 1..3
    c = cons.Consumer(t, "lagging")
    _, upto = c.poll(upto_epoch=1)
    c.ack(upto)  # cursor = 1; epochs 2..3 unconsumed
    n_pending = ing.changes(t, since_epoch=1).count()
    ing.compact(t)  # supersedes all deltas
    stats = ing.vacuum(t, respect_consumers=True)
    # the unconsumed epochs' deltas survive: the feed replays intact
    assert ing.changes(t, since_epoch=1).count() == n_pending
    ds, upto = c.poll()
    assert upto == 3 and ds.count() == n_pending
    c.ack(upto)
    stats2 = ing.vacuum(t, respect_consumers=True)
    assert stats2["deleted"] > 0  # caught up: now reclaimable
    assert ing.snapshot(t).count() > 0  # state untouched throughout


def test_group_name_validation(table):
    with pytest.raises(ValueError):
        cons.Consumer(table, "../escape")
    assert cons.min_cursor(
        DeltaTable.open(table.root)
    ) == 3  # unchanged by the failed construction
