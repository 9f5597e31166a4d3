import numpy as np
import pyarrow as pa

from xgeo_ray import fixtures as fx
from xgeo_ray.partition import PART_COL, add_part_key, compute_part_key


def test_part_key_deterministic_and_in_range():
    ev = fx.make_change_events(400, n_convs=10, turns_per_conv=5)
    a = compute_part_key(ev.column("conv_id"), ev.column("turn_idx"), 16, 4)
    b = compute_part_key(ev.column("conv_id"), ev.column("turn_idx"), 16, 4)
    assert np.array_equal(a, b)
    assert a.min() >= 0 and a.max() < 16


def test_same_primary_key_same_partition():
    # the whole point: a key's partition never depends on batch composition
    t1 = pa.table({"conv_id": ["c1"], "turn_idx": pa.array([7], pa.int32())})
    t2 = pa.table(
        {"conv_id": ["zz", "c1"], "turn_idx": pa.array([3, 7], pa.int32())}
    )
    p1 = compute_part_key(t1["conv_id"], t1["turn_idx"], 32, 4)[0]
    p2 = compute_part_key(t2["conv_id"], t2["turn_idx"], 32, 4)[1]
    assert p1 == p2


def test_salting_spreads_hot_conversation():
    n = 4000
    t = pa.table(
        {
            "conv_id": ["conv-hot"] * n,
            "turn_idx": pa.array(np.arange(n, dtype=np.int32)),
        }
    )
    unsalted = compute_part_key(t["conv_id"], t["turn_idx"], 32, 1)
    salted = compute_part_key(t["conv_id"], t["turn_idx"], 32, 8)
    assert len(np.unique(unsalted)) == 1  # all on one partition → hotspot
    assert len(np.unique(salted)) == 8  # spread over 8 sub-partitions


def test_add_part_key_column():
    ev = fx.make_change_events(100)
    out = add_part_key(ev, 8, 2)
    assert PART_COL in out.column_names
    assert out.column(PART_COL).type == pa.int32()
