"""Before/after-image feed + incremental aggregate views (pipelines.ivm).

The feed's images must equal epoch time travel: for every feed row at
epoch e, the after image is snapshot(as_of_epoch=e) at that key and the
before image is snapshot(as_of_epoch=e-1) — including keys created and
deleted inside the window. sync_agg folded over any sync cadence must
equal the plain GROUP BY over the final merged state.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from xgeo_ray import fixtures as fx
from xgeo_ray.pipelines import ingest as ing
from xgeo_ray.pipelines import ivm
from xgeo_ray.state.delta_table import DeltaTable


@pytest.fixture(scope="module")
def src_table(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("ivm_src"))
    events = fx.make_change_events(1500, n_convs=15, turns_per_conv=6)
    segs = fx.write_segments(events, f"{root}/wal", n_segments=4)
    src = DeltaTable.create(f"{root}/src", num_partitions=8, num_salts=2)
    ing.run_stream(src, segs, segments_per_epoch=1)  # epochs 1..4
    return src, root


def _snap_df(src, epoch, keys=None):
    df = ing.snapshot(src, as_of_epoch=epoch).to_pandas()
    if keys is not None:
        df = df.merge(keys, on=["conv_id", "turn_idx"])
    return df.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)


def test_feed_images_match_time_travel(src_table):
    src, _ = src_table
    feed = ivm.changes_with_before(src).to_pandas()
    assert feed["_epoch"].nunique() == 4
    for e, g in feed.groupby("_epoch"):
        keys = g[["conv_id", "turn_idx"]].drop_duplicates()
        assert len(keys) == len(g)  # one row per key per epoch
        # AFTER image == state as of e at the touched keys
        live = (
            g[g["_after_exists"]][
                ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
            ]
            .sort_values(["conv_id", "turn_idx"])
            .reset_index(drop=True)
        )
        want = _snap_df(src, int(e), keys)
        pd.testing.assert_frame_equal(live, want[live.columns])
        # a key with _after_exists=False is absent from state at e
        dead = g[~g["_after_exists"]][["conv_id", "turn_idx"]]
        assert len(dead.merge(want, on=["conv_id", "turn_idx"])) == 0
        # BEFORE image == state as of e-1 at the touched keys
        prior = _snap_df(src, int(e) - 1, keys) if e > 1 else want.iloc[:0]
        bef = (
            g[g["_before_exists"]][
                ["conv_id", "turn_idx"]
                + [f"_before_{c}" for c in ["role", "text", "tool"]]
            ]
            .rename(columns=lambda c: c.replace("_before_", ""))
            .sort_values(["conv_id", "turn_idx"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(
            bef, prior[bef.columns] if len(prior) else bef.iloc[:0], check_dtype=False
        ) if len(bef) or len(prior) == 0 else None
        new = g[~g["_before_exists"]][["conv_id", "turn_idx"]]
        if len(prior):
            assert len(new.merge(prior, on=["conv_id", "turn_idx"])) == 0
            # before keys must all exist at e-1 with matching payload
            joined = bef.merge(
                prior,
                on=["conv_id", "turn_idx"],
                suffixes=("", "_want"),
            )
            assert len(joined) == len(bef)
            for c in ["role", "text", "tool"]:
                assert (
                    joined[c].fillna("") == joined[f"{c}_want"].fillna("")
                ).all()
        else:
            assert len(bef) == 0


def test_feed_window_since_epoch(src_table):
    """A windowed feed (since=2) must carry before images equal to
    snapshot(as_of_epoch=2) — the as-of chain read, not an empty
    state."""
    src, _ = src_table
    feed = ivm.changes_with_before(src, since_epoch=2).to_pandas()
    assert set(feed["_epoch"].unique()) == {3, 4}
    g = feed[feed["_epoch"] == 3]
    keys = g[["conv_id", "turn_idx"]].drop_duplicates()
    prior = _snap_df(src, 2, keys)
    bef = g[g["_before_exists"]]
    joined = bef.merge(prior, on=["conv_id", "turn_idx"], suffixes=("_b", ""))
    assert len(joined) == len(bef) == len(prior)
    assert (joined["_before_text"] == joined["text"]).all()


def _make_text_len_derive():
    # nested def: cloudpickle ships it by VALUE (a module-level test
    # helper would pickle by reference to a module workers can't import)
    def _text_len_derive(t: pa.Table) -> pa.Table:
        return t.append_column(
            "text_len",
            pc.fill_null(pc.utf8_length(t.column("text")).cast(pa.int64()), 0),
        )

    return _text_len_derive


def _want_agg(src) -> pd.DataFrame:
    df = ing.snapshot(src).to_pandas()
    df["text_len"] = df["text"].fillna("").str.len()
    want = (
        df.groupby("role", dropna=False)
        .agg(n=("role", "size"), sum_text_len=("text_len", "sum"))
        .reset_index()
        .sort_values("role")
        .reset_index(drop=True)
    )
    return want


def _view_df(view_dir) -> pd.DataFrame:
    return (
        ivm.read_agg_view(view_dir)
        .to_pandas()
        .sort_values("role")
        .reset_index(drop=True)
        .astype({"n": "int64", "sum_text_len": "int64"})
    )


def test_sync_agg_incremental_matches_group_by(src_table, tmp_path):
    src, _ = src_table
    view = str(tmp_path / "agg_view")
    # sync in two increments: epochs 1-2, then 3-4 (retractions live in
    # the second sync — updated/deleted keys were folded by the first)
    st = ivm.sync_agg(
        src,
        view,
        group_by=["role"],
        sums=["text_len"],
        derive=_make_text_len_derive(),
        columns=["role", "text"],
        upto_epoch=2,
    )
    assert st["synced_epochs"] == 2 and st["last_epoch"] == 2
    # mid-state equals the grouped aggregate of the epoch-2 snapshot
    df2 = ing.snapshot(src, as_of_epoch=2).to_pandas()
    df2["text_len"] = df2["text"].fillna("").str.len()
    want2 = (
        df2.groupby("role", dropna=False)
        .agg(n=("role", "size"), sum_text_len=("text_len", "sum"))
        .reset_index()
        .sort_values("role")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(_view_df(view), want2)
    st = ivm.sync_agg(
        src,
        view,
        group_by=["role"],
        sums=["text_len"],
        derive=_make_text_len_derive(),
        columns=["role", "text"],
    )
    assert st["last_epoch"] == 4
    pd.testing.assert_frame_equal(_view_df(view), _want_agg(src))
    # caught-up sync is a no-op
    st = ivm.sync_agg(
        src,
        view,
        group_by=["role"],
        sums=["text_len"],
        derive=_make_text_len_derive(),
        columns=["role", "text"],
    )
    assert st["synced_epochs"] == 0


def test_sync_agg_one_shot_equals_incremental(src_table, tmp_path):
    src, _ = src_table
    one = str(tmp_path / "one")
    ivm.sync_agg(
        src,
        one,
        group_by=["role"],
        sums=["text_len"],
        derive=_make_text_len_derive(),
        columns=["role", "text"],
    )
    pd.testing.assert_frame_equal(_view_df(one), _want_agg(src))


def test_sync_agg_spec_pin_and_restore_guard(src_table, tmp_path):
    src, root = src_table
    view = str(tmp_path / "pin")
    ivm.sync_agg(src, view, group_by=["role"], columns=["role"])
    with pytest.raises(ValueError, match="spec changed"):
        ivm.sync_agg(src, view, group_by=["tool"], columns=["tool"])
    # restore the SOURCE past the view's cursor -> refuse
    clone = ing.clone_table(src, f"{root}/pin_clone")
    v2 = str(tmp_path / "pin2")
    ivm.sync_agg(clone, v2, group_by=["role"], columns=["role"])
    ing.restore(clone, 2, force=True)
    with pytest.raises(ValueError, match="restored past"):
        ivm.sync_agg(clone, v2, group_by=["role"], columns=["role"])


def test_sync_agg_after_delete_where(src_table, tmp_path):
    """Distributed predicate deletes flow through the feed as
    retractions: after delete_where, an incremental sync must drop the
    deleted rows' contributions exactly."""
    src, root = src_table
    t = ing.clone_table(src, f"{root}/del_clone")
    view = str(tmp_path / "delview")
    ivm.sync_agg(
        t,
        view,
        group_by=["role"],
        sums=["text_len"],
        derive=_make_text_len_derive(),
        columns=["role", "text"],
    )
    ing.delete_where(
        t,
        predicate=lambda b: pc.equal(b.column("role"), "tool"),
        columns=["role"],
        batch_id="drop-tools",
    )
    ivm.sync_agg(
        t,
        view,
        group_by=["role"],
        sums=["text_len"],
        derive=_make_text_len_derive(),
        columns=["role", "text"],
    )
    got = _view_df(view)
    assert "tool" not in set(got["role"])
    pd.testing.assert_frame_equal(got, _want_agg(t))


def test_feed_additive_images_accumulate(tmp_path):
    """On an additive table the images are the ACCUMULATED sums before
    and after each epoch — the policy-generic state walk, not an
    LWW-only shortcut."""
    root = str(tmp_path / "add")
    tbl = DeltaTable.create(
        root, num_partitions=4, num_salts=1, merge_policy="additive"
    )

    def ev(seq, amount):
        return pa.table(
            {
                "seq": pa.array([seq], pa.int64()),
                "op": ["U"],
                "conv_id": ["c-1"],
                "turn_idx": pa.array([0], pa.int32()),
                "ts": pa.array([1_000_000 + seq], pa.timestamp("us")),
                "amount": pa.array([amount], pa.int64()),
            }
        )

    segs = [
        fx.write_segments(ev(1, 10), str(tmp_path / "w1"), n_segments=1)[0],
        fx.write_segments(ev(2, 5), str(tmp_path / "w2"), n_segments=1)[0],
    ]
    ing.run_stream(tbl, segs, segments_per_epoch=1)  # epochs 1, 2
    feed = (
        ivm.changes_with_before(tbl)
        .to_pandas()
        .sort_values("_epoch")
        .reset_index(drop=True)
    )
    assert list(feed["amount"]) == [10, 15]
    assert feed.loc[0, "_before_exists"] == False  # noqa: E712
    assert feed.loc[1, "_before_amount"] == 10


def test_sync_agg_crash_before_commit(tmp_path):
    """Process death between the bucket folds and the meta commit
    (XGEO_CRASH_BEFORE_AGG_COMMIT): the committed view must still serve
    the PRE-crash state (meta is the commit point), and a plain re-sync
    converges to exact parity — the crashed sync's orphan files are
    invisible and reclaimed."""
    import os
    import subprocess
    import sys

    root = str(tmp_path)
    events = fx.make_change_events(800, n_convs=10, turns_per_conv=5)
    segs = fx.write_segments(events, f"{root}/wal", n_segments=3)
    src = DeltaTable.create(f"{root}/src", num_partitions=4, num_salts=1)
    ing.run_stream(src, segs, segments_per_epoch=1)  # epochs 1..3
    view = f"{root}/view"
    ivm.sync_agg(src, view, group_by=["role"], columns=["role"], upto_epoch=1)

    script = f"""
import ray, sys, os
sys.path.insert(0, {os.path.dirname(os.path.dirname(os.path.abspath(__file__)))!r})
ray.init(address="local", num_cpus=2, include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
from xgeo_ray.pipelines import ivm
from xgeo_ray.state.delta_table import DeltaTable
src = DeltaTable.open({f"{root}/src"!r})
os.environ["XGEO_CRASH_BEFORE_AGG_COMMIT"] = "1"
ivm.sync_agg(src, {view!r}, group_by=["role"], columns=["role"])
"""
    env = {k: v for k, v in os.environ.items() if k != "RAY_ADDRESS"}
    r = subprocess.run(
        [sys.executable, "-c", script], env=env, capture_output=True, timeout=240
    )
    assert r.returncode == 137, r.stderr.decode()[-2000:]
    # the committed view still reads the epoch-1 state
    assert ivm._agg_state(view)["last_epoch"] == 1
    df1 = ing.snapshot(src, as_of_epoch=1).to_pandas()
    want1 = (
        df1.groupby("role", dropna=False)
        .agg(n=("role", "size"))
        .reset_index()
        .sort_values("role")
        .reset_index(drop=True)
    )
    got1 = (
        ivm.read_agg_view(view)
        .to_pandas()
        .sort_values("role")
        .reset_index(drop=True)
        .astype({"n": "int64"})
    )
    pd.testing.assert_frame_equal(got1, want1)
    # re-sync converges to full parity; orphan files are swept
    ivm.sync_agg(src, view, group_by=["role"], columns=["role"])
    df = ing.snapshot(src).to_pandas()
    want = (
        df.groupby("role", dropna=False)
        .agg(n=("role", "size"))
        .reset_index()
        .sort_values("role")
        .reset_index(drop=True)
    )
    got = (
        ivm.read_agg_view(view)
        .to_pandas()
        .sort_values("role")
        .reset_index(drop=True)
        .astype({"n": "int64"})
    )
    pd.testing.assert_frame_equal(got, want)
    committed = set(ivm._agg_state(view)["files"].values())
    on_disk = {n for n in os.listdir(view) if n.endswith(".parquet")}
    assert on_disk == committed


def test_sync_index_lookup_by_value(src_table, tmp_path):
    """Secondary index: postings equal the value's key set in the merged
    state; an incremental sync MOVES postings when values change; one
    bucket read per lookup; lookup_by returns the merged rows."""
    import os

    src, root = src_table
    t = ing.clone_table(src, f"{root}/idx_clone")
    view = str(tmp_path / "role_idx")
    ivm.sync_index(t, view, "role", num_buckets=8)

    snap = ing.snapshot(t).to_pandas()
    for val in snap["role"].dropna().unique():
        posts = (
            ivm.lookup_index(view, val)
            .to_pandas()[["conv_id", "turn_idx"]]
            .sort_values(["conv_id", "turn_idx"])
            .reset_index(drop=True)
        )
        want = (
            snap[snap["role"] == val][["conv_id", "turn_idx"]]
            .sort_values(["conv_id", "turn_idx"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(posts, want)
        got_rows = (
            ivm.lookup_by(t, view, val)
            .to_pandas()
            .sort_values(["conv_id", "turn_idx"])
            .reset_index(drop=True)
        )
        want_rows = (
            snap[snap["role"] == val]
            .sort_values(["conv_id", "turn_idx"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(
            got_rows[want_rows.columns.tolist()], want_rows
        )

    # move some keys to a new value via a later epoch, then re-sync:
    # old postings must retract, new ones appear
    victims = snap.head(5)[["conv_id", "turn_idx"]]
    start = int(t.watermarks().max()) + 1
    batch = pa.table(
        {
            "seq": pa.array(
                np.arange(start, start + len(victims)), pa.int64()
            ),
            "op": pa.array(["U"] * len(victims)),
            "conv_id": pa.array(victims["conv_id"], pa.string()),
            "turn_idx": pa.array(victims["turn_idx"], pa.int32()),
            "ts": pa.array(
                np.full(len(victims), 4_000_000_000_000_000),
                pa.timestamp("us"),
            ),
            "role": pa.array(["moderator"] * len(victims)),
        }
    )
    segs = fx.write_segments(batch, f"{root}/idx_wal2", n_segments=1)
    ing.run_stream(t, segs, segments_per_epoch=1)
    st = ivm.sync_index(t, view, "role", num_buckets=8)
    assert st["synced_epochs"] == 1
    moved = (
        ivm.lookup_index(view, "moderator")
        .to_pandas()[["conv_id", "turn_idx"]]
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        moved,
        victims.astype(moved.dtypes.to_dict())
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True),
    )
    # the old values no longer post the moved keys
    snap2 = ing.snapshot(t).to_pandas()
    for val in snap2["role"].dropna().unique():
        posts = ivm.lookup_index(view, val).to_pandas()
        want_n = int((snap2["role"] == val).sum())
        assert len(posts) == want_n, val
    # a non-index view refuses lookup_index
    agg = str(tmp_path / "notidx")
    ivm.sync_agg(t, agg, group_by=["role"], columns=["role"])
    with pytest.raises(ValueError, match="not a sync_index"):
        ivm.lookup_index(agg, "user")


def test_sync_minmax_exact_under_updates_and_deletes(src_table, tmp_path):
    """min/max per group from the pair-count view equals the oracle over
    the final merged state at every sync cadence — exact despite
    min/max not being retractable (the multiset form is)."""
    src, root = src_table
    t = ing.clone_table(src, f"{root}/mm_clone")
    view = str(tmp_path / "mm")
    kw = dict(
        group_by=["role"],
        value="text_len",
        derive=_make_text_len_derive(),
        columns=["role", "text"],
    )
    ivm.sync_minmax(t, view, upto_epoch=2, **kw)
    ivm.sync_minmax(t, view, **kw)  # incremental remainder

    def want_mm(df):
        df = df.copy()
        df["text_len"] = df["text"].fillna("").str.len()
        return (
            df.groupby("role", dropna=False)
            .agg(
                min_text_len=("text_len", "min"),
                max_text_len=("text_len", "max"),
                n_rows=("text_len", "size"),
            )
            .reset_index()
            .sort_values("role")
            .reset_index(drop=True)
        )

    got = (
        ivm.read_minmax_view(view)
        .to_pandas()
        .sort_values("role")
        .reset_index(drop=True)
        .astype({"min_text_len": "int64", "max_text_len": "int64", "n_rows": "int64"})
    )
    pd.testing.assert_frame_equal(got, want_mm(ing.snapshot(t).to_pandas()))

    # delete the current max-length rows of one role, re-sync: the max
    # must FALL to the true next value (the non-retractable case)
    snap = ing.snapshot(t).to_pandas()
    snap["text_len"] = snap["text"].fillna("").str.len()
    role = snap["role"].dropna().iloc[0]
    grp = snap[snap["role"] == role]
    mx = grp["text_len"].max()
    kill = grp[grp["text_len"] == mx][["conv_id", "turn_idx"]]
    start = int(t.watermarks().max()) + 1
    batch = pa.table(
        {
            "seq": pa.array(np.arange(start, start + len(kill)), pa.int64()),
            "op": pa.array(["D"] * len(kill)),
            "conv_id": pa.array(kill["conv_id"], pa.string()),
            "turn_idx": pa.array(kill["turn_idx"].astype("int32"), pa.int32()),
            "ts": pa.array(
                np.full(len(kill), 4_100_000_000_000_000), pa.timestamp("us")
            ),
        }
    )
    segs = fx.write_segments(batch, f"{root}/mm_wal2", n_segments=1)
    ing.run_stream(t, segs, segments_per_epoch=1)
    ivm.sync_minmax(t, view, **kw)
    got2 = (
        ivm.read_minmax_view(view)
        .to_pandas()
        .sort_values("role")
        .reset_index(drop=True)
        .astype({"min_text_len": "int64", "max_text_len": "int64", "n_rows": "int64"})
    )
    want2 = want_mm(ing.snapshot(t).to_pandas())
    pd.testing.assert_frame_equal(got2, want2)
    new_max = int(
        want2.loc[want2["role"] == role, "max_text_len"].iloc[0]
    )
    assert new_max < mx


def test_multiset_read_folds_distinct_topk_quantiles(src_table, tmp_path):
    """One synced pair-count multiset serves every non-invertible
    read-time fold: COUNT DISTINCT, per-group top-k and exact weighted
    quantiles all equal their oracles over the final merged state —
    including after deletes retract pairs (none of these aggregates is
    invertible; the multiset form is what makes them exact)."""
    src, root = src_table
    t = ing.clone_table(src, f"{root}/ms_clone")
    view = str(tmp_path / "ms")
    kw = dict(
        group_by=["role"],
        value="text_len",
        derive=_make_text_len_derive(),
        columns=["role", "text"],
    )
    ivm.sync_minmax(t, view, upto_epoch=2, **kw)
    ivm.sync_minmax(t, view, **kw)

    def _snapvals():
        df = ing.snapshot(t).to_pandas()
        df["text_len"] = df["text"].fillna("").str.len().astype("int64")
        df["role"] = df["role"].fillna("<null>")
        return df

    def _check_all():
        snap = _snapvals()
        # --- distinct ---
        want = (
            snap.groupby("role")
            .agg(
                n_distinct_text_len=("text_len", "nunique"),
                n_rows=("text_len", "size"),
            )
            .reset_index()
            .sort_values("role")
            .reset_index(drop=True)
        )
        got = ivm.read_distinct_view(view).to_pandas()
        got["role"] = got["role"].fillna("<null>")
        got = got.sort_values("role").reset_index(drop=True).astype(
            {"n_distinct_text_len": "int64", "n_rows": "int64"}
        )
        pd.testing.assert_frame_equal(got[want.columns.tolist()], want)

        # --- top-k ---
        k = 3
        pairs = (
            snap.groupby(["role", "text_len"])
            .size()
            .reset_index(name="n")
            .sort_values(["role", "text_len"], ascending=[True, False])
        )
        wtop = pairs.groupby("role").head(k).copy()
        wtop["rank"] = wtop.groupby("role").cumcount() + 1
        wtop = wtop.reset_index(drop=True)
        gtop = ivm.read_topk_view(view, k).to_pandas()
        gtop["role"] = gtop["role"].fillna("<null>")
        gtop = (
            gtop.sort_values(["role", "rank"])
            .reset_index(drop=True)
            .astype({"text_len": "int64", "n": "int64", "rank": "int64"})
        )
        pd.testing.assert_frame_equal(gtop[wtop.columns.tolist()], wtop)

        # --- quantiles (quantile_disc: value at 1-indexed ceil(q*n)) ---
        qs = [0.1, 0.5, 0.9, 1.0]
        rows = []
        for role, g in snap.groupby("role"):
            vals = np.sort(g["text_len"].to_numpy())
            for q in qs:
                pos = max(1, int(np.ceil(q * len(vals))))
                rows.append((role, q, int(vals[pos - 1])))
        wq = pd.DataFrame(rows, columns=["role", "q", "text_len"]).sort_values(
            ["role", "q"]
        ).reset_index(drop=True)
        gq = ivm.read_quantile_view(view, qs).to_pandas()
        gq["role"] = gq["role"].fillna("<null>")
        gq = (
            gq.sort_values(["role", "q"])
            .reset_index(drop=True)
            .astype({"text_len": "int64"})
        )
        pd.testing.assert_frame_equal(gq[wq.columns.tolist()], wq)

    _check_all()

    # delete every row holding one role's median value: distinct count
    # drops, the top-k ladder shifts, quantiles move — all must track
    snap = _snapvals()
    role = snap["role"].iloc[0]
    grp = snap[snap["role"] == role]
    med = int(np.sort(grp["text_len"].to_numpy())[len(grp) // 2])
    kill = grp[grp["text_len"] == med][["conv_id", "turn_idx"]]
    assert len(kill) > 0
    start = int(t.watermarks().max()) + 1
    batch = pa.table(
        {
            "seq": pa.array(np.arange(start, start + len(kill)), pa.int64()),
            "op": pa.array(["D"] * len(kill)),
            "conv_id": pa.array(kill["conv_id"], pa.string()),
            "turn_idx": pa.array(kill["turn_idx"].astype("int32"), pa.int32()),
            "ts": pa.array(
                np.full(len(kill), 4_100_000_000_000_000), pa.timestamp("us")
            ),
        }
    )
    segs = fx.write_segments(batch, f"{root}/ms_wal2", n_segments=1)
    ing.run_stream(t, segs, segments_per_epoch=1)
    ivm.sync_minmax(t, view, **kw)
    _check_all()

    # a non-multiset view refuses all three folds
    agg = str(tmp_path / "ms_notview")
    ivm.sync_agg(t, agg, group_by=["role"], columns=["role"])
    for fold in (
        lambda: ivm.read_distinct_view(agg),
        lambda: ivm.read_topk_view(agg, 2),
        lambda: ivm.read_quantile_view(agg, [0.5]),
    ):
        with pytest.raises(ValueError, match="not a sync_minmax"):
            fold()


def test_feed_across_schema_evolution(tmp_path):
    """A feed window spanning an envelope evolution (added meta column,
    widened turn_idx): before/after images cast onto the evolved
    envelope; final-epoch after images equal the evolved snapshot."""
    root = str(tmp_path)
    events = fx.make_change_events(800, n_convs=10, turns_per_conv=5)
    segs = fx.write_segments(
        events, f"{root}/wal", n_segments=2, evolve_from=1
    )
    src = DeltaTable.create(f"{root}/src", num_partitions=4, num_salts=2)
    ing.run_stream(src, segs, segments_per_epoch=1)  # epoch 2 evolves
    feed = ivm.changes_with_before(src).to_pandas()
    assert "meta" in feed.columns and "_before_meta" in feed.columns
    g = feed[feed["_epoch"] == 2]
    keys = g[["conv_id", "turn_idx"]].drop_duplicates()
    snap = ing.snapshot(src).to_pandas()
    want = snap.merge(keys, on=["conv_id", "turn_idx"]).sort_values(
        ["conv_id", "turn_idx"]
    ).reset_index(drop=True)
    live = (
        g[g["_after_exists"]][["conv_id", "turn_idx", "text", "meta"]]
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(live, want[live.columns], check_dtype=False)
    # pre-evolution epoch rows surface with meta null
    g1 = feed[feed["_epoch"] == 1]
    assert g1["meta"].isna().all() and g1["_before_meta"].isna().all()


def test_tail_on_commit_maintains_views_live(tmp_path):
    """tail(on_commit=...) lets incremental views follow the stream
    inline: an agg view synced from the hook equals the final grouped
    state after the tailer drains; exactly-once across batches."""
    import threading
    import time

    import pyarrow.parquet as pq

    root = str(tmp_path)
    wal = f"{root}/wal"
    import os as _os

    _os.makedirs(wal)
    ev = fx.make_change_events(600, n_convs=8, turns_per_conv=5)
    n = ev.num_rows
    bounds = [round(i * n / 3) for i in range(4)]
    src = DeltaTable.create(f"{root}/src", num_partitions=4, num_salts=2)
    view = f"{root}/view"
    syncs = []

    def on_commit(ms, table):
        st = ivm.sync_agg(table, view, group_by=["role"], columns=["role"])
        syncs.append(st["synced_epochs"])

    def writer():
        for k in range(3):
            seg = ev.slice(bounds[k], bounds[k + 1] - bounds[k])
            tmp = f"{wal}/.tmp-{k}"
            pq.write_table(seg, tmp)
            _os.replace(tmp, f"{wal}/segment-{k:05d}.parquet")
            time.sleep(0.4)

    th = threading.Thread(target=writer)
    th.start()
    ing.tail(
        src,
        wal,
        poll_interval_s=0.1,
        segments_per_epoch=1,
        idle_polls_to_stop=8,
        stable_for_s=0.1,
        on_commit=on_commit,
    )
    th.join()
    assert sum(syncs) == src.latest_epoch() >= 3
    got = (
        ivm.read_agg_view(view)
        .to_pandas()
        .sort_values("role")
        .reset_index(drop=True)
        .astype({"n": "int64"})
    )
    df = ing.snapshot(src).to_pandas()
    want = (
        df.groupby("role", dropna=False)
        .agg(n=("role", "size"))
        .reset_index()
        .sort_values("role")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)


def test_sync_agg_over_coalesce_table(tmp_path):
    """IVM over a PARTIAL-UPDATE table: before/after images are the
    coalesced states (policy-generic state walk), so an agg view over a
    patch stream still equals the grouped final state — null patch
    columns must not retract as value changes."""
    root = str(tmp_path)
    rng = np.random.default_rng(13)
    rows = []
    for seq in range(300):
        conv = f"c{rng.integers(0, 10)}"
        turn = int(rng.integers(0, 3))
        if rng.random() < 0.06:
            op, role, text = "D", None, None
        elif rng.random() < 0.4:
            op = "I"
            role = f"r{rng.integers(0, 3)}"
            text = f"t{seq}"
        else:
            op = "U"
            role = f"r{rng.integers(0, 3)}" if rng.random() < 0.4 else None
            text = f"t{seq}" if rng.random() < 0.5 else None
        rows.append(
            {
                "seq": seq,
                "op": op,
                "conv_id": conv,
                "turn_idx": turn,
                "ts": 1_000_000 + seq * 100,
                "role": role,
                "text": text,
            }
        )
    events = pa.table(
        {
            "seq": pa.array([r["seq"] for r in rows], pa.int64()),
            "op": pa.array([r["op"] for r in rows]),
            "conv_id": pa.array([r["conv_id"] for r in rows]),
            "turn_idx": pa.array([r["turn_idx"] for r in rows], pa.int32()),
            "ts": pa.array([r["ts"] for r in rows], pa.timestamp("us")),
            "role": pa.array([r["role"] for r in rows], pa.string()),
            "text": pa.array([r["text"] for r in rows], pa.string()),
        }
    )
    segs = fx.write_segments(events, f"{root}/wal", n_segments=3)
    t = DeltaTable.create(
        f"{root}/t", num_partitions=4, num_salts=2, merge_policy="coalesce"
    )
    ing.run_stream(t, segs, segments_per_epoch=1)  # 3 epochs
    view = f"{root}/view"
    ivm.sync_agg(
        t,
        view,
        group_by=["role"],
        sums=["text_len"],
        derive=_make_text_len_derive(),
        columns=["role", "text"],
        upto_epoch=2,
    )
    ivm.sync_agg(
        t,
        view,
        group_by=["role"],
        sums=["text_len"],
        derive=_make_text_len_derive(),
        columns=["role", "text"],
    )
    got = (
        ivm.read_agg_view(view)
        .to_pandas()
        .sort_values("role", na_position="first")
        .reset_index(drop=True)
        .astype({"n": "int64", "sum_text_len": "int64"})
    )
    df = ing.snapshot(t).to_pandas()
    df["text_len"] = df["text"].fillna("").str.len()
    want = (
        df.groupby("role", dropna=False)
        .agg(n=("role", "size"), sum_text_len=("text_len", "sum"))
        .reset_index()
        .sort_values("role", na_position="first")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)


def test_feed_on_history_table(tmp_path):
    """history='full' deltas keep every version per key per epoch; the
    feed must collapse each epoch to its end-of-epoch winner before
    imaging — after images still equal epoch time travel."""
    root = str(tmp_path)
    events = fx.make_change_events(500, n_convs=6, turns_per_conv=4)
    segs = fx.write_segments(events, f"{root}/wal", n_segments=2)
    src = DeltaTable.create(
        f"{root}/src", num_partitions=4, num_salts=1, history="full"
    )
    ing.run_stream(src, segs, segments_per_epoch=1)
    feed = ivm.changes_with_before(src).to_pandas()
    for e in (1, 2):
        g = feed[feed["_epoch"] == e]
        assert g.duplicated(["conv_id", "turn_idx"]).sum() == 0
        keys = g[["conv_id", "turn_idx"]].drop_duplicates()
        want = _snap_df(src, e, keys)
        live = (
            g[g["_after_exists"]][["conv_id", "turn_idx", "text"]]
            .sort_values(["conv_id", "turn_idx"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(live, want[live.columns])


def test_sync_agg_upto_epoch_clamps_to_effective(src_table, tmp_path):
    """An explicit upto_epoch beyond the committed fence must clamp to
    the largest EFFECTIVE epoch — not seal the cursor ahead and skip
    every epoch committed underneath it."""
    src, root = src_table
    t = ing.clone_table(src, f"{root}/clamp_clone")
    view = str(tmp_path / "clamp")
    st = ivm.sync_agg(
        t, view, group_by=["role"], columns=["role"], upto_epoch=999
    )
    assert st["last_epoch"] == t.latest_epoch() == 4
    # later epochs still sync (nothing was skipped by the big upto)
    ev2 = fx.make_change_events(120, n_convs=15, turns_per_conv=6, seed=91)
    seqs = pc.add(ev2.column("seq"), int(t.watermarks().max()) + 1)
    ev2 = ev2.set_column(ev2.schema.get_field_index("seq"), "seq", seqs)
    segs = fx.write_segments(ev2, f"{root}/clamp_wal2", n_segments=1)
    ing.run_stream(t, segs, segments_per_epoch=1)
    st = ivm.sync_agg(t, view, group_by=["role"], columns=["role"])
    assert st["synced_epochs"] == 1 and st["last_epoch"] == 5
    got = (
        ivm.read_agg_view(view)
        .to_pandas()
        .sort_values("role")
        .reset_index(drop=True)
    )
    want = (
        ing.snapshot(t)
        .to_pandas()
        .groupby("role", dropna=False)
        .size()
        .rename("n")
        .reset_index()
        .sort_values("role")
        .reset_index(drop=True)
    )
    assert got["role"].tolist() == want["role"].tolist()
    assert got["n"].astype("int64").tolist() == want["n"].astype("int64").tolist()


def test_sync_agg_default_upto_lands_on_effective_after_restore(
    src_table, tmp_path
):
    """latest_epoch() counts restore markers; the default cursor must
    land on an EFFECTIVE epoch or the view's own restore guard would
    trip forever on the next sync."""
    src, root = src_table
    t = ing.clone_table(src, f"{root}/restore_cursor_clone")
    ing.restore(t, 2, force=True)  # mints a marker epoch above 4
    view = str(tmp_path / "marker")
    st = ivm.sync_agg(t, view, group_by=["role"], columns=["role"])
    eff = {m.epoch for m in t.effective_manifests()}
    assert st["last_epoch"] in eff
    # and the follow-up sync is a clean no-op, not a guard trip
    st2 = ivm.sync_agg(t, view, group_by=["role"], columns=["role"])
    assert st2["synced_epochs"] == 0
    got = (
        ivm.read_agg_view(view)
        .to_pandas()
        .sort_values("role")
        .reset_index(drop=True)
    )
    want = (
        ing.snapshot(t)
        .to_pandas()
        .groupby("role", dropna=False)
        .size()
        .rename("n")
        .reset_index()
        .sort_values("role")
        .reset_index(drop=True)
    )
    assert got["n"].astype("int64").tolist() == want["n"].astype("int64").tolist()


def test_sync_agg_derive_id_pins_derive_version(src_table, tmp_path):
    """The derive callable can't be pickled into the spec pin; derive_id
    is the user-declared version string that IS pinned. Changing it
    refuses; a pre-derive_id state (no key in the committed spec) still
    accepts the default."""
    src, _ = src_table
    view = str(tmp_path / "dpin")
    kw = dict(
        group_by=["role"],
        sums=["text_len"],
        derive=_make_text_len_derive(),
        columns=["role", "text"],
    )
    ivm.sync_agg(src, view, upto_epoch=2, derive_id="v1", **kw)
    with pytest.raises(ValueError, match="spec changed"):
        ivm.sync_agg(src, view, derive_id="v2", **kw)
    st = ivm.sync_agg(src, view, derive_id="v1", **kw)
    assert st["last_epoch"] == 4
    # pre-derive_id on-disk state: spec without the key == derive_id ""
    legacy = str(tmp_path / "legacy")
    ivm.sync_agg(src, legacy, upto_epoch=2, **kw)
    state = ivm._agg_state(legacy)
    state["spec"].pop("derive_id")
    ivm._write_agg_state(legacy, state)
    st = ivm.sync_agg(src, legacy, **kw)
    assert st["last_epoch"] == 4
    pd.testing.assert_frame_equal(_view_df(legacy), _want_agg(src))


def test_read_minmax_view_rejects_other_view_shapes(src_table, tmp_path):
    """A sync_index view (3-col group, bucket_by=value) and a
    multi-column sync_agg view (bucket_by unset) must both be refused —
    folding min/max of their LAST group column would be meaningless."""
    src, _ = src_table
    idx = str(tmp_path / "idx")
    ivm.sync_index(src, idx, "role", num_buckets=4, upto_epoch=2)
    with pytest.raises(ValueError, match="not a sync_minmax"):
        ivm.read_minmax_view(idx)
    agg = str(tmp_path / "agg2")
    ivm.sync_agg(
        src, agg, group_by=["role", "tool"], columns=["role", "tool"],
        upto_epoch=2,
    )
    with pytest.raises(ValueError, match="not a sync_minmax"):
        ivm.read_minmax_view(agg)


def test_sync_agg_event_time_buckets(src_table, tmp_path):
    """Tumbling event-time window view: grouping on a ts-derived bucket
    is retraction-sound because the feed exposes each image's OWN ts
    (_before_ts for the before image) — an updated key retracts from
    the window its old version lived in."""
    src, _ = src_table
    view = str(tmp_path / "bucket_view")

    def _want(epoch):
        df = ing.snapshot(src, as_of_epoch=epoch).to_pandas()
        return (
            df.assign(bucket=df["ts"].dt.floor("ms"))
            .groupby("bucket", dropna=False)
            .agg(n=("bucket", "size"))
            .reset_index()
            .sort_values("bucket")
            .reset_index(drop=True)
        )

    def _got():
        return (
            ivm.read_agg_view(view)
            .to_pandas()
            .sort_values("bucket")
            .reset_index(drop=True)
            .astype({"n": "int64"})
        )

    # incremental: epochs 1-2, then 3-4 — the second sync carries
    # cross-bucket moves (updates re-ts keys into later milliseconds)
    ivm.sync_agg(
        src,
        view,
        group_by=["bucket"],
        derive=ivm.time_bucket_derive("millisecond"),
        derive_id="bucket-ms",
        columns=[],
        upto_epoch=2,
    )
    pd.testing.assert_frame_equal(_got(), _want(2))
    ivm.sync_agg(
        src,
        view,
        group_by=["bucket"],
        derive=ivm.time_bucket_derive("millisecond"),
        derive_id="bucket-ms",
        columns=[],
    )
    pd.testing.assert_frame_equal(_got(), _want(4))


def test_read_closed_windows(src_table, tmp_path):
    """Window finalization: only buckets whose end is at-or-below the
    event-time watermark (minus lateness) are closed; the lateness knob
    moves the line backward."""
    src, _ = src_table
    view = str(tmp_path / "closed_view")
    ivm.sync_agg(
        src,
        view,
        group_by=["bucket"],
        derive=ivm.time_bucket_derive("millisecond"),
        derive_id="bucket-ms",
        columns=[],
    )
    allv = (
        ivm.read_agg_view(view).to_pandas().sort_values("bucket")
    )
    wm = pd.to_datetime(src.event_time_watermark(), unit="us")
    closed = ivm.read_closed_windows(
        src, view, unit="millisecond"
    ).to_pandas()
    one_ms = pd.Timedelta(milliseconds=1)
    assert (closed["bucket"] + one_ms <= wm).all()
    want = allv[allv["bucket"] + one_ms <= wm]
    assert len(closed) == len(want) > 0
    assert len(closed) < len(allv)  # the watermark-edge bucket is open
    # more lateness closes fewer windows; a huge allowance closes none
    fewer = ivm.read_closed_windows(
        src, view, unit="millisecond", allowed_lateness_us=100_000
    )
    assert 0 < fewer.num_rows < len(closed)
    none = ivm.read_closed_windows(
        src, view, unit="millisecond", allowed_lateness_us=10**12
    )
    assert none.num_rows == 0
    with pytest.raises(ValueError, match="fixed width"):
        ivm.read_closed_windows(src, view, unit="month")


def test_sync_agg_hopping_windows(src_table, tmp_path):
    """Overlapping (hopping) windows: each row counts in `hops`
    windows; updates retract from every window the old version
    occupied. Incremental view == direct expansion of the snapshot."""
    src, _ = src_table
    view = str(tmp_path / "hop_view")
    HOPS = 3

    def _want(epoch):
        df = ing.snapshot(src, as_of_epoch=epoch).to_pandas()
        fl = df["ts"].dt.floor("ms")
        parts = [
            fl - pd.Timedelta(milliseconds=k) for k in range(HOPS)
        ]
        buckets = pd.concat(parts, ignore_index=True).astype(
            "datetime64[us]"
        )
        return (
            buckets.to_frame("bucket")
            .groupby("bucket")
            .size()
            .rename("n")
            .reset_index()
            .sort_values("bucket")
            .reset_index(drop=True)
        )

    def _got():
        return (
            ivm.read_agg_view(view)
            .to_pandas()
            .sort_values("bucket")
            .reset_index(drop=True)
            .astype({"n": "int64"})
        )

    kw = dict(
        group_by=["bucket"],
        derive=ivm.hopping_window_derive("millisecond", hops=HOPS),
        derive_id=f"hop-ms-{HOPS}",
        columns=[],
    )
    ivm.sync_agg(src, view, upto_epoch=2, **kw)
    pd.testing.assert_frame_equal(_got(), _want(2))
    ivm.sync_agg(src, view, **kw)
    pd.testing.assert_frame_equal(_got(), _want(4))


def test_sync_minmax_per_window(src_table, tmp_path):
    """Composition: per-WINDOW exact max via sync_minmax grouped on a
    ts-derived bucket — retraction-correct because both images derive
    their own bucket (from ts / _before_ts)."""
    src, _ = src_table
    view = str(tmp_path / "win_minmax")

    def _derive():
        def _f(t: pa.Table) -> pa.Table:
            t = t.append_column(
                "bucket", pc.floor_temporal(t.column("ts"), unit="millisecond")
            )
            return t.append_column(
                "text_len",
                pc.fill_null(
                    pc.utf8_length(t.column("text")).cast(pa.int64()), 0
                ),
            )

        return _f

    ivm.sync_minmax(
        src, view, group_by=["bucket"], value="text_len",
        derive=_derive(), columns=["text"],
    )
    got = (
        ivm.read_minmax_view(view)
        .to_pandas()
        .sort_values("bucket")
        .reset_index(drop=True)
    )
    df = ing.snapshot(src).to_pandas()
    df["bucket"] = df["ts"].dt.floor("ms")
    df["text_len"] = df["text"].fillna("").str.len()
    want = (
        df.groupby("bucket")
        .agg(
            min_text_len=("text_len", "min"),
            max_text_len=("text_len", "max"),
            n_rows=("text_len", "size"),
        )
        .reset_index()
        .sort_values("bucket")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[want.columns].astype({"n_rows": "int64", "min_text_len": "int64", "max_text_len": "int64"}),
        want.astype({"n_rows": "int64", "min_text_len": "int64", "max_text_len": "int64"}),
        check_dtype=False,
    )
