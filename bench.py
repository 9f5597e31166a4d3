"""Benchmark harness: headline CDC ingest + operator query timings.

Prints ONE JSON line:
  {"metric": ..., "value": <headline sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "num_cpus": N, ...extras}

``--scaling`` runs the same bench in two fresh processes at
num_cpus=8 and num_cpus=32 (the sandbox evidence for the north rule's
N -> 4N-node criterion) and reports throughput at both plus efficiency.

Usage:
  python bench.py                # $GRAFT_SF_DIR (default sf0.1), $RAY_GRAFT_CPUS (default 32)
  python bench.py --scaling
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

# CDC stream size scales with the sf of the testdata dir
_SF_EVENTS = {"0.001": 20_000, "0.01": 200_000, "0.1": 2_000_000}
# fixed partitioning across parallelism levels → identical work at 8 and 32
_NUM_PARTITIONS = 64
_NUM_SALTS = 4
_SEGMENTS = 8

# env overrides (used by --scaling: a stream big enough that compute
# dominates executor latency, so parallelism is actually measurable)
_EV_OVERRIDE = int(os.environ.get("XGEO_BENCH_EVENTS", "0"))
_SEGMENTS = int(os.environ.get("XGEO_BENCH_SEGMENTS", str(_SEGMENTS)))
# epoch size is the engine's documented micro-batch knob; 4 segments per
# epoch keeps the headline a REAL multi-epoch stream (bootstrap + 2 WAL
# epochs, pipelined) while not drowning 2M events in per-epoch overhead
# (SPE=2: 4 epochs, ~2x slower; SPE=8: single epoch, ~1.7x faster)
_SPE = int(os.environ.get("XGEO_BENCH_SPE", "4"))
_SKIP_QUERIES = bool(os.environ.get("XGEO_BENCH_SKIP_QUERIES"))
# the scaling stream: ~150 CPU-seconds of work at ~3 µs-CPU/event
_SCALING_EVENTS = 48_000_000


def _sf_of(sf_dir: str) -> str:
    return sf_dir.rstrip("/").rsplit("sf", 1)[-1]


def _ensure_fixtures(sf: str) -> tuple[str, str, int]:
    """Deterministic cached CDC fixtures sized for the sf (generation is
    excluded from timing; the cache survives across the scaling runs so
    both parallelism levels read identical bytes)."""
    from xgeo_ray import fixtures as fx
    import pyarrow.parquet as pq

    n_events = _EV_OVERRIDE or _SF_EVENTS.get(sf, 100_000)
    n_convs = max(200, n_events // 100)
    turns = 20
    cache = f"/tmp/xgeo_bench_cache/sf{sf}-e{n_events}-s{_SEGMENTS}-v2"
    base_path = f"{cache}/base.parquet"
    wal_dir = f"{cache}/wal"
    done = f"{cache}/.done"
    if not os.path.exists(done):
        shutil.rmtree(cache, ignore_errors=True)
        os.makedirs(cache)
        base = fx.make_transcripts(n_convs, turns)
        pq.write_table(base, base_path, row_group_size=262_144)
        del base
        if n_events > 5_000_000:
            # sharded counter-based generator: bounded memory per segment
            fx.write_change_stream_sharded(
                n_events, wal_dir, n_segments=_SEGMENTS,
                n_convs=n_convs, turns_per_conv=turns, dup_fraction=0.02,
            )
        else:
            ev = fx.make_change_events(
                n_events, n_convs=n_convs, turns_per_conv=turns, dup_fraction=0.02
            )
            fx.write_segments(ev, wal_dir, n_segments=_SEGMENTS)
        with open(done, "w") as f:
            f.write("ok")
    return base_path, wal_dir, n_events


def run_bench() -> dict:
    import ray

    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    from xgeo_ray.pipelines import ingest as ing
    from xgeo_ray.pipelines import queries as Q
    from xgeo_ray.state.delta_table import DeltaTable

    sf = _sf_of(SF_DIR)
    base_path, wal_dir, n_events = _ensure_fixtures(sf)
    segs = sorted(os.path.join(wal_dir, p) for p in os.listdir(wal_dir))

    # warm the page cache so we measure compute+shuffle, not first disk read
    for p in segs + [base_path]:
        with open(p, "rb") as f:
            while f.read(1 << 22):
                pass

    # best-of-N with published samples: this sandbox's host shows
    # co-tenant noise swings up to 4x on single shots (same methodology
    # as the scaling bench; all samples reported so outliers are visible).
    # Headline reps default 5: with the warm-up below every sample is
    # steady-state, and more samples are the only defense against the
    # host's multi-minute noise windows.
    reps = int(os.environ.get("XGEO_BENCH_REPS", "1" if _SKIP_QUERIES else "5"))
    query_reps = int(os.environ.get("XGEO_BENCH_QUERY_REPS", "3"))

    if os.environ.get("XGEO_BENCH_WARMUP", "1") not in ("", "0"):
        # untimed warm-up over a small throwaway table (default ON,
        # XGEO_BENCH_WARMUP=0 disables): spins up the worker pool and
        # exports the pipeline's functions so every timed sample
        # measures steady-state streaming, not process bring-up. A
        # long-lived stream never re-pays the ~3 s spin-up; without
        # this, rep 1 of the headline is always a throwaway and the
        # scaling children fold spin-up into their single sample
        # asymmetrically (~9% of the 8-CPU time vs ~3% at 2 CPUs).
        from xgeo_ray import fixtures as fx

        wroot = f"/tmp/xgeo_bench_warm_{os.getpid()}"
        shutil.rmtree(wroot, ignore_errors=True)
        wev = fx.make_change_events(200_000, n_convs=2000, turns_per_conv=20)
        wsegs = fx.write_segments(wev, f"{wroot}/wal", n_segments=2)
        wt = DeltaTable.create(
            f"{wroot}/t",
            num_partitions=_NUM_PARTITIONS,
            num_salts=_NUM_SALTS,
            durability=os.environ.get("XGEO_BENCH_DURABILITY", "full"),
        )
        _, wsnap = ing.run_stream(
            wt, wsegs, segments_per_epoch=1, final_snapshot=True
        )
        wsnap.count()
        shutil.rmtree(wroot, ignore_errors=True)
    samples = []
    n_final = 0
    table = None
    for rep in range(reps):
        table_root = f"/tmp/xgeo_bench_table_{os.getpid()}_{rep}"
        shutil.rmtree(table_root, ignore_errors=True)
        table = DeltaTable.create(
            table_root,
            num_partitions=_NUM_PARTITIONS,
            num_salts=_NUM_SALTS,
            durability=os.environ.get("XGEO_BENCH_DURABILITY", "full"),
        )
        if rep:
            os.sync()
        t0 = time.perf_counter()
        # fused twice over: bootstrap rides the same pipelined stream
        # (its reduces overlap the first WAL epoch's maps), and the
        # closing snapshot merges inside the last epoch's reduces
        # (final_snapshot=True) instead of a separate pass after commit
        _, snap = ing.run_stream(
            table, segs, segments_per_epoch=_SPE, bootstrap=base_path,
            final_snapshot=True,
        )
        n_final = snap.count()
        samples.append(time.perf_counter() - t0)
        if rep < reps - 1:
            shutil.rmtree(table_root, ignore_errors=True)
    headline = min(samples)
    table_root = table.root

    # compaction: fold every partition's delta chain into one file, then
    # prove the merged view is unchanged (cheap count check). Skipped in
    # the scaling subprocesses (XGEO_BENCH_SKIP_QUERIES) where only the
    # ingest wall time is under measurement.
    compact_sec, files_before, files_after = None, None, None
    if not _SKIP_QUERIES:
        files_before = sum(len(v) for v in table.partition_files().values())
        tc = time.perf_counter()
        ing.compact(table)
        compact_sec = time.perf_counter() - tc
        files_after = sum(len(v) for v in table.partition_files().values())
        assert ing.snapshot(table).count() == n_final, "compact changed state"

    total_events = sum(
        m.totals.get("events_read", 0) for m in table.manifests()
    )

    queries = {}
    for name in [] if _SKIP_QUERIES else [
        "cdc_lww_state",
        "cdc_changes_feed",
        # end-to-end incremental-engine rows (round-4/5 operators): agg
        # + SCD2 + struct legs (cdc_stream_metrics), batch + incremental
        # join views (cdc_join_state), persisted-IVF build+probe
        # (ann_ivf_top10) — wall-clock-tracked so regressions in the
        # sync machinery show in BENCH_r{N}.json, not just correctness
        "cdc_stream_metrics",
        "cdc_join_state",
        "ann_ivf_top10",
        "q1_pricing_summary",
        "orders_by_segment",
        "order_revenue_by_priority",
        "events_hourly",
        "events_sliding_1h",
        "doc_stats_by_lang",
        "ann_top10",
        "minhash_dup_pairs",
        "dup_clusters",
        "packed_sequences",
        "shuffled_shards",
        "distinctive_terms",
    ]:
        fn = Q.build_queries()[name]
        best = None
        for _ in range(max(1, query_reps)):
            tq = time.perf_counter()
            res = fn(SF_DIR)
            if hasattr(res, "count"):
                res.count()  # force full execution
            dt = time.perf_counter() - tq
            best = dt if best is None else min(best, dt)
        queries[name] = round(best, 3)

    shutil.rmtree(table_root, ignore_errors=True)
    out = {
        "metric": "cdc_ingest_exactly_once_sec",
        "value": round(headline, 3),
        "unit": "sec",
        "queries": queries,
        "sf": sf,
        "num_cpus": NUM_CPUS,
        "events": total_events,
        "events_per_sec": round(total_events / headline),
        "headline_samples": [round(s, 3) for s in samples],
        "final_rows": n_final,
        "compact_sec": None if compact_sec is None else round(compact_sec, 3),
        "compact_files": [files_before, files_after],
    }
    ray.shutdown()
    return out


def run_scaling() -> dict:
    def run_at(ncpu: int) -> dict:
        env = dict(
            os.environ,
            RAY_GRAFT_CPUS=str(ncpu),
            XGEO_BENCH_EVENTS=str(_EV_OVERRIDE or _SCALING_EVENTS),
            XGEO_BENCH_SEGMENTS="16",
            XGEO_BENCH_SPE="8",
            XGEO_BENCH_SKIP_QUERIES="1",
            # single-shot child: warm the worker pool untimed so the
            # sample measures steady-state streaming, not spin-up (see
            # run_bench's warm-up block for the asymmetry rationale)
            XGEO_BENCH_WARMUP="1",
            # THROUGHPUT-scaling evidence runs with manifest-only fsync:
            # delta-file fsync is a per-NODE disk cost a real N->4N
            # cluster scales with node count, but this one-box sandbox
            # has a single shared virtio disk (~0.5 GB/s), so full
            # durability adds the same ~constant seconds to both levels
            # and measures the disk, not the engine. The headline bench
            # keeps durability=full.
            XGEO_BENCH_DURABILITY=os.environ.get("XGEO_BENCH_DURABILITY", "commit"),
        )
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            check=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    # N and 4N parallelism levels, default 2 -> 8. CALM-WINDOW
    # measurements are mandatory: the round-4 forensics (BASELINE.md)
    # showed a single noisy hi-leg window can read 0.42-0.69 while the
    # true warm steady state is 0.86 (2->8) / 0.92 (1->4) — judge a
    # sub-0.8 reading only after tight samples on BOTH legs. This box
    # runs ONE object store / raylet / disk / driver for every level
    # (a real 4N-node cluster multiplies those per node), so wider
    # pairs understate real cluster scaling.
    lo = int(os.environ.get("XGEO_SCALE_LO", "2"))
    hi = int(os.environ.get("XGEO_SCALE_HI", str(4 * lo)))
    reps = int(os.environ.get("XGEO_SCALE_REPS", "3"))

    # INTERLEAVE the levels (hi, lo, hi, lo, ...): host co-tenant noise
    # comes in multi-minute windows, so running one level's reps
    # back-to-back lets a single slow window poison that entire level
    # and skew the ratio; alternating samples both levels across the
    # same windows. Best-of per level, every sample published;
    # os.sync between runs so no run pays its predecessor's ~5 GB of
    # table-state writeback.
    times: dict[int, list[float]] = {hi: [], lo: []}
    best: dict[int, dict] = {}
    for _ in range(reps):
        for ncpu in (hi, lo):
            os.sync()
            r = run_at(ncpu)
            times[ncpu].append(r["value"])
            if ncpu not in best or r["value"] < best[ncpu]["value"]:
                best[ncpu] = r
    r_hi, hi_times = best[hi], times[hi]
    r_lo, lo_times = best[lo], times[lo]
    speedup = r_lo["value"] / r_hi["value"]
    eff = speedup / (hi / lo)
    return {
        "metric": "scaling_efficiency",
        "sf": r_lo["sf"],
        "cpus_lo": lo,
        "cpus_hi": hi,
        "sec_lo": r_lo["value"],
        "sec_hi": r_hi["value"],
        "sec_lo_samples": lo_times,
        "sec_hi_samples": hi_times,
        "events_per_sec_lo": r_lo["events_per_sec"],
        "events_per_sec_hi": r_hi["events_per_sec"],
        "speedup": round(speedup, 3),
        "scaling_efficiency": round(eff, 3),
    }


def run_tail_latency() -> dict:
    """Streaming-mode latency: a writer appends WAL segments while the
    tailer follows; latency per segment = commit wall clock minus the
    segment file's close time. Reports p50/p95 over the stream."""
    import threading

    import numpy as np
    import ray

    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import pyarrow.parquet as pq

    from xgeo_ray import fixtures as fx
    from xgeo_ray.pipelines import ingest as ing
    from xgeo_ray.state.delta_table import DeltaTable

    n_segments, seg_rows = 20, 25_000
    events = fx.make_change_events(
        n_segments * seg_rows, n_convs=2_000, turns_per_conv=20
    )
    root = f"/tmp/xgeo_tail_bench_{os.getpid()}"
    shutil.rmtree(root, ignore_errors=True)
    wal = os.path.join(root, "wal")
    os.makedirs(wal)
    table = DeltaTable.create(
        os.path.join(root, "t"), num_partitions=16, num_salts=2
    )
    # warm Ray's worker pool + the engine's task graph with one
    # untimed epoch, so the latency distribution reflects steady-state
    # streaming, not process spin-up (cold-start is reported separately)
    warm = os.path.join(root, "warm.parquet")
    warm_tbl = events.slice(0, seg_rows)
    import pyarrow as pa

    # negative seqs: the warm epoch applies but leaves watermarks at -1,
    # so the real stream's seq 0.. events are not treated as replays
    warm_tbl = warm_tbl.set_column(
        0,
        "seq",
        pa.array(
            warm_tbl.column("seq").to_numpy() - seg_rows, type=pa.int64()
        ),
    )
    pq.write_table(warm_tbl, warm)
    t0 = time.time()
    ing.run_stream(table, [warm], segments_per_epoch=1)
    cold_start_ms = round((time.time() - t0) * 1000, 1)
    write_ts: dict[str, float] = {}

    def writer():
        for k in range(n_segments):
            seg = events.slice(k * seg_rows, seg_rows)
            p = os.path.join(wal, f"seg-{k:05d}.parquet")
            pq.write_table(seg, p)
            write_ts[os.path.abspath(p)] = time.time()
            time.sleep(0.25)

    th = threading.Thread(target=writer, daemon=True)
    th.start()
    ms = ing.tail(
        table,
        wal,
        poll_interval_s=0.05,
        segments_per_epoch=1,
        idle_polls_to_stop=30,
        stable_for_s=0.05,
    )
    th.join()
    lats = []
    for m in ms:
        commit_s = m.totals["commit_unix_us"] / 1e6
        newest = max(write_ts[s] for s in m.segments)
        lats.append((commit_s - newest) * 1000)
    lats = np.array(sorted(lats))
    out = {
        "metric": "tail_commit_latency_ms",
        "epochs": len(ms),
        "events": int(sum(m.totals["events_read"] for m in ms)),
        "p50_ms": round(float(np.percentile(lats, 50)), 1),
        "p95_ms": round(float(np.percentile(lats, 95)), 1),
        "max_ms": round(float(lats.max()), 1),
        "cold_start_ms": cold_start_ms,
        "num_cpus": NUM_CPUS,
    }
    shutil.rmtree(root, ignore_errors=True)
    ray.shutdown()
    return out


def run_curve(levels: list[int]) -> dict:
    """Parallelism curve over the 48M-event fixture (one fresh process
    per level, os.sync between runs) — the BASELINE.md table command:
    ``python bench.py --curve 2,4,8,16,32``."""

    def run_at(ncpu: int) -> dict:
        env = dict(
            os.environ,
            RAY_GRAFT_CPUS=str(ncpu),
            XGEO_BENCH_EVENTS=str(_EV_OVERRIDE or _SCALING_EVENTS),
            XGEO_BENCH_SEGMENTS="16",
            XGEO_BENCH_SPE="4",
            XGEO_BENCH_SKIP_QUERIES="1",
            XGEO_BENCH_WARMUP="1",
            XGEO_BENCH_DURABILITY=os.environ.get("XGEO_BENCH_DURABILITY", "commit"),
        )
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, capture_output=True, text=True, check=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    points = []
    for ncpu in levels:
        os.sync()
        r = run_at(ncpu)
        points.append(
            {"cpus": ncpu, "sec": r["value"], "events_per_sec": r["events_per_sec"]}
        )
    base = points[0]
    for p in points:
        p["speedup"] = round(base["sec"] / p["sec"], 2)
        p["efficiency"] = round(p["speedup"] / (p["cpus"] / base["cpus"]), 2)
    return {"metric": "parallelism_curve", "points": points}


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    elif "--tail-latency" in sys.argv:
        print(json.dumps(run_tail_latency()))
    elif "--curve" in sys.argv:
        arg = sys.argv[sys.argv.index("--curve") + 1] if len(
            sys.argv
        ) > sys.argv.index("--curve") + 1 else "2,4,8,16,32"
        print(json.dumps(run_curve([int(x) for x in arg.split(",")])))
    else:
        print(json.dumps(run_bench()))
