"""Multi-table WAL demux — route one CDC stream into per-table streams.

A real binlog / CDC topic carries MANY tables' events interleaved in one
globally seq-ordered stream; each downstream table wants only its own.
``demux_wal`` splits WAL segments by a route column into one WAL
directory per route, preserving delivery (seq) order within each route —
every route directory is then a normal single-table WAL that
``ingest.run_stream`` / ``ingest.tail`` consume unchanged, with
independent watermarks, schemas and lifecycle per table.

Scale shape: one Ray task per input segment (the same unit the ingest
readers use), vectorized route split (Arrow dictionary filter — no row
loops), bytes never visit the driver. Resume is exactly-once per
segment: route files publish atomically (tmp + fsync + rename), then a
per-segment done-marker commits the split — a crash between the two
replays the segment and the rewrites are byte-identical.

No counterpart in the reference (single-stream CLI,
/root/reference/cmd/xgeo/main.go); routing semantics follow the public
Debezium topic-routing / single-message-transform convention.
"""

from __future__ import annotations

import json
import os
import re

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray

_MARKER_DIR = "_demux"
_ROUTE_RE = re.compile(r"^[A-Za-z0-9][A-Za-z0-9._-]*$")


def _marker_path(out_root: str, base: str) -> str:
    return os.path.join(out_root, _MARKER_DIR, f"{base}.json")


@ray.remote
def _demux_segment_task(
    path: str, index: int, out_root: str, route_col: str, keep_route_col: bool
) -> dict:
    """Split ONE WAL segment by route value and publish each route's
    slice as ``<route>/{index:06d}-{base}.parquet`` (the index prefix
    makes lexicographic order == delivery order for tailing consumers).
    The done-marker write is the commit point — route files land first,
    so a marker always describes fully published files."""
    from xgeo_ray.sources.wal import read_segment_table
    from xgeo_ray.state.storage import DEFAULT_STORAGE
    from xgeo_ray.tuning import limit_worker_threads

    limit_worker_threads()
    t = read_segment_table(path)
    if route_col not in t.column_names:
        raise ValueError(
            f"segment {path} has no route column {route_col!r} "
            f"(have: {t.column_names})"
        )
    col = t.column(route_col).cast(pa.string())
    if col.null_count:
        raise ValueError(
            f"segment {path}: {col.null_count} events with null "
            f"{route_col!r} — a route-less event has no home table"
        )
    base = os.path.basename(path).split(".")[0]
    routes = sorted(pc.unique(col).to_pylist())
    bad = [r for r in routes if not _ROUTE_RE.match(r)]
    if bad:
        raise ValueError(
            f"segment {path}: route values must be filesystem-safe "
            f"([A-Za-z0-9._-], no leading dot); offending: {bad[:5]}"
        )
    counts: dict[str, int] = {}
    for r in routes:
        sub = t.filter(pc.equal(col, r))
        if not keep_route_col:
            sub = sub.drop_columns([route_col])
        d = os.path.join(out_root, r)
        os.makedirs(d, exist_ok=True)
        final = os.path.join(d, f"{index:06d}-{base}.parquet")
        tmp = f"{final}.tmp-{os.getpid()}"
        pq.write_table(sub, tmp)
        with open(tmp, "rb+") as f:
            os.fsync(f.fileno())
        DEFAULT_STORAGE.publish_file(tmp, final, durable=True)
        counts[r] = sub.num_rows
    marker = {"index": index, "routes": counts, "segment": base}
    mp = _marker_path(out_root, base)
    tmp = f"{mp}.tmp-{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump(marker, f, indent=1)
        f.flush()
        os.fsync(f.fileno())
    DEFAULT_STORAGE.publish_file(tmp, mp, durable=True)
    return marker


def demux_wal(
    segment_paths: list[str],
    out_root: str,
    route_col: str = "table",
    keep_route_col: bool = False,
) -> dict[str, list[str]]:
    """Route the WAL segments into per-route WAL directories under
    ``out_root/<route>/`` and return ``{route: [segment paths]}`` in
    delivery order. Pass the SAME ordered segment list on every call —
    already-demuxed segments are skipped via their done-markers (an
    input-order change under a marker is refused: per-route seq order
    would silently scramble). Events with a null route are refused;
    route values must be filesystem-safe.

    Per route, the output is a plain WAL directory: create one
    ``DeltaTable`` per route and ``run_stream(table, routed[route])``
    (or ``ingest.tail`` the directory to follow a live demux — route
    files publish atomically, so a tailer never sees partial
    segments)."""
    os.makedirs(os.path.join(out_root, _MARKER_DIR), exist_ok=True)
    bases = [os.path.basename(p).split(".")[0] for p in segment_paths]
    dupes = {b for b in bases if bases.count(b) > 1}
    if dupes:
        raise ValueError(
            f"segment basenames must be unique across the input list "
            f"(markers and route files are keyed by them); duplicated: "
            f"{sorted(dupes)[:5]}"
        )
    markers: dict[int, dict] = {}
    pending: list[tuple[int, str]] = []
    for i, p in enumerate(segment_paths):
        base = bases[i]
        mp = _marker_path(out_root, base)
        if os.path.isfile(mp):
            with open(mp) as f:
                m = json.load(f)
            if m["index"] != i:
                raise ValueError(
                    f"segment {base} was demuxed at input position "
                    f"{m['index']} but is now at {i}: the input order "
                    "changed — per-route delivery order would scramble. "
                    "Pass the same ordered list (or a superset extending "
                    "it)."
                )
            markers[i] = m
        else:
            pending.append((i, p))
    done = ray.get(
        [
            _demux_segment_task.remote(
                p, i, out_root, route_col, keep_route_col
            )
            for i, p in pending
        ]
    )
    for m in done:
        markers[m["index"]] = m
    routed: dict[str, list[str]] = {}
    for i in sorted(markers):
        m = markers[i]
        for r in m["routes"]:
            routed.setdefault(r, []).append(
                os.path.join(out_root, r, f"{i:06d}-{m['segment']}.parquet")
            )
    return routed


def tail_demux(
    wal_dir: str,
    out_root: str,
    route_col: str = "table",
    keep_route_col: bool = False,
    poll_interval_s: float = 0.5,
    idle_polls_to_stop: int | None = None,
    on_routes=None,
) -> dict[str, list[str]]:
    """Follow a live multi-table WAL directory and keep the per-route
    WAL directories current: each poll demuxes newly published segments
    (done-markers make re-offers exactly-once, same as one-shot
    ``demux_wal`` — which this simply loops). Per-route consumers run
    their own ``ingest.tail`` on ``out_root/<route>/`` concurrently;
    route files publish atomically, so they never see partial segments.

    ``on_routes(new_routed)`` fires after each poll that demuxed new
    segments with ONLY the newly added paths per route — the hook point
    for creating a table when a never-seen route appears.
    ``idle_polls_to_stop`` bounds the loop (None = run forever).
    Returns the cumulative route map."""
    import time as _time

    from xgeo_ray.sources.wal import is_supported_segment

    seen: dict[str, list[str]] = {}
    idle = 0
    while True:
        segs = sorted(
            os.path.join(wal_dir, n)
            for n in os.listdir(wal_dir)
            if is_supported_segment(n)
        )
        routed = (
            demux_wal(
                segs,
                out_root,
                route_col=route_col,
                keep_route_col=keep_route_col,
            )
            if segs
            else {}
        )
        new: dict[str, list[str]] = {}
        for r, paths in routed.items():
            fresh = [p for p in paths if p not in set(seen.get(r, []))]
            if fresh:
                new[r] = fresh
        if new:
            for r, fresh in new.items():
                seen.setdefault(r, []).extend(fresh)
            idle = 0
            if on_routes is not None:
                on_routes(new)
        else:
            idle += 1
            if idle_polls_to_stop is not None and idle >= idle_polls_to_stop:
                return seen
            _time.sleep(poll_interval_s)
