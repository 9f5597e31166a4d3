"""CLI entry points — the reference is a single-command CLI
(/root/reference/cmd/xgeo/main.go:15-24: kingpin arg parse, one input
file, stdout sink); this engine's CLI exposes the full table lifecycle:

    python -m xgeo_ray create  TABLE --num-partitions 64 --num-salts 4
    python -m xgeo_ray bootstrap TABLE BASE.parquet
    python -m xgeo_ray ingest  TABLE SEG [SEG ...] [--segments-per-epoch 8]
    python -m xgeo_ray snapshot TABLE OUT_DIR        # partitioned parquet
    python -m xgeo_ray compact TABLE [--tombstone-ts-horizon USEC]
    python -m xgeo_ray status  TABLE                 # manifests + lineage

`ingest` is resumable: re-running after a crash skips committed
segments (the exactly-once fence). The CLI owns its Ray session
(guarded init, shutdown at exit) — library code never does.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _init_ray() -> None:
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False


def _load_stages(args):
    """Resolve --stages/--stages-module into a StageChain (or None)."""
    if not getattr(args, "stages", None):
        return None
    import importlib

    if args.stages_module:
        importlib.import_module(args.stages_module)
    from xgeo_ray.extension import StageChain

    return StageChain(args.stages.split(","))


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="xgeo_ray")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("create", help="create an empty delta table")
    p.add_argument("table")
    p.add_argument("--num-partitions", type=int, default=64)
    p.add_argument("--num-salts", type=int, default=4)
    p.add_argument(
        "--join-of",
        nargs=2,
        metavar=("LEFT", "RIGHT"),
        default=None,
        help="create a join-view SINK for these two table roots "
        "(base schema = keys + left payload + prefixed right payload; "
        "drive it with join-sync)",
    )
    p.add_argument(
        "--join-how", choices=["inner", "left"], default="inner"
    )
    p.add_argument("--right-prefix", default="r_")
    p.add_argument(
        "--durability",
        choices=["full", "commit"],
        default="full",
        help="full = fsync delta files before the manifest fence; "
        "commit = fence-only (process-crash safe)",
    )
    p.add_argument(
        "--merge-policy",
        default="lww",
        help="registered merge policy name (lww | additive | custom)",
    )
    p.add_argument(
        "--history",
        choices=["collapsed", "full"],
        default="collapsed",
        help="collapsed = per-key winners per epoch (event-time travel "
        "is epoch-granular); full = retain every version (exact "
        "as-of-ts travel, storage tracks update volume)",
    )
    p.add_argument(
        "--parquet-codec",
        default=None,
        help='table-file compression, "name" or "name:level" (e.g. '
        "zstd:3 — ~half the bytes of the snappy default); validated "
        "by a probe write at create",
    )

    p = sub.add_parser(
        "produce",
        help="crash-safe WAL producer: JSONL rows on stdin -> published "
        "segments (seq minted, atomic rename; restart resumes the seq "
        "space from the directory)",
    )
    p.add_argument("wal_dir")
    p.add_argument("--segment-rows", type=int, default=262_144)

    p = sub.add_parser(
        "demux",
        help="route a multi-table WAL into per-route WAL directories "
        "(one table's stream each; exactly-once per segment, resumable)",
    )
    p.add_argument("wal_dir", help="directory of interleaved segments")
    p.add_argument("out_root")
    p.add_argument("--route-col", default="table")
    p.add_argument("--keep-route-col", action="store_true")

    p = sub.add_parser("bootstrap", help="load a base parquet as epoch-1 inserts")
    p.add_argument("table")
    p.add_argument("base")

    p = sub.add_parser("ingest", help="apply WAL segments (resumable)")
    p.add_argument("table")
    p.add_argument("segments", nargs="+")
    p.add_argument(
        "--dlq",
        default=None,
        help="dead-letter directory: rejected rows are quarantined "
        "(original shape + _reason) instead of only counted",
    )
    p.add_argument("--segments-per-epoch", type=int, default=8)
    p.add_argument(
        "--stages",
        default=None,
        help="comma-separated registered stage names applied to every "
        "normalized event (the scriptable per-record hook)",
    )
    p.add_argument(
        "--stages-module",
        default=None,
        help="importable module whose import registers the stages",
    )

    p = sub.add_parser(
        "snapshot",
        help="write merged state as partitioned parquet (one file per "
        "partition; resumable — existing files are skipped)",
    )
    p.add_argument("table")
    p.add_argument("out_dir")
    p.add_argument(
        "--shuffled-shards",
        type=int,
        default=None,
        help="instead of per-partition files, write N training shards "
        "in a deterministic pseudorandom row order (resumable per "
        "shard; --salt gives a fresh order per training epoch)",
    )
    p.add_argument("--salt", type=int, default=0)
    p.add_argument(
        "--sorted-by",
        default=None,
        help="instead of per-partition files, write --sorted-shards "
        "files in GLOBAL sorted order by this (numeric/temporal) "
        "column — file order + row order = the total order (resumable "
        "per shard; range bounds pinned in the dir)",
    )
    p.add_argument("--sorted-shards", type=int, default=16)
    p.add_argument("--descending", action="store_true")
    p.add_argument(
        "--packed-tokens",
        type=int,
        default=None,
        help="instead of per-partition files, write token-budget-sized "
        "training shards in global conv order, conversations kept whole "
        "(shard count = ceil(total_tokens / N); resumable per shard; "
        "bounds pinned in the dir)",
    )

    p = sub.add_parser(
        "tail",
        help="follow a WAL directory, applying new segments as they land",
    )
    p.add_argument("table")
    p.add_argument("wal_dir")
    p.add_argument("--poll-interval", type=float, default=0.5)
    p.add_argument("--segments-per-epoch", type=int, default=8)
    p.add_argument(
        "--compact-every",
        type=int,
        default=None,
        help="fold delta chains after every N committed epochs",
    )
    p.add_argument(
        "--compact-minor",
        action="store_true",
        help="make each maintenance fold MINOR (delta chain only — "
        "O(changes) per cycle; run a full compact out-of-band)",
    )
    p.add_argument(
        "--vacuum",
        action="store_true",
        help="reclaim superseded delta files after each inline compaction",
    )
    p.add_argument(
        "--idle-polls-to-stop",
        type=int,
        default=None,
        help="stop after this many empty polls (default: run forever)",
    )
    p.add_argument(
        "--dlq",
        default=None,
        help="dead-letter directory for rejected rows (see ingest --dlq)",
    )

    p = sub.add_parser(
        "import-debezium",
        help="ingest a Debezium-envelope JSONL feed (snapshot + window "
        "dirs) — one epoch per window, exactly-once resume; --follow "
        "keeps polling for newly committed windows",
    )
    p.add_argument("table")
    p.add_argument("in_dir")
    p.add_argument("wal_dir", help="where converted parquet segments land")
    p.add_argument("--follow", action="store_true")
    p.add_argument("--poll-interval", type=float, default=0.5)
    p.add_argument(
        "--idle-polls-to-stop",
        type=int,
        default=None,
        help="with --follow: stop after this many empty polls",
    )

    p = sub.add_parser("compact", help="fold each partition into one file")
    p.add_argument("table")
    p.add_argument("--tombstone-ts-horizon", type=int, default=None)
    p.add_argument(
        "--minor",
        action="store_true",
        help="fold only the delta chain since the last full compaction "
        "(O(changes) maintenance; base untouched)",
    )

    p = sub.add_parser(
        "changes",
        help="export the CDC-out feed (applied per-epoch deltas) as "
        "parquet; --since/--upto select the epoch range",
    )
    p.add_argument("table")
    p.add_argument("out_dir")
    p.add_argument("--since", type=int, default=0)
    p.add_argument("--upto", type=int, default=None)
    p.add_argument(
        "--ts-min", type=int, default=None, help="event-time band (µs, zone-map pruned)"
    )
    p.add_argument("--ts-max", type=int, default=None)
    p.add_argument(
        "--with-before",
        action="store_true",
        help="Debezium-shaped feed: pair every change with the key's "
        "effective before/after images (no ts band in this mode)",
    )
    p.add_argument(
        "--debezium",
        action="store_true",
        help="export the before/after feed as Debezium-envelope JSONL "
        "(out_dir/window=A-B/part-P.jsonl); with --consumer the window "
        "starts at the group's cursor and acks after publish "
        "(exactly-once)",
    )
    p.add_argument("--consumer", default=None)
    p.add_argument("--gzip", action="store_true")
    p.add_argument(
        "--columns",
        default=None,
        help="with --debezium: comma-separated payload columns for the "
        "images (narrow consumers never pull the text payload)",
    )
    p.add_argument(
        "--bootstrap",
        action="store_true",
        help="with --debezium: export the snapshot phase (full state as "
        "op='r' records under snapshot=0-U) instead of a change window; "
        "with --consumer the cursor jumps to U so the next call streams",
    )

    p = sub.add_parser(
        "sync",
        help="maintain a derived table from a source table's committed "
        "change feed, exactly-once (re-run to follow; --stages applies "
        "a transform to every change row before it lands)",
    )
    p.add_argument("source")
    p.add_argument("table")
    p.add_argument("--upto", type=int, default=None)
    p.add_argument("--epochs-per-sync", type=int, default=1)
    p.add_argument("--stages", default=None)
    p.add_argument("--stages-module", default=None)

    p = sub.add_parser(
        "sync-scd2",
        help="maintain an SCD Type-2 dimension view (one row per key "
        "VERSION with valid_from/valid_to µs intervals) from SOURCE's "
        "committed change feed, exactly-once; --init creates the sink "
        "with the derived scd2 schema on first run",
    )
    p.add_argument("source")
    p.add_argument("table", help="sink table root")
    p.add_argument("--upto", type=int, default=None)
    p.add_argument(
        "--columns", default=None, help="comma-separated payload columns"
    )
    p.add_argument(
        "--init",
        action="store_true",
        help="create the sink (scd2_schema(source), num_salts=1) if absent",
    )
    p.add_argument("--num-partitions", type=int, default=16)

    p = sub.add_parser(
        "sync-ivf",
        help="maintain a persisted IVF vector index from TABLE's "
        "committed change feed, exactly-once (first run bootstraps: "
        "centroid train + base build; updates/deletes retract via "
        "manifest tombstones)",
    )
    p.add_argument("table")
    p.add_argument("index_dir")
    p.add_argument("--vec-col", default="embedding")
    p.add_argument("--num-centroids", type=int, default=16)
    p.add_argument("--upto", type=int, default=None)

    p = sub.add_parser(
        "ivf-compact",
        help="fold every inverted list's generation chain into one "
        "file, dropping tombstoned entries and clearing the tombstone "
        "map (exactly-once append keys preserved)",
    )
    p.add_argument("index_dir")

    p = sub.add_parser(
        "ivf-fsck",
        help="offline IVF index integrity check: missing referenced "
        "files, orphan generation files (dead bytes), row-count drift",
    )
    p.add_argument("index_dir")

    p = sub.add_parser(
        "ivf-vacuum",
        help="reclaim part files the current index manifest no longer "
        "references (compaction inputs, crashed appends); --min-age "
        "guards in-flight appends and readers on the previous manifest",
    )
    p.add_argument("index_dir")
    p.add_argument("--min-age", type=float, default=3600.0)

    p = sub.add_parser(
        "apply",
        help="apply a correction/backfill batch from a parquet file of "
        "rows (out-of-band: wins by ts, never advances seq watermarks); "
        "--batch-id is the producer-side exactly-once key",
    )
    p.add_argument("table")
    p.add_argument("rows_parquet")
    p.add_argument("--batch-id", required=True)
    p.add_argument("--op", default="U", choices=["I", "U", "D"])
    p.add_argument("--ts-us", type=int, default=None)

    p = sub.add_parser(
        "get",
        help="point lookup: merged rows of one or more conversations "
        "(N ids fan out one merge task per touched partition)",
    )
    p.add_argument("table")
    p.add_argument("conv_id", nargs="+")
    p.add_argument("--turn", type=int, default=None)
    p.add_argument(
        "--history",
        action="store_true",
        help="every readable committed version (op/seq/_epoch kept, "
        "tombstones visible) instead of the merged winner",
    )

    p = sub.add_parser(
        "vacuum", help="delete delta files superseded by a committed compaction"
    )
    p.add_argument("table")
    p.add_argument(
        "--no-respect-consumers",
        action="store_true",
        help="reclaim superseded deltas even when a registered consumer "
        "group has not acked them (default keeps them; fsck then "
        "reports the gap as a warning)",
    )
    p.add_argument(
        "--no-respect-tags",
        action="store_true",
        help="reclaim files only a TAGGED epoch still references "
        "(default keeps every tagged epoch readable)",
    )

    p = sub.add_parser(
        "tag",
        help="named savepoints: tag NAME tags the latest (or --epoch) "
        "committed epoch; omit NAME to list; --delete removes (vacuum "
        "keeps tagged epochs readable until then)",
    )
    p.add_argument("table")
    p.add_argument("name", nargs="?", default=None)
    p.add_argument("--epoch", type=int, default=None)
    p.add_argument("--delete", action="store_true")

    p = sub.add_parser(
        "reshard",
        help="migrate the table to a new partition/salt count at a fresh "
        "root (atomic one-epoch cutover; old WAL continuity carried over)",
    )
    p.add_argument("table")
    p.add_argument("new_root")
    p.add_argument("--num-partitions", type=int, required=True)
    p.add_argument("--num-salts", type=int, default=None)

    p = sub.add_parser(
        "delete",
        help="tombstone every key whose current row matches a column "
        "equality (distributed predicate delete; --batch-id is the "
        "exactly-once key; physical erasure = compact + vacuum later)",
    )
    p.add_argument("table")
    p.add_argument("column")
    p.add_argument("value")
    p.add_argument("--batch-id", required=True)
    p.add_argument("--ts-us", type=int, default=None)

    p = sub.add_parser(
        "update",
        help="rewrite payload columns of every key whose current row "
        "matches a column equality (distributed predicate update; "
        "--set COL=VALUE repeatable; --batch-id is the exactly-once key)",
    )
    p.add_argument("table")
    p.add_argument("column")
    p.add_argument("value")
    p.add_argument(
        "--set",
        dest="sets",
        action="append",
        required=True,
        metavar="COL=VALUE",
        help="payload column to rewrite (repeatable; cast to column type)",
    )
    p.add_argument("--batch-id", required=True)
    p.add_argument("--ts-us", type=int, default=None)

    p = sub.add_parser(
        "expire",
        help="event-time retention (TTL): tombstone every key whose "
        "current winner predates the cutoff (zone-map pruned; "
        "exactly-once per cutoff; physical erasure = compact + vacuum)",
    )
    p.add_argument("table")
    p.add_argument("older_than_ts_us", type=int)
    p.add_argument("--batch-id", default=None)

    p = sub.add_parser(
        "drop-columns",
        help="drop data columns (metadata-only: readers stop projecting "
        "them, new WAL values are discarded, time travel below the drop "
        "epoch keeps them; physical erasure = compact + vacuum)",
    )
    p.add_argument("table")
    p.add_argument("columns", nargs="+")

    p = sub.add_parser(
        "rename-column",
        help="rename a payload column. Default: METADATA-ONLY alias "
        "(zero data I/O, no event-time change; old files read through "
        "the alias, physical erasure at the next full compact). "
        "--rewrite restores the full-image rewrite (immediate physical "
        "erasure, exactly-once by batch id; NOTE the rewrite resets "
        "every row's EVENT TIME to the rename instant — as-of-ts "
        "travel, expire TTLs and event-time watermarks all see the "
        "table as renamed-at). Time travel below the rename keeps the "
        "old name either way.",
    )
    p.add_argument("table")
    p.add_argument("old")
    p.add_argument("new")
    p.add_argument("--batch-id", default=None)
    p.add_argument(
        "--rewrite", action="store_true",
        help="full-image rewrite instead of the metadata alias",
    )

    p = sub.add_parser(
        "clone",
        help="zero-copy table clone at a new root (hardlinked immutable "
        "deltas + copied manifest history; both sides then evolve "
        "independently)",
    )
    p.add_argument("table")
    p.add_argument("dest_root")
    p.add_argument(
        "--deep", action="store_true", help="byte-copy instead of hardlink"
    )

    p = sub.add_parser(
        "restore",
        help="roll the table back to the state as of a committed epoch "
        "(metadata-only; rolled-back WAL segments become re-ingestable)",
    )
    p.add_argument("table")
    p.add_argument(
        "to_epoch",
        help="a committed epoch number, or a tag name (state/tags.py)",
    )
    p.add_argument(
        "--force",
        action="store_true",
        help="restore even when a consumer group has acked past the target",
    )

    p = sub.add_parser(
        "rewind",
        help="move a consumer group's durable cursor backward (replay; "
        "required before restoring past the group's acked position)",
    )
    p.add_argument("table")
    p.add_argument("group")
    p.add_argument("to_epoch", type=int)

    p = sub.add_parser(
        "agg-view",
        help="sync an INCREMENTAL grouped count+sum view (retraction "
        "IVM): refresh cost tracks the change volume, not table size",
    )
    p.add_argument("table")
    p.add_argument("view_dir")
    p.add_argument("--group-by", required=True, help="comma-separated columns")
    p.add_argument("--sums", default="", help="comma-separated numeric columns")
    p.add_argument("--buckets", type=int, default=16)
    p.add_argument("--upto", type=int, default=None)

    p = sub.add_parser(
        "index",
        help="sync a SECONDARY INDEX on a non-key column (incremental "
        "posting list; value changes move postings exactly-once)",
    )
    p.add_argument("table")
    p.add_argument("view_dir")
    p.add_argument("column")
    p.add_argument("--buckets", type=int, default=64)
    p.add_argument("--upto", type=int, default=None)

    p = sub.add_parser(
        "find",
        help="lookup merged rows BY VALUE of an indexed column (one "
        "bucket read + bloom/IN-pruned batch fetch)",
    )
    p.add_argument("table")
    p.add_argument("view_dir")
    p.add_argument("value")

    p = sub.add_parser(
        "assemble-sync",
        help="maintain an assembled-conversations sink incrementally: "
        "only conversations the new epochs touched re-assemble",
    )
    p.add_argument("table", help="the SINK table (ASSEMBLED_SCHEMA)")
    p.add_argument("source")
    p.add_argument("--sep", default="\n")
    p.add_argument("--role-sep", default=": ")
    p.add_argument("--upto", type=int, default=None)

    p = sub.add_parser(
        "join-sync",
        help="maintain a materialized PK join of two tables "
        "incrementally: only keys touched since the cursors re-join "
        "(create the sink with `create --join-of LEFT RIGHT`)",
    )
    p.add_argument("table", help="the join SINK table")
    p.add_argument("left")
    p.add_argument("right")
    p.add_argument("--how", choices=["inner", "left"], default="inner")
    p.add_argument("--right-prefix", default="r_")
    p.add_argument("--upto-left", type=int, default=None)
    p.add_argument("--upto-right", type=int, default=None)

    p = sub.add_parser("status", help="print manifests + lineage totals as JSON")
    p.add_argument("table")

    p = sub.add_parser(
        "fsck",
        help="offline integrity check: referenced files exist with "
        "recorded sizes, watermarks monotone, cursors behind the fence",
    )
    p.add_argument("table")

    p = sub.add_parser(
        "requeue",
        help="re-feed quarantined DLQ rows into a WAL directory as fresh "
        "producer segments (seq re-minted, original ts kept; processed "
        "files move to <dlq>/requeued/) — repair rows by editing the "
        "parquet files first, or leave them: still-invalid rows simply "
        "re-quarantine",
    )
    p.add_argument("dlq_dir")
    p.add_argument("wal_dir")
    p.add_argument("--segment-rows", type=int, default=262_144)

    p = sub.add_parser(
        "check",
        help="declare / inspect / audit data-quality CHECK constraints "
        "(violating stream events quarantine to the DLQ as check:<name>)",
    )
    p.add_argument("table")
    p.add_argument(
        "--set",
        dest="set_spec",
        help='JSON {"name": {"col": ..., rules}} — REPLACES declared rules '
        "(rules: not_null, min, max, in, min_len, max_len, matches)",
    )
    p.add_argument(
        "--clear", action="store_true", help="remove every declared rule"
    )
    p.add_argument(
        "--audit",
        action="store_true",
        help="distributed retroactive audit: violation counts over the "
        "CURRENT snapshot (declared rules; nothing is mutated)",
    )

    args = ap.parse_args(argv)

    from xgeo_ray.state.delta_table import DeltaTable

    if args.cmd == "produce":  # no table, no Ray: stdin -> WAL segments
        import io

        from pyarrow import json as pa_json

        from xgeo_ray.sources.wal_writer import WalWriter

        w = WalWriter(args.wal_dir, segment_rows=args.segment_rows)
        buf = b""
        n = 0
        stdin = sys.stdin.buffer
        while True:
            chunk = stdin.read(1 << 20)
            if not chunk:
                break
            buf += chunk
            cut = buf.rfind(b"\n")
            if cut < 0:
                continue
            part, buf = buf[: cut + 1], buf[cut + 1 :]
            t = pa_json.read_json(io.BytesIO(part))
            w.append(t)
            n += t.num_rows
        if buf.strip():
            t = pa_json.read_json(io.BytesIO(buf))
            w.append(t)
            n += t.num_rows
        w.close()
        print(json.dumps({"rows": n, "next_segment": w._next_idx}))
        return 0

    if args.cmd == "demux":  # no table: stream-level routing
        from xgeo_ray.sources.demux import demux_wal
        from xgeo_ray.sources.wal import is_supported_segment

        _init_ray()
        segs = sorted(
            os.path.join(args.wal_dir, n)
            for n in os.listdir(args.wal_dir)
            if is_supported_segment(n)
        )
        routed = demux_wal(
            segs,
            args.out_root,
            route_col=args.route_col,
            keep_route_col=args.keep_route_col,
        )
        print(
            json.dumps(
                {r: len(paths) for r, paths in sorted(routed.items())}
            )
        )
        return 0

    if args.cmd == "requeue":  # no table, no Ray: DLQ -> WAL segments
        from xgeo_ray.sources.wal_writer import requeue_dlq

        print(
            json.dumps(
                requeue_dlq(
                    args.dlq_dir,
                    args.wal_dir,
                    segment_rows=args.segment_rows,
                )
            )
        )
        return 0

    if args.cmd == "create":
        kw = {}
        if args.join_of is not None:
            from xgeo_ray.pipelines import ivm

            kw["base_schema"] = ivm.join_sink_schema(
                DeltaTable.open(args.join_of[0]),
                DeltaTable.open(args.join_of[1]),
                right_prefix=args.right_prefix,
                how=args.join_how,
            )
        DeltaTable.create(
            args.table,
            num_partitions=args.num_partitions,
            num_salts=args.num_salts,
            durability=args.durability,
            merge_policy=args.merge_policy,
            history=args.history,
            parquet_codec=args.parquet_codec,
            **kw,
        )
        print(json.dumps({"created": args.table}))
        return 0

    if args.cmd == "sync-ivf":
        from xgeo_ray.functions import ann

        st = ann.sync_ivf(
            DeltaTable.open(args.table),
            args.index_dir,
            vec_col=args.vec_col,
            num_centroids=args.num_centroids,
            upto_epoch=args.upto,
        )
        print(json.dumps(st))
        return 0

    if args.cmd == "ivf-compact":
        from xgeo_ray.functions import ann

        print(json.dumps(ann.ivf_compact(args.index_dir)))
        return 0

    if args.cmd == "ivf-fsck":
        from xgeo_ray.functions import ann

        st = ann.ivf_fsck(args.index_dir)
        print(json.dumps(st))
        return 0 if st["ok"] else 1

    if args.cmd == "ivf-vacuum":
        from xgeo_ray.functions import ann

        print(json.dumps(ann.ivf_vacuum(args.index_dir, args.min_age)))
        return 0

    if args.cmd == "sync-scd2":
        from xgeo_ray.pipelines import ivm

        src = DeltaTable.open(args.source)
        cols = args.columns.split(",") if args.columns else None
        try:
            sink = DeltaTable.open(args.table)
        except FileNotFoundError:
            if not args.init:
                raise
            sink = DeltaTable.create(
                args.table,
                num_partitions=args.num_partitions,
                num_salts=1,
                base_schema=ivm.scd2_schema(src, cols),
            )
        st = ivm.sync_scd2(src, sink, columns=cols, upto_epoch=args.upto)
        print(json.dumps(st))
        return 0

    table = DeltaTable.open(args.table)
    from xgeo_ray.pipelines import ingest as ing

    if args.cmd not in (
        "get", "status", "vacuum", "fsck", "clone", "drop-columns", "tag"
    ):
        _init_ray()  # these are inline metadata/file ops — no cluster
    try:
        if args.cmd == "bootstrap":
            m = ing.bootstrap_base(table, args.base)
            print(json.dumps({"epoch": m.epoch, "totals": m.totals}))
        elif args.cmd == "ingest":
            ms = ing.run_stream(
                table,
                args.segments,
                segments_per_epoch=args.segments_per_epoch,
                transform=_load_stages(args),
                dlq_dir=args.dlq,
            )
            print(
                json.dumps(
                    {
                        "epochs": [m.epoch for m in ms],
                        "events_read": sum(
                            m.totals.get("events_read", 0) for m in ms
                        ),
                    }
                )
            )
        elif args.cmd == "import-debezium":
            from xgeo_ray.pipelines import ivm

            if args.follow:
                ms = ivm.tail_debezium(
                    args.in_dir,
                    table,
                    args.wal_dir,
                    poll_interval_s=args.poll_interval,
                    idle_polls_to_stop=args.idle_polls_to_stop,
                )
            else:
                groups = ivm.debezium_to_segments(
                    args.in_dir, args.wal_dir, require_meta=True
                )
                ms = (
                    ing.run_stream(table, [], segment_groups=groups)
                    if groups
                    else []
                )
            print(
                json.dumps(
                    {
                        "epochs": [m.epoch for m in ms],
                        "events": sum(
                            m.totals.get("applied", 0) for m in ms
                        ),
                    }
                )
            )
        elif args.cmd == "tail":
            ms = ing.tail(
                table,
                args.wal_dir,
                poll_interval_s=args.poll_interval,
                segments_per_epoch=args.segments_per_epoch,
                idle_polls_to_stop=args.idle_polls_to_stop,
                compact_every_epochs=args.compact_every,
                compact_minor=args.compact_minor,
                vacuum_after_compact=args.vacuum,
                dlq_dir=args.dlq,
            )
            print(
                json.dumps(
                    {
                        "epochs": [m.epoch for m in ms],
                        "events_read": sum(
                            m.totals.get("events_read", 0) for m in ms
                        ),
                    }
                )
            )
        elif args.cmd == "snapshot":
            if args.shuffled_shards is not None:
                stats = ing.export_shuffled(
                    table, args.out_dir, args.shuffled_shards, salt=args.salt
                )
            elif args.sorted_by is not None:
                stats = ing.export_sorted(
                    table,
                    args.out_dir,
                    by=args.sorted_by,
                    num_shards=args.sorted_shards,
                    descending=args.descending,
                )
            elif args.packed_tokens is not None:
                stats = ing.export_packed(
                    table, args.out_dir, args.packed_tokens
                )
            else:
                stats = ing.export_snapshot(table, args.out_dir)
            print(json.dumps({"out": args.out_dir, **stats}))
        elif args.cmd == "compact":
            m = ing.compact(
                table,
                tombstone_ts_horizon=args.tombstone_ts_horizon,
                minor=args.minor,
            )
            if m is None:
                print(json.dumps({"epoch": None, "kind": "noop"}))
            else:
                print(json.dumps({"epoch": m.epoch, "kind": m.kind}))
        elif args.cmd == "sync":
            ms = ing.sync_derived(
                DeltaTable.open(args.source),
                table,
                transform=_load_stages(args),
                upto_epoch=args.upto,
                epochs_per_sync=args.epochs_per_sync,
            )
            print(
                json.dumps(
                    {
                        "epochs": [m.epoch for m in ms],
                        "applied": sum(m.totals.get("applied", 0) for m in ms),
                    }
                )
            )
        elif args.cmd == "apply":
            import pyarrow.parquet as _pq

            m = ing.apply_changes(
                table,
                _pq.read_table(args.rows_parquet),
                batch_id=args.batch_id,
                default_op=args.op,
                ts_us=args.ts_us,
            )
            print(
                json.dumps(
                    {"applied": m.totals["applied"] if m else 0,
                     "noop": m is None}
                )
            )
        elif args.cmd == "changes":
            if args.debezium:
                if args.with_before or args.ts_min is not None or (
                    args.ts_max is not None
                ):
                    raise SystemExit(
                        "--debezium implies before/after images and has "
                        "no ts band"
                    )
                from xgeo_ray.pipelines import ivm

                st = ivm.export_debezium(
                    table,
                    args.out_dir,
                    consumer=args.consumer,
                    since_epoch=args.since,
                    upto_epoch=args.upto,
                    columns=args.columns.split(",") if args.columns else None,
                    gzip=args.gzip,
                    bootstrap=args.bootstrap,
                )
                print(json.dumps(st))
                return 0
            if args.bootstrap:
                raise SystemExit("--bootstrap requires --debezium")
            if args.with_before:
                if args.ts_min is not None or args.ts_max is not None:
                    raise SystemExit("--with-before has no ts band")
                from xgeo_ray.pipelines import ivm

                ds = ivm.changes_with_before(
                    table, since_epoch=args.since, upto_epoch=args.upto
                )
            else:
                ds = ing.changes(
                    table,
                    since_epoch=args.since,
                    upto_epoch=args.upto,
                    ts_min_us=args.ts_min,
                    ts_max_us=args.ts_max,
                )
            n = ds.count()
            ds.write_parquet(args.out_dir)
            print(json.dumps({"out": args.out_dir, "rows": n}))
        elif args.cmd == "vacuum":
            print(
                json.dumps(
                    ing.vacuum(
                        table,
                        respect_consumers=not args.no_respect_consumers,
                        respect_tags=not args.no_respect_tags,
                    )
                )
            )
        elif args.cmd == "tag":
            from xgeo_ray.state import tags as tg

            if args.name is None:
                print(json.dumps(tg.tags(table)))
            elif args.delete:
                print(json.dumps({"deleted": tg.delete_tag(table, args.name)}))
            else:
                e = tg.tag(table, args.name, epoch=args.epoch)
                print(json.dumps({"tag": args.name, "epoch": e}))
        elif args.cmd == "get":
            if args.history:
                if len(args.conv_id) != 1:
                    raise SystemExit("--history takes a single conv_id")
                t = ing.key_history(
                    table, args.conv_id[0], turn_idx=args.turn
                )
            elif len(args.conv_id) == 1:
                t = ing.lookup(table, args.conv_id[0], turn_idx=args.turn)
            else:
                if args.turn is not None:
                    raise SystemExit("--turn applies to a single conv_id")
                _init_ray()  # batch path fans out merge tasks
                t = ing.lookup_many(table, args.conv_id)
            print(json.dumps(t.to_pylist(), default=str))
        elif args.cmd == "reshard":
            _init_ray()
            new = ing.reshard(
                table,
                args.new_root,
                num_partitions=args.num_partitions,
                num_salts=args.num_salts,
            )
            print(
                json.dumps(
                    {
                        "new_root": new.root,
                        "num_partitions": new.num_partitions,
                        "num_salts": new.num_salts,
                    }
                )
            )
        elif args.cmd == "delete":
            import pyarrow as _pa
            import pyarrow.compute as _pc

            col = args.column
            env = table.current_schema()
            if col not in env.names:  # fail fast, not in every worker
                raise SystemExit(
                    f"no column {col!r} in table schema {env.names}"
                )
            try:  # coerce the argv string to the column's type
                val = _pa.scalar(args.value, _pa.string()).cast(
                    env.field(col).type
                )
            except Exception as e:
                raise SystemExit(
                    f"value {args.value!r} does not cast to column "
                    f"{col!r} type {env.field(col).type}: {e}"
                )
            _init_ray()
            m = ing.delete_where(
                table,
                lambda t: _pc.equal(t.column(col), val),
                batch_id=args.batch_id,
                columns=[col],
                ts_us=args.ts_us,
            )
            print(
                json.dumps(
                    {"deleted": 0, "noop": True}
                    if m is None
                    else {
                        "deleted": m.totals.get("tombstones", 0),
                        "epoch": m.epoch,
                    }
                )
            )
        elif args.cmd == "update":
            import pyarrow as _pa
            import pyarrow.compute as _pc

            env = table.current_schema()
            col = args.column
            if col not in env.names:
                raise SystemExit(
                    f"no column {col!r} in table schema {env.names}"
                )

            def _coerce(name: str, raw: str):
                if name not in env.names:
                    raise SystemExit(
                        f"no column {name!r} in table schema {env.names}"
                    )
                try:
                    return _pa.scalar(raw, _pa.string()).cast(
                        env.field(name).type
                    )
                except Exception as e:
                    raise SystemExit(
                        f"value {raw!r} does not cast to column "
                        f"{name!r} type {env.field(name).type}: {e}"
                    )

            val = _coerce(col, args.value)
            sets = {}
            for kv in args.sets:
                if "=" not in kv:
                    raise SystemExit(f"--set needs COL=VALUE, got {kv!r}")
                k, _, v = kv.partition("=")
                sets[k] = _coerce(k, v).as_py()
            _init_ray()
            m = ing.update_where(
                table,
                lambda t: _pc.equal(t.column(col), val),
                sets,
                batch_id=args.batch_id,
                ts_us=args.ts_us,
            )
            print(
                json.dumps(
                    {"updated": 0, "noop": True}
                    if m is None
                    else {
                        "updated": m.totals.get("applied", 0),
                        "epoch": m.epoch,
                    }
                )
            )
        elif args.cmd == "expire":
            m = ing.expire(
                table, args.older_than_ts_us, batch_id=args.batch_id
            )
            print(
                json.dumps(
                    {"expired": 0, "noop": True}
                    if m is None
                    else {
                        "expired": m.totals.get("tombstones", 0),
                        "epoch": m.epoch,
                    }
                )
            )
        elif args.cmd == "drop-columns":
            print(json.dumps(ing.drop_columns(table, args.columns)))
        elif args.cmd == "rename-column":
            print(
                json.dumps(
                    ing.rename_column(
                        table, args.old, args.new, batch_id=args.batch_id,
                        rewrite=args.rewrite,
                    )
                )
            )
        elif args.cmd == "clone":
            dst = ing.clone_table(
                table, args.dest_root, mode="copy" if args.deep else "auto"
            )
            print(
                json.dumps(
                    {"cloned_to": dst.root, "latest_epoch": dst.latest_epoch()}
                )
            )
        elif args.cmd == "restore":
            if args.to_epoch.isdigit():
                target = int(args.to_epoch)
            else:
                from xgeo_ray.state import tags as tg

                target = tg.resolve(table, args.to_epoch)
            m = ing.restore(table, target, force=args.force)
            print(
                json.dumps(
                    {"restored_to": target, "restore_epoch": m.epoch}
                )
            )
        elif args.cmd == "rewind":
            from xgeo_ray.state import consumers as _cons

            pos = _cons.rewind(table, args.group, args.to_epoch)
            print(json.dumps({"group": args.group, "position": pos}))
        elif args.cmd == "agg-view":
            from xgeo_ray.pipelines import ivm

            st = ivm.sync_agg(
                table,
                args.view_dir,
                group_by=args.group_by.split(","),
                sums=[s for s in args.sums.split(",") if s],
                columns=[
                    c
                    for c in args.group_by.split(",") + args.sums.split(",")
                    if c
                ],
                num_buckets=args.buckets,
                upto_epoch=args.upto,
            )
            print(json.dumps(st))
        elif args.cmd == "index":
            from xgeo_ray.pipelines import ivm

            st = ivm.sync_index(
                table,
                args.view_dir,
                args.column,
                num_buckets=args.buckets,
                upto_epoch=args.upto,
            )
            print(json.dumps(st))
        elif args.cmd == "find":
            import pyarrow as _pa

            from xgeo_ray.pipelines import ivm

            # coerce the argv string to the INDEXED column's type —
            # a raw string probe on an int64 index hashes to the wrong
            # bucket (string vs int siphash path) and pc.equal raises
            # on any postings it does hit (same class as the round-3
            # CLI delete coercion fix above).
            spec = ivm._agg_state(args.view_dir).get("spec") or {}
            col = (spec.get("group_by") or [None])[0]
            env = table.current_schema()
            val = args.value
            if col in env.names:
                try:
                    val = (
                        _pa.scalar(args.value, _pa.string())
                        .cast(env.field(col).type)
                        .as_py()
                    )
                except Exception as e:
                    raise SystemExit(
                        f"value {args.value!r} does not cast to indexed "
                        f"column {col!r} type {env.field(col).type}: {e}"
                    )
            t = ivm.lookup_by(table, args.view_dir, val)
            print(json.dumps(t.to_pylist(), default=str))
        elif args.cmd == "join-sync":
            from xgeo_ray.pipelines import ivm

            st = ivm.sync_join(
                DeltaTable.open(args.left),
                DeltaTable.open(args.right),
                table,
                how=args.how,
                right_prefix=args.right_prefix,
                upto_left=args.upto_left,
                upto_right=args.upto_right,
            )
            print(json.dumps(st))
        elif args.cmd == "assemble-sync":
            st = ing.sync_assembled(
                DeltaTable.open(args.source),
                table,
                sep=args.sep,
                role_sep=args.role_sep,
                upto_epoch=args.upto,
            )
            print(json.dumps(st))
        elif args.cmd == "fsck":
            out = ing.fsck(table)
            print(json.dumps(out))
            return 0 if out["ok"] else 1
        elif args.cmd == "check":
            if args.clear:
                table.set_constraints({})
            elif args.set_spec is not None:  # --set '{}' clears too
                table.set_constraints(json.loads(args.set_spec))
            out = {"constraints": table.constraints()}
            if args.audit:
                _init_ray()
                out["violations"] = ing.validate_table(table)
            print(json.dumps(out))
        elif args.cmd == "status":
            epochs = []
            for m in table.manifests():
                epochs.append(
                    {
                        "epoch": m.epoch,
                        "kind": m.kind,
                        "segments": m.segments,
                        "schema_version": m.schema_version,
                        "totals": m.totals,
                        "partitions": len(m.partitions),
                    }
                )
            chain = table.partition_chain_files()
            from xgeo_ray.state import consumers as _cons
            from xgeo_ray.state import tags as _tags

            print(
                json.dumps(
                    {
                        "table": table.root,
                        "policies": {
                            "merge_policy": table.merge_policy,
                            "durability": table.durability,
                            "history": table.history,
                            "num_partitions": table.num_partitions,
                            "num_salts": table.num_salts,
                        },
                        "constraints": table.constraints(),
                        "latest_epoch": table.latest_epoch(),
                        # merge-on-read pressure: fold when this grows
                        "max_chain_files": max(
                            (len(v) for v in chain.values()), default=0
                        ),
                        "consumers": {
                            g: _cons.position(table, g)
                            for g in _cons.groups(table)
                        },
                        "tags": _tags.tags(table),
                        "dropped_columns": table.dropped_columns(),
                        "epochs": epochs,
                    }
                )
            )
    finally:
        import ray

        ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
