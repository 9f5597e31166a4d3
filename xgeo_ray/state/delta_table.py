"""DeltaTable — LSM-style partitioned lake table (SURVEY.md §2.3, §7 step 5).

On-disk layout (one directory per hash partition → resumable, skew-visible):

    root/
      _table.json                      # partitioning config, base schema
      manifests/epoch=000001.json      # the commit fence (manifest.py)
      parts/part=00007/epoch=000001-3fa9c1d2.parquet         # epoch delta
      parts/part=00007/compact-epoch=000009-a41be007.parquet # compaction

(the 8-hex suffix is the attempt's commit token — see delta_relpath;
storage primitives behind the fence live in state/storage.py)

Delta rows carry the *envelope* schema: the data columns plus ``op``
("I"/"U" upsert rows, "D" tombstones) and ``seq`` (WAL offset). Reads are
merge-on-read: per partition, unify schemas of [last compaction + later
deltas], last-writer-wins by (ts, seq), drop tombstones. Compaction
folds a partition's files into one, *retaining tombstones* by default —
dropping a tombstone is only safe once no event with a lower (ts, seq)
can still arrive (caller supplies that horizon).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa

from xgeo_ray.schemas import (
    CHANGE_EVENTS_SCHEMA,
    TRANSCRIPTS_SCHEMA,
    schema_fingerprint,
    unify,
)
from xgeo_ray.state.manifest import (
    Manifest,
    PartitionEntry,
    manifest_path,
    read_manifests,
    schema_from_json,
    schema_to_json,
    write_manifest,
)

TABLE_META = "_table.json"
PARTS_DIR = "parts"

# Envelope columns that are lineage, not data.
LINEAGE_COLS = ["op", "seq"]


def parse_parquet_codec(spec: str | None) -> dict:
    """``"zstd"`` / ``"zstd:9"`` → pq.write_table kwargs ({} keeps the
    parquet default, snappy). THE one parser of the pinned codec-spec
    grammar — the declare-time probe and every epoch writer
    (ingest._atomic_write_parquet) go through it, so they can never
    diverge on what a spec means."""
    if not spec:
        return {}
    name, _, lvl = str(spec).partition(":")
    kw: dict = {"compression": name}
    if lvl:
        kw["compression_level"] = int(lvl)
    return kw


def _probe_parquet_codec(spec: str) -> None:
    """Fail fast on an unknown codec / level: write a 0-row table with
    it in memory — the same arrow call the epoch writers make, so a
    typo dies at declare time, not in the first epoch's workers."""
    import io

    import pyarrow.parquet as _pq

    _pq.write_table(
        pa.table({"x": pa.array([], pa.int64())}),
        io.BytesIO(),
        **parse_parquet_codec(spec),
    )


def part_dir(root: str, part_key: int) -> str:
    return os.path.join(root, PARTS_DIR, f"part={part_key:05d}")


def delta_relpath(
    part_key: int, epoch: int, compact: bool = False, token: str = ""
) -> str:
    """``token`` is the attempt-unique commit token (see new_commit_token):
    two drivers racing on the same epoch write DISJOINT files, so the
    loser can never overwrite bytes the winner's manifest references —
    the manifest fence orders commits, the token isolates data. Retries
    of the SAME attempt (Ray task retries) reuse the attempt's token, so
    they stay idempotent (same path, same bytes). Empty token = legacy
    name, still read fine."""
    stem = "compact-epoch" if compact else "epoch"
    suffix = f"-{token}" if token else ""
    return os.path.join(
        PARTS_DIR, f"part={part_key:05d}", f"{stem}={epoch:06d}{suffix}.parquet"
    )


def new_commit_token() -> str:
    """8-hex attempt id minted on the driver once per epoch attempt."""
    import uuid

    return uuid.uuid4().hex[:8]


# The ONE source of truth for matching files delta_relpath() writes —
# used by vacuum (reclaim planning) and the sync_derived restore guard.
# Widths are {N,}: the :05d/:06d format fields WIDEN past their minimum
# (epoch 10^6 is ~6 days of sub-second tailing), and a fixed-width
# pattern would silently stop matching — fail-open — right then.
import re as _re

DELTA_FILENAME_RE = _re.compile(
    r"^(?:compact-)?epoch=(\d{6,})(?:-[0-9a-f]{8})?\.parquet$"
)
DELTA_RELPATH_RE = _re.compile(
    r"^parts/part=\d{5,}/(?:compact-)?epoch=(\d{6,})(?:-[0-9a-f]{8})?\.parquet$"
)


class DeltaTable:
    """Handle to a table root. Cheap to construct; all state is on disk,
    so any worker/process sees the same committed view (the analogue of
    the reference's single consumer loop, distributed)."""

    def __init__(
        self,
        root: str,
        num_partitions: int,
        num_salts: int,
        durability: str = "full",
        merge_policy: str = "lww",
        history: str = "collapsed",
    ):
        self.root = root
        self.num_partitions = num_partitions
        self.num_salts = num_salts
        self.durability = durability
        self.merge_policy = merge_policy
        self.history = history
        # immutable-manifest parse cache: repeated manifests() calls
        # (every commit / watermark / resume check) re-parse only NEW
        # files — O(new epochs), not O(total epochs), per call
        self._manifest_cache: dict[str, "Manifest"] = {}

    # ------------------------------------------------------------- lifecycle
    @classmethod
    def create(
        cls,
        root: str,
        num_partitions: int = 32,
        num_salts: int = 4,
        base_schema: pa.Schema = TRANSCRIPTS_SCHEMA,
        durability: str = "full",
        merge_policy: str = "lww",
        history: str = "collapsed",
        stats_columns: list[str] | None = None,
        parquet_codec: str | None = None,
    ) -> "DeltaTable":
        """``durability``:
        * ``"full"`` (default) — every delta Parquet is fsync'd (file and
          directory) BEFORE the manifest commit: a committed manifest
          never references lost/truncated data even across an OS/power
          crash.
        * ``"commit"`` — only the manifest fence is fsync'd; delta bytes
          ride OS writeback. Safe against process crashes (the documented
          Ray-task failure mode); an OS/power crash can lose data files a
          manifest references. Use where the filesystem itself is
          durable-on-close (object stores) or throughput matters more
          than power-loss safety.

        ``history``:
        * ``"collapsed"`` (default) — each epoch delta holds the
          per-key winner under the merge policy; event-time travel is
          epoch-granular (a version superseded within its own epoch was
          never committed).
        * ``"full"`` — deltas retain EVERY distinct (key, seq) version
          (only redelivered exact duplicates drop), so
          ``snapshot(as_of_ts_us=T)`` is exact to the event and the
          changes feed carries intermediate versions. Storage tracks
          update volume, not key count; minor compaction stays
          history-preserving, a FULL compact folds to state (and the
          time-travel guard then applies).

        ``parquet_codec``: compression for TABLE files (epoch deltas and
        compaction outputs) as ``"name"`` or ``"name:level"`` —
        ``"zstd:3"`` roughly halves delta bytes vs the snappy default at
        modest CPU cost (the right trade at 100 TB where storage and
        shuffle I/O dominate); validated here by a probe write so a typo
        fails at create, not in the first epoch's workers. ``None`` =
        parquet default (snappy). Changing it later (``set_parquet_
        codec``) affects files written from the next epoch on — mixed
        codecs are fine, parquet readers dispatch per column chunk.
        """
        if durability not in ("full", "commit"):
            raise ValueError(f"unknown durability {durability!r}")
        if parquet_codec:
            _probe_parquet_codec(parquet_codec)
        if history not in ("collapsed", "full"):
            raise ValueError(f"unknown history {history!r}")
        from xgeo_ray.stages.collapse import MERGE_POLICIES

        if merge_policy not in MERGE_POLICIES:
            raise ValueError(
                f"unknown merge_policy {merge_policy!r}; "
                f"registered: {sorted(MERGE_POLICIES)}"
            )
        os.makedirs(root, exist_ok=True)
        meta = {
            "num_partitions": num_partitions,
            "num_salts": num_salts,
            "base_schema": schema_to_json(base_schema),
            "format_version": 1,
            "durability": durability,
            "merge_policy": merge_policy,
            "history": history,
        }
        if stats_columns:
            meta["stats_columns"] = sorted(set(stats_columns))
        if parquet_codec:
            meta["parquet_codec"] = parquet_codec
        p = os.path.join(root, TABLE_META)
        tmp = p + ".tmp"
        with open(tmp, "w") as f:
            json.dump(meta, f, indent=1)
        os.replace(tmp, p)
        return cls(
            root, num_partitions, num_salts, durability, merge_policy, history
        )

    @classmethod
    def open(cls, root: str) -> "DeltaTable":
        with open(os.path.join(root, TABLE_META)) as f:
            meta = json.load(f)
        return cls(
            root,
            meta["num_partitions"],
            meta["num_salts"],
            meta.get("durability", "full"),
            meta.get("merge_policy", "lww"),
            meta.get("history", "collapsed"),
        )

    @classmethod
    def exists(cls, root: str) -> bool:
        return os.path.isfile(os.path.join(root, TABLE_META))

    def base_schema(self) -> pa.Schema:
        with open(os.path.join(self.root, TABLE_META)) as f:
            return schema_from_json(json.load(f)["base_schema"])

    # ------------------------------------------------------- dropped columns
    def dropped_columns(self) -> dict[str, int]:
        """Column name -> drop epoch (the latest epoch when the drop was
        issued; the column is hidden at and past it). A drop is a
        metadata operation (``ingest.drop_columns``): readers at or past
        the drop epoch never project the column, new WAL data carrying
        it is ignored, and the next FULL compaction physically erases
        the bytes. Time travel strictly below the drop epoch still sees
        it."""
        with open(os.path.join(self.root, TABLE_META)) as f:
            raw = json.load(f).get("dropped_columns", {})
        return {k: int(v) for k, v in raw.items()}

    def _mutate_meta(self, mutate) -> None:
        p = os.path.join(self.root, TABLE_META)
        with open(p) as f:
            meta = json.load(f)
        mutate(meta)
        tmp = p + f".tmp-{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump(meta, f, indent=1)
        os.replace(tmp, p)

    def mark_dropped(self, cols: list[str], from_epoch: int) -> None:
        """Record ``cols`` as dropped from ``from_epoch`` onward. A
        re-drop keeps the EARLIEST epoch (idempotent replay)."""

        def _m(meta):
            d = meta.setdefault("dropped_columns", {})
            for c in cols:
                d[c] = min(int(d.get(c, from_epoch)), from_epoch)

        self._mutate_meta(_m)

    def prune_dropped_above(self, epoch: int) -> list[str]:
        """Forget drops recorded above ``epoch`` — restore's companion:
        rolling state back below a drop brings the column back."""
        revived: list[str] = []

        def _m(meta):
            d = meta.get("dropped_columns", {})
            for c in [c for c, e in d.items() if int(e) > epoch]:
                revived.append(c)
                del d[c]

        self._mutate_meta(_m)
        return revived

    # ------------------------------------------------------ renamed columns
    def renamed_columns(self) -> list[dict]:
        """Ordered METADATA-ONLY rename history:
        ``[{"old", "new", "epoch"}, ...]``. A rename is visible to
        readers at or past its epoch (the same contract as
        ``dropped_columns``); time travel strictly below it reads the
        old name from the pre-rename files. Files never rewrite — read
        paths translate physical (file) names to logical names via
        ``column_aliases``."""
        with open(os.path.join(self.root, TABLE_META)) as f:
            raw = json.load(f).get("renamed_columns", [])
        return [
            {"old": r["old"], "new": r["new"], "epoch": int(r["epoch"])}
            for r in raw
        ]

    def mark_renamed(self, old: str, new: str, epoch: int) -> None:
        """Record a metadata rename ``old`` -> ``new`` visible from
        ``epoch``. A replayed identical rename is a no-op."""

        def _m(meta):
            lst = meta.setdefault("renamed_columns", [])
            if any(r["old"] == old and r["new"] == new for r in lst):
                return
            lst.append({"old": old, "new": new, "epoch": int(epoch)})

        self._mutate_meta(_m)

    def prune_renamed_above(self, epoch: int) -> list[tuple[str, str]]:
        """Forget renames recorded above ``epoch`` — restore's
        companion: rolling state back below a rename restores the old
        name (the files still carry it; only the alias disappears)."""
        undone: list[tuple[str, str]] = []

        def _m(meta):
            keep = []
            for r in meta.get("renamed_columns", []):
                if int(r["epoch"]) > epoch:
                    undone.append((r["old"], r["new"]))
                else:
                    keep.append(r)
            meta["renamed_columns"] = keep

        self._mutate_meta(_m)
        return undone

    def column_aliases(self, as_of_epoch: int | None = None) -> dict[str, str]:
        """Physical (in-file) column name -> current LOGICAL name,
        composed through chained renames visible at ``as_of_epoch``
        (a->b then b->c yields {a: c, b: c}). {} when no rename applies
        — every read path skips translation then, so unrenamed tables
        pay nothing."""
        out: dict[str, str] = {}
        for r in self.renamed_columns():
            if as_of_epoch is not None and r["epoch"] > as_of_epoch:
                continue
            old, new = r["old"], r["new"]
            for k, v in out.items():
                if v == old:
                    out[k] = new
            out[old] = new
        return out

    def retired_names(self) -> set[str]:
        """Every name that was ever the OLD side of a rename — incoming
        WAL data under these names is discarded at normalize (no
        resurrection through evolution's union), and they are not legal
        as rename targets."""
        return {r["old"] for r in self.renamed_columns()}

    # ------------------------------------------------------------- manifests
    def manifests(self) -> list[Manifest]:
        return read_manifests(self.root, cache=self._manifest_cache)

    def effective_manifests(self, as_of_epoch: int | None = None) -> list[Manifest]:
        """Manifest history with rollbacks applied: a ``kind="restore"``
        manifest (``replaces_up_to`` = the restore target epoch) truncates
        everything committed after its target — the rolled-back epochs
        stop contributing state, watermarks, committed segments, schema
        and feed rows, while their manifests/files stay on disk so
        time-travel INTO the rolled-back range (``as_of_epoch`` before
        the restore) still works until vacuum reclaims them. Restores
        compose (a later restore can roll back an earlier one: reading
        as-of an epoch between the two sees the first restore applied).
        The restore marker itself carries no data and is filtered from
        the result; output stays ascending by epoch.

        A restore marker REPLACES the accumulated view with the
        effective view AS OF its target — resolved recursively, not by
        filtering the current list: filtering could only ever subtract,
        so a restore to an epoch ABOVE an earlier restore's target
        (un-doing part of the first rollback) would silently keep the
        narrower state. Recursion terminates because every marker's
        target is strictly below its own epoch."""
        ms = self.manifests()

        def eff(upto: int | None) -> list[Manifest]:
            # only the LAST restore marker at or below ``upto`` matters:
            # each marker REPLACES the accumulated view, discarding every
            # earlier marker's effect — so resolve just that one (then
            # append what follows it). Recursing per marker instead is
            # exponential in chained restores; this is linear in markers.
            last = None
            for m in ms:
                if upto is not None and m.epoch > upto:
                    break
                if m.kind == "restore":
                    last = m
            if last is None:
                return [
                    m
                    for m in ms
                    if (upto is None or m.epoch <= upto)
                    and m.kind != "restore"
                ]
            out = eff(last.replaces_up_to)  # target < marker: strictly shrinking
            out.extend(
                m
                for m in ms
                if m.epoch > last.epoch
                and (upto is None or m.epoch <= upto)
                and m.kind != "restore"
            )
            return out

        return eff(as_of_epoch)

    def latest_epoch(self) -> int:
        ms = self.manifests()
        return ms[-1].epoch if ms else 0

    def committed_segments(self) -> set[str]:
        """Segments applied in the CURRENT (post-restore) history — a WAL
        segment whose epoch was rolled back is re-ingestable, which is
        the restore-then-replay repair story: fix the producer, call
        ``run_stream`` (or let ``tail`` poll) again."""
        out: set[str] = set()
        for m in self.effective_manifests():
            out.update(m.segments)
        return out

    def watermarks(self) -> np.ndarray:
        """Per-partition max applied seq (int64, -1 = none). Replayed events
        with seq <= watermark[part] are dropped — idempotent apply."""
        wm = np.full(self.num_partitions, -1, dtype=np.int64)
        for m in self.effective_manifests():
            for k, e in m.partitions.items():
                wm[int(k)] = max(wm[int(k)], e.max_seq)
        return wm

    def ts_watermarks(self) -> np.ndarray:
        """Per-partition max applied event ts in µs (int64, -1 = none) —
        the EVENT-TIME analogue of watermarks(): later epochs count rows
        below this as late arrivals (lineage ``late``), and the global
        event-time watermark derives from it. Bootstrap epochs are
        excluded: base-table rows predate the stream, and counting WAL
        updates to old turns as "late" would conflate snapshot age with
        stream disorder."""
        wm = np.full(self.num_partitions, -1, dtype=np.int64)
        for m in self.effective_manifests():
            # compactions (full AND minor) merge bootstrap rows back in;
            # delta manifests alone carry the stream's event-time history.
            # Out-of-band epochs (totals["oob"]: corrections, backfills,
            # predicate deletes, and synced copies of them) carry
            # operational ts, not stream event time — they must not
            # advance the stream's watermark. commit_epoch stamps the
            # flag structurally (all entries max_seq < 0) at write time,
            # so the flag alone is authoritative here.
            if m.totals.get("oob"):
                continue
            if m.kind.startswith("compact") or any(
                s.startswith("bootstrap:") for s in m.segments
            ):
                continue
            for k, e in m.partitions.items():
                wm[int(k)] = max(wm[int(k)], e.max_ts)
        return wm

    def event_time_watermark(self, allowed_lateness_us: int = 0) -> int:
        """Low event-time watermark in µs: min over touched partitions of
        max applied ts, minus the allowed lateness — "every partition has
        applied events at least this recent". Hash partitioning spreads
        the stream across all partitions, so the min-of-max is a sound
        completeness bound once each partition has data; -1 until at
        least one partition has any. Events older than the watermark can
        still arrive — they are APPLIED (LWW ordering handles them) and
        counted in the ``late`` lineage metric, which is what
        ``allowed_lateness_us`` should be sized against."""
        tw = self.ts_watermarks()
        touched = tw[tw >= 0]
        if len(touched) == 0:
            return -1
        return int(touched.min()) - int(allowed_lateness_us)

    def current_schema(self, as_of_epoch: int | None = None) -> pa.Schema:
        """Envelope schema of the latest committed epoch (data + lineage
        columns); the base envelope if no epoch has committed yet.
        ``as_of_epoch`` gives the envelope as of that epoch (schema
        evolution is forward-only, so this is the schema a time-travel
        reader should cast to). A restore rolls the schema back with the
        state (the marker is filtered; the last surviving manifest's
        schema wins). Dropped columns (``dropped_columns``) are
        subtracted at or past their drop epoch — and kept below it, so
        time travel still reads them from the pre-drop files."""
        ms = self.effective_manifests(as_of_epoch)
        env = (
            ms[-1].schema()
            if ms
            else unify(CHANGE_EVENTS_SCHEMA, self.base_schema())
        )
        # metadata renames FIRST: the last visible manifest's schema
        # carries whichever name was current when it committed;
        # translate still-physical old names to their logical names
        # (type/nullability/field metadata ride along). Drops recorded
        # AFTER a rename are keyed by the logical (new) name, so the
        # drop subtraction below must see logical names.
        aliases = self.column_aliases(as_of_epoch)
        if aliases:
            env = pa.schema(
                [
                    f.with_name(aliases[f.name]) if f.name in aliases else f
                    for f in env
                ]
            )
        dropped = self.dropped_columns()
        if dropped:
            cut = {
                c
                for c, e in dropped.items()
                if as_of_epoch is None or as_of_epoch >= e
            }
            if cut:
                env = pa.schema([f for f in env if f.name not in cut])
        return env

    def data_schema(self) -> pa.Schema:
        env = self.current_schema()
        return pa.schema([f for f in env if f.name not in LINEAGE_COLS])

    def schema_version(self) -> int:
        ms = self.manifests()
        return ms[-1].schema_version if ms else 0

    # ------------------------------------------------------------- file plan
    def file_blooms(self, as_of_epoch: int | None = None) -> dict[str, str]:
        """Absolute path → base64 conv_id bloom for every visible file
        whose manifest entry carries one (partition.build_key_bloom).
        Point lookups prune the delta chain from these manifest bytes
        alone — no footer reads for files that can't hold the key.
        Files without a bloom (pre-bloom manifests, above-cap files)
        are simply absent: callers read them as before."""
        out: dict[str, str] = {}
        for m in self.effective_manifests(as_of_epoch):
            for e in m.partitions.values():
                if e.path and e.bloom:
                    out[os.path.join(self.root, e.path)] = e.bloom
        return out

    def partition_files(
        self, as_of_epoch: int | None = None
    ) -> dict[int, list[str]]:
        """Visible files per partition, merge order: base (last FULL
        compaction, if any), then the delta chain ascending by epoch —
        where a MINOR compaction (kind="compact_minor") replaces the
        chain accumulated so far with its single folded file, leaving
        the base untouched (the tiered-compaction L1: maintenance cost
        tracks the change rate, not the table size). Absolute paths.

        ``as_of_epoch`` time-travels: the visible set as of that
        committed epoch (later manifests are ignored). Committed delta
        files are immutable and compaction never deletes (only
        ``vacuum()`` does), so every pre-vacuum epoch stays readable —
        the retention contract is the vacuum cadence, exactly as in
        other LSM/lakehouse stores."""
        base, chain = self._walk_visible(as_of_epoch)
        out: dict[int, list[str]] = {}
        for k in range(self.num_partitions):
            v = ([base[k]] if base[k] else []) + chain[k]
            if v:
                out[k] = [os.path.join(self.root, p) for p in v]
        return out

    def partition_files_ts_pruned(
        self, as_of_epoch: int | None, as_of_ts_us: int
    ) -> dict[int, list[str]]:
        """The visible set for an ``as_of_ts_us`` read: files whose
        manifest-recorded ``min_ts`` is entirely ABOVE T are dropped
        before any read task — every row in them would be filtered out
        pre-merge anyway, so time-travel reads get CHEAPER the further
        back they go (the zone-map trick changes() uses, applied to
        snapshots; most valuable on history="full" tables whose chain
        keeps growing). Files with unknown min_ts (-1) are kept."""
        base, chain = self._walk_visible(as_of_epoch, with_ts=True)
        out: dict[int, list[str]] = {}
        for k in range(self.num_partitions):
            v = ([base[k]] if base[k] else []) + chain[k]
            keep = [
                p
                for p, min_ts in v
                if min_ts < 0 or min_ts <= as_of_ts_us
            ]
            if keep:
                out[k] = [os.path.join(self.root, p) for p in keep]
        return out

    def partition_chain_files(self) -> dict[int, list[str]]:
        """The DELTA-CHAIN half of the visible set (everything after the
        last full compaction, with prior minor folds collapsed in) —
        what a minor compaction folds. Absolute paths; partitions whose
        chain is empty are omitted."""
        _, chain = self._walk_visible(None)
        return {
            k: [os.path.join(self.root, p) for p in v]
            for k, v in chain.items()
            if v
        }

    def _walk_visible(
        self,
        as_of_epoch: int | None,
        with_ts: bool = False,
        with_stats: bool = False,
    ):
        """ONE manifest walk shared by the file-plan methods: per
        partition, the base (last full compact's file) and the delta
        chain after it (a minor fold replaces the chain accumulated so
        far). Relative paths; with ``with_ts`` each element is
        ``(path, min_ts)`` (base becomes such a tuple too); with
        ``with_stats`` it is ``(path, stats_json)``."""
        if with_stats:
            wrap = lambda e: (e.path, e.stats)  # noqa: E731
        elif with_ts:
            wrap = lambda e: (e.path, e.min_ts)  # noqa: E731
        else:
            wrap = lambda e: e.path  # noqa: E731
        base: dict[int, object] = {k: None for k in range(self.num_partitions)}
        chain: dict[int, list] = {k: [] for k in range(self.num_partitions)}
        for m in self.effective_manifests(as_of_epoch):
            for k, e in m.partitions.items():
                kk = int(k)
                if m.kind == "compact":
                    base[kk] = wrap(e) if e.path else None
                    chain[kk] = []
                elif m.kind == "compact_minor":
                    chain[kk] = [wrap(e)] if e.path else []
                elif e.path:  # "" = zero-row epoch entry (lineage only)
                    chain[kk].append(wrap(e))
        return base, chain

    def partitions_with_rows_before(self, ts_us: int) -> list[int]:
        """Partitions that MAY hold a row with event time < ``ts_us``,
        from manifest zone maps alone (each entry's min_ts): a partition
        whose every visible file starts at or after the cutoff cannot
        contain an expirable winner and is skipped without a read.
        Entries from pre-zone-map manifests (min_ts == -1) are
        conservatively included. The retention (TTL) prune — expire()
        cost tracks the COLD fraction of the table, not its size."""
        base, chain = self._walk_visible(None, with_ts=True)
        out = []
        for k in range(self.num_partitions):
            v = ([base[k]] if base[k] else []) + chain[k]
            if any(min_ts < 0 or min_ts < ts_us for _, min_ts in v):
                out.append(k)
        return out

    # ------------------------------------------------------ column zone maps
    def stats_columns(self) -> list[str]:
        """Payload columns whose per-file [min, max] zone maps the apply
        and compact tasks record in the manifest (``PartitionEntry.
        stats``). Declared at ``create(stats_columns=[...])`` or later
        via ``set_stats_columns`` (later: only files written AFTER the
        change carry stats — older files stay unpruned, never wrong)."""
        with open(os.path.join(self.root, TABLE_META)) as f:
            return list(json.load(f).get("stats_columns", []))

    def set_stats_columns(self, cols: list[str]) -> None:
        """Declare (or change) the zone-mapped columns. Takes effect on
        files written from the next epoch on; existing files keep their
        recorded stats (pruning treats a file as prunable only if it
        carries stats for the queried column, so mixed histories stay
        sound)."""

        def _m(meta):
            meta["stats_columns"] = sorted(set(cols))

        self._mutate_meta(_m)

    # ------------------------------------------------------- parquet codec
    def parquet_codec(self) -> str | None:
        """Table-policy compression for delta/compaction files
        (``"zstd:3"`` shape; None = snappy default). See ``create``."""
        with open(os.path.join(self.root, TABLE_META)) as f:
            return json.load(f).get("parquet_codec")

    def set_parquet_codec(self, codec: str | None) -> None:
        """Change (or clear) the table's parquet codec; files written
        from the next epoch on use it — existing files keep theirs
        (parquet readers dispatch per column chunk, mixed histories are
        fine; a full compact rewrites everything under the new one)."""
        if codec:
            _probe_parquet_codec(codec)

        def _m(meta):
            if codec:
                meta["parquet_codec"] = codec
            else:
                meta.pop("parquet_codec", None)

        self._mutate_meta(_m)

    # ----------------------------------------------------- CHECK constraints
    def constraints(self) -> dict:
        """Declared data-quality CHECK rules (state/constraints.py) —
        ``{name: {"col": ..., rules...}}``. Enforced vectorized in the
        normalize stage of every ingest epoch: violating 'I'/'U' events
        quarantine to the DLQ as ``check:<name>`` and count into
        ``totals["invalid"]``; 'D' tombstones and NULL values (except
        under ``not_null``) always pass. Prospective only — declared
        rules gate FUTURE stream epochs (``bootstrap_base`` trusted
        image loads are exempt); audit applied state with
        ``pipelines.ingest.validate_table``."""
        with open(os.path.join(self.root, TABLE_META)) as f:
            return json.load(f).get("constraints", {})

    def set_constraints(self, constraints: dict) -> None:
        """Declare (or replace — pass ``{}`` to clear) the table's CHECK
        constraints. Validated and normalized via
        ``state.constraints.validate_spec``, then DRY-RUN against the
        current schema (a 1-row all-null batch exercises every kernel
        with the real column types, so a rule that would crash the
        normalize workers — min/max on a string column, length/regex on
        a non-string — fails HERE, not in every future epoch; rules on
        columns the schema doesn't carry yet stay best-effort-checked).
        Takes effect from the next ingest epoch (already-applied rows
        are not re-checked — audit with ``ingest.validate_table``;
        ``bootstrap_base`` trusted-image loads are likewise exempt).

        Refused on ``merge_policy='coalesce'`` when a rule declares
        ``not_null``: coalesce 'U' events carry null for every
        UNPATCHED column by protocol, so not_null would quarantine
        every legitimate partial update."""
        from xgeo_ray.state.constraints import check_mask, validate_spec

        spec = validate_spec(constraints)
        if spec:
            if self.merge_policy == "coalesce":
                nn = sorted(
                    n for n, s in spec.items() if s.get("not_null")
                )
                if nn:
                    raise ValueError(
                        f"not_null constraint(s) {nn} are unsound under "
                        "merge_policy='coalesce': a partial-update 'U' "
                        "event carries null for every unpatched column "
                        "by protocol — drop not_null or use a value rule"
                    )
            env = self.current_schema()
            probe = pa.table(
                {f.name: pa.nulls(1, f.type) for f in env}
            )
            check_mask(probe, spec)  # raises on type/kernel mismatch

        def _m(meta):
            if spec:
                meta["constraints"] = spec
            else:
                meta.pop("constraints", None)

        self._mutate_meta(_m)

    def partitions_in_range(self, col: str, lo=None, hi=None) -> list[int]:
        """Partitions that MAY hold a physical row with ``col`` in
        [lo, hi] (inclusive; ``None`` = unbounded), from manifest zone
        maps alone — the generic data-skipping complement to
        ``partitions_with_rows_before`` (ts) and the key blooms. A
        partition prunes only when EVERY visible file carries stats for
        ``col`` showing its [min, max] disjoint from the band; files
        without stats (pre-stats history, all-null columns, stats not
        enabled) conservatively keep the partition.

        SOUND for pruning reads of MERGED state under ``lww``,
        ``coalesce`` and ``history="full"``: a merged row's value of
        ``col`` is always some physical row's value, so no physical row
        in range ⇒ no merged row in range. NOT sound under ``additive``
        (merged values are sums that no single file bounds) — refused.

        Timestamps compare as int64 µs (how stats are recorded); pass
        ``lo``/``hi`` accordingly."""
        if self.merge_policy == "additive":
            raise ValueError(
                "partitions_in_range is unsound under merge_policy="
                "'additive': merged values are sums no single file's "
                "zone map bounds"
            )
        # stats are recorded under the PHYSICAL name of the writing
        # epoch: after a metadata rename, a pre-rename file's stats for
        # the logical column live under any of its retired spellings
        spellings = [col] + [
            old for old, new in self.column_aliases().items() if new == col
        ]
        base, chain = self._walk_visible(None, with_stats=True)
        out = []
        for k in range(self.num_partitions):
            v = ([base[k]] if base[k] else []) + chain[k]
            if not v:
                continue
            for _, stats_json in v:
                if not stats_json:
                    out.append(k)
                    break
                st = json.loads(stats_json)
                name = next((s for s in spellings if s in st), None)
                if name is None:
                    # not declared when this file was written: unknown
                    out.append(k)
                    break
                mm = st[name]
                if mm is None:
                    # declared but every value null: null never matches
                    # a range — this file is provably disjoint
                    continue
                fmin, fmax = mm
                if (lo is None or fmax >= lo) and (hi is None or fmin <= hi):
                    out.append(k)
                    break
        return out

    # ------------------------------------------------------------- commit
    def commit_epoch(
        self,
        epoch: int,
        segments: list[str],
        entries: list[PartitionEntry],
        envelope_schema: pa.Schema,
        kind: str = "delta",
        replaces_up_to: int = -1,
        extra_totals: dict[str, int] | None = None,
    ) -> Manifest:
        if os.path.exists(manifest_path(self.root, epoch)):
            raise ValueError(f"epoch {epoch} already committed")
        prev = self.manifests()
        prev_fp = prev[-1].schema_fingerprint if prev else ""
        fp = schema_fingerprint(envelope_schema)
        version = (prev[-1].schema_version if prev else 0) + (1 if fp != prev_fp else 0)
        totals = {
            "rows_in": sum(e.rows_in for e in entries),
            "dup_dropped": sum(e.dup_dropped for e in entries),
            "superseded": sum(e.superseded for e in entries),
            "below_wm_dropped": sum(e.below_wm_dropped for e in entries),
            "applied": sum(e.applied for e in entries),
            "tombstones": sum(e.tombstones for e in entries),
            "bytes": sum(e.bytes for e in entries),
            "late": sum(e.late for e in entries),
        }
        if extra_totals:
            totals.update(extra_totals)
        if entries and all(e.max_seq < 0 for e in entries):
            # Structurally out-of-band: no stream row in the epoch (every
            # partition max_seq < 0 — bootstraps, corrections, deletes,
            # and synced copies of them). Stamp the flag ONCE here so
            # every read site (ts_watermarks, sync_derived grouping,
            # run_stream's in-loop watermark update) can trust
            # totals["oob"] instead of re-deriving the all-seqs-negative
            # test — including CHAINED sinks, where a correction epoch
            # re-ingested by sync_derived lands all-negative but used to
            # arrive without the caller-set flag.
            totals["oob"] = 1
        m = Manifest(
            epoch=epoch,
            kind=kind,
            segments=list(segments),
            schema_version=version,
            schema_fingerprint=fp,
            schema_fields=schema_to_json(envelope_schema),
            partitions={str(e.part_key): e for e in entries},
            totals=totals,
            replaces_up_to=replaces_up_to,
        )
        write_manifest(self.root, m)
        return m
