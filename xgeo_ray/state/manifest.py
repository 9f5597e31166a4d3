"""Epoch manifests — the exactly-once fence (SURVEY.md §4, §7 step 6).

A manifest is a small JSON file, one per committed epoch, published
exclusively through the storage seam (state/storage.py: POSIX os.link
claim; object stores: conditional put). Delta Parquet files are only
*visible* if some committed manifest lists them; files from a crashed or
fence-losing attempt carry that attempt's commit token in their name, are
ignored by every reader, and are reclaimed by vacuum once their epoch
number commits. This turns Ray's at-least-once task execution into
exactly-once table state.

Each manifest records, per partition: the delta file, the seq/ts
watermarks, and the lineage counters the north rule requires (events
seen / applied / dup-dropped / below-watermark-dropped / tombstoned).
"""

from __future__ import annotations

import json
import os
import re
from dataclasses import asdict, dataclass, field, fields

import pyarrow as pa

_TYPE_PARSERS = {
    "string": pa.string(),
    "large_string": pa.large_string(),
    "int8": pa.int8(),
    "int16": pa.int16(),
    "int32": pa.int32(),
    "int64": pa.int64(),
    "float": pa.float32(),
    "double": pa.float64(),
    "bool": pa.bool_(),
    "binary": pa.binary(),
    "timestamp[us]": pa.timestamp("us"),
    "timestamp[ms]": pa.timestamp("ms"),
    "timestamp[s]": pa.timestamp("s"),
    "timestamp[ns]": pa.timestamp("ns"),
    "date32[day]": pa.date32(),
}

# flat lists of the primitive types above (embedding columns:
# list<float>, list<double>, …) keep the legacy flat-string manifest
# encoding; structs / list<struct> encode as nested JSON (below)
_LIST_TYPE_RE = re.compile(r"^(large_)?list<item: ([^<>]+)>$")

_MAX_NEST_DEPTH = 8  # tool-call transcripts are depth 3-4; 8 is headroom


def _parse_type(t: str) -> pa.DataType | None:
    if t in _TYPE_PARSERS:
        return _TYPE_PARSERS[t]
    m = _LIST_TYPE_RE.match(t)
    if m and m.group(2) in _TYPE_PARSERS:
        inner = _TYPE_PARSERS[m.group(2)]
        return pa.large_list(inner) if m.group(1) else pa.list_(inner)
    return None


def _type_to_json(t: pa.DataType, depth: int = 0):
    """Manifest encoding of one column type: the legacy flat string for
    primitives/flat lists (old manifests stay byte-identical), a nested
    JSON object for struct / list-of-struct payloads (tool-call
    transcripts, the reference's depth-4 nested data model —
    /root/reference/io/shp.go:48-92)."""
    if depth > _MAX_NEST_DEPTH:
        raise TypeError(f"envelope type nests deeper than {_MAX_NEST_DEPTH}")
    s = str(t)
    if _parse_type(s) is not None:
        return s
    if pa.types.is_struct(t):
        return {
            "struct": [
                [f.name, _type_to_json(f.type, depth + 1)] for f in t
            ]
        }
    if pa.types.is_large_list(t):
        return {"large_list": _type_to_json(t.value_type, depth + 1)}
    if pa.types.is_list(t):
        return {"list": _type_to_json(t.value_type, depth + 1)}
    raise TypeError(
        f"unsupported envelope column type {s}; supported: "
        f"{sorted(_TYPE_PARSERS)}, lists of those, and struct/"
        "list<struct> compositions — cast or drop the column in the "
        "source, or extend manifest._TYPE_PARSERS"
    )


def _json_to_type(j) -> pa.DataType:
    if isinstance(j, str):
        t = _parse_type(j)
        if t is None:
            raise TypeError(f"unknown manifest type string {j!r}")
        return t
    if isinstance(j, dict) and len(j) == 1:
        ((kind, inner),) = j.items()
        if kind == "struct":
            return pa.struct(
                [pa.field(n, _json_to_type(it)) for n, it in inner]
            )
        if kind == "list":
            return pa.list_(_json_to_type(inner))
        if kind == "large_list":
            return pa.large_list(_json_to_type(inner))
    raise TypeError(f"malformed manifest type entry {j!r}")


def validate_envelope(schema: pa.Schema) -> pa.Schema:
    """Fail fast on envelope types the manifest cannot record (e.g. an
    all-null JSON column inferred as ``null``). Primitives, flat lists,
    structs and list<struct> compositions (to depth 8) are supported —
    embedding payloads and structured tool-call transcripts. Called at
    PLAN time, before the epoch's read/shuffle/write — not at commit
    time when the work is already spent."""
    bad = []
    for f in schema:
        try:
            _type_to_json(f.type)
        except TypeError:
            bad.append((f.name, str(f.type)))
    if bad:
        raise TypeError(
            f"unsupported envelope column types {bad}; supported: "
            f"{sorted(_TYPE_PARSERS)}, lists of those, and struct/"
            "list<struct> compositions — cast or drop these columns in "
            "the source, or extend manifest._TYPE_PARSERS"
        )
    return schema


def schema_to_json(schema: pa.Schema) -> list[list]:
    validate_envelope(schema)
    return [[f.name, _type_to_json(f.type)] for f in schema]


def fsync_dir(path: str) -> None:
    """fsync a directory so a completed os.replace inside it survives an
    OS/power crash (POSIX requires the dir entry itself be synced).
    Kept as the POSIX helper for data-file writers; the fence itself
    goes through state.storage (the swappable seam)."""
    from xgeo_ray.state.storage import DEFAULT_STORAGE

    DEFAULT_STORAGE.sync_dir(path)


def schema_from_json(fields: list[list]) -> pa.Schema:
    return pa.schema([pa.field(n, _json_to_type(t)) for n, t in fields])


@dataclass
class PartitionEntry:
    part_key: int
    path: str  # relative to table root
    rows_in: int = 0
    dup_dropped: int = 0
    superseded: int = 0
    below_wm_dropped: int = 0
    applied: int = 0
    tombstones: int = 0
    max_seq: int = -1
    max_ts: int = -1
    # min applied event ts (µs) — with max_ts this is the delta file's
    # zone map: ts-band feed reads prune whole files from the manifest.
    # Absent in pre-round-3 manifests (default -1 = unknown, no pruning).
    min_ts: int = -1
    bytes: int = 0
    # event-time lateness: applied (post-dedup) events whose ts is below
    # the partition's committed max_ts — out-of-order arrivals across
    # epochs. Absent in pre-round-3 manifests (default 0 on load).
    late: int = 0
    # base64 bloom over this delta file's conv_ids (partition.
    # build_key_bloom): point lookups prune the delta chain from
    # manifest bytes alone. "" = absent (pre-bloom manifests, or files
    # above the key cap) — no pruning, never wrong.
    bloom: str = ""
    # JSON {"col": [min, max]} zone map over the table's declared
    # stats_columns for this delta file's applied rows (nulls skipped,
    # all-null columns omitted; timestamps as int64 µs). "" = absent
    # (stats not enabled, or pre-stats manifests) — no pruning, never
    # wrong. Consumed by DeltaTable.partitions_in_range.
    stats: str = ""


@dataclass
class Manifest:
    epoch: int
    kind: str  # "delta" | "compact" | "compact_minor"
    segments: list[str] = field(default_factory=list)
    schema_version: int = 0
    schema_fingerprint: str = ""
    schema_fields: list[list[str]] = field(default_factory=list)
    partitions: dict[str, PartitionEntry] = field(default_factory=dict)
    totals: dict[str, int] = field(default_factory=dict)
    replaces_up_to: int = -1  # for kind="compact": epochs folded in

    def schema(self) -> pa.Schema:
        return schema_from_json(self.schema_fields)


MANIFEST_DIR = "manifests"
# Width-TOLERANT (\d{6,}): manifest_path zero-pads to 6 digits but
# epochs past 999999 widen the filename (~6 days of sub-second tailing);
# a fixed-width match would silently stop seeing newer manifests —
# latest_epoch() stalls and the next commit collides with a committed
# epoch. Same fail-open class as DELTA_FILENAME_RE / _ACK_RE / _SEG_RE.
_NAME_RE = re.compile(r"^epoch=(\d{6,})\.json$")


def manifest_path(root: str, epoch: int) -> str:
    return os.path.join(root, MANIFEST_DIR, f"epoch={epoch:06d}.json")


def write_manifest(root: str, m: Manifest) -> str:
    """Atomic EXCLUSIVE commit of the epoch manifest — the fence. Goes
    through the storage seam (state.storage): POSIX = write-tmp + fsync
    + os.link claim + dir fsync; object stores = conditional put (see
    storage.py for the mapping). Exactly one committer per epoch wins;
    the loser gets FileExistsError. Losing attempts cannot clobber the
    winner's DATA either: delta files carry an attempt-unique commit
    token in their filename, so only the files the winning manifest
    lists are ever visible."""
    from xgeo_ray.state.storage import DEFAULT_STORAGE

    final = manifest_path(root, m.epoch)
    payload = json.dumps(asdict(m), indent=1).encode()
    DEFAULT_STORAGE.commit_bytes_exclusive(final, payload)
    return final


_ENTRY_FIELDS = {f.name for f in fields(PartitionEntry)}


def _parse_manifest(path: str) -> Manifest:
    with open(path) as f:
        raw = json.load(f)
    # Tolerate unknown entry keys: a manifest written by a newer (or
    # since-retired) format version must stay readable — dropping a
    # field from PartitionEntry must never brick existing tables.
    parts = {
        k: PartitionEntry(**{f: x for f, x in v.items() if f in _ENTRY_FIELDS})
        for k, v in raw.pop("partitions", {}).items()
    }
    return Manifest(partitions=parts, **raw)


def read_manifests(
    root: str, cache: dict[str, Manifest] | None = None
) -> list[Manifest]:
    """All committed manifests, ascending by epoch. Tmp files ignored.

    ``cache`` (filename -> Manifest) skips re-parsing files seen before:
    committed manifests are IMMUTABLE (write-tmp + rename, never edited),
    so a long-running stream pays O(new epochs) JSON parsing per commit
    instead of O(total epochs) — the listing itself stays the only
    per-call directory scan."""
    d = os.path.join(root, MANIFEST_DIR)
    if not os.path.isdir(d):
        return []
    out = []
    # sort NUMERICALLY by the parsed epoch: lexicographic filename order
    # inverts at the 6->7 digit width change ("1000000" < "999999")
    named = []
    for name in os.listdir(d):
        m = _NAME_RE.match(name)
        if m:
            named.append((int(m.group(1)), name))
    for _, name in sorted(named):
        if cache is not None and name in cache:
            out.append(cache[name])
            continue
        m = _parse_manifest(os.path.join(d, name))
        if cache is not None:
            cache[name] = m
        out.append(m)
    return out
