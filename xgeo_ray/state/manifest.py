"""Epoch manifests — the exactly-once fence (SURVEY.md §4, §7 step 6).

A manifest is a small JSON file, one per committed epoch, written with
write-tmp + atomic ``os.replace``. Delta Parquet files are only *visible*
if some committed manifest lists them; files from a crashed, uncommitted
epoch are ignored by every reader and deterministically overwritten on
replay. This turns Ray's at-least-once task execution into exactly-once
table state.

Each manifest records, per partition: the delta file, the seq/ts
watermarks, and the lineage counters the north rule requires (events
seen / applied / dup-dropped / below-watermark-dropped / tombstoned).
"""

from __future__ import annotations

import json
import os
import re
from dataclasses import asdict, dataclass, field

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


def validate_envelope(schema: pa.Schema) -> pa.Schema:
    """Fail fast on envelope types the manifest cannot record (e.g. an
    all-null JSON column inferred as ``null``, or list/struct from an
    evolved segment). Called at PLAN time, before the epoch's
    read/shuffle/write — not at commit time when the work is already
    spent."""
    bad = [(f.name, str(f.type)) for f in schema if str(f.type) not in _TYPE_PARSERS]
    if bad:
        raise TypeError(
            f"unsupported envelope column types {bad}; supported: "
            f"{sorted(_TYPE_PARSERS)} — cast or drop these columns in the "
            "source, or extend manifest._TYPE_PARSERS"
        )
    return schema


def schema_to_json(schema: pa.Schema) -> list[list[str]]:
    validate_envelope(schema)
    return [[f.name, str(f.type)] for f in schema]


def fsync_dir(path: str) -> None:
    """fsync a directory so a completed os.replace inside it survives an
    OS/power crash (POSIX requires the dir entry itself be synced)."""
    fd = os.open(path, os.O_RDONLY)
    try:
        os.fsync(fd)
    finally:
        os.close(fd)


def schema_from_json(fields: list[list[str]]) -> pa.Schema:
    return pa.schema([pa.field(n, _TYPE_PARSERS[t]) for n, t in fields])


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
    bytes: int = 0


@dataclass
class Manifest:
    epoch: int
    kind: str  # "delta" | "compact"
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
_NAME_RE = re.compile(r"^epoch=(\d{6})\.json$")


def manifest_path(root: str, epoch: int) -> str:
    return os.path.join(root, MANIFEST_DIR, f"epoch={epoch:06d}.json")


def write_manifest(root: str, m: Manifest) -> str:
    """Atomic EXCLUSIVE commit: serialize to a tmp file, fsync, claim the
    epoch with os.link (fails with FileExistsError if another writer
    already committed it — os.replace would silently overwrite in a
    two-driver race), then fsync the manifests directory (the new dir
    entry must be durable — a power crash after the link but before the
    entry hits disk would otherwise roll the commit back while delta
    files survive)."""
    d = os.path.join(root, MANIFEST_DIR)
    os.makedirs(d, exist_ok=True)
    final = manifest_path(root, m.epoch)
    tmp = final + f".tmp-{os.getpid()}"
    payload = asdict(m)
    with open(tmp, "w") as f:
        json.dump(payload, f, indent=1)
        f.flush()
        os.fsync(f.fileno())
    try:
        os.link(tmp, final)  # atomic claim: exactly one committer per epoch
    finally:
        os.unlink(tmp)
    fsync_dir(d)
    return final


def _parse_manifest(path: str) -> Manifest:
    with open(path) as f:
        raw = json.load(f)
    parts = {k: PartitionEntry(**v) for k, v in raw.pop("partitions", {}).items()}
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
    for name in sorted(os.listdir(d)):
        if not _NAME_RE.match(name):
            continue
        if cache is not None and name in cache:
            out.append(cache[name])
            continue
        m = _parse_manifest(os.path.join(d, name))
        if cache is not None:
            cache[name] = m
        out.append(m)
    return out
