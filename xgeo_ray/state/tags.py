"""Named epoch tags — human-handled savepoints over the manifest history.

``snapshot(as_of_epoch=...)`` time-travels by raw epoch number; a tag
gives that number a durable NAME (``release-2026-08``, ``pre-backfill``)
any process can resolve later — the same role as tags in public lake
formats (cf. Iceberg tag/branch semantics: a tag is an immutable named
ref to a snapshot; branches here are ``ingest.clone_table``).

Each tag is one exclusively-committed JSON file under
``<table>/tags/<name>.json`` (the same storage fence as the epoch
commit and the consumer acks): creation is atomic, a racing double-tag
of the same name resolves to one winner, and re-tagging an existing
name at the SAME epoch is an idempotent no-op while a different epoch
is refused (delete first — tags never move silently).

Retention coupling: a tag pins readability of its epoch. ``vacuum()``
(``respect_tags=True``, the default) keeps every file visible as of any
tagged epoch, so ``snapshot(as_of_epoch=tags[name])`` stays readable
across compact + vacuum until the tag is deleted — turning the
documented "vacuum cadence is the time-travel retention window" into a
per-tag enforced guarantee.
"""

from __future__ import annotations

import json
import os
import re
import time

from xgeo_ray.state.delta_table import DeltaTable
from xgeo_ray.state.storage import DEFAULT_STORAGE

TAG_DIR = "tags"
_NAME_RE = re.compile(r"^[A-Za-z0-9][A-Za-z0-9._-]*$")


def _tag_path(table: DeltaTable, name: str) -> str:
    if not _NAME_RE.match(name):
        raise ValueError(
            f"tag name {name!r} must be filesystem-safe "
            "([A-Za-z0-9._-], no leading dot)"
        )
    return os.path.join(table.root, TAG_DIR, f"{name}.json")


def tag(table: DeltaTable, name: str, epoch: int | None = None) -> int:
    """Create tag ``name`` at ``epoch`` (default: the latest committed
    epoch). Returns the tagged epoch. Idempotent at the same epoch;
    refuses to MOVE an existing tag (delete_tag first). The epoch must
    be committed — tagging the future is meaningless."""
    latest = table.latest_epoch()
    if epoch is None:
        epoch = latest
    if not (0 < epoch <= latest):
        raise ValueError(
            f"epoch {epoch} is not a committed epoch (latest: {latest})"
        )
    p = _tag_path(table, name)
    payload = json.dumps(
        {"epoch": int(epoch), "created_unix_us": int(time.time() * 1_000_000)}
    ).encode()
    try:
        DEFAULT_STORAGE.commit_bytes_exclusive(p, payload)
    except FileExistsError:
        have = resolve(table, name)
        if have != epoch:
            raise ValueError(
                f"tag {name!r} already points at epoch {have}; tags never "
                f"move — delete_tag first to re-point at {epoch}"
            )
    return int(epoch)


def resolve(table: DeltaTable, name: str) -> int:
    """The epoch tag ``name`` points at. KeyError when absent."""
    p = _tag_path(table, name)
    if not os.path.isfile(p):
        raise KeyError(f"no tag {name!r} on table {table.root}")
    with open(p) as f:
        return int(json.load(f)["epoch"])


def tags(table: DeltaTable) -> dict[str, int]:
    """All tags, name -> epoch."""
    d = os.path.join(table.root, TAG_DIR)
    if not os.path.isdir(d):
        return {}
    out: dict[str, int] = {}
    for n in sorted(os.listdir(d)):
        if n.endswith(".json") and not n.startswith("."):
            with open(os.path.join(d, n)) as f:
                out[n[: -len(".json")]] = int(json.load(f)["epoch"])
    return out


def delete_tag(table: DeltaTable, name: str) -> bool:
    """Drop tag ``name`` (its epoch's files become reclaimable by the
    next vacuum unless still visible or pinned elsewhere). Returns
    False when the tag did not exist."""
    p = _tag_path(table, name)
    if not os.path.isfile(p):
        return False
    DEFAULT_STORAGE.delete_control(p)
    return True
