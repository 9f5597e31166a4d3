"""Storage seam for the commit fence and data-file publication.

Exactly-once in this engine rests on THREE storage primitives, factored
here so the POSIX implementation (this sandbox, any shared POSIX
filesystem) and an object-store implementation are interchangeable
behind one interface — the deployment blocker called out by the round-2
review (manifest.py's os.link / os.replace / dir-fsync assume POSIX,
which S3/GCS do not provide):

1. ``commit_bytes_exclusive(path, data)`` — the FENCE. Publish a small
   control file (an epoch manifest) atomically, failing with
   ``FileExistsError`` if ANY writer already published that path.
   * POSIX: write tmp + fsync, ``os.link`` (atomic claim — hard-link
     creation is exclusive), fsync the directory.
   * Object store: a conditional put of the final key — S3
     ``If-None-Match: *`` (supported since 2024), GCS
     ``x-goog-if-generation-match: 0``, Azure ``If-None-Match: *``.
     No tmp object and no directory sync: a successful conditional PUT
     is atomic, exclusive and durable by the service's contract.

2. ``publish_file(tmp_path, final_path, durable)`` — last-writer-wins
   publication of a DATA file (epoch delta / compaction Parquet) whose
   bytes the caller already wrote to ``tmp_path``.
   * POSIX: ``os.replace`` (+ directory fsync when durable — a
     manifest committed later must never reference bytes an OS crash
     can take back; the file itself is fsync'd by the caller before
     publish when durability="full").
   * Object store: write the bytes as a plain PUT of ``final_path``
     directly (object PUTs are atomic — readers never see partial
     objects, so the tmp+rename dance is unnecessary); ``durable`` is
     a no-op (a 200 response IS the durability barrier).

3. ``sync_dir(path)`` — make a completed rename/link durable.
   * POSIX: fsync the directory fd. Object store: no-op.

Data files are additionally written under attempt-unique names (a
commit token in the filename, see ``delta_table.delta_relpath``), so a
losing driver in a two-writer race can never overwrite the bytes the
winning manifest references — the fence alone orders COMMITS, the
token keeps concurrent attempts' DATA disjoint. Uncommitted attempt
files are reclaimed by ``ingest.vacuum``.
"""

from __future__ import annotations

import os


class PosixStorage:
    """POSIX-filesystem implementation (local disk, NFS with coherent
    link semantics). See the module docstring for the object-store
    mapping of each primitive."""

    def sync_dir(self, path: str) -> None:
        """fsync a directory so a completed os.replace/os.link inside it
        survives an OS/power crash (POSIX requires the dir entry itself
        be synced)."""
        fd = os.open(path, os.O_RDONLY)
        try:
            os.fsync(fd)
        finally:
            os.close(fd)

    def commit_bytes_exclusive(self, path: str, data: bytes) -> None:
        """Atomic EXCLUSIVE publish of a small control file: write tmp +
        fsync, claim the final name with os.link (fails with
        FileExistsError if another writer already committed — os.replace
        would silently overwrite in a two-driver race), then fsync the
        directory (the new dir entry must be durable — a power crash
        after the link but before the entry hits disk would otherwise
        roll the commit back while data files survive)."""
        d = os.path.dirname(path)
        os.makedirs(d, exist_ok=True)
        tmp = path + f".tmp-{os.getpid()}"
        with open(tmp, "wb") as f:
            f.write(data)
            f.flush()
            os.fsync(f.fileno())
        try:
            os.link(tmp, path)  # atomic claim: exactly one committer
        finally:
            os.unlink(tmp)
        self.sync_dir(d)

    def publish_file(self, tmp_path: str, final_path: str, durable: bool) -> None:
        """Atomically publish a data file written to ``tmp_path``
        (last-writer-wins; the caller fsync'd the bytes when durable)."""
        os.replace(tmp_path, final_path)
        if durable:
            self.sync_dir(os.path.dirname(final_path))

    def delete_control(self, path: str) -> None:
        """Remove a control file published via commit_bytes_exclusive so
        the name can be claimed again (lease steal/release). Object
        store: DELETE of the key."""
        try:
            os.unlink(path)
        except FileNotFoundError:
            pass


class ObjectStoreStorage:
    """Object-store-CONTRACT implementation, emulated over a local
    directory for contract tests: the engine-facing semantics are
    exactly the documented restricted primitive set — a conditional PUT
    (create-if-absent, FileExistsError on conflict), a plain atomic PUT,
    and no-op durability barriers (a 200 response IS the barrier). No
    interface call relies on hard links, rename-as-API, or directory
    fsync, which is what a real S3/GCS/Azure backend cannot provide.

    Emulation internals may use local renames to reproduce the PUT
    atomicity a real service guarantees natively (readers never see a
    partial object). One emulation-only artifact: the exclusivity claim
    (``.claim`` sidecar, O_EXCL) and the object's visibility are two
    steps, so a crash between them leaves a claimed-but-invisible
    control file — a window a real conditional PUT does not have."""

    def sync_dir(self, path: str) -> None:
        pass  # object stores have no directories; the PUT ack is durable

    def commit_bytes_exclusive(self, path: str, data: bytes) -> None:
        d = os.path.dirname(path)
        os.makedirs(d, exist_ok=True)
        tmp = path + f".objtmp-{os.getpid()}"
        with open(tmp, "wb") as f:
            f.write(data)
        try:
            # the conditional PUT: If-None-Match:* — exactly one creator
            fd = os.open(path + ".claim", os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            os.close(fd)
        except FileExistsError:
            os.unlink(tmp)
            raise
        os.replace(tmp, path)  # atomic visibility (native in a real store)

    def publish_file(self, tmp_path: str, final_path: str, durable: bool) -> None:
        # a plain object PUT: atomic visibility, last-writer-wins;
        # `durable` is a no-op (the ack is the durability barrier)
        os.replace(tmp_path, final_path)

    def delete_control(self, path: str) -> None:
        # DELETE of the key (+ the emulation's claim sidecar)
        for p in (path, path + ".claim"):
            try:
                os.unlink(p)
            except FileNotFoundError:
                pass


def _resolve_default():
    """Backend selection at import time — read in the DRIVER and in
    every Ray worker (local-mode workers inherit the env), so one
    env var switches the whole engine onto the restricted contract:
    ``XGEO_STORAGE=objectstore`` runs ingest/fence/consumers without
    links, renames-as-API, or dir fsync anywhere in the interface."""
    kind = os.environ.get("XGEO_STORAGE", "posix")
    if kind == "objectstore":
        return ObjectStoreStorage()
    if kind == "s3":
        # network-backed: conditional-PUT fence arbitrated by an
        # S3-compatible service (XGEO_S3_ENDPOINT/XGEO_S3_BUCKET)
        from xgeo_ray.state.s3_storage import from_env

        return from_env()
    return PosixStorage()


# Process-wide default. A multi-node object-store deployment swaps this
# for an implementation of the documented conditional-put contract
# (or selects the emulation via XGEO_STORAGE=objectstore for tests).
DEFAULT_STORAGE = _resolve_default()
