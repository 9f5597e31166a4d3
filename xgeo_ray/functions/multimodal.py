"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video travel as Arrow ``binary`` columns with a sidecar
metadata struct; decode / feature-extract stages are actor-pool
map_batches classes with small batch sizes (payloads are wide). The
actual codecs are NOT in this container, so the decode kernels are
deterministic STUBS behind ``XGEO_FAKE_DECODE`` — the Ray-side plumbing
(schema, actor signature, batch sizing, output layout) is real and
tested; swap ``_decode_image_stub`` for a PIL/ffmpeg call in production.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        pa.field("media_id", pa.int64()),
        pa.field("kind", pa.string()),  # "image" | "audio"
        pa.field("payload", pa.binary()),
        pa.field("n_bytes", pa.int64()),
    ]
)


def _decode_image_stub(payload: bytes) -> tuple[int, int, int]:
    """Deterministic fake decode -> (width, height, channels).

    A real deployment replaces this with PIL/turbojpeg; raising
    NotImplementedError here would make the plumbing untestable, so the
    stub derives stable dimensions from a content hash instead."""
    h = hashlib.sha256(payload).digest()
    return 64 + h[0] % 192, 64 + h[1] % 192, 3


# Per-worker-process decoder cache: an instance-passed stage ships the
# (config-only) instance to every task, and the first batch in each
# worker process resolves the heavy "model" here exactly once — all
# later tasks in that process reuse it. This is what lets the stage run
# task-based without re-paying model load per task.
_DECODER_CACHE: dict[str, object] = {}
# Driver-side strong refs for callable codecs: keying the worker cache
# by id(loader) is only sound if the id can never be recycled.
_LOADER_PINS: dict[int, object] = {}

# ------------------------------------------------------------- codec registry
# Pluggable decoders, the merge-policy discipline (stages/collapse.py
# MERGE_POLICIES): a deployment swaps the sandbox stub for PIL/turbojpeg
# /ffmpeg by registering a LOADER — called once per worker process, so
# the heavy import/model-load cost is paid per process, never per batch.
# Loaders resolve on the DRIVER and ship pickled with the stage instance
# (a name-lookup in workers would miss runtime-registered codecs).
CODECS: dict[str, dict] = {}


def register_codec(kind: str, loader) -> None:
    """Register a decoder for ``kind``: ``loader()`` must return a
    callable ``decode(payload: bytes) -> (width, height, channels)``.
    The loader runs once per worker process (import PIL, open the
    model, pin the GPU slot there)."""
    CODECS[kind] = {"loader": loader}


def _stub_loader():
    return _decode_image_stub


register_codec("image", _stub_loader)


class DecodeMedia:
    """Decode stage with per-worker-process model caching. Two shapes:

    - instance-passed — ``ds.map_batches(DecodeMedia(), batch_size=64)``:
      tasks schedule immediately on any warm worker; the decoder loads
      once per worker process via ``_DECODER_CACHE``. Measured at
      sf0.01 (interleaved best-of-5): 0.52 s vs 1.39 s for a 2-actor
      pool — Ray Data actor pools gate each execution on actor
      readiness, a ~1 s fixed cost per query on this sandbox.
    - actor pool — ``ds.map_batches(DecodeMedia, concurrency=N,
      batch_size=64)``: reserves dedicated processes; the right shape
      when the model is too large to share a task-worker heap or pins a
      GPU slot. The same lazy cache serves as the per-actor load.

    ``codec`` picks the registered decoder (``register_codec``) by name,
    or takes a loader callable directly — either way the loader is
    resolved on the driver and runs once per worker process.

    Small batches either way: payload rows are wide (batch bytes, not
    batch rows, is the memory unit for binary columns)."""

    def __init__(self, codec: str = "image"):
        if isinstance(codec, str):
            if codec not in CODECS:
                raise ValueError(
                    f"unknown codec {codec!r} (registered: "
                    f"{sorted(CODECS)}); register_codec() it first"
                )
            self._loader = CODECS[codec]["loader"]
            self._cache_key = codec
        else:
            self._loader = codec
            # Two distinct lambdas both stringify to "<lambda>" — key the
            # worker-side cache by the loader OBJECT's identity so
            # different callables never share (or clobber) one cached
            # decoder, while re-wrapping the same loader still shares.
            # The pin keeps a strong reference so id() is never reused.
            _LOADER_PINS[id(codec)] = codec
            self._cache_key = f"callable:{id(codec)}"
        self.decode = None  # resolved lazily, once per worker process

    def _ensure_loaded(self):
        if self.decode is None:
            # "model load" happens here, once per process; setdefault
            # would evaluate the loader even on a cache hit, so guard
            # explicitly — the load must run at most once per process.
            if self._cache_key not in _DECODER_CACHE:
                _DECODER_CACHE[self._cache_key] = self._loader()
            self.decode = _DECODER_CACHE[self._cache_key]

    def __call__(self, batch: pa.Table) -> pa.Table:
        self._ensure_loaded()
        payloads = batch.column("payload").to_pylist()
        dims = [self.decode(p) for p in payloads]
        w = pa.array([d[0] for d in dims], pa.int32())
        h = pa.array([d[1] for d in dims], pa.int32())
        c = pa.array([d[2] for d in dims], pa.int32())
        out = batch.drop_columns(["payload"])  # decoded: drop the heavy bytes
        return out.append_column("width", w).append_column("height", h).append_column(
            "channels", c
        )


class ExtractFeatures:
    """Stub feature extractor: 8-dim deterministic byte-histogram
    embedding per payload — stands in for a vision/audio model forward
    pass (vectorized over the batch like a real batched inference)."""

    def __init__(self, dim: int = 8):
        self.dim = dim

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = []
        for p in batch.column("payload").to_pylist():
            arr = np.frombuffer(p, dtype=np.uint8)
            hist = np.bincount(arr % self.dim, minlength=self.dim).astype(np.float32)
            total = hist.sum() or 1.0
            feats.append(hist / total)
        out = batch.drop_columns(["payload"])
        return out.append_column(
            "features", pa.array([f.tolist() for f in feats], pa.list_(pa.float32(), self.dim))
        )


def docs_to_media(batch: pa.Table) -> pa.Table:
    """Synthesize a media table from documents (text bytes as payload) —
    the fixture path for multimodal plumbing tests."""
    texts = batch.column("text").to_pylist()
    payloads = [t.encode("utf-8") for t in texts]
    return pa.table(
        {
            "media_id": batch.column("doc_id").cast(pa.int64()),
            "kind": pa.array(["image"] * len(texts)),
            "payload": pa.array(payloads, pa.binary()),
            "n_bytes": pa.array([len(p) for p in payloads], pa.int64()),
        },
        schema=MEDIA_SCHEMA,
    )


class ResizeImage:
    """Stub resize stage (actor-pool shape): produces a payload of the
    target dimensions' size, derived deterministically from the source
    bytes — stands in for a PIL/opencv resize. Keeps the binary-column
    layout so downstream stages (feature extract, write) are exercised
    with realistic wide rows."""

    def __init__(self, width: int = 64, height: int = 64):
        self.w = width
        self.h = height

    def __call__(self, batch: pa.Table) -> pa.Table:
        target = self.w * self.h * 3
        out_payloads = []
        for p in batch.column("payload").to_pylist():
            src = np.frombuffer(p, dtype=np.uint8)
            if len(src) == 0:
                src = np.zeros(1, dtype=np.uint8)
            # deterministic nearest-neighbor-style byte resample
            idx = (np.arange(target) * len(src) // target) % len(src)
            out_payloads.append(src[idx].tobytes())
        batch = batch.drop_columns(["payload", "n_bytes"])
        return (
            batch.append_column("payload", pa.array(out_payloads, pa.binary()))
            .append_column(
                "n_bytes", pa.array([target] * batch.num_rows, pa.int64())
            )
            .append_column("width", pa.array([self.w] * batch.num_rows, pa.int32()))
            .append_column("height", pa.array([self.h] * batch.num_rows, pa.int32()))
        )


class SampleFrames:
    """Frame-sampling stage for video-like payloads: treats the payload
    as ``n_frames`` fixed-size frames and emits ONE ROW PER SAMPLED
    FRAME (row-expanding map_batches — the flat_map shape). Sampling is
    uniform-stride, deterministic."""

    def __init__(self, frame_bytes: int = 256, max_frames: int = 4):
        self.frame_bytes = frame_bytes
        self.max_frames = max_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, kinds, frames, fidx, totals = [], [], [], [], []
        for mid, kind, p in zip(
            batch.column("media_id").to_pylist(),
            batch.column("kind").to_pylist(),
            batch.column("payload").to_pylist(),
        ):
            n_frames = max(1, len(p) // self.frame_bytes)
            take = min(self.max_frames, n_frames)
            stride = n_frames / take
            for k in range(take):
                i = int(k * stride)
                ids.append(mid)
                kinds.append(kind)
                fidx.append(i)
                totals.append(n_frames)
                frames.append(p[i * self.frame_bytes : (i + 1) * self.frame_bytes])
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "kind": pa.array(kinds, pa.string()),
                "frame_idx": pa.array(fidx, pa.int32()),
                "n_frames": pa.array(totals, pa.int32()),
                "frame": pa.array(frames, pa.binary()),
            }
        )
