"""User-extension surface (SURVEY.md §2.10).

The reference's extension points are (a) the ``FeatureReader`` interface
(/root/reference/io/interface.go:3-5) and (b) the lock-tier embedded Lua
VM for per-record transforms (Gopkg.lock:7; the "scriptable" in its
README). The idiomatic Python/Ray replacement is a *named-stage
registry*: users register callables ``fn(pa.Table) -> pa.Table`` and
compose them into a declarative chain that runs as fused map_batches
steps inside the ingest DAG — compiled once per process, vectorized per
batch, no per-record interpreter.
"""

from __future__ import annotations

from collections.abc import Callable

import pyarrow as pa

import ray.data

StageFn = Callable[[pa.Table], pa.Table]

_REGISTRY: dict[str, StageFn] = {}


def register_stage(name: str, fn: StageFn | None = None):
    """Register a named batch transform. Usable as a decorator:

        @register_stage("redact")
        def redact(t: pa.Table) -> pa.Table: ...
    """
    if fn is None:

        def deco(f: StageFn) -> StageFn:
            _REGISTRY[name] = f
            return f

        return deco
    _REGISTRY[name] = fn
    return fn


def get_stage(name: str) -> StageFn:
    if name not in _REGISTRY:
        raise KeyError(f"unknown stage {name!r}; registered: {sorted(_REGISTRY)}")
    return _REGISTRY[name]


def stage_names() -> list[str]:
    return sorted(_REGISTRY)


class StageChain:
    """A declarative chain of registered stages, applied as ONE fused
    map_batches step (one serialization boundary, not N)."""

    def __init__(self, names: list[str]):
        self.names = list(names)
        self.__name__ = "StageChain[" + ",".join(names) + "]"
        # resolve at construction (on the driver) so the chain serializes
        # self-contained to workers — ad-hoc driver-side registrations
        # work without the registry existing in the worker process
        self._fns = [get_stage(n) for n in names]

    def __call__(self, batch: pa.Table) -> pa.Table:
        for fn in self._fns:
            batch = fn(batch)
        return batch

    def apply(self, ds: ray.data.Dataset, **kwargs) -> ray.data.Dataset:
        kwargs.setdefault("batch_format", "pyarrow")
        kwargs.setdefault("zero_copy_batch", True)
        return ds.map_batches(self, **kwargs)
