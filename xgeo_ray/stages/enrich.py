"""Stream-table enrichment stage for the ingest DAG.

The classic streaming "dimension join": every change event picks up
columns from a small, slowly-changing dimension table (user tier,
source metadata, routing policy) on its way into the lake. The
reference has no counterpart (its stages are per-record Lua scripts,
/root/reference/cmd/xgeo/main.go); in Ray the idiomatic shape is a
driver-side ``ray.put`` of the dimension ONCE, with each worker
``ray.get``-ing it lazily on first batch — a zero-copy plasma read
cached per process, never re-shipped per batch or per task (the
broadcast discipline CLAUDE.md's tuning notes mandate).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray


class BroadcastLookup:
    """Left-join each batch against a broadcast dimension table.

    Usable anywhere a stage callable fits: ``run_stream(transform=...)``,
    ``sync_derived(transform=...)``, or inside an ``extension.StageChain``
    (instances are valid registry entries — they carry ``__name__``).

    Semantics: for each batch row, the dimension row with equal ``on``
    key contributes its non-key columns; unmatched rows get nulls
    (left join). Dimension keys must be unique — duplicate keys would
    make the enrichment nondeterministic, so construction fails fast.

    At ingest time the enriched columns must already exist in the
    table's envelope (declare them in ``base_schema`` at
    ``DeltaTable.create``): the normalizer null-fills them before this
    stage runs, and this stage REPLACES the null columns with looked-up
    values. Appending novel columns here would race the epoch's planned
    schema — declare, then fill.
    """

    def __init__(
        self,
        dim: pa.Table,
        on: str,
        columns: list[str] | None = None,
    ):
        if columns is not None:
            dim = dim.select([on] + [c for c in columns if c != on])
        dim = dim.combine_chunks()
        n_keys = pc.count_distinct(dim.column(on)).as_py()
        if n_keys != dim.num_rows:
            raise ValueError(
                f"dimension has duplicate {on!r} keys "
                f"({dim.num_rows} rows, {n_keys} distinct)"
            )
        self.on = on
        self.value_cols = [c for c in dim.column_names if c != on]
        self.__name__ = f"BroadcastLookup[{on}]"
        # broadcast once; workers fetch lazily (plasma zero-copy, cached)
        self._ref = ray.put(dim)
        self._dim: pa.Table | None = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self._dim is None:
            self._dim = ray.get(self._ref)
        return _apply_lookup(batch, self._dim, self.on, self.value_cols)


def _apply_lookup(
    batch: pa.Table, dim: pa.Table, on: str, value_cols: list[str]
) -> pa.Table:
    """Left-join ``batch`` against a unique-keyed dimension slice."""
    idx = pc.index_in(batch.column(on), value_set=dim.column(on))
    for name in value_cols:
        col = dim.column(name).take(idx)
        if name in batch.column_names:
            batch = batch.set_column(batch.schema.get_field_index(name), name, col)
        else:
            batch = batch.append_column(name, col)
    return batch


@ray.remote
def _dim_split(block: pa.Table, on: str, nb: int):
    """Radix-map side of the dimension build: argsort-split one block
    into nb zero-copy slices by key-hash bucket (the ingest exchange /
    hash_join shape)."""
    import numpy as np

    from xgeo_ray.functions.relational import _key_buckets
    from xgeo_ray.tuning import limit_worker_threads

    limit_worker_threads()
    bk = _key_buckets(block, [on], nb)
    order = np.argsort(bk, kind="stable")
    t = block.take(order)
    bounds = np.searchsorted(bk[order], np.arange(nb + 1))
    out = tuple(t.slice(bounds[i], bounds[i + 1] - bounds[i]) for i in range(nb))
    return out if nb > 1 else out[0]


@ray.remote(num_returns=2)
def _dim_bucket_reduce(on: str, *slices: pa.Table):
    """Reduce side: one dimension bucket from every block's slice.
    Returns (bucket table, duplicate-key count) — hash partitioning
    sends every copy of a key to the same bucket, so per-bucket
    distinct-count is a complete global duplicate check."""
    from xgeo_ray.tuning import limit_worker_threads

    limit_worker_threads()
    slices = [s for s in slices if s.num_rows]
    if not slices:
        return None, 0
    t = pa.concat_tables(slices).combine_chunks()
    n_dup = t.num_rows - pc.count_distinct(t.column(on)).as_py()
    return t, int(n_dup)


class PartitionedLookup:
    """Left-join each batch against a dimension PARTITIONED into
    key-hash buckets in the object store — the large-dimension
    complement of ``BroadcastLookup`` for dimensions that don't fit a
    single broadcast object (user profiles, URL metadata at crawl
    scale).

    Build (once, at construction): the dimension Dataset is radix-
    exchanged by hash(``on``) into ``num_buckets`` bucket tables (the
    same bucket function as ``functions.relational.hash_join``), each
    living in the object store; only per-bucket duplicate-key COUNTS
    reach the driver (fail-fast, like BroadcastLookup). Auto-sized from
    the dimension's block count so a 100x dimension gets more buckets
    without a code change.

    Probe (per batch): hash the batch's keys, ``ray.get`` ONLY the
    buckets those keys touch (plasma zero-copy — node-local after the
    first fetch, spillable, never copied into the worker heap), and
    left-join against their concatenation. A worker therefore maps the
    dimension slices its stream actually references, not the whole
    table; when ``on`` is correlated with the stream's partitioning
    key, each ingest partition touches a stable small subset of
    buckets. Unmatched rows get nulls; at ingest time the enriched
    columns must be DECLARED in ``base_schema`` (same contract as
    BroadcastLookup — declare, then fill).
    """

    def __init__(
        self,
        dim,
        on: str,
        columns: list[str] | None = None,
        num_buckets: int | None = None,
    ):
        import ray.data as rd

        if isinstance(dim, pa.Table):
            dim = rd.from_arrow(dim)
        if columns is not None:
            dim = dim.select_columns([on] + [c for c in columns if c != on])
        dim = dim.materialize()
        self.on = on
        arrow_schema = dim.schema().base_schema
        self._empty_dim = arrow_schema.empty_table()
        self.value_cols = [c for c in arrow_schema.names if c != on]
        self.__name__ = f"PartitionedLookup[{on}]"
        from xgeo_ray.functions.dedup import _auto_buckets

        block_refs = dim.to_arrow_refs()
        nb = num_buckets if num_buckets is not None else _auto_buckets(
            len(block_refs)
        )
        self.nb = nb
        maps = [
            _dim_split.options(num_returns=nb if nb > 1 else None).remote(r, on, nb)
            for r in block_refs
        ]
        if nb == 1:
            maps = [[m] for m in maps]
        self._bucket_refs = []
        dup_refs = []
        for b in range(nb):
            t, d = _dim_bucket_reduce.remote(on, *[m[b] for m in maps])
            self._bucket_refs.append(t)
            dup_refs.append(d)
        n_dup = sum(ray.get(dup_refs))  # nb scalars, never bucket data
        if n_dup:
            raise ValueError(
                f"dimension has {n_dup} duplicate {on!r} keys — "
                "enrichment would be nondeterministic"
            )
        self._cache: dict[int, pa.Table | None] = {}

    def __getstate__(self):
        # never serialize fetched bucket tables into task closures —
        # workers re-fetch from plasma (zero-copy, node-local cache)
        state = dict(self.__dict__)
        state["_cache"] = {}
        return state

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np

        from xgeo_ray.functions.relational import _key_buckets

        if batch.num_rows == 0:
            return _apply_lookup(batch, self._empty_dim, self.on, self.value_cols)
        bk = _key_buckets(batch, [self.on], self.nb)
        needed = np.unique(bk)
        missing = [int(b) for b in needed if int(b) not in self._cache]
        if missing:
            got = ray.get([self._bucket_refs[b] for b in missing])
            for b, t in zip(missing, got):
                self._cache[b] = t
        parts = [t for b in needed if (t := self._cache[int(b)]) is not None]
        if not parts:
            # touched buckets hold no dimension rows: empty-dim left
            # join null-fills the value columns with the right types
            return _apply_lookup(batch, self._empty_dim, self.on, self.value_cols)
        dim = parts[0] if len(parts) == 1 else pa.concat_tables(parts)
        return _apply_lookup(batch, dim, self.on, self.value_cols)
