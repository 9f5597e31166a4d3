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
        dim = self._dim
        idx = pc.index_in(batch.column(self.on), value_set=dim.column(self.on))
        for name in self.value_cols:
            col = dim.column(name).take(idx)
            if name in batch.column_names:
                batch = batch.set_column(
                    batch.schema.get_field_index(name), name, col
                )
            else:
                batch = batch.append_column(name, col)
        return batch
