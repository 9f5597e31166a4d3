"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship CDC ingest pipeline end-to-end on
sf0.001-scale fixtures; ``queries()``/``oracle_sql()`` expose every
implemented operator from SURVEY.md §2 with DuckDB parity oracles.

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in xgeo_ray) calls ray.init()/ray.shutdown().
"""

from __future__ import annotations

import os
import shutil
from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship: bootstrap transcripts, replay a change stream through the
    exactly-once ingest path, return the merged snapshot Dataset."""
    import pyarrow.parquet as pq

    from xgeo_ray import fixtures as fx
    from xgeo_ray.pipelines import ingest as ing
    from xgeo_ray.state.delta_table import DeltaTable

    root = "/tmp/xgeo_entry"
    shutil.rmtree(root, ignore_errors=True)
    os.makedirs(root)
    base = fx.make_transcripts(n_convs=50, turns_per_conv=10)
    pq.write_table(base, f"{root}/base.parquet")
    events = fx.make_change_events(
        5000, n_convs=50, turns_per_conv=10, dup_fraction=0.02
    )
    segs = fx.write_segments(events, f"{root}/wal", n_segments=4)

    table = DeltaTable.create(f"{root}/table", num_partitions=8, num_salts=2)
    ing.bootstrap_base(table, f"{root}/base.parquet")
    ing.run_stream(table, segs, segments_per_epoch=2)
    return ing.snapshot(table)


def queries() -> dict[str, Callable[[str], Any]]:
    from xgeo_ray.pipelines.queries import build_queries

    return build_queries()


def oracle_sql() -> dict[str, str]:
    from xgeo_ray.pipelines.queries import build_oracle_sql

    return build_oracle_sql()
