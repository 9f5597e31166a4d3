"""Worker-side runtime tuning.

A Ray worker process inherits Arrow's default thread pools sized to the
MACHINE (cpu_count each for compute and IO). With one worker per core,
that is cores² runnable threads the moment tasks touch Parquet
(pq.read_table / write_table default use_threads=True) — measured here,
32-CPU runs lost to 8-CPU runs purely from this thrash. Each worker is
scheduled as ONE logical CPU, so its internal pools should be ~1.

Called from every stage that runs inside workers; idempotent and ~µs.
"""

from __future__ import annotations

import pyarrow as pa

_done = False


def limit_worker_threads(compute: int = 1, io: int = 2) -> None:
    global _done
    if _done:
        return
    pa.set_cpu_count(compute)
    pa.set_io_thread_count(io)
    _done = True
