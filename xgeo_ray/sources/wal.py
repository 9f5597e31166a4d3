"""WAL/changelog segment sources with format + compression dispatch.

Mirrors the reference's source layer structurally:
  * extension-based format dispatch (/root/reference/cmd/xgeo/main.go:25-40)
  * transparent decompression chained by suffix stripping
    (/root/reference/cmd/xgeo/main.go:29-36): ``segment.jsonl.gz`` works
  * archive container source (/root/reference/io/shp.go:15-17 reads a
    shapefile from a .zip): here, Parquet/JSONL members inside a .zip
  * streaming record reader (/root/reference/io/geojson.go:20-29): here,
    ray.data's streaming block reads — constant memory per task

All readers return a ``ray.data.Dataset`` of raw change-event rows; the
normalize stage casts them onto the union envelope schema, so sources
stay schema-agnostic like the reference's ``map[string]interface{}``.
"""

from __future__ import annotations

import io
import os
import zipfile

import pyarrow as pa
import pyarrow.json as pa_json
import pyarrow.parquet as pq

import ray.data


def _strip_compression(path: str) -> tuple[str, str | None]:
    """Suffix-stripping dispatch: returns (logical path, codec)."""
    for ext, codec in ((".gz", "gzip"), (".gzip", "gzip"), (".bz2", "bz2"), (".zst", "zstd")):
        if path.endswith(ext):
            return path[: -len(ext)], codec
    return path, None


_BASE_EXTS = (".parquet", ".json", ".jsonl", ".ndjson", ".csv", ".zip")


def is_supported_segment(name: str) -> bool:
    """True if ``read_segment`` can ingest this file name — the ONE
    dispatch predicate shared by readers and the tailer (a tailer with
    its own allowlist silently skips formats the reader supports)."""
    logical, _ = _strip_compression(name)
    return logical.endswith(_BASE_EXTS)


def plan_num_blocks(total_bytes: int) -> int:
    """Width-aware block count for a Parquet read.

    Ray's default splits every read into ~2*num_cpus micro-blocks, so a
    250k-row segment becomes 4k-row tasks drowned in dispatch overhead.
    Prefer ~32 MiB of file per block (roughly 1M rows / 100+ MiB decoded:
    tasks long enough to amortize executor latency); if that yields fewer
    blocks than the cluster has cores, split further — but never below
    ~8 MiB per block. Downstream width matters too: Ray's sort-shuffle
    (groupby/map_groups) creates one output partition per input block,
    so this count is also the apply-stage parallelism."""
    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    preferred = total_bytes >> 25  # 32 MiB
    smallest = total_bytes >> 23  # 8 MiB
    return max(1, min(smallest, max(preferred, cpus)))


def read_segment(path: str) -> ray.data.Dataset:
    """Read one WAL segment, dispatching on extension like the reference's
    main.go: ``.parquet`` | ``.json``/``.jsonl`` (optionally compressed)
    | ``.zip`` containers of either."""
    logical, codec = _strip_compression(path)
    if logical.endswith(".parquet"):
        n_blocks = plan_num_blocks(os.path.getsize(path))
        return ray.data.read_parquet(path, override_num_blocks=n_blocks)
    if logical.endswith((".json", ".jsonl", ".ndjson")):
        if logical.endswith(".json") and _sniff_nested_json(path, codec):
            return read_nested_json(path)
        # ray.data.read_json handles gzip via arrow_open_stream_args
        kwargs = {}
        if codec:
            kwargs["arrow_open_stream_args"] = {"compression": codec}
        return ray.data.read_json(path, **kwargs)
    if logical.endswith(".csv"):
        kwargs = {}
        if codec:
            kwargs["arrow_open_stream_args"] = {"compression": codec}
        return ray.data.read_csv(path, **kwargs)
    if logical.endswith(".zip"):
        return read_zip_container(path)
    raise ValueError(f"unsupported segment format: {path}")


def _read_zip_member(data: bytes, name: str) -> pa.Table:
    logical, codec = _strip_compression(name)
    buf: io.RawIOBase = io.BytesIO(data)
    if codec:
        buf = pa.input_stream(io.BytesIO(data), compression=codec)
    if logical.endswith(".parquet"):
        return pq.read_table(io.BytesIO(data))
    if logical.endswith((".json", ".jsonl", ".ndjson")):
        return pa_json.read_json(buf)
    if logical.endswith(".csv"):
        import pyarrow.csv as pa_csv

        return pa_csv.read_csv(buf)
    raise ValueError(f"unsupported zip member: {name}")


def read_zip_container(path: str) -> ray.data.Dataset:
    """Archive source: every supported member becomes rows. Members are
    distributed via read_binary_files so huge archives parallelize by file."""

    def explode(batch: pa.Table) -> pa.Table:
        out = []
        for row in batch.to_pylist():
            with zipfile.ZipFile(io.BytesIO(row["bytes"])) as z:
                for name in sorted(z.namelist()):
                    if name.endswith("/"):
                        continue
                    try:
                        out.append(_read_zip_member(z.read(name), name))
                    except ValueError:
                        continue  # skip unknown members, like the reference skips keys
        if not out:
            return pa.table({})
        from xgeo_ray.schemas import cast_to, unify

        target = unify(*[t.schema for t in out])
        return pa.concat_tables([cast_to(t, target) for t in out])

    ds = ray.data.read_binary_files(path)
    return ds.map_batches(explode, batch_format="pyarrow", batch_size=1)


def read_segments_dispatch(paths: list[str]) -> list[ray.data.Dataset]:
    return [read_segment(p) for p in paths]


# ---------------------------------------------------- nested-JSON streaming

_NESTED_CHUNK = 1 << 16  # 64 KiB read unit (reference used 16 KiB: geojson.go:8)
_NESTED_HEAD_CAP = 1 << 24  # refuse >16 MiB of pre-records header


def iter_nested_json_records(path: str, records_key: str = "records"):
    """Constant-memory incremental parse of ONE huge JSON document
    ``{..., "<records_key>": [ {...}, {...}, ... ], ...}`` — the direct
    analogue of the reference's streaming FeatureCollection reader
    (/root/reference/io/geojson.go:20-43: fixed read buffer, skip keys
    until the target array, then decode one element at a time). Yields
    dicts; memory is bounded by one record + one read chunk regardless of
    file size. Transparent decompression by suffix as everywhere else.

    Limitation (documented): the key is located textually, so a byte-
    identical '"records_key"' inside an earlier STRING VALUE would
    mis-anchor; keep the target array first-ish in the document (the
    reference's skipToFeatures has the same shallow-scan spirit).
    """
    import codecs
    import json

    logical, codec = _strip_compression(path)
    dec = json.JSONDecoder()
    # incremental decoder: a multi-byte UTF-8 character may straddle a
    # read-chunk boundary — a per-chunk bytes.decode would raise there
    utf8 = codecs.getincrementaldecoder("utf-8")()
    needle = f'"{records_key}"'
    with pa.input_stream(path, compression=codec) as f:
        buf = ""
        while True:
            chunk = f.read(_NESTED_CHUNK)
            if not chunk:
                raise ValueError(f"key {records_key!r} not found in {path}")
            buf += utf8.decode(chunk)
            i = buf.find(needle)
            if i >= 0:
                j = buf.find("[", i + len(needle))
                if j >= 0:
                    buf = buf[j + 1 :]
                    break
                buf = buf[i:]  # key seen, '[' not yet — keep from the key
            else:
                buf = buf[-(len(needle) - 1) :]  # keep a possible prefix
            if len(buf) > _NESTED_HEAD_CAP:
                raise ValueError("records array not found within header cap")
        while True:
            buf = buf.lstrip()
            while buf[:1] == ",":
                buf = buf[1:].lstrip()
            if buf[:1] == "]":
                return
            try:
                obj, end = dec.raw_decode(buf)
            except json.JSONDecodeError:
                chunk = f.read(_NESTED_CHUNK)
                if not chunk:
                    raise
                buf += utf8.decode(chunk)
                continue
            yield obj
            buf = buf[end:]


def _nested_json_batches(
    path: str, records_key: str = "records", batch_rows: int = 8192
):
    """Arrow-batch generator over iter_nested_json_records."""
    rows: list[dict] = []
    for obj in iter_nested_json_records(path, records_key):
        rows.append(obj)
        if len(rows) >= batch_rows:
            yield pa.Table.from_pylist(rows)
            rows = []
    if rows:
        yield pa.Table.from_pylist(rows)


def read_nested_json(
    path: str, records_key: str = "records", batch_rows: int = 8192
) -> ray.data.Dataset:
    """Dataset over one giant nested-JSON document, streamed in bounded
    Arrow blocks by a single read task (a lone JSON array is not
    splittable without parsing — exactly the reference's single-reader
    model, generalized to blocks with backpressure)."""
    from ray.data.block import BlockMetadata
    from ray.data.datasource import Datasource, ReadTask

    class _NestedJson(Datasource):
        def estimate_inmemory_data_size(self):
            return None

        def get_read_tasks(self, parallelism: int):
            meta = BlockMetadata(
                num_rows=None,
                size_bytes=None,
                input_files=[path],
                exec_stats=None,
            )

            def _read():
                yield from _nested_json_batches(path, records_key, batch_rows)

            return [ReadTask(_read, meta)]

        def get_name(self):
            return "NestedJson"

    return ray.data.read_datasource(_NestedJson())


def _sniff_nested_json(path: str, codec: str | None) -> bool:
    """True when a .json file is one big object (stream it) rather than
    JSON-lines (whose first line is a complete record).

    A COMPACT single-line nested document ('{"records": [...]}' with no
    internal newlines — the common json.dump output) also has a first
    line that parses as complete JSON, so a parse success alone does not
    mean JSONL. But the wrapper-object inspection applies ONLY to
    single-document files: an ordinary JSONL record may itself hold a
    list-of-structs field (a transcript row with a `messages` array),
    so any content after a complete first line means JSON-lines.

    The head is read until the FIRST NEWLINE (not a fixed byte cap):
    a JSONL record larger than any fixed cap — a transcript row with a
    multi-MB `messages` array — would otherwise present a truncated
    first 'line' and misclassify the whole file as one nested doc."""
    chunks: list[bytes] = []
    saw_newline = False
    with pa.input_stream(path, compression=codec) as f:
        while not saw_newline:
            chunk = f.read(1 << 20)
            if not chunk:
                break
            chunks.append(chunk)
            saw_newline = b"\n" in chunk
        if saw_newline:
            # probe past the newline so `rest` is non-empty whenever
            # the file actually continues (the newline may have been
            # the final byte of the last chunk read)
            more = f.read(4096)
            if more:
                chunks.append(more)
    head = b"".join(chunks).decode("utf-8", errors="replace")
    stripped = head.lstrip()
    if not stripped.startswith("{"):
        return False
    first_line, _, rest = stripped.partition("\n")
    first_line = first_line.rstrip()
    if not first_line.endswith("}"):
        # no newline found: at EOF this is genuinely one big (pretty-
        # printed or fragmentary) object; otherwise unreachable since
        # we read until a newline or EOF above
        return True
    import json

    try:
        obj = json.loads(first_line)
    except json.JSONDecodeError:
        return True  # truncated/fragment: one big single-line object
    if rest.strip():
        return False  # complete record on line 1 + more lines = JSONL
    # single-document file: nested iff it wraps a record array
    return isinstance(obj, dict) and any(
        isinstance(v, list) and v and all(isinstance(x, dict) for x in v)
        for v in obj.values()
    )


def segment_schema(path: str) -> pa.Schema:
    """Segment schema from metadata only: Parquet footer, or a bounded
    head-sample parse for JSON (the analogue of the reference's 16 KiB
    streaming parse buffer, /root/reference/io/geojson.go:8)."""
    logical, codec = _strip_compression(path)
    if logical.endswith(".parquet"):
        return pq.read_schema(path)
    if logical.endswith((".json", ".jsonl", ".ndjson")):
        if logical.endswith(".json") and _sniff_nested_json(path, codec):
            for batch in _nested_json_batches(path, batch_rows=256):
                return batch.schema
            raise ValueError(f"empty nested-JSON segment: {path}")
        with pa.input_stream(path, compression=codec) as f:
            head = f.read(256 * 1024)
        head = head[: head.rfind(b"\n") + 1] or head
        return pa_json.read_json(io.BytesIO(head)).schema
    if logical.endswith(".csv"):
        import pyarrow.csv as pa_csv

        with pa.input_stream(path, compression=codec) as f:
            head = f.read(256 * 1024)
        head = head[: head.rfind(b"\n") + 1] or head
        return pa_csv.read_csv(io.BytesIO(head)).schema
    if logical.endswith(".zip"):
        with zipfile.ZipFile(path) as z:
            for name in sorted(z.namelist()):
                if name.endswith("/"):
                    continue
                try:
                    return _read_zip_member(z.read(name), name).schema
                except ValueError:
                    continue
    raise ValueError(f"unsupported segment format: {path}")


def segment_seq_min(path: str) -> int:
    """Smallest ``seq`` in a WAL segment from Parquet row-group
    statistics alone (-1 when unknown: non-parquet formats, absent
    stats, or no seq column). This is the epoch's TRUE stream start —
    per-file row minima understate coverage because the map-side
    pre-collapse absorbs superseded rows — and feeds the consistent-cut
    math in ``ingest.group_snapshot_plan``."""
    logical, _codec = _strip_compression(path)
    if not logical.endswith(".parquet"):
        return -1
    try:
        pf = pq.ParquetFile(path)
    except Exception:
        return -1
    if "seq" not in pf.schema_arrow.names or pf.metadata.num_row_groups == 0:
        return -1
    # Statistics are indexed by PHYSICAL LEAF column, not Arrow schema
    # position — a multi-leaf column (struct, list<struct>) before `seq`
    # shifts every later index, so positional lookup would read another
    # column's stats. Match the leaf by path_in_schema instead.
    ci = None
    for i in range(pf.metadata.num_columns):
        if pf.metadata.row_group(0).column(i).path_in_schema == "seq":
            ci = i
            break
    if ci is None:
        return -1
    lo = None
    for g in range(pf.metadata.num_row_groups):
        st = pf.metadata.row_group(g).column(ci).statistics
        if st is None or not st.has_min_max:
            return -1
        lo = st.min if lo is None else min(lo, st.min)
    return int(lo) if lo is not None else -1


def segment_row_count(path: str) -> int:
    """Exact row count from cheap metadata where possible (Parquet footer /
    JSONL line count); full member reads only for zip containers."""
    logical, codec = _strip_compression(path)
    if logical.endswith(".parquet"):
        return pq.read_metadata(path).num_rows
    if logical.endswith((".json", ".jsonl", ".ndjson")):
        if logical.endswith(".json") and _sniff_nested_json(path, codec):
            return sum(1 for _ in iter_nested_json_records(path))
        return _count_lines(path, codec)
    if logical.endswith(".csv"):
        return max(0, _count_lines(path, codec) - 1)  # header row
    if logical.endswith(".zip"):
        total = 0
        with zipfile.ZipFile(path) as z:
            for name in sorted(z.namelist()):
                if name.endswith("/"):
                    continue
                try:
                    total += _read_zip_member(z.read(name), name).num_rows
                except ValueError:
                    continue
        return total
    raise ValueError(f"unsupported segment format: {path}")


def _count_lines(path: str, codec: str | None) -> int:
    """Line count that tolerates a missing trailing newline (a final
    unterminated record is still a record)."""
    n, last = 0, b"\n"
    with pa.input_stream(path, compression=codec) as f:
        while chunk := f.read(1 << 20):
            n += chunk.count(b"\n")
            last = chunk[-1:]
    return n + (0 if last == b"\n" else 1)


def write_segment_jsonl(table: pa.Table, path: str) -> str:
    """JSON-lines sink (the reference's only sink,
    /root/reference/cmd/xgeo/main.go:57-61), with optional gzip by suffix."""
    import gzip
    import json

    logical, codec = _strip_compression(path)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    # bytes have no JSON form: base64 binary columns (default=str would
    # write the Python repr — silent corruption)
    bin_cols = [
        f.name
        for f in table.schema
        if pa.types.is_binary(f.type)
        or pa.types.is_large_binary(f.type)
        or pa.types.is_fixed_size_binary(f.type)
    ]
    if bin_cols and table.num_rows:
        import polars as pl

        table = pl.from_arrow(table).with_columns(
            [pl.col(c).bin.encode("base64") for c in bin_cols]
        ).to_arrow()
    rows = table.to_pylist()
    raw = "\n".join(json.dumps(r, default=str) for r in rows) + "\n"
    if codec == "gzip":
        with gzip.open(path, "wt") as f:
            f.write(raw)
    else:
        with open(path, "w") as f:
            f.write(raw)
    return path


def read_segment_table(path: str) -> pa.Table:
    """Eager whole-segment read to one Arrow table (used by the radix
    exchange for non-splittable formats; Parquet segments are read by
    row-group chunk instead)."""
    logical, codec = _strip_compression(path)
    if logical.endswith(".parquet"):
        return pq.read_table(path, use_threads=False)
    if logical.endswith((".json", ".jsonl", ".ndjson")):
        if logical.endswith(".json") and _sniff_nested_json(path, codec):
            from xgeo_ray.schemas import cast_to, unify

            batches = list(_nested_json_batches(path))
            if not batches:
                return pa.table({})
            target = unify(*[b.schema for b in batches])
            return pa.concat_tables([cast_to(b, target) for b in batches])
        with pa.input_stream(path, compression=codec) as f:
            return pa_json.read_json(f)
    if logical.endswith(".csv"):
        import pyarrow.csv as pa_csv

        with pa.input_stream(path, compression=codec) as f:
            return pa_csv.read_csv(f)
    if logical.endswith(".zip"):
        out = []
        with zipfile.ZipFile(path) as z:
            for name in sorted(z.namelist()):
                if name.endswith("/"):
                    continue
                try:
                    out.append(_read_zip_member(z.read(name), name))
                except ValueError:
                    continue
        from xgeo_ray.schemas import cast_to, unify

        target = unify(*[t.schema for t in out])
        return pa.concat_tables([cast_to(t, target) for t in out])
    raise ValueError(f"unsupported segment format: {path}")


def plan_read_chunks(
    paths: list[str], target_rows: int = 500_000
) -> list[tuple[str, list[int] | None]]:
    """Split segment files into independent read chunks: consecutive
    Parquet row-group runs of ~target_rows (parallel in-file reads with
    no coordination), whole-file for non-splittable formats."""
    chunks: list[tuple[str, list[int] | None]] = []
    for p in paths:
        logical, _ = _strip_compression(p)
        if not logical.endswith(".parquet"):
            chunks.append((p, None))
            continue
        md = pq.read_metadata(p)
        run: list[int] = []
        run_rows = 0
        for rg in range(md.num_row_groups):
            run.append(rg)
            run_rows += md.row_group(rg).num_rows
            if run_rows >= target_rows:
                chunks.append((p, run))
                run, run_rows = [], 0
        if run:
            chunks.append((p, run))
    return chunks
