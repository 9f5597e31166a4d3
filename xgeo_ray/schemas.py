"""Arrow schemas for the CDC engine.

The reference is fully schemaless (``map[string]interface{}`` features,
/root/reference/io/interface.go:3-5, io/geojson.go:24-27); our Arrow-native
equivalent is an explicit base schema plus a *union/promotion* rule so that
evolved event streams (added nullable columns, widened integer types) cast
cleanly onto a single table schema — the Arrow-idiomatic analogue of
"any map is a valid feature".
"""

from __future__ import annotations

import pyarrow as pa

# Base lake table (BASELINE.json input_hint). Primary key (conv_id, turn_idx).
TRANSCRIPTS_SCHEMA = pa.schema(
    [
        pa.field("conv_id", pa.string()),
        pa.field("turn_idx", pa.int32()),
        pa.field("role", pa.string()),
        pa.field("text", pa.string()),
        pa.field("tool", pa.string()),
        pa.field("ts", pa.timestamp("us")),
    ]
)

# Change-event envelope (FIXTURES.md §2). ``seq`` is the global WAL offset
# and the exactly-once watermark key; LWW tiebreak is (ts, seq).
CHANGE_EVENTS_SCHEMA = pa.schema(
    [
        pa.field("seq", pa.int64()),
        pa.field("op", pa.string()),  # "I" | "U" | "D"
        pa.field("conv_id", pa.string()),
        pa.field("turn_idx", pa.int32()),
        pa.field("role", pa.string()),
        pa.field("text", pa.string()),
        pa.field("tool", pa.string()),
        pa.field("ts", pa.timestamp("us")),
    ]
)

# Assembled-conversation sink (ingest.sync_assembled): one row per
# conversation, keyed (conv_id, 0); doc is the role-tagged training
# document (large offsets: one conversation can exceed 2 GiB cumulative).
ASSEMBLED_SCHEMA = pa.schema(
    [
        pa.field("conv_id", pa.string()),
        pa.field("turn_idx", pa.int32()),
        pa.field("n_turns", pa.int64()),
        pa.field("doc", pa.large_string()),
        pa.field("ts", pa.timestamp("us")),
    ]
)

KEY_COLUMNS = ["conv_id", "turn_idx"]
ORDER_COLUMNS = ["ts", "seq"]  # last-writer-wins order within a key

# Integer widening lattice for schema evolution (safe casts only).
_INT_WIDTH = {
    pa.int8(): 8,
    pa.int16(): 16,
    pa.int32(): 32,
    pa.int64(): 64,
}


def promote_types(a: pa.DataType, b: pa.DataType) -> pa.DataType:
    """Return the promoted type of two field types, or raise if incompatible.

    Rules: null promotes to anything; equal types stay; signed ints widen to
    the larger width; float32 -> float64; anything else must match exactly.
    """
    if a.equals(b):
        return a
    if pa.types.is_null(a):
        return b
    if pa.types.is_null(b):
        return a
    if a in _INT_WIDTH and b in _INT_WIDTH:
        return a if _INT_WIDTH[a] >= _INT_WIDTH[b] else b
    floats = (pa.float32(), pa.float64())
    if a in floats and b in floats:
        return pa.float64()
    # JSON sources deliver timestamps as ISO strings; the timestamp side
    # wins and cast_to parses the strings (Arrow casts ISO text natively).
    if pa.types.is_timestamp(a) and pa.types.is_string(b):
        return a
    if pa.types.is_timestamp(b) and pa.types.is_string(a):
        return b
    # differing timestamp granularities (e.g. csv-inferred ns vs the
    # table's us): the finer unit wins — lossless in both directions
    if pa.types.is_timestamp(a) and pa.types.is_timestamp(b):
        order = {"s": 0, "ms": 1, "us": 2, "ns": 3}
        return a if order[a.unit] >= order[b.unit] else b
    # struct evolution: union of fields (first-seen order, common field
    # types promoted recursively, new fields nullable) — a tool-call
    # payload can grow sub-fields across segments like top-level columns
    if pa.types.is_struct(a) and pa.types.is_struct(b):
        fields: dict[str, pa.DataType] = {f.name: f.type for f in a}
        for f in b:
            if f.name in fields:
                fields[f.name] = promote_types(fields[f.name], f.type)
            else:
                fields[f.name] = f.type
        return pa.struct([pa.field(n, t) for n, t in fields.items()])
    # lists promote element-wise when both sides are the same list kind
    for is_kind, mk in (
        (pa.types.is_list, pa.list_),
        (pa.types.is_large_list, pa.large_list),
    ):
        if is_kind(a) and is_kind(b):
            return mk(promote_types(a.value_type, b.value_type))
    raise TypeError(f"cannot promote {a} and {b}")


def unify(*schemas: pa.Schema) -> pa.Schema:
    """Union schema: all field names, types promoted; new columns nullable.

    Field order: first-seen order across the schemas, so the base table's
    layout is stable and evolved columns append at the end.
    """
    fields: dict[str, pa.DataType] = {}
    for s in schemas:
        for f in s:
            if f.name in fields:
                fields[f.name] = promote_types(fields[f.name], f.type)
            else:
                fields[f.name] = f.type
    return pa.schema([pa.field(n, t) for n, t in fields.items()])


def _cast_array(col, target: pa.DataType):
    """Cast one column to ``target``, recursing through struct / list
    shells Arrow's cast kernel refuses to widen: a struct casts to a
    WIDER struct by null-filling the missing sub-fields (the in-struct
    analogue of cast_to's top-level null-fill), a list by casting its
    values. Null masks are preserved at every level."""
    if col.type.equals(target):
        return col
    try:
        return col.cast(target)
    except (pa.ArrowInvalid, pa.ArrowNotImplementedError, pa.ArrowTypeError):
        pass
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_struct(col.type) and pa.types.is_struct(target):
        have = {f.name: i for i, f in enumerate(col.type)}
        n = len(col)
        arrays = []
        for f in target:
            if f.name in have:
                arrays.append(_cast_array(col.field(have[f.name]), f.type))
            else:
                arrays.append(pa.nulls(n, f.type))
        return pa.StructArray.from_arrays(
            arrays,
            fields=list(target),
            mask=col.is_null() if col.null_count else None,
        )
    if (
        pa.types.is_list(col.type) or pa.types.is_large_list(col.type)
    ) and (pa.types.is_list(target) or pa.types.is_large_list(target)):
        values = _cast_array(col.values, target.value_type)
        cls = (
            pa.LargeListArray
            if pa.types.is_large_list(target)
            else pa.ListArray
        )
        offsets = col.offsets
        if pa.types.is_large_list(target) != pa.types.is_large_list(col.type):
            offsets = offsets.cast(
                pa.int64() if pa.types.is_large_list(target) else pa.int32()
            )
        out = cls.from_arrays(offsets, values)
        # from_arrays(offsets, values) drops the validity bitmap; only
        # rebuild when the source actually had nulls
        if col.null_count:
            out = pa.Array.from_pandas(
                out.to_pandas().where(col.is_valid().to_pandas(), None),
                type=target,
            )
        return out
    return col.cast(target)  # surface Arrow's original error


def cast_to(table: pa.Table, schema: pa.Schema) -> pa.Table:
    """Cast a batch to the union schema: missing columns null-filled, int
    widening applied, column order normalized (structs widen
    recursively — see ``_cast_array``). Extra columns in ``table`` that
    the schema lacks are an error (unify first)."""
    n = table.num_rows
    cols = []
    names = set(table.column_names)
    for f in schema:
        if f.name in names:
            col = table.column(f.name)
            if not col.type.equals(f.type):
                col = _cast_array(col, f.type)
            cols.append(col)
        else:
            cols.append(pa.nulls(n, f.type))
    extra = names - {f.name for f in schema}
    if extra:
        raise ValueError(f"columns {sorted(extra)} not in target schema")
    return pa.Table.from_arrays(cols, schema=schema)


def aliased_read_columns(
    file_names: list[str] | set[str],
    want: list[str],
    aliases: dict[str, str] | None,
) -> list[str]:
    """Physical column list for a pruned parquet read of one table file:
    each LOGICAL name in ``want`` resolves to whichever of its physical
    spellings the file actually carries — the file's own (post-rename)
    name first, else any retired old name that maps to it through
    ``aliases`` (``DeltaTable.column_aliases``, physical->logical).
    Columns the file has under neither spelling are omitted (cast_to
    null-fills them). With no aliases this is exactly the ubiquitous
    ``[c for c in want if c in file_names]`` projection."""
    fn = set(file_names)
    if not aliases:
        return [c for c in want if c in fn]
    by_logical: dict[str, list[str]] = {}
    for old, new in aliases.items():
        by_logical.setdefault(new, []).append(old)
    out = []
    for c in want:
        if c in fn:
            out.append(c)
            continue
        for old in by_logical.get(c, ()):
            if old in fn:
                out.append(old)
                break
    return out


def apply_aliases(t: pa.Table, aliases: dict[str, str] | None) -> pa.Table:
    """Rename any physical (pre-rename) column names in ``t`` to their
    logical names — zero-copy metadata on the table. Call right after
    reading a table-owned parquet file, before ``cast_to``. A file that
    (defensively) carries BOTH spellings keeps the logical one and
    drops the retired one — renaming would create a duplicate name."""
    if not aliases:
        return t
    names = t.column_names
    hit = [n for n in names if n in aliases]
    if not hit:
        return t
    both = [n for n in hit if aliases[n] in names]
    if both:
        t = t.drop_columns(both)
        names = t.column_names
    return t.rename_columns([aliases.get(n, n) for n in names])


def schema_fingerprint(schema: pa.Schema) -> str:
    """Stable short fingerprint of a schema for manifests."""
    import hashlib

    desc = ";".join(f"{f.name}:{f.type}" for f in schema)
    return hashlib.sha256(desc.encode()).hexdigest()[:16]
