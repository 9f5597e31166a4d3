import pyarrow as pa
import pytest

from xgeo_ray.schemas import cast_to, promote_types, schema_fingerprint, unify


def test_promote_int_widening():
    assert promote_types(pa.int32(), pa.int64()) == pa.int64()
    assert promote_types(pa.int64(), pa.int32()) == pa.int64()
    assert promote_types(pa.float32(), pa.float64()) == pa.float64()
    assert promote_types(pa.null(), pa.string()) == pa.string()
    with pytest.raises(TypeError):
        promote_types(pa.string(), pa.int64())


def test_unify_adds_and_widens():
    a = pa.schema([("x", pa.int32()), ("y", pa.string())])
    b = pa.schema([("x", pa.int64()), ("z", pa.string())])
    u = unify(a, b)
    assert u.names == ["x", "y", "z"]
    assert u.field("x").type == pa.int64()


def test_cast_to_null_fills_missing():
    t = pa.table({"x": pa.array([1, 2], pa.int32())})
    target = pa.schema([("x", pa.int64()), ("y", pa.string())])
    out = cast_to(t, target)
    assert out.schema == target
    assert out.column("y").null_count == 2
    assert out.column("x").to_pylist() == [1, 2]


def test_cast_to_rejects_extra_columns():
    t = pa.table({"x": [1], "q": [2]})
    with pytest.raises(ValueError):
        cast_to(t, pa.schema([("x", pa.int64())]))


def test_fingerprint_stable_and_sensitive():
    a = pa.schema([("x", pa.int32())])
    assert schema_fingerprint(a) == schema_fingerprint(pa.schema([("x", pa.int32())]))
    assert schema_fingerprint(a) != schema_fingerprint(pa.schema([("x", pa.int64())]))
