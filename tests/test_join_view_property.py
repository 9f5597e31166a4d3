"""Property tests for the join view's pure planning kernels (no Ray)."""

import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from xgeo_ray.pipelines.join_view import DEFAULT_KEYS, _output_schema

# underscore included so pre-suffixed names like "a_r" are generable —
# that's what exercises the duplicate-column fail-fast below
_names = st.lists(
    st.text(alphabet="abcd_r", min_size=1, max_size=4),
    min_size=0,
    max_size=6,
    unique=True,
)


@settings(max_examples=300, deadline=None)
@given(lextra=_names, rextra=_names)
def test_output_schema_collision_rule(lextra, rextra):
    on = DEFAULT_KEYS
    lf = [pa.field("conv_id", pa.string()), pa.field("turn_idx", pa.int64())]
    lf += [pa.field(n, pa.int64()) for n in lextra if n not in [f.name for f in lf]]
    rf = [pa.field("conv_id", pa.string()), pa.field("turn_idx", pa.int64())]
    rf += [pa.field(n, pa.float64()) for n in rextra if n not in [f.name for f in rf]]

    # model the expected output names independently
    lnames = [f.name for f in lf]
    expect = list(lnames)
    for f in rf:
        if f.name in on:
            continue
        expect.append(f.name + "_r" if f.name in set(lnames) else f.name)

    if len(expect) != len(set(expect)):
        # a rename would shadow a real column: must fail fast, never
        # emit a schema with duplicate names
        with pytest.raises(ValueError, match="duplicate column"):
            _output_schema(lf, rf, on, "_r")
        return

    out = _output_schema(lf, rf, on, "_r")
    names = out.names
    # no duplicates ever
    assert len(names) == len(set(names))
    assert names == expect
    # every right non-key field lands either bare or suffixed, type kept
    for f in rf:
        if f.name in on:
            continue
        got = f.name + "_r" if f.name in set(lnames) else f.name
        assert out.field(got).type == f.type
    # key columns appear exactly once, with the left's type
    for k in on:
        assert names.count(k) == 1


def test_output_schema_right_own_suffix_collision():
    """right has both `x` and `x_r`: the rename of right.x would shadow
    right.x_r — fail fast."""
    on = ("conv_id", "turn_idx")
    lf = [
        pa.field("conv_id", pa.string()),
        pa.field("turn_idx", pa.int64()),
        pa.field("x", pa.int64()),
    ]
    rf = [
        pa.field("conv_id", pa.string()),
        pa.field("turn_idx", pa.int64()),
        pa.field("x", pa.float64()),
        pa.field("x_r", pa.float64()),
    ]
    with pytest.raises(ValueError, match="duplicate column"):
        _output_schema(lf, rf, on, "_r")
