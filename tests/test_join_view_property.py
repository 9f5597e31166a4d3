"""Property tests for the join view's pure planning kernels (no Ray)."""

import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from xgeo_ray.pipelines.join_view import DEFAULT_KEYS, _output_schema

_names = st.lists(
    st.text(alphabet="abcdefgh", min_size=1, max_size=4),
    min_size=0,
    max_size=6,
    unique=True,
)


@settings(max_examples=200, deadline=None)
@given(lextra=_names, rextra=_names)
def test_output_schema_collision_rule(lextra, rextra):
    on = DEFAULT_KEYS
    lf = [pa.field("conv_id", pa.string()), pa.field("turn_idx", pa.int64())]
    lf += [pa.field(n, pa.int64()) for n in lextra if n not in [f.name for f in lf]]
    rf = [pa.field("conv_id", pa.string()), pa.field("turn_idx", pa.int64())]
    rf += [pa.field(n, pa.float64()) for n in rextra if n not in [f.name for f in rf]]
    out = _output_schema(lf, rf, on, "_r")
    names = out.names
    # no duplicates ever
    assert len(names) == len(set(names))
    # every left field survives under its own name
    for f in lf:
        assert f.name in names
    # every right non-key field lands either bare or suffixed
    lnames = {f.name for f in lf}
    for f in rf:
        if f.name in on:
            continue
        expect = f.name + "_r" if f.name in lnames else f.name
        assert expect in names
        assert out.field(expect).type == f.type
    # key columns appear exactly once, with the left's type
    for k in on:
        assert names.count(k) == 1
