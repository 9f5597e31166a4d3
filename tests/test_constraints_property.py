"""Property test for state.constraints.check_mask against an
independent row-at-a-time Python reference: random specs × random
batches must agree on the valid mask AND the first-failing-constraint
reason, including NULL three-valued semantics, delete exemption and
missing columns."""

import math

import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from xgeo_ray.state.constraints import check_mask, validate_spec

_COLS = ("s", "x")  # s: string payload, x: float payload


def _rule_strategy(col):
    if col == "s":
        return st.fixed_dictionaries(
            {},
            optional={
                "not_null": st.just(True),
                "in": st.lists(
                    st.sampled_from(["a", "bb", "ccc", ""]),
                    min_size=1,
                    max_size=3,
                    unique=True,
                ),
                "min_len": st.integers(0, 3),
                "max_len": st.integers(0, 4),
                "matches": st.sampled_from(["^a", "c$", "b"]),
            },
        )
    return st.fixed_dictionaries(
        {},
        optional={
            "not_null": st.just(True),
            "min": st.integers(-2, 2),
            "max": st.integers(-2, 2),
            "in": st.lists(
                st.sampled_from([-1.0, 0.0, 1.5]),
                min_size=1,
                max_size=3,
                unique=True,
            ),
        },
    )


specs = st.dictionaries(
    st.sampled_from(["c1", "c2", "c3"]),
    st.sampled_from(list(_COLS) + ["ghost"]).flatmap(
        lambda col: _rule_strategy("s" if col != "x" else "x").map(
            lambda rules: {"col": col, **rules}
        )
    ),
    min_size=1,
    max_size=3,
).filter(
    lambda d: all(len(v) > 1 for v in d.values())  # at least one rule each
)

rows = st.lists(
    st.tuples(
        st.sampled_from(["I", "U", "D"]),
        st.one_of(st.none(), st.sampled_from(["a", "bb", "ccc", "", "ab"])),
        st.one_of(st.none(), st.sampled_from([-1.0, 0.0, 1.5, 2.5])),
    ),
    min_size=0,
    max_size=12,
)


def _ref_row_fails(value, rules):
    """Reference semantics for ONE constraint on ONE value."""
    if value is None:
        return bool(rules.get("not_null"))
    if "min" in rules and value < rules["min"]:
        return True
    if "max" in rules and value > rules["max"]:
        return True
    if "in" in rules and value not in rules["in"]:
        return True
    if "min_len" in rules and len(value) < rules["min_len"]:
        return True
    if "max_len" in rules and len(value) > rules["max_len"]:
        return True
    if "matches" in rules:
        import re

        if not re.search(rules["matches"], value):
            return True
    return False


@settings(max_examples=200, deadline=None)
@given(spec=specs, data=rows)
def test_check_mask_matches_reference(spec, data):
    spec = validate_spec(spec)
    batch = pa.table(
        {
            "op": pa.array([r[0] for r in data], pa.string()),
            "s": pa.array([r[1] for r in data], pa.string()),
            "x": pa.array([r[2] for r in data], pa.float64()),
        }
    )
    ok, why = check_mask(batch, spec)
    for i, (op, s, x) in enumerate(data):
        want_reason = None
        if op != "D":
            for name in sorted(spec):
                rules = {k: v for k, v in spec[name].items() if k != "col"}
                col = spec[name]["col"]
                value = {"s": s, "x": x}.get(col)  # ghost -> None
                if _ref_row_fails(value, rules):
                    want_reason = f"check:{name}"
                    break
        assert ok[i].as_py() == (want_reason is None), (i, spec, data)
        assert why[i].as_py() == want_reason, (i, spec, data)
