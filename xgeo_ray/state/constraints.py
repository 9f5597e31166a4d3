"""Declarative CHECK constraints — table-policy data-quality rules.

The reference panics on any malformed record (/root/reference/cmd/xgeo/
main.go:41-50); this engine already downgrades envelope violations to
counted DLQ quarantine (stages/normalize.py). Constraints extend that
to USER-DECLARED per-column rules, stored in table metadata and
enforced vectorized inside the normalize stage of every ingest epoch:
a violating row is quarantined to the DLQ with ``_reason =
"check:<name>"`` and counted in the manifest's ``totals["invalid"]`` —
never applied, never fatal.

Semantics (SQL CHECK-like):
- Constraints apply to 'I'/'U' events only. 'D' tombstones carry null
  payloads by design and always pass.
- A NULL value passes every rule except ``not_null`` (SQL's
  three-valued CHECK: unknown is not a violation).
- A column missing from a batch is all-null for that batch (so only
  ``not_null`` can fail) — schema evolution keeps working.
- Rules compose per constraint (one named constraint = one column,
  any subset of rules); a row failing several constraints reports the
  first by sorted name.

Spec shape (JSON-serializable, pinned in ``_table.json``)::

    {"score_range": {"col": "score", "min": 0.0, "max": 1.0},
     "role_enum":   {"col": "role", "in": ["user", "assistant"]},
     "text_len":    {"col": "text", "not_null": True, "max_len": 1_000_000},
     "no_ctrl":     {"col": "text", "matches": "^[^\\x00]*$"}}

Rules: ``not_null`` (bool), ``min``/``max`` (inclusive numeric/
temporal bounds), ``in`` (value list), ``min_len``/``max_len``
(utf8 char counts), ``matches`` (RE2 regex, must match somewhere —
anchor with ^...$ for full-match).

Enforcement is prospective (next epoch onward) and gates USER-AUTHORED
writes: the WAL stream, ``apply_changes`` corrections and
``update_where`` images. Exempt: ``bootstrap_base`` /
``run_stream(bootstrap=...)`` base-image loads (trusted state, not
events — quarantining part of an image would silently diverge from the
source) and the rewrite-mode ``rename_column`` (a MECHANICAL re-ingest
of already-applied rows; gating them against a later-declared rule
would lose historic data the prospective contract promised to keep).
For
retroactive auditing of already-applied state (including bootstrapped
rows and rows applied before a rule was declared),
``pipelines.ingest.validate_table`` runs the same kernels distributed
over the current snapshot and returns per-constraint violation counts
without mutating anything.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# engine-managed columns a user rule may never target: op/seq are the
# protocol itself (envelope validation owns them)
_FORBIDDEN_COLS = ("op", "seq")
_RULE_KEYS = ("not_null", "min", "max", "in", "min_len", "max_len", "matches")


def validate_spec(constraints: dict) -> dict:
    """Fail fast on a malformed constraint dict; returns a normalized
    copy (plain JSON types only) safe to pin into table metadata."""
    if not isinstance(constraints, dict):
        raise ValueError("constraints must be {name: {col, rules...}}")
    out: dict[str, dict] = {}
    for name, spec in constraints.items():
        if not isinstance(name, str) or not name:
            raise ValueError(f"constraint name must be a non-empty str: {name!r}")
        if ":" in name:
            raise ValueError(f"constraint name may not contain ':': {name!r}")
        if not isinstance(spec, dict) or "col" not in spec:
            raise ValueError(f"constraint {name!r} needs a 'col' key")
        col = spec["col"]
        if col in _FORBIDDEN_COLS:
            raise ValueError(
                f"constraint {name!r} targets engine column {col!r}; "
                "envelope validation owns op/seq"
            )
        rules = {k: v for k, v in spec.items() if k != "col"}
        unknown = set(rules) - set(_RULE_KEYS)
        if unknown:
            raise ValueError(
                f"constraint {name!r}: unknown rule(s) {sorted(unknown)}; "
                f"supported: {list(_RULE_KEYS)}"
            )
        if not rules:
            raise ValueError(f"constraint {name!r} declares no rules")
        if "in" in rules and (
            not isinstance(rules["in"], list) or not rules["in"]
        ):
            raise ValueError(f"constraint {name!r}: 'in' needs a non-empty list")
        if "matches" in rules:
            # probe the ACTUAL runtime engine (Arrow RE2) at declare
            # time — Python's re accepts perl constructs (lookahead,
            # backrefs) RE2 refuses, and a pattern that only fails in
            # the normalize workers would crash every future epoch.
            # A 1-row null forces the compile without matching anything.
            pc.match_substring_regex(
                pa.array([None], pa.string()), pattern=rules["matches"]
            )
        for k in ("min_len", "max_len"):
            if k in rules and (not isinstance(rules[k], int) or rules[k] < 0):
                raise ValueError(f"constraint {name!r}: {k} must be an int >= 0")
        out[name] = {"col": col, **rules}
    return out


def _rule_fail_mask(column: pa.ChunkedArray | pa.Array, rules: dict):
    """Boolean fail mask for one constraint over one column. NULL
    passes everything except not_null."""
    valid = pc.is_valid(column)
    fail = None

    def _or(m):
        # comparisons over NULL slots yield NULL, and Arrow's plain
        # and_/or_ PROPAGATE nulls (not Kleene) — an unfilled null here
        # would swallow a sibling rule's True (e.g. not_null) when
        # OR-ed. Normalize every rule mask to {True, False} first.
        nonlocal fail
        m = pc.fill_null(m, False)
        fail = m if fail is None else pc.or_(fail, m)

    if rules.get("not_null"):
        _or(pc.invert(valid))
    # every remaining rule only fires on non-null values
    if "min" in rules:
        _or(pc.and_(valid, pc.less(column, rules["min"])))
    if "max" in rules:
        _or(pc.and_(valid, pc.greater(column, rules["max"])))
    if "in" in rules:
        ok = pc.is_in(column, value_set=pa.array(rules["in"]))
        _or(pc.and_(valid, pc.invert(ok)))
    if "min_len" in rules or "max_len" in rules:
        ln = pc.utf8_length(column)
        if "min_len" in rules:
            _or(pc.and_(valid, pc.less(ln, rules["min_len"])))
        if "max_len" in rules:
            _or(pc.and_(valid, pc.greater(ln, rules["max_len"])))
    if "matches" in rules:
        ok = pc.match_substring_regex(column, rules["matches"])
        _or(pc.and_(valid, pc.invert(ok)))
    return fail


def check_mask(
    batch: pa.Table, constraints: dict, exempt_deletes: bool = True
) -> tuple[pa.Array, pa.Array]:
    """Vectorized CHECK evaluation → ``(valid_mask, reason)``.

    ``reason`` is a string array, null where valid, ``"check:<name>"``
    of the FIRST failing constraint (sorted name order) where not.
    ``exempt_deletes``: rows with op == 'D' always pass (stream
    enforcement); pass False for snapshot audits where rows are state,
    not events."""
    n = batch.num_rows
    names = set(batch.column_names)
    checkable = None
    if exempt_deletes and "op" in names:
        # null op (possible when called outside the post-validation
        # normalize path) counts as checkable, not exempt
        checkable = pc.fill_null(
            pc.not_equal(batch.column("op"), "D"), True
        )
    import numpy as np

    valid = pa.array(np.ones(n, dtype=bool))
    reason = pa.nulls(n, pa.string())
    for name in sorted(constraints):
        spec = constraints[name]
        col = spec["col"]
        if col not in names:
            # absent column == all-null: only not_null can fail, and it
            # fails every row — never run typed kernels on a null-typed
            # placeholder (is_in/less would raise on type mismatch)
            if not spec.get("not_null"):
                continue
            fail = pa.array(np.ones(n, dtype=bool))
        else:
            fail = _rule_fail_mask(
                batch.column(col),
                {k: v for k, v in spec.items() if k != "col"},
            )
        if fail is None:
            continue
        if checkable is not None:
            fail = pc.and_(fail, checkable)
        newly = pc.and_(fail, valid)
        reason = pc.if_else(newly, f"check:{name}", reason)
        valid = pc.and_(valid, pc.invert(fail))
    return valid, reason
