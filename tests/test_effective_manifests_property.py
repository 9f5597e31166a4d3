"""Property tests for DeltaTable.effective_manifests — the restore
semantics kernel. Invariants (no reimplementation of the walk):

1. restore(T) makes the current effective view EQUAL the as-of-T view
   taken just before the restore (the restore contract itself).
2. effective_manifests(as_of=e) == effective_manifests() of the history
   truncated at e (as-of reads are prefix-consistent).
3. Output is ascending by epoch, contains no restore markers, and is a
   subset of the real manifests.
"""

from hypothesis import given, settings
from hypothesis import strategies as st

from xgeo_ray.state.delta_table import DeltaTable
from xgeo_ray.state.manifest import Manifest


def _mk_manifest(epoch: int, kind: str, target: int = -1) -> Manifest:
    return Manifest(
        epoch=epoch,
        kind=kind,
        segments=[],
        schema_version=0,
        schema_fingerprint="",
        schema_fields=[],
        partitions={},
        totals={},
        replaces_up_to=target,
    )


class _FakeTable(DeltaTable):
    """DeltaTable with an in-memory manifest list (no disk)."""

    def __init__(self, manifests):
        super().__init__(root="/nonexistent", num_partitions=1, num_salts=1)
        self._ms = manifests

    def manifests(self):
        return self._ms


def _history(ops: list[int]) -> list[Manifest]:
    """ops: per step, -1 = data commit, k>=0 = restore to the (k mod n)-th
    earlier epoch (skipped when no earlier epoch exists)."""
    ms: list[Manifest] = []
    for op in ops:
        epoch = len(ms) + 1
        if op < 0 or not ms:
            ms.append(_mk_manifest(epoch, "delta"))
        else:
            target = ms[op % len(ms)].epoch
            ms.append(_mk_manifest(epoch, "restore", target))
    return ms


ops_strategy = st.lists(st.integers(min_value=-1, max_value=20), min_size=1, max_size=24)


@settings(max_examples=300, deadline=None)
@given(ops_strategy)
def test_restore_contract_and_shape(ops):
    ms = _history(ops)
    t = _FakeTable(ms)
    eff = t.effective_manifests()
    # shape invariants
    epochs = [m.epoch for m in eff]
    assert epochs == sorted(epochs)
    assert all(m.kind != "restore" for m in eff)
    assert set(epochs) <= {m.epoch for m in ms}
    # invariant 1: for EVERY restore marker, the view just after it
    # equals the as-of-target view just before it
    for i, m in enumerate(ms):
        if m.kind != "restore":
            continue
        before = _FakeTable(ms[:i])
        after = _FakeTable(ms[: i + 1])
        want = [x.epoch for x in before.effective_manifests(m.replaces_up_to)]
        got = [x.epoch for x in after.effective_manifests()]
        assert got == want, (i, m.replaces_up_to)


@settings(max_examples=300, deadline=None)
@given(ops_strategy, st.integers(min_value=0, max_value=25))
def test_as_of_is_prefix_consistent(ops, e):
    ms = _history(ops)
    t = _FakeTable(ms)
    truncated = _FakeTable([m for m in ms if m.epoch <= e])
    assert [m.epoch for m in t.effective_manifests(e)] == [
        m.epoch for m in truncated.effective_manifests()
    ]
