"""Opt-in branch observation for count-gated kernels.

Every count-gated single-task finisher in this repo keeps its
distributed join/loop form as the else-branch — the 100 TB path
(SURVEY §2.12 discipline; forced-equivalence-tested in
tests/test_algorithms.py::test_count_gated_branches_agree). The
scale probe (scripts/scale_probe.py) needs to OBSERVE which branch a
query actually took at a given data size, not infer it from the gate
constants, so each gate site calls :func:`record_branch` with the
decision it just made. Disabled by default: the call is a dict
lookup + early return, nothing is recorded in normal operation, and
the driver contract never sees this module.
"""

from __future__ import annotations

_BRANCHES: dict[str, str] = {}
_ENABLED = False

# When True, every count-gate routes to its distributed else-branch
# regardless of the measured counts — the scale probe uses this to
# time the 100 TB path on data small enough that the gates would
# otherwise take the single-task kernel. Never set in production;
# result equivalence between the branches is separately enforced by
# tests/test_algorithms.py::test_count_gated_branches_agree.
FORCE_DISTRIBUTED = False


def gate(name: str, take_kernel: bool) -> bool:
    """Single choke point for every count-gate decision: applies the
    probe override, records the branch taken, and returns whether the
    single-task kernel should run."""
    take = take_kernel and not FORCE_DISTRIBUTED
    record_branch(name, "kernel" if take else "distributed")
    return take


def enable() -> None:
    """Start recording gate decisions (clears prior observations)."""
    global _ENABLED
    _ENABLED = True
    _BRANCHES.clear()


def disable() -> None:
    global _ENABLED
    _ENABLED = False


def record_branch(gate: str, branch: str) -> None:
    """Called at each count-gate site with ``branch`` in
    {"kernel", "distributed"}. No-op unless :func:`enable` ran."""
    if _ENABLED:
        _BRANCHES[gate] = branch


def branches() -> dict[str, str]:
    """Observations since the last :func:`enable` call."""
    return dict(_BRANCHES)
