"""The driver surface is derived from recorded verification history;
these tests pin (a) the history against the CORRECTNESS artifacts in
the repo root — the data cannot drift from the evidence — and (b) the
slot-selection invariants (anchors in, never-verified first,
oldest-green-first, 50-entry cap)."""

from __future__ import annotations

import glob
import json
import os

from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.registry import (
    DRIVER_ANCHORS,
    DRIVER_SLOTS,
    STRUCTURAL_EXCLUDE,
    all_queries,
    driver_queries,
)
from query_open_pipeline_for_crowdstrike_falcon_data_replicator_spark.verification import (
    DRIVER_HISTORY,
    last_green,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _artifact_greens() -> dict[str, set[int]]:
    greens: dict[str, set[int]] = {}
    for f in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r0*.json"))):
        rnd = int(os.path.basename(f).split("_r")[1].split(".")[0])
        for name, row in json.load(open(f)).items():
            if row.get("hash_match"):
                greens.setdefault(name, set()).add(rnd)
    return greens


def test_history_matches_artifacts_exactly():
    """Every (entry, round) in DRIVER_HISTORY must be a green hash row in
    that round's artifact, and vice versa — no invented or forgotten
    verification."""
    greens = _artifact_greens()
    recorded = {n: set(r) for n, r in DRIVER_HISTORY.items()}
    missing = {
        n: sorted(rs - recorded.get(n, set())) for n, rs in greens.items()
        if rs - recorded.get(n, set())
    }
    invented = {
        n: sorted(rs - greens.get(n, set())) for n, rs in recorded.items()
        if rs - greens.get(n, set())
    }
    assert not missing, f"artifact greens absent from DRIVER_HISTORY: {missing}"
    assert invented == {}, f"DRIVER_HISTORY claims unevidenced rounds: {invented}"


def test_history_names_are_registry_entries():
    names = set(all_queries())
    stray = set(DRIVER_HISTORY) - names
    assert not stray, f"history for entries not in the registry: {stray}"


def test_driver_surface_shape():
    dq = list(driver_queries())
    full = all_queries()
    assert len(dq) <= DRIVER_SLOTS
    assert len(set(dq)) == len(dq)
    for a in DRIVER_ANCHORS:
        assert a in dq, f"anchor {a} must hold a slot every round"
    assert not (set(dq) & STRUCTURAL_EXCLUDE)
    # every slotted entry exists in the full registry
    assert set(dq) <= set(full)


def test_driver_surface_is_oldest_green_first():
    """Among non-anchor eligible entries, everyone OUTSIDE the surface
    must have been verified at least as recently as everyone inside —
    the staleness-minimizing property VERDICT r4 #4 asks for."""
    dq = set(driver_queries())
    eligible = [
        n for n in all_queries()
        if n not in STRUCTURAL_EXCLUDE and n not in DRIVER_ANCHORS
    ]
    inside = max((last_green(n) for n in eligible if n in dq), default=-1)
    outside = min((last_green(n) for n in eligible if n not in dq), default=99)
    assert inside <= outside, (
        f"a never/old-verified entry (last green r{outside}) is excluded "
        f"while a fresher one (r{inside}) holds a slot"
    )
    # never-verified entries always get slots
    for n in eligible:
        if last_green(n) == -1:
            assert n in dq, f"never-verified {n} must hold a slot"
