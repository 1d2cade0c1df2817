"""Unpartitioned-window guardrail.

A ``Window.orderBy(...)`` with no ``partitionBy`` moves its whole
input to ONE task — the textbook scale-killer.  Every such site in
the package must operate on a PROVABLY BOUNDED frame (a per-shard
counts table, a top-k result, a resample-period axis, ...) and must
say so in a ``# bounded-frame: <why>`` annotation within the three
preceding lines.  This test fails on any new unannotated site, so the
boundedness argument is written down at the moment the window is —
the round-8 verdict audited these by hand; this makes the audit a
standing invariant instead of a per-round chore.
"""

from __future__ import annotations

import pathlib
import re

PKG = pathlib.Path(__file__).resolve().parent.parent / "tomasz_weight_tracker_spark"


def test_every_unpartitioned_window_is_annotated_bounded():
    offenders = []
    for path in sorted(PKG.rglob("*.py")):
        lines = path.read_text().splitlines()
        for i, line in enumerate(lines):
            if "Window.orderBy(" not in line:
                continue
            context = "\n".join(lines[max(0, i - 3) : i + 1])
            if "bounded-frame:" not in context:
                offenders.append(f"{path.relative_to(PKG.parent)}:{i + 1}")
    assert not offenders, (
        "unpartitioned Window without a '# bounded-frame:' justification "
        f"within 3 lines above: {offenders} — either partition the window "
        "or document why its frame is bounded at any corpus size"
    )


def test_annotations_are_not_stale():
    # Every bounded-frame annotation must still precede a
    # Window.orderBy within 3 lines — a refactor that moves the window
    # away leaves a dangling claim.
    stale = []
    for path in sorted(PKG.rglob("*.py")):
        lines = path.read_text().splitlines()
        for i, line in enumerate(lines):
            if "bounded-frame:" not in line:
                continue
            following = "\n".join(lines[i : i + 4])
            if "Window.orderBy(" not in following:
                stale.append(f"{path.relative_to(PKG.parent)}:{i + 1}")
    assert not stale, f"dangling bounded-frame annotations: {stale}"
