"""Registry-rotation freshness guard (VERDICT r5 task #7).

The grading driver samples the FIRST 50 registry entries each round,
so any entry not sampled last round MUST appear in the current head —
otherwise it goes two rounds without a fresh correctness row. This
test turns the recurring rotation task into a mechanical invariant:
it parses the previous round's CORRECTNESS_r*.json files and fails if
any entry missing from the latest one sits past position 50.
"""

from __future__ import annotations

import json
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SAMPLE = 50


def _latest_correctness() -> tuple[str, set[str]]:
    files = sorted(
        f for f in os.listdir(REPO)
        if re.fullmatch(r"CORRECTNESS_r\d+\.json", f)
    )
    assert files, "no CORRECTNESS_r*.json present"
    latest = files[-1]
    with open(os.path.join(REPO, latest)) as fh:
        return latest, set(json.load(fh).keys())


def test_unsampled_entries_lead_the_registry():
    from idzebra_spark.entry_queries import REGISTRY

    latest, sampled = _latest_correctness()
    order = list(REGISTRY)
    head = set(order[:SAMPLE])
    stale = [name for name in order if name not in sampled]
    laggards = [name for name in stale if name not in head]
    assert not laggards, (
        f"{len(laggards)} entries were not sampled in {latest} and are "
        f"not in the first {SAMPLE} registry positions (would go two "
        f"rounds unchecked): {laggards}")


def test_registry_rotation_preserves_every_entry():
    """Rotation must reorder, never drop or rename."""
    from idzebra_spark.entry_queries import REGISTRY, _R6_HEAD

    assert len(set(_R6_HEAD)) == len(_R6_HEAD)
    assert set(_R6_HEAD) <= set(REGISTRY)
    assert len(REGISTRY) >= 89  # the r5 registry size, monotone
