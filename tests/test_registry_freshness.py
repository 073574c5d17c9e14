"""Registry-rotation freshness guard (VERDICT r5 task #7).

The grading driver samples the FIRST 50 registry entries each round
and commits ``CORRECTNESS_r<N>.json`` with the sampled names. The
rotation contract: no entry may go TWO consecutive rounds unsampled.
This test makes that mechanical and self-enforcing without being a
time bomb: it fails when an entry is absent from BOTH of the two most
recent CORRECTNESS files (the debt already exists — the round's
builder forgot to rotate it into the head) and also when an entry
that is one round stale (absent from the latest file only) is not
positioned in the current head-50 **at the moment the latest file is
the one this round's rotation targeted** — detected by the latest
file's sample matching the current head (i.e. the driver has already
sampled this round; the next rotation is the next round's job and is
exactly the two-file rule above).
"""

from __future__ import annotations

import json
import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SAMPLE = 50


def _correctness_files() -> list[tuple[str, set[str]]]:
    files = sorted(
        f for f in os.listdir(REPO)
        if re.fullmatch(r"CORRECTNESS_r\d+\.json", f)
    )
    out = []
    for f in files:
        with open(os.path.join(REPO, f)) as fh:
            out.append((f, set(json.load(fh).keys())))
    return out


def test_no_entry_unsampled_two_consecutive_rounds():
    """Hard invariant: every registry entry appears in at least one of
    the two most recent driver samples."""
    from idzebra_spark.entry_queries import REGISTRY

    files = _correctness_files()
    assert files, "no CORRECTNESS_r*.json present"
    recent = files[-2:]
    sampled_recent = set().union(*(s for _, s in recent))
    twice_stale = [n for n in REGISTRY if n not in sampled_recent]
    assert not twice_stale, (
        f"{len(twice_stale)} entries absent from BOTH "
        f"{[f for f, _ in recent]} — they went two consecutive rounds "
        f"without a driver correctness row; rotate them into the "
        f"first {SAMPLE} registry positions: {twice_stale}")


def test_current_head_covers_last_rounds_gap():
    """Pre-sample check for THIS round: entries the latest sample
    missed must lead the registry so the NEXT sample picks them up.
    Skipped (trivially true) once the latest file already reflects the
    current head — that means the driver has sampled this round and
    the next rotation belongs to the next builder round."""
    from idzebra_spark.entry_queries import REGISTRY

    files = _correctness_files()
    latest_name, latest = files[-1]
    order = list(REGISTRY)
    head = set(order[:SAMPLE])
    if latest <= head:
        # the latest sample IS this head — the driver already consumed
        # this round's rotation; the forward-looking check belongs to
        # the next round's rotation and the two-file rule above keeps
        # it honest if that rotation never happens
        return
    stale = [n for n in order if n not in latest]
    laggards = [n for n in stale if n not in head]
    assert not laggards, (
        f"{len(laggards)} entries were not sampled in {latest_name} "
        f"and are not in the first {SAMPLE} registry positions (they "
        f"would go two rounds unchecked): {laggards}")


def test_registry_rotation_preserves_every_entry():
    """Rotation must reorder, never drop or rename."""
    from idzebra_spark.entry_queries import REGISTRY, _R6_HEAD

    assert len(set(_R6_HEAD)) == len(_R6_HEAD)
    assert set(_R6_HEAD) <= set(REGISTRY)
    assert len(REGISTRY) >= 89  # the r5 registry size, monotone
