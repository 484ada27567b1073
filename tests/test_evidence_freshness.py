"""Evidence-freshness guard (round-7 verdict item #8).

The driver hash-verifies only the first 50 registered queries per round, so
window rotation is what keeps every query's driver evidence fresh.  This
test turns that discipline into a pinned invariant: computed from the
committed CORRECTNESS_r0*.json artifacts, every registered query must
either have a driver hash newer than 4 rounds old, or sit in the CURRENT
``DRIVER_WINDOW`` (i.e. it gets re-hashed this round).

If this test fails, the rotation plan at the top of ``queries/__init__.py``
missed a stale query — add it to the window.
"""

from __future__ import annotations

import glob
import json
import os
import re

from dask_expr_rapids_spark.queries import DRIVER_WINDOW, REGISTRY

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MAX_AGE_ROUNDS = 4


def _hash_history() -> tuple[dict[str, int], int]:
    newest: dict[str, int] = {}
    latest_round = 0
    for f in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.match(r"CORRECTNESS_r(\d+)\.json$", os.path.basename(f))
        if not m:
            continue
        rnd = int(m.group(1))
        latest_round = max(latest_round, rnd)
        with open(f) as fh:
            data = json.load(fh)
        for name, row in data.items():
            if isinstance(row, dict) and row.get("hash_match"):
                newest[name] = max(newest.get(name, 0), rnd)
    return newest, latest_round


def test_no_query_evidence_older_than_four_rounds():
    newest, latest_round = _hash_history()
    # The window in this source tree runs in round latest_round + 1.
    current_round = latest_round + 1
    stale = []
    never = []
    for name in REGISTRY:
        if name in DRIVER_WINDOW:
            continue  # refreshed this round
        if name not in newest:
            # registered THIS round (after the last correctness capture):
            # no driver run has had a chance yet — the rotation plan must
            # lead the NEXT window with these, so they only gate capacity
            never.append(name)
        elif current_round - newest[name] > MAX_AGE_ROUNDS:
            stale.append((name, f"age {current_round - newest[name]} rounds "
                                f"(last r{newest[name]})"))
    assert not stale, (
        f"queries with stale driver evidence not covered by the current "
        f"window rotation: {stale}"
    )
    # all never-verified queries must fit one rotation window, or the
    # per-round additions have outrun the driver's verification budget
    assert len(never) <= 50, f"{len(never)} never-verified queries: {never}"


def test_registry_capacity_margin():
    """Round-9 capacity decision (see queries/__init__.py rotation block).

    The freshness guard lets a query wait at most 5 rounds between driver
    hashes, so steady-state refresh capacity is 50 slots x 5 rounds = 250
    queries.  Registry growth is capped at a hard ceiling of 240 (>= 2
    windows' worth of slack below capacity) so a single rotation mistake
    never forces a freshness violation.  If this fails, consolidate
    showcase queries before registering new ones.
    """
    assert len(REGISTRY) <= 240, (
        f"registry has {len(REGISTRY)} queries; ceiling is 240 "
        f"(refresh capacity 250 = 50 slots x 5-round freshness limit)"
    )


def test_window_members_exist_and_history_is_monotonic():
    newest, latest_round = _hash_history()
    assert latest_round >= 7
    # Sanity: history parsing found a substantial verified population.
    assert len(newest) >= 150
