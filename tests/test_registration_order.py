"""Gate the driver-window registration order (ADVICE r2: assert with a test,
not comments).

The driver's CORRECTNESS artifact records only the first 50 registered
queries per round, so registration order is load-bearing. These tests pin:
- the first 50 == the explicit ``_DRIVER_WINDOW`` list (round-3 window);
- nothing in the round-3 window except ``docs_dup_clusters`` was already
  checked in rounds 1-2 (the window converts never-checked parity-green
  queries into driver-green rows);
- every window entry carries a DuckDB oracle (hash-checkable, not rows-only);
- positions 51+ start with the round-4 queue of remaining never-checked
  queries.
"""

import json
import pathlib

from transilien_api_etl_spark.plans import REGISTRY
from transilien_api_etl_spark.plans import _DRIVER_WINDOW, _NEXT_WINDOW

REPO = pathlib.Path(__file__).resolve().parents[1]


def _checked_in_prior_rounds() -> set[str]:
    names: set[str] = set()
    for fname in ("CORRECTNESS_r01.json", "CORRECTNESS_r02.json"):
        p = REPO / fname
        if p.exists():
            names |= set(json.loads(p.read_text()))
    return names


def test_first_50_is_the_driver_window():
    assert list(REGISTRY)[:50] == list(_DRIVER_WINDOW)
    assert len(_DRIVER_WINDOW) == 50
    assert len(set(_DRIVER_WINDOW)) == 50


def test_window_is_never_checked_except_dup_clusters():
    prior = _checked_in_prior_rounds()
    if not prior:  # artifacts absent in a fresh checkout — nothing to assert
        return
    overlap = [q for q in _DRIVER_WINDOW if q in prior]
    assert overlap == ["docs_dup_clusters"], overlap


def test_window_is_fully_oracle_backed():
    missing = [q for q in _DRIVER_WINDOW if not REGISTRY[q].oracle]
    assert missing == [], missing


def test_next_window_queues_remaining_unchecked():
    order = list(REGISTRY)
    assert order[50 : 50 + len(_NEXT_WINDOW)] == list(_NEXT_WINDOW)
    prior = _checked_in_prior_rounds()
    if prior:
        overlap = [q for q in _NEXT_WINDOW if q in prior]
        assert overlap == [], overlap
    # window + queue + previously-checked == the whole registry
    assert len(set(_DRIVER_WINDOW) | set(_NEXT_WINDOW)) == 92
    assert len(REGISTRY) >= 191
