"""Gate the driver-window registration order (ADVICE r2: assert with a test,
not comments).

The driver's CORRECTNESS artifact records only the first 50 registered
queries per round, so registration order is load-bearing. These tests pin:
- the rotation INVARIANT: no green-checked query registers before a
  never-checked one (so each round's 50-entry cap converts fresh credit);
- the concrete round-3 window (while exactly r01/r02 artifacts exist):
  first 50 == ``_DRIVER_WINDOW`` — 49 never-checked + the fixed
  ``docs_dup_clusters``;
- every window entry carries a DuckDB oracle (hash-checkable);
- priority-list hygiene (names exist, no dups, full coverage counts).
"""

import json
import pathlib

from transilien_api_etl_spark.plans import (
    _DRIVER_WINDOW,
    _NEXT_WINDOW,
    _green_checked,
    REGISTRY,
)

REPO = pathlib.Path(__file__).resolve().parents[1]


def _artifacts() -> list[str]:
    return sorted(p.name for p in REPO.glob("CORRECTNESS_r*.json"))


def test_rotation_invariant_unchecked_first():
    """Every never-green query must register before every green one."""
    green = _green_checked()
    order = list(REGISTRY)
    seen_green = False
    for name in order:
        if name in green:
            seen_green = True
        else:
            assert not seen_green, (
                f"unchecked query {name!r} registers after a green-checked "
                "one — the driver's 50-cap would waste a slot"
            )


def test_round3_window_is_the_driver_window():
    if _artifacts() != ["CORRECTNESS_r01.json", "CORRECTNESS_r02.json"]:
        return  # later round: the rotation invariant above is the contract
    assert list(REGISTRY)[:50] == list(_DRIVER_WINDOW)
    prior: set[str] = set()
    for fname in _artifacts():
        prior |= set(json.loads((REPO / fname).read_text()))
    overlap = [q for q in _DRIVER_WINDOW if q in prior]
    assert overlap == ["docs_dup_clusters"], overlap


def test_priority_lists_are_well_formed():
    names = [*_DRIVER_WINDOW, *_NEXT_WINDOW]
    assert len(_DRIVER_WINDOW) == 50
    assert len(set(names)) == len(names)
    missing = [n for n in names if n not in REGISTRY]
    assert missing == [], missing
    assert len(set(names)) == 95
    assert len(REGISTRY) >= 193


def test_window_is_fully_oracle_backed():
    missing = [q for q in _DRIVER_WINDOW if not REGISTRY[q].oracle]
    assert missing == [], missing


def test_first_50_all_have_oracles_whatever_the_round():
    """The 50 slots the driver checks must all be hash-checkable — a
    rows-only query in the window wastes a slot on a weak check."""
    first50 = list(REGISTRY)[:50]
    weak = [q for q in first50 if not REGISTRY[q].oracle]
    assert weak == [], weak


def test_green_half_reverifies_stalest_first():
    """VERDICT r4 task 7: once every query is green, the driver's 50-cap
    must land on the queries whose last green is OLDEST — the green half
    of the registration order is sorted by last-green round ascending."""
    from transilien_api_etl_spark.plans import _green_rounds

    greens = _green_rounds()
    rounds = [greens[n] for n in REGISTRY if n in greens]
    assert rounds == sorted(rounds), (
        "green-checked queries must register in ascending last-green-round "
        "order so each round re-verifies the stalest window"
    )


def test_green_checked_latest_round_wins(tmp_path):
    """ADVICE r3: a query that regresses AFTER once passing must be
    un-greened (most recent CORRECTNESS record wins), so it rotates back
    into the driver's window instead of hiding in the green back half."""
    import json

    from transilien_api_etl_spark.plans import _green_checked

    (tmp_path / "CORRECTNESS_r01.json").write_text(json.dumps({
        "stays_green": {"hash_match": True, "err": None},
        "regressed": {"hash_match": True, "err": None},
        "recovered": {"hash_match": False, "err": "boom"},
    }))
    (tmp_path / "CORRECTNESS_r02.json").write_text(json.dumps({
        "regressed": {"hash_match": False, "err": "boom"},
        "recovered": {"hash_match": True, "err": None},
    }))
    green = _green_checked(repo=str(tmp_path))
    assert green == {"stays_green", "recovered"}
