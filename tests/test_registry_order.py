"""Registry emission order is contract surface (VERDICT.md round 1).

The verification driver walks ``queries()`` in dict order under a hard
50-query budget per round (CORRECTNESS_r01/r02 each hold exactly 50 rows).
These tests pin the invariant: every query that still needs a driver row —
never checked, or checked and errored — precedes every query that is
already driver-green (hash-pass or rows-only-by-design) in ANY round's
CORRECTNESS file.
"""

from __future__ import annotations

import json
import re
from pathlib import Path

import pytest

from pkg2_spark.registry import all_oracles, all_queries

_REPO = Path(__file__).resolve().parent.parent


def _driver_green_rounds() -> dict[str, int]:
    # Deliberately re-implements the protocol (rather than importing
    # registry.green_last_round) so a bug in the registry's reading of the
    # CORRECTNESS files trips this test instead of hiding inside it.
    green: dict[str, int] = {}
    for path in sorted(_REPO.glob("CORRECTNESS_r*.json")):
        rnd = int(re.search(r"_r(\d+)", path.name).group(1))
        for name, row in json.loads(path.read_text()).items():
            if row.get("hash_match") or row.get("err") == "no_oracle":
                green[name] = rnd
            elif row.get("err") or row.get("hash_match") is False:
                # A later error OR hash mismatch invalidates an earlier green
                # row: the query must re-earn its row at the head of the order.
                green.pop(name, None)
    return green


def _driver_green() -> set[str]:
    return set(_driver_green_rounds())


def test_order_covers_registry_exactly_once():
    order = list(all_queries())
    assert len(order) == len(set(order))
    import pkg2_spark.queries  # noqa: F401
    from pkg2_spark.registry import QUERIES

    assert set(order) == set(QUERIES)


def test_unverified_queries_precede_driver_green_ones():
    green = _driver_green()
    order = list(all_queries())
    needs_row = [n for n in order if n not in green]
    if not needs_row:
        pytest.skip("every query is driver-green; precedence is moot")
    first_green = min(order.index(n) for n in green)
    worst = max(order.index(n) for n in needs_row)
    assert worst < first_green, (
        f"unverified query {order[worst]} sits after driver-green "
        f"{order[first_green]}"
    )


def test_green_queries_rotate_stalest_first():
    # Freshness rotation (VERDICT.md round 4, "Next round" #6): among
    # driver-green queries, ones whose latest green row is OLDER must come
    # first, so the driver's 50-slot budget re-verifies stale greens instead
    # of re-checking the same head forever.
    rounds = _driver_green_rounds()
    order = list(all_queries())
    green_in_order = [rounds[n] for n in order if n in rounds]
    assert green_in_order == sorted(green_in_order), (
        "driver-green queries are not ordered stalest-round-first"
    )


def test_queries_and_oracles_agree_on_order():
    q = list(all_queries())
    o = list(all_oracles())
    assert o == [n for n in q if n in set(o)]
