"""Registry emission order is contract surface (VERDICT.md round 1).

The verification driver walks ``queries()`` in dict order under a budget and
stopped after 50 entries in round 1, leaving 78 queries without a hard
correctness row. These tests pin the round-2 ordering: every query the driver
has not yet verified (plus the four whose output encoding changed) precedes
every query that is already driver-green.
"""

from __future__ import annotations

import json
from pathlib import Path

from pkg2_spark.registry import _DRIVER_CHECK_HEAD, all_oracles, all_queries

_R1 = Path(__file__).resolve().parent.parent / "CORRECTNESS_r01.json"


def test_head_names_all_registered():
    names = set(all_queries())
    missing = [n for n in _DRIVER_CHECK_HEAD if n not in names]
    assert not missing, f"head lists unregistered queries: {missing}"
    assert len(_DRIVER_CHECK_HEAD) == len(set(_DRIVER_CHECK_HEAD))


def test_unverified_queries_precede_driver_green_ones():
    r1 = json.loads(_R1.read_text())
    green = {
        k for k, v in r1.items() if v.get("hash_match") or v.get("err") == "no_oracle"
    }
    order = list(all_queries())
    first_green = min(order.index(n) for n in green)
    needs_row = [n for n in order if n not in green]
    worst = max(order.index(n) for n in needs_row)
    assert worst < first_green, (
        f"unverified query {order[worst]} sits after driver-green "
        f"{order[first_green]}"
    )


def test_queries_and_oracles_agree_on_order():
    q = list(all_queries())
    o = list(all_oracles())
    assert o == [n for n in q if n in set(o)]
