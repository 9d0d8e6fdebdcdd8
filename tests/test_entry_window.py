"""Pin the driver-verification window math in ``__spark_entry__``.

The driver verifies the FIRST 50 ``queries()`` entries per round, so
an oversized ``_VERIFY_FIRST`` silently costs its tail a verdict (the
round-2 off-by-one: 51 entries dropped x17 from the window).  These
tests make the window arithmetic a hard invariant instead of a
convention.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import __spark_entry__ as entry  # noqa: E402
from bi_etl_and_integration_spark.queries import (  # noqa: E402
    ORACLE, QUERIES)

WINDOW = 50


def test_verify_first_is_exactly_one_window():
    assert len(entry._VERIFY_FIRST) == WINDOW, (
        f"_VERIFY_FIRST has {len(entry._VERIFY_FIRST)} entries for a "
        f"{WINDOW}-entry driver window — the overflow silently loses "
        f"its verdict (the round-2 x17 regression)")


def test_verify_first_names_exist_and_are_unique():
    unknown = [n for n in entry._VERIFY_FIRST if n not in QUERIES]
    assert not unknown, f"unknown names: {unknown}"
    assert len(set(entry._VERIFY_FIRST)) == len(entry._VERIFY_FIRST)


def test_window_prefix_spends_no_slot_on_settled_queries():
    """Every slot in the next window must buy NEW information: a query
    that already holds its strongest verdict (hash-green, or rows-only
    green with no oracle to upgrade to) must not occupy the prefix
    while any pending query waits outside it."""
    green, hashed, _failed = entry._verified_so_far()
    order = entry._ordered()
    window, rest = order[:WINDOW], order[WINDOW:]

    def pending(n):
        return (n not in green) or (n in ORACLE and n not in hashed)

    settled_inside = [n for n in window if not pending(n)]
    pending_outside = [n for n in rest if pending(n)]
    if pending_outside:
        assert not settled_inside, (
            f"window wastes slots on settled {settled_inside} while "
            f"{len(pending_outside)} pending queries wait")


def test_ordered_is_a_permutation_of_queries():
    order = entry._ordered()
    assert sorted(order) == sorted(QUERIES)
    assert set(entry.oracle_sql()) == set(ORACLE)
