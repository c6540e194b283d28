"""Documentation-drift guards: the registry counts COVERAGE.md advertises
must equal what `__spark_entry__` actually exports (the r4 round shipped
stale counts and r5 fixed them by hand — this pins the invariant), and the
freshness bookkeeping must stay consistent with the registry."""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as em

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_coverage_md_counts_match_registry():
    """COVERAGE.md's 'N queries, M with oracle SQL (the R rows-only …)'
    sentence must state the live registry sizes."""
    text = open(os.path.join(REPO, "COVERAGE.md")).read()
    m = re.search(
        r"Registry total: (\d+) queries, (\d+) with oracle SQL \(the (\d+)\b",
        text,
    )
    assert m, "COVERAGE.md registry-total sentence missing or reworded"
    q, o = em.queries(), em.oracle_sql()
    assert set(o) <= set(q), sorted(set(o) - set(q))
    assert (int(m.group(1)), int(m.group(2)), int(m.group(3))) == (
        len(q),
        len(o),
        len(q) - len(o),
    ), f"COVERAGE.md says {m.groups()}, registry is {len(q)}/{len(o)}/{len(q) - len(o)}"


def test_last_verified_names_are_registry_queries():
    """Every name in the driver-freshness map must be a real registry entry
    (a rename or removal would otherwise silently stop its re-checks)."""
    q = em.queries()
    stale = set(em._LAST_VERIFIED) - set(q)
    assert not stale, sorted(stale)


def test_prioritize_orders_stalest_first():
    """The driver samples the FIRST 50 entries: never-verified / rewritten
    queries must enumerate before any green entry, and greens must ascend
    by last-verified round."""
    q = em.queries()
    rounds = [em._LAST_VERIFIED.get(name, 0) for name in q]
    assert rounds == sorted(rounds)
