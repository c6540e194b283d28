"""Every queries() entry that declares an oracle must match DuckDB exactly.

This is the local twin of the driver's CORRECTNESS gate. Runs at sf0.001 by
default; set SPARK_GRAFT_PARITY_SF=/root/testdata/sf0.01 to run the full gate
locally.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from tests.oracle import compare, register_duck_views

PARITY_SF = os.environ.get("SPARK_GRAFT_PARITY_SF", "/root/testdata/sf0.001")

_QUERIES = entrymod.queries()
_ORACLE = entrymod.oracle_sql()


@pytest.fixture(scope="module")
def duck_with_views(duck):
    register_duck_views(duck, PARITY_SF)
    return duck


def test_oracle_keys_subset_of_queries():
    missing = set(_ORACLE) - set(_QUERIES)
    assert not missing, f"oracle_sql keys without queries(): {missing}"


def test_unchecked_queries_fit_driver_sample_window():
    """The driver verifies the FIRST 50 registry entries per round;
    _registries() enumerates never-driver-checked queries before the
    r01/r02-green ones so every unchecked operator gets a CORRECTNESS row
    (VERDICT r2 #1). Adding queries must not push any unchecked entry past
    position 50 — that silently re-creates the verification backlog."""
    names = list(_QUERIES)
    front = [k for k in names if k not in entrymod._LAST_VERIFIED]
    over = [k for k in front if names.index(k) >= 50]
    assert not over, (
        f"never-driver-checked queries outside the first-50 sample window: "
        f"{over} (front block {len(front)}/50)"
    )


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns  # stable schema


@pytest.mark.parametrize("name", sorted(_ORACLE))
def test_parity(name, spark, duck_with_views):
    df = _QUERIES[name](spark, PARITY_SF)
    compare(df, duck_with_views, _ORACLE[name], name=name)


def test_every_query_is_oracle_checked():
    """Since r11 the registry carries ZERO rows-only entries — every query
    has a DuckDB oracle twin. Pin that: a new query landing without an
    ORACLE entry silently downgrades the driver's check for it to
    rows-only, which this guard turns into a visible failure instead.
    (If a future operator genuinely cannot be SQL-expressed, give it a
    pinned-claim ``_checked`` wrapper like the xxhash64/PQ/PCA paths —
    see NOTES r11 — rather than re-opening the rows-only class.)"""
    missing = sorted(set(_QUERIES) - set(_ORACLE))
    assert not missing, f"queries without an oracle twin: {missing}"


def test_exactness_preconditions_hold_in_testdata(duck):
    """Two wave-2 TPC-H rewrites decide boundary rows in exact integer /
    decimal space, which is only equivalent to the oracle's textbook form
    if the data really has the advertised shape (relational.py:458,551):

    - small_quantity_part_revenue compares `5*qty*cnt < sum_qty` with
      qty CAST to bigint — Spark truncates double→bigint while DuckDB
      rounds, so a FRACTIONAL l_quantity would diverge cross-engine;
    - wealthy_idle_customers casts c_acctbal to DECIMAL(12,2) — a balance
      with >2 dp would be quantized differently than DuckDB's double AVG.

    Both hold in the driver's synthetic TPC-H data at every SF (probed
    0.001/0.01/0.1 in r11). Pin them so a testdata regeneration that
    breaks either fails HERE, not as an opaque hash mismatch."""
    frac_qty = duck.sql(
        f"SELECT count(*) FROM '{PARITY_SF}/lineitem.parquet' "
        "WHERE l_quantity <> floor(l_quantity)"
    ).fetchone()[0]
    assert frac_qty == 0, f"{frac_qty} fractional l_quantity rows"
    deep_bal = duck.sql(
        f"SELECT count(*) FROM '{PARITY_SF}/customer.parquet' "
        "WHERE round(c_acctbal, 2) <> c_acctbal"
    ).fetchone()[0]
    assert deep_bal == 0, f"{deep_bal} customers with >2dp c_acctbal"
