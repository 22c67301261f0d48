"""Driver-contract guards for __spark_entry__.

The driver's correctness gate checks only the FIRST 50 ``queries()``
entries (round-3 lesson: entries 51-58 silently got no CORRECTNESS row).
These tests pin the contract so a future addition cannot reopen the
signal hole.
"""
import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod

DRIVER_GATE_LIMIT = 50


def test_registry_fits_driver_gate():
    qs = entrymod.queries()
    assert len(qs) <= DRIVER_GATE_LIMIT, (
        f"{len(qs)} queries registered but the driver gate checks only the "
        f"first {DRIVER_GATE_LIMIT} — consolidate overlapping entries "
        f"(labelled unions) instead of growing the registry"
    )


def test_every_query_has_an_oracle():
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    assert set(oracles) - set(qs) == set(), "orphan oracle entries"
    missing = [k for k in qs if k not in oracles]
    # every entry currently carries a SQL/golden oracle; a genuinely
    # non-SQL-expressible op may be exempted here EXPLICITLY
    assert missing == [], f"queries without an oracle: {missing}"
