"""Invariants of scripts/audit_sf01.py's exclusion list (r10).

The cross-scale audit's claim is only as honest as its exclusion set:
every excluded name must be a real, ORACLE-CHECKED registry query
(excluding an oracle-less or nonexistent name would silently shrink
nothing while reading as if it did), and included + excluded must
exactly tile the oracle-checked registry, so a new oracle-checked
query joins the audit automatically unless deliberately excluded.
Pure static checks — no Spark session.
"""

from __future__ import annotations

import importlib.util
import os

from pypgsync_spark.queries import REGISTRY

_SCRIPT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "scripts",
    "audit_sf01.py",
)


def _load_audit_module():
    spec = importlib.util.spec_from_file_location("audit_sf01", _SCRIPT)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_exclusions_are_real_oracle_checked_queries():
    mod = _load_audit_module()
    for name in sorted(mod.QUADRATIC_ORACLES):
        assert name in REGISTRY, f"exclusion names unknown query: {name}"
        assert REGISTRY[name].oracle, (
            f"{name} is oracle-less — excluding it from the oracle audit "
            "is meaningless; drop it from QUADRATIC_ORACLES"
        )


def test_included_plus_excluded_tile_the_oracle_checked_registry():
    mod = _load_audit_module()
    names = set(mod.audit_names())
    oracle_checked = {n for n, s in REGISTRY.items() if s.oracle}
    assert names.isdisjoint(mod.QUADRATIC_ORACLES)
    assert names | mod.QUADRATIC_ORACLES == oracle_checked
