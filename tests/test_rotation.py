"""Rotation-ledger invariants for the driver's first-WINDOW sampling
(no Spark needed — pure dict mechanics).

The external CORRECTNESS gate hashes only the first WINDOW entries of
queries() each round, so window membership IS the verification status:
these tests make the hand-maintained ledger in __spark_entry__
mechanically honest (ADVICE r04: a changed query silently aging out of
the window would ship driver-unchecked)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod


def _registry_names():
    from ctinexus_spark import dataset_queries, entry_queries

    return list({**entry_queries.QUERIES, **dataset_queries.QUERIES})


def _window_for(rotation, names):
    front = [n for n in rotation if n in names]
    rest = [n for n in names if n not in front]
    return (front + rest)[: entry_mod.WINDOW]


def test_rotation_names_exist():
    names = set(_registry_names())
    for rnd, rotation in entry_mod.ROTATION_HISTORY.items():
        unknown = set(rotation) - names
        assert not unknown, f"{rnd}: rotation names not in registry: {unknown}"


def test_union_coverage_every_query_driver_checked():
    """Every registry query appears in at least one recorded round's
    window — i.e. has (or will get this round) a driver-grade row."""
    names = _registry_names()
    covered = set()
    for rotation in entry_mod.ROTATION_HISTORY.values():
        covered |= set(_window_for(rotation, names))
    missing = set(names) - covered
    assert not missing, f"never inside any round's driver window: {missing}"


def test_changed_queries_inside_current_window():
    """Behavior-changed queries must be driver-checked THIS round, not
    ride on a stale green row."""
    names = _registry_names()
    current = set(_window_for(entry_mod._ROTATE_FIRST, names))
    out = set(entry_mod.CHANGED_THIS_ROUND) - current
    assert not out, f"changed queries outside the current window: {out}"


def test_current_window_matches_queries_order():
    """_rotated() must serve exactly the window the ledger predicts."""
    names = _registry_names()
    served = list(entry_mod.queries())[: entry_mod.WINDOW]
    assert served == _window_for(entry_mod._ROTATE_FIRST, names)


def test_every_query_has_oracle_or_is_known_exception():
    """All registry queries carry a DuckDB twin — since round 5 there
    are no rows-only exceptions (part_pagerank/part_kcore gained
    oracles); a new exception must be added here deliberately."""
    oracles = entry_mod.oracle_sql()
    missing = [n for n in _registry_names() if n not in oracles]
    assert missing == [], f"queries with no oracle twin: {missing}"
