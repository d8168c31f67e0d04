"""The driver hashes only the first 50 registered queries — make the curated
window an invariant, not an accident."""

from __future__ import annotations

from h2outility_spark import workload


def test_window_is_exactly_50_known_queries():
    assert len(workload.CHECKED_WINDOW) == 50
    assert len(set(workload.CHECKED_WINDOW)) == 50
    missing = [n for n in workload.CHECKED_WINDOW if n not in workload.REGISTRY]
    assert not missing, f"window names not registered: {missing}"


def test_registry_leads_with_the_window():
    names = list(workload.registry().keys())
    assert names[:50] == workload.CHECKED_WINDOW


def test_every_registered_query_earns_a_driver_row():
    """Round-4 rotation goal: after this round, every registered query has
    had >=1 driver CORRECTNESS row. Invariant: each query is either in a
    prior round's CORRECTNESS file or in the current window. A new query
    added later must start its life inside the window (or the invariant
    fails loudly here)."""
    import glob
    import json
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    previously = set()
    for p in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
        with open(p) as f:
            previously.update(json.load(f).keys())
    window = set(workload.CHECKED_WINDOW)
    orphans = [n for n in workload.registry() if n not in previously and n not in window]
    assert not orphans, f"queries with no driver evidence path: {orphans}"


def test_window_queries_all_have_oracles_except_nonsql():
    # Every window entry should carry a DuckDB oracle — a window slot spent
    # on a rows-only check is a wasted hard-signal slot.
    allowed_no_oracle: set[str] = set()
    reg = workload.registry()
    bad = [n for n in workload.CHECKED_WINDOW if reg[n].oracle is None and n not in allowed_no_oracle]
    assert not bad, f"window queries without oracle: {bad}"
