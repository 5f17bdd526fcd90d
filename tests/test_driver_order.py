"""Pin the generated driver adjudication ordering.

The correctness driver walks ``queries()`` in dict order with a ~50-key
budget, so the ordering in ``operators/_driver_order.py`` is part of the
driver contract.  These tests fail when the committed order is stale
(operators added / CORRECTNESS files landed without regenerating) or when
the generator's policy regresses.
"""

from __future__ import annotations

import importlib
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO / "scripts"))

gen = importlib.import_module("gen_driver_first")


def test_committed_order_is_fresh():
    committed = (
        REPO
        / "googlecloudstorage_blueprints_spark"
        / "operators"
        / "_driver_order.py"
    ).read_text()
    assert committed == gen.render(gen.compute_order()), (
        "stale _driver_order.py: rerun python scripts/gen_driver_first.py"
    )


def test_order_covers_whole_registry_exactly_once():
    from googlecloudstorage_blueprints_spark.operators import (
        REGISTRY,
        _load_all,
        all_queries,
    )

    _load_all()
    order = gen.compute_order()
    assert sorted(order) == sorted(REGISTRY)
    assert list(all_queries()) == order


def test_oldest_adjudication_comes_first():
    """Staleness dominates: a key last seen in round N never precedes a
    changed/never-seen key, and rounds are non-decreasing down the list."""
    latest = gen.latest_adjudication()
    changed = set(gen.CHANGED_THIS_ROUND)
    order = gen.compute_order()
    rounds = [
        -1 if n in changed else latest.get(n, -1) for n in order
    ]
    assert rounds == sorted(rounds)


def test_changed_keys_lead():
    order = gen.compute_order()
    latest = gen.latest_adjudication()
    # changed keys share the front -1 group with never-seen keys; the
    # head is that whole group (all of it fits the driver's ~50 budget)
    n_front = sum(
        1
        for n in order
        if n in set(gen.CHANGED_THIS_ROUND) or n not in latest
    )
    head = order[:n_front]
    for key in gen.CHANGED_THIS_ROUND:
        assert key in head, f"{key} marked changed but not front-loaded"
