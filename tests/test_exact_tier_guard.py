"""Exact-tier collect/broadcast ceiling (r5 verdict, "What's wrong" #2).

The exact similarity tiers materialize the corpus (or query set) on the
driver — acceptable as the ground-truth path only while it is BOUNDED.
These tests prove the bound is enforced, not just documented: above
``EXACT_TIER_MAX_ROWS`` the op raises a typed error that names the
registered scale tiers instead of attempting the collect.
"""

from __future__ import annotations

import pytest

from googlecloudstorage_blueprints_spark.operators import all_queries
from googlecloudstorage_blueprints_spark.operators import similarity as sim

SF = "/root/testdata/sf0.001"


@pytest.mark.parametrize(
    "op", ["dedup_embedding_cosine", "similarity_knn_pandas",
           "similarity_knn_bruteforce"]
)
def test_guard_trips_above_ceiling(spark, op, monkeypatch):
    monkeypatch.setattr(sim, "EXACT_TIER_MAX_ROWS", 2)
    with pytest.raises(sim.ExactTierCorpusTooLarge) as exc:
        # the guard runs before any collect/broadcast, so the raise is
        # immediate even though the fixture corpus would fit in memory
        all_queries()[op](spark, SF).collect()
    msg = str(exc.value)
    assert "similarity_rp_lsh" in msg and "similarity_knn_ivf" in msg
    assert op in msg


@pytest.mark.parametrize(
    "op", ["dedup_embedding_cosine", "similarity_knn_pandas",
           "similarity_knn_bruteforce"]
)
def test_guard_passes_at_fixture_scale(spark, op):
    assert all_queries()[op](spark, SF).count() > 0
