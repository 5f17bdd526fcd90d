"""Plan-shape pins: the plans we'd want at 100 TB, asserted at test scale.

A wrong plan (unpushed filter, unpruned scan, shuffle join of a tiny dim)
is invisible in small-scale correctness tests but fatal at scale — so the
shape itself is under test via explain() parsing.
"""

from __future__ import annotations

import pytest

from googlecloudstorage_blueprints_spark.operators import all_queries
from googlecloudstorage_blueprints_spark.plans import (
    codegen_span_count,
    explain_str,
    has_broadcast_join,
    op_count,
    pushed_filters,
    read_schema_columns,
    shuffle_count,
)

SF = "/root/testdata/sf0.001"
QUERIES = all_queries()


def test_scan_filters_pushed_to_parquet(spark):
    df = QUERIES["scan_project_filter"](spark, SF)
    pushed = " ".join(pushed_filters(df))
    assert "l_shipdate" in pushed and "l_discount" in pushed
    assert "l_quantity" in pushed


def test_scan_reads_only_projected_columns(spark):
    df = QUERIES["scan_project_filter"](spark, SF)
    scans = read_schema_columns(df)
    assert len(scans) == 1
    # 5 projected + predicate columns only; never the full 11-column table
    assert set(scans[0]) == {
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        "l_extendedprice",
        "l_discount",
        "l_shipdate",
    }


def test_pricing_summary_prunes_and_single_shuffle(spark):
    df = QUERIES["pricing_summary"](spark, SF)
    scans = read_schema_columns(df)
    assert len(scans) == 1
    assert "l_orderkey" not in scans[0], "aggregation must prune unused keys"
    # one exchange for the aggregate + the global sort's range exchange
    assert shuffle_count(df) <= 2


def test_join_broadcast_broadcasts_dims(spark):
    df = QUERIES["join_broadcast"](spark, SF)
    assert has_broadcast_join(df)
    # both dims (nation, region) broadcast; the fact table is never
    # shuffled for the join itself
    assert op_count(df, "BroadcastHashJoin") == 2


def test_topk_uses_window_group_limit(spark):
    df = QUERIES["topk_per_group"](spark, SF)
    plan = explain_str(df)
    assert "WindowGroupLimit" in plan, (
        "rank<=k must plan a partial top-k before the shuffle"
    )


def test_orderby_limit_is_take_ordered(spark):
    df = QUERIES["orderby_limit"](spark, SF)
    plan = explain_str(df)
    assert "TakeOrderedAndProject" in plan, (
        "global top-k must not plan a full sort"
    )


def test_semi_join_plans_semi(spark):
    plan = explain_str(QUERIES["join_semi"](spark, SF))
    assert "LeftSemi" in plan


def test_sessionize_single_exchange_for_both_windows(spark):
    df = QUERIES["events_sessionize"](spark, SF)
    # both window passes share the user_id partitioning: exactly one
    # shuffle in the whole plan
    assert shuffle_count(df) == 1


@pytest.mark.parametrize(
    "name", ["pricing_summary", "join_shuffle", "window_ranking"]
)
def test_whole_stage_codegen_active(spark, name):
    assert codegen_span_count(QUERIES[name](spark, SF)) > 0


def test_grouping_sets_single_pass(spark):
    df = QUERIES["grouping_sets"](spark, SF)
    # one Expand + one aggregate shuffle — not three separate aggregations
    assert op_count(df, "Expand") == 1
    assert shuffle_count(df) == 1


def test_subquery_decorrelates_to_broadcast(spark):
    df = QUERIES["subquery_scalar_agg"](spark, SF)
    # per-nation aggregate broadcasts; the customer side never shuffles
    # for the join — the only exchange feeds the aggregate itself
    assert has_broadcast_join(df)
    assert shuffle_count(df) == 1


def test_asof_join_two_shuffles_no_range_explosion(spark):
    df = QUERIES["join_asof"](spark, SF)
    plan = explain_str(df)
    # union-merge formulation: no join operator at all, just the right-side
    # pre-agg exchange + the per-user window exchange
    assert "NestedLoop" not in plan
    assert shuffle_count(df) == 2


def test_range_binned_join_is_hash_based(spark):
    plan = explain_str(QUERIES["join_range_binned"](spark, SF))
    assert "NestedLoop" not in plan, "band join must not plan a nested loop"


def test_gapfill_shuffles_only_on_user(spark):
    df = QUERIES["events_gapfill"](spark, SF)
    # aggregates + grid join + fill window all partition on user_id;
    # no global exchange should appear
    assert "SinglePartition" not in explain_str(df)


def test_aqe_converts_smj_to_broadcast_at_runtime(spark):
    """With static broadcast planning disabled, AQE must still convert the
    join to broadcast at runtime once the filtered side's true size is
    known — the mechanism SCALE.md relies on for filtered dims at 100 TB."""
    from googlecloudstorage_blueprints_spark.sources.catalog import load_table

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    # the adaptive threshold defaults to the static one (now -1): give AQE
    # its own runtime budget so only the STATIC planner is disabled
    spark.conf.set(
        "spark.sql.adaptive.autoBroadcastJoinThreshold", "10485760"
    )
    try:
        li = load_table(spark, SF, "lineitem")
        o = load_table(spark, SF, "orders").where("o_orderkey < 50")
        joined = li.join(o, li.l_orderkey == o.o_orderkey).select(
            "l_orderkey", "l_quantity", "o_totalprice"
        )
        pre = explain_str(joined)
        assert "SortMergeJoin" in pre and "BroadcastHashJoin" not in pre
        joined.collect()
        post = explain_str(joined, "simple")
        final = post.split("== Initial Plan ==")[0]
        assert "isFinalPlan=true" in final
        assert "BroadcastHashJoin" in final, "AQE did not convert to broadcast"
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")


def test_pareto_scale_has_no_global_customer_sort(spark):
    """The scale-path Pareto must range-partition the per-customer sort
    (parallel) instead of the single-partition global-order window the
    exact tier uses; its only SinglePartition work is over scalar-sized
    frames (partition counts, 10 decile rows)."""
    df = QUERIES["pareto_revenue_scale"](spark, SF)
    plan = explain_str(df)
    assert "rangepartitioning(rev" in plan, (
        "per-customer ordering must be a parallel range shuffle"
    )
    assert "row_number" not in plan, (
        "scale path must not rank via a global-order window"
    )


def test_pareto_scale_matches_exact_tier(spark):
    """The range-parallel decomposition both registry keys now run must
    reproduce the single-global-window form bit-for-bit (the unregistered
    ``pareto_revenue_window_exact`` is the semantic spec)."""
    from googlecloudstorage_blueprints_spark.operators.relational_ext import (
        pareto_revenue_window_exact,
    )
    from googlecloudstorage_blueprints_spark.session import apply_runtime_conf

    apply_runtime_conf(spark)
    a = sorted(
        tuple(r) for r in pareto_revenue_window_exact(spark, SF).collect()
    )
    b = sorted(
        tuple(r)
        for r in QUERIES["pareto_revenue_scale"](spark, SF).collect()
    )
    assert a == b


def test_registered_pareto_has_no_global_customer_sort(spark):
    """Round-4 verdict #8: the REGISTERED pareto path must be the
    range-parallel one — no data-sized SinglePartition global-order
    window."""
    df = QUERIES["pareto_revenue"](spark, SF)
    plan = explain_str(df)
    assert "rangepartitioning(rev" in plan
    assert "row_number" not in plan


def test_aqe_coalesces_shuffle_partitions(spark):
    """Small shuffles must coalesce below the configured partition count
    (AQEShuffleRead coalesced) instead of running N near-empty tasks."""
    df = QUERIES["pricing_summary"](spark, SF)
    df.collect()
    final = explain_str(df, "simple").split("== Initial Plan ==")[0]
    assert "AQEShuffleRead coalesced" in final


def test_global_row_number_ledger_only_single_partition(spark):
    """Global numbering must not serialize the DATA through one task:
    the only SinglePartition work allowed is the super-bucket ledger
    cumulative (|ids|/4096² rows), and the local numbering window must
    partition on the bucket key."""
    from googlecloudstorage_blueprints_spark.operators import all_queries

    df = all_queries()["global_row_number"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("SinglePartition") <= 1
    assert "hashpartitioning(bucket" in plan


def test_no_operator_plans_cartesian_or_python_udf(spark):
    """Repo-wide plan lint over EVERY registered operator: no
    CartesianProduct (a 1-row cross is a BroadcastNestedLoopJoin; a
    genuine cartesian is always a bug here) and no BatchEvalPython (a
    row-at-a-time Python UDF — the Arrow paths show as
    ArrowEvalPython/MapInPandas/FlatMapGroupsInPandas and are allowed).
    Catches the classes of scale-killer the per-op pins can't cover for
    operators added later."""
    offenders = {}
    for name, fn in QUERIES.items():
        try:
            plan = explain_str(fn(spark, SF))
        except Exception as exc:  # pragma: no cover - lint must not mask
            offenders[name] = f"explain failed: {exc}"
            continue
        hits = [
            marker
            for marker in ("CartesianProduct", "BatchEvalPython")
            if marker in plan
        ]
        if hits:
            offenders[name] = hits
    assert not offenders, f"plan lint violations: {offenders}"


def test_decile_report_data_window_is_bucket_partitioned(spark):
    """The decile rank must not serialize orders through one task: the
    data-sized window partitions on the price bucket; SinglePartition
    work is confined to the ~|price-domain|/10k ledger cumulative (and
    the final bounded-result coalesce)."""
    df = QUERIES["orders_decile_report"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "hashpartitioning(bucket" in plan
    # two SinglePartition exchanges are ledger/scalar-sized and allowed:
    # the ~50-row ledger cumsum and the 1-row n_total global aggregate;
    # anything more would mean the DATA serialized through one task
    assert plan.count("SinglePartition") <= 2


def test_copurchase_pairs_build_in_row_from_baskets(spark):
    """The pair build must expand IN-ROW from per-order baskets (r10
    shape: one collect_set aggregate keyed on l_orderkey feeds codegen
    Generates; basket-size²-bounded fan-out) — never a nested-loop over
    the part space, and never a second lineitem shuffle for the pair
    space.  The basket exchange must be shared with the part-marginal
    branch (ReusedExchange)."""
    df = QUERIES["part_copurchase_lift"](spark, SF)
    df.collect()  # AQE finalizes reuse decisions post-execution
    plan = df._jdf.queryExecution().executedPlan().toString()
    # post-execution AQE plans carry Final + Initial sections; count
    # operators in the final section only
    plan = plan.split("== Initial Plan ==")[0]
    # baskets: the only l_orderkey-keyed exchange, reused downstream
    assert "hashpartitioning(l_orderkey" in plan
    assert "collect_set" in plan
    assert "ReusedExchange" in plan, "basket exchange must be shared"
    # pair expansion is in-row Generate, not a join
    assert "Generate explode" in plan
    # the only nested-loop allowed is the 1-row n_orders scalar cross
    assert plan.count("BroadcastNestedLoopJoin") <= 1
    assert "CartesianProduct" not in plan


def test_abc_class_cumsum_runs_on_supplier_dim_only(spark):
    """The ABC cumulative window is a ledger pass over the supplier
    DIMENSION (after the fact reduces to one row per supplier), so the
    plan's window input must be the aggregated frame, not lineitem."""
    df = QUERIES["supplier_abc_class"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # exactly one data-sized exchange: the supplier-keyed aggregate;
    # the window's SinglePartition input is the |suppliers|-row frame
    assert "hashpartitioning(l_suppkey" in plan


def test_weighted_sample_cuts_before_ranking(spark):
    """The A-ES sample must reach its global order via TakeOrdered
    (per-partition partial top-k), with the rank window running only on
    the K-row survivor frame — never a SinglePartition sort of the
    corpus (the r9 audit caught exactly that in the op's first draft)."""
    df = QUERIES["weighted_sample_topk"](spark, SF)
    plan = explain_str(df)
    assert "TakeOrderedAndProject" in plan
    # the one SinglePartition exchange feeds the K-row rank, nothing else
    assert plan.count("SinglePartition") <= 1


def test_user_event_pareto_windows_ride_the_ledger(spark):
    """The concentration cuts must run on the count-VALUE ledger (one
    row per distinct per-user count), not rank users: no row_number over
    a user-sized frame, and the single-partition cumulative is the
    bounded ledger pass."""
    df = QUERIES["user_event_pareto"](spark, SF)
    plan = explain_str(df)
    assert "row_number" not in plan
    assert plan.count("SinglePartition") <= 1


def test_gini_rank_window_is_nation_partitioned(spark):
    """The Gini rank must be a PARTITIONED window (per-nation sort),
    never a global order over all customers."""
    df = QUERIES["customer_value_gini"](spark, SF)
    plan = explain_str(df)
    assert "hashpartitioning(c_nationkey" in plan
    assert "SinglePartition" not in plan
