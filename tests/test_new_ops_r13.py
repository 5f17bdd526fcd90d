"""Planted-input and closed-form pins for the r13 operator wave
(association rules / query likelihood / session-count histogram /
MAD anomaly), following the r11 vacuity rule: every detection or
classification path a fixture cannot exercise gets a planted corpus,
and every planted corpus re-runs the driver-style cross-engine hash
compare.
"""

from __future__ import annotations

import math

import pyarrow as pa

from googlecloudstorage_blueprints_spark.operators import all_queries

from tests.test_new_ops_r12c import (
    SF,
    _events_table,
    _lineitem_table,
    _planted_dir,
)
from tests.test_planted_empty_ops import _compare

_US = 1_000_000
_GAP_US = 1800 * _US


# --- copurchase_association_rules ---------------------------------------------


def test_association_rules_planted_closed_form(spark, tmp_path):
    """Baskets {A,B}, {A,B}, {A,C}: rule A→B has confidence 2/3 while
    B→A has 1 — the directional asymmetry is the whole point of
    emitting both columns.  Cross-engine hash compare runs on the
    planted corpus."""
    rows = [
        (1, 100, 1), (1, 200, 2),
        (2, 100, 1), (2, 200, 2),
        (3, 100, 1), (3, 300, 2),
    ]
    sf_dir = _planted_dir(tmp_path, {"lineitem": _lineitem_table(rows)})
    got = _compare(spark, "copurchase_association_rules", sf_dir)
    by_pair = {(r[0], r[1]): r for r in got}
    a_b = by_pair[(100, 200)]
    assert a_b[2] == 2 and a_b[3] == 3 and a_b[4] == 2
    assert a_b[5] == 2 / 3          # support = 2 of 3 orders
    assert a_b[6] == 2 / 3          # conf A→B
    assert a_b[7] == 1.0            # conf B→A
    a_c = by_pair[(100, 300)]
    assert a_c[2] == 1 and a_c[6] == 1 / 3 and a_c[7] == 1.0


def test_association_rules_fixture_matches_lift_pairs(spark):
    """Same top-K pair set and identical n_both as
    part_copurchase_lift on the fixture (shared frame extraction must
    not change the cut)."""
    qs = all_queries()
    rules = [tuple(r)[:3] for r in
             qs["copurchase_association_rules"](spark, SF).collect()]
    lift = [tuple(r)[:3] for r in
            qs["part_copurchase_lift"](spark, SF).collect()]
    assert rules == lift and len(rules) == 20


# --- doc_query_likelihood_topk --------------------------------------------------


def _docs_table(rows):
    """rows: (doc_id, text)"""
    return pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array(["en"] * len(rows), pa.string()),
            "source": pa.array(["web"] * len(rows), pa.string()),
            "n_chars": pa.array(
                [len(r[1]) if r[1] is not None else 0 for r in rows],
                pa.int64(),
            ),
        }
    )


def test_query_likelihood_planted_closed_form(spark, tmp_path):
    """Three tiny docs with hand-computable tf/dl: the python
    reference applies the same ln×1e6 fixed-point per term.  The
    zero-tf background path (doc 3 has no query terms at all) must
    still score — the LEFT-join-from-the-spine rule."""
    docs = [
        (1, "spark query spark table"),          # tf: spark 2, query 1, table 1
        (2, "spark alpha beta gamma"),           # tf: spark 1
        (3, "alpha beta gamma delta"),           # tf: none — background only
    ]
    sf_dir = _planted_dir(tmp_path, {"documents": _docs_table(docs)})
    got = _compare(spark, "doc_query_likelihood_topk", sf_dir)
    by_id = {r[0]: r[1] for r in got}

    mu, c_total = 2000.0, 12
    cf = {"spark": 3, "query": 1, "table": 1}
    tf = {
        1: {"spark": 2, "query": 1, "table": 1},
        2: {"spark": 1},
        3: {},
    }

    def score(doc_id, dl):
        t6 = 0
        for w in ("spark", "query", "table"):
            x = (tf[doc_id].get(w, 0) + (mu * cf[w]) / c_total) / (dl + mu)
            t6 += int(round(math.log(x) * 1_000_000))
        return round(t6 / 1_000_000.0, 6)

    assert by_id[1] == score(1, 4)
    assert by_id[2] == score(2, 4)
    assert by_id[3] == score(3, 4)
    # more query mass → higher likelihood
    assert by_id[1] > by_id[2] > by_id[3]


def test_query_likelihood_absent_term_drops_from_spine(spark, tmp_path):
    """A query term with ZERO corpus frequency ("table" never appears)
    has no cf row, so it silently leaves the scoring spine on BOTH
    engines — the documented convention (its Dirichlet background mass
    would be ln(0) = −∞): the score is the sum over the corpus-present
    query subset, here exactly {spark, query}."""
    docs = [
        (1, "spark query spark alpha"),  # tf: spark 2, query 1
        (2, "alpha beta gamma delta"),   # background only
    ]
    sf_dir = _planted_dir(tmp_path, {"documents": _docs_table(docs)})
    got = _compare(spark, "doc_query_likelihood_topk", sf_dir)
    by_id = {r[0]: r[1] for r in got}

    mu, c_total = 2000.0, 8
    cf = {"spark": 2, "query": 1}  # NO "table" row anywhere
    tf = {1: {"spark": 2, "query": 1}, 2: {}}

    def score(doc_id, dl):
        t6 = 0
        for w in ("spark", "query"):  # the present-subset sum
            x = (tf[doc_id].get(w, 0) + (mu * cf[w]) / c_total) / (dl + mu)
            t6 += int(round(math.log(x) * 1_000_000))
        return round(t6 / 1_000_000.0, 6)

    assert by_id[1] == score(1, 4)
    assert by_id[2] == score(2, 4)


def test_query_likelihood_fixture_total_rank_order(spark):
    rows = [tuple(r) for r in
            all_queries()["doc_query_likelihood_topk"](spark, SF).collect()]
    assert len(rows) == 10
    assert all(
        (rows[i][1], -rows[i][0]) >= (rows[i + 1][1], -rows[i + 1][0])
        for i in range(len(rows) - 1)
    )


# --- user_session_count_histogram ----------------------------------------------


def test_session_count_histogram_planted_strict_gap(spark, tmp_path):
    """User 1: three events with gaps (exactly 30 min, 30 min + 1 µs)
    → the tie does NOT split (strictly-greater rule), the +1 µs does →
    2 sessions.  User 2: one event → 1 session.  Histogram:
    {1: 1 user, 2: 1 user}."""
    t0 = 10_000_000_000
    rows = [
        (1, t0, 1),
        (2, t0 + _GAP_US, 1),            # exactly the gap: same session
        (3, t0 + _GAP_US + _GAP_US + 1, 1),  # gap + 1 µs: new session
        (4, t0, 2),
    ]
    sf_dir = _planted_dir(tmp_path, {"events": _events_table(rows)})
    got = _compare(spark, "user_session_count_histogram", sf_dir)
    assert {(r[0], r[1]) for r in got} == {(1, 1), (2, 1)}


# --- events_anomaly_mad ---------------------------------------------------------


def test_anomaly_mad_planted_spike_day(spark, tmp_path):
    """Seven days at 10 events/day plus one 100-event spike day: med
    and mad come from the stable mass (med=10, mad=0 → any deviation
    flags), the spike day is the ONLY outlier, and the planted
    closed form pins both medians.  Fixture volumes are stable, so
    without this pin the is_outlier=true path is vacuous."""
    rows, eid = [], 1
    base_day = 20_000
    for off in range(7):
        for i in range(10):
            rows.append((eid, (base_day + off) * 86_400_000_000 + i, 1))
            eid += 1
    for i in range(100):  # the spike day
        rows.append((eid, (base_day + 7) * 86_400_000_000 + i, 1))
        eid += 1
    sf_dir = _planted_dir(tmp_path, {"events": _events_table(rows)})
    got = _compare(spark, "events_anomaly_mad", sf_dir)
    by_day = {r[0]: r for r in got}
    assert len(got) == 8
    spike = by_day[base_day + 7]
    assert spike[1] == 100 and spike[4] is True
    assert spike[2] == 10.0 and spike[3] == 0.0  # med, mad closed form
    for off in range(7):
        assert by_day[base_day + off][4] is False


def test_anomaly_mad_fixture_emits_every_day(spark):
    rows = [tuple(r) for r in
            all_queries()["events_anomaly_mad"](spark, SF).collect()]
    assert len(rows) > 0
    days = [r[0] for r in rows]
    assert days == sorted(days)


# --- funnel_window_sensitivity --------------------------------------------------


def _typed_events_table(rows):
    """rows: (event_id, ts_us, user_id, event_type)"""
    return pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([1.0] * len(rows), pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )


def test_funnel_window_sweep_planted_bend(spark, tmp_path):
    """Four signups: conversions at 2, 10, and 40 days plus one
    never-converter — every sweep row reads a DIFFERENT share
    (1d: 0/4, 7d: 1/4, 30d: 2/4, 90d: 3/4), so the window test's
    BIGINT day boundary is exercised at every step.  The fixture
    corpus spans ~a month (30/90 identical), which is why this pin
    exists."""
    day = 86_400_000_000
    t0 = 1_000 * day
    rows = [
        (1, t0, 1, "signup"), (2, t0 + 2 * day, 1, "purchase"),
        (3, t0, 2, "signup"), (4, t0 + 10 * day, 2, "purchase"),
        (5, t0, 3, "signup"), (6, t0 + 40 * day, 3, "purchase"),
        (7, t0, 4, "signup"),
        # a pre-signup purchase must NOT count (at-or-after rule)
        (8, t0 - day, 4, "purchase"),
    ]
    sf_dir = _planted_dir(tmp_path, {"events": _typed_events_table(rows)})
    got = _compare(spark, "funnel_window_sensitivity", sf_dir)
    by_w = {r[0]: (r[1], r[2], r[3]) for r in got}
    assert by_w == {
        1: (4, 0, 0.0),
        7: (4, 1, 0.25),
        30: (4, 2, 0.5),
        90: (4, 3, 0.75),
    }


# --- customer_cohort_retention --------------------------------------------------


def _orders_month_table(rows):
    """rows: (o_orderkey, o_custkey, o_orderdate_us)"""
    return pa.table(
        {
            "o_orderkey": pa.array([r[0] for r in rows], pa.int64()),
            "o_custkey": pa.array([r[1] for r in rows], pa.int64()),
            "o_orderstatus": pa.array(["F"] * len(rows), pa.string()),
            "o_totalprice": pa.array([100.0] * len(rows), pa.float64()),
            "o_orderdate": pa.array(
                [r[2] for r in rows], pa.timestamp("us")
            ),
            "o_orderpriority": pa.array(
                ["3-MEDIUM"] * len(rows), pa.string()
            ),
        }
    )


def test_cohort_retention_planted_triangle(spark, tmp_path):
    """Three customers first order in Jan-2020; two return in Feb, one
    in Mar — the triangle reads 3/3, 2/3, 1/3 with exact shares, and a
    two-orders-in-one-month customer is counted ONCE per cell
    (the DISTINCT)."""
    import datetime as dt

    def us(y, m, d):
        return int(
            dt.datetime(y, m, d, tzinfo=dt.timezone.utc).timestamp()
        ) * 1_000_000

    rows = [
        (1, 1, us(2020, 1, 5)),
        (2, 2, us(2020, 1, 9)),
        (3, 3, us(2020, 1, 20)),
        (4, 1, us(2020, 2, 2)),
        (5, 2, us(2020, 2, 3)),
        (6, 2, us(2020, 2, 28)),  # same month again: one active mark
        (7, 3, us(2020, 3, 15)),
    ]
    sf_dir = _planted_dir(tmp_path, {"orders": _orders_month_table(rows)})
    got = _compare(spark, "customer_cohort_retention", sf_dir)
    m0 = 2020 * 12 + 1
    assert [tuple(r) for r in got] == [
        (m0, 0, 3, 3, 1.0),
        (m0, 1, 2, 3, 2 / 3),
        (m0, 2, 1, 3, 1 / 3),
    ]
