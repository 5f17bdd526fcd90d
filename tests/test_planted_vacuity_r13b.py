"""Planted-input pins, wave 2 (r13): a systematic zero-column scan of
all 283 oracles at sf0.01 found six MORE keys whose detection paths
never fire on the clean fixtures (beyond the pii/table_checks pair in
test_planted_vacuity_r13.py and the keys already planted in earlier
rounds):

- ``join_asof_tolerance``: every fixture match is STALER than the
  7-day bound, so both output columns are 100% NULL — the in-tolerance
  match path (the op's whole point) was never driver-exercised.
- ``events_sessionized_funnel``: ``n_purchased_after_click`` is 0 —
  the fixture's sessions never complete the ordered funnel.
- ``incremental_dedup`` / ``dedup_rate_by_source``: the corpus has no
  exact duplicates, so is_duplicate / n_dropped are all-false/0.
- ``table_profile``: no NULLs anywhere in fixture orders → n_nulls 0.
- ``packing_efficiency_report``: no fixture bin is underfilled.
- digit/sentence text paths (``char_class_profile`` digit_chars,
  ``source_quality_scorecard`` digit_share, ``doc_sentence_stats``
  n_breaks): the word-salad corpus has no digits or punctuation.

Each planted corpus re-runs the driver-style cross-engine hash compare
and pins the detection closed-form.
"""

from __future__ import annotations

import pyarrow as pa

from tests.test_new_ops_r12c import _planted_dir
from tests.test_new_ops_r13 import _typed_events_table
from tests.test_planted_empty_ops import _compare

_DAY_US = 86_400_000_000


def _docs_src_table(rows):
    """rows: (doc_id, text, source)"""
    return pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array(["en"] * len(rows), pa.string()),
            "source": pa.array([r[2] for r in rows], pa.string()),
            "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
        }
    )


def _orders_table(rows):
    """rows: (o_orderkey, o_custkey, o_orderdate_us, o_orderpriority)"""
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
                [r[3] for r in rows], pa.string()
            ),
        }
    )


def test_asof_tolerance_planted_fresh_and_stale(spark, tmp_path):
    """One order; an event 1 day later MATCHES (within the 7-day
    bound), an event 10 days later reads NULL, and a user with no
    orders reads NULL — all three paths cross-engine."""
    t0 = 1_000 * _DAY_US
    orders = _orders_table([(500, 7, t0, "3-MEDIUM")])
    events = _typed_events_table(
        [
            (1, t0 + 1 * _DAY_US, 7, "view"),    # fresh → orderkey 500
            (2, t0 + 10 * _DAY_US, 7, "view"),   # stale → NULL
            (3, t0, 8, "view"),                   # no orders → NULL
        ]
    )
    sf_dir = _planted_dir(
        tmp_path, {"orders": orders, "events": events}
    )
    got = {r[0]: (r[2], r[3]) for r in
           _compare(spark, "join_asof_tolerance", sf_dir)}
    assert got[1][0] == 500 and got[1][1] is not None
    assert got[2] == (None, None)
    assert got[3] == (None, None)


def test_sessionized_funnel_planted_ordered_steps(spark, tmp_path):
    """User 1 completes view→click→purchase in order; user 2 has all
    three types in the WRONG order (purchase, click, view) — the
    order constraint must count exactly one full conversion."""
    t0 = 1_000 * _DAY_US
    events = _typed_events_table(
        [
            (1, t0, 1, "view"),
            (2, t0 + 60_000_000, 1, "click"),
            (3, t0 + 120_000_000, 1, "purchase"),
            (4, t0, 2, "purchase"),
            (5, t0 + 60_000_000, 2, "click"),
            (6, t0 + 120_000_000, 2, "view"),
        ]
    )
    sf_dir = _planted_dir(tmp_path, {"events": events})
    rows = _compare(spark, "events_sessionized_funnel", sf_dir)
    assert [tuple(r) for r in rows] == [(2, 2, 1, 1)]


_DUP_DOCS = [
    (1, "dup text alpha", "src1"),
    (2, "dup text alpha", "src2"),     # dropped (keeper is doc 1)
    (3, "dup text alpha", "src0"),     # new-shard dup of the corpus
    (4, "unique text beta", "src0"),   # new-shard original
    (5, "tiny solo doc", "tiny"),      # a 3-token source → underfilled bin
]


def test_incremental_dedup_planted_duplicate_flags(spark, tmp_path):
    sf_dir = _planted_dir(
        tmp_path, {"documents": _docs_src_table(_DUP_DOCS)}
    )
    got = {r[0]: r[1] for r in
           _compare(spark, "incremental_dedup", sf_dir)}
    assert got == {3: True, 4: False}


def test_dedup_rate_planted_drop_counts(spark, tmp_path):
    sf_dir = _planted_dir(
        tmp_path, {"documents": _docs_src_table(_DUP_DOCS)}
    )
    got = {r[0]: (r[1], r[2], r[3]) for r in
           _compare(spark, "dedup_rate_by_source", sf_dir)}
    # keeper of the dup group is doc 1 (src1); src2 and src0 each drop
    # their copy; src0's unique doc survives
    assert got["src1"] == (1, 0, 0.0)
    assert got["src2"] == (1, 1, 1.0)
    assert got["src0"] == (2, 1, 0.5)
    assert got["tiny"] == (1, 0, 0.0)


def test_packing_report_planted_underfilled_bin(spark, tmp_path):
    sf_dir = _planted_dir(
        tmp_path, {"documents": _docs_src_table(_DUP_DOCS)}
    )
    got = {r[0]: r for r in
           _compare(spark, "packing_efficiency_report", sf_dir)}
    tiny = got["tiny"]
    assert tiny[1] == 1                  # one bin
    assert tiny[4] == 1                  # and it is underfilled
    assert tiny[3] < 0.5                 # mean_fill under the threshold


def test_table_profile_planted_null_counts(spark, tmp_path):
    """A NULL o_orderpriority row must surface in n_nulls for exactly
    that column — the profile's null path is vacuous on the clean
    fixtures."""
    t0 = 1_000 * _DAY_US
    orders = _orders_table(
        [
            (1, 1, t0, "3-MEDIUM"),
            (2, 1, t0 + _DAY_US, None),
        ]
    )
    sf_dir = _planted_dir(tmp_path, {"orders": orders})
    got = {r[0]: r[1] for r in _compare(spark, "table_profile", sf_dir)}
    assert got["o_orderpriority"] == 1
    assert got["o_orderkey"] == 0


def test_text_digit_and_sentence_paths_planted(spark, tmp_path):
    """One doc with digits and sentence terminators lights up the
    digit-share and sentence-break paths that the word-salad corpus
    leaves at zero — all three ops cross-engine on the same corpus."""
    docs = [
        (1, "version 42 shipped today. it fixed 7 bugs! done?", "src9"),
        (2, "plain words only here", "src9"),
    ]
    sf_dir = _planted_dir(tmp_path, {"documents": _docs_src_table(docs)})

    ccp = {r[0]: r for r in
           _compare(spark, "char_class_profile", sf_dir)}
    # cols: source, total_chars, alpha_chars, digit_chars, ...
    # doc 1 carries exactly 3 digit chars (4, 2, 7)
    assert ccp["src9"][3] == 3

    sq = {r[0]: r for r in
          _compare(spark, "source_quality_scorecard", sf_dir)}
    # cols: ..., digit_share last — strictly positive now
    assert sq["src9"][5] > 0

    ds = {r[0]: r for r in _compare(spark, "doc_sentence_stats", sf_dir)}
    # cols: source, n_docs, n_breaks, n_unbroken_docs, ...
    # 3 terminator runs in doc 1 (. ! ?), none in doc 2
    assert ds["src9"][2] == 3
    assert ds["src9"][3] == 1  # one unbroken doc
