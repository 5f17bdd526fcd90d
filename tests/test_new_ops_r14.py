"""Closed-form planted pins for the r14 operators (the new-key
discipline: every key lands WITH its fixed-point/rounding conventions
and a planted pin — r13 VERDICT item 6).

- ``doc_unigram_entropy_topk``: a 3-doc planted corpus pins the exact
  integer-ratio entropy — all-distinct = round(ln dl·1e6)/1e6,
  half-and-half = the ln4/ln2 difference of the SAME fixed-point
  terms, constant doc = exactly 0.0 (the numerator cancels
  term-for-term, no float residue).
- ``source_length_gini``: equal lengths pin gini = 0 exactly; a
  one-doc-has-everything source pins the closed form (n−1)/n.
"""

from __future__ import annotations

import math

import pyarrow as pa

from tests.test_new_ops_r12c import _docs_table, _planted_dir
from tests.test_planted_empty_ops import _compare


def _ln6(x: float) -> int:
    return int(round(math.log(x) * 1_000_000))


def test_doc_entropy_planted_closed_forms(spark, tmp_path):
    docs = [
        (1, "a b c d"),    # all distinct: H = ln(4)
        (2, "a a b b"),    # half-and-half: H = ln(4) - ln(2) = ln(2)
        (3, "a a a a"),    # constant: H = 0 exactly
    ]
    sf_dir = _planted_dir(tmp_path, {"documents": _docs_table(docs)})
    rows = _compare(spark, "doc_unigram_entropy_topk", sf_dir)
    by_id = {r[0]: r for r in rows}
    # (n_tokens, n_distinct, entropy) with the exact fixed-point ratio
    assert tuple(by_id[1][1:]) == (4, 4, (_ln6(4) * 4 - 0) / 4e6)
    assert tuple(by_id[2][1:]) == (
        4,
        2,
        (_ln6(4) * 4 - 4 * _ln6(2)) / 4e6,
    )
    assert tuple(by_id[3][1:]) == (4, 1, 0.0)
    # head order: distinct > mixed > constant
    assert [r[0] for r in rows] == [1, 2, 3]


def _docs_with_lengths(rows):
    """rows: (doc_id, source, n_chars) — text synthesized to any value;
    the gini op reads the stored n_chars column only."""
    return pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array(["x"] * len(rows), pa.string()),
            "lang": pa.array(["en"] * len(rows), pa.string()),
            "source": pa.array([r[1] for r in rows], pa.string()),
            "n_chars": pa.array([r[2] for r in rows], pa.int64()),
        }
    )


def test_source_length_gini_planted_closed_forms(spark, tmp_path):
    docs = [
        # g0: four equal lengths -> gini 0 exactly
        (1, "g0", 100),
        (2, "g0", 100),
        (3, "g0", 100),
        (4, "g0", 100),
        # g1: one doc holds every char -> gini (n-1)/n = 3/4
        (5, "g1", 0),
        (6, "g1", 0),
        (7, "g1", 0),
        (8, "g1", 4000),
    ]
    sf_dir = _planted_dir(
        tmp_path, {"documents": _docs_with_lengths(docs)}
    )
    rows = _compare(spark, "source_length_gini", sf_dir)
    by_src = {r[0]: r for r in rows}
    assert tuple(by_src["g0"]) == ("g0", 4, 400, 0.0)
    assert tuple(by_src["g1"]) == ("g1", 4, 4000, 3 / 4)


def test_pair_containment_planted_subset_duplicate(spark, tmp_path):
    """The subset-duplicate signature the op exists for: doc 1 (12
    words, 10 3-shingles) embedded VERBATIM at the head of doc 2 (72
    words, 70 shingles) scores containment exactly 1.0 (bucket 9)
    while its Jaccard is 10/70 < 1/2 — so bucket 9 reads n_pairs 1,
    n_low_jaccard 1, the pair symmetric Jaccard dedup never flags."""
    from tests.test_new_ops_r12c import _docs_table as _docs

    small = " ".join(f"w{i}" for i in range(12))
    big = small + " " + " ".join(f"f{i}" for i in range(60))
    docs = [(1, small), (2, big)]
    sf_dir = _planted_dir(tmp_path, {"documents": _docs(docs)})
    rows = _compare(spark, "pair_containment_histogram", sf_dir)
    by_bucket = {r[0]: r for r in rows}
    assert len(rows) == 10  # empty buckets restored by the literal
    # (bucket, c_lo, c_hi, n_pairs, n_low_jaccard, pair_share)
    assert tuple(by_bucket[9][3:]) == (1, 1, 1.0)
    assert all(
        by_bucket[b][3] == 0 for b in range(9)
    ), "the single planted pair must land in the top containment bucket"
