"""Planted-input cross-engine tests for the r6-era keys whose
detection paths are VACUOUS on the driver fixtures (r12 VERDICT item 5
hardening; the r7 zero-row rule extended to zero-COLUMN vacuity).

Fixture audit at sf0.01 (r13): ``pii_pattern_scan``'s ``n_email_like``
and ``n_digit_runs`` are 0 for every document (the corpus generator
emits plain lowercase words), so the email/digit detectors — the whole
point of the scan — have never been driver-exercised; the same two
regexes drive ``pii_redact``'s replacement counts (also all-zero).
``table_checks`` emits its 7 rows with every ``n_violations`` = 0 on
the clean fixtures, so none of the violation detectors has ever fired.

Each test plants the missing inputs and re-runs the driver-style
hash-compare on BOTH engines, then pins the exact planted counts
closed-form.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from googlecloudstorage_blueprints_spark.sources.catalog import TABLES

from tests.test_planted_empty_ops import _compare

SF_SRC = "/root/testdata/sf0.001"

# two emails (one inside punctuation), three digit runs (the run inside
# the second email counts once more after [EMAIL] replacement removes
# it — redact counts digits on the email-redacted text, scan on raw)
_PII_TEXT = (
    "contact bob.smith@example.com or sales@shop42.net today "
    "ref 12345 and 007 thanks the end"
)
# emails: bob.smith@example.com, sales@shop42.net            → 2
# digit runs in RAW text: 42 (inside the domain), 12345, 007 → 3
_PII_EMAILS = 2
_PII_DIGIT_RUNS_RAW = 3
# after emails → [EMAIL], the 42 is gone: 12345, 007         → 2
_PII_DIGIT_RUNS_REDACTED = 2


def _symlink_rest(out, replaced: set) -> None:
    for t in TABLES:
        if t not in replaced:
            os.symlink(f"{SF_SRC}/{t}.parquet", out / f"{t}.parquet")


@pytest.fixture(scope="module")
def pii_dir(tmp_path_factory):
    """sf0.001 plus one document carrying real email/digit patterns."""
    out = tmp_path_factory.mktemp("pii_sf")
    docs = pq.read_table(f"{SF_SRC}/documents.parquet")
    ghost = docs.slice(0, 1).to_pydict()
    ghost.update(
        doc_id=[88_000_001],
        text=[_PII_TEXT],
        n_chars=[len(_PII_TEXT)],
    )
    pq.write_table(
        pa.concat_tables(
            [docs, pa.Table.from_pydict(ghost, schema=docs.schema)]
        ),
        out / "documents.parquet",
    )
    _symlink_rest(out, {"documents"})
    return str(out)


def test_pii_pattern_scan_detects_planted_pii(spark, pii_dir):
    rows = _compare(spark, "pii_pattern_scan", pii_dir)
    by_id = {r[0]: r for r in rows}
    got = by_id[88_000_001]
    assert got[1] == _PII_EMAILS
    assert got[2] == _PII_DIGIT_RUNS_RAW
    # scrub removes exactly the digit-run characters (42, 12345, 007)
    assert got[5] == len(_PII_TEXT) - (2 + 5 + 3)


def test_pii_redact_redacts_planted_pii(spark, pii_dir):
    rows = _compare(spark, "pii_redact", pii_dir)
    by_id = {r[0]: r for r in rows}
    got = by_id[88_000_001]
    assert got[1] == _PII_EMAILS
    # digit count taken AFTER email replacement: the in-domain 42 is
    # already gone — the ordering rule the docstring promises
    assert got[2] == _PII_DIGIT_RUNS_REDACTED
    expected = (
        _PII_TEXT.replace("bob.smith@example.com", "[EMAIL]")
        .replace("sales@shop42.net", "[EMAIL]")
        .replace("12345", "[NUM]")
        .replace("007", "[NUM]")
    )
    assert got[3] == len(expected)


@pytest.fixture(scope="module")
def violations_dir(tmp_path_factory):
    """sf0.001 with every table_checks violation class planted once:
    an orders row pointing at a ghost customer, a lineitem row pointing
    at a ghost order, a duplicated customer key, a duplicated orders
    key, a duplicated doc_id, a NULL-text document, and a zero-quantity
    lineitem."""
    out = tmp_path_factory.mktemp("violations_sf")

    cust = pq.read_table(f"{SF_SRC}/customer.parquet")
    dup_c = cust.slice(0, 1)  # duplicate first customer key
    pq.write_table(
        pa.concat_tables([cust, dup_c]), out / "customer.parquet"
    )

    orders = pq.read_table(f"{SF_SRC}/orders.parquet")
    dup_o = orders.slice(0, 1)  # duplicate first order key
    ghost_fk = orders.slice(1, 1).to_pydict()
    ghost_fk.update(o_orderkey=[555_000_001], o_custkey=[77_000_009])
    pq.write_table(
        pa.concat_tables(
            [
                orders,
                dup_o,
                pa.Table.from_pydict(ghost_fk, schema=orders.schema),
            ]
        ),
        out / "orders.parquet",
    )

    li = pq.read_table(f"{SF_SRC}/lineitem.parquet")
    orphan = li.slice(0, 1).to_pydict()
    orphan.update(l_orderkey=[666_000_001])
    zero_q = li.slice(1, 1).to_pydict()
    zero_q.update(l_quantity=[0.0])
    pq.write_table(
        pa.concat_tables(
            [
                li,
                pa.Table.from_pydict(orphan, schema=li.schema),
                pa.Table.from_pydict(zero_q, schema=li.schema),
            ]
        ),
        out / "lineitem.parquet",
    )

    docs = pq.read_table(f"{SF_SRC}/documents.parquet")
    dup_d = docs.slice(0, 1)
    null_text = docs.slice(1, 1).to_pydict()
    null_text.update(doc_id=[88_000_002], text=[None])
    pq.write_table(
        pa.concat_tables(
            [
                docs,
                dup_d,
                pa.Table.from_pydict(null_text, schema=docs.schema),
            ]
        ),
        out / "documents.parquet",
    )

    _symlink_rest(out, {"customer", "orders", "lineitem", "documents"})
    return str(out)


def test_table_checks_counts_every_planted_violation(spark, violations_dir):
    rows = _compare(spark, "table_checks", violations_dir)
    got = {r[0]: r[1] for r in rows}
    assert got == {
        # the ghost-custkey order violates the FK once
        "orders_custkey_fk": 1,
        # the orphan lineitem violates the orderkey FK once
        "lineitem_orderkey_fk": 1,
        "customer_key_unique": 1,
        "orders_key_unique": 1,
        "documents_id_unique": 1,
        "documents_text_not_null": 1,
        "lineitem_quantity_positive": 1,
    }
