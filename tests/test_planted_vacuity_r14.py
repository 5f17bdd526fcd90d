"""Planted-input cross-engine tests for the r14 vacuity-scan findings
(`scripts/vacuity_scan.py`, the r13 zero-column method as a standing
round-open step).

Fixture audit at sf0.01 (r14 regenerated fixtures): ``sequence_pack``
emits ``bin_id`` = 0 for every (source, bin) group — each source totals
~1300 tokens, under one 2048-token context window, so the bin-ASSIGNMENT
path (the whole point of packing) has never been driver-exercised; the
existing test_training.py tests only check the sub-shard decomposition
against the single-window form (both 0 on small sources) and the window
partition keys.  ``json_extract``'s ``min_k`` is 0 for every event type
(k spans [0, 99] and every type hits 0), so a broken MIN that constantly
returned 0 would pass.  ``part_revenue_concentration`` is zero-row at
the driver's sf0.01 (the 1/CONCENTRATION_DENOM share threshold dilutes
as the part space grows) — non-empty at sf0.001, where no cross-engine
compare previously ran (the r10 test asserts Spark-side invariants
only).

Each test plants the missing inputs (or picks the SF that exercises the
path) and re-runs the driver-style hash-compare on BOTH engines, then
pins the planted counts closed-form.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tests.test_planted_empty_ops import SF_SRC, _compare
from tests.test_planted_vacuity_r13 import _symlink_rest

# --- sequence_pack: planted multi-bin source -------------------------
# 6 docs of 900 tokens each in a fresh source: tokens-before runs
# 0,900,1800,2700,3600,4500 and bin = before div 2048 gives
# 0,0,0,1,1,2 → bins (0: 3 docs/2700 tok), (1: 2 docs/1800), (2: 1/900).
_PACK_SOURCE = "srcpack"
_PACK_DOC_TOKENS = 900
_PACK_N_DOCS = 6
_PACK_EXPECT = {0: (3, 2700), 1: (2, 1800), 2: (1, 900)}

# --- json_extract: planted event type whose k never touches 0 --------
_GHOST_TYPE = "ghostclick"
_GHOST_KS = [7, 5, 9]  # min 5, max 9, sum 21, 3 distinct


@pytest.fixture(scope="module")
def pack_dir(tmp_path_factory):
    """sf0.001 plus a source whose docs overflow three context bins."""
    out = tmp_path_factory.mktemp("pack_sf")
    docs = pq.read_table(f"{SF_SRC}/documents.parquet")
    text = " ".join(["tok"] * _PACK_DOC_TOKENS)
    planted = docs.slice(0, 1).to_pydict()
    planted.update(
        doc_id=[90_000_001 + i for i in range(_PACK_N_DOCS)],
        text=[text] * _PACK_N_DOCS,
        lang=[planted["lang"][0]] * _PACK_N_DOCS,
        source=[_PACK_SOURCE] * _PACK_N_DOCS,
        n_chars=[len(text)] * _PACK_N_DOCS,
    )
    pq.write_table(
        pa.concat_tables(
            [docs, pa.Table.from_pydict(planted, schema=docs.schema)]
        ),
        out / "documents.parquet",
    )
    _symlink_rest(out, {"documents"})
    return str(out)


@pytest.fixture(scope="module")
def ghost_events_dir(tmp_path_factory):
    """sf0.001 plus three events of a fresh type with k ∈ {7, 5, 9}."""
    out = tmp_path_factory.mktemp("ghostk_sf")
    ev = pq.read_table(f"{SF_SRC}/events.parquet")
    planted = ev.slice(0, 1).to_pydict()
    n = len(_GHOST_KS)
    planted.update(
        event_id=[77_000_001 + i for i in range(n)],
        ts=[planted["ts"][0]] * n,
        user_id=[planted["user_id"][0]] * n,
        event_type=[_GHOST_TYPE] * n,
        value=[planted["value"][0]] * n,
        props=['{"k": %d}' % k for k in _GHOST_KS],
    )
    pq.write_table(
        pa.concat_tables(
            [ev, pa.Table.from_pydict(planted, schema=ev.schema)]
        ),
        out / "events.parquet",
    )
    _symlink_rest(out, {"events"})
    return str(out)


def test_sequence_pack_planted_multibin(spark, pack_dir):
    rows = _compare(spark, "sequence_pack", pack_dir)
    packed = {
        r[1]: (r[2], r[3]) for r in rows if r[0] == _PACK_SOURCE
    }
    assert packed == _PACK_EXPECT
    # the untouched sources still pack into the single bin 0
    other_bins = {r[1] for r in rows if r[0] != _PACK_SOURCE}
    assert other_bins == {0}, (
        "fixture sources now span bins — the planted multi-bin pin can "
        "be retired"
    )
    # exact fill ratios: identical BIGINTs over the constant capacity
    by_bin = {r[1]: r[4] for r in rows if r[0] == _PACK_SOURCE}
    assert by_bin[0] == pytest.approx(2700 / 2048)
    assert by_bin[2] == pytest.approx(900 / 2048)


def test_json_extract_planted_nonzero_min(spark, ghost_events_dir):
    rows = _compare(spark, "json_extract", ghost_events_dir)
    by_type = {r[0]: r for r in rows}
    got = by_type[_GHOST_TYPE]
    # (n_events, sum_k, min_k, max_k, n_distinct_k)
    assert tuple(got[1:]) == (3, 21, 5, 9, 3)
    # the fixture types keep the all-zero min this pin exists for
    assert all(
        r[3] == 0 for t, r in by_type.items() if t != _GHOST_TYPE
    ), "fixture min_k no longer vacuous — planted pin can be retired"


def test_part_revenue_concentration_cross_engine_at_sf0001(spark):
    """The concentration threshold (revenue share > 1/DENOM) passes no
    part at the driver's sf0.01 — the op's only non-vacuous fixture SF
    is sf0.001, so pin the full hash-compare there."""
    rows = _compare(spark, "part_revenue_concentration", SF_SRC)
    assert len(rows) > 0
