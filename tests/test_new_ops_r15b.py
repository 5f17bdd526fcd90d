"""Closed-form and planted pins for the second r15 operator wave
(events_volume_ewma_backtest / events_type_value_mi)."""

from __future__ import annotations

import math

import pyarrow as pa

from tests.test_new_ops_r12c import _cross_engine, _planted_dir

_DAY_US = 86_400_000_000


def _events_table(rows):
    """rows: (event_id, ts_us, user_id, event_type, value)"""
    return pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )


# --- events_volume_ewma_backtest -----------------------------------------------


def _daily_events(counts, start_day=1000):
    """counts[i] events on day start_day+i."""
    rows, eid = [], 1
    for i, c in enumerate(counts):
        for _ in range(c):
            rows.append(
                (eid, (start_day + i) * _DAY_US + eid, 7, "view", 1.0)
            )
            eid += 1
    return _events_table(rows)


def test_ewma_constant_series_zero_error(spark, tmp_path):
    """Constant daily volume: num63 = 63·c exactly, so every scored
    day has zero error — MAE and WAPE exactly 0.  Cross-engine."""
    sf_dir = _planted_dir(
        tmp_path, {"events": _daily_events([5] * 10)}
    )
    got, _ = _cross_engine(spark, "events_volume_ewma_backtest", sf_dir)
    (row,) = got
    n_scored, err63, mae, wape = row
    assert n_scored == 4  # 10 days, first 6 unscored
    assert err63 == 0 and mae == 0.0 and wape == 0.0


def test_ewma_step_series_closed_form(spark, tmp_path):
    """Step 1→64 (the spine spans observed days, so the pre-step level
    must be nonzero to exist): six days at volume 1, then four at 64.
    Scored days (full 6-lag window), step size 63: errors
    63·63, 63·31, 63·15, 63·7 — the binary-decay catch-up halves the
    residual each day.  Cross-engine."""
    sf_dir = _planted_dir(
        tmp_path, {"events": _daily_events([1] * 6 + [64] * 4)}
    )
    got, _ = _cross_engine(spark, "events_volume_ewma_backtest", sf_dir)
    (row,) = got
    n_scored, err63, mae, wape = row
    assert n_scored == 4
    expect = 63 * (63 + 31 + 15 + 7)
    assert err63 == expect
    assert mae == expect / (63.0 * 4)
    assert wape == expect / (63.0 * 4 * 64)


# --- events_type_value_mi --------------------------------------------------------


def _mi_events(cells):
    """cells: dict[(event_type, bucket)] -> count; bucket 1 → value
    0.05 (cents 5, 1 digit), bucket 2 → value 0.50 (cents 50,
    2 digits)."""
    val = {1: 0.05, 2: 0.50}
    rows, eid = [], 1
    for (etype, bucket), n in cells.items():
        for _ in range(n):
            rows.append((eid, 1_000 * _DAY_US + eid, 7, etype, val[bucket]))
            eid += 1
    return _events_table(rows)


def test_mi_independent_table_reads_exactly_zero(spark, tmp_path):
    """Balanced independent 2×2 (10 per cell): every term's rounded-ln
    combination cancels exactly (round(ln10·1e6) + round(ln40·1e6)
    − 2·round(ln20·1e6) = 0), so MI is EXACTLY 0.  Cross-engine."""
    cells = {
        ("a", 1): 10,
        ("a", 2): 10,
        ("b", 1): 10,
        ("b", 2): 10,
    }
    sf_dir = _planted_dir(tmp_path, {"events": _mi_events(cells)})
    got, _ = _cross_engine(spark, "events_type_value_mi", sf_dir)
    (row,) = got
    n_events, n_cells, mi_num, mi_nats = row
    assert (n_events, n_cells) == (40, 4)
    assert mi_num == 0 and mi_nats == 0.0


def test_mi_diagonal_table_reads_ln2(spark, tmp_path):
    """Perfectly dependent 2×2 diagonal (10, 0, 0, 10): each cell's
    combination is round(ln(2n)·1e6) − round(ln n·1e6) = 693147
    = round(ln 2·1e6), so MI reads exactly 0.693147 nats.
    Cross-engine."""
    cells = {("a", 1): 10, ("b", 2): 10}
    sf_dir = _planted_dir(tmp_path, {"events": _mi_events(cells)})
    got, _ = _cross_engine(spark, "events_type_value_mi", sf_dir)
    (row,) = got
    n_events, n_cells, mi_num, mi_nats = row
    assert (n_events, n_cells) == (20, 2)
    assert mi_num == 20 * 693_147
    assert mi_nats == 0.693147
    assert abs(mi_nats - math.log(2)) < 1e-6


# --- table_row_digest -------------------------------------------------------------


def test_row_digest_flipped_cell_flips_exactly_one_table(spark, tmp_path):
    """Detection pin: copy the fixture, flip ONE lineitem quantity cell
    — that table's digest must change while n_rows and every other
    table's row stay identical.  Both dirs re-run the cross-engine
    compare."""
    import pyarrow.parquet as pq

    from tests.test_new_ops_r12c import SF as SF001

    base_dir = _planted_dir(tmp_path, {})
    got_base, _ = _cross_engine(spark, "table_row_digest", base_dir)

    li = pq.read_table(f"{SF001}/lineitem.parquet")
    qty = li.column("l_quantity").to_pylist()
    qty[0] = qty[0] + 1.0
    flipped = li.set_column(
        li.schema.get_field_index("l_quantity"),
        "l_quantity",
        pa.array(qty, pa.float64()),
    )
    (tmp_path / "b").mkdir()
    flip_dir = _planted_dir(tmp_path / "b", {"lineitem": flipped})
    got_flip, _ = _cross_engine(spark, "table_row_digest", flip_dir)

    base = {r[0]: (r[1], r[2], r[3]) for r in got_base}
    flip = {r[0]: (r[1], r[2], r[3]) for r in got_flip}
    assert set(base) == set(flip) and len(base) == 10
    assert base["lineitem"][0] == flip["lineitem"][0]  # n_rows equal
    assert base["lineitem"][1] != flip["lineitem"][1]  # digest differs
    assert base["lineitem"][2] != flip["lineitem"][2]  # sum differs too
    for t in base:
        if t != "lineitem":
            assert base[t] == flip[t], t


def test_row_digest_duplicate_pair_caught_by_sum_and_n_rows(
    spark, tmp_path
):
    """The documented XOR caveat, now CLOSED (r15 verdict item 4):
    appending a duplicate PAIR of an existing row leaves the XOR
    unchanged — but the modular hash sum moves by 2h ≢ 0 (mod the odd
    prime DIGEST_SUM_MOD), and n_rows moves too, so the triple detects
    the corruption through two independent channels."""
    import pyarrow.parquet as pq

    from tests.test_new_ops_r12c import SF as SF001

    base_dir = _planted_dir(tmp_path, {})
    got_base, _ = _cross_engine(spark, "table_row_digest", base_dir)

    reg = pq.read_table(f"{SF001}/region.parquet")
    dup_pair = pa.concat_tables([reg, reg.slice(0, 1), reg.slice(0, 1)])
    (tmp_path / "b").mkdir()
    dup_dir = _planted_dir(tmp_path / "b", {"region": dup_pair})
    got_dup, _ = _cross_engine(spark, "table_row_digest", dup_dir)

    base = {r[0]: (r[1], r[2], r[3]) for r in got_base}
    dup = {r[0]: (r[1], r[2], r[3]) for r in got_dup}
    assert dup["region"][1] == base["region"][1], "XOR blind to the pair"
    assert dup["region"][2] != base["region"][2], "sum catches the pair"
    assert dup["region"][0] == base["region"][0] + 2, "n_rows catches it"


def test_row_digest_sum_matches_python_reference(spark, tmp_path):
    """Closed-form pin for the modular-sum spelling: recompute region's
    digest_sum in pure Python (md5 of the canonical row string, first
    15 hex digits, Σ mod 2^61-1) and require an exact match — pins the
    canonical string format AND the modulus against drift in either
    engine expression."""
    import hashlib

    import pyarrow.parquet as pq

    from googlecloudstorage_blueprints_spark.operators.audit import (
        DIGEST_SUM_MOD,
    )
    from tests.test_new_ops_r12c import SF as SF001

    base_dir = _planted_dir(tmp_path, {})
    got, _ = _cross_engine(spark, "table_row_digest", base_dir)
    by_table = {r[0]: (r[1], r[2], r[3]) for r in got}

    reg = pq.read_table(f"{SF001}/region.parquet").to_pylist()
    total = 0
    xor = 0
    for row in reg:
        s = f"{row['r_regionkey']}|{row['r_name']}"
        h = int(hashlib.md5(s.encode()).hexdigest()[:15], 16)
        total = (total + h) % DIGEST_SUM_MOD
        xor ^= h
    assert by_table["region"] == (len(reg), xor, total)
