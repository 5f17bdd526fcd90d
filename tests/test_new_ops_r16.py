"""Closed-form and planted pins for the r16 operator wave
(table_column_digest / embedding_epoch_drift)."""

from __future__ import annotations

import hashlib
import math

import pyarrow as pa

from tests.test_new_ops_r12c import _cross_engine, _planted_dir


def _emb_table(rows):
    """rows: (vec_id, embedding list[float], label)"""
    return pa.table(
        {
            "vec_id": pa.array([r[0] for r in rows], pa.int64()),
            "embedding": pa.array(
                [r[1] for r in rows], pa.list_(pa.float32())
            ),
            "label": pa.array([r[2] for r in rows], pa.int32()),
        }
    )


# --- table_column_digest ------------------------------------------------------


def _col_rows(got, cols):
    idx = {c: i for i, c in enumerate(cols)}
    return {
        (r[idx["table_name"]], r[idx["column_name"]]): (
            r[idx["n_nulls"]],
            r[idx["digest"]],
            r[idx["digest_sum"]],
        )
        for r in got
    }


def test_column_digest_flipped_cell_localizes_the_column(spark, tmp_path):
    """Detection pin: flip ONE lineitem quantity cell — exactly the
    (lineitem, l_quantity) row's two digests change; its n_nulls and
    every one of the other 49 rows stay identical.  This is the
    localization property the op exists for."""
    import pyarrow.parquet as pq

    from tests.test_new_ops_r12c import SF as SF001

    base_dir = _planted_dir(tmp_path, {})
    got_base, cols = _cross_engine(spark, "table_column_digest", base_dir)

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
    got_flip, _ = _cross_engine(spark, "table_column_digest", flip_dir)

    base = _col_rows(got_base, cols)
    flip = _col_rows(got_flip, cols)
    assert set(base) == set(flip) and len(base) == 50
    key = ("lineitem", "l_quantity")
    assert base[key][0] == flip[key][0]      # n_nulls unchanged
    assert base[key][1] != flip[key][1]      # xor digest moved
    assert base[key][2] != flip[key][2]      # modular sum moved
    for k in base:
        if k != key:
            assert base[k] == flip[k], k


def test_column_digest_null_cells_counted_and_skipped(spark, tmp_path):
    """NULL-path pin (fixture n_nulls is all-0 — vacuous without this):
    plant two NULL lang cells in documents; (documents, lang) must read
    n_nulls=2 with digests equal to the Python reference over the
    NON-NULL cells only, and every other documents column unchanged."""
    import pyarrow.parquet as pq

    from googlecloudstorage_blueprints_spark.operators.audit import (
        DIGEST_SUM_MOD,
    )
    from tests.test_new_ops_r12c import SF as SF001

    docs = pq.read_table(f"{SF001}/documents.parquet")
    lang = docs.column("lang").to_pylist()
    lang[0] = None
    lang[3] = None
    planted = docs.set_column(
        docs.schema.get_field_index("lang"),
        "lang",
        pa.array(lang, pa.string()),
    )
    sf_dir = _planted_dir(tmp_path, {"documents": planted})
    got, cols = _cross_engine(spark, "table_column_digest", sf_dir)
    rows = _col_rows(got, cols)

    xor = 0
    total = 0
    for cell in lang:
        if cell is None:
            continue
        h = int(hashlib.md5(cell.encode()).hexdigest()[:15], 16)
        xor ^= h
        total = (total + h) % DIGEST_SUM_MOD
    assert rows[("documents", "lang")] == (2, xor, total)


def test_column_digest_python_reference_money_and_ts(spark, tmp_path):
    """Canonical-cell-string pin for the two non-trivial kinds: recompute
    (lineitem, l_extendedprice) — money ×1e4 fixed point — and
    (orders, o_orderdate) — integer epoch µs — in pure Python and
    require exact (n_nulls, digest, digest_sum) matches."""
    import pyarrow.parquet as pq

    from googlecloudstorage_blueprints_spark.operators.audit import (
        DIGEST_SUM_MOD,
    )
    from tests.test_new_ops_r12c import SF as SF001

    sf_dir = _planted_dir(tmp_path, {})
    got, cols = _cross_engine(spark, "table_column_digest", sf_dir)
    rows = _col_rows(got, cols)

    def ref(cells):
        xor = 0
        total = 0
        n_nulls = 0
        for s in cells:
            if s is None:
                n_nulls += 1
                continue
            h = int(hashlib.md5(s.encode()).hexdigest()[:15], 16)
            xor ^= h
            total = (total + h) % DIGEST_SUM_MOD
        return n_nulls, xor, total

    price = pq.read_table(f"{SF001}/lineitem.parquet").column(
        "l_extendedprice"
    ).to_pylist()
    # Python round() is banker's; the engines' ROUND is half-up —
    # floor(x+0.5) matches for the positive money domain
    cells = [
        str(math.floor(v * 10000 + 0.5)) if v is not None else None
        for v in price
    ]
    assert rows[("lineitem", "l_extendedprice")] == ref(cells)

    od = pq.read_table(f"{SF001}/orders.parquet").column(
        "o_orderdate"
    ).to_pylist()
    import datetime as dt

    epoch = dt.datetime(1970, 1, 1)
    cells = [
        str(int((v - epoch).total_seconds()) * 1_000_000
            + (v - epoch).microseconds)
        if v is not None
        else None
        for v in od
    ]
    assert rows[("orders", "o_orderdate")] == ref(cells)


# --- embedding_epoch_drift ----------------------------------------------------


def test_epoch_drift_closed_forms(spark, tmp_path):
    """Planted closed forms across the drift range: label 0 — identical
    unit vectors in both epochs ⇒ drift_cos exactly 1.0; label 1 —
    epoch-0 mass on axis 1, epoch-1 mass on axis 2 ⇒ exactly 0.0;
    label 2 — opposite axes ⇒ exactly -1.0; label 3 — even vec_ids only
    (single epoch) ⇒ NULL on both engines (zero centroid → NULLIF)."""
    e1 = [1.0, 0.0, 0.0, 0.0]
    e2 = [0.0, 1.0, 0.0, 0.0]
    neg1 = [-1.0, 0.0, 0.0, 0.0]
    rows = [
        # label 0: same vector both epochs (vec_ids 0/2 even, 1/3 odd)
        (0, e1, 0), (1, e1, 0), (2, e1, 0), (3, e1, 0),
        # label 1: orthogonal epochs
        (10, e1, 1), (12, e1, 1), (11, e2, 1), (13, e2, 1),
        # label 2: opposite epochs
        (20, e1, 2), (21, neg1, 2),
        # label 3: even ids only — epoch 1 empty
        (30, e1, 3), (32, e2, 3),
    ]
    sf_dir = _planted_dir(tmp_path, {"embeddings": _emb_table(rows)})
    got, cols = _cross_engine(spark, "embedding_epoch_drift", sf_dir)
    idx = {c: i for i, c in enumerate(cols)}
    by_label = {
        r[idx["label"]]: (
            r[idx["n_epoch0"]],
            r[idx["n_epoch1"]],
            r[idx["drift_cos"]],
        )
        for r in got
    }
    assert by_label[0] == (2, 2, 1.0)
    assert by_label[1] == (2, 2, 0.0)
    assert by_label[2] == (1, 1, -1.0)
    assert by_label[3] == (2, 0, None)


# --- table_partition_digest ---------------------------------------------------


def test_partition_digest_rolls_up_to_table_digest(spark, tmp_path):
    """CONSISTENCY pin (the reason a validator can roll partitions up):
    partitions are a disjoint union of the table's rows, so XOR of the
    per-day digests == the events row in ``table_row_digest``, the
    mod-p sum of the per-day sums == its digest_sum, and Σ n_rows ==
    its n_rows."""
    from googlecloudstorage_blueprints_spark.operators.audit import (
        DIGEST_SUM_MOD,
    )

    sf_dir = _planted_dir(tmp_path, {})
    parts, pcols = _cross_engine(spark, "table_partition_digest", sf_dir)
    table, tcols = _cross_engine(spark, "table_row_digest", sf_dir)

    pidx = {c: i for i, c in enumerate(pcols)}
    tidx = {c: i for i, c in enumerate(tcols)}
    n = x = s = 0
    for r in parts:
        n += r[pidx["n_rows"]]
        x ^= r[pidx["digest"]]
        s = (s + r[pidx["digest_sum"]]) % DIGEST_SUM_MOD
    events_row = next(
        r for r in table if r[tidx["table_name"]] == "events"
    )
    assert (n, x, s) == (
        events_row[tidx["n_rows"]],
        events_row[tidx["digest"]],
        events_row[tidx["digest_sum"]],
    )


def test_partition_digest_flipped_cell_localizes_the_day(spark, tmp_path):
    """Detection pin: flip ONE event's value — exactly that event's
    epoch_day row changes (both digests, same n_rows); every other
    day's row stays identical."""
    import pyarrow.parquet as pq

    from tests.test_new_ops_r12c import SF as SF001

    base_dir = _planted_dir(tmp_path, {})
    got_base, cols = _cross_engine(
        spark, "table_partition_digest", base_dir
    )

    ev = pq.read_table(f"{SF001}/events.parquet")
    vals = ev.column("value").to_pylist()
    vals[0] = (vals[0] or 0.0) + 1.0
    ts0 = ev.column("ts").to_pylist()[0]
    import datetime as dt

    flipped_day = int(
        (ts0 - dt.datetime(1970, 1, 1)).total_seconds() * 1_000_000
    ) // 86_400_000_000
    flipped = ev.set_column(
        ev.schema.get_field_index("value"),
        "value",
        pa.array(vals, pa.float64()),
    )
    (tmp_path / "b").mkdir()
    flip_dir = _planted_dir(tmp_path / "b", {"events": flipped})
    got_flip, _ = _cross_engine(spark, "table_partition_digest", flip_dir)

    idx = {c: i for i, c in enumerate(cols)}
    base = {
        r[idx["epoch_day"]]: (
            r[idx["n_rows"]], r[idx["digest"]], r[idx["digest_sum"]],
        )
        for r in got_base
    }
    flip = {
        r[idx["epoch_day"]]: (
            r[idx["n_rows"]], r[idx["digest"]], r[idx["digest_sum"]],
        )
        for r in got_flip
    }
    assert set(base) == set(flip)
    assert base[flipped_day][0] == flip[flipped_day][0]  # n_rows equal
    assert base[flipped_day][1] != flip[flipped_day][1]
    assert base[flipped_day][2] != flip[flipped_day][2]
    for d in base:
        if d != flipped_day:
            assert base[d] == flip[d], d
