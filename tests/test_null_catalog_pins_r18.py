"""NULL-cell robustness pins (r18 null-catalog audit).

After the empty table, the second classic botched-migration signature
is a NULL-riddled one (failed casts, schema drift, placeholder-writing
loaders).  The fixtures are 100% non-NULL, so none of the oracle
surface had ever been exercised on NULL cells; the full sweep
(``scripts/null_catalog_audit.py`` — all 318 keys, standing round-open
script, ~1/3 of every column's cells NULLed in a deterministic
stagger) found 56 broken keys in five classes, all fixed
identity-on-non-NULL-input:

- NULL-ORDERING divergence: Spark's ASC default is NULLS FIRST,
  DuckDB's NULLS LAST (mirrored for DESC) — every window / top-k /
  rank cut either drops un-orderable NULL-key rows on BOTH engines
  (sequencing ops: an event without a ts has no position) or spells
  NULLS FIRST explicitly in the oracle (pure window ops).
- NULL GROUP KEYS: Spark ``groupBy`` forms one NULL mega-group
  (mega-basket, mega-cluster) where the oracle's self-join or
  dimension join drops NULL keys — basket/shingle/rank frames filter
  NULL entity keys on BOTH engines.
- NULL PROPAGATION: Spark concat propagates NULL, DuckDB concat()
  skips (oracle now uses ``||``); Spark concat_ws over an empty
  collect_set is '' while DuckDB string_agg is NULL (oracle now
  COALESCEs); word_shingles(NULL text) manufactured a [""] shingle on
  Spark only (a 167-doc phantom clique — text filtered both engines).
- ENGINE QUIRK: DuckDB's ASOF JOIN matches a NULL-ts probe
  POSITIONALLY (NULLS LAST puts it after every right row, claiming
  the newest match) — the oracle CASE-guards its outputs on e.ts.
- CRASH class: numpy/Arrow kernels died on None cells
  (np.array/vstack), and a NULL-day group zeroed an ANSI-division
  denominator — vector frames filter NULL vec_id/embedding, the
  division is NULLIF-guarded.

This file pins one representative per class on a SMALL staggered-NULL
catalog; the standing audit re-checks all 318 keys each round.
"""

from __future__ import annotations

import math

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from googlecloudstorage_blueprints_spark.operators import (
    all_oracles,
    all_queries,
)
from googlecloudstorage_blueprints_spark.sources.catalog import TABLES

SRC_SF = "/root/testdata/sf0.001"
SLICE_ROWS = 150  # small but NULL-dense enough to fire every class

PINNED_KEYS = [
    # NULL-ordering: sequencing drop / NULLS FIRST oracle windows
    "events_sessionize",
    "window_analytic",
    "arg_min_max",
    "weighted_sample_topk",
    "global_row_number",
    # NULL group keys: baskets / shingles / distinct-vs-collect_set
    "part_copurchase_lift",
    "ngram_jaccard_dedup",
    "user_growth_accounting",
    # NULL propagation
    "doc_fingerprint",
    "string_agg_groups",
    # DuckDB ASOF positional NULL-probe quirk
    "join_asof",
    # unbalanced sweep-line deltas
    "orders_inflight_monthly",
    # crash class (rows-only: pin is "runs, typed, no crash")
    "similarity_knn_pandas",
    "embedding_norms",
    "events_new_vs_returning",
]


@pytest.fixture(scope="module")
def null_dir(tmp_path_factory):
    """First SLICE_ROWS rows of every table with the audit's stagger:
    cell (row i, column ordinal j) is NULLed when (i*31 + j*17) % 3 == 0
    — ~1/3 of every column, varying which columns go NULL together."""
    out = tmp_path_factory.mktemp("null_catalog_small")
    for t in TABLES:
        tbl = pq.read_table(f"{SRC_SF}/{t}.parquet").slice(0, SLICE_ROWS)
        arrays, fields = [], []
        for j, field in enumerate(tbl.schema):
            vals = [
                None if (i * 31 + j * 17) % 3 == 0 else v
                for i, v in enumerate(tbl.column(j).to_pylist())
            ]
            arrays.append(pa.array(vals, field.type))
            fields.append(pa.field(field.name, field.type, nullable=True))
        pq.write_table(
            pa.table(
                dict(zip([f.name for f in fields], arrays)),
                schema=pa.schema(fields),
            ),
            out / f"{t}.parquet",
        )
    return str(out)


def _canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else repr(v)
    if isinstance(v, bool):
        return "true" if v else "false"
    return str(v)


@pytest.mark.parametrize("name", PINNED_KEYS)
def test_null_catalog_runs_and_matches_oracle(spark, null_dir, name):
    queries, oracles = all_queries(), all_oracles()
    sdf = queries[name](spark, null_dir)
    srows = [tuple(r) for r in sdf.collect()]
    if name not in oracles:
        assert sdf.columns
        return
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{null_dir}/{t}.parquet')"
        )
    res = con.execute(oracles[name])
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    con.close()
    assert sorted(sdf.columns) == sorted(dcols), name
    sorder = sorted(range(len(sdf.columns)), key=lambda i: sdf.columns[i])
    dorder = sorted(range(len(dcols)), key=lambda i: dcols[i])
    s = sorted(tuple(_canon(r[i]) for i in sorder) for r in srows)
    d = sorted(tuple(_canon(r[i]) for i in dorder) for r in drows)
    assert s == d, f"{name}: spark={s[:3]} duck={d[:3]}"


def test_null_stagger_actually_nulls_cells(null_dir):
    """Guard the pin's premise: the staggered catalog really carries
    NULLs in every column (a refactor that dropped the stagger would
    turn every pin above vacuous)."""
    for t in TABLES:
        tbl = pq.read_table(f"{null_dir}/{t}.parquet")
        for j in range(tbl.num_columns):
            assert tbl.column(j).null_count > 0, (t, j)
