#!/usr/bin/env python
"""Zero-row robustness audit: run every registered operator against an
EMPTY catalog (all ten tables present with their real schemas, zero
rows) and cross-compare Spark vs DuckDB for the oracle-backed keys.

Why this input matters: the `validate` family exists because table
copies go wrong, and the most common botched copy is an EMPTY one (a
move that wrote the directory but no rows, a backfill that matched
nothing).  The r16 advice found one latent divergence of this class
(`table_column_digest.n_nulls`: Spark SUM over zero rows is NULL, the
oracle's COUNT(*) FILTER is 0) that fixtures can never exercise — this
script sweeps the whole surface for the rest of the class.

Usage:
    python scripts/empty_catalog_audit.py [--mode empty|single] [key ...]
    # default: --mode empty, all keys.  --mode single audits the
    # one-row-per-table degenerate-statistics catalog instead.

Output: one line per key — MATCH / MISMATCH / SPARK_ERROR /
DUCK_ERROR / ROWS_ONLY_{OK,ERROR} — and a nonzero exit if any
non-allowlisted MISMATCH/ERROR appears.  Allowlisted divergences are
documented where they land (each needs an adjudication note below).
"""

from __future__ import annotations

import math
import os
import sys
import tempfile
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402
import pyarrow as pa  # noqa: E402
import pyarrow.parquet as pq  # noqa: E402

SRC_SF = "/root/testdata/sf0.001"

# Keys whose empty-catalog behavior is adjudicated ACCEPTABLE and
# documented.  Keep this list SHORT — every entry is a known divergence
# a future fix could retire, not a license.
ALLOWLIST: dict[str, str] = {}


def build_empty_dir() -> str:
    out = tempfile.mkdtemp(prefix="empty_catalog_")
    from googlecloudstorage_blueprints_spark.sources.catalog import TABLES

    for t in TABLES:
        schema = pq.read_schema(f"{SRC_SF}/{t}.parquet")
        pq.write_table(schema.empty_table(), f"{out}/{t}.parquet")
    return out


def build_single_row_dir() -> str:
    """One row per table (the head row of the sf0.001 fixture) — the
    degenerate-statistics input: var_samp's n-1 = 0, percentile of a
    single value, every lag/lead NULL, one group everywhere.  FK
    integrity across tables is NOT preserved (a head orders row need
    not reference the head customer) — ops must tolerate that too."""
    out = tempfile.mkdtemp(prefix="single_row_catalog_")
    from googlecloudstorage_blueprints_spark.sources.catalog import TABLES

    for t in TABLES:
        tbl = pq.read_table(f"{SRC_SF}/{t}.parquet")
        pq.write_table(tbl.slice(0, 1), f"{out}/{t}.parquet")
    return out


def canon_value(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, bool):
        return "true" if v else "false"
    return str(v)


def canon_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        tuple(canon_value(row[i]) for i in order) for row in rows
    )


def main() -> int:
    from googlecloudstorage_blueprints_spark.operators import (
        all_oracles,
        all_queries,
    )
    from googlecloudstorage_blueprints_spark.session import get_spark
    from googlecloudstorage_blueprints_spark.sources.catalog import TABLES

    spark = get_spark(app_name="empty-catalog-audit")
    queries = all_queries()
    oracles = all_oracles()
    argv = sys.argv[1:]
    mode = "empty"
    if argv[:1] == ["--mode"]:
        mode = argv[1]
        argv = argv[2:]
    keys = argv or sorted(queries)

    sf_dir = build_empty_dir() if mode == "empty" else build_single_row_dir()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    bad = []
    for name in keys:
        if name not in queries:
            print(f"SKIP {name}: not registered")
            continue
        try:
            sdf = queries[name](spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            tag = "ROWS_ONLY_ERROR" if name not in oracles else "SPARK_ERROR"
            msg = str(e).splitlines()[0][:160] if str(e) else repr(e)[:160]
            print(f"{tag} {name}: {type(e).__name__}: {msg}")
            if name not in ALLOWLIST:
                bad.append((name, tag))
            continue
        if name not in oracles:
            print(f"ROWS_ONLY_OK {name}: rows={len(srows)}")
            continue
        try:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:
            msg = str(e).splitlines()[0][:160]
            print(f"DUCK_ERROR {name}: {type(e).__name__}: {msg}")
            if name not in ALLOWLIST:
                bad.append((name, "DUCK_ERROR"))
            continue
        s = canon_rows(scols, srows)
        d = canon_rows(dcols, drows)
        if sorted(scols) != sorted(dcols):
            print(f"MISMATCH {name}: columns {sorted(scols)} vs {sorted(dcols)}")
            if name not in ALLOWLIST:
                bad.append((name, "MISMATCH"))
        elif s != d:
            diff = next(
                (
                    (a, b)
                    for a, b in zip(s + [None] * len(d), d + [None] * len(s))
                    if a != b
                ),
                None,
            )
            print(
                f"MISMATCH {name}: rows {len(s)} vs {len(d)}; first diff "
                f"spark={diff[0]} duck={diff[1]}"
            )
            if name not in ALLOWLIST:
                bad.append((name, "MISMATCH"))
        else:
            print(f"MATCH {name}: rows={len(s)}")

    print(f"\n{len(bad)} non-allowlisted finding(s)")
    for name, tag in bad:
        print(f"  {tag} {name}")
    return 1 if bad else 0


if __name__ == "__main__":
    try:
        sys.exit(main())
    except Exception:
        traceback.print_exc()
        sys.exit(2)
