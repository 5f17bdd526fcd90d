#!/usr/bin/env python
"""NULL-cell robustness audit: rebuild every catalog table from the
sf0.001 fixture with ~1/3 of the CELLS in every column NULLed (a
deterministic per-column stagger), then run every registered operator
and cross-compare Spark vs DuckDB for the oracle-backed keys.

Why this input matters: the fixtures are 100% non-NULL, so no oracle
has ever been exercised on NULL cells — yet NULL-riddled columns are
the second classic botched-migration signature after the empty table
(failed casts, schema drift, a loader writing placeholder NULLs).  The
engine-divergence surface is real and invisible on clean data:

- default NULL *ordering* differs (Spark ASC = NULLS FIRST, DuckDB =
  NULLS LAST) — any top-k / LIMIT / row_number()=1 cut keyed on a
  now-nullable expression can keep different survivors;
- NULL *propagation* differs per function (DuckDB concat() skips
  NULLs, Spark concat() propagates; both concat_ws skip);
- Python/Arrow kernels and driver-side numpy solves can crash on None
  cells the same way the r17 empty-catalog sweep crashed on zero rows.

The stagger `(i*31 + j*17) % 3 == 0` (row i, column ordinal j) keeps
~2/3 of every column live, varies which columns are NULL together, and
is deterministic run-to-run.  ALL columns are nullified — keys
included: NULL join keys must drop identically, NULL group keys must
form one group identically, on both engines.

Usage:
    python scripts/null_catalog_audit.py [key ...]
    # default: all registered keys; exit 1 on any non-allowlisted
    # MISMATCH/ERROR.
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

# Keys whose NULL-catalog divergence is adjudicated ACCEPTABLE and
# documented.  Keep SHORT — every entry is a known divergence a future
# fix could retire, not a license.
ALLOWLIST: dict[str, str] = {}


def build_null_dir() -> str:
    out = tempfile.mkdtemp(prefix="null_catalog_")
    from googlecloudstorage_blueprints_spark.sources.catalog import TABLES

    for t in TABLES:
        tbl = pq.read_table(f"{SRC_SF}/{t}.parquet")
        arrays = []
        fields = []
        for j, field in enumerate(tbl.schema):
            vals = tbl.column(j).to_pylist()
            vals = [
                None if (i * 31 + j * 17) % 3 == 0 else v
                for i, v in enumerate(vals)
            ]
            arrays.append(pa.array(vals, field.type))
            fields.append(pa.field(field.name, field.type, nullable=True))
        pq.write_table(
            pa.table(dict(zip([f.name for f in fields], arrays)),
                     schema=pa.schema(fields)),
            f"{out}/{t}.parquet",
        )
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

    spark = get_spark(app_name="null-catalog-audit")
    queries = all_queries()
    oracles = all_oracles()
    keys = sys.argv[1:] or sorted(queries)

    sf_dir = build_null_dir()
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
                f"spark={str(diff[0])[:120]} duck={str(diff[1])[:120]}"
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
