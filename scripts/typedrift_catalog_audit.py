#!/usr/bin/env python
"""Type-drift robustness audit: rebuild the catalog from the sf0.001
fixture with PLAUSIBLE physical-schema drifts, run every registered
operator, and cross-compare Spark vs DuckDB for the oracle-backed keys.

Why this input matters: the driver REGENERATES fixtures between rounds
and their physical types have already drifted twice — r5 switched every
timestamp from TIMESTAMP(NANOS) to TIMESTAMP(MICROS, ntz) (events ops
died with DATATYPE_MISMATCH until the catalog normalized), and the r14
packed pair key had to be int32-proofed because a regen to 32-bit
partkeys would have made ``shiftleft(x, 32)`` silently degenerate
(Java masks the shift count).  This audit rehearses the next regen
instead of debugging it live:

- ``narrow``: every int64 column whose values fit becomes int32, and
  every string becomes large_string — the "generator switched dtypes"
  regen.  Catches 32-bit arithmetic traps (ANSI overflow THROWS in
  Spark 4) and reader quirks.
- ``nanos``: every timestamp[us] becomes timestamp[ns] — the r5
  ORIGINAL vintage.  Spark's parquet reader rejects NANOS outright
  unless ``spark.sql.legacy.parquet.nanosAsLong`` is set and the int64
  nanos are truncated to µs exactly like DuckDB's reader truncates.
- ``tzaware``: every timestamp[us] becomes timestamp[us, tz=UTC] — the
  instant-semantics vintage.  Values are the same microseconds; the
  session timezones (Spark pinned UTC, DuckDB set to UTC here) must
  relabel without shifting.

Usage:
    python scripts/typedrift_catalog_audit.py [--mode narrow|nanos|tzaware] [key ...]
    # default: all three modes over all registered keys; exit 1 on any
    # non-allowlisted MISMATCH/ERROR.
"""

from __future__ import annotations

import argparse
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

MODES = ("narrow", "nanos", "tzaware")

# (mode, key) divergences adjudicated ACCEPTABLE and documented.
ALLOWLIST: dict[tuple[str, str], str] = {}

INT32_MIN, INT32_MAX = -(2**31), 2**31 - 1


def _drift_field(mode: str, field: pa.Field, col: pa.ChunkedArray):
    t = field.type
    if mode == "narrow":
        if pa.types.is_int64(t):
            import pyarrow.compute as pc

            mn, mx = pc.min(col).as_py(), pc.max(col).as_py()
            if mn is not None and INT32_MIN <= mn and mx <= INT32_MAX:
                return pa.int32()
        if pa.types.is_string(t):
            return pa.large_string()
    elif mode == "nanos":
        if pa.types.is_timestamp(t) and t.unit == "us" and t.tz is None:
            return pa.timestamp("ns")
    elif mode == "tzaware":
        if pa.types.is_timestamp(t) and t.unit == "us" and t.tz is None:
            return pa.timestamp("us", tz="UTC")
    return None


def build_drift_dir(mode: str) -> str:
    out = tempfile.mkdtemp(prefix=f"typedrift_{mode}_")
    from googlecloudstorage_blueprints_spark.sources.catalog import TABLES

    for t in TABLES:
        tbl = pq.read_table(f"{SRC_SF}/{t}.parquet")
        arrays, fields = [], []
        for j, field in enumerate(tbl.schema):
            col = tbl.column(j)
            new_t = _drift_field(mode, field, col)
            if new_t is not None:
                col = col.cast(new_t)
                field = pa.field(field.name, new_t, nullable=True)
            arrays.append(col)
            fields.append(field)
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


def run_mode(spark, mode: str, keys, queries, oracles, bad) -> None:
    from googlecloudstorage_blueprints_spark.sources.catalog import TABLES

    sf_dir = build_drift_dir(mode)
    con = duckdb.connect()
    # deterministic strftime/epoch on tz-aware reads: the driver's box
    # runs UTC; pin it so the audit doesn't depend on host config
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    for name in keys:
        if name not in queries:
            print(f"SKIP {mode}/{name}: not registered")
            continue
        try:
            sdf = queries[name](spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            tag = "ROWS_ONLY_ERROR" if name not in oracles else "SPARK_ERROR"
            msg = str(e).splitlines()[0][:160] if str(e) else repr(e)[:160]
            print(f"{tag} {mode}/{name}: {type(e).__name__}: {msg}")
            if (mode, name) not in ALLOWLIST:
                bad.append((mode, name, tag))
            continue
        if name not in oracles:
            print(f"ROWS_ONLY_OK {mode}/{name}: rows={len(srows)}")
            continue
        try:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:
            msg = str(e).splitlines()[0][:160]
            print(f"DUCK_ERROR {mode}/{name}: {type(e).__name__}: {msg}")
            if (mode, name) not in ALLOWLIST:
                bad.append((mode, name, "DUCK_ERROR"))
            continue
        s = canon_rows(scols, srows)
        d = canon_rows(dcols, drows)
        if sorted(scols) != sorted(dcols):
            print(
                f"MISMATCH {mode}/{name}: columns "
                f"{sorted(scols)} vs {sorted(dcols)}"
            )
            if (mode, name) not in ALLOWLIST:
                bad.append((mode, name, "MISMATCH"))
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
                f"MISMATCH {mode}/{name}: rows {len(s)} vs {len(d)}; "
                f"first diff spark={str(diff[0])[:120]} "
                f"duck={str(diff[1])[:120]}"
            )
            if (mode, name) not in ALLOWLIST:
                bad.append((mode, name, "MISMATCH"))
        else:
            print(f"MATCH {mode}/{name}: rows={len(s)}")
    con.close()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=MODES, default=None)
    ap.add_argument("keys", nargs="*")
    args = ap.parse_args()

    from googlecloudstorage_blueprints_spark.operators import (
        all_oracles,
        all_queries,
    )
    from googlecloudstorage_blueprints_spark.session import get_spark

    spark = get_spark(app_name="typedrift-audit")
    queries = all_queries()
    oracles = all_oracles()
    keys = args.keys or sorted(queries)
    modes = [args.mode] if args.mode else list(MODES)

    bad: list[tuple[str, str, str]] = []
    for mode in modes:
        run_mode(spark, mode, keys, queries, oracles, bad)

    print(f"\n{len(bad)} non-allowlisted finding(s)")
    for mode, name, tag in bad:
        print(f"  {tag} {mode}/{name}")
    return 1 if bad else 0


if __name__ == "__main__":
    try:
        sys.exit(main())
    except Exception:
        traceback.print_exc()
        sys.exit(2)
