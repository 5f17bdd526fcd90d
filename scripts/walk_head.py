#!/usr/bin/env python
"""Walk the EXACT driver head-N in rotation order — the per-round
insurance replica of the driver's adjudication window.

Runs each of the first N keys of ``operators/_driver_order.DRIVER_FIRST``
against the sf0.01 fixtures (the driver's t2 dir) and hash-compares
oracle-backed keys against DuckDB exactly like tests/test_oracle_parity.py;
rows-only keys are checked for rows>0 (a zero-row rows-only result counts
as a failure — it would make the driver's check vacuous).  Exit 1 on any
mismatch.

    python scripts/walk_head.py          # head-50 at /root/testdata/sf0.01
    python scripts/walk_head.py 30       # head-30
    WALK_SF_DIR=... python scripts/walk_head.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0,
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"
    ),
)


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    sf = os.environ.get("WALK_SF_DIR", "/root/testdata/sf0.01")

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    from googlecloudstorage_blueprints_spark.operators import (
        all_oracles,
        all_queries,
    )
    from googlecloudstorage_blueprints_spark.operators._driver_order import (
        DRIVER_FIRST,
    )
    from test_oracle_parity import _canon_rows, _duck

    qs, oracles = all_queries(), all_oracles()
    fails = []
    for i, name in enumerate(DRIVER_FIRST[:n]):
        sdf = qs[name](spark, sf)
        srows = [tuple(r) for r in sdf.collect()]
        if name in oracles:
            con = _duck(sf)
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
            con.close()
            ok = sorted(sdf.columns) == sorted(dcols) and _canon_rows(
                sdf.columns, srows
            ) == _canon_rows(dcols, drows)
            status = "PASS" if ok else "FAIL"
            if not ok:
                fails.append(name)
        else:
            status = f"rows-only rows={len(srows)}"
            if not srows:
                status += " (ZERO ROWS — vacuous)"
                fails.append(name)
        print(f"{i:3d} {name}: {status}", flush=True)
    print("FAILS:", fails)
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
