#!/usr/bin/env python
"""Round-start fixture preflight: print every table's physical parquet
schema at each SF and FLAG the drift classes that have bitten before
(r5: events.ts / o_orderdate / l_shipdate switched TIMESTAMP(NANOS) →
TIMESTAMP(MICROS, ntz) between rounds; the catalog + stream sources
normalize ntz → TIMESTAMP, but a NEW physical type needs a look).

Run FIRST THING each round, before touching operators:

    python scripts/preflight_fixtures.py            # all SFs
    python scripts/preflight_fixtures.py sf0.01     # one SF

Exit 1 if a timestamp-ish column carries a type outside the known set
{timestamp[us], timestamp[ns], timestamp[us, tz=...], int64} or a
table/column from the catalog contract is missing.
"""

from __future__ import annotations

import sys

import pyarrow.parquet as pq

BASE = "/root/testdata"
SFS = ["sf0.001", "sf0.01", "sf0.1"]
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()
# columns whose physical type has drifted between rounds
TS_COLUMNS = {
    "events": ["ts"],
    "orders": ["o_orderdate"],
    "lineitem": ["l_shipdate"],
}
KNOWN_TS = {"timestamp[us]", "timestamp[ns]", "int64"}


def main() -> int:
    sfs = sys.argv[1:] or SFS
    bad = []
    for sf in sfs:
        print(f"== {sf} ==")
        for t in TABLES:
            path = f"{BASE}/{sf}/{t}.parquet"
            try:
                schema = pq.read_schema(path)
            except Exception as exc:  # missing table = contract break
                bad.append(f"{sf}/{t}: unreadable ({exc})")
                print(f"  {t}: UNREADABLE")
                continue
            cols = {f.name: str(f.type) for f in schema}
            print(f"  {t}: {cols}")
            for c in TS_COLUMNS.get(t, []):
                ty = cols.get(c)
                if ty is None:
                    bad.append(f"{sf}/{t}.{c}: column missing")
                elif ty not in KNOWN_TS and not ty.startswith(
                    "timestamp[us"
                ):
                    bad.append(f"{sf}/{t}.{c}: NEW physical type {ty}")
    if bad:
        print("\nPREFLIGHT FLAGS:")
        for b in bad:
            print(" -", b)
        return 1
    print("\npreflight clean")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
