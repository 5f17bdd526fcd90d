#!/usr/bin/env python3
"""Dump `.explain("formatted")` for named registered queries to files.

Usage: python scripts/dump_query_plans.py OUTDIR SUFFIX op1 [op2 ...]

Writes OUTDIR/<op>_<SUFFIX>.txt at sf0.1 — the judge-facing plan
artifacts under plans/r{N}/.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from googlecloudstorage_blueprints_spark.operators import all_queries  # noqa: E402
from googlecloudstorage_blueprints_spark.plans.inspect import (  # noqa: E402
    explain_str,
)
from googlecloudstorage_blueprints_spark.session import get_spark  # noqa: E402

SF = "/root/testdata/sf0.1"


def main() -> None:
    outdir, suffix, *ops = sys.argv[1:]
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark(app_name="dump-query-plans")
    qs = all_queries()
    for name in ops:
        df = qs[name](spark, SF)
        plan = explain_str(df)
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print("wrote", path)
    spark.stop()


if __name__ == "__main__":
    main()
