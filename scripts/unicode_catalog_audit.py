#!/usr/bin/env python
"""Hostile-unicode robustness audit: rebuild the documents table from
24 adversarial texts (emoji/ZWJ, astral plane, CJK, RTL + bidi marks,
NFC-vs-NFD accents, NUL byte, zero-width and exotic whitespace,
Turkish dotless-i, sharp-s casing, non-ASCII digits, Cyrillic
lookalikes, 10k-char single token) and cross-compare every
oracle-backed operator Spark-vs-DuckDB on the modified catalog.

Why this input matters: the text/corpus family leans on engine string
primitives whose unicode behavior is easy to assume and hard to see on
ASCII-ish fixtures — regex classes (\\s, \\w, \\d) over exotic
whitespace and non-ASCII digits, length() code-point counting over
astral chars, upper/lower over locale-sensitive case pairs (ß, İ),
split/tokenize over ZWSP/NBSP, md5 canonicalization over 4-byte UTF-8
— exactly where a Java regex engine and DuckDB's RE2/ICU could
silently part ways.  The fixture corpus never exercises them; this
sweep does, for the whole oracle surface at once.

Usage:
    python scripts/unicode_catalog_audit.py [key ...]
    # default: all registered keys; exit 1 on any non-allowlisted
    # MISMATCH/ERROR.

Non-documents tables are the sf0.001 fixture unchanged, so the
non-text families run as a control group.  The documents schema is
preserved (doc_id/text/lang/source/n_chars, n_chars = code points —
the generator's contract).
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

# Keys whose hostile-unicode divergence is adjudicated ACCEPTABLE and
# documented.  Keep SHORT — every entry is a known divergence a future
# fix could retire, not a license.
ALLOWLIST: dict[str, str] = {}

HOSTILE_TEXTS = [
    # every invisible/ambiguous char is an explicit escape so the list
    # survives editors, linters, and copy-paste intact
    "the quick brown fox jumps over the lazy dog",  # ASCII control doc
    # emoji tokens (4-byte UTF-8)
    "\U0001f600\U0001f600 \U0001f389\U0001f389\U0001f389 \U0001f600",
    # ZWJ family sequence (grapheme != code point != byte)
    "\U0001f469\u200d\U0001f469\u200d\U0001f467\u200d\U0001f466"
    " family "
    "\U0001f469\u200d\U0001f469\u200d\U0001f467\u200d\U0001f466",
    "\u8fd9\u662f\u4e00\u4e2a\u6d4b\u8bd5\u6587\u6863" * 3,  # CJK
    "\u4e2d\u6587 english \u6df7\u5408 text \u4e2d\u6587",
    # Arabic RTL
    "\u0647\u0630\u0627 \u0646\u0635 \u0639\u0631\u0628\u064a"
    " \u0644\u0644\u0627\u062e\u062a\u0628\u0627\u0631",
    # Hebrew + explicit right-to-left mark (U+200F) between tokens
    "\u05e9\u05dc\u05d5\u05dd \u200f \u05e2\u05d5\u05dc\u05dd"
    " \u05e9\u05dc\u05d5\u05dd",
    # NFD combining accents (e + U+0301) ...
    "cafe\u0301 re\u0301sume\u0301 cafe\u0301",
    # ... vs NFC precomposed (U+00E9) — equal-looking, different bytes
    "caf\u00e9 r\u00e9sum\u00e9 caf\u00e9",
    "line1\nline2\ttabbed\r\nline3",
    "null\x00byte token",
    "a" * 10_000,  # one 10k-char token
    "\U0001d54a\U0001d561\U0001d552\U0001d563\U0001d55c"
    " \U0001d54b\U0001d556\U0001d564\U0001d565",  # astral math letters
    "\u0130stanbul \u0131sparta I\u015eIK \u0131\u0131\u0131",  # Turkish
    "STRASSE stra\u00dfe Stra\u00dfe",  # sharp-s casing
    "word\u200bword\u200bword",  # zero-width space between tokens
    "word\u00a0word word",  # NBSP vs space
    "\u03b1\u03bb\u03c6\u03b1 \u03b2\u03b7\u03c4\u03b1"
    " \u03b3\u03b1\u03bc\u03bc\u03b1 \u03b1\u03bb\u03c6\u03b1",
    "\u0440\u0430y\u0440\u0430l versus paypal",  # Cyrillic lookalikes
    "\u201ccurly\u201d \u2018quotes\u2019 \u2014 em\u2014dash"
    " \u2026 ellipsis",
    "\u0663\u0661\u0664 314 \u0969\u0967\u096a",  # Arabic/Devanagari digits
    "a\u2028b\u2029c",  # line/paragraph separators
    "   ",  # whitespace-only
    "\U0001f0a1\U0001f0a2\U0001f0a3 \U0001f0a1",  # playing-card astral run
]


def build_unicode_dir() -> str:
    out = tempfile.mkdtemp(prefix="unicode_catalog_")
    from googlecloudstorage_blueprints_spark.sources.catalog import TABLES

    for t in TABLES:
        if t == "documents":
            continue
        tbl = pq.read_table(f"{SRC_SF}/{t}.parquet")
        pq.write_table(tbl, f"{out}/{t}.parquet")
    base = pq.read_table(f"{SRC_SF}/documents.parquet")
    langs = base.column("lang").to_pylist()
    sources = base.column("source").to_pylist()
    n = len(HOSTILE_TEXTS)
    docs = pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "text": pa.array(HOSTILE_TEXTS, pa.string()),
            "lang": pa.array(
                [langs[i % len(langs)] for i in range(n)], pa.string()
            ),
            "source": pa.array(
                [sources[i % len(sources)] for i in range(n)], pa.string()
            ),
            "n_chars": pa.array(
                [len(t) for t in HOSTILE_TEXTS], pa.int64()
            ),
        },
        schema=base.schema,
    )
    pq.write_table(docs, f"{out}/documents.parquet")
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

    spark = get_spark(app_name="unicode-catalog-audit")
    queries = all_queries()
    oracles = all_oracles()
    keys = sys.argv[1:] or sorted(queries)

    sf_dir = build_unicode_dir()
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
