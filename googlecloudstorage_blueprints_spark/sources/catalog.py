"""Fixture-table catalog: one place that knows how to load every table.

Tables (one parquet each, ``TESTDATA.md``): ``region nation customer
supplier part orders lineitem events documents embeddings``.

The only type quirk is ``events.ts``: the fixture stores parquet
``TIMESTAMP(NANOS)``, which Spark's parquet reader rejects outright
(``PARQUET_TYPE_ILLEGAL``).  We set ``spark.sql.legacy.parquet.nanosAsLong``
(runtime-settable) so the column arrives as int64 nanoseconds, then convert
with **integer division** ``ts div 1000`` → ``timestamp_micros``.  Integer
division truncates exactly the way DuckDB's reader truncates ns → µs, so the
DuckDB oracle and Spark see bit-identical microsecond timestamps.  (Floating
division would round — 1.7e18 exceeds a double's 53-bit integer range — and
drift from the oracle by ±1 µs.)

Scale note: the conversion is a per-row projection fused into the scan by
whole-stage codegen; predicate pushdown on the remaining columns is
unaffected.  At 100 TB the events table would be a partitioned directory —
``load_table`` takes any path the parquet reader takes (directories, globs).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

__all__ = ["TABLES", "load_table", "register_views"]

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table as a DataFrame."""
    path = f"{sf_dir}/{name}.parquet"
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        if dict(df.dtypes).get("ts") == "bigint":
            # int64 nanos → µs timestamp, truncating like DuckDB's reader
            df = df.withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000"))
            )
        return df
    return spark.read.parquet(path)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view (for spark.sql use)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
