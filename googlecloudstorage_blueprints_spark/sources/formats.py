"""Structured file-format sources/sinks beyond parquet.

The reference moves opaque bytes regardless of format (SURVEY.md §1.1 —
content is never parsed).  The engine adds typed ingestion for the formats
a pipeline actually encounters, all through Spark's native readers so
pushdown/pruning still apply where the format allows:

- CSV: schema-explicit by default (inference = an extra full read at 100 TB
  — only for exploration), header + null handling options surfaced.
- JSON Lines: schema-explicit for the same reason; ``columnNameOfCorruptRecord``
  keeps bad rows visible instead of silently null.
- text: one row per line — the raw-corpus entry point for the text/dedup
  operators.
- binaryFile: already covered by ``file_manifest`` (operators/fileops_query).

Every path is a Hadoop-FS URI: ``file:/`` in tests, ``gs://`` in
production via the GCS connector — one code path (SURVEY.md §1.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | str | None = None,
    header: bool = True,
    **options,
) -> DataFrame:
    """CSV with explicit schema (pass ``schema=None`` to pay the inference
    scan deliberately)."""
    reader = spark.read.options(header=header, **options)
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", True)
    return reader.csv(path)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: StructType | str | None = None,
    **options,
) -> DataFrame:
    """JSON Lines; corrupt records land in ``_corrupt_record`` when no
    schema is given, or are nulled per-column with one."""
    reader = spark.read.options(**options)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_text(spark: SparkSession, path: str) -> DataFrame:
    """One ``value: string`` row per line — raw-corpus ingestion."""
    return spark.read.text(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite", **options) -> None:
    options.setdefault("header", True)
    df.write.mode(mode).options(**options).csv(path)


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite", **options) -> None:
    df.write.mode(mode).options(**options).json(path)


def read_parquet_evolved(
    spark: SparkSession,
    path: str,
    target_schema: StructType | str | None = None,
) -> DataFrame:
    """Read a parquet dataset whose files span SCHEMA VINTAGES — the
    normal state of a 100 TB lake (columns get added; old files don't
    get rewritten).

    ``mergeSchema`` makes the footer union the scan schema, so files
    missing a newer column yield NULLs for it instead of failing the
    read; with ``target_schema`` given, the result is then projected and
    cast to exactly that schema (select-with-cast, not schema-on-read:
    extra legacy columns drop, missing ones stay NULL, and type widening
    — int→long, float→double — is explicit and visible in the plan).

    mergeSchema costs one footer read per file at planning time (no data
    pass); production keeps it ON for evolving tables and OFF for
    frozen ones.  The fixture-vintage analogue inside the engine is
    sources/catalog.py's timestamp_ntz normalization (round-5 finding:
    physical types drift between fixture generations)."""
    from pyspark.sql import functions as F

    df = spark.read.option("mergeSchema", "true").parquet(path)
    if target_schema is None:
        return df
    if isinstance(target_schema, str):
        from pyspark.sql.types import _parse_datatype_string

        target_schema = _parse_datatype_string(target_schema)
    cols = []
    for field in target_schema.fields:
        if field.name in df.columns:
            cols.append(F.col(field.name).cast(field.dataType))
        else:
            cols.append(F.lit(None).cast(field.dataType).alias(field.name))
    return df.select(*cols)


def read_orc(
    spark: SparkSession,
    path: str,
    schema: StructType | str | None = None,
) -> DataFrame:
    """ORC ingestion (native Spark reader: predicate pushdown, column
    pruning and vectorized decode apply exactly as for parquet).  ORC
    shows up wherever a Hive-era warehouse is the upstream — a 100 TB
    migration reads it in place rather than transcoding first.
    Schema-explicit by the same rule as read_csv/read_jsonl."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.orc(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite", **options) -> None:
    """ORC sink (zlib by default; pass compression='zstd'/'snappy')."""
    df.write.mode(mode).options(**options).orc(path)
