"""Format round-trips: CSV and JSONL preserve values against the parquet
ground truth; corrupt JSON rows stay visible."""

from __future__ import annotations

import pyspark.sql.functions as F

from googlecloudstorage_blueprints_spark.sources import (
    load_table,
    read_csv,
    read_jsonl,
    read_text,
    write_csv,
    write_jsonl,
)

SF = "/root/testdata/sf0.001"


def _canon(df, keys):
    return sorted(tuple(r) for r in df.select(*keys).collect())


def test_csv_roundtrip_with_schema(spark, tmp_path):
    nation = load_table(spark, SF, "nation")
    out = f"file:{tmp_path}/nation_csv"
    write_csv(nation, out)
    back = read_csv(
        spark, out, schema="n_nationkey int, n_name string, n_regionkey int"
    )
    cols = ["n_nationkey", "n_name", "n_regionkey"]
    assert _canon(back, cols) == _canon(nation, cols)


def test_csv_inference_types(spark, tmp_path):
    supplier = load_table(spark, SF, "supplier")
    out = f"file:{tmp_path}/supplier_csv"
    write_csv(supplier, out)
    inferred = read_csv(spark, out, schema=None)
    types = dict(inferred.dtypes)
    assert types["s_acctbal"] == "double"
    assert types["s_suppkey"] in ("int", "bigint")


def test_jsonl_roundtrip(spark, tmp_path):
    region = load_table(spark, SF, "region")
    out = f"file:{tmp_path}/region_json"
    write_jsonl(region, out)
    back = read_jsonl(spark, out, schema="r_regionkey int, r_name string")
    cols = ["r_regionkey", "r_name"]
    assert _canon(back, cols) == _canon(region, cols)


def test_jsonl_corrupt_record_visible(spark, tmp_path):
    p = tmp_path / "bad.jsonl"
    p.write_text('{"a": 1}\nnot json at all\n{"a": 2}\n')
    df = read_jsonl(spark, f"file:{p}")
    assert "_corrupt_record" in df.columns
    # Spark disallows selecting ONLY the corrupt-record column from a raw
    # json scan; cache materializes the full rows first
    df = df.cache()
    good = df.where(F.col("_corrupt_record").isNull()).count()
    bad = df.where(F.col("_corrupt_record").isNotNull()).count()
    assert (good, bad) == (2, 1)


def test_read_text_lines(spark, tmp_path):
    p = tmp_path / "corpus.txt"
    p.write_text("doc one\ndoc two\n")
    df = read_text(spark, f"file:{p}")
    assert df.columns == ["value"]
    assert sorted(r["value"] for r in df.collect()) == ["doc one", "doc two"]


def test_csv_header_can_be_disabled(spark, tmp_path):
    region = load_table(spark, SF, "region")
    out = f"file:{tmp_path}/region_nohdr"
    write_csv(region, out, header=False)
    raw = read_text(spark, f"{out}/*.csv").collect()
    assert not any("r_regionkey" in r["value"] for r in raw)
