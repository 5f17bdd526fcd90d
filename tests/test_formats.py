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


def test_read_parquet_evolved_merges_vintages(spark, tmp_path):
    """Two schema vintages in one directory: the merged scan unions the
    columns, old files yield NULL for the added column, and the target
    schema projects/casts deterministically (drop extra, add missing,
    widen int->long)."""
    from googlecloudstorage_blueprints_spark.sources.formats import (
        read_parquet_evolved,
    )

    out = f"file:{tmp_path}/evolved"
    spark.createDataFrame(
        [(1, "a"), (2, "b")], "id int, name string"
    ).write.mode("append").parquet(out)
    spark.createDataFrame(
        [(3, "c", 0.5, "x")],
        "id int, name string, score double, legacy_debug string",
    ).write.mode("append").parquet(out)

    merged = read_parquet_evolved(spark, out)
    assert {"id", "name", "score", "legacy_debug"} <= set(merged.columns)
    rows = {r["id"]: r for r in merged.collect()}
    assert rows[1]["score"] is None and rows[3]["score"] == 0.5

    target = "id long, name string, score double, added_later string"
    shaped = read_parquet_evolved(spark, out, target)
    assert [f.name for f in shaped.schema.fields] == [
        "id", "name", "score", "added_later",
    ]
    assert dict(shaped.dtypes)["id"] == "bigint"
    assert "legacy_debug" not in shaped.columns
    got = {r["id"]: r for r in shaped.collect()}
    assert got[2]["added_later"] is None and got[3]["score"] == 0.5


def test_read_parquet_evolved_without_merge_would_miss_columns(spark, tmp_path):
    """Control: a plain read of the same directory picks ONE footer's
    schema (whichever file seeds inference), so the added column is not
    reliably visible - the failure mode read_parquet_evolved removes."""
    out = f"file:{tmp_path}/plain"
    spark.createDataFrame([(1, "a")], "id int, name string").write.mode(
        "append"
    ).parquet(out)
    spark.createDataFrame(
        [(2, "b", 0.5)], "id int, name string, score double"
    ).write.mode("append").parquet(out)
    plain_cols = set(spark.read.parquet(out).columns)
    # either vintage may win inference; the union is only guaranteed merged
    assert plain_cols in ({"id", "name"}, {"id", "name", "score"})


def test_orc_round_trip_with_pushdown(spark, tmp_path):
    """ORC round-trip preserves values and the read plan shows pushed
    filters + pruned columns, same as parquet."""
    from googlecloudstorage_blueprints_spark.sources.formats import (
        read_orc,
        write_orc,
    )

    src = spark.range(1000).selectExpr(
        "id", "CAST(id % 7 AS INT) AS bucket", "CONCAT('v', id) AS name",
        "CAST(id AS DOUBLE) / 3 AS score",
    )
    out = f"file:{tmp_path}/orc_t"
    write_orc(src, out, compression="zstd")

    back = read_orc(spark, out)
    assert back.count() == 1000
    got = back.where("bucket = 3").selectExpr("id", "name").orderBy("id")
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "bucket" in plan  # filter reached the scan
    rows = got.collect()
    assert rows[0]["id"] == 3 and rows[0]["name"] == "v3"
    assert len(rows) == len([i for i in range(1000) if i % 7 == 3])

    # schema-explicit read shapes types without inference
    shaped = read_orc(spark, out, "id bigint, score double")
    assert shaped.columns == ["id", "score"]
