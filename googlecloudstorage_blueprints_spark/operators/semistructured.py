"""Semi-structured operators: JSON extraction and array/vector columns.

SURVEY.md §2.B #14-#15.  The reference never parses content (SURVEY.md
§2.A.4 — its one JSON touch is a credentials sniff, ``download_file.py:52``);
these are engine extensions over the ``events.props`` JSON column and the
``embeddings.embedding`` array<float> column.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from googlecloudstorage_blueprints_spark.functions.frames import sort_bounded
from googlecloudstorage_blueprints_spark.operators import register
from googlecloudstorage_blueprints_spark.sources.catalog import load_table


@register(
    "json_extract",
    oracle="""
    SELECT event_type,
           COUNT(*)                                             AS n_events,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT)                                      AS sum_k,
           CAST(MIN(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT)                                      AS min_k,
           CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT))
                AS BIGINT)                                      AS max_k,
           COUNT(DISTINCT json_extract_string(props, '$.k'))    AS n_distinct_k
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSONPath field extraction (`get_json_object`) + typed aggregation.

    Scale: get_json_object is a JVM builtin (Jackson) evaluated inside
    codegen; for hot paths with a fixed schema, `from_json` into a struct
    column once is cheaper than repeated path probes — both are supported,
    this operator exercises the path-probe form."""
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        e.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            F.countDistinct(F.col("k").cast("string")).alias("n_distinct_k"),
        )
        # |event types| groups: bounded sort, no range-sampling job
        .transform(sort_bounded, "event_type")
    )


@register(
    "json_schema_infer",
    oracle="""
    SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_bucket,
           COUNT(*) AS n
    FROM events
    WHERE json_extract_string(props, '$.k') IS NOT NULL
    GROUP BY 1
    ORDER BY 1
    """,
)
def json_schema_infer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`from_json` with an explicit schema (the production path for a known
    JSON shape: parse once, then treat fields as typed columns)."""
    e = load_table(spark, sf_dir, "events")
    parsed = e.select(
        F.from_json("props", "k BIGINT").alias("p")
    ).select(F.col("p.k").alias("k"))
    return (
        parsed.where(F.col("k").isNotNull())
        .select((F.col("k") % 10).alias("k_bucket"))
        .groupBy("k_bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("k_bucket")
    )


@register(
    "array_ops",
    oracle="""
    SELECT vec_id, label,
           CAST(len(embedding) AS BIGINT)        AS dim,
           CAST(embedding[1]  AS DOUBLE)         AS first_val,
           CAST(embedding[64] AS DOUBLE)         AS last_val,
           CAST(embedding[1] > 0 AS BOOLEAN)     AS first_positive
    FROM embeddings
    """,
)
def array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array column access: size + element_at (1-based, negative = from the
    end).  Elements stay float32-exact through the double cast on both
    engines, so no rounding is needed."""
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id",
        "label",
        F.size("embedding").cast("long").alias("dim"),
        F.element_at("embedding", 1).cast("double").alias("first_val"),
        F.element_at("embedding", -1).cast("double").alias("last_val"),
        (F.element_at("embedding", 1) > 0).alias("first_positive"),
    )


@register(
    "array_explode_agg",
    oracle="""
    SELECT label,
           COUNT(*)                      AS n_values,
           CAST(SUM(CASE WHEN v > 0 THEN 1 ELSE 0 END) AS BIGINT)
                                         AS n_positive
    FROM (SELECT label, CAST(unnest(embedding) AS DOUBLE) AS v
          FROM embeddings)
    GROUP BY label
    ORDER BY label
    """,
)
def array_explode_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode/unnest an array column into rows and aggregate — integer
    counting only, so exact across engines.  Scale: explode multiplies rows
    ×64 here; the partial aggregation keeps the shuffle at |labels| rows."""
    emb = load_table(spark, sf_dir, "embeddings")
    return (
        emb.select("label", F.explode("embedding").alias("v"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_values"),
            F.sum(F.when(F.col("v") > 0, 1).otherwise(0)).cast("long")
            .alias("n_positive"),
        )
        .orderBy("label")
    )


@register(
    "array_agg_ops",
    oracle="""
    SELECT o_custkey,
           array_to_string(
               list_sort(list_distinct(list(o_orderpriority))), ',')
               AS priorities,
           CAST(len(list_distinct(list(o_orderstatus))) AS BIGINT)
               AS n_statuses,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders
    GROUP BY o_custkey
    """,
)
def array_agg_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array aggregation: collect_set per group, sorted for determinism
    (collection order is partition-dependent — any collected array that
    feeds a comparison or a downstream key MUST be sorted).  Shuffle
    carries the collected sets; at scale cap per-group cardinality
    (slice(sort_array(...), 1, k)) so a hot group cannot OOM a task.

    Parity rule: queries() outputs must be SCALAR columns — the driver's
    canonicalizer sorts output columns and cannot hash array cells, so the
    sorted set is emitted as one comma-joined string in BOTH engines."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_custkey").agg(
        F.concat_ws(
            ",", F.sort_array(F.collect_set("o_orderpriority"))
        ).alias("priorities"),
        F.size(F.collect_set("o_orderstatus")).cast("long").alias(
            "n_statuses"
        ),
        F.count(F.lit(1)).alias("n_orders"),
    )
