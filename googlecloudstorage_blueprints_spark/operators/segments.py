"""Segmentation & distribution reports over the order/part/supplier
star: decile report, ABC revenue classification, priority-mix trend,
price-vs-size regression.

Round-8 extensions of the relational family.  The recurring theme is
GLOBAL ranking made scale-safe: a total order over a data-sized table
never runs through one `Window.orderBy()` partition — deciles use the
value-bucket ledger decomposition (the global_row_number technique,
scale_patterns.py), and the ABC cumsum runs over the SUPPLIER dimension
only (bounded).  The reference has no query surface (SURVEY §2.A.4).

Parity conventions (operators/relational.py + CLAUDE.md): 2dp money ×100
/ 4dp products ×1e4 into BIGINT at birth (r7 fixed-point rule), integer
sums divided once at the end; class/decile boundaries compared in exact
integer space so no row can sit on a double boundary; NULLIF guards
spelled identically; bounded outputs via sort_bounded.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from googlecloudstorage_blueprints_spark.functions.frames import sort_bounded
from googlecloudstorage_blueprints_spark.operators import register
from googlecloudstorage_blueprints_spark.sources.catalog import load_table

N_DECILES = 10
PRICE_BUCKET = 10_000  # orders-decile ledger granularity (≈50 buckets)
ABC_A_PCT = 50         # cumulative-revenue cut for class A (percent)
ABC_B_PCT = 80         # … and class B


@register(
    "orders_decile_report",
    oracle=f"""
    WITH ranked AS (
        SELECT o_totalprice,
               CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS cents,
               ROW_NUMBER() OVER (ORDER BY o_totalprice, o_orderkey)
                   AS rn,
               COUNT(*) OVER () AS n_total
        FROM orders
    )
    SELECT CAST((rn - 1) * {N_DECILES} // n_total + 1 AS BIGINT)
               AS decile,
           CAST(COUNT(*) AS BIGINT)        AS n_orders,
           MIN(o_totalprice)               AS min_price,
           MAX(o_totalprice)               AS max_price,
           CAST(SUM(cents) AS BIGINT) / 100.0 AS sum_price
    FROM ranked
    GROUP BY 1
    ORDER BY decile
    """,
)
def orders_decile_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-value decile report (count / min / max / sum per decile)
    — the revenue-distribution table behind "whales vs long tail"
    reviews.

    Shape: the global rank that deciles need is computed WITHOUT the
    SinglePartition ``row_number().over(Window.orderBy(...))`` trap:
    orders bucket by price range (``floor(price) div {pb}`` — ~50
    buckets over the fixture's price domain), a per-bucket window ranks
    locally in parallel, and bucket start-offsets come from one
    cumulative pass over the ~50-row ledger — same decomposition as
    global_row_number (scale_patterns.py), keyed on value ranges
    because the rank order IS the price order.  Decile =
    ((rn−1)·10) div N + 1 in exact integer math on both engines (never
    NTILE, whose uneven-bucket convention would have to be re-derived).
    Parity: 2dp prices ×100 into BIGINT before the SUM (r7 fixed-point
    rule), divided once by 100.0 — exact at any summation order."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_totalprice",
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100, 0)
        .cast("long")
        .alias("cents"),
        F.expr(
            f"CAST(FLOOR(o_totalprice) AS BIGINT) div {PRICE_BUCKET}"
        ).alias("bucket"),
    )
    w_local = Window.partitionBy("bucket").orderBy(
        "o_totalprice", "o_orderkey"
    )
    local = o.withColumn(
        "local_rn", F.row_number().over(w_local).cast("long")
    )
    ledger = o.groupBy("bucket").agg(F.count(F.lit(1)).alias("n_rows"))
    w_led = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    # single-partition cumulative over the ~|price-range|/{pb} ledger
    # rows only — bounded by the value domain, not the data
    offsets = ledger.withColumn(
        "off", F.coalesce(F.sum("n_rows").over(w_led), F.lit(0))
    )
    total = ledger.agg(F.sum("n_rows").alias("n_total"))
    ranked = (
        local.join(offsets.select("bucket", "off"), "bucket")
        .crossJoin(F.broadcast(total))
        .select(
            "o_totalprice",
            "cents",
            (F.col("off") + F.col("local_rn")).alias("rn"),
            "n_total",
        )
    )
    decile = F.expr(
        f"CAST((rn - 1) * {N_DECILES} div n_total + 1 AS BIGINT)"
    )
    return sort_bounded(
        ranked.groupBy(decile.alias("decile")).agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.min("o_totalprice").alias("min_price"),
            F.max("o_totalprice").alias("max_price"),
            (F.sum("cents") / 100.0).alias("sum_price"),
        ),
        "decile",
    )


orders_decile_report.__doc__ = orders_decile_report.__doc__.format(
    pb=PRICE_BUCKET
)


@register(
    "supplier_abc_class",
    oracle=f"""
    WITH rev AS (
        SELECT l.l_suppkey,
               CAST(SUM(CAST(ROUND(
                   l.l_extendedprice * (1 - l.l_discount) * 10000, 0)
                   AS BIGINT)) AS BIGINT) AS rev4
        FROM lineitem l GROUP BY l.l_suppkey
    ),
    cum AS (
        SELECT l_suppkey, rev4,
               SUM(rev4) OVER (ORDER BY rev4 DESC, l_suppkey
                               ROWS UNBOUNDED PRECEDING) AS cum4,
               SUM(rev4) OVER () AS total4
        FROM rev
    ),
    classed AS (
        SELECT CASE WHEN cum4 * 100 <= total4 * {ABC_A_PCT} THEN 'A'
                    WHEN cum4 * 100 <= total4 * {ABC_B_PCT} THEN 'B'
                    ELSE 'C' END AS abc_class,
               rev4, total4
        FROM cum
    )
    SELECT abc_class,
           CAST(COUNT(*) AS BIGINT)            AS n_suppliers,
           CAST(SUM(rev4) AS BIGINT) / 10000.0 AS revenue,
           CAST(SUM(rev4) AS DOUBLE) / MAX(total4) AS revenue_share
    FROM classed
    GROUP BY abc_class
    ORDER BY abc_class
    """,
)
def supplier_abc_class(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC inventory classification of suppliers by lineitem revenue:
    class A = suppliers covering the first {a}% of cumulative revenue
    (ranked richest-first), B = to {b}%, C = the tail — the standard
    procurement segmentation.

    Shape: revenue reduces lineitem to one row per supplier (map-side
    combined, keyed on l_suppkey); the cumulative window then runs over
    the SUPPLIER DIMENSION only — bounded (|suppliers| ≪ facts), so the
    single-partition cumsum is a ledger pass, not a data sort.  Parity:
    each revenue term carries exactly 4 decimals → ×1e4 BIGINT at birth
    (r7 rule); class boundaries compare cum4·100 ≤ total4·pct in EXACT
    integer space, so no supplier can sit on a floating boundary;
    (rev4 DESC, l_suppkey) totally orders the cumsum; revenue_share is
    a ratio of exact integers (bit-identical unrounded).  Scale note:
    cum4·100 stays in BIGINT while total 4dp revenue < ~9e16 (≈ 9
    trillion dollars) — beyond that, drop to 2dp fixed point."""
    li = load_table(spark, sf_dir, "lineitem")
    term4 = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000, 0
    ).cast("long")
    rev = li.groupBy("l_suppkey").agg(F.sum(term4).alias("rev4"))
    w_cum = Window.orderBy(
        F.col("rev4").desc(), F.col("l_suppkey")
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    total = rev.agg(F.sum("rev4").alias("total4"))
    cum = rev.withColumn("cum4", F.sum("rev4").over(w_cum)).crossJoin(
        F.broadcast(total)
    )
    abc = (
        F.when(
            F.col("cum4") * 100 <= F.col("total4") * ABC_A_PCT, "A"
        )
        .when(F.col("cum4") * 100 <= F.col("total4") * ABC_B_PCT, "B")
        .otherwise("C")
    )
    return sort_bounded(
        cum.select(abc.alias("abc_class"), "rev4", "total4")
        .groupBy("abc_class")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_suppliers"),
            (F.sum("rev4") / 10000.0).alias("revenue"),
            (F.sum("rev4").cast("double") / F.max("total4")).alias(
                "revenue_share"
            ),
        ),
        "abc_class",
    )


supplier_abc_class.__doc__ = supplier_abc_class.__doc__.format(
    a=ABC_A_PCT, b=ABC_B_PCT
)


@register(
    "orders_priority_share_trend",
    oracle="""
    SELECT CAST(year(o_orderdate) * 100 + month(o_orderdate) AS BIGINT)
               AS ym,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_urgent_high,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)
               AS urgent_share
    FROM orders
    GROUP BY 1
    ORDER BY ym
    """,
)
def orders_priority_share_trend(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Monthly share of urgent/high-priority orders — the operational
    trend line: a rising urgent share signals either demand heat or a
    customer base learning to game the priority field.

    Shape: one map-side-combined aggregate to |months| rows.  The month
    key is the integer year·100+month (portable; never an engine
    date-format string).  Parity: urgent_share is an exact-integer
    ratio — bit-identical unrounded."""
    o = load_table(spark, sf_dir, "orders")
    is_uh = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    ym = (
        F.year("o_orderdate") * 100 + F.month("o_orderdate")
    ).cast("long")
    return sort_bounded(
        o.groupBy(ym.alias("ym")).agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum(F.when(is_uh, 1).otherwise(0)).cast("long").alias(
                "n_urgent_high"
            ),
            (
                F.sum(F.when(is_uh, 1).otherwise(0)).cast("double")
                / F.count(F.lit(1))
            ).alias("urgent_share"),
        ),
        "ym",
    )


@register(
    "part_price_size_slope",
    oracle="""
    WITH sums AS (
        SELECT p_brand,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(p_size AS BIGINT)) AS BIGINT) AS sx,
               CAST(SUM(CAST(ROUND(p_retailprice * 100, 0) AS BIGINT))
                    AS BIGINT) AS sy,
               CAST(SUM(CAST(p_size AS BIGINT)
                        * CAST(ROUND(p_retailprice * 100, 0) AS BIGINT))
                    AS BIGINT) AS sxy,
               CAST(SUM(CAST(p_size AS BIGINT) * CAST(p_size AS BIGINT))
                    AS BIGINT) AS sxx
        FROM part GROUP BY p_brand
    )
    SELECT p_brand, n AS n_parts,
           ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
                 / CAST(NULLIF(n * sxx - sx * sx, 0) AS DOUBLE)
                 / 100.0, 6) AS price_per_size
    FROM sums
    ORDER BY p_brand
    """,
)
def part_price_size_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand OLS slope of retail price against part size (dollars
    per size unit) — the pricing-curve check: brands whose slope breaks
    from the catalog norm are mispriced or differently positioned.

    Shape: one aggregate to |brands| rows — the regression never sees
    a second pass over the data.  Parity: the r6 rule (never
    engine-native regr_slope — accumulation orders differ) via explicit
    Σx/Σy/Σxy/Σx² — and all four are EXACT BIGINTs here (sizes are
    integers, 2dp prices ×100 at birth), so the slope is one
    deterministic double division, rounded 6dp; NULLIF guards the
    single-size-brand degenerate case identically."""
    p = load_table(spark, sf_dir, "part")
    x = F.col("p_size").cast("long")
    y = F.round(F.col("p_retailprice") * 100, 0).cast("long")
    sums = p.groupBy("p_brand").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * y).alias("sxy"),
        F.sum(x * x).alias("sxx"),
    )
    slope = F.round(
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
            "double"
        )
        / F.nullif(
            F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"),
            F.lit(0),
        ).cast("double")
        / 100.0,
        6,
    )
    return sort_bounded(
        sums.select(
            "p_brand",
            F.col("n").alias("n_parts"),
            slope.alias("price_per_size"),
        ),
        "p_brand",
    )
