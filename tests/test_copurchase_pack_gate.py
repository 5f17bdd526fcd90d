"""Pins for the copurchase packed-pair-key gate (r14 replan, r14 ADVICE).

Three things must hold for the ``(part_a << 32) | part_b`` pack in
``operators/segments.py`` to be safe:

1. the shift operands are cast to LONG before shifting — PySpark's
   ``shiftleft`` on an IntegerType column masks the shift count to
   5 bits (Java ``<<`` semantics), so an int32 ``x << 32 == x`` and the
   pack silently degenerates to ``part_a | part_b``.  Fixtures store
   partkeys as int64 today, but physical types change on regeneration
   (round-5 rule), so the expression must be type-proof;
2. the two-column FALLBACK branch (part-key domain above
   ``PAIR_PACK_MAX_KEY``) produces IDENTICAL output to the packed
   branch for all three consumers — the gate may change plans, never
   answers (the pagerank scale-gate discipline, r13);
3. the ops still agree when the source partkey columns are physically
   int32 — the end-to-end form of (1).
"""

from __future__ import annotations

import pyspark.sql.functions as F

import googlecloudstorage_blueprints_spark.operators.segments as seg
from googlecloudstorage_blueprints_spark.operators import all_queries

SF = "/root/testdata/sf0.001"

COPURCHASE_KEYS = [
    "part_copurchase_lift",
    "copurchase_association_rules",
    "copurchase_degree_histogram",
]


def _rows(df):
    return [tuple(r) for r in df.collect()]


def test_pack_expression_is_type_proof_for_int32_keys(spark):
    """The guarded expression packs int32 inputs correctly; the bare
    (uncast) shiftleft demonstrates the 5-bit-mask trap it guards
    against — if Spark ever changes the bare semantics this pin tells
    us the comment is stale."""
    df = spark.createDataFrame([(3, 5)], "part_a int, part_b int")
    packed = df.select(
        F.shiftleft(F.col("part_a").cast("long"), 32)
        .bitwiseOR(F.col("part_b").cast("long"))
        .alias("pk")
    ).collect()[0][0]
    assert packed == (3 << 32) | 5
    bare = df.select(F.shiftleft(F.col("part_a"), 32).alias("pk"))
    assert bare.collect()[0][0] == 3  # int32: x << 32 == x


def test_fallback_branch_outputs_identical(spark, monkeypatch):
    """Force the two-column fallback (PAIR_PACK_MAX_KEY = -1) and pin
    all three copurchase ops' outputs bit-identical to the packed path
    (counts are exact BIGINT; lift derives from the same integer counts
    by the same float ops, so equality is exact)."""
    qs = all_queries()
    packed = {k: _rows(qs[k](spark, SF)) for k in COPURCHASE_KEYS}
    assert all(packed.values()), "packed path must produce rows"
    monkeypatch.setattr(seg, "PAIR_PACK_MAX_KEY", -1)
    for k in COPURCHASE_KEYS:
        assert _rows(qs[k](spark, SF)) == packed[k], k


def test_packed_ops_survive_int32_partkeys(spark, monkeypatch):
    """End-to-end type-proofing: the same three ops on a copy of the
    fixtures whose key columns are physically INT32 (a plausible future
    regen) must match the int64 run exactly — this is the failure the
    long cast prevents (without it, every pk collapses to
    part_a | part_b: wrong groups, wrong top-K)."""
    qs = all_queries()
    expected = {k: _rows(qs[k](spark, SF)) for k in COPURCHASE_KEYS}

    real_load = seg.load_table

    def load_int32(spark_, sf_dir, name):
        df = real_load(spark_, sf_dir, name)
        if name == "lineitem":
            df = df.withColumn("l_partkey", F.col("l_partkey").cast("int"))
        if name == "part":
            df = df.withColumn("p_partkey", F.col("p_partkey").cast("int"))
        return df

    monkeypatch.setattr(seg, "load_table", load_int32)
    seg._PART_KEY_DOMAIN_CACHE.clear()
    try:
        for k in COPURCHASE_KEYS:
            got = [
                tuple(
                    int(v) if isinstance(v, int) else v for v in row
                )
                for row in _rows(qs[k](spark, SF))
            ]
            assert got == expected[k], k
    finally:
        seg._PART_KEY_DOMAIN_CACHE.clear()
