"""Skew utilities + AQE skew-join demonstration."""

import pytest
from pyspark.sql import functions as F

from harvesttext_spark.operators.skew import (
    exact_distinct,
    salt_join_left,
    salted_collect_set,
)


def test_exact_distinct(spark):
    df = spark.createDataFrame(
        [("a", 1), ("a", 1), ("a", 2), ("b", 9)], "k string, v int"
    )
    got = {r["k"]: r["n_distinct"] for r in exact_distinct(df, "k", "v").collect()}
    assert got == {"a": 2, "b": 1}


def test_salted_collect_set(spark):
    df = spark.createDataFrame(
        [("a", i % 5) for i in range(200)] + [("b", 42)], "k string, v int"
    )
    got = {r["k"]: sorted(r["values"]) for r in salted_collect_set(df, "k", "v").collect()}
    assert got["a"] == [0, 1, 2, 3, 4] and got["b"] == [42]


def test_salt_join_left(spark):
    left = spark.createDataFrame([("x", i) for i in range(1000)], "k string, payload int")
    right = spark.createDataFrame([("x", "dim")], "k string, attr string")
    out = salt_join_left(left, right, "k", n_salts=4)
    assert out.count() == 1000
    assert out.select("attr").distinct().first()["attr"] == "dim"


def test_aqe_splits_skewed_join(spark):
    """A join with one massive hot key must show AQE skew handling in the
    final adaptive plan (our session enables skewJoin; thresholds lowered
    here so the toy size triggers it)."""
    confs = {
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        # md5 payload: incompressible, so the hot partition's shuffle bytes
        # actually exceed the lowered skew threshold
        hot = spark.range(0, 200_000).select(
            F.lit("hot").alias("k"), F.md5(F.col("id").cast("string")).alias("payload")
        )
        tail = spark.range(0, 2_000).select(
            F.concat(F.lit("k"), F.col("id")).alias("k"),
            F.md5(F.col("id").cast("string")).alias("payload"),
        )
        left = hot.unionByName(tail)
        # independent right side: a join against a derived-from-left frame
        # would reuse the same exchange, and OptimizeSkewedJoin skips
        # reused exchanges
        right = spark.range(0, 2_001).select(
            F.when(F.col("id") == 2000, F.lit("hot"))
            .otherwise(F.concat(F.lit("k"), F.col("id")))
            .alias("k"),
            F.col("id").alias("n"),
        )
        joined = left.join(right, "k")
        # run THIS DataFrame's own query execution so the adaptive plan
        # finalizes (count() would plan a different query)
        assert len(joined.collect()) == 202_000
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan.lower() or "Skew" in plan, plan[:2000]
    finally:
        for k, v in old.items():
            if v is not None:
                spark.conf.set(k, v)


def test_paragraph_dedup_hot_key(spark):
    """The textbook paragraph-dedup skew: ONE boilerplate paragraph in
    half the corpus.  The census groupBy's map-side partial aggregation
    absorbs the hot key; the dup join is AQE-splittable.  Functional
    check: all 5,000 later occurrences cut, first survives, uniques
    untouched."""
    from pyspark.sql import functions as F

    from harvesttext_spark.operators.dedup import drop_duplicate_paragraphs

    hot = "subscribe to our newsletter today"
    df = spark.range(10_000).select(
        F.col("id").alias("doc_id"),
        F.when(
            F.col("id") % 2 == 0,
            F.concat(F.lit(f"{hot}\nunique line "), F.col("id").cast("string")),
        )
        .otherwise(F.concat(F.lit("solo text "), F.col("id").cast("string")))
        .alias("text"),
    )
    out = drop_duplicate_paragraphs(df)
    with_hot = out.filter(F.col("text_dedup").contains(hot))
    assert with_hot.count() == 1
    assert with_hot.first()["doc_id"] == 0  # global (id, pos) first survives
    assert out.filter(~F.col("text_dedup").contains(hot)).count() == 9_999


def test_substring_dedup_hot_window(spark):
    """Exact-substring dedup under window skew: the same 8-token run in
    2,000 docs — one census key holding 2,000 occurrences.  Keep-first
    must leave exactly one intact copy."""
    from pyspark.sql import functions as F

    from harvesttext_spark.operators.substring_dedup import cut_duplicate_spans

    run = "t1 t2 t3 t4 t5 t6 t7 t8"
    df = spark.range(2_000).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("p"), F.col("id").cast("string"), F.lit(f" {run} tail"),
            F.col("id").cast("string"),
        ).alias("text"),
    )
    out = cut_duplicate_spans(df, k=8)
    intact = out.filter(F.col("text_dedup").contains(run))
    assert intact.count() == 1 and intact.first()["doc_id"] == 0
    cut = out.filter(F.col("doc_id") == 1).first()["text_dedup"]
    assert cut == "p1 tail1"
