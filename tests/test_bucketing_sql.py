"""Bucketing (shuffle-free co-located joins) and the spark.sql surface."""

import pytest
from pyspark.sql import functions as F

from harvesttext_spark.session import load_tables


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    """Two tables bucketed on the join key must sort-merge join with NO
    Exchange — the layout prescription for repeated big-big joins at 100TB
    (posting lists, signature tables)."""
    # warehouse.dir is static; tables land in ./spark-warehouse and are
    # dropped (managed) in the finally block
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        docs = spark.range(0, 10_000).select(
            F.col("id").alias("doc_id"), (F.col("id") % 97).alias("feature")
        )
        labels = spark.range(0, 10_000).select(
            F.col("id").alias("doc_id"), (F.col("id") % 2 == 0).alias("keep")
        )
        docs.write.mode("overwrite").bucketBy(8, "doc_id").sortBy("doc_id").saveAsTable("b_docs")
        labels.write.mode("overwrite").bucketBy(8, "doc_id").sortBy("doc_id").saveAsTable("b_labels")

        joined = spark.table("b_docs").join(spark.table("b_labels"), "doc_id")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert joined.count() == 10_000
    finally:
        spark.sql("DROP TABLE IF EXISTS b_docs")
        spark.sql("DROP TABLE IF EXISTS b_labels")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))


def test_spark_sql_surface(spark):
    """Operators are reachable through plain SQL over registered views."""
    load_tables(spark, "/root/testdata/sf0.001", ["documents", "orders", "customer"])
    out = spark.sql(
        """
        SELECT c.c_nationkey, count(*) AS n_orders, round(sum(o.o_totalprice), 2) AS rev
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY c.c_nationkey ORDER BY rev DESC LIMIT 5
        """
    ).collect()
    assert len(out) == 5 and out[0]["rev"] >= out[-1]["rev"]

    toks = spark.sql(
        """
        SELECT t AS word, count(*) AS cnt
        FROM (SELECT explode(filter(split(text, '\\\\s+'), x -> x != '')) AS t FROM documents)
        GROUP BY t ORDER BY cnt DESC LIMIT 3
        """
    ).collect()
    assert all(r["cnt"] > 0 for r in toks)
