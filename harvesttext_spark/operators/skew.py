"""Skew-handling utilities — the explicit engineering the north rule asks
for ("partitioning / shuffle / skew handled explicitly") beyond what AQE
gives for free.

Cheat sheet encoded here:
  * algebraic aggs (count/sum/avg): map-side partial aggregation already
    collapses hot keys — no salt needed;
  * NON-algebraic aggs over skewed keys (exact distinct, collect_set):
    two-level reshape — ``exact_distinct`` / ``salted_collect_set``;
  * skewed JOINS: AQE splits oversized partitions at runtime
    (spark.sql.adaptive.skewJoin.enabled, on in our session factory) —
    demonstrated in tests/test_skew.py;
  * skewed groupBy keys feeding a WINDOW or sort: pre-aggregate or salt
    before the window, never Window.partitionBy(hotkey) raw.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def exact_distinct(
    df: DataFrame, key: str, value: str, out_col: str = "n_distinct"
) -> DataFrame:
    """Skew-proof exact distinct count per key: dedupe on (key, value)
    FIRST (hot key's rows spread over hash(key,value) partitions), then a
    plain count — the hot key never concentrates raw rows on one reducer,
    unlike countDistinct whose final aggregation does."""
    return (
        df.select(key, value)
        .distinct()
        .groupBy(key)
        .agg(F.count("*").alias(out_col))
    )


def salted_collect_set(
    df: DataFrame, key: str, value: str, n_salts: int = 16, out_col: str = "values"
) -> DataFrame:
    """collect_set per key with a salted partial level: the hot key builds
    n_salts small sets in parallel, merged by flatten+distinct at level 2."""
    salted = df.withColumn("_salt", F.pmod(F.crc32(F.col(value).cast("string")), F.lit(n_salts)))
    partial = salted.groupBy(key, "_salt").agg(F.collect_set(value).alias("_part"))
    return partial.groupBy(key).agg(
        F.array_distinct(F.flatten(F.collect_list("_part"))).alias(out_col)
    )


def salt_join_left(
    left: DataFrame,
    right: DataFrame,
    key: str,
    n_salts: int = 8,
) -> DataFrame:
    """Manual salted join for when AQE is unavailable (e.g., streaming
    micro-batches): left rows get a random-but-deterministic salt from a
    row-local column hash; the small right side is exploded n_salts times."""
    # deterministic per-row salt (content hash) — monotonically_increasing_id
    # or rand() would break retry/resume determinism
    l = left.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(n_salts))
    )
    r = right.withColumn("_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))))
    return l.join(r, [key, "_salt"]).drop("_salt")
