"""Idempotent batch resume with per-partition lineage (north rule:
"resumable from checkpoint with per-partition lineage + metrics").

Layout (parquet as the Iceberg stand-in — no Iceberg jars in this image;
the commit protocol below is exactly what an Iceberg snapshot would give us
for free, and the code isolates it in one module):

    out_dir/data/bucket=<b>/...   labeled output, partitioned by bucket
    out_dir/manifest/...          one row per COMMITTED bucket:
                                  (bucket, n_docs, n_keep, sum_clean_len)

Work unit = url-hash bucket (deterministic: crc32(url) % n_buckets), so any
re-run maps the same documents to the same bucket.  Resume = anti-join the
manifest's committed buckets from the input, process the remainder, write
data FIRST (dynamic partition overwrite: re-writing a half-written bucket
is safe because bucket content is deterministic), then append the manifest
rows — a bucket is committed only when its manifest row lands, so a crash
between the two writes just reprocesses that bucket."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from harvesttext_spark.pipeline.quality_filter import quality_filter

N_BUCKETS = 64


def _with_bucket(pages: DataFrame, n_buckets: int) -> DataFrame:
    return pages.withColumn("bucket", F.crc32(F.col("url")) % n_buckets)


def committed_buckets(spark: SparkSession, out_dir: str) -> list[int]:
    manifest = os.path.join(out_dir, "manifest")
    try:
        return [r["bucket"] for r in spark.read.parquet(manifest).select("bucket").distinct().collect()]
    except Exception:
        return []


def run_with_resume(
    spark: SparkSession,
    pages: DataFrame,
    out_dir: str,
    n_buckets: int = N_BUCKETS,
    max_buckets_this_run: int | None = None,
) -> dict:
    """Process all not-yet-committed buckets (optionally capped, to simulate
    / bound a run).  Returns {'processed': [...], 'skipped': n}."""
    done = set(committed_buckets(spark, out_dir))
    bucketed = _with_bucket(pages, n_buckets)
    if done:
        # anti-join the manifest rather than a driver-side isin list —
        # with thousands of committed buckets the literal list bloats the
        # plan; the manifest side is tiny and broadcasts
        done_df = spark.createDataFrame([(b,) for b in sorted(done)], "bucket bigint")
        todo_df = bucketed.join(F.broadcast(done_df), "bucket", "left_anti")
    else:
        todo_df = bucketed

    todo = sorted(
        r["bucket"] for r in todo_df.select("bucket").distinct().collect()
    )
    if max_buckets_this_run is not None:
        todo = todo[:max_buckets_this_run]
    if not todo:
        return {"processed": [], "skipped": len(done)}

    batch = bucketed.filter(F.col("bucket").isin(todo))
    labeled = quality_filter(batch).select(
        "url", "warc_ts", "lang", "lang_pred", "text_clean", "keep", "drop_reason", "bucket"
    )

    data_path = os.path.join(out_dir, "data")
    (
        labeled.repartition("bucket")
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("bucket")
        .parquet(data_path)
    )

    metrics = (
        spark.read.parquet(data_path)
        .filter(F.col("bucket").isin(todo))
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.col("keep").cast("long")).alias("n_keep"),
            F.sum(F.length("text_clean")).alias("sum_clean_len"),
        )
    )
    metrics.write.mode("append").parquet(os.path.join(out_dir, "manifest"))
    return {"processed": todo, "skipped": len(done)}
