"""Production entry point — run the quality-filter pipeline via
spark-submit (north rule: "run via spark-submit --py-files on a
multi-executor cluster"):

    cd /root/repo && zip -r /tmp/htspark.zip harvesttext_spark
    spark-submit --py-files /tmp/htspark.zip \
        jobs/run_quality_filter.py \
        --input  <pages parquet/iceberg path> \
        --output <output dir>  [--resume] [--buckets 4096] \
        [--with-lm] [--repetition-rules] [--url-dedup] \
        [--drop-boilerplate MIN_DF] [--synthesize N]

Cluster sizing is owned by spark-submit (--num-executors et al.); the job
never hardcodes a master.  With --resume, work restarts from the output
manifest (idempotent bucket commits — see pipeline/resume.py).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--input", help="pages table path (url, warc_ts, html, text, lang)")
    p.add_argument("--output", required=True)
    p.add_argument("--resume", action="store_true", help="use bucket-manifest resume")
    p.add_argument("--buckets", type=int, default=4096)
    p.add_argument("--max-buckets", type=int, default=None)
    p.add_argument("--with-lm", action="store_true", help="add perplexity stage")
    p.add_argument(
        "--url-dedup",
        action="store_true",
        help="pre-pass: one row per canonical URL (latest crawl wins)",
    )
    p.add_argument(
        "--drop-boilerplate",
        type=int,
        default=None,
        metavar="MIN_DF",
        help="pre-pass: remove lines present in >= MIN_DF docs before filtering",
    )
    p.add_argument(
        "--repetition-rules",
        action="store_true",
        help="with --with-lm: add Gopher repetition drops",
    )
    p.add_argument(
        "--synthesize",
        type=int,
        default=None,
        help="generate N synthetic pages instead of --input (smoke runs)",
    )
    args = p.parse_args(argv)

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.appName("ht_quality_filter")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )

    if args.synthesize:
        from harvesttext_spark.pipeline.pages import synthesize_pages

        pages = synthesize_pages(spark, n=args.synthesize, seed=42)
    else:
        assert args.input, "--input or --synthesize required"
        pages = spark.read.parquet(args.input)

    t0 = time.time()
    # optional dedup pre-passes (the CC-pipeline order: URL-level first,
    # then corpus boilerplate lines, then the per-doc filter stages)
    if args.url_dedup:
        from harvesttext_spark.operators.dedup import drop_url_dups

        pages = drop_url_dups(pages)
    if args.drop_boilerplate is not None:
        from pyspark.sql import functions as F

        from harvesttext_spark.operators.dedup import drop_boilerplate_lines

        cleaned = drop_boilerplate_lines(
            pages, text_col="text", id_col="url", min_df=args.drop_boilerplate
        ).withColumnRenamed("text_clean", "_debo")
        pages = (
            pages.join(cleaned, "url", "left")
            .withColumn("text", F.coalesce("_debo", "text"))
            .drop("_debo")
        )
    if args.resume:
        from harvesttext_spark.pipeline.resume import run_with_resume

        result = run_with_resume(
            spark, pages, args.output, n_buckets=args.buckets,
            max_buckets_this_run=args.max_buckets,
        )
        summary = {"mode": "resume", **{k: len(v) if isinstance(v, list) else v for k, v in result.items()}}
    else:
        from harvesttext_spark.pipeline.quality_filter import (
            domain_metrics,
            domain_metrics_full,
            partition_lineage,
            quality_filter,
            quality_filter_full,
        )

        if args.with_lm:
            labeled = quality_filter_full(
                pages, repetition_rules=args.repetition_rules
            )
        else:
            labeled = quality_filter(pages)
        labeled.write.mode("overwrite").parquet(args.output + "/data")
        out = spark.read.parquet(args.output + "/data")
        # with the LM stage on, the domain table carries the model rollups
        # (avg ppl + coherence) alongside the keep/drop stats
        dm = domain_metrics_full(out) if args.with_lm else domain_metrics(out)
        dm.write.mode("overwrite").parquet(args.output + "/domain_metrics")
        partition_lineage(out).write.mode("overwrite").parquet(args.output + "/lineage")
        n = out.count()
        k = out.filter("keep").count()
        summary = {"mode": "full" if args.with_lm else "base", "n_docs": n, "n_keep": k}
    summary["wall_sec"] = round(time.time() - t0, 2)
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
