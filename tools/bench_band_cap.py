"""MinHash hot-band cap measurement: planted near-dup template family.

The round-6 verdict's one `weak`: the LSH band self-join was quadratic in
bucket membership.  Exact-dedup-first removes identical clusters, but a
NEAR-identical template family (same boilerplate page differing only by a
date / page number) survives exact dedup and lands its members in shared
(band, key) buckets — a 100k-member family is ~5e9 intra-bucket pairs PER
BAND uncapped.  `max_band_df` (dedup.py) trims each bucket to its cap
smallest ids on the left side of the join, with a map-side partial
WindowGroupLimit, making emission linear in bucket size.

This tool plants a `--family` -member near-dup family ("template … page
N") into `--n` synthetic pages and reports:
  * the exact band-bucket census (top bucket sizes),
  * the ANALYTIC uncapped candidate-pair count (sum n*(n-1)/2 — the join
    the uncapped shape would have to materialize),
  * the analytic capped emission (sum n*min(n,B) - C(min(n,B)+1, 2)),
  * the MEASURED wall-clock + output pair count of the capped run,
  * optionally (`--run-uncapped`, small sizes only) the measured uncapped
    run for a direct ratio.

Usage: python tools/bench_band_cap.py [--n 1100000] [--family 100000]
       [--cap 256] [--cores 32] [--run-uncapped]
Prints one JSON line to stdout; progress to stderr.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=1_100_000)
    p.add_argument("--family", type=int, default=100_000)
    p.add_argument("--cap", type=int, default=256)
    p.add_argument("--cores", type=int, default=32)
    p.add_argument("--min-jaccard", type=float, default=0.8)
    p.add_argument("--run-uncapped", action="store_true")
    args = p.parse_args(argv)

    from pyspark import StorageLevel
    from pyspark.sql import functions as F

    from harvesttext_spark.session import get_spark
    from harvesttext_spark.pipeline.pages import synthesize_pages
    from harvesttext_spark.operators.dedup import (
        minhash_bands,
        minhash_dup_pairs,
        minhash_signature_frame,
    )

    spark = get_spark(
        app_name="bench_band_cap",
        master=f"local[{args.cores}]",
        shuffle_partitions=max(32, args.cores),
    )

    def log(msg):
        print(f"# {msg}", file=sys.stderr, flush=True)

    t0 = time.time()
    bg = synthesize_pages(spark, args.n, seed=42, partitions=128).select(
        "url", "text"
    )
    # the planted family: identical 40-token boilerplate differing ONLY in
    # the trailing page token — survives exact dedup, jaccard ~0.94
    template = (
        "site navigation home products services about contact terms privacy "
        "copyright all rights reserved follow us newsletter subscribe footer "
        "sitemap search login register cart checkout help faq support blog "
        "news events careers press media partners affiliates page"
    )
    fam = spark.range(args.family).select(
        F.concat(F.lit("https://template.site/p/"), F.col("id")).alias("url"),
        F.concat(F.lit(template + " "), F.col("id")).alias("text"),
    )
    docs = bg.unionByName(fam).persist(StorageLevel.MEMORY_AND_DISK)
    n_docs = docs.count()
    log(f"synthesized {n_docs} docs in {time.time()-t0:.1f}s")

    # exact band-bucket census (the join's true input distribution)
    sig = minhash_signature_frame(docs, "text", "url")
    bands_df = sig.select(
        "id", F.explode(minhash_bands(F.col("sig"), 4, 4)).alias("b")
    ).select("id", F.col("b.band").alias("band"), F.col("b.key").alias("key"))
    census = (
        bands_df.groupBy("band", "key")
        .count()
        .filter(F.col("count") > 1)
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    B = args.cap
    stats = census.agg(
        F.sum(F.col("count") * (F.col("count") - 1) / 2).alias("uncapped_pairs"),
        F.sum(
            F.least(F.col("count"), F.lit(B)) * F.col("count")
            - F.least(F.col("count"), F.lit(B))
            * (F.least(F.col("count"), F.lit(B)) + 1)
            / 2
        ).alias("capped_pairs"),
        F.max("count").alias("max_bucket"),
        F.count("*").alias("n_buckets_gt1"),
    ).collect()[0]
    top = [r["count"] for r in census.orderBy(F.desc("count")).limit(5).collect()]
    census.unpersist()
    log(
        f"census: max bucket={stats['max_bucket']}, top5={top}, "
        f"uncapped join rows={stats['uncapped_pairs']:.3e}, "
        f"capped join rows={stats['capped_pairs']:.3e}"
    )

    t1 = time.time()
    capped = minhash_dup_pairs(
        docs, text_col="text", id_col="url",
        min_jaccard=args.min_jaccard, max_band_df=B,
    )
    n_capped = capped.count()
    capped_sec = round(time.time() - t1, 2)
    log(f"capped run: {n_capped} pairs in {capped_sec}s")

    uncapped_sec = None
    n_uncapped = None
    if args.run_uncapped:
        t2 = time.time()
        unc = minhash_dup_pairs(
            docs, text_col="text", id_col="url",
            min_jaccard=args.min_jaccard, max_band_df=None,
        )
        n_uncapped = unc.count()
        uncapped_sec = round(time.time() - t2, 2)
        log(f"uncapped run: {n_uncapped} pairs in {uncapped_sec}s")

    print(json.dumps({
        "n_docs": n_docs, "family": args.family, "cap": B,
        "cores": args.cores,
        "max_bucket": stats["max_bucket"],
        "top5_buckets": top,
        "n_buckets_gt1": stats["n_buckets_gt1"],
        "uncapped_join_rows": int(stats["uncapped_pairs"]),
        "capped_join_rows": int(stats["capped_pairs"]),
        "capped_sec": capped_sec, "capped_pairs_out": n_capped,
        "uncapped_sec": uncapped_sec, "uncapped_pairs_out": n_uncapped,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
