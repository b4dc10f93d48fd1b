"""DSIR selection throughput at corpus scale (round 7).

Plants a target-like subpopulation, then measures the full
`dsir_threshold_select` scale path (hashed-ngram distributions ->
broadcast log-ratio join -> per-doc weight -> Gumbel keys ->
approxQuantile threshold -> flag join) over N synthetic pages:

  * wall-clock + docs/s for the end-to-end selection,
  * selection quality: what fraction of the planted target-like docs
    survive vs the background (the importance weights must actually
    separate the populations, not just terminate),
  * the key separation (mean logw planted vs background).

The planted family appends a fixed "quality" token phrase to ~`--planted`
of the pages; the target corpus is an independent sample of the same
phrase distribution.  Selection keeps `--keep-frac`; with planted <<
keep_frac * n, a working selector keeps ~all planted docs.

Usage: python tools/bench_dsir.py [--n 1200000] [--planted 100000]
       [--keep-frac 0.5] [--cores 32]
Prints one JSON line to stdout; progress to stderr.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=1_200_000)
    p.add_argument("--planted", type=int, default=100_000)
    p.add_argument("--target-size", type=int, default=20_000)
    p.add_argument("--keep-frac", type=float, default=0.5)
    p.add_argument("--cores", type=int, default=32)
    args = p.parse_args(argv)

    from pyspark.sql import functions as F

    from harvesttext_spark.operators.dsir import dsir_threshold_select
    from harvesttext_spark.pipeline.pages import synthesize_pages
    from harvesttext_spark.session import get_spark

    spark = get_spark(
        app_name="bench_dsir", master=f"local[{args.cores}]"
    )

    # planted membership is a pure function of url-hash: deterministic,
    # partition-invariant (the curation _hash_ppm idiom)
    phrase = (
        " curated encyclopedia article with careful prose and citations"
        " quality reference material"
    )
    ppm = (
        F.conv(F.substring(F.md5(F.concat(F.lit("plant:"), F.col("url"))), 1, 15), 16, 10)
        .cast("bigint") % 1_000_000
    )
    plant_ppm = int(round(args.planted / args.n * 1_000_000))
    pages = (
        synthesize_pages(spark, n=args.n, seed=42)
        .select("url", "text")
        .withColumn("planted", ppm < plant_ppm)
        .withColumn(
            "text",
            F.when(F.col("planted"), F.concat(F.col("text"), F.lit(phrase))).otherwise(
                F.col("text")
            ),
        )
    )
    pages = pages.persist()
    n = pages.count()
    n_planted = pages.filter("planted").count()
    log(f"corpus ready: {n} pages, {n_planted} planted")

    # target: an independent synthetic slice carrying the same phrase
    target = (
        synthesize_pages(spark, n=args.target_size, seed=777)
        .select(F.concat(F.col("text"), F.lit(phrase)).alias("text"))
    )

    t0 = time.time()
    out = dsir_threshold_select(
        pages, target, keep_frac=args.keep_frac, id_col="url"
    )
    agg = out.groupBy("planted", "dsir_keep").agg(
        F.count("*").alias("c"), F.avg("logw").alias("mean_logw")
    )
    rows = {(r["planted"], r["dsir_keep"]): (r["c"], r["mean_logw"]) for r in agg.collect()}
    wall = time.time() - t0

    kept_planted = rows.get((True, True), (0, 0.0))[0]
    dropped_planted = rows.get((True, False), (0, 0.0))[0]
    kept_bg = rows.get((False, True), (0, 0.0))[0]
    mean_logw_planted = sum(
        c * (w or 0.0) for (pl, _), (c, w) in rows.items() if pl
    ) / max(n_planted, 1)
    mean_logw_bg = sum(
        c * (w or 0.0) for (pl, _), (c, w) in rows.items() if not pl
    ) / max(n - n_planted, 1)

    result = {
        "metric": "dsir_threshold_select_1m",
        "n": n,
        "planted": n_planted,
        "keep_frac": args.keep_frac,
        "cores": args.cores,
        "wall_sec": round(wall, 2),
        "docs_per_sec": round(n / wall),
        "planted_recall": round(kept_planted / max(n_planted, 1), 4),
        "planted_dropped": dropped_planted,
        "background_kept": kept_bg,
        "mean_logw_planted": round(mean_logw_planted, 3),
        "mean_logw_background": round(mean_logw_bg, 3),
    }
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
