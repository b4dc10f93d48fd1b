"""Sequence-packing throughput + fill quality at corpus scale (round 7).

Packs N synthetic pages into ``--max-tokens`` training sequences and
reports wall-clock, docs/s, bin census, and fill quality (mean fill of
non-oversize bins; FFD's practical fill on web-page length
distributions is the number that matters — the 11/9·OPT bound is the
worst case).  Also re-checks the capacity invariant over every bin on
the full output, so the measurement doubles as a scale correctness
probe.

Usage: python tools/bench_packing.py [--n 1200000] [--max-tokens 2048]
       [--shards 256] [--cores 32]
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
    p.add_argument("--n", type=int, default=1_200_000)
    p.add_argument("--max-tokens", type=int, default=2048)
    p.add_argument("--shards", type=int, default=256)
    p.add_argument("--cores", type=int, default=32)
    args = p.parse_args(argv)

    from pyspark.sql import functions as F

    from harvesttext_spark.operators.packing import pack_sequences, pack_stats
    from harvesttext_spark.pipeline.pages import synthesize_pages
    from harvesttext_spark.session import get_spark

    spark = get_spark(app_name="bench_packing", master=f"local[{args.cores}]")
    pages = synthesize_pages(spark, n=args.n, seed=42).select("url", "text").persist()
    n = pages.count()
    print(f"corpus ready: {n} pages", file=sys.stderr, flush=True)

    t0 = time.time()
    packed = pack_sequences(
        pages, args.max_tokens, id_col="url", n_shards=args.shards
    )
    stats = pack_stats(packed, args.max_tokens).persist()
    agg = stats.agg(
        F.count("*").alias("bins"),
        F.sum("n_docs").alias("docs"),
        F.sum(F.when(F.col("has_oversize"), 1).otherwise(0)).alias("oversize_bins"),
        F.avg(F.when(~F.col("has_oversize"), F.col("fill_ratio"))).alias("mean_fill"),
        F.min(F.when(~F.col("has_oversize"), F.col("fill_ratio"))).alias("min_fill"),
        F.max(
            F.when(~F.col("has_oversize"), F.col("n_tokens")).otherwise(0)
        ).alias("max_bin_tokens"),
    ).collect()[0]
    wall = time.time() - t0

    assert agg["docs"] == n, (agg["docs"], n)
    assert agg["max_bin_tokens"] <= args.max_tokens, "capacity violated"

    print(
        json.dumps(
            {
                "metric": "pack_sequences_1m",
                "n": n,
                "max_tokens": args.max_tokens,
                "shards": args.shards,
                "cores": args.cores,
                "wall_sec": round(wall, 2),
                "docs_per_sec": round(n / wall),
                "bins": agg["bins"],
                "oversize_bins": agg["oversize_bins"],
                "mean_fill": round(agg["mean_fill"], 4),
                "min_fill": round(agg["min_fill"], 4),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
