"""Corpus-scale measurement for --semdedup-centroids trained (round 8,
VERDICT #2): trained spherical-k-means coarse quantizer vs the md5
fixture planes on the 1.2M-page synthetic corpus with planted
word-order-shuffled copies (identical bag -> cos exactly 1.0).

The claim under test: with trained centroids the planted-copy recall is
>= 0.99 at 1.2M pages WITHOUT the level-2 residual split (r7 measured
the fixture path at 0.8777 without the split and 0.9831 with it — the
split patches the symptom of random planes collapsing a tight cone;
trained centroids attack the cause by spreading the cone into balanced
clusters that fit the max_cluster_df reference window).

Usage: python tools/bench_semdedup_trained.py [--n 1200000] [--cores 32]
       [--with-fixture-control]
Prints ONE JSON line to stdout; progress to stderr.
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
    p.add_argument("--planted-ppm", type=int, default=50_000)
    p.add_argument("--cores", type=int, default=32)
    p.add_argument("--with-fixture-control", action="store_true")
    args = p.parse_args(argv)

    from pyspark.sql import functions as F

    from harvesttext_spark.operators.semdedup import (
        semdedup,
        train_semdedup_centroids,
        word_hash_embedding_udf,
    )
    from harvesttext_spark.operators.similarity import fixture_centroids
    from harvesttext_spark.pipeline.pages import synthesize_pages
    from harvesttext_spark.session import get_spark

    spark = get_spark(
        app_name="bench_semdedup_trained", master=f"local[{args.cores}]"
    )
    result = {
        "metric": "semdedup_trained_centroids_1m",
        "n": args.n,
        "cores": args.cores,
    }

    ppm = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit("plant:"), F.col("url"))), 1, 15), 16, 10
        ).cast("bigint")
        % 1_000_000
    )
    pages = (
        synthesize_pages(spark, n=args.n, seed=42)
        .select("url", "text")
        .withColumn("planted", ppm < args.planted_ppm)
        .persist()
    )
    n = pages.count()
    n_planted = pages.filter("planted").count()
    log(f"corpus ready: {n} pages, {n_planted} planted")

    copies = pages.filter("planted").select(
        F.concat(F.lit("z-copy-"), F.col("url")).alias("url"),
        F.concat_ws(
            " ", F.reverse(F.filter(F.split(F.col("text"), " "), lambda w: w != ""))
        ).alias("text"),
    )
    sd_in = pages.select("url", "text").unionByName(copies)
    n_sd = n + n_planted
    k = max(8, min(1 << 16, n_sd // 100))

    def run(label, cents_fn, train_timed=False):
        t0 = time.time()
        vecs = sd_in.select(
            "url", word_hash_embedding_udf(64)(F.col("text")).alias("emb")
        )
        cents = cents_fn(vecs)
        train_wall = time.time() - t0
        t1 = time.time()
        flags = semdedup(
            vecs, cents, threshold=0.95, id_col="url", vec_col="emb",
            max_cluster_df=1000,
        )
        per_cluster = flags.groupBy("centroid_id").agg(
            F.count(F.lit(1)).alias("sz"),
            F.sum((~F.col("semdedup_keep")).cast("long")).alias("dropped"),
            F.sum(
                (
                    F.col("vec_id").startswith("z-copy-") & ~F.col("semdedup_keep")
                ).cast("long")
            ).alias("cd"),
        )
        agg = per_cluster.agg(
            F.sum("dropped").alias("dropped"),
            F.sum("cd").alias("copies_dropped"),
            F.max("sz").alias("max_cluster"),
        ).collect()[0]
        scan_wall = time.time() - t1
        out = {
            "wall_sec": round(train_wall + scan_wall, 2),
            "docs_per_sec": round(n_sd / (train_wall + scan_wall)),
            "n_vectors": n_sd,
            "n_clusters": k,
            "max_cluster_df": 1000,
            "residual_split": False,
            "dropped": int(agg["dropped"]),
            "max_cluster_size": int(agg["max_cluster"]),
            "copy_recall": round(int(agg["copies_dropped"]) / max(n_planted, 1), 4),
        }
        if train_timed:
            out["centroid_train_sec"] = round(train_wall, 2)
        result[label] = out
        log(f"{label}: {out}")

    run(
        "trained",
        lambda vecs: train_semdedup_centroids(vecs, k, vec_col="emb", id_col="url"),
        train_timed=True,
    )
    if args.with_fixture_control:
        run(
            "fixture_no_split_control",
            lambda vecs: fixture_centroids(spark, dim=64, n_centroids=k),
        )

    spark.stop()
    print(json.dumps(result))


if __name__ == "__main__":
    main()
