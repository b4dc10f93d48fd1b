"""Corpus-scale measurements for the round-7 third-wave operators:

  * semdedup  — signed word-hash embedding of every page (one Arrow
                pass), fixture-centroid assignment at constant target
                cluster size (~100 -> pair work linear in N), within-
                cluster keep-first at cos >= 0.95, with planted
                word-order-shuffled copies (same bag -> cos 1.0): copy
                recall must be 1.0,
  * edu       — edu scorer train on a content-correlated teacher
                (planted pages carry a distinctive phrase, teacher 5 vs
                1) + score back; planted pages must grade above the
                background,
  * bpe       — BPE train (capped word count + driver merges) and full
                corpus tokenization throughput.

Usage: python tools/bench_round7c_ops.py [--n 1200000] [--cores 32]
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
    p.add_argument("--bpe-merges", type=int, default=2000)
    args = p.parse_args(argv)

    from pyspark.sql import functions as F

    from harvesttext_spark.operators.bpe import bpe_tokenize, train_bpe
    from harvesttext_spark.operators.edu_scorer import (
        score_edu,
        train_edu_scorer,
    )
    from harvesttext_spark.operators.semdedup import (
        semdedup,
        word_hash_embedding_udf,
    )
    from harvesttext_spark.operators.similarity import fixture_centroids
    from harvesttext_spark.pipeline.pages import synthesize_pages
    from harvesttext_spark.session import get_spark

    spark = get_spark(app_name="bench_round7c_ops", master=f"local[{args.cores}]")
    result = {"metric": "round7c_ops_1m", "n": args.n, "cores": args.cores}

    phrase = (
        " lecture notes theorem proof derivation corollary axiom lemma"
        " careful exposition"
    )
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
        .withColumn(
            "text",
            F.when(
                F.col("planted"), F.concat(F.col("text"), F.lit(phrase))
            ).otherwise(F.col("text")),
        )
        .persist()
    )
    n = pages.count()
    n_planted = pages.filter("planted").count()
    log(f"corpus ready: {n} pages, {n_planted} planted")

    # --- semdedup: planted copies = word-order shuffle (identical bag) ---
    # "z-copy-…" sorts AFTER every "https…" original, so keep-first
    # must drop the copy (identical word bag -> cos exactly 1.0)
    copies = pages.filter("planted").select(
        F.concat(F.lit("z-copy-"), F.col("url")).alias("url"),
        F.concat_ws(
            " ", F.reverse(F.filter(F.split(F.col("text"), " "), lambda w: w != ""))
        ).alias("text"),
    )
    sd_in = pages.select("url", "text").unionByName(copies)
    n_sd = n + n_planted
    k = max(8, min(1 << 16, n_sd // 100))
    t0 = time.time()
    vecs = sd_in.select(
        "url", word_hash_embedding_udf(64)(F.col("text")).alias("emb")
    )
    cents = fixture_centroids(spark, dim=64, n_centroids=k)
    l2 = fixture_centroids(spark, dim=64, n_centroids=256, plane_base=9500)
    flags = semdedup(
        vecs, cents, threshold=0.95, id_col="url", vec_col="emb",
        max_cluster_df=1000, split_threshold=1000, split_centroids=l2,
    )
    agg = flags.select(
        F.sum((~F.col("semdedup_keep")).cast("long")).alias("dropped"),
        F.sum(
            (
                F.col("vec_id").startswith("z-copy-") & ~F.col("semdedup_keep")
            ).cast("long")
        ).alias("copies_dropped"),
    ).collect()[0]
    sd_wall = time.time() - t0
    result["semdedup"] = {
        "wall_sec": round(sd_wall, 2),
        "docs_per_sec": round(n_sd / sd_wall),
        "n_vectors": n_sd,
        "n_clusters": k,
        "max_cluster_df": 1000,
        "split_threshold": 1000,
        "split_centroids_l2": 256,
        "dropped": int(agg["dropped"]),
        "copy_recall": round(int(agg["copies_dropped"]) / max(n_planted, 1), 4),
    }
    log(f"semdedup: {result['semdedup']}")

    # --- edu scorer: teacher 5 on planted, 1 on background ---------------
    t0 = time.time()
    scores, params = train_edu_scorer(
        pages.select(
            F.when(F.col("planted"), F.lit(5.0)).otherwise(F.lit(1.0)).alias(
                "teacher"
            ),
            "text",
        ),
        persist=True,
    )
    scored = score_edu(
        pages.select(F.col("url").alias("doc_id"), "text"), scores, params,
        min_score=2,
    )
    eagg = (
        scored.join(
            pages.select(F.col("url").alias("doc_id"), "planted"), "doc_id"
        )
        .groupBy("planted")
        .agg(
            F.avg("edu_score").alias("avg_score"),
            F.avg(F.col("edu_keep").cast("double")).alias("keep_rate"),
        )
        .collect()
    )
    edu_wall = time.time() - t0
    stats = {str(r["planted"]): (round(r["avg_score"], 3), round(r["keep_rate"], 4))
             for r in eagg}
    result["edu"] = {
        "wall_sec": round(edu_wall, 2),
        "docs_per_sec": round(n / edu_wall),
        "avg_score_planted": stats["True"][0],
        "avg_score_background": stats["False"][0],
        "planted_keep_at_2": stats["True"][1],
        "background_keep_at_2": stats["False"][1],
    }
    log(f"edu: {result['edu']}")

    # --- bpe: train + tokenize ------------------------------------------
    t0 = time.time()
    model = train_bpe(
        pages.select("text"), n_merges=args.bpe_merges, max_word_types=1 << 17
    )
    train_wall = time.time() - t0
    t0 = time.time()
    toks = bpe_tokenize(pages.select(F.col("url").alias("doc_id"), "text"), model)
    tok_agg = toks.select(
        F.sum("n_bpe_tokens").alias("total"), F.count(F.lit(1)).alias("docs")
    ).collect()[0]
    tok_wall = time.time() - t0
    result["bpe"] = {
        "train_sec": round(train_wall, 2),
        "n_merges": len(model["merges"]),
        "tokenize_sec": round(tok_wall, 2),
        "docs_per_sec": round(n / tok_wall),
        "tokens_per_sec": round(int(tok_agg["total"]) / tok_wall),
        "total_tokens": int(tok_agg["total"]),
    }
    log(f"bpe: {result['bpe']}")

    spark.stop()
    print(json.dumps(result))


if __name__ == "__main__":
    main()
