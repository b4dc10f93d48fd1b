"""Corpus-scale measurements for the round-7 second-wave operators:

  * fineweb     — the FineWeb line-ratio battery over multi-line pages
                  (pure codegen; should run at scan speed),
  * classifier  — quality-classifier train (closed-form NB over hashed
                  word uni+bigrams) + score of the SAME corpus, with a
                  planted positive subpopulation to verify the model
                  separates (label recovery, not just termination),
  * domain_rep  — per-domain Beta-Binomial shrinkage + join-back over a
                  Zipf-ish domain distribution with a planted bad domain,
  * cross_snap  — snapshot band-index build over a prior corpus + the
                  flag join of a new corpus that is 50% copies (recall
                  of the copies must be 1.0 — exact copies always share
                  every band).

Usage: python tools/bench_round7_ops.py [--n 1200000] [--cores 32]
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
    p.add_argument("--planted-ppm", type=int, default=100_000)
    p.add_argument("--cores", type=int, default=32)
    args = p.parse_args(argv)

    from pyspark.sql import functions as F

    from harvesttext_spark.functions.fineweb import fineweb_filter
    from harvesttext_spark.operators.dedup import (
        flag_dups_against,
        snapshot_band_index,
    )
    from harvesttext_spark.operators.domain_reputation import (
        apply_domain_reputation,
    )
    from harvesttext_spark.operators.quality_classifier import (
        score_quality,
        train_quality_classifier,
    )
    from harvesttext_spark.pipeline.pages import synthesize_pages
    from harvesttext_spark.session import get_spark

    spark = get_spark(app_name="bench_round7_ops", master=f"local[{args.cores}]")
    result = {"metric": "round7_ops_1m", "n": args.n, "cores": args.cores}

    phrase = (
        " curated encyclopedia article with careful prose and citations"
        " quality reference material"
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

    # --- fineweb battery (multi-line view of each page) ------------------
    ml = pages.withColumn(
        "text",
        F.concat_ws(
            "\n",
            F.col("text"),
            F.substring("text", 1, 40),
            F.substring("text", 1, 40),  # a duplicated line per page
            F.reverse(F.col("text")),
        ),
    )
    t0 = time.time()
    fw = fineweb_filter(ml)
    fw_agg = fw.groupBy("fineweb_keep").count().collect()
    fw_wall = time.time() - t0
    result["fineweb"] = {
        "wall_sec": round(fw_wall, 2),
        "docs_per_sec": round(n / fw_wall),
        "kept": {str(r["fineweb_keep"]): r["count"] for r in fw_agg},
    }
    log(f"fineweb: {result['fineweb']}")

    # --- quality classifier: train on planted labels, score back ---------
    t0 = time.time()
    weights, params = train_quality_classifier(
        pages.select(F.col("planted").alias("label"), "text"), persist=True
    )
    scored = score_quality(pages.select(F.col("url").alias("doc_id"), "text"),
                           weights, params)
    agg = (
        scored.join(
            pages.select(F.col("url").alias("doc_id"), "planted"), "doc_id"
        )
        .groupBy("planted", (F.col("quality_lodds") >= 0).alias("pred"))
        .count()
        .collect()
    )
    qc_wall = time.time() - t0
    cm = {(r["planted"], r["pred"]): r["count"] for r in agg}
    tp = cm.get((True, True), 0)
    tn = cm.get((False, False), 0)
    result["classifier"] = {
        "wall_sec": round(qc_wall, 2),
        "docs_per_sec": round(n / qc_wall),
        "planted_recall": round(tp / max(n_planted, 1), 4),
        "background_specificity": round(tn / max(n - n_planted, 1), 4),
    }
    log(f"classifier: {result['classifier']}")

    # --- domain reputation: planted bad domain + Zipf-ish heads ----------
    dom = F.concat(
        F.lit("site"),
        (
            F.conv(F.substring(F.md5(F.col("url")), 1, 8), 16, 10).cast("bigint")
            % 10_000
        ).cast("string"),
        F.lit(".example"),
    )
    rep_in = pages.select(
        F.when(ppm < 20_000, F.lit("spam-farm.example")).otherwise(dom).alias(
            "domain"
        ),
        # keep signal: planted docs "keep"; spam farm keeps nothing
        (F.col("planted") & ~(ppm < 20_000)).alias("keep"),
    )
    t0 = time.time()
    out = apply_domain_reputation(rep_in, min_rate=0.05)
    dr_agg = out.groupBy("domain_reputation_keep").count().collect()
    dr_wall = time.time() - t0
    result["domain_rep"] = {
        "wall_sec": round(dr_wall, 2),
        "docs_per_sec": round(n / dr_wall),
        "flags": {str(r["domain_reputation_keep"]): r["count"] for r in dr_agg},
    }
    log(f"domain_rep: {result['domain_rep']}")

    # --- cross-snapshot dedup: 50% copies of the prior corpus ------------
    half = args.n // 2
    prior = pages.select("url", "text")  # full prior corpus
    # exact copies come FROM the prior corpus (new urls, identical text:
    # every band must match except no-shingle micro-pages); the "other"
    # half is an independent draw from the same generator — its flag
    # rate is the corpus's REAL near-dup rate against the prior dump
    # (word-soup pages from a shared vocabulary do collide), not noise
    # NOT .limit(half): a global limit coalesces to ONE partition and
    # serializes the copies' signature stage (measured 127s -> the join
    # was innocent); a hash-split keeps the copy set parallel
    copies = pages.filter(ppm % 2 == 0).select(
        F.concat(F.lit("copy-"), F.col("url")).alias("url"), "text"
    )
    novel = (
        synthesize_pages(spark, n=half, seed=999)
        .select(F.concat(F.lit("novel-"), F.col("url")).alias("url"), "text")
    )
    new = copies.unionByName(novel)
    n_copies = copies.count()
    t0 = time.time()
    idx = snapshot_band_index(prior, id_col="url").persist()
    idx_rows = idx.count()
    idx_wall = time.time() - t0
    t0 = time.time()
    flags = flag_dups_against(new, idx, id_col="url")
    fl_agg = (
        flags.withColumn("is_copy", F.col("id").startswith("copy-"))
        .groupBy("is_copy", "cross_dup")
        .count()
        .collect()
    )
    fl_wall = time.time() - t0
    fm = {(r["is_copy"], r["cross_dup"]): r["count"] for r in fl_agg}
    copies_flagged = fm.get((True, True), 0)
    novel_flagged = fm.get((False, True), 0)
    result["cross_snap"] = {
        "index_wall_sec": round(idx_wall, 2),
        "index_rows": idx_rows,
        "flag_wall_sec": round(fl_wall, 2),
        "docs_per_sec": round(args.n / fl_wall),
        "copy_recall": round(copies_flagged / max(n_copies, 1), 4),
        "independent_draw_flag_rate": round(novel_flagged / max(half, 1), 4),
    }
    log(f"cross_snap: {result['cross_snap']}")

    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
