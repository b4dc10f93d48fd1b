"""Measure similarity.py's interpreted higher-order-function cosine folds
at realistic embedding volume (round-4 verdict watch item / STATUS #3).

The MinHash signature fold was 14x slower than explode+codegen because HOF
lambdas evaluate INTERPRETED with no CSE; this tool answers whether the
cosine scoring path shows the same pattern, on 200k synthetic vectors
(dim 64, deterministic hash-derived components — no rand()).

Variants (all value-equivalent rankings; float fold order differs):
  hof        — current brute_force_topk (aggregate/zip_with per pair;
               recomputes both norms per (vector, query) pair)
  hof_norm   — vectors and queries L2-normalized ONCE (materialized
               columns), per-pair work = one dot fold
  explode    — posexplode vectors, broadcast-join exploded queries on
               position, codegen sum(x*y) groupBy (vec_id, query_id)
  pandas     — mapInPandas: per-batch numpy matmul against the broadcast
               query matrix + per-partition top-k, then global top-k
               (the 100 TB shape: shuffle carries partitions*nq*k rows)

Usage: python tools/bench_similarity.py [--n 200000] [--dim 64] [--nq 8]
Prints one timing line per variant to stderr and a JSON summary to stdout.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.sql.window import Window


def synth_vectors(spark, n, dim, tag=""):
    """Deterministic pseudo-random unit-cube vectors: component j of row i
    is a pure function of (i, j, tag) via xxhash64 — rerun-identical."""
    df = spark.range(n).withColumnRenamed("id", "vec_id")
    comp = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda j: (
            F.pmod(F.xxhash64(F.col("vec_id"), j, F.lit(tag)), F.lit(10000))
            / F.lit(5000.0)
            - F.lit(1.0)
        ),
    )
    return df.withColumn("embedding", comp)


def topk_hof(vectors, queries, k):
    from harvesttext_spark.operators.similarity import brute_force_topk

    return brute_force_topk(vectors, queries, k=k)


def topk_hof_norm(vectors, queries, k):
    from harvesttext_spark.operators.similarity import dot, l2_norm

    v = vectors.withColumn(
        "_nvec", F.transform("embedding", lambda x: x / l2_norm(F.col("embedding")))
    )
    q = queries.select(
        "query_id",
        F.transform("embedding", lambda x: x / l2_norm(F.col("embedding"))).alias(
            "_qvec"
        ),
    )
    scored = v.crossJoin(F.broadcast(q)).select(
        "query_id",
        "vec_id",
        dot(F.col("_nvec"), F.col("_qvec")).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def topk_explode(vectors, queries, k):
    vexp = vectors.select(
        "vec_id", F.posexplode("embedding").alias("pos", "x")
    )
    qexp = queries.select(
        "query_id", F.posexplode("embedding").alias("pos", "y")
    )
    qnorm = (
        qexp.groupBy("query_id")
        .agg(F.sqrt(F.sum(F.col("y") * F.col("y"))).alias("qn"))
    )
    vnorm = (
        vexp.groupBy("vec_id")
        .agg(F.sqrt(F.sum(F.col("x") * F.col("x"))).alias("vn"))
    )
    dots = (
        vexp.join(F.broadcast(qexp), "pos")
        .groupBy("vec_id", "query_id")
        .agg(F.sum(F.col("x") * F.col("y")).alias("d"))
    )
    scored = (
        dots.join(vnorm, "vec_id")
        .join(F.broadcast(qnorm), "query_id")
        .select(
            "query_id", "vec_id", (F.col("d") / (F.col("vn") * F.col("qn"))).alias("cos_sim")
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def topk_pandas(vectors, queries, k):
    from harvesttext_spark.operators.similarity import brute_force_topk_blas

    return brute_force_topk_blas(vectors, queries, k=k)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=200_000)
    p.add_argument("--dim", type=int, default=64)
    p.add_argument("--nq", type=int, default=8)
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--variants", default="hof,hof_norm,explode,pandas")
    p.add_argument("--repeat", type=int, default=2)
    args = p.parse_args(argv)

    from harvesttext_spark.session import get_spark

    spark = get_spark(app_name="bench_similarity")
    vectors = synth_vectors(spark, args.n, args.dim).persist()
    vectors.count()
    queries = (
        synth_vectors(spark, args.nq, args.dim, tag="q")
        .withColumnRenamed("vec_id", "query_id")
    ).persist()
    queries.count()

    fns = {
        "hof": topk_hof,
        "hof_norm": topk_hof_norm,
        "explode": topk_explode,
        "pandas": topk_pandas,
    }
    results, ranks = {}, {}
    for name in args.variants.split(","):
        best = None
        for _ in range(args.repeat):
            t0 = time.time()
            rows = fns[name](vectors, queries, args.k).collect()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        ranks[name] = sorted((r["query_id"], r["rank"], r["vec_id"]) for r in rows)
        results[name] = round(best, 3)
        print(f"# {name}: {best:.3f}s  rows={len(rows)}", file=sys.stderr)

    base = ranks.get("hof")
    agree = {n: (r == base) for n, r in ranks.items()} if base else {}
    print(json.dumps({
        "n": args.n, "dim": args.dim, "nq": args.nq, "k": args.k,
        "sec": results, "rankings_match_hof": agree,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
