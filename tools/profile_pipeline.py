"""Per-stage wall-clock breakdown of the full CC pipeline at N pages.

Round-4 got the 5-stage pipeline (url-dedup -> boilerplate -> exact ->
MinHash -> filter) from 450.6s to 42.9s at 1.2M pages; this tool shows
where the remaining time lives so further work targets the biggest stage.

Usage: python tools/profile_pipeline.py [--n 1200000] [--cores 32]
Prints one line per stage to stderr and a JSON summary to stdout.
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
    p.add_argument("--cores", type=int, default=32)
    p.add_argument("--boiler-min-df", type=int, default=3)
    p.add_argument("--minhash-j", type=float, default=0.8)
    args = p.parse_args(argv)

    from pyspark import StorageLevel

    from harvesttext_spark.session import get_spark
    from harvesttext_spark.pipeline.pages import synthesize_pages

    spark = get_spark(
        app_name="profile_pipeline", master=f"local[{args.cores}]",
        shuffle_partitions=max(32, args.cores),
    )

    stages: dict[str, float] = {}

    def timed(name, fn):
        t0 = time.time()
        out = fn()
        dt = time.time() - t0
        stages[name] = round(dt, 2)
        print(f"# {name}: {dt:.2f}s", file=sys.stderr, flush=True)
        return out

    def stage_persist(df):
        df = df.persist(StorageLevel.MEMORY_AND_DISK)
        df.count()
        return df

    pages = timed(
        "synthesize+persist",
        lambda: stage_persist(synthesize_pages(spark, args.n, seed=42, partitions=128)),
    )

    from pyspark.sql import functions as F

    from harvesttext_spark.operators.dedup import (
        drop_boilerplate_lines,
        drop_exact_dups,
        drop_near_dups,
        drop_url_dups,
        minhash_dup_pairs,
    )

    prev = pages
    cur = timed("url_dedup", lambda: stage_persist(drop_url_dups(prev)))

    def boiler():
        cleaned = drop_boilerplate_lines(
            cur, text_col="text", id_col="url", min_df=args.boiler_min_df
        ).withColumnRenamed("text_clean", "_debo")
        return stage_persist(
            cur.join(cleaned, "url", "left")
            .withColumn("text", F.coalesce("_debo", "text"))
            .drop("_debo")
        )

    cur2 = timed("boilerplate", boiler)
    prev.unpersist(); cur.unpersist()

    nn = cur2.filter(F.col("text").isNotNull())
    nulls = cur2.filter(F.col("text").isNull()).persist(StorageLevel.MEMORY_AND_DISK)
    nulls.count()

    cur3 = timed(
        "exact_dedup", lambda: stage_persist(drop_exact_dups(nn, text_col="text", id_col="url"))
    )
    cur2.unpersist()

    def minhash():
        pairs = minhash_dup_pairs(
            cur3, text_col="text", id_col="url", min_jaccard=args.minhash_j
        )
        return stage_persist(drop_near_dups(cur3, pairs, id_col="url"))

    cur4 = timed("minhash_dedup", minhash)
    cur3.unpersist()

    merged = timed(
        "union_nulls", lambda: stage_persist(cur4.unionByName(nulls))
    )
    cur4.unpersist(); nulls.unpersist()

    from harvesttext_spark.pipeline.quality_filter import quality_filter

    n_out = [0]

    def filt():
        out = quality_filter(merged, fast_path=True)
        n_out[0] = out.count()
        return out

    timed("filter", filt)

    total = round(sum(stages.values()), 2)
    work = round(total - stages["synthesize+persist"], 2)
    print(json.dumps({
        "n_pages": args.n, "cores": args.cores, "stages": stages,
        "pipeline_sec_excl_synth": work,
        "docs_per_sec": round(args.n / work, 1) if work else None,
        "rows_out": n_out[0],
    }))
    spark.stop()


if __name__ == "__main__":
    main()
