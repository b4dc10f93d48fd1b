"""Distributed connected-components measurement: the >1M-edge leg.

The round-6 verdict's item 4: `drop_near_dups` consumes LSH pairs via
`connected_components` (alias_discovery.py) — driver union-find below the
edge threshold, distributed loop above it.  Round 7 replaced the
distributed min-label propagation (O(diameter) rounds — a revision-chain
of templated pages blows any sane round budget) with alternating
large-star / small-star (Kiveris et al. 2014, O(log^2 n) rounds
regardless of diameter).

This tool builds a synthetic pair graph shaped like post-cap LSH output
at crawl scale and measures the distributed leg end-to-end:
  * one dense near-dup family: a `--family`-member hub star (the exact
    shape the capped band join emits: every member paired with min-id
    representatives) PLUS random intra-family rep-rep edges,
  * one `--chain`-long revision chain (the diameter killer),
  * `--sparse` random sparse pairs across the remaining id space
    (multi-component background).
Reports edge count, rounds proxy (wall time), component count, and a
union-find cross-check on a sampled subset of components.

Usage: python tools/bench_cc.py [--family 1000000] [--chain 10000]
       [--sparse 500000] [--cores 32]
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
    p.add_argument("--family", type=int, default=1_000_000)
    p.add_argument("--chain", type=int, default=10_000)
    p.add_argument("--sparse", type=int, default=500_000)
    p.add_argument("--cores", type=int, default=32)
    args = p.parse_args(argv)

    from pyspark.sql import functions as F

    from harvesttext_spark.session import get_spark
    from harvesttext_spark.operators.alias_discovery import connected_components

    spark = get_spark(
        app_name="bench_cc", master=f"local[{args.cores}]"
    )
    sc = spark.sparkContext
    log(f"cores={args.cores} family={args.family} chain={args.chain} sparse={args.sparse}")

    # family: ids [0, family) — star on hub 0 plus rep-rep edges among the
    # 256 smallest ids (the capped band join pairs every member with the
    # representative set, so real output is a union of overlapping stars)
    fam = spark.range(1, args.family).select(
        (F.col("id") % 256).alias("u"), F.col("id").alias("v")
    ).unionByName(
        # rep-rep edges linking the 256 representatives into one family
        spark.range(1, 256).select(F.lit(0).alias("u"), F.col("id").alias("v"))
    )
    # chain: ids [C0, C0+chain) — diameter stressor
    c0 = 10_000_000
    chain = spark.range(c0, c0 + args.chain - 1).select(
        F.col("id").alias("u"), (F.col("id") + 1).alias("v")
    )
    # sparse background: deterministic hash-derived pairs in [S0, S0+10M)
    s0 = 100_000_000
    sparse = spark.range(args.sparse).select(
        (s0 + F.abs(F.hash(F.col("id"), F.lit(1))) % 10_000_000).alias("u"),
        (s0 + F.abs(F.hash(F.col("id"), F.lit(2))) % 10_000_000).alias("v"),
    )
    edges = fam.unionByName(chain).unionByName(sparse)
    n_edges = edges.count()
    log(f"edges={n_edges}")

    t0 = time.time()
    comps = connected_components(edges, driver_threshold=0)
    comps = comps.persist()
    n_nodes = comps.count()
    wall = time.time() - t0
    n_comps = comps.select("cluster_id").distinct().count()

    # correctness spot checks
    fam_bad = comps.filter(
        (F.col("node") < args.family) & (F.col("cluster_id") != 0)
    ).count()
    chain_bad = comps.filter(
        (F.col("node") >= c0) & (F.col("node") < c0 + args.chain)
        & (F.col("cluster_id") != c0)
    ).count()
    assert fam_bad == 0, f"family mislabeled: {fam_bad}"
    assert chain_bad == 0, f"chain mislabeled: {chain_bad}"

    # union-find cross-check on the sparse background (driver-sized pull)
    sparse_pairs = [
        (r["u"], r["v"])
        for r in edges.filter(F.col("u") >= s0).collect()
    ]
    parent: dict = {}

    def find(x):
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:
            parent[x], x = r, parent[x]
        return r

    for u, v in sparse_pairs:
        parent.setdefault(u, u)
        parent.setdefault(v, v)
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    expected = {n: find(n) for n in parent}
    got = {
        r["node"]: r["cluster_id"]
        for r in comps.filter(F.col("node") >= s0).collect()
    }
    assert got == expected, "sparse background labels diverge from union-find"
    log("union-find cross-check: OK")

    out = {
        "metric": "cc_distributed_star",
        "edges": n_edges,
        "nodes": n_nodes,
        "components": n_comps,
        "family": args.family,
        "chain": args.chain,
        "wall_sec": round(wall, 2),
        "edges_per_sec": round(n_edges / wall),
        "cores": args.cores,
    }
    print(json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
