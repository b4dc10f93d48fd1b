"""Benchmark harness — runs the engine's headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Every query is forced through the noop sink (full computation, no driver
collect).  ``value`` = total seconds across headline queries.  Extra keys:
``docs_per_sec`` for the flagship quality-filter pipeline and ``n_docs``.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

os.environ.setdefault("SPARK_GRAFT_CPUS", "32")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

HEADLINE = [
    "quality_filter_labels",  # full clean battery + signals + labels (UDF+native)
    "clean_text",             # battery alone (Arrow UDF throughput)
    "lang_id",                # native marker scoring
    "langid_trained",         # hashed-ngram NB train + predict
    "lm_perplexity",          # bigram LM train + score
    "doc_stats",              # token/piece counting
    "exact_dup_groups",       # digest shuffle
    "minhash_lsh_pairs",      # signature + band join
    "simhash",                # portable bit fold
    "bigram_stats",           # n-gram stats: 2 shuffles + self-join
    "tfidf_topk",             # tf/df join + window
    "so_pmi",                 # broadcast seed joins
    "embedding_topk",         # vector math, broadcast cross join
    "events_sessionize",      # lag window + running sum
    # round-6 additions (new names — earlier-round totals compare
    # like-for-like on the frozen names above; see BENCH.md note)
    "substring_spans",        # zero-shuffle rolling-hash census + keep-first
    "paragraph_dedup",        # md5-key census + positional cut
    "mojibake_fix",           # guarded 113-replace codegen chain
    # round-7 additions
    "script_mix",             # per-script char fractions, pure codegen
    "dsir_topk",              # hashed-ngram importance models + Gumbel top-k
    "c4_line_filters",        # per-line HOF battery riding the scan
    # round-7 second-wave additions
    "fineweb_signals",        # line-ratio battery riding the scan
    "quality_classifier",     # NB train + broadcast score, end to end
    "domain_reputation",      # domain agg + broadcast totals + join back
    # round-7 third-wave additions
    "edu_score",              # target-encoding train + broadcast score
    "semdedup",               # centroid assign + within-cluster pair scan
    "mixture_sample",         # group rates + hash compare riding the scan
]

REPEAT = int(os.environ.get("BENCH_REPEAT", "2"))


def main() -> None:
    import __spark_entry__ as entrymod
    from harvesttext_spark.session import get_spark

    sf_match = re.search(r"sf([0-9.]+)", SF_DIR)
    sf = float(sf_match.group(1)) if sf_match else -1.0

    spark = get_spark(app_name="harvesttext_spark_bench")
    qs = entrymod.queries()

    # warm up the JVM + python workers once (tiny job)
    spark.range(1000).selectExpr("sum(id)").collect()

    times: dict[str, float] = {}
    for name in HEADLINE:
        # retired contract queries (RETIRED_QUERIES manifest) keep their
        # q_<name> function for the parity tests — resolve through it so
        # the frozen headline names stay comparable across rounds
        fn = qs.get(name) or getattr(entrymod, f"q_{name}")
        best = None
        for _ in range(REPEAT):  # best-of-N: the host shows 2x steal noise
            t0 = time.time()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        times[name] = round(best, 3)
        print(f"# {name}: {times[name]}s", file=sys.stderr, flush=True)

    # flagship docs/sec: quality-filter pipeline end to end
    import pyspark.sql.functions as F

    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    n_docs = docs.count()
    pipe_s = None
    for _ in range(REPEAT):
        t0 = time.time()
        (qs.get("quality_filter_labels") or entrymod.q_quality_filter_labels)(
            spark, SF_DIR
        ).write.format("noop").mode(
            "overwrite"
        ).save()
        dt = time.time() - t0
        pipe_s = dt if pipe_s is None else min(pipe_s, dt)

    total = round(sum(times.values()), 3)
    payload = {
        "metric": "headline_queries_total_time",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": sf,
        "n_docs": n_docs,
        "docs_per_sec": round(n_docs / pipe_s, 1),
        "cpus": int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
    }
    # attach the latest N-vs-4N scaling evidence (bench_scaling.py output)
    if os.path.exists("scaling_results.json"):
        with open("scaling_results.json") as f:
            payload["scaling"] = json.load(f)
    print(json.dumps(payload))
    spark.stop()


if __name__ == "__main__":
    main()
