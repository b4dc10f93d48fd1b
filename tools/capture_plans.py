"""Regenerate PLANS.md — captured explain('formatted') for key queries."""

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from harvesttext_spark.session import get_spark
import __spark_entry__ as e

SECTIONS = {
    "bigram_stats — n-gram statistics (2 hash aggs + split self-join)": "bigram_stats",
    "minhash_lsh_pairs — banded signature join; probe-guarded hot-band cap (under-cap: reused exchange, no window)": "minhash_lsh_pairs",
    "region_revenue — 5-table star rollup": "region_revenue",
    "lm_perplexity — LM train + broadcast score": "lm_perplexity",
    "jaccard_pairs — df-capped candidates (window count), exact rescore": "jaccard_pairs",
    "simhash_dup_pairs — one-pass 64-bit fold, 16-bit block bucket join": "simhash_dup_pairs",
    "langid_trained — shared features, broadcast weights, one-fold argmax": "langid_trained",
    "t2s_text — phrase replace chain + Catalyst translate (codegen, zero Python)": "t2s_text",
    "punkt_abbrevs — one groupBy(typ) + broadcast two-scalar totals": "punkt_abbrevs",
    "ann_lsh_topk — bucket join (broadcast probes), no cross join": "ann_lsh_topk",
    "quality_filter_labels — single scan, one Arrow stage, codegen cascade": "quality_filter_labels",
    "repetition_ngrams — per-n uniform (doc, gram) aggs, no cross-doc joins": "repetition_ngrams",
    "domain_drop_samples — salted two-level partial top-k (bounded state)": "domain_drop_samples",
    "pii_scrub — pure codegen regexp chain, zero shuffle": "pii_scrub",
    "punkt_collocations — lag window + pair agg + broadcast count joins": "punkt_collocations",
    "boilerplate_dedup — census groupBys + UNFORCED left-anti (AQE decides)": "boilerplate_dedup",
    "toxicity_score — one Arrow-batched per-row map, zero shuffle": "toxicity_score",
    "contamination_flags — broadcast benchmark shingles, one count shuffle": "contamination_flags",
    "url_risk — pure codegen keyword battery on the scan": "url_risk",
    "scrub_text — broadcast AC automaton, single mapInPandas pass": "scrub_text",
    "substring_spans — zero-shuffle rolling-hash census, keep-first join": "substring_spans",
    "paragraph_dedup — md5-key census (partial agg), affected-docs-only rebuild": "paragraph_dedup",
    "mojibake_fix — 113-replace codegen chain riding the scan, zero shuffle": "mojibake_fix",
    "ann_ivf_topk — broadcast centroid fixture, map-side assign, probe join": "ann_ivf_topk",
    "script_mix — per-script char fractions, pure codegen on the scan": "script_mix",
    "dsir_topk — broadcast log-ratio table, TakeOrderedAndProject top-k": "dsir_topk",
    "pack_sequences — metadata-only packing exchange, text joins back by id": "pack_sequences",
    "c4_line_filters — per-line HOF battery, pure codegen on the scan": "c4_line_filters",
    "fineweb_signals — line-ratio battery (distinct-diff dup chars), on the scan": "fineweb_signals",
    "quality_classifier — bucket-count train (bounded exchange), broadcast score": "quality_classifier",
    "domain_reputation — domain agg + broadcast 1-row totals + AQE join back": "domain_reputation",
    "edu_score — bounded bucket-mean train, broadcast score join": "edu_score",
    "semdedup — zero-shuffle centroid assign, centroid_id-keyed pair scan": "semdedup",
    "mixture_sample — group-count agg + broadcast rates + hash compare on the scan": "mixture_sample",
    "pack_epochs — metadata-only copy explode, ordinal-salted packing exchange": "pack_epochs",
    "classifier_calibrated — 64-bin PAV dim table broadcast back, zero wide exchange": "classifier_calibrated",
    "semdedup_trained — trained-centroid broadcast assign, centroid_id-keyed scan": "semdedup_trained",
}


def capture(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    spark = get_spark(master="local[4]", shuffle_partitions=4)
    sf = "/root/testdata/sf0.001"
    out = [
        "# PLANS — captured physical plans (explain 'formatted')",
        "",
        "Evidence that the operators compile to the intended shapes:",
        "pushed filters + pruned columns at every scan, broadcast exchanges",
        "for dimensions, partial+final hash aggregation, whole-stage codegen",
        "everywhere outside the two Arrow UDF stages.  Regenerate with",
        "`python tools/capture_plans.py`.",
        "",
    ]
    qs = e.queries()
    for title, name in SECTIONS.items():
        # retired contract queries keep their q_<name> function
        fn = qs.get(name) or getattr(e, f"q_{name}")
        plan = capture(fn(spark, sf))
        lines = plan.splitlines()
        keep, tree_done = [], False
        for ln in lines:
            if ln.startswith("== Physical Plan =="):
                keep.append(ln)
                continue
            if not tree_done:
                keep.append(ln)
                if ln.strip() == "":
                    tree_done = True
            elif ln.startswith("(") or "PushedFilters" in ln or "ReadSchema" in ln:
                keep.append(ln)
        out += [f"## {title}", "", "```", "\n".join(keep[:80]), "```", ""]
    with open("PLANS.md", "w") as f:
        f.write("\n".join(out))
    spark.stop()


if __name__ == "__main__":
    main()
