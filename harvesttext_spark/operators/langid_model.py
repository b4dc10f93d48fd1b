"""fastText-style language ID: a linear model over HASHED char n-gram
features (BASELINE.json north_star), trained deterministically on a labeled
corpus — here as multinomial Naive Bayes, whose training IS two groupBy
counts (the distributable closed form; no SGD nondeterminism).

    feature  = bucket b = conv(md5(char_trigram),16,10) % n_buckets
    weight   = logp(b | lang) = ln( (count(lang,b)+1) / (count(lang)+B) )
    prior    = ln( docs(lang) / docs )
    score(doc, lang) = prior + Σ_b∈doc logp(b|lang)
                       + (|doc| − matched) * default(lang)     [unseen mass]
    pred     = argmax lang

TRAIN: explode trigram buckets -> groupBy (lang, bucket) counts -> weights
dim table.  SCORE: explode doc buckets -> broadcast-join weights ->
groupBy (doc, lang) -> argmax window.  One pass over text either way.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

N_BUCKETS = 1 << 14
MAX_GRAMS_PER_DOC = 300


def _feature_rows(
    docs: DataFrame, text_col: str, keep_cols: list[str], n_buckets: int = N_BUCKETS
) -> DataFrame:
    """One row per hashed char-trigram bucket (capped per doc).

    PERF: the lowered text is materialized as a COLUMN first — expression
    trees inside transform() lambdas get no common-subexpression
    elimination, so deriving trigrams from an inline split(text) expression
    re-evaluates it per element (measured O(n²): 18.6s vs 1.4s for this
    stage at sf0.1).  Bound column references are evaluated once per row."""
    lowered = docs.select(*keep_cols, F.lower(F.col(text_col)).alias("_lt"))
    n = F.length("_lt")
    m = F.least(n - 2, F.lit(MAX_GRAMS_PER_DOC))
    # r9 codegen trigrams: transform(sequence, substr) is a higher-order
    # lambda — interpreted per position (up to MAX_GRAMS_PER_DOC × rows).
    # split('') + three slices + arrays_zip build the same trigram stream
    # under whole-stage codegen: split/substring are both code-point
    # based (Java 8+ empty-pattern split never cuts a surrogate pair), so
    # concat(c_i, c_{i+1}, c_{i+2}) == substr(i, 3) byte for byte.  The
    # trailing "" split artifact at index n+1 is never sliced (m+2 ≤ n).
    # Short/NULL docs keep the whole-string fallback via b IS NULL.
    chars = F.split(F.col("_lt"), "")
    tri_structs = F.when(
        n >= 3,
        F.arrays_zip(
            F.slice(chars, 1, m).alias("a"),
            F.slice(chars, 2, m).alias("b"),
            F.slice(chars, 3, m).alias("c"),
        ),
    ).otherwise(
        F.array(
            F.struct(
                F.col("_lt").alias("a"),
                F.lit(None).cast("string").alias("b"),
                F.lit(None).cast("string").alias("c"),
            )
        )
    )
    tri = F.when(F.col("_ts.b").isNull(), F.col("_ts.a")).otherwise(
        F.concat(F.col("_ts.a"), F.col("_ts.b"), F.col("_ts.c"))
    )
    return lowered.select(
        *keep_cols, F.explode(tri_structs).alias("_ts")
    ).select(
        *keep_cols,
        (F.conv(F.substring(F.md5(tri), 1, 8), 16, 10).cast("bigint") % n_buckets)
        .cast("int")
        .alias("bucket"),
    )


def train_langid(
    docs: DataFrame,
    text_col: str = "text",
    label_col: str = "lang",
    n_buckets: int = N_BUCKETS,
    feats: DataFrame | None = None,
    persist: bool = False,
    n_docs: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """-> (weights(lang, bucket, logp), lang_stats(lang, prior, default_logp)).
    Pass precomputed ``feats`` (from _feature_rows, with a 'lang' column)
    to share the extraction with a predict pass over the same corpus.
    ``persist=True`` materializes the weight table (plan-keyed LRU-1) so
    the predict pass's broadcast build reads the aggregate, not the
    feature stream again.  ``n_docs``: pass the row count when known
    (parquet footer metadata) to skip one count job."""
    if feats is None:
        feats = _feature_rows(
            docs.withColumnRenamed(label_col, "lang"), text_col, ["lang"], n_buckets
        )
    counts = feats.groupBy("lang", "bucket").agg(F.count("*").alias("c"))
    if persist:
        # bounded dim (≤ langs × n_buckets rows): lang_tot, the weights
        # projection AND the stats join all consume it — persisting it
        # keeps each from re-scanning the full feature stream (r9; the
        # quality_classifier counts precedent)
        from harvesttext_spark.session import plan_keyed_persist

        counts = plan_keyed_persist(counts, "langid_counts")
    lang_tot = counts.groupBy("lang").agg(F.sum("c").alias("tot"))
    weights = counts.join(lang_tot, "lang").select(
        "lang",
        "bucket",
        F.log((F.col("c") + 1) / (F.col("tot") + n_buckets)).alias("logp"),
    )
    if persist:
        from harvesttext_spark.session import plan_keyed_persist

        weights = plan_keyed_persist(weights, "langid_weights")
    if n_docs is None:
        n_docs = docs.count()
    stats = (
        docs.groupBy(F.col(label_col).alias("lang"))
        .agg(F.count("*").alias("nd"))
        .join(lang_tot, "lang")
        .select(
            "lang",
            F.log(F.col("nd") / F.lit(float(n_docs))).alias("prior"),
            F.log(F.lit(1.0) / (F.col("tot") + n_buckets)).alias("default_logp"),
        )
    )
    return weights, stats


def predict_langid(
    docs: DataFrame,
    weights: DataFrame,
    lang_stats: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = N_BUCKETS,
) -> DataFrame:
    """-> (doc_id, lang_pred, margin).  Weights broadcast-joined."""
    feats = _feature_rows(
        docs.withColumnRenamed(id_col, "doc_id"), text_col, ["doc_id"], n_buckets
    ).cache()
    return predict_from_features(feats, weights, lang_stats)


def predict_from_features(
    feats: DataFrame, weights: DataFrame, lang_stats: DataFrame
) -> DataFrame:
    """Score precomputed (doc_id, bucket) feature rows.

    ONE-SHUFFLE shape (round 3; the previous sizes + matched + grid-join +
    argmax-regroup paid four shuffles over the feature rows, measured
    2.1s at sf0.1 with warm features): the weight table is regrouped to a
    per-bucket lang->logp MAP (<= n_buckets rows, broadcast), left-joined
    1:1 onto the feature rows (row count preserved — n_feats needs no
    separate pass), then a single groupBy(doc_id) computes per-language
    matched sums/counts as conditional aggregates, and the argmax +
    runner-up margin are row-local array ops.  lang_stats is a tiny
    dimension — collected driver-side like the repo's other dim reads."""
    stats_rows = lang_stats.collect()
    langs = sorted(r["lang"] for r in stats_rows)
    prior = {r["lang"]: float(r["prior"]) for r in stats_rows}
    dflt = {r["lang"]: float(r["default_logp"]) for r in stats_rows}
    wb = weights.groupBy("bucket").agg(
        F.map_from_entries(F.collect_list(F.struct("lang", "logp"))).alias("wm")
    )
    j = feats.join(F.broadcast(wb), "bucket", "left")
    aggs = [F.count("*").alias("n_feats")]
    for i, l in enumerate(langs):
        e = F.element_at(F.col("wm"), F.lit(l))
        aggs.append(F.sum(e).alias(f"_s{i}"))
        aggs.append(F.count(e).alias(f"_m{i}"))
    per_doc = j.groupBy("doc_id").agg(*aggs)
    score_cols = [
        (
            F.lit(prior[l])
            + F.coalesce(F.col(f"_s{i}"), F.lit(0.0))
            + (F.col("n_feats") - F.col(f"_m{i}")) * F.lit(dflt[l])
        ).alias(f"_sc{i}")
        for i, l in enumerate(langs)
    ]
    scored = per_doc.select("doc_id", *score_cols)
    # sort key struct(-score, lang) reproduces (score DESC, lang ASC)
    arr = F.array_sort(
        F.array(
            *[
                F.struct(
                    (-F.col(f"_sc{i}")).alias("ns"),
                    F.lit(l).alias("lang"),
                    F.col(f"_sc{i}").alias("score"),
                )
                for i, l in enumerate(langs)
            ]
        )
    )
    return scored.select("doc_id", arr.alias("_a")).select(
        "doc_id",
        F.col("_a")[0]["lang"].alias("lang_pred"),
        F.when(
            F.size("_a") >= 2, F.col("_a")[0]["score"] - F.col("_a")[1]["score"]
        )
        .otherwise(F.lit(0.0))
        .alias("margin"),
    )
