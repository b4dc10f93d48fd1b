"""DSIR — Data Selection via Importance Resampling (Xie et al.,
NeurIPS 2023, arXiv:2302.03169): pick raw web pages whose hashed
word-n-gram distribution looks like a small high-quality TARGET corpus.

    feature   = bucket b = conv(md5(unigram-or-bigram), 16, 10) % B
    p_t(b)    = (count_target(b) + α) / (tot_target + αB)     [target model]
    p_r(b)    = (count_raw(b)    + α) / (tot_raw    + αB)     [raw model]
    logw(doc) = Σ_{b ∈ doc} ln p_t(b) − ln p_r(b)             [importance]
    key(doc)  = logw + Gumbel(md5(seed:id))                   [Gumbel top-k
                ≡ sampling k docs without replacement ∝ exp(logw)]

Everything is deterministic: feature hashing and the Gumbel noise are both
md5-derived (no ``rand()`` — this repo's resume-determinism ground rule),
so the selected set is a pure function of (corpus, target, seed, k) on any
partitioning.  The whole computation is DataFrame-native: one explode +
two hash aggregations build both distributions, the B-row log-ratio table
broadcast-joins back to the feature stream (B ≤ 2^14 — kilobytes), and a
single per-doc sum finishes scoring.  No UDFs, no driver loops.

The reference (HarvestText) has no data-selection surface; this extends
the engine's curation family (operators/curation.py — same salted-md5
uniform idiom) with the published importance-resampling recipe the
LLM-pretraining pipelines use.

Scale notes (100 TB): distributions are two map-side-combinable counts;
the ratio table is fixed at B rows regardless of corpus size; scoring is
one shuffle on doc_id.  ``dsir_topk`` plans as TakeOrderedAndProject
(per-partition partial top-k, driver merges k·P rows) — right for k up to
~1e6; past that use ``dsir_threshold_select`` which converts a keep
FRACTION into a key threshold via approxQuantile (one extra pass, fully
distributed, approximate at the boundary only).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

N_BUCKETS = 1 << 13
# explicit whitespace class: Java regex \s and RE2 \s disagree on \x0b
# (see substring_dedup's tokenizer pin) — spell the class out so Spark,
# the DuckDB oracle, and the pure-python test reference tokenize alike
_WS_CLASS = "[ \\t\\n\\x0B\\f\\r]+"
_TWO60 = float(1 << 60)


def _word_feature_rows(
    docs: DataFrame, text_col: str, keep_cols: list[str], n_buckets: int = N_BUCKETS
) -> DataFrame:
    """One row per hashed word-unigram/bigram occurrence: (*keep_cols,
    bucket).  Docs with no tokens (NULL/empty/whitespace text) emit no
    rows — callers left-join back by id.  The token array is materialized
    as a COLUMN before any lambda touches it (no CSE inside HOF lambdas —
    the langid _feature_rows lesson, measured O(n²) otherwise)."""
    toked = docs.select(
        *keep_cols,
        F.filter(
            F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))), _WS_CLASS),
            lambda t: t != "",
        ).alias("_toks"),
    )
    n = F.size("_toks")
    # codegen pair stream (r9): zip_with's lambda evaluates INTERPRETED
    # per element; slice+arrays_zip+row-level concat is whole-stage
    # codegen and emits byte-identical feature strings (b IS NULL marks a
    # unigram; tokens are non-null by the filter above)
    units = F.arrays_zip(
        F.col("_toks").alias("a"),
        F.array_repeat(F.lit(None).cast("string"), n).alias("b"),
    )
    pairs = F.when(
        n >= 2,
        F.arrays_zip(
            F.slice("_toks", 1, n - 1).alias("a"),
            F.slice("_toks", 2, n - 1).alias("b"),
        ),
    ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))
    feat = F.when(F.col("_fs.b").isNull(), F.col("_fs.a")).otherwise(
        F.concat(F.col("_fs.a"), F.lit(" "), F.col("_fs.b"))
    )
    return (
        toked.select(*keep_cols, F.explode(F.concat(units, pairs)).alias("_fs"))
        .select(
            *keep_cols,
            (
                F.conv(F.substring(F.md5(feat), 1, 8), 16, 10).cast("bigint")
                % n_buckets
            )
            .cast("int")
            .alias("bucket"),
        )
    )


def dsir_weights(
    raw: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = N_BUCKETS,
    alpha: float = 1.0,
    persist: bool = False,
    target_filter=None,
) -> DataFrame:
    """-> (id_col, logw, n_feats): per-doc log importance weight
    Σ ln(p_target/p_raw) over the doc's hashed-ngram bag.  Featureless
    docs get logw=0 (weight 1).  An EMPTY target degrades gracefully to
    the uniform model p_t = 1/B (α-smoothing floor), never divides by
    zero.  Both sides hashed with the same (md5 % B) channel, so the
    bucket vocabularies align by construction.

    ``persist=True`` materializes the raw feature stream (plan-keyed
    LRU-1 slot) so the raw-distribution count and the scoring join read
    it once instead of re-tokenizing the corpus twice — the langid
    shared-feature-relation pattern; turn it on in pipelines, leave it
    off for one-shot plans that must stay cache-free.

    ``target_filter`` (r9): when the target IS a row-subset of ``raw``
    (the common in-pipeline case), pass ``lambda id_col: <predicate>``
    and the target's bucket counts are derived by FILTERING the (already
    persisted) raw feature stream instead of re-scanning and
    re-tokenizing the target frame from storage — one corpus pass fewer,
    value-identical because feature extraction is per-row.  ``target``
    is ignored for counting in that case (caller guarantees
    target == raw.filter(pred))."""
    raw_feats = _word_feature_rows(
        raw.select(F.col(id_col).alias("_id"), text_col), text_col, ["_id"], n_buckets
    )
    if persist:
        from harvesttext_spark.session import plan_keyed_persist

        raw_feats = plan_keyed_persist(raw_feats, "dsir_raw_feats")
    ab = float(alpha) * n_buckets
    if target_filter is not None:
        # ONE conditional aggregation replaces the separate target count
        # table, and the two totals are exact integer sums over the
        # ≤ n_buckets dimension rows collected driver-side (the langid
        # lang_stats precedent) — the r8 shape paid three chained
        # broadcast-build jobs (target agg → totals crossJoin → ratio)
        # per invocation.  NULL ids fall out of the conditional count
        # exactly as they fell out of the filter.  The log-ratio doubles
        # are computed by the SAME Spark expression over the same long
        # inputs (int totals < 2^53 convert to double exactly), so every
        # score is bit-identical to the two-table formulation.
        counts = raw_feats.groupBy("bucket").agg(
            F.count(F.lit(1)).alias("cr"),
            F.count(F.when(target_filter(F.col("_id")), F.lit(1))).alias("ct"),
        )
        rows = counts.collect()
        r_tot = sum(r["cr"] for r in rows)
        t_tot = sum(r["ct"] for r in rows)
        spark = raw.sparkSession
        ratio = spark.createDataFrame(
            rows, "bucket int, cr bigint, ct bigint"
        ).select(
            "bucket",
            (
                F.log((F.col("ct") + alpha) / F.lit(float(t_tot) + ab))
                - F.log((F.col("cr") + alpha) / F.lit(float(r_tot) + ab))
            ).alias("logratio"),
        )
    else:
        tgt_feats = _word_feature_rows(target, text_col, [], n_buckets)
        raw_counts = raw_feats.groupBy("bucket").agg(F.count("*").alias("cr"))
        tgt_counts = tgt_feats.groupBy("bucket").agg(F.count("*").alias("ct"))
        tots = raw_counts.agg(F.sum("cr").alias("r_tot")).crossJoin(
            F.broadcast(
                tgt_counts.agg(F.coalesce(F.sum("ct"), F.lit(0)).alias("t_tot"))
            )
        )
        # every scored feature hits this table: raw_counts covers the raw
        # corpus's own buckets by construction (target-only buckets can't
        # appear in the feature stream being scored)
        ratio = (
            raw_counts.join(tgt_counts, "bucket", "left")
            .crossJoin(F.broadcast(tots))
            .select(
                "bucket",
                (
                    F.log(
                        (F.coalesce(F.col("ct"), F.lit(0)) + alpha)
                        / (F.col("t_tot") + ab)
                    )
                    - F.log((F.col("cr") + alpha) / (F.col("r_tot") + ab))
                ).alias("logratio"),
            )
        )
    scored = (
        raw_feats.join(F.broadcast(ratio), "bucket")
        .groupBy("_id")
        .agg(F.sum("logratio").alias("logw"), F.count("*").alias("n_feats"))
    )
    return (
        raw.select(F.col(id_col).alias("_id"))
        .join(scored, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            F.coalesce(F.col("logw"), F.lit(0.0)).alias("logw"),
            F.coalesce(F.col("n_feats"), F.lit(0)).alias("n_feats"),
        )
    )


def gumbel_key(id_col: Column, seed: int = 42) -> Column:
    """Deterministic standard-Gumbel noise from md5(seed:id): uniform
    u = (60-bit hex prefix + 0.5) / 2^60 ∈ (0,1), g = −ln(−ln u).  Pure
    IEEE double arithmetic — bit-identical in Spark and DuckDB.  NULL id
    -> NULL key (such rows can never be selected; route them explicitly)."""
    v = F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{seed}:"), id_col.cast("string"))), 1, 15),
        16,
        10,
    ).cast("bigint")
    u = (v.cast("double") + F.lit(0.5)) / F.lit(_TWO60)
    return -F.log(-F.log(u))


def dsir_topk(
    raw: DataFrame,
    target: DataFrame,
    k: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = N_BUCKETS,
    alpha: float = 1.0,
    seed: int = 42,
    persist: bool = False,
    target_filter=None,
) -> DataFrame:
    """-> the k selected rows as (id_col, logw, gkey), ranked by the
    Gumbel-perturbed key (exact Gumbel top-k resampling).  Selection uses
    FULL-precision keys; the returned logw/gkey are rounded to 4 decimals
    so value oracles compare stably across engines (langid margin
    precedent — argmax/boundary flips would need sub-1e-10 ties).  Ties
    break on id for determinism.  Plans as TakeOrderedAndProject — see
    the module docstring for the huge-k path.  ``target_filter``: see
    dsir_weights."""
    w = dsir_weights(
        raw, target, text_col, id_col, n_buckets, alpha, persist, target_filter
    )
    keyed = w.select(
        id_col, "logw", (F.col("logw") + gumbel_key(F.col(id_col), seed)).alias("_key")
    )
    return (
        keyed.orderBy(F.col("_key").desc(), F.col(id_col).asc())
        .limit(k)
        .select(
            id_col,
            F.round("logw", 4).alias("logw"),
            F.round("_key", 4).alias("gkey"),
        )
    )


def dsir_threshold_select(
    raw: DataFrame,
    target: DataFrame,
    keep_frac: float,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = N_BUCKETS,
    alpha: float = 1.0,
    seed: int = 42,
    quantile_error: float = 0.001,
    persist: bool = True,
) -> DataFrame:
    """Scale path: keep ≈ ``keep_frac`` of rows — those whose Gumbel key
    clears the (1−keep_frac) approxQuantile threshold.  Fully distributed
    (no driver-side k-row merge); the boundary is approximate within
    ``quantile_error`` of mass, membership is still deterministic given
    the computed threshold.  Returns ALL raw columns + logw + dsir_keep."""
    if not 0.0 < keep_frac <= 1.0:
        raise ValueError(f"keep_frac must be in (0, 1], got {keep_frac}")
    w = dsir_weights(raw, target, text_col, id_col, n_buckets, alpha)
    keyed = w.withColumn("_key", F.col("logw") + gumbel_key(F.col(id_col), seed))
    if persist:
        # the quantile action and the final join both consume the keyed
        # frame — persist the per-doc keys (1 row/doc, 3 numeric cols, far
        # smaller than the exploded feature stream) or the whole weight
        # pipeline runs twice.  ON by default; the keep_frac=1.0 fast path
        # below never computes the quantile, so skipping persist there
        # would also be fine — kept uniform for predictable memory use.
        from harvesttext_spark.session import plan_keyed_persist

        keyed = plan_keyed_persist(keyed, "dsir_keys")
    if keep_frac >= 1.0:
        tau = float("-inf")
    else:
        tau = keyed.approxQuantile("_key", [1.0 - keep_frac], quantile_error)[0]
    flags = keyed.select(
        F.col(id_col).alias("_wid"),
        "logw",
        (F.col("_key") >= F.lit(tau)).alias("dsir_keep"),
    )
    return raw.join(
        flags, raw[id_col] == flags["_wid"], "left"
    ).drop("_wid")
