"""KenLM-style n-gram language-model perplexity as a document-quality
signal (BASELINE.json north_star: "a KenLM-style n-gram perplexity scorer").

Model: bigram LM with stupid backoff (Brants et al. 2007 — the standard
web-scale choice because it needs no discount tuning and distributes as
plain counts):

    S(w_i | w_{i-1}) = count(w_{i-1} w_i) / count(w_{i-1})   if bigram seen
                     = alpha * count(w_i) / total_tokens      otherwise

    doc score = exp(-mean_i ln S(w_i | w_{i-1}))   (perplexity; lower = more
    natural text under the training corpus)

Everything is relational:
  * TRAIN: two groupBy counts over the corpus token stream -> a unigram
    table and a bigram table (the "ARPA file" equivalent, stored as
    parquet/broadcast dims).
  * SCORE: explode each doc's bigrams, left-join the LM tables, aggregate
    mean log-prob per doc.  At 100TB the LM tables are the small side —
    broadcast (or bucketed) joins; the scan stays one pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

ALPHA = 0.4  # stupid-backoff constant

# share one persisted tokenized frame across the three self-scored LM
# passes only below this many input docs (tokens ≈ corpus bytes — do not
# materialize at crawl scale)
LM_PERSIST_MAX_DOCS = 500_000


def _bigram_structs(toks_col: str):
    """array<struct<w1,w2>> of adjacent token pairs, via codegen
    arrays_zip over two slices.  Replaces the r5 transform(sequence,
    element_at) lambda: higher-order-function lambdas evaluate
    INTERPRETED per element (repo rule), while slice+arrays_zip are
    ordinary codegen expressions — value-identical pair stream, same
    order (guide §4.1: prefer built-ins)."""
    n = F.size(toks_col)
    return F.arrays_zip(
        F.slice(toks_col, 1, n - 1).alias("w1"),
        F.slice(toks_col, 2, n - 1).alias("w2"),
    )


def _doc_tokens(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Whitespace tokens; unsegmented text (zh prose — one giant 'token')
    falls back to char symbols so CJK documents get a char-bigram LM
    instead of silently skipping the signal."""
    ws = F.filter(F.split(F.col(text_col), "\\s+"), lambda t: t != "")
    chars = F.filter(F.split(F.col(text_col), ""), lambda c: (c != "") & (c != " "))
    toks = F.when(
        (F.size(ws) < 2) & (F.length(F.col(text_col)) >= 2), chars
    ).otherwise(ws)
    return docs.select(F.col(id_col).alias("doc_id"), toks.alias("toks")).filter(
        F.size("toks") >= 2
    )


def train_bigram_lm(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    persist: bool = False,
    base: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame, int]:
    """-> (unigrams(word, c1), bigrams(w1, w2, c2), total_tokens).

    ``persist=True`` materializes the two count tables (plan-keyed LRU-1
    eviction, same contract as dedup's signature cache): the totals job
    and the two broadcast builds then read the tiny aggregates instead of
    re-scanning and re-tokenizing the corpus three more times.

    ``base``: pre-tokenized (doc_id, toks) frame to use instead of
    re-deriving it (perplexity_signal shares ONE — possibly persisted —
    token frame between training and self-scoring)."""
    if base is None:
        base = _doc_tokens(docs, text_col, id_col)
    uni = (
        base.select(F.explode("toks").alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("c1"))
    )
    big = (
        base.select(F.explode(_bigram_structs("toks")).alias("bg"))
        .groupBy(F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
        .agg(F.count("*").alias("c2"))
    )
    if persist:
        from harvesttext_spark.session import plan_keyed_persist

        uni = plan_keyed_persist(uni, "lm_uni")
        big = plan_keyed_persist(big, "lm_big")
    total = uni.agg(F.sum("c1")).first()[0]
    return uni, big, int(total)


def score_perplexity(
    docs: DataFrame,
    unigrams: DataFrame,
    bigrams: DataFrame,
    total_tokens: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = ALPHA,
    base: DataFrame | None = None,
) -> DataFrame:
    """-> (doc_id, n_bigrams, ppl).  LM tables join broadcast.
    ``base``: pre-tokenized (doc_id, toks) frame (see train_bigram_lm)."""
    if base is None:
        base = _doc_tokens(docs, text_col, id_col)
    pairs = base.select(
        "doc_id",
        F.posexplode(_bigram_structs("toks")).alias("pos", "bg"),
    ).select("doc_id", "pos", F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))

    joined = (
        pairs.join(F.broadcast(bigrams), ["w1", "w2"], "left")
        .join(
            F.broadcast(unigrams.select(F.col("word").alias("w1"), F.col("c1").alias("c1_prev"))),
            "w1",
            "left",
        )
        .join(
            F.broadcast(unigrams.select(F.col("word").alias("w2"), F.col("c1").alias("c1_cur"))),
            "w2",
            "left",
        )
    )
    # stupid backoff; unseen unigrams get a 1-count floor (OOV)
    prob = F.when(
        F.col("c2").isNotNull(), F.col("c2") / F.col("c1_prev")
    ).otherwise(
        F.lit(alpha)
        * F.coalesce(F.col("c1_cur"), F.lit(1))
        / F.lit(float(total_tokens))
    )
    return (
        joined.select("doc_id", F.log(prob).alias("lp"))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.exp(-F.avg("lp")).alias("ppl"),
        )
    )


def train_trigram_lm(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> tuple[DataFrame, DataFrame, DataFrame, int]:
    """-> (unigrams, bigrams, trigrams(w1,w2,w3,c3), total_tokens)."""
    uni, big, total = train_bigram_lm(docs, text_col, id_col)
    base = _doc_tokens(docs, text_col, id_col).filter(F.size("toks") >= 3)
    n = F.size("toks")
    tri = (
        base.select(
            F.explode(
                F.arrays_zip(
                    F.slice("toks", 1, n - 2).alias("w1"),
                    F.slice("toks", 2, n - 2).alias("w2"),
                    F.slice("toks", 3, n - 2).alias("w3"),
                )
            ).alias("tg")
        )
        .groupBy(
            F.col("tg.w1").alias("w1"),
            F.col("tg.w2").alias("w2"),
            F.col("tg.w3").alias("w3"),
        )
        .agg(F.count("*").alias("c3"))
    )
    return uni, big, tri, total


def score_perplexity_trigram(
    docs: DataFrame,
    unigrams: DataFrame,
    bigrams: DataFrame,
    trigrams: DataFrame,
    total_tokens: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = ALPHA,
) -> DataFrame:
    """Three-level stupid backoff:
        S(w3|w1w2) = c3/c2(w1,w2)                  if trigram seen
                   = a * c2(w2,w3)/c1(w2)          elif bigram seen
                   = a^2 * c1(w3)/total  (1 floor) else
    -> (doc_id, n_trigrams, ppl)."""
    base = _doc_tokens(docs, text_col, id_col).filter(F.size("toks") >= 3)
    n = F.size("toks")
    tg = base.select(
        "doc_id",
        F.explode(
            F.arrays_zip(
                F.slice("toks", 1, n - 2).alias("w1"),
                F.slice("toks", 2, n - 2).alias("w2"),
                F.slice("toks", 3, n - 2).alias("w3"),
            )
        ).alias("t"),
    ).select("doc_id", "t.w1", "t.w2", "t.w3")

    big12 = bigrams.select(
        F.col("w1"), F.col("w2"), F.col("c2").alias("c2_ctx")
    )
    big23 = bigrams.select(
        F.col("w1").alias("w2"), F.col("w2").alias("w3"), F.col("c2").alias("c2_next")
    )
    uni2 = unigrams.select(F.col("word").alias("w2"), F.col("c1").alias("c1_mid"))
    uni3 = unigrams.select(F.col("word").alias("w3"), F.col("c1").alias("c1_last"))

    joined = (
        tg.join(F.broadcast(trigrams), ["w1", "w2", "w3"], "left")
        .join(F.broadcast(big12), ["w1", "w2"], "left")
        .join(F.broadcast(big23), ["w2", "w3"], "left")
        .join(F.broadcast(uni2), "w2", "left")
        .join(F.broadcast(uni3), "w3", "left")
    )
    prob = (
        F.when(F.col("c3").isNotNull(), F.col("c3") / F.col("c2_ctx"))
        .when(
            F.col("c2_next").isNotNull(),
            F.lit(alpha) * F.col("c2_next") / F.col("c1_mid"),
        )
        .otherwise(
            F.lit(alpha * alpha)
            * F.coalesce(F.col("c1_last"), F.lit(1))
            / F.lit(float(total_tokens))
        )
    )
    return (
        joined.select("doc_id", F.log(prob).alias("lp"))
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_trigrams"), F.exp(-F.avg("lp")).alias("ppl"))
    )


def perplexity_signal(
    train_docs: DataFrame,
    score_docs: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Train on one corpus, score (possibly the same) docs: the self-scored
    variant is the quality signal — boilerplate and word-soup rank high-ppl
    relative to in-domain prose.

    The LM tables are persisted before use: without it the lineage
    re-scans and re-tokenizes the corpus once for the totals job and once
    per broadcast build (4 input scans per call, measured ~0.7s of the
    query at sf0.1).  At 100 TB these are the checkpointed LM dimension
    tables the module docstring describes.

    r9: in the self-scored case the unigram aggregate, the bigram
    aggregate, and the scoring pass all tokenize the SAME corpus — below
    a size gate (free Catalyst estimate, the substring-census precedent)
    the tokenized (doc_id, toks) frame is plan-keyed-persisted once and
    shared by all three; at crawl scale the tokenized corpus is as big
    as the corpus itself and recomputing the codegen split stays the
    right trade."""
    base = None
    if score_docs is None:
        from harvesttext_spark.operators.dedup import _estimated_rows

        base = _doc_tokens(train_docs, text_col, id_col)
        est = _estimated_rows(train_docs)
        if est is not None and est <= LM_PERSIST_MAX_DOCS:
            from harvesttext_spark.session import plan_keyed_persist

            base = plan_keyed_persist(base, "lm_base")
    uni, big, total = train_bigram_lm(
        train_docs, text_col, id_col, persist=True, base=base
    )
    out = score_perplexity(
        score_docs if score_docs is not None else train_docs,
        uni,
        big,
        total,
        text_col,
        id_col,
        base=base,
    )
    return out


def ppl_buckets(
    df: DataFrame,
    ppl_col: str = "ppl",
    group_col: str = "lang",
    out_col: str = "ppl_bucket",
) -> DataFrame:
    """CCNet head/middle/tail split (Wenzek et al. 2020 §4.4: each
    language's corpus is cut into perplexity TERCILES; head = lowest
    perplexity = most Wikipedia-like, and most published pipelines
    train on head+middle).  All rows + (ppl_rank, ppl_bucket).

    percent_rank per group: ONE window shuffle keyed on ``group_col``
    (per-language, the CCNet grain — do not pass a constant group at
    scale: a global rank is a single-partition sort).  Ties share a
    rank, so the split is a pure function of the (group, ppl) multiset
    — no id tie-break needed, and both engines compute identical
    doubles ((rank-1)/(n-1) vs the 1/3 literal), making the whole
    thing SQL-mirrorable (parity pytest; driver prefix is full)."""
    w = Window.partitionBy(group_col).orderBy(F.asc(ppl_col))
    pr = F.percent_rank().over(w)
    bucket = (
        F.when(pr < F.lit(1.0 / 3), F.lit("head"))
        .when(pr < F.lit(2.0 / 3), F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    return df.select(
        "*", F.round(pr, 6).alias("ppl_rank"), bucket.alias(out_col)
    )
