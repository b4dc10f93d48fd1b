"""SO-PMI sentiment lexicon mining — reference semantics
(``harvesttext/algorithms/sent_dict.py:49-100``, ``harvesttext/sentiment.py:9-43``)
as broadcast-join relational dataflow.

Reference model: docs are SETS of tokens (``sentiment.py:27``), so
  one_occur[w]      = number of docs containing w          (doc frequency)
  co_occur[(a,b)]   = number of docs containing both a,b   (incl. (w,w))
  PMI(w1,w2)        = log2(c12 * N / (c1 * c2)),  0 if never co-occur
  SO_PMI(w)         = Σ_pos PMI(w,s) − Σ_neg PMI(w,s)   over w with
                      doc-freq ≥ min_times
  scale "+-1"       = positive values / max, negative / |min| (0 preserved)
  scale "0-1"       = (x − min) / (max − min), where max/min include 0

Scale design: the quadratic pair space is never materialized — tokens are
joined against the (tiny, broadcast) seed posting lists only, so the shuffle
is O(corpus tokens), not O(tokens²).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _distinct_tokens(docs: DataFrame, words_col: str, id_col: str) -> DataFrame:
    """(doc_id, word) posting list — one row per distinct token per doc."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array_distinct(F.col(words_col))).alias("word"),
    )


def build_sent_dict(
    docs: DataFrame,
    pos_seeds: list[str] | None = None,
    neg_seeds: list[str] | None = None,
    words_col: str = "words",
    id_col: str = "doc_id",
    min_times: int = 5,
    scale: str = "None",
    stopwords: list[str] | None = None,
) -> DataFrame:
    """-> (word, senti).  ``docs`` carries a token-array column (the output
    of the tokenize stage); empty docs are dropped as the reference does
    after stopword removal.  When both seed lists are None, the FULL
    bundled 清华 sentiment lexicon applies — the reference default
    (``harvesttext/harvesttext.py`` build_sent_dict falls back to
    get_qh_sent_dict)."""
    if pos_seeds is None and neg_seeds is None:
        from harvesttext_spark.functions.resources import get_qh_sent_dict

        seeds0 = get_qh_sent_dict()
        pos_seeds, neg_seeds = seeds0["pos"], seeds0["neg"]
    pos_seeds = pos_seeds or []
    neg_seeds = neg_seeds or []
    spark = docs.sparkSession
    if stopwords:
        sw = F.array(*[F.lit(w) for w in set(stopwords)])
        docs = docs.withColumn(words_col, F.array_except(F.col(words_col), sw))
    docs = docs.filter(F.size(F.col(words_col)) > 0)
    tokens = _distinct_tokens(docs, words_col, id_col).cache()
    # n_docs from the cached posting table, not a separate docs.count():
    # every kept doc has >= 1 distinct token (size > 0 filter above) and
    # ids identify documents (the reference's doc-set model assumes the
    # same), so countDistinct(doc_id) == docs.count() — and this single
    # job also materializes the token cache instead of paying one extra
    # full tokenize pass (r9, guide §1.2)
    n_docs = tokens.agg(F.countDistinct("doc_id")).first()[0]
    if n_docs == 0:
        tokens.unpersist()
        return spark.createDataFrame([], "word string, senti double")
    one = tokens.groupBy("word").agg(F.count("*").alias("c"))
    vocab = one.filter(F.col("c") >= min_times).cache()

    seeds = spark.createDataFrame(
        [(w, 1) for w in set(pos_seeds)] + [(w, -1) for w in set(neg_seeds)],
        "word string, sign int",
    )
    # seeds must themselves pass min_times (reference: seeds ∩ words)
    live_seeds = seeds.join(vocab.select("word", F.col("c").alias("c_seed")), "word")
    if live_seeds.count() == 0:
        raise Exception("你的文章中不包含种子词，SO-PMI算法无法执行")

    seed_tokens = tokens.join(
        F.broadcast(live_seeds.select(F.col("word").alias("seed"), "sign", "c_seed")),
        tokens.word == F.col("seed"),
    ).select("doc_id", "seed", "sign", "c_seed")

    # co-occurrence of every token with every live seed: one broadcast-side
    # join on doc_id per posting list — O(tokens × seeds-in-doc)
    co = (
        tokens.join(seed_tokens, "doc_id")
        .groupBy("word", "seed", "sign", "c_seed")
        .agg(F.count("*").alias("c12"))
    )
    contrib = co.join(one, "word").select(
        "word",
        (
            F.col("sign")
            * F.log2(F.col("c12") * F.lit(float(n_docs)) / (F.col("c") * F.col("c_seed")))
        ).alias("pmi"),
    )
    senti = vocab.join(
        contrib.groupBy("word").agg(F.sum("pmi").alias("s")), "word", "left"
    ).select("word", F.coalesce("s", F.lit(0.0)).alias("senti"))

    if scale in ("+-1", "0-1"):
        mx, mn = senti.agg(
            F.greatest(F.max("senti"), F.lit(0.0)),
            F.least(F.min("senti"), F.lit(0.0)),
        ).first()
        if scale == "+-1":
            senti = senti.select(
                "word",
                F.when(F.col("senti") > 0, F.col("senti") / F.lit(mx))
                .when(F.col("senti") < 0, F.col("senti") / F.lit(-mn))
                .otherwise(F.col("senti"))
                .alias("senti"),
            )
        else:
            rng = (mx - mn) or 1.0
            senti = senti.select(
                "word", ((F.col("senti") - F.lit(mn)) / F.lit(rng)).alias("senti")
            )
    return senti


def analyse_sent(
    docs: DataFrame,
    sent_dict: DataFrame,
    words_col: str = "words",
    id_col: str = "doc_id",
    avg: bool = True,
) -> DataFrame:
    """Lexicon values over each doc's distinct in-dict tokens
    (``sent_dict.py:39-47``): mean (0 when none match) by default, or the
    raw value list with ``avg=False`` -> (doc_id, senti | sentis)."""
    tokens = _distinct_tokens(docs, words_col, id_col)
    matched = tokens.join(sent_dict, "word")
    if avg:
        scored = matched.groupBy("doc_id").agg(F.avg("senti").alias("s"))
        return docs.select(F.col(id_col).alias("doc_id")).join(
            scored, "doc_id", "left"
        ).select("doc_id", F.coalesce("s", F.lit(0.0)).alias("senti"))
    scored = matched.groupBy("doc_id").agg(
        F.sort_array(F.collect_list("senti")).alias("sentis")
    )
    return docs.select(F.col(id_col).alias("doc_id")).join(
        scored, "doc_id", "left"
    ).select(
        "doc_id",
        F.coalesce("sentis", F.array().cast("array<double>")).alias("sentis"),
    )


def toxicity_udf(terms):
    """Arrow-batched per-document toxic-term density: |tokens in lexicon|
    / |tokens| (multiset — repeated slurs count each time, unlike
    analyse_sent's distinct-token sentiment mean).  The lexicon-scoring
    stage the north rule's "PII/toxicity-scrub" names, recast from SURVEY
    §2.6's sentiment machinery for whitespace-tokenized (latin /
    pre-segmented) text; zh callers segment first (functions/tokenize.py).

    Shape: toxicity is a PER-ROW map, so it is one Arrow-batched pandas
    UDF over the text column — zero shuffle, no join-back, and no
    uniqueness precondition on the id column (an aggregate + join-back
    design would silently merge duplicate urls).  The lexicon is a small
    closure-captured frozenset (a broadcast dim, like the battery's
    regex tables).  Docs with no tokens (incl. NULL text) score NULL —
    density over zero tokens is no evidence, not 0."""
    vocab = frozenset(t.lower() for t in terms)

    # no type hints: module-level future-annotations stringify them and
    # pyspark's hint inference then rejects the signature
    @F.pandas_udf("double")
    def _tox(s):
        def one(t):
            toks = t.lower().split()
            if not toks:
                return None
            return sum(tok in vocab for tok in toks) / len(toks)

        return s.map(one, na_action="ignore")

    return _tox


def toxicity_score(
    df: DataFrame,
    terms,
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "toxicity",
) -> DataFrame:
    """(id, toxicity) — ``toxicity_udf`` applied to one table."""
    return df.select(
        F.col(id_col), toxicity_udf(terms)(F.col(text_col)).alias(out_col)
    )
