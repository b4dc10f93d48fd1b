"""Graph construction & ranking: entity co-occurrence networks, TextRank
keywords, TF-IDF keywords, extractive summarization.

Reference semantics: ``harvesttext/ent_network.py:11-123`` (edge weight =
number of docs where both entities occur), ``harvesttext/algorithms/
keyword.py:4-36`` (sliding-window word graph + pagerank),
``harvesttext/summary.py:11-79`` (sentence-similarity graph + pagerank +
optional MMR), ``harvesttext/word_discover.py:243-301`` (TF-IDF keywords).

Spark design:
  * corpus-level graphs are EDGE DATAFRAMES from posting-list self-joins —
    never a driver-side networkx object;
  * per-document ranking (TextRank keywords / summary) runs inside
    ``applyInPandas`` — each document's graph is tiny, the fleet of
    documents is the parallelism; the from-scratch power-iteration
    pagerank (``pagerank_dict`` below) reproduces the reference's
    networkx.pagerank semantics (damping 0.85, weighted out-edge
    normalization, L1 convergence) — networkx itself is importable in
    this image but its pagerank needs scipy (absent), so the
    power-iteration recast stays the execution path;
  * corpus-level PageRank, when needed, is the iterative join/agg loop
    (``pagerank_edges``) — O(E) shuffles per iteration, AQE-coalesced.
"""

from __future__ import annotations

from itertools import combinations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


# --- entity co-occurrence network ----------------------------------------

def cooccurrence_edges(
    posting: DataFrame, min_freq: int = 0, keys: DataFrame | None = None
) -> DataFrame:
    """(u, v, weight) with u < v; weight = #docs containing both keys.
    ``posting`` is the (doc_id, key) table; optional ``keys`` restricts the
    node set (broadcast semi-join)."""
    p = posting
    if keys is not None:
        p = p.join(F.broadcast(keys), "key", "semi")
    a = p.select("doc_id", F.col("key").alias("u"))
    b = p.select("doc_id", F.col("key").alias("v"))
    edges = (
        a.join(b, "doc_id")
        .filter(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.countDistinct("doc_id").alias("weight"))
    )
    return edges.filter(F.col("weight") >= min_freq) if min_freq > 0 else edges


def word_cooccurrence_edges(
    docs: DataFrame,
    words_col: str = "words",
    id_col: str = "doc_id",
    center: str | None = None,
    min_freq: int = 0,
) -> DataFrame:
    """Word ego-graph edges (ent_network.py:43-82): over docs containing
    ``center`` (if given), weight = #docs where both words occur."""
    d = docs
    if center is not None:
        d = d.filter(F.array_contains(F.col(words_col), center))
    posting = d.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array_distinct(F.col(words_col))).alias("key"),
    )
    return cooccurrence_edges(posting, min_freq=min_freq)


def entity_ego_edges(
    posting: DataFrame, center: str, min_freq: int = 0
) -> DataFrame:
    """Entity ego network (ent_network.py:84-123): restrict to docs
    containing the center key (semi-join on its posting list), then
    co-occurrence edges among the remaining keys."""
    center_docs = posting.filter(F.col("key") == center).select("doc_id")
    p = posting.join(F.broadcast(center_docs), "doc_id", "semi")
    edges = cooccurrence_edges(p, min_freq=min_freq)
    return edges.filter((F.col("u") == center) | (F.col("v") == center) | (F.col("weight") >= min_freq))


# --- TF-IDF keywords (pure relational) ------------------------------------

def tfidf_keywords(
    docs: DataFrame,
    words_col: str = "words",
    id_col: str = "doc_id",
    top_k: int = 5,
    stopwords: list[str] | None = None,
    n_docs: int | None = None,
) -> DataFrame:
    """Classic relational TF-IDF with per-doc top-k:
    tf = in-doc count, idf = ln(N / df), rank via window.  -> (doc_id, word,
    tfidf, rank).  Ties broken by word for determinism.

    ``n_docs``: pass the row count when the caller already knows it (e.g.
    from parquet footer metadata) to skip one count job over the scan."""
    from pyspark.sql.window import Window

    if n_docs is None:
        n_docs = docs.count()
    tok = docs.select(
        F.col(id_col).alias("doc_id"), F.explode(words_col).alias("word")
    )
    if stopwords:
        sw = docs.sparkSession.createDataFrame([(w,) for w in set(stopwords)], "word string")
        tok = tok.join(F.broadcast(sw), "word", "left_anti")
    tf = tok.groupBy("doc_id", "word").agg(F.count("*").alias("tf"))
    df_ = tf.groupBy("word").agg(F.count("*").alias("df"))
    scored = tf.join(df_, "word").select(
        "doc_id",
        "word",
        (F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df"))).alias("tfidf"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("word"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= top_k
    )


# --- per-document TextRank (applyInPandas) ---------------------------------

def pagerank_dict(
    adj: dict, alpha: float = 0.85, max_iter: int = 100, tol: float = 1e-6
) -> dict:
    """Power-iteration PageRank over {u: {v: weight}} adjacency (undirected
    graphs pass both directions).  Same formulation/stopping rule as
    networkx.pagerank (which needs scipy, absent here): column-stochastic by
    out-weight, uniform dangling mass, err < n*tol."""
    nodes = list(adj)
    n = len(nodes)
    if n == 0:
        return {}
    x = dict.fromkeys(nodes, 1.0 / n)
    out_w = {u: float(sum(adj[u].values())) for u in nodes}
    for _ in range(max_iter):
        x_new = dict.fromkeys(nodes, 0.0)
        dangle = sum(x[u] for u in nodes if out_w[u] == 0.0)
        for u in nodes:
            if out_w[u] > 0.0:
                xu = alpha * x[u] / out_w[u]
                for v, w in adj[u].items():
                    x_new[v] += xu * w
        base = alpha * dangle / n + (1.0 - alpha) / n
        for u in nodes:
            x_new[u] += base
        err = sum(abs(x_new[u] - x[u]) for u in nodes)
        x = x_new
        if err < n * tol:
            break
    return x


def _textrank_block(word_lists, top_k, window, weighted):
    """Reference textrank (keyword.py:19-36) over one document's blocks."""
    adj: dict = {}

    def add_edge(u, v, w):
        if u == v:
            return
        adj.setdefault(u, {})
        adj.setdefault(v, {})
        if weighted:
            adj[u][v] = adj[u].get(v, 0) + w
            adj[v][u] = adj[v].get(u, 0) + w
        else:
            adj[u][v] = 1
            adj[v][u] = 1

    for wl in word_lists:
        for x in range(1, max(window, 2)):
            if x >= len(wl):
                break
            for u, v in zip(wl, wl[x:]):
                add_edge(u, v, 1)
    pr = pagerank_dict(adj)
    return sorted(pr.items(), key=lambda kv: (-kv[1], kv[0]))[:top_k]


def textrank_keywords(
    sent_words: DataFrame,
    id_col: str = "doc_id",
    words_col: str = "words",
    top_k: int = 5,
    window: int = 2,
    weighted: bool = False,
) -> DataFrame:
    """TextRank keywords per document.  Input: one row per sentence
    (doc_id, words array).  -> (doc_id, word, score).  Per-doc graphs are
    tiny; parallelism = documents."""

    def per_doc(pdf: pd.DataFrame) -> pd.DataFrame:
        doc_id = pdf[id_col].iloc[0]
        ranked = _textrank_block(list(pdf[words_col]), top_k, window, weighted)
        return pd.DataFrame(
            {"doc_id": doc_id, "word": [w for w, _ in ranked], "score": [s for _, s in ranked]}
        )

    return sent_words.groupBy(id_col).applyInPandas(
        per_doc, schema="doc_id long, word string, score double"
    )


def extract_keywords(
    docs: DataFrame,
    method: str = "tfidf",
    id_col: str = "doc_id",
    words_col: str = "words",
    top_k: int = 5,
    stopwords: list[str] | None = None,
    window: int = 2,
    weighted: bool = True,
) -> DataFrame:
    """API-parity dispatcher for the reference's ``extract_keywords``
    (``word_discover.py:243-301``): method 'tfidf' (jieba_tfidf analog —
    relational TF-IDF over the corpus instead of jieba's packaged IDF) or
    'textrank' (per-doc window graph).  -> (doc_id, word, score).

    Stopword semantics mirror the reference exactly:

    - tfidf (``word_discover.py:279-283``): scores are computed WITHOUT
      removing stopwords, the top ``2*top_k`` are fetched, stopwords are
      dropped post-hoc, then the list is truncated to ``top_k``.  When
      more than ``top_k`` of the top ``2*top_k`` slots are stopwords the
      reference returns FEWER than ``top_k`` keywords — so do we (a
      pre-drop anti-join would backfill; golden-pinned in
      test_graph_summary.py).  Non-stopword scores are identical either
      way (tf and df of a word don't depend on other words), only the
      truncation boundary differs.
    - textrank (``word_discover.py:296-299``): stopwords are removed
      BEFORE graph construction, preserving order and multiplicity of
      the surviving words (the reference's posseg list-comprehension) —
      NOT ``array_except``, which dedupes the sequence and corrupts
      window edges/weights.  ``weighted`` defaults True like the
      reference's kwargs default (``word_discover.py:291``).
    """
    if method == "tfidf":
        if stopwords:
            from pyspark.sql.window import Window

            sw_df = docs.sparkSession.createDataFrame(
                [(w,) for w in set(stopwords)], "word string"
            )
            fetched = tfidf_keywords(docs, words_col, id_col, 2 * top_k, None)
            kept = fetched.join(F.broadcast(sw_df), "word", "left_anti")
            w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("word"))
            out = (
                kept.withColumn("rerank", F.row_number().over(w))
                .filter(F.col("rerank") <= top_k)
                .drop("rank", "rerank")
            )
        else:
            out = tfidf_keywords(docs, words_col, id_col, top_k, None).drop("rank")
        return out.select(F.col("doc_id").alias(id_col), "word", F.col("tfidf").alias("score"))
    if method == "textrank":
        d = docs
        if stopwords:
            sw = F.array(*[F.lit(w) for w in sorted(set(stopwords))])
            d = d.withColumn(
                words_col,
                F.filter(F.col(words_col), lambda x: ~F.array_contains(sw, x)),
            )
        sent = d.select(F.col(id_col), F.lit(0).alias("sent_id"), F.col(words_col))
        return textrank_keywords(sent, id_col, words_col, top_k, window, weighted)
    raise ValueError(f"unknown method {method!r} (tfidf|textrank)")


# --- summarization ----------------------------------------------------------

def _sent_sim_textrank(w1, w2):
    import math

    if len(w1) <= 1 or len(w2) <= 1:
        return 0.0
    return len(set(w1) & set(w2)) / (math.log2(len(w1)) + math.log2(len(w2)))


def _sent_sim_cos(words1, words2):
    from collections import Counter

    eps = 1e-5
    b1, b2 = Counter(words1), Counter(words2)
    n1 = sum(x * x for x in b1.values()) ** 0.5 + eps
    n2 = sum(x * x for x in b2.values()) ** 0.5 + eps
    return sum(b1[w] * b2[w] for w in set(b1) & set(b2)) / (n1 * n2)


def _softmax(xs):
    import math

    m = max(xs)
    es = [math.exp(x - m) for x in xs]
    s = sum(es)
    return [e / s for e in es]


def summarize(
    sent_words: DataFrame,
    id_col: str = "doc_id",
    sent_col: str = "sentence",
    words_col: str = "words",
    top_k: int = 2,
    maxlen: int | None = None,
    avoid_repeat: bool = False,
) -> DataFrame:
    """Extractive summary per document (summary.py:11-79): complete
    sentence-similarity graph (word-overlap/log-length), pagerank, top-K.
    ``avoid_repeat`` adds the reference's MMR re-ranking:
    0.6*softmax(importance) − 0.4*cosine-redundancy vs the summary so far.
    -> (doc_id, sentence, importance)."""
    budget = float("inf") if maxlen is None else maxlen

    def per_doc(pdf: pd.DataFrame) -> pd.DataFrame:
        doc_id = pdf[id_col].iloc[0]
        pdf = pdf[pdf[words_col].map(len) > 0].reset_index(drop=True)
        n = len(pdf)
        if n == 0:
            return pd.DataFrame({"doc_id": [], "sentence": [], "importance": []})
        sents = list(pdf[sent_col])
        toks = list(pdf[words_col])
        if n == 1:
            return pd.DataFrame(
                {"doc_id": [doc_id], "sentence": [sents[0]], "importance": [1.0]}
            )
        adj: dict = {i: {} for i in range(n)}
        for u, v in combinations(range(n), 2):
            w = _sent_sim_textrank(toks[u], toks[v])
            adj[u][v] = w
            adj[v][u] = w
        pr = pagerank_dict(adj)
        ranked = sorted(pr.items(), key=lambda kv: -kv[1])

        chosen: list[tuple[int, float]] = []
        if not avoid_repeat:
            curr = 0
            for i, imp in ranked[:top_k]:
                curr += len(sents[i])
                if curr > budget:
                    break
                chosen.append((i, imp))
        else:
            cands = list(range(n))
            i, imp = ranked[0]
            curr = len(sents[i])
            if curr <= budget:
                chosen.append((i, imp))
                summary_words = list(toks[i])
                cands.remove(i)
                for _ in range(top_k - 1):
                    if not cands:
                        break
                    imps = [pr[j] for j in cands]
                    norm = _softmax(imps)
                    scores = [
                        0.6 * norm[k] - 0.4 * _sent_sim_cos(summary_words, toks[j])
                        for k, j in enumerate(cands)
                    ]
                    k_best = max(range(len(cands)), key=lambda k: scores[k])
                    j = cands[k_best]
                    curr += len(sents[j])
                    if curr > budget:
                        break
                    chosen.append((j, pr[j]))
                    summary_words.extend(toks[j])
                    del cands[k_best]
        return pd.DataFrame(
            {
                "doc_id": doc_id,
                "sentence": [sents[i] for i, _ in chosen],
                "importance": [imp for _, imp in chosen],
            }
        )

    return sent_words.groupBy(id_col).applyInPandas(
        per_doc, schema="doc_id long, sentence string, importance double"
    )


# --- distributed PageRank (corpus-scale graphs) -----------------------------

def pagerank_edges(
    edges: DataFrame, damping: float = 0.85, iters: int = 10, weighted: bool = True
) -> DataFrame:
    """Iterative PageRank over an undirected (u, v, weight) edge DataFrame —
    for corpus-level graphs too big for one machine.  Each iteration is one
    join + one aggregation; ranks are checkpoint-free (lineage stays short
    because we localCheckpoint every few iters)."""
    sym = edges.select("u", "v", "weight").unionByName(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"), "weight")
    )
    if not weighted:
        sym = sym.withColumn("weight", F.lit(1.0))
    out_w = sym.groupBy("u").agg(F.sum("weight").alias("w_out"))
    norm = sym.join(out_w, "u").select(
        "u", "v", (F.col("weight") / F.col("w_out")).alias("p")
    ).cache()
    nodes = sym.select(F.col("u").alias("node")).distinct().cache()
    n = nodes.count()
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    for i in range(iters):
        contribs = norm.join(
            ranks.withColumnRenamed("node", "u"), "u"
        ).groupBy(F.col("v").alias("node")).agg(
            F.sum(F.col("p") * F.col("rank")).alias("acc")
        )
        ranks = nodes.join(contribs, "node", "left").select(
            "node",
            (F.lit((1 - damping) / n) + F.lit(damping) * F.coalesce("acc", F.lit(0.0))).alias("rank"),
        )
        if (i + 1) % 4 == 0:
            ranks = ranks.localCheckpoint()
    return ranks
