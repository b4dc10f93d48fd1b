"""TextRank / TF-IDF / summarization parity.

Summary golden = the reference's committed
``tests/test_text_summarization_expected`` (top-2 over the 4-doc football
corpus); token lists pinned (jieba + standard_name=True semantics)."""

import pytest

from harvesttext_spark.operators.graph import (
    summarize,
    textrank_keywords,
    tfidf_keywords,
    word_cooccurrence_edges,
)

SENTS = [
    (0, 0, "武磊威武，中超第一射手！", ["武磊", "威武", "，", "中超", "第一", "射手", "！"]),
    (0, 1, "郜林看来不行，已经到上限了。", ["郜林", "看来", "不行", "，", "已经", "到", "上限", "了", "。"]),
    (0, 2, "武球王威武，中超最强前锋！", ["武磊", "威武", "，", "中超", "最强", "前锋", "！"]),
    (0, 3, "武磊和郜林，谁是中国最好的前锋？", ["武磊", "和", "郜林", "，", "谁", "是", "中国", "最好", "的", "前锋", "？"]),
]
SCHEMA = "doc_id long, sent_id long, sentence string, words array<string>"


def test_summary_golden(spark):
    df = spark.createDataFrame(SENTS, SCHEMA)
    got = [
        r["sentence"]
        for r in summarize(df, top_k=2).orderBy("importance", ascending=False).collect()
    ]
    assert got == ["武球王威武，中超最强前锋！", "武磊威武，中超第一射手！"]


def test_textrank_keywords(spark):
    df = spark.createDataFrame(SENTS, SCHEMA)
    out = textrank_keywords(df, top_k=3).collect()
    assert len(out) == 3
    words = [r["word"] for r in out]
    assert "，" in words  # highest-degree node in the window graph
    assert all(r["score"] > 0 for r in out)


def test_tfidf_keywords(spark):
    docs = spark.createDataFrame(
        [(i, w) for _, i, _, w in SENTS], "doc_id long, words array<string>"
    )
    out = tfidf_keywords(docs, top_k=2)
    rows = out.collect()
    assert {r["doc_id"] for r in rows} == {0, 1, 2, 3}
    assert all(r["rank"] <= 2 for r in rows)
    # doc 1 shares no content words except punct: its top terms are unique to it
    d1 = {r["word"] for r in rows if r["doc_id"] == 1}
    assert d1 <= {"郜林", "看来", "不行", "已经", "到", "上限", "了", "。"}


def test_extract_keywords_dispatch(spark):
    from harvesttext_spark.operators.graph import extract_keywords

    docs = spark.createDataFrame(
        [(i, w) for _, i, _, w in SENTS], "doc_id long, words array<string>"
    )
    tf = extract_keywords(docs, method="tfidf", top_k=2)
    tr = extract_keywords(docs, method="textrank", top_k=2, stopwords=["，", "！", "？", "。"])
    assert set(tf.columns) == set(tr.columns) == {"doc_id", "word", "score"}
    assert tf.count() == 8
    assert tr.filter("word in ('，','！','？','。')").count() == 0
    import pytest as _pytest

    with _pytest.raises(ValueError):
        extract_keywords(docs, method="nope")


def _reference_tfidf_stopword_rule(docs, stopwords, top_k):
    """Pure-python mirror of the reference's jieba_tfidf stopword rule
    (word_discover.py:279-283): score ALL words (tf * ln(N/df), the
    engine's relational analog of jieba's packaged IDF), fetch the top
    2*top_k per doc, drop stopwords POST-HOC, truncate to top_k."""
    import math
    from collections import Counter

    n = len(docs)
    df = Counter()
    for _, words in docs:
        df.update(set(words))
    out = {}
    for doc_id, words in docs:
        tf = Counter(words)
        scored = sorted(
            ((w, c * math.log(n / df[w])) for w, c in tf.items()),
            key=lambda kv: (-kv[1], kv[0]),
        )
        fetched = scored[: 2 * top_k]
        out[doc_id] = [(w, s) for w, s in fetched if w not in stopwords][:top_k]
    return out


def test_extract_keywords_stopword_boundary_golden(spark):
    """VERDICT r6 #5: stopwords ranking INSIDE the top-K boundary.  The
    engine's post-hoc drop must reproduce the reference's over-fetch ->
    drop -> truncate ordering, including the case where stopwords crowd
    the 2*top_k window so the reference returns FEWER than top_k
    keywords (a pre-drop anti-join would wrongly backfill from below)."""
    from harvesttext_spark.operators.graph import extract_keywords

    stop = {"的", "了", "是"}
    corpus = [
        # doc 0: stopword 的 is rank-1 by tfidf (unique to this doc, tf 10)
        (0, ["的"] * 10 + ["苹果"] * 3 + ["香蕉"] * 2 + ["梨"]),
        # doc 1: three high-scoring stopwords occupy 3 of the top-4 slots
        # (top_k=2 -> 2K=4): reference keeps only ONE keyword even though
        # more non-stopwords exist below the over-fetch boundary
        (1, ["的"] * 9 + ["了"] * 8 + ["是"] * 7 + ["火箭"] * 2 + ["登月"] + ["梨"]),
        # doc 2: no stopwords at all — plain top-k
        (2, ["电池"] * 3 + ["续航"] * 2 + ["快充"]),
        # doc 3: shares 梨 with docs 0-1 so its df>1 branch is exercised
        (3, ["梨"] * 4 + ["苹果"]),
    ]
    expected = _reference_tfidf_stopword_rule(corpus, stop, top_k=2)
    docs = spark.createDataFrame(corpus, "doc_id long, words array<string>")
    got = {}
    rows = extract_keywords(docs, method="tfidf", top_k=2, stopwords=sorted(stop)).collect()
    for r in sorted(rows, key=lambda r: (r["doc_id"], -r["score"], r["word"])):
        got.setdefault(r["doc_id"], []).append((r["word"], r["score"]))
    assert set(got) | {1} == set(expected) | {1}
    for doc_id, exp in expected.items():
        g = got.get(doc_id, [])
        assert [w for w, _ in g] == [w for w, _ in exp], (doc_id, g, exp)
        for (gw, gs), (ew, es) in zip(g, exp):
            assert gs == pytest.approx(es), (doc_id, gw)
    # the crowded doc really did return fewer than top_k
    assert len(expected[1]) == 1 and len(got.get(1, [])) == 1
    # and doc 0's survivor list starts below the stopword that held rank 1
    # (香蕉 df=1 outranks 苹果 df=2 despite lower tf)
    assert expected[0][0][0] == "香蕉" and got[0][0][0] == "香蕉"


def test_extract_keywords_textrank_stopword_preserves_multiplicity(spark):
    """The textrank stopword pre-drop must preserve order AND
    multiplicity of surviving words (reference posseg list filter) —
    array_except would dedupe the sequence and corrupt window edges."""
    from harvesttext_spark.operators.graph import extract_keywords

    # a b a b a: weighted co-occurrence a-b = 4 within window 2; with a
    # dedupe to [a, b] it would be 1 and c/d ties would reorder scores
    docs = spark.createDataFrame(
        [(0, ["a", "s", "b", "a", "s", "b", "a", "c", "d"])],
        "doc_id long, words array<string>",
    )
    out = extract_keywords(
        docs, method="textrank", top_k=4, stopwords=["s"], window=2
    ).collect()
    words = [r["word"] for r in sorted(out, key=lambda r: -r["score"])]
    assert "s" not in words
    # a (3 occurrences, hub) must outrank c and d; b second
    assert words[0] == "a" and words[1] == "b"


def test_word_ego_edges(spark):
    docs = spark.createDataFrame(
        [(i, w) for _, i, _, w in SENTS], "doc_id long, words array<string>"
    )
    edges = word_cooccurrence_edges(docs, center="武磊")
    e = {(r["u"], r["v"]): r["weight"] for r in edges.collect()}
    # docs 0,2,3 contain 武磊; 威武 co-occurs in 0 and 2
    assert e[("威武", "武磊")] == 2
    assert e[("前锋", "武磊")] == 2
