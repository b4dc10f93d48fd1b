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


def test_word_ego_edges(spark):
    docs = spark.createDataFrame(
        [(i, w) for _, i, _, w in SENTS], "doc_id long, words array<string>"
    )
    edges = word_cooccurrence_edges(docs, center="武磊")
    e = {(r["u"], r["v"]): r["weight"] for r in edges.collect()}
    # docs 0,2,3 contain 武磊; 威武 co-occurs in 0 and 2
    assert e[("威武", "武磊")] == 2
    assert e[("前锋", "武磊")] == 2
