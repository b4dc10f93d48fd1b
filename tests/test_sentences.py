"""Sentence-cutting parity cases (reference rules harvesttext.py:694-727)."""

from pyspark.sql import functions as F

from harvesttext_spark.functions.sentences import (
    cut_sentences_py,
    explode_sentences,
)


def test_basic_zh_split():
    para = "今天天气好。我们出去玩！你来吗？好的。"
    assert cut_sentences_py(para) == ["今天天气好。", "我们出去玩！", "你来吗？", "好的。"]


def test_quote_handling():
    # terminator inside closing quote: the quote ends the sentence
    para = "他说：“今天下雨了。”我们就没出门。"
    assert cut_sentences_py(para) == ["他说：“今天下雨了。”", "我们就没出门。"]


def test_dedup_punct():
    para = "太棒了！！！真的吗？？？"
    assert cut_sentences_py(para, deduplicate=True) == ["太棒了！", "真的吗？"]


def test_ellipsis():
    para = "他想了想……然后走了。"
    assert cut_sentences_py(para) == ["他想了想……", "然后走了。"]


def test_empty_and_strip():
    assert cut_sentences_py("  \n  ") == []
    assert cut_sentences_py(None) == []


def test_explode_sentences(spark):
    df = spark.createDataFrame(
        [(1, "第一句。第二句！"), (2, "只有一句")], "doc_id long, text string"
    )
    out = explode_sentences(df).orderBy("doc_id", "sent_id").collect()
    assert [(r["doc_id"], r["sent_id"], r["sentence"]) for r in out] == [
        (1, 0, "第一句。"),
        (1, 1, "第二句！"),
        (2, 0, "只有一句"),
    ]


def test_en_abbreviations_do_not_split():
    got = cut_sentences_py(
        "Dr. Smith met Mr. Jones at 9 a.m. They discussed the plan. "
        "See Fig. 3 for details.",
        language="en",
    )
    assert got == [
        "Dr. Smith met Mr. Jones at 9 a.m. They discussed the plan.",
        "See Fig. 3 for details.",
    ] or got == [
        "Dr. Smith met Mr. Jones at 9 a.m.",
        "They discussed the plan.",
        "See Fig. 3 for details.",
    ]
    # plain case still splits
    assert cut_sentences_py("One sentence. Another one.", language="en") == [
        "One sentence.", "Another one.",
    ]
