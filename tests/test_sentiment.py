"""SO-PMI golden parity — expected values are the reference's committed
golden file ``tests/test_sentiment_dict_expected`` (威武=1.0, 球员=0.0,
上限=-1.0; sentence score 0.6), with the jieba token lists pinned as fixtures
(jieba itself is not in this image; tokenization is a separate stage)."""

import pytest
from pyspark.sql import functions as F

from harvesttext_spark.operators.sentiment import analyse_sent, build_sent_dict

DOCS = [
    (0, ["武磊", "威武", "，", "中超", "第一", "射手", "！"]),
    (1, ["武磊", "强", "，", "中超", "最", "第一", "本土", "球员", "！"]),
    (2, ["郜林", "不行", "，", "只会", "抱怨", "的", "球员", "注定", "上限", "了"]),
    (3, ["郜林", "看来", "不行", "，", "已经", "到", "上限", "了"]),
]
SENT = [(9, ["武球王", "威武", "，", "中超", "最强", "球员", "！"])]


@pytest.fixture(scope="module")
def sent_dict(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, words array<string>")
    return build_sent_dict(
        docs, pos_seeds=["第一"], neg_seeds=["不行"], min_times=1
    ).cache()


def test_golden_values(sent_dict):
    vals = {r["word"]: r["senti"] for r in sent_dict.collect()}
    assert vals["威武"] == pytest.approx(1.0)
    assert vals["球员"] == pytest.approx(0.0)
    assert vals["上限"] == pytest.approx(-1.0)


def test_sentence_score(spark, sent_dict):
    sent = spark.createDataFrame(SENT, "doc_id long, words array<string>")
    got = analyse_sent(sent, sent_dict).first()["senti"]
    assert got == pytest.approx(0.6)


def test_analyse_sent_value_list(spark, sent_dict):
    sent = spark.createDataFrame(SENT, "doc_id long, words array<string>")
    vals = analyse_sent(sent, sent_dict, avg=False).first()["sentis"]
    assert vals == sorted(vals) and len(vals) == 5
    assert sum(vals) / len(vals) == pytest.approx(0.6)


def test_new_word_register_partial_golden(spark):
    """Reference test_new_word_register: registered words act as single
    tokens with their types in posseg (jieba-free partial parity: entity
    tokens exact, base segmentation divergence documented)."""
    from harvesttext_spark.functions.tokenize import seg_py
    from harvesttext_spark.operators.linking import EntityKB

    kb = EntityKB()
    kb.add_new_words(["落叶球", "666"])
    kb.add_new_entity("落叶球", mention0="落叶球", type0="术语")
    pairs = seg_py("这个落叶球踢得真是666", kb, with_pos=True)
    d = dict(pairs)
    assert d["落叶球"] == "术语"  # typed registration wins (last)
    assert "666" in d
    toks = [w for w, _ in pairs]
    assert "".join(toks) == "这个落叶球踢得真是666"


def test_no_match_doc_scores_zero(spark, sent_dict):
    sent = spark.createDataFrame(
        [(1, ["完全", "无关", "词语"])], "doc_id long, words array<string>"
    )
    assert analyse_sent(sent, sent_dict).first()["senti"] == 0.0


def test_missing_seeds_raise(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, words array<string>")
    with pytest.raises(Exception):
        build_sent_dict(docs, pos_seeds=["不存在的词"], neg_seeds=["也不存在"], min_times=1)


def test_scale_pm1(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, words array<string>")
    d = build_sent_dict(docs, ["第一"], ["不行"], min_times=1, scale="+-1")
    mx, mn = d.agg(F.max("senti"), F.min("senti")).first()
    assert mx <= 1.0 and mn >= -1.0


def test_toxicity_score_density(spark):
    """Toxic-term density: multiset counting (repeats count), case fold,
    NULL/empty -> NULL (no tokens is no evidence, not 0)."""
    from harvesttext_spark.operators.sentiment import toxicity_score

    rows = [
        (1, "bad words bad stuff fine text"),   # 3/6
        (2, "all clean here"),                  # 0.0
        (3, ""),                                # NULL
        (4, None),                              # NULL
        (5, "BAD Bad bad"),                     # 1.0 (case fold, multiset)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["toxicity"] for r in toxicity_score(df, ["bad", "stuff"]).collect()}
    assert got[1] == 0.5 and got[2] == 0.0 and got[5] == 1.0
    assert got[3] is None and got[4] is None
