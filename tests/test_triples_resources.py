"""Triple template queries (naiveKGQA surface), resources, en sentences."""

from harvesttext_spark.functions.resources import get_senti_seeds, get_zh_stopwords
from harvesttext_spark.functions.sentences import cut_sentences_py
from harvesttext_spark.operators.triples import answer_question, triple_query

SVOS = [
    ("武磊", "所属", "上港"),
    ("武磊", "位置", "前锋"),
    ("郜林", "所属", "恒大"),
    ("郜林", "位置", "前锋"),
]


def test_triple_query_shapes(spark):
    t = spark.createDataFrame(SVOS, "subject string, predicate string, object string")
    # (s, p, ?) -> object
    assert [r["object"] for r in triple_query(t, s="武磊", p="所属").collect()] == ["上港"]
    # (?, p, o) -> subjects
    subs = {r["subject"] for r in triple_query(t, p="位置", o="前锋").collect()}
    assert subs == {"武磊", "郜林"}
    # all unbound -> full scan projection
    assert triple_query(t).count() == 4


def test_answer_formatting(spark):
    t = spark.createDataFrame(SVOS, "subject string, predicate string, object string")
    assert answer_question(t, s="武磊", p="所属") == "上港"
    assert answer_question(t, s="不存在", p="所属") == "你好"
    multi = answer_question(t, p="位置", o="前锋")
    assert set(multi.split("、")) == {"武磊", "郜林"}


def test_resources_load():
    sw = get_zh_stopwords()
    assert "一些" in sw and len(sw) >= 100
    seeds = get_senti_seeds()
    assert len(seeds["pos"]) >= 50 and len(seeds["neg"]) >= 50


def test_en_sentence_split():
    sents = cut_sentences_py(
        "Hello world. This is fine! Is it? Yes.", language="en"
    )
    assert sents == ["Hello world.", "This is fine!", "Is it?", "Yes."]


def test_full_resource_lexicons_reference_golden():
    """Port of the reference test_load_resources golden
    (/root/reference/tests/test_functionality.py:147-162): deterministic
    JSON list slices must match byte-for-byte; set-ordered prints are
    checked by membership instead."""
    from harvesttext_spark.functions.resources import (
        get_baidu_stopwords,
        get_qh_sent_dict,
        get_qh_typed_words,
        get_sanguo,
        get_sanguo_entity_dict,
        get_english_senti_lexicon,
        get_pinyin_adjlist,
    )

    sdict = get_qh_sent_dict()
    assert list(sdict["pos"])[10:15] == ["宰相肚里好撑船", "查实", "忠实", "名手", "聪明"]
    assert list(sdict["neg"])[5:10] == ["散漫", "谗言", "迂执", "肠肥脑满", "出卖"]
    assert len(sdict["pos"]) == 5567 and len(sdict["neg"]) == 4470

    stopwords = get_baidu_stopwords()
    assert {"哎呀", "而况", "me", "哇", "某个"} <= stopwords
    assert len(stopwords) == 1412

    docs = get_sanguo()
    assert docs[-1][-16:] == "鼎足三分已成梦，后人凭吊空牢骚。"
    mention, etype = get_sanguo_entity_dict()
    assert mention["刘备"] == ["刘备", "刘玄德", "玄德", "使君"]
    assert etype["刘备"] == "人名"
    assert etype["蜀"] == "势力"
    assert etype["益州"] == "州名"

    typed = get_qh_typed_words()
    assert set(typed) == {"IT", "动物", "医药", "历史人名", "地名", "成语", "法律", "财经", "食物"}
    assert "字符串" in typed["IT"]

    lh = get_english_senti_lexicon()
    assert "good" in lh["pos"] and "bad" in lh["neg"]

    adj = get_pinyin_adjlist()
    assert "zhui" in adj["zui"]

    # engine analog of get_nltk_en_stopwords (reference resources.py:47-56):
    # same shape (set of lowercase strings, nltk-style split contractions),
    # canonical 179-entry english list, committed — no download at call time
    from harvesttext_spark.functions.resources import get_en_stopwords

    en = get_en_stopwords()
    assert isinstance(en, set) and len(en) == 179
    assert {"the", "and", "don't", "should've", "won", "ourselves", "y"} <= en
    assert all(w == w.lower() for w in en)
    # usable where the reference README uses the nltk set: keyword filtering
    assert "machine" not in en and "learning" not in en


def test_default_sent_dict_uses_full_qh_lexicon(spark):
    """build_sent_dict with no seeds must use the FULL 清华 lexicon
    (reference default), not the subset fixture."""
    from harvesttext_spark.operators.sentiment import build_sent_dict
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(0, ["名手", "发挥", "出色"]), (1, ["散漫", "表现", "堪忧"])],
        "doc_id long, words array<string>",
    )
    sd = {r["word"]: r["senti"] for r in build_sent_dict(docs, min_times=1).collect()}
    # 名手 is pos-seed only in the FULL lexicon (not in the subset fixture)
    assert sd["发挥"] > 0
    assert sd["表现"] < 0
