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
