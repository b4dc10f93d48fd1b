"""Rule-based NER + SVO recasts (operators/parsing.py)."""

import pytest

from harvesttext_spark.operators.linking import EntityKB
from harvesttext_spark.operators.parsing import (
    discover_named_entities,
    extract_svo,
    extract_svo_documents,
    named_entity_recognition,
    ner_documents,
)


@pytest.fixture(scope="module")
def kb():
    kb = EntityKB()
    kb.add("武磊", "武磊", "球员")
    kb.add("上港", "上海上港", "球队")
    return kb


def test_ner_kb_and_tag_mapping(kb):
    got = named_entity_recognition("中国的武磊在上港踢球，他去过北京", kb)
    assert got["武磊"] == "球员"      # KB type wins
    assert got["上港"] == "球队"
    assert got["中国"] == "地名"      # ns tag -> 地名 (reference mapping)
    assert got["北京"] == "地名"


def test_ner_sanguo_kb():
    from harvesttext_spark.functions.resources import get_sanguo_entity_dict

    mention, etype = get_sanguo_entity_dict()
    kb2 = EntityKB()
    for m in mention["刘备"]:
        kb2.add(m, "刘备", etype["刘备"])
    got = named_entity_recognition("却说玄德引兵到了新野", kb2, standard_name=True)
    assert got.get("刘备") == "人名"


def test_svo_patterns(kb):
    assert extract_svo("武磊是中国最好的前锋", kb) == [["武磊", "是", "中国最好的前锋"]]
    assert extract_svo("公司发布了新的产品") == [["公司", "发布", "新的产品"]]
    assert extract_svo("他们讨论城市交通拥堵问题") == [["他们", "讨论", "城市交通"]]
    assert extract_svo("武磊打进一球", kb) == [["武磊", "打进", "一球"]]
    # no subject or no object -> no triple
    assert extract_svo("讨论一下") == []


def test_spark_operators(spark, kb):
    docs = spark.createDataFrame(
        [(0, "武磊是中国最好的前锋"), (1, "公司发布了新的产品"), (2, None)],
        "doc_id long, text string",
    )
    svo = extract_svo_documents(docs, kb).collect()
    assert ("武磊", "是", "中国最好的前锋") in {(r.subj, r.verb, r.obj) for r in svo}
    ner = ner_documents(docs, kb).collect()
    assert {"武磊", "中国"} <= {r.entity for r in ner}
    disco = discover_named_entities(
        docs.unionByName(docs), kb, min_count=2
    ).collect()
    assert any(r.entity == "武磊" and r.cnt >= 2 for r in disco)
