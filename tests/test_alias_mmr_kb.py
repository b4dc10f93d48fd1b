"""Alias discovery, MMR summarization, KB mutation, fuzzy recheck, stubs."""

import pytest
from pyspark.sql import functions as F

from harvesttext_spark.operators.alias_discovery import (
    connected_components,
    discover_aliases,
)
from harvesttext_spark.operators.graph import summarize
from harvesttext_spark.operators.linking import EntityKB
from harvesttext_spark.operators import nlp_stubs


def test_connected_components(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("x", "y")], "u string, v string"
    )
    comps = {r["node"]: r["cluster_id"] for r in connected_components(edges).collect()}
    assert comps["a"] == comps["b"] == comps["c"]
    assert comps["x"] == comps["y"]
    assert comps["a"] != comps["x"]


def test_connected_components_both_paths_agree(spark):
    """The driver-side union-find shortcut (round 4, small pair graphs)
    must produce EXACTLY the distributed min-label propagation's output
    — cluster_id = min node per component — on a chain + cycle + star
    mix, including long chains (propagation diameter stress)."""
    chain = [(f"n{i:02d}", f"n{i + 1:02d}") for i in range(12)]
    extra = [("s", "t"), ("t", "u"), ("u", "s"), ("hub", "k1"),
             ("hub", "k2"), ("hub", "k3")]
    edges = spark.createDataFrame(chain + extra, "u string, v string")
    fast = {r["node"]: r["cluster_id"] for r in connected_components(edges).collect()}
    slow = {
        r["node"]: r["cluster_id"]
        for r in connected_components(edges, driver_threshold=0).collect()
    }
    assert fast == slow
    assert fast["n12"] == "n00" and fast["u"] == "s" and fast["k3"] == "hub"


def test_discover_aliases_clusters_variants(spark):
    mentions = spark.createDataFrame(
        [
            ("上海上港", 10),
            ("上港集团", 4),
            ("广州恒大", 8),
            ("恒大淘宝", 3),
            ("完全无关词", 5),
        ],
        "mention string, cnt long",
    )
    out = {r["mention"]: r["canonical"] for r in discover_aliases(mentions, threshold=0.3).collect()}
    assert out["上海上港"] == "上海上港"
    assert out["上港集团"] == "上海上港"  # shares 上港 bigram, similar vector
    assert out["恒大淘宝"] == "广州恒大"
    assert out["完全无关词"] == "完全无关词"


def test_summarize_mmr_penalizes_repeats(spark):
    rows = [
        (0, 0, "武磊进球武磊威武", ["武磊", "进球", "武磊", "威武"]),
        (0, 1, "武磊进球again威武", ["武磊", "进球", "again", "威武"]),
        (0, 2, "完全不同的话题内容", ["完全", "不同", "话题", "内容"]),
        (0, 3, "天气晴朗适合散步", ["天气", "晴朗", "适合", "散步"]),
    ]
    df = spark.createDataFrame(rows, "doc_id long, sent_id long, sentence string, words array<string>")
    plain = [r["sentence"] for r in summarize(df, top_k=2).collect()]
    mmr = [r["sentence"] for r in summarize(df, top_k=2, avoid_repeat=True).collect()]
    assert len(mmr) == 2
    # MMR must not pick both near-duplicate 武磊 sentences
    assert not (mmr[0].startswith("武磊") and mmr[1].startswith("武磊"))
    assert len(plain) == 2


def test_summarize_maxlen(spark):
    rows = [
        (0, 0, "短句一。", ["短", "句", "一"]),
        (0, 1, "短句二。", ["短", "句", "二"]),
    ]
    df = spark.createDataFrame(rows, "doc_id long, sent_id long, sentence string, words array<string>")
    out = summarize(df, top_k=2, maxlen=5).collect()
    assert len(out) == 1  # second sentence would exceed the budget


def test_kb_remove_mention_entity():
    kb = EntityKB.from_triples(
        [("武磊", "武磊", "球员"), ("武球王", "武磊", "球员"), ("郜林", "郜林", "球员")]
    )
    kb.remove_mention("武球王")
    assert kb.link("武球王威武") == []
    assert kb.link("武磊威武")[0][2] == "武磊"
    kb.remove_entity("武磊")
    assert kb.link("武磊威武") == []
    assert kb.mention2entity("郜林") == ("郜林", "球员")
    assert kb.mention2entity("不存在") == (None, None)


def test_link_with_recheck():
    kb = EntityKB.from_triples([("武磊", "武磊", "球员"), ("郜林", "郜林", "球员")])
    spans = kb.link_with_recheck("吴磊和郜林都是前锋", char_tolerance=1)
    assert ("武磊" in [s[2] for s in spans]) and ("郜林" in [s[2] for s in spans])
    # exact path unchanged
    assert [s[2] for s in kb.link("吴磊和郜林都是前锋")] == ["郜林"]


def test_stubs_raise():
    for fn in (
        nlp_stubs.named_entity_recognition,
        nlp_stubs.dependency_parse,
        nlp_stubs.triple_extraction,
    ):
        with pytest.raises(NotImplementedError):
            fn("任何输入")
