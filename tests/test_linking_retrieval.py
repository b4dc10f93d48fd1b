"""Entity linking + inverted-index retrieval golden parity.

Fixture = the reference's football entity dict
(``tests/test_functionality.py:41-43``); expected counts/search results are
its committed golden ``tests/test_entity_search_expected``.
"""

import pytest
from pyspark.sql import functions as F

from harvesttext_spark.operators.linking import (
    EntityKB,
    decoref,
    link_entities,
    scrub_pii_regex,
    scrub_text,
)
from harvesttext_spark.operators.retrieval import (
    build_posting,
    entity_counts,
    search_entity,
)
from harvesttext_spark.operators.graph import cooccurrence_edges

TRIPLES = [
    ("武磊", "武磊", "球员"),
    ("武球王", "武磊", "球员"),
    ("郜林", "郜林", "球员"),
    ("郜飞机", "郜林", "球员"),
    ("前锋", "前锋", "位置"),
    ("上港", "上海上港", "球队"),
    ("恒大", "广州恒大", "球队"),
    ("单刀", "单刀球", "术语"),
]

DOCS = [
    (0, "武磊威武，中超第一射手！"),
    (1, "郜林看来不行，已经到上限了。"),
    (2, "武球王威武，中超最强前锋！"),
    (3, "武磊和郜林，谁是中国最好的前锋？"),
]


@pytest.fixture(scope="module")
def kb():
    return EntityKB.from_triples(TRIPLES)


@pytest.fixture(scope="module")
def linked(spark, kb):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    return link_entities(df, kb).cache()


@pytest.fixture(scope="module")
def posting(linked):
    return build_posting(linked).cache()


def test_longest_match_and_linking(kb):
    spans = kb.link("上港的武磊和恒大的郜林")
    assert [(s[2], s[3]) for s in spans] == [
        ("上海上港", "#球队#"),
        ("武磊", "#球员#"),
        ("广州恒大", "#球队#"),
        ("郜林", "#球员#"),
    ]


PARA = (
    "上港的武磊和恒大的郜林，谁是中国最好的前锋？那当然是武磊武球王了，"
    "他是射手榜第一，原来是弱点的单刀也有了进步"
)


def test_entity_linking_span_golden(kb):
    """Reference golden tests/test_entity_segmentation_expected — the full
    entity_linking span list over the fixture paragraph, position-exact."""
    spans = kb.link(PARA)
    assert [(l, r, e, t) for l, r, e, t in spans] == [
        (0, 2, "上海上港", "#球队#"),
        (3, 5, "武磊", "#球员#"),
        (6, 8, "广州恒大", "#球队#"),
        (9, 11, "郜林", "#球员#"),
        (19, 21, "前锋", "#位置#"),
        (26, 28, "武磊", "#球员#"),
        (28, 31, "武磊", "#球员#"),
        (47, 49, "单刀球", "#术语#"),
    ]


def test_sentence_split_golden():
    from harvesttext_spark.functions.sentences import cut_sentences_py

    assert cut_sentences_py(PARA) == [
        "上港的武磊和恒大的郜林，谁是中国最好的前锋？",
        "那当然是武磊武球王了，他是射手榜第一，原来是弱点的单刀也有了进步",
    ]


def test_entity_counts_golden(posting):
    got = {r["entity"]: r["n_docs"] for r in entity_counts(posting).collect()}
    assert got == {"武磊": 3, "郜林": 2, "前锋": 2}


def test_search_single_golden(spark, linked, posting):
    docs = [r["text"] for r in search_entity(linked, posting, "武磊").orderBy("doc_id").collect()]
    assert docs == [
        "武磊威武，中超第一射手！",
        "武球王威武，中超最强前锋！",
        "武磊和郜林，谁是中国最好的前锋？",
    ]


def test_search_conjunctive_golden(linked, posting):
    docs = [r["text"] for r in search_entity(linked, posting, "武磊 郜林").orderBy("doc_id").collect()]
    assert docs == ["武磊和郜林，谁是中国最好的前锋？"]


def test_search_type_mixed_golden(linked, posting):
    docs = [
        r["text"]
        for r in search_entity(linked, posting, "#球员# 前锋").orderBy("doc_id").collect()
    ]
    assert docs == ["武球王威武，中超最强前锋！", "武磊和郜林，谁是中国最好的前锋？"]


def test_entity_cooccurrence_edges(posting):
    ents = posting.filter(~F.col("key").rlike("^#.*#$"))
    edges = {
        (r["u"], r["v"]): r["weight"] for r in cooccurrence_edges(ents).collect()
    }
    assert edges[("前锋", "武磊")] == 2  # docs 2 and 3
    assert edges[("武磊", "郜林")] == 1  # doc 3


def test_link_all_candidates():
    kb = EntityKB.from_triples(
        [("经理", "张三", "人名"), ("经理", "李四", "人名")]
    )
    spans = kb.link_all_candidates("经理来了")
    assert len(spans) == 1
    l, r, cands = spans[0]
    assert (l, r) == (0, 2)
    assert {e for e, _ in cands} == {"张三", "李四"}


def test_entity_network_reference_golden(spark):
    """Reference test_entity_network values (edge weights over 2 docs),
    full graph and used_types=['球员'] restriction."""
    kb = EntityKB.from_triples(TRIPLES + [("颜骏凌", "颜骏凌", "球员")])
    docs = spark.createDataFrame(
        [(0, "武磊和颜骏凌是队友"), (1, "武磊和郜林都是国内顶尖前锋")],
        "doc_id long, text string",
    )
    linked = link_entities(docs, kb)
    posting = build_posting(linked, with_type=False)
    edges = {
        (r["u"], r["v"]): r["weight"]
        for r in cooccurrence_edges(posting).collect()
    }
    expect = {
        ("武磊", "颜骏凌"): 1,
        ("武磊", "郜林"): 1,
        ("前锋", "武磊"): 1,
        ("前锋", "郜林"): 1,
    }
    assert edges == expect

    players = spark.createDataFrame(
        [("武磊",), ("郜林",), ("颜骏凌",)], "key string"
    )
    edges2 = {
        (r["u"], r["v"]): r["weight"]
        for r in cooccurrence_edges(posting, keys=players).collect()
    }
    assert edges2 == {("武磊", "颜骏凌"): 1, ("武磊", "郜林"): 1}


def test_freq_strategy_overlap():
    """set_linking_strategy 'freq' overlap case (harvesttext.py:347):
    'xx市长江yy' + freq{xx市长:5, 长江yy:3} -> xx市长 wins."""
    kb = EntityKB.from_triples(
        [("市长", "xx市长", "职位"), ("长江", "长江yy", "河流")]
    )
    spans = kb.link("xx市长江yy", strategy="freq", entity_freq={"xx市长": 5, "长江yy": 3})
    assert [(s[2]) for s in spans] == ["xx市长"]
    spans2 = kb.link("xx市长江yy", strategy="freq", entity_freq={"xx市长": 2, "长江yy": 3})
    assert [(s[2]) for s in spans2] == ["长江yy"]


def test_type_punct_rejected():
    with pytest.raises(Exception, match="punctuation"):
        EntityKB.from_triples([("x", "x", "位,置")])


def test_decoref_scrub(kb):
    sent = "上港的武磊和恒大的郜林"
    assert decoref(sent, kb.link(sent)) == "#球队#的#球员#和#球队#的#球员#"


def test_scrub_text_operator(spark, kb):
    df = spark.createDataFrame([(1, "上港的武磊真棒")], "doc_id long, text string")
    got = scrub_text(df, kb).first()["text_scrubbed"]
    assert got == "#球队#的#球员#真棒"


def test_pii_regex_scrub(spark):
    df = spark.createDataFrame(
        [(1, "电话13812345678邮箱a@b.com身份证11010519491231002X完")],
        "doc_id long, text string",
    )
    got = df.select(scrub_pii_regex(F.col("text")).alias("s")).first()["s"]
    assert got == "电话<PHONE>邮箱<EMAIL>身份证<IDNUM>完"


def test_ac_scan_equals_trie_longest_match():
    """Property: scan_matches (one AC pass) == longest_match at every
    position, on random KBs over a tiny alphabet (dense overlaps)."""
    import random

    rng = random.Random(7)
    for _ in range(60):
        kb = EntityKB()
        for _ in range(rng.randint(1, 12)):
            m = "".join(rng.choice("abc") for _ in range(rng.randint(1, 4)))
            kb.add(m, m, "T")
        sent = "".join(rng.choice("abcd") for _ in range(rng.randint(0, 40)))
        got = kb.scan_matches(sent)
        want = {}
        for l in range(len(sent)):
            r, _ = kb.longest_match(sent, l)
            if r != -1:
                want[l] = r
        assert got == want, (sorted(kb.mention_entities), sent)


def test_ac_cache_invalidation_add_remove():
    kb = EntityKB()
    kb.add("ab", "ab", "T")
    assert kb.scan_matches("ab") == {0: 2}
    kb.add("abc", "abc", "T")
    assert kb.scan_matches("abc") == {0: 3}
    kb.remove_mention("abc")
    kb.add("bc", "bc", "T")  # same mention count as before removal
    assert kb.scan_matches("abc") == {0: 2, 1: 3}
