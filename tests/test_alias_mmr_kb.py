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


def _union_find(pairs):
    parent = {}

    def find(x):
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:
            parent[x], x = r, parent[x]
        return r

    for u, v in pairs:
        parent.setdefault(u, u)
        parent.setdefault(v, v)
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    return {n: find(n) for n in parent}


def test_connected_components_star_random_equivalence(spark):
    """VERDICT r6 #4: the distributed large-star/small-star leg vs a
    pure-python union-find on a seeded random graph (multiple
    components, dup edges, reversed edges, self-loops)."""
    import random

    rng = random.Random(20260817)
    pairs = []
    for base in (0, 500, 900):  # three blocks, some bridged below
        for _ in range(400):
            u = base + rng.randrange(300)
            v = base + rng.randrange(300)
            pairs.append((u, v))  # self-loops included on purpose
    pairs += [(299, 500), (799, 900)]  # bridges
    expected = _union_find([(u, v) for u, v in pairs if u != v])
    # self-loop-only nodes must still label themselves
    pairs.append((99999, 99999))
    expected[99999] = 99999
    edges = spark.createDataFrame(pairs, "u long, v long")
    got = {
        r["node"]: r["cluster_id"]
        for r in connected_components(edges, driver_threshold=0).collect()
    }
    assert got == expected


def test_connected_components_long_chain_distributed(spark):
    """A 1500-link chain (diameter 1500): the retired min-label
    propagation needed diameter rounds and blew max_iter=50; star
    contraction must converge inside the default budget (O(log^2 n))
    and label every node with the chain head."""
    n = 1500
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "u long, v long"
    )
    got = connected_components(edges, driver_threshold=0)
    assert got.filter(F.col("cluster_id") != 0).count() == 0
    assert got.count() == n + 1


def test_connected_components_hot_key_star(spark):
    """Hot-key stress for the distributed leg: a 20k-member star (one
    hub node on every edge — the exact skew shape the capped LSH band
    join emits for an oversized near-dup family) plus a disjoint
    control pair.  groupBy-min is partial-aggregatable and the m-join
    key is splittable, so this must converge and label the family with
    its min id."""
    n = 20_000
    rows = [(5, i) for i in range(6, 6 + n)]  # hub=5, members above
    rows.append((1, 2))
    edges = spark.createDataFrame(rows, "u long, v long")
    got = connected_components(edges, driver_threshold=0)
    assert got.count() == n + 3
    assert got.filter((F.col("node") >= 5) & (F.col("cluster_id") != 5)).count() == 0
    assert {r["cluster_id"] for r in got.filter("node <= 2").collect()} == {1}


def test_connected_components_networkx_cross_check(spark):
    """Third-party cross-validation (round 8): networkx landed in the
    image (its pagerank still needs the absent scipy, but
    nx.connected_components is pure Python).  Both engine paths must
    reproduce nx's partition AND the min-node-per-component label on a
    seeded random multi-component graph."""
    nx = pytest.importorskip("networkx")
    import random

    rng = random.Random(20260818)
    pairs = [(rng.randrange(400), rng.randrange(400)) for _ in range(350)]
    pairs += [(1000, 1001), (1001, 1002), (2000, 2000)]
    G = nx.Graph()
    G.add_edges_from(pairs)
    expected = {}
    for comp in nx.connected_components(G):
        label = min(comp)
        for node in comp:
            expected[node] = label
    edges = spark.createDataFrame(pairs, "u long, v long")
    for threshold in (10**9, 0):  # driver union-find leg, distributed leg
        got = {
            r["node"]: r["cluster_id"]
            for r in connected_components(edges, driver_threshold=threshold).collect()
        }
        assert got == expected


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
