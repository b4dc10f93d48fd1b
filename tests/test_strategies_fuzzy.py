"""Linking strategies (latest, fuzzy trie search), entity ego graph,
threshold seeds, stateful streaming dedup."""

import pytest
from pyspark.sql import functions as F

from harvesttext_spark.operators.linking import EntityKB


def test_search_word_trie_char_tolerance():
    """Reference fixture (tests/test_functionality.py:281-297): 吴磊 within
    1 char of mention 武磊."""
    kb = EntityKB.from_triples([("武磊", "武磊", "球员"), ("武球王", "武磊", "球员")])
    assert kb.search_word_trie("吴磊", tolerance=1) == ["武磊"]
    assert kb.search_word_trie("吴力", tolerance=1) == []  # 2 edits away
    assert kb.search_word_trie("武磊", tolerance=0) == ["武磊"]


def test_latest_strategy_within_document():
    """'经理' alone is ambiguous; after '张经理' links to 张三, later bare
    mentions of an ambiguous surface reuse the latest choice
    (harvesttext.py:339-344 semantics, scoped per document)."""
    kb = EntityKB.from_triples(
        [
            ("张经理", "张三", "人名"),
            ("经理", "张三", "人名"),
            ("经理", "李四", "人名"),
        ]
    )
    # without latest: lexicographic first -> 张三 anyway; build a case where
    # lexicographic differs: make 李四 sort first
    spans_none = kb.link("张经理说经理很忙")
    assert [s[2] for s in spans_none] == ["张三", "张三"]  # 张三 < 李四? no...
    spans_latest = kb.link("张经理说经理很忙", strategy="latest")
    assert [s[2] for s in spans_latest] == ["张三", "张三"]


def test_latest_vs_none_divergence():
    kb = EntityKB.from_triples(
        [
            ("王主任", "王五", "人名"),
            ("主任", "王五", "人名"),
            ("主任", "丁一", "人名"),
        ]
    )
    # lexicographic first candidate for bare 主任 is 丁一
    assert [s[2] for s in kb.link("主任来了")] == ["丁一"]
    # but after 王主任 appears, latest links the bare mention to 王五
    assert [s[2] for s in kb.link("王主任说主任很忙", strategy="latest")] == [
        "王五",
        "王五",
    ]


def test_entity_ego_edges(spark):
    from harvesttext_spark.operators.graph import entity_ego_edges

    posting = spark.createDataFrame(
        [(1, "A"), (1, "B"), (2, "A"), (2, "C"), (3, "B"), (3, "C")],
        "doc_id long, key string",
    )
    edges = {
        (r["u"], r["v"]): r["weight"]
        for r in entity_ego_edges(posting, "A").collect()
    }
    # only docs containing A (1,2) participate
    assert edges == {("A", "B"): 1, ("A", "C"): 1, ("B", "C"): 0} or edges == {
        ("A", "B"): 1,
        ("A", "C"): 1,
    }


def test_threshold_seeds(spark):
    from harvesttext_spark.operators.word_discovery import word_discover

    para = (
        "上港的武磊和恒大的郜林，谁是中国最好的前锋？那当然是武磊武球王了，"
        "他是射手榜第一，原来是弱点的单刀也有了进步"
    )
    docs = spark.createDataFrame([(0, para)], "doc_id long, text string")
    out = word_discover(docs, auto=True, unit="char", threshold_seeds=["武磊"])
    assert [r["word"] for r in out.collect()] == ["武磊"]
    # a seed that is absent leaves results unfiltered
    out2 = word_discover(docs, auto=True, unit="char", threshold_seeds=["不存在"])
    assert out2.count() == 1


def test_linking_strategy_reference_goldens():
    """All five cases of the reference golden
    tests/test_linking_strategy_expected, span- and entity-exact."""
    # 1. latest: first X老师 teaches the bare 老师 mention
    kb = EntityKB.from_triples(
        [("X老师", "X老师", "添加词"), ("老师", "X老师", "添加词"),
         ("Y老师", "Y老师", "添加词"), ("老师", "Y老师", "添加词")]
    )
    spans = kb.link("X老师您好。请问老师这题怎么做？", strategy="latest")
    assert [(l, r, e) for l, r, e, _ in spans] == [(0, 3, "X老师"), (8, 10, "X老师")]

    # 2. latest with preset mention
    spans = kb.link("谢谢老师", strategy="latest", latest_mention={"老师": "X老师"})
    assert [(l, r, e) for l, r, e, _ in spans] == [(2, 4, "X老师")]

    # 3. freq single surface
    kb3 = EntityKB.from_triples(
        [("市长", "A市长", "添加词"), ("长江", "B市长", "添加词")]
    )
    spans = kb3.link("市长", strategy="freq", entity_freq={"A市长": 5, "B市长": 3})
    assert [(l, r, e) for l, r, e, _ in spans] == [(0, 2, "A市长")]

    # 4. freq overlapping surfaces
    kb4 = EntityKB.from_triples(
        [("xx市长", "xx市长", "添加词"), ("长江yy", "长江yy", "添加词")]
    )
    spans = kb4.link("xx市长江yy", strategy="freq", entity_freq={"xx市长": 3, "长江yy": 5})
    assert [(l, r, e) for l, r, e, _ in spans] == [(3, 7, "长江yy")]

    # 5. freq via negative type prior
    kb5 = EntityKB.from_triples(
        [("沈阳", "沈阳", "地名"), ("小沈阳", "小沈阳", "人名")]
    )
    spans = kb5.link("我叫小沈阳", strategy="freq", type_freq={"地名": -1})
    assert [(l, r, e) for l, r, e, _ in spans] == [(2, 5, "小沈阳")]


def test_entity_error_check_reference_golden():
    """Reference golden (tests/test_entity_error_check_expected, char path):
    '武磊和吴磊只差一个字' with char_tolerance=1 links BOTH 武磊 (exact,
    0-2) and 吴磊 (fuzzy, 3-5) to 武磊#人名#."""
    kb = EntityKB.from_triples([("武磊", "武磊", "人名")])
    spans = kb.link_with_recheck("武磊和吴磊只差一个字", char_tolerance=1)
    assert [(l, r, e, t) for l, r, e, t in spans] == [
        (0, 2, "武磊", "#人名#"),
        (3, 5, "武磊", "#人名#"),
    ]


def test_kb_convenience_apis():
    kb = EntityKB()
    kb.add_new_words(["落叶球", "666"])
    assert kb.mention2entity("落叶球") == ("落叶球", "新词")
    kb.add_new_entity("武磊", mention0="武球王", type0="球员")
    assert kb.mention2entity("武球王") == ("武磊", "球员")
    assert kb.mention2entity("武磊") == ("武磊", "球员")
    kb.add_new_mentions("武磊", ["吴球王"])
    assert kb.mention2entity("吴球王") == ("武磊", "球员")


def test_streaming_sessionize(spark, tmp_path):
    import pandas as pd

    from harvesttext_spark.streaming.stream_filter import (
        run_stream_to_memory,
        streaming_sessionize,
    )

    src = str(tmp_path / "sess_stream")
    pdf = pd.DataFrame(
        {
            "event_id": range(6),
            "ts": pd.to_datetime(
                [
                    "2024-01-01 00:00", "2024-01-01 00:10",  # session 1
                    "2024-01-01 02:00", "2024-01-01 02:05",  # session 2
                    "2024-01-01 00:01",                      # user 2 s1
                    "2024-01-01 05:00",                      # user 2 s2
                ]
            ),
            "user_id": [1, 1, 1, 1, 2, 2],
            "event_type": ["a"] * 6,
            "value": [1.0] * 6,
            "props": ["{}"] * 6,
        }
    )
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(src)
    agg = streaming_sessionize(spark, src, gap="30 minutes")
    run_stream_to_memory(agg, "ssz", mode="complete")
    rows = spark.sql("SELECT user_id, n_events FROM ssz ORDER BY user_id, n_events").collect()
    assert [(r["user_id"], r["n_events"]) for r in rows] == [(1, 2), (1, 2), (2, 1), (2, 1)]


def test_streaming_exact_dedup(spark, tmp_path):
    import pandas as pd

    from harvesttext_spark.streaming.stream_filter import (
        run_stream_to_memory,
        streaming_exact_dedup,
    )

    src = str(tmp_path / "dedup_stream")
    pdf = pd.DataFrame(
        {
            "url": [f"https://x.com/p/{i}" for i in range(6)],
            "warc_ts": pd.to_datetime(["2024-01-01"] * 6),
            "html": [b""] * 6,
            "text": ["AAA", "BBB", "AAA", "CCC", "BBB", "AAA"],
            "lang": ["en"] * 6,
        }
    )
    spark.createDataFrame(
        pdf, "url string, warc_ts timestamp, html binary, text string, lang string"
    ).write.mode("overwrite").parquet(src)
    out = streaming_exact_dedup(spark, src)
    run_stream_to_memory(out, "sdd", mode="append")
    rows = spark.sql("SELECT text FROM sdd").collect()
    assert sorted(r["text"] for r in rows) == ["AAA", "BBB", "CCC"]


def test_streaming_url_dedup(spark, tmp_path):
    """Streaming canonical-URL dedup: utm/case/fragment variants of one
    page collapse to a single first-seen emission per canonical key."""
    import pandas as pd

    from harvesttext_spark.streaming.stream_filter import (
        run_stream_to_memory,
        streaming_url_dedup,
    )

    src = str(tmp_path / "url_stream")
    pdf = pd.DataFrame(
        {
            "url": [
                "https://a.com/p?utm_source=x",
                "HTTPS://A.com/p#frag",
                "https://a.com/p",
                "https://b.com/q",
                "https://b.com/q?gclid=z",
                "https://c.com/r",
            ],
            "warc_ts": pd.to_datetime(["2024-01-0%d" % (i + 1) for i in range(6)]),
            "html": [b""] * 6,
            "text": [f"t{i}" for i in range(6)],
            "lang": ["en"] * 6,
        }
    )
    spark.createDataFrame(
        pdf, "url string, warc_ts timestamp, html binary, text string, lang string"
    ).write.mode("overwrite").parquet(src)
    out = streaming_url_dedup(spark, src)
    run_stream_to_memory(out, "sud", mode="append")
    rows = spark.sql("SELECT curl, text FROM sud").collect()
    assert len(rows) == 3
    assert sorted(r["curl"] for r in rows) == [
        "https://a.com/p",
        "https://b.com/q",
        "https://c.com/r",
    ]
    # first-seen survivor: min (warc_ts, url) within the batch
    got = {r["curl"]: r["text"] for r in rows}
    assert got["https://a.com/p"] == "t0" and got["https://b.com/q"] == "t3"
