"""Word-discovery golden parity: the reference's committed golden
``tests/test_new_word_discover_expected`` is ``['武磊']`` for the fixture
paragraph (auto params).  Stats verified against the formulas of
``algorithms/word_discoverer.py:29-83,220`` computed by hand."""

import math

import pytest
from pyspark.sql import functions as F

from harvesttext_spark.operators.word_discovery import (
    auto_params,
    ngram_stats,
    word_discover,
)

PARA = (
    "上港的武磊和恒大的郜林，谁是中国最好的前锋？那当然是武磊武球王了，"
    "他是射手榜第一，原来是弱点的单刀也有了进步"
)


@pytest.fixture(scope="module")
def para_df(spark):
    return spark.createDataFrame([(0, PARA)], "doc_id long, text string")


def test_golden_new_words(para_df):
    out = word_discover(para_df, auto=True, unit="char")
    assert [r["word"] for r in out.collect()] == ["武磊"]


def test_wulei_stats_exact(para_df):
    stats, corpus_len = ngram_stats(para_df, unit="char")
    assert corpus_len == 54  # 56 chars - 2 puncts runs collapsed... normalized length
    row = stats.filter(F.col("word") == "武磊").first()
    assert row["cnt"] == 2
    assert row["freq"] == pytest.approx(2 / 54)
    # left neighbors {的, 是}, right neighbors {和, 武} -> ln 2 each
    assert row["left_ent"] == pytest.approx(math.log(2))
    assert row["right_ent"] == pytest.approx(math.log(2))
    # min split: freq(武磊)/(freq(武)*freq(磊)) = 2*54/(3*2)
    assert row["agg"] == pytest.approx(18.0)
    assert row["score"] == pytest.approx(
        math.log10(18.0) * (2 / 54) * (2 * math.log(2))
    )


def test_auto_params():
    p = auto_params(54)
    assert p.min_entropy == pytest.approx(math.log(54) / 10)
    assert p.min_freq == pytest.approx(0.00005)
    assert p.min_aggregation == pytest.approx(math.sqrt(54) / 15)


def test_token_mode_stats(spark):
    docs = spark.createDataFrame(
        [(0, "a b c a b"), (1, "a b d")], "doc_id long, text string"
    )
    # token mode: latin survives because normalization only affects char mode
    stats, corpus_len = ngram_stats(docs, unit="token", max_word_len=2)
    rows = {r["word"]: r for r in stats.collect()}
    # corpus = a b c a b | a b d  -> 8 tokens + 1 separator
    assert corpus_len == 9
    assert rows["a b"]["cnt"] == 3
    assert rows["a"]["cnt"] == 3
    # bigram 'a b' aggregation = cnt * L / (cnt_a * cnt_b) = 3*9/(3*3)
    assert rows["a b"]["agg"] == pytest.approx(3.0)


def test_exclusions(para_df):
    out = word_discover(para_df, auto=True, unit="char", exclude_words=["武磊"])
    assert out.count() == 0


def test_excluding_types(para_df):
    from harvesttext_spark.operators.linking import EntityKB
    from harvesttext_spark.operators.word_discovery import mentions_of_types

    kb = EntityKB.from_triples(
        [("武磊", "武磊", "球员"), ("武球王", "武磊", "球员"), ("上港", "上海上港", "球队")]
    )
    ex = mentions_of_types(kb, ["球员"])
    assert sorted(ex) == ["武球王", "武磊"]
    out = word_discover(para_df, auto=True, unit="char", exclude_words=ex)
    assert out.count() == 0  # 武磊 excluded via its registered type


def test_corpus_info_averages(spark):
    """reference word_discoverer.py:117-130 averages surface (2.5.13)."""
    from harvesttext_spark.operators.word_discovery import corpus_info, word_discover

    para = (
        "上港的武磊和恒大的郜林，谁是中国最好的前锋？"
        "那当然是武磊武球王了，他是射手榜第一，原来是弱点的单刀也有了进步"
    )
    docs = spark.createDataFrame([(0, para)], "doc_id long, text string")
    found = word_discover(docs).cache()
    info = corpus_info(found).first()
    words = {r["word"]: r for r in found.collect()}
    assert "武磊" in words
    n = len(words)
    assert info["word_count"] == n
    assert abs(info["avg_freq"] - sum(r["freq"] for r in words.values()) / n) < 1e-9
    assert abs(info["avg_len"] - sum(len(w) for w in words) / n) < 1e-9
    # empty input -> zeros, not NULL/NaN
    empty = corpus_info(found.filter("freq < 0")).first()
    assert empty["word_count"] == 0 and empty["avg_freq"] == 0.0
