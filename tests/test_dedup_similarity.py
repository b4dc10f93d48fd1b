"""Dedup + similarity operators over the driver test tables."""

import pytest
from pyspark.sql import functions as F

from harvesttext_spark.operators.dedup import (
    drop_exact_dups,
    exact_dup_groups,
    jaccard_dup_pairs,
    minhash_dup_pairs,
    minhash_signature,
    simhash32_portable,
    simhash_dup_pairs,
    token_shingles,
)
from harvesttext_spark.operators.similarity import (
    brute_force_topk,
    lsh_topk,
)

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick brown fox jumps over the lazy dog"),  # exact dup of 0
    (2, "the quick brown fox jumps over a lazy dog"),  # near dup
    (3, "completely different content about spark engines"),
    (4, "the quick brown fox jumps over the lazy dog today"),  # near dup
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string").cache()


def test_exact_dedup(docs):
    groups = exact_dup_groups(docs).collect()
    assert len(groups) == 1
    assert groups[0]["n_dups"] == 2 and groups[0]["keep_id"] == 0
    kept = drop_exact_dups(docs)
    assert kept.count() == 4
    assert kept.filter("doc_id = 1").count() == 0


def test_shingles(spark):
    df = spark.createDataFrame([("a b c d",)], "text string")
    got = df.select(token_shingles(F.col("text"), 3).alias("s")).first()["s"]
    assert sorted(got) == ["a b c", "b c d"]
    # shorter than n -> single whole-text shingle
    df2 = spark.createDataFrame([("a b",)], "text string")
    assert df2.select(token_shingles(F.col("text"), 3).alias("s")).first()["s"] == ["a b"]


def test_minhash_identical_docs_full_match(docs):
    sigs = docs.select(
        "doc_id", minhash_signature(token_shingles(F.col("text"), 3), 16).alias("sig")
    ).collect()
    by_id = {r["doc_id"]: r["sig"] for r in sigs}
    assert by_id[0] == by_id[1]
    assert by_id[0] != by_id[3]


def test_minhash_lsh_pairs(docs):
    pairs = {
        (r["id_a"], r["id_b"]): r["est_jaccard"]
        for r in minhash_dup_pairs(docs, min_jaccard=0.3).collect()
    }
    assert pairs[(0, 1)] == 1.0  # identical
    assert (0, 3) not in pairs  # unrelated must not pair
    assert (1, 3) not in pairs


def test_jaccard_pairs_exact(docs):
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in jaccard_dup_pairs(docs, min_jaccard=0.1).collect()
    }
    assert pairs[(0, 1)] == 1.0
    # doc 2 differs in 1 token of 9: shingle overlap well below 1
    assert 0.1 < pairs[(0, 2)] < 1.0
    assert (0, 3) not in pairs


def test_drop_near_dups_transitive(spark, docs):
    """A-B and B-C pairs must collapse into ONE cluster keeping only A."""
    from harvesttext_spark.operators.dedup import drop_near_dups

    pairs = spark.createDataFrame(
        [(0, 1, 0.9), (1, 4, 0.8)], "id_a long, id_b long, est_jaccard double"
    )
    kept = sorted(r["doc_id"] for r in drop_near_dups(docs, pairs).collect())
    assert kept == [0, 2, 3]


def test_simhash_portable(docs):
    vals = {
        r["doc_id"]: r["sh"]
        for r in docs.select(
            "doc_id", simhash32_portable(F.col("text")).alias("sh")
        ).collect()
    }
    assert vals[0] == vals[1]
    assert 0 <= vals[0] < 2**32
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in simhash_dup_pairs(docs, max_hamming=8).collect()
    }
    assert pairs[(0, 1)] == 0


def test_brute_force_topk(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = emb.limit(2).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = brute_force_topk(emb, queries, k=3)
    rows = out.collect()
    assert len(rows) == 6
    # self is always the nearest neighbor at rank 1, cos ~ 1
    for r in rows:
        if r["rank"] == 1:
            assert r["vec_id"] == r["query_id"]
            assert r["cos_sim"] == pytest.approx(1.0, abs=1e-5)


def test_lsh_topk_recall(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").cache()
    queries = emb.limit(3).select(F.col("vec_id").alias("query_id"), "embedding")
    exact = brute_force_topk(emb, queries, k=1).filter("rank = 1").collect()
    approx = lsh_topk(emb, queries, dim=64, k=1, n_planes=6).filter("rank = 1").collect()
    exact_top = {(r["query_id"], r["vec_id"]) for r in exact}
    approx_top = {(r["query_id"], r["vec_id"]) for r in approx}
    # rank-1 is the query itself (same bucket by construction) — must survive
    assert exact_top == approx_top
