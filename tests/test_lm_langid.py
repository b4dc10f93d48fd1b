"""Perplexity LM + trained language ID over synthetic pages."""

import pytest
from pyspark.sql import functions as F

from harvesttext_spark.operators.langid_model import predict_langid, train_langid
from harvesttext_spark.operators.lm_perplexity import (
    perplexity_signal,
    score_perplexity,
    train_bigram_lm,
)
from harvesttext_spark.pipeline.pages import synthesize_pages


@pytest.fixture(scope="module")
def lang_pages(spark):
    """Synthetic pages restricted to the latin-script languages (their text
    actually reflects the label; zh rows mix markup noise)."""
    pages = synthesize_pages(spark, n=1500, seed=42, partitions=8)
    return pages.filter(F.col("lang") != "zh").select(
        F.monotonically_increasing_id().alias("doc_id"), "text", "lang"
    ).cache()


def test_langid_model_accuracy(spark, lang_pages):
    weights, stats = train_langid(lang_pages)
    pred = predict_langid(lang_pages, weights, stats)
    joined = pred.join(lang_pages, "doc_id")
    acc = joined.filter(F.col("lang_pred") == F.col("lang")).count() / joined.count()
    assert acc >= 0.95, acc
    assert pred.filter(F.col("margin") < 0).count() == 0


def test_bigram_lm_counts(spark):
    docs = spark.createDataFrame(
        [(0, "a b a b c"), (1, "c a d")], "doc_id long, text string"
    )
    uni, big, total = train_bigram_lm(docs)
    u = {r["word"]: r["c1"] for r in uni.collect()}
    b = {(r["w1"], r["w2"]): r["c2"] for r in big.collect()}
    assert total == 8 and u["a"] == 3 and b[("a", "b")] == 2
    ppl = score_perplexity(docs, uni, big, total)
    rows = {r["doc_id"]: r for r in ppl.collect()}
    assert rows[0]["n_bigrams"] == 4
    # hand-computed stupid-backoff perplexities:
    # doc0: (3/2 * 2 * 3/2 * 2)^(1/4) = 9^(1/4); doc1: (2*3)^(1/2)
    assert rows[0]["ppl"] == pytest.approx(9 ** 0.25)
    assert rows[1]["ppl"] == pytest.approx(6 ** 0.5)
    assert rows[0]["ppl"] < rows[1]["ppl"]


def test_perplexity_flags_word_soup(spark):
    """Repeated natural sentences score lower ppl than shuffled word soup
    under a model trained on the natural corpus."""
    natural = [(i, "the quick brown fox jumps over the lazy dog") for i in range(20)]
    soup = [(100, "dog the over quick lazy fox jumps brown the")]
    docs = spark.createDataFrame(natural + soup, "doc_id long, text string")
    out = {r["doc_id"]: r["ppl"] for r in perplexity_signal(docs).collect()}
    natural_ppl = out[0]
    assert out[100] > natural_ppl * 5


def test_quality_filter_full_high_ppl(spark):
    from harvesttext_spark.pipeline.quality_filter import quality_filter_full
    from harvesttext_spark.pipeline.pages import synthesize_pages

    out = quality_filter_full(
        synthesize_pages(spark, n=500, seed=42), ppl_threshold=12.0
    )
    reasons = {r["drop_reason"] for r in out.select("drop_reason").distinct().collect()}
    assert "high_ppl" in reasons
    # heuristic drops unchanged: LM only ADDS drops
    assert out.filter("drop_reason = 'too_short'").count() > 0
    assert out.filter("keep AND ppl > 12.0").count() == 0


def test_trigram_lm_backoff_levels(spark):
    from harvesttext_spark.operators.lm_perplexity import (
        score_perplexity_trigram,
        train_trigram_lm,
    )
    import math

    docs = spark.createDataFrame(
        [(0, "a b c a b c"), (1, "a b d")], "doc_id long, text string"
    )
    uni, big, tri, total = train_trigram_lm(docs)
    t = {(r["w1"], r["w2"], r["w3"]): r["c3"] for r in tri.collect()}
    assert t[("a", "b", "c")] == 2 and t[("a", "b", "d")] == 1
    out = {r["doc_id"]: r for r in score_perplexity_trigram(docs, uni, big, tri, total).collect()}
    # doc 0 trigrams: abc(2/3 of ab ctx... c3=2, c2(ab)=3), bca(1/2), cab(1/1), abc(2/3)
    expected0 = math.exp(-(math.log(2 / 3) + math.log(1 / 2) + math.log(1) + math.log(2 / 3)) / 4)
    assert out[0]["ppl"] == pytest.approx(expected0)
    # doc 1: single trigram abd seen once: c3=1 / c2(ab)=3
    assert out[1]["ppl"] == pytest.approx(3.0)
    # trigram model separates the repetitive doc better than soup
    assert out[0]["ppl"] < out[1]["ppl"]


def test_trigram_backoff_unseen(spark):
    from harvesttext_spark.operators.lm_perplexity import (
        score_perplexity_trigram,
        train_trigram_lm,
    )

    train = spark.createDataFrame([(0, "a b c d e f")], "doc_id long, text string")
    uni, big, tri, total = train_trigram_lm(train)
    # "b c e": trigram unseen, bigram (c,e) unseen -> unigram floor path
    test = spark.createDataFrame([(9, "b c e")], "doc_id long, text string")
    row = score_perplexity_trigram(test, uni, big, tri, total).first()
    assert row["n_trigrams"] == 1 and row["ppl"] > 0


def test_perplexity_handles_oov(spark):
    train = spark.createDataFrame([(0, "a b c d e")], "doc_id long, text string")
    uni, big, total = train_bigram_lm(train)
    test = spark.createDataFrame([(9, "zz yy xx ww")], "doc_id long, text string")
    row = score_perplexity(test, uni, big, total).first()
    assert row["ppl"] > 0  # OOV floor path, no nulls/crash


def test_ppl_buckets_terciles_and_semantics(spark):
    """Hand-checked terciles: 6 docs per lang split 2/2/2 with head =
    LOWEST perplexity (CCNet orientation), and ties share a bucket."""
    from harvesttext_spark.operators.lm_perplexity import ppl_buckets

    rows = [(i, "aa", float(10 + i)) for i in range(6)] + [
        (10 + i, "bb", 50.0) for i in range(3)  # all tied
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, lang string, ppl double")
    got = {r["doc_id"]: r["ppl_bucket"] for r in ppl_buckets(df).collect()}
    assert [got[i] for i in range(6)] == [
        "head", "head", "middle", "middle", "tail", "tail"
    ]
    # a fully tied group percent-ranks to 0 everywhere -> all head
    assert {got[10 + i] for i in range(3)} == {"head"}


def test_ppl_buckets_sql_parity(spark):
    """Contract-grade value compare for the rows-only queries() entry
    (driver prefix full): the DuckDB side wraps the lm_perplexity
    oracle SQL with the identical per-lang percent_rank window."""
    import math
    import os

    import duckdb

    import __spark_entry__ as entrymod

    sf = os.environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.001")
    sdf = entrymod.q_ppl_buckets(spark, sf).toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'"
    )
    sql = f"""
WITH pplt AS ({entrymod.SQL_LM_PERPLEXITY}),
j AS (SELECT p.doc_id, p.ppl, d.lang
      FROM pplt p JOIN documents d USING (doc_id)),
r AS (SELECT *, percent_rank() OVER (PARTITION BY lang ORDER BY ppl ASC) AS pr
      FROM j)
SELECT doc_id, ppl, lang, round(pr, 6) AS ppl_rank,
       CASE WHEN pr < 1.0/3 THEN 'head'
            WHEN pr < 2.0/3 THEN 'middle'
            ELSE 'tail' END AS ppl_bucket
FROM r
"""
    ddf = con.execute(sql).df()
    assert sorted(sdf.columns) == sorted(ddf.columns)
    assert len(sdf) == len(ddf) and len(sdf) > 0
    assert set(sdf["ppl_bucket"]) == {"head", "middle", "tail"}

    def norm(df):
        out = []
        for row in df.to_dict("records"):
            vals = []
            for c in sorted(df.columns):
                v = row[c]
                if isinstance(v, float):
                    v = "nan" if math.isnan(v) else round(v, 6)
                    v = 0.0 if v == 0 else v
                vals.append(str(v))
            out.append("|".join(vals))
        return sorted(out)

    assert norm(sdf) == norm(ddf)


def test_ppl_buckets_job_flag(spark, tmp_path):
    """--ppl-buckets composes with --with-lm and lands the bucket
    column on the output.  Subprocess because main() stops its
    context."""
    import os
    import subprocess
    import sys

    out = str(tmp_path / "out")
    env = {**os.environ, "SPARK_GRAFT_CPUS": "8", "PYTHONPATH": os.getcwd()}
    r = subprocess.run(
        [sys.executable, "jobs/run_quality_filter.py", "--synthesize", "400",
         "--output", out, "--with-lm", "--ppl-buckets"],
        capture_output=True, text=True, timeout=600, env=env,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    data = spark.read.parquet(out + "/data")
    assert {"ppl", "ppl_rank", "ppl_bucket"} <= set(data.columns)
    vals = {r["ppl_bucket"] for r in data.select("ppl_bucket").distinct().collect()}
    assert {"head", "middle", "tail"} <= vals
    # refused without the lm stage
    r2 = subprocess.run(
        [sys.executable, "jobs/run_quality_filter.py", "--synthesize", "50",
         "--output", str(tmp_path / "o2"), "--ppl-buckets"],
        capture_output=True, text=True, timeout=300, env=env,
    )
    assert r2.returncode != 0 and "--with-lm" in r2.stderr
