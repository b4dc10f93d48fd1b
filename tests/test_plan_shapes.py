"""Plan-shape regression guards: the scale properties the engine claims
(no accidental cartesian products, pushdown reaching scans, broadcasts on
dimension joins) asserted structurally on the compiled physical plans —
a perf bug that flips one of these shows up here before any benchmark."""

import contextlib
import io

import pytest

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.mark.parametrize(
    "name",
    [
        "jaccard_pairs",
        "bigram_stats",
        "minhash_lsh_pairs",
        "so_pmi",
        "tfidf_topk",
        "events_sessionize",
        "simhash_dup_pairs",
        "simhash_pairs32",
        "langid_trained",
        "punkt_abbrevs",
        "ann_lsh_topk",
        "pagerank_tokens",
    ],
)
def test_no_cartesian_product(spark, name):
    """None of the candidate-generation / stats queries may compile to a
    cartesian product — every pair generation goes through a keyed join."""
    plan = plan_of(entrymod.queries()[name](spark, SF))
    assert "CartesianProduct" not in plan, name


def test_intentional_broadcast_nl_joins_only(spark):
    """The brute-force embedding baseline is the one query ALLOWED a
    broadcast nested-loop join (explicitly labeled baseline); the langid
    score grid also broadcasts a tiny stats table.  Everything else in
    the headline set must stay keyed."""
    plan = plan_of(entrymod.queries()["embedding_topk"](spark, SF))
    assert "BroadcastNestedLoopJoin" in plan  # the documented baseline
    for name in ("jaccard_pairs", "bigram_stats", "so_pmi"):
        p = plan_of(entrymod.queries()[name](spark, SF))
        assert "BroadcastNestedLoopJoin" not in p, name


def test_star_join_pushdown_and_broadcast(spark):
    """TPC-H-style star join: dimension filters reach the scans
    (PushedFilters) and small sides broadcast (BroadcastHashJoin)."""
    plan = plan_of(entrymod.queries()["region_revenue"](spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "PushedFilters: [" in plan


def test_column_pruning_on_text_scans(spark):
    """doc_stats reads only (doc_id, text) from the documents table."""
    plan = plan_of(entrymod.queries()["doc_stats"](spark, SF))
    scan_lines = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert scan_lines, plan
    for l in scan_lines:
        assert "doc_id" in l and "text" in l
        assert "source" not in l and "lang" not in l and "n_chars" not in l


def test_fast_path_no_codegen_fallback(spark):
    """The fast_path plan must stay LINEAR: the inline 3^n guarded-chain
    expression next to the extracted Python UDF blew janino's 64KB method
    limit at the full-pipeline shape and silently fell back to interpreted
    eval (~40x slower).  The effective guard here is the analyzed-tree size
    bound (measured: inline 625KB vs frame 11KB at scrub shape — the
    codegen.fallback=false run alone does NOT trip at this small shape;
    the method-size blowup needed label()'s signals in the same stage)."""
    from harvesttext_spark.pipeline.pages import synthesize_pages
    from harvesttext_spark.pipeline.quality_filter import quality_filter

    old = spark.conf.get("spark.sql.codegen.fallback", "true")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try:
        out = quality_filter(synthesize_pages(spark, n=200, seed=3), fast_path=True)
        assert out.count() == 200
        # and the analyzed tree stays linear (the 3^n version was multi-MB)
        size = len(out._jdf.queryExecution().analyzed().toString())
        assert size < 200_000, f"analyzed plan blew up: {size} chars"
    finally:
        spark.conf.set("spark.sql.codegen.fallback", old)


def test_boilerplate_antijoin_unforced(spark):
    """drop_boilerplate_lines must NOT force-broadcast the hot-line table:
    at Common-Crawl scale the df>=min_df line set is huge (cookie banners
    alone are millions of distinct normalized lines) and a broadcast hint
    OOMs exactly when the operator matters.  Pin: the optimized logical
    plan keeps the left-anti join with NO join hint (AQE is free to pick
    broadcast at runtime when the table measures small), and the physical
    plan has no cartesian product."""
    from harvesttext_spark.operators.dedup import drop_boilerplate_lines
    from harvesttext_spark.pipeline.pages import synthesize_pages

    docs = synthesize_pages(spark, n=100, seed=1).selectExpr(
        "url AS doc_id", "text"
    )
    out = drop_boilerplate_lines(docs, min_df=5)
    logical = out._jdf.queryExecution().optimizedPlan().toString()
    assert "LeftAnti" in logical
    # an explicit F.broadcast() survives into the optimized plan as a
    # join hint — its absence is the unforced-ness we pin
    assert "broadcast" not in logical.lower()
    assert "CartesianProduct" not in plan_of(out)


def test_domain_drop_samples_partial_topk_shape(spark):
    """The salted two-level top-k must compile to TWO aggregate levels
    (partial top-k per (domain, salt), then the merge) — i.e. two
    exchanges whose upstream aggregates bound state at k rows per salt
    BEFORE any shuffle.  A refactor that collapses it into one global
    window would funnel the Zipf-head domain's full drop list to one
    reducer; this pins the shape."""
    plan = plan_of(entrymod.queries()["domain_drop_samples"](spark, SF))
    assert "CartesianProduct" not in plan
    # slice(array_sort(collect_list)) compiles to ObjectHashAggregate
    assert plan.count("ObjectHashAggregate") >= 4  # partial+final x 2 levels
    assert "Window" not in plan  # no global per-domain sort


def test_plan_keyed_persist_semantics(spark):
    """Same plan -> the SAME cached frame comes back (warm reuse, no
    double-persist); different plan -> previous slot occupant is evicted
    and storage stays bounded at one table per slot."""
    from harvesttext_spark.session import _persist_slots, plan_keyed_persist

    def n_persisted():
        return spark.sparkContext._jsc.sc().getPersistentRDDs().size()

    base = n_persisted()
    a = spark.range(100).selectExpr("id", "id * 2 AS y")
    p1 = plan_keyed_persist(a, "_test_slot")
    p1.count()
    p2 = plan_keyed_persist(spark.range(100).selectExpr("id", "id * 2 AS y"), "_test_slot")
    assert p2 is p1  # identical plan reuses the materialized frame
    b = spark.range(50).selectExpr("id", "id * 3 AS y")
    p3 = plan_keyed_persist(b, "_test_slot")
    p3.count()
    assert p3 is not p1
    assert n_persisted() <= base + 1  # old occupant evicted
    p3.unpersist()
    _persist_slots.pop("_test_slot", None)


def test_window_census_zero_shuffle(spark):
    """The round-6 substring-dedup census is ONE Arrow pass over the scan
    — no Exchange, no Window/Sort, no collect_list materialization may
    reappear in its physical plan."""
    from harvesttext_spark.operators.substring_dedup import window_census

    docs = spark.read.parquet(SF + "/documents.parquet").select("doc_id", "text")
    plan = plan_of(window_census(docs, k=8))
    assert "Exchange" not in plan, plan
    assert "Window" not in plan and "Sort" not in plan, plan
    assert "collect_list" not in plan, plan
    assert "MapInPandas" in plan or "ArrowEvalPython" in plan, plan


def test_paragraph_dedup_census_partial_agg(spark):
    """Paragraph-dedup census must keep map-side partial aggregation (the
    hot-boilerplate-key safety) — two HashAggregate passes around its
    exchange, and no cartesian product anywhere in the full plan."""
    from harvesttext_spark.operators.dedup import drop_duplicate_paragraphs

    docs = spark.read.parquet(SF + "/documents.parquet").select("doc_id", "text")
    plan = plan_of(drop_duplicate_paragraphs(docs))
    assert "CartesianProduct" not in plan, plan
    assert plan.count("HashAggregate") >= 2, plan


def test_connected_components_star_round_shape(spark):
    """The distributed star-contraction leg (VERDICT r6 #4): each round's
    neighbor-min must keep map-side partial aggregation (hot-hub-node
    safety — a 1M-member near-dup family puts one node on every edge),
    and no round may plan a cartesian product.  Pin by compiling one
    large-star round's plan exactly as the loop builds it."""
    from pyspark.sql import functions as F

    E = spark.range(1000).select(
        (F.col("id") % 7).alias("v"), (F.col("id") + 7).alias("u")
    ).localCheckpoint()
    sym = E.unionByName(E.select(F.col("v").alias("u"), F.col("u").alias("v")))
    m = sym.groupBy("u").agg(F.min("v").alias("mn")).select(
        "u", F.least("mn", F.col("u")).alias("m")
    )
    large = (
        sym.join(m, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    plan = plan_of(large)
    assert "CartesianProduct" not in plan, plan
    # partial + final hash aggregate around the groupBy-min exchange
    assert plan.count("HashAggregate") >= 2, plan


def test_cross_snapshot_semi_join_shape(spark):
    """flag_dups_against must compile to a LEFT-SEMI join on the band
    keys — a regression to inner join would materialize per-bucket pairs
    and reintroduce the quadratic hot-band failure the semi join
    short-circuits away."""
    from pyspark.sql import functions as F

    from harvesttext_spark.operators.dedup import (
        flag_dups_against,
        snapshot_band_index,
    )

    docs = spark.range(50).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("some words about topic number "), F.col("id"),
                 F.lit(" with trailing filler tokens here")).alias("text"),
    )
    idx = snapshot_band_index(docs)
    plan = plan_of(flag_dups_against(docs, idx))
    assert "LeftSemi" in plan
    assert "CartesianProduct" not in plan


def test_fineweb_rides_the_scan(spark):
    """The FineWeb battery is per-row column work — beyond read_scaled's
    single repartition of the single-row-group test parquet, no exchange
    (and no join) may appear."""
    plan = plan_of(entrymod.queries()["fineweb_signals"](spark, SF))
    assert "Join" not in plan
    # read_scaled repartition (documented) is the only allowed exchange
    assert plan.count("Exchange") <= 2, plan


def test_domain_reputation_broadcast_totals(spark):
    """The 1-row global-totals side of the shrinkage must ride a
    BroadcastExchange (scalar-dim crossJoin rule), never a shuffled
    cartesian."""
    plan = plan_of(entrymod.queries()["domain_reputation"](spark, SF))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan


def test_edu_score_broadcast_score_join(spark):
    """The bucket-score table (<= 2^16 rows by construction) must
    broadcast onto the scoring gram stream — a shuffled hash join here
    would re-shuffle the whole corpus's exploded grams at 100 TB."""
    plan = plan_of(entrymod.queries()["edu_score"](spark, SF))
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan


def test_semdedup_single_exchange_grouped_scan(spark):
    """The pair scan must be ONE exchange on centroid_id feeding a
    grouped Arrow gemm (FlatMapGroupsInPandas) — no join may reappear:
    the earlier pair-join shape shipped both vectors of every candidate
    pair through the shuffle (~90x the bytes at 100-member clusters)."""
    from harvesttext_spark.operators.semdedup import semdedup
    from harvesttext_spark.operators.similarity import fixture_centroids

    emb = entrymod._emb(spark, SF).select("vec_id", "embedding")
    cent = fixture_centroids(spark, dim=64, n_centroids=8)
    for cap in (None, 64):
        plan = plan_of(semdedup(emb, cent, threshold=0.95, max_cluster_df=cap))
        assert "FlatMapGroupsInPandas" in plan
        assert "Join" not in plan
        assert "CartesianProduct" not in plan
