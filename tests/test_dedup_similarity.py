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


def test_jaccard_df_cap_bounds_and_exact_values(spark):
    """The df-cap drops hot shingles from CANDIDATE generation only:
    reported jaccard values stay TRUE values (hot shingles included in the
    intersection); pairs sharing ONLY over-cap shingles are not proposed."""
    # 6 docs share boilerplate 'x y z'; docs 0/1 also share rare content.
    rows = [(i, f"x y z unique{i} a{i} b{i}") for i in range(2, 6)]
    rows += [(0, "x y z alpha beta gamma"), (1, "x y z alpha beta gamma delta")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    # cap=5 < 6 docs containing 'x y z' -> boilerplate shingle never joins
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in jaccard_dup_pairs(
            docs, min_jaccard=0.05, max_shingle_df=5
        ).collect()
    }
    # 0-1 share rare shingles ('y z alpha', ...) -> proposed; jaccard is the
    # TRUE value over ALL shingles: |A∩B|=4 ('x y z','y z alpha','z alpha
    # beta','alpha beta gamma'), |A|=4,|B|=5 -> 4/(4+5-4)=0.8
    assert (0, 1) in got
    assert abs(got[(0, 1)] - 0.8) < 1e-9
    # pairs among 2..5 share ONLY the boilerplate shingle -> dropped
    assert all(a == 0 and b == 1 for a, b in got)
    # uncapped control: the boilerplate-only pairs appear
    uncapped = jaccard_dup_pairs(docs, min_jaccard=0.05, max_shingle_df=10**6)
    assert uncapped.count() > len(got)


def test_minhash_band_cap_equivalence_and_planted_family(spark):
    """Hot-band cap (max_band_df) contract, mirroring the jaccard df-cap:

    1. buckets <= cap  => pair set BIT-IDENTICAL to the uncapped join;
    2. oversized bucket => pairs bounded (reps-only left side) but every
       member still pairs with all cap smallest-id reps, so
       drop_near_dups keeps the SAME survivor set as uncapped.
    """
    from harvesttext_spark.operators.dedup import drop_near_dups

    template = (
        "breaking local news update weather traffic sports schedule "
        "community events calendar notice council meeting agenda published"
    )
    near_base = (
        "product listing catalog page size color material shipping returns "
        "warranty details customer reviews rating summary item"
    )
    rows = [(100 + i, template) for i in range(12)]  # identical family:
    # identical signatures -> ONE bucket of 12 in every band (the planted
    # hot bucket; exact-dedup-first would normally remove it, which is
    # exactly why the near family below matters too)
    rows += [(200 + i, f"{near_base} d{i}") for i in range(6)]  # near family
    rows += [
        (i, f"unique background document number {i} spark tokens {i * 7} {i * 13}")
        for i in range(20)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    def pair_set(df):
        return {(r["id_a"], r["id_b"]) for r in df.collect()}

    uncapped_df = minhash_dup_pairs(docs, min_jaccard=0.5, max_band_df=None)
    uncapped = pair_set(uncapped_df)
    # cap far above every bucket: bit-identical to uncapped, AND (round 8)
    # the count probe must have skipped the WindowGroupLimit entirely —
    # under-cap corpora pay a tiny partial-agg, not a (band,key)
    # exchange + sort (the r7 minhash_lsh_pairs 45% headline regression).
    probe_skipped_df = minhash_dup_pairs(docs, min_jaccard=0.5, max_band_df=256)
    assert pair_set(probe_skipped_df) == uncapped
    skip_plan = probe_skipped_df._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" not in skip_plan

    capped_df = minhash_dup_pairs(docs, min_jaccard=0.5, max_band_df=4)
    capped = pair_set(capped_df)
    # cap only ever REMOVES candidate pairs
    assert capped <= uncapped
    # identical family arithmetic: uncapped emits all C(12,2)=66 pairs;
    # capped emits C(4,2) rep-rep + 8 non-reps x 4 reps = 38
    fam_un = {(a, b) for a, b in uncapped if a >= 100 and b < 200}
    fam_cap = {(a, b) for a, b in capped if a >= 100 and b < 200}
    assert len(fam_un) == 66 and len(fam_cap) == 38
    # every family member still pairs with ALL 4 smallest-id reps
    for m in range(104, 112):
        assert all((r, m) in fam_cap for r in (100, 101, 102, 103))
    # survivor equality: connected-components consumption is cap-invariant
    kept_un = sorted(r["doc_id"] for r in drop_near_dups(docs, uncapped_df).collect())
    kept_cap = sorted(r["doc_id"] for r in drop_near_dups(docs, capped_df).collect())
    assert kept_un == kept_cap
    # the near family must actually exercise the path (it survives exact
    # dedup, unlike the identical family) and collapse to its min id
    assert 200 in kept_cap and all(i not in kept_cap for i in range(201, 206))
    # plan shape: Spark must push the rank filter into a PARTIAL
    # WindowGroupLimit BEFORE the (band,key) exchange — each map task
    # pre-trims its slice of a hot bucket to the cap, so a million-member
    # bucket never ships more than cap rows per input partition.  If this
    # ever degrades to a full Window-after-shuffle, the 100TB guard is
    # paying a full shuffle of the hot bucket and the test should scream.
    plan = capped_df._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan and "Partial" in plan


def test_simhash_block_buckets_bounded(docs):
    """Manku blocking: 4×16-bit blocks at max_hamming=3 — every block value
    is in [0, 2^16) so bucket keys have 65,536 distinct values per block
    (the 8-bit/256-value shape this replaced is the n²/1024 scale-killer)."""
    from harvesttext_spark.operators.dedup import simhash64_native

    h = docs.select(simhash64_native(F.col("text"), 2).alias("sh"))
    width = 16
    blocks = h.select(
        *[
            F.shiftrightunsigned(F.col("sh"), width * i)
            .bitwiseAND(F.lit((1 << width) - 1))
            .alias(f"b{i}")
            for i in range(4)
        ]
    ).collect()
    for r in blocks:
        for i in range(4):
            assert 0 <= r[f"b{i}"] < (1 << width)


def test_simhash64_native_one_pass_matches_reference_fold(spark):
    """The one-aggregate rewrite must equal a plain-Python xxhash64 fold.
    Spark's xxhash64 isn't importable in Python, so instead verify
    invariants: identical text -> identical hash; hamming to a 1-token
    change is small; hamming to unrelated text is large."""
    from harvesttext_spark.operators.dedup import simhash64_native

    rows = [
        (0, "spark engines process big data with shuffles and joins"),
        (1, "spark engines process big data with shuffles and joins"),
        (2, "spark engines process big data with shuffles and sorts"),
        (3, "totally unrelated poem about quiet rivers and morning fog"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    vals = {
        r["doc_id"]: r["sh"]
        for r in df.select("doc_id", simhash64_native(F.col("text"), 2).alias("sh")).collect()
    }
    ham = lambda a, b: bin((a ^ b) & ((1 << 64) - 1)).count("1")  # noqa: E731
    assert vals[0] == vals[1]
    assert ham(vals[0], vals[2]) < ham(vals[0], vals[3])


def test_minhash_eager_cleanup_unpersists(spark, docs):
    """eager_cleanup=True must release the signature cache (no block
    accumulation across repeated calls in a long-lived session)."""
    before = len([r for r in spark.sparkContext._jsc.sc().getRDDStorageInfo()])
    out = minhash_dup_pairs(docs, min_jaccard=0.3, eager_cleanup=True)
    assert out.count() >= 0
    after = len([r for r in spark.sparkContext._jsc.sc().getRDDStorageInfo()])
    assert after <= before + 1  # the checkpointed result may linger; the persisted signature must not


def test_prefix_filter_lossless_and_shrinks_candidates(spark):
    """Prefix filter correctness: output pairs identical to an exhaustive
    all-postings self-join at the same threshold (losslessness theorem),
    while the prefix posting table is strictly smaller."""
    import random

    rng = random.Random(3)
    vocab = [f"w{i}" for i in range(40)]
    rows = []
    for i in range(30):
        base = rng.sample(vocab, k=rng.randint(6, 14))
        rows.append((i, " ".join(base)))
        if rng.random() < 0.4:  # add a near-dup with small edits
            dup = list(base)
            dup[rng.randrange(len(dup))] = rng.choice(vocab)
            rows.append((100 + i, " ".join(dup)))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.id_a, r.id_b): round(r.jaccard, 9)
        for r in jaccard_dup_pairs(docs, shingle_n=2, min_jaccard=0.3).collect()
    }
    # exhaustive reference: full posting self-join, no prefix, no cap
    from pyspark.sql import functions as F
    from harvesttext_spark.operators.dedup import token_shingles

    sh = docs.select(
        F.col("doc_id").alias("id"),
        F.explode(token_shingles(F.col("text"), 2)).alias("s"),
    )
    sizes = {r.id: r.sz for r in sh.groupBy("id").agg(F.count("*").alias("sz")).collect()}
    inter = {}
    for r in (
        sh.alias("a").join(sh.alias("b"), "s")
        .filter(F.col("a.id") < F.col("b.id"))
        .groupBy(F.col("a.id").alias("x"), F.col("b.id").alias("y"))
        .agg(F.count("*").alias("i")).collect()
    ):
        inter[(r.x, r.y)] = r.i
    want = {
        k: round(i / (sizes[k[0]] + sizes[k[1]] - i), 9)
        for k, i in inter.items()
        if i / (sizes[k[0]] + sizes[k[1]] - i) >= 0.3
    }
    assert got == want


def test_ivf_topk_recall(spark):
    """IVF ANN: recall@5 vs brute force on the embeddings table; self must
    always be retrieved at rank 1; determinism across calls (seeded
    kmeans + deterministic tie-breaks)."""
    from harvesttext_spark.operators.similarity import (
        brute_force_topk,
        ivf_topk,
        train_ivf_centroids,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").cache()
    queries = emb.limit(5).select(F.col("vec_id").alias("query_id"), "embedding")
    cents = train_ivf_centroids(emb, n_centroids=8, seed=42).cache()

    exact = brute_force_topk(emb, queries, k=5)
    approx = ivf_topk(emb, queries, k=5, n_centroids=8, n_probe=3, centroids=cents)
    exact_sets = {}
    for r in exact.collect():
        exact_sets.setdefault(r.query_id, set()).add(r.vec_id)
    got_sets = {}
    rank1 = {}
    for r in approx.collect():
        got_sets.setdefault(r.query_id, set()).add(r.vec_id)
        if r.rank == 1:
            rank1[r.query_id] = r.vec_id
    # self is in its own probe list by construction
    assert all(rank1[q] == q for q in rank1)
    recall = sum(
        len(exact_sets[q] & got_sets.get(q, set())) / len(exact_sets[q])
        for q in exact_sets
    ) / len(exact_sets)
    assert recall >= 0.5, recall

    # deterministic across invocations
    a = sorted(map(tuple, ivf_topk(emb, queries, k=3, centroids=cents).collect()))
    b = sorted(map(tuple, ivf_topk(emb, queries, k=3, centroids=cents).collect()))
    assert a == b


def test_minhash_cache_bounded_across_calls(spark):
    """Repeated minhash_dup_pairs calls must not accumulate cached
    signature tables: the default path evicts the previous call's cache
    (LRU-1), so persistent RDD count stays flat across calls."""
    from harvesttext_spark.operators import dedup
    from harvesttext_spark.session import read_scaled

    docs = read_scaled(spark, "/root/testdata/sf0.001/documents.parquet")

    def n_persisted():
        return spark.sparkContext._jsc.sc().getPersistentRDDs().size()

    counts = []
    for _ in range(3):
        dedup.minhash_dup_pairs(docs, min_jaccard=0.4).count()
        counts.append(n_persisted())
    assert counts[2] <= counts[0], counts
    # eager path releases even the current call's cache
    dedup.minhash_dup_pairs(docs, min_jaccard=0.4, eager_cleanup=True).count()
    assert n_persisted() <= counts[0], (counts, n_persisted())


def test_boilerplate_line_dedup(spark):
    """CCNet-style boilerplate pass: corpus-frequent lines drop, rare
    lines survive in original order."""
    from harvesttext_spark.operators.dedup import drop_boilerplate_lines

    docs = [
        (i, f"headline {i}\nSubscribe now\nbody text {i}\nAll rights reserved")
        for i in range(12)
    ] + [(99, "unique doc\nwith its own\nlines only")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r["doc_id"]: r["text_clean"] for r in drop_boilerplate_lines(df, min_df=10).collect()}
    assert out[0] == "headline 0\nbody text 0"
    assert out[5] == "headline 5\nbody text 5"
    assert out[99] == "unique doc\nwith its own\nlines only"


def test_repetition_signals(spark):
    """Gopher repetition rules on hand-checkable docs."""
    from harvesttext_spark.functions.textstats import repetition_signals

    docs = [
        (1, "alpha beta\nalpha beta\nalpha beta\ngamma delta"),
        (2, "one line only"),
        (3, "x y x y x y x y x y"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r["doc_id"]: r for r in repetition_signals(df).collect()}
    # doc 1: 4 lines, 2 distinct -> dup_line_frac = 0.5;
    # dup chars = 2 extra occurrences x 10 chars / 41 line chars
    assert out[1]["dup_line_frac"] == 0.5
    assert out[1]["dup_line_char_frac"] == round(20 / 41, 6)
    # doc 2: no repetition
    assert out[2]["dup_line_frac"] == 0.0
    # top bigram "line only" covers 9 of 13 chars
    assert out[2]["top_bigram_char_frac"] == round(9 / 13, 6)
    # doc 3: "x y" bigram appears 5x (len 3), also "y x" 4x; chars 19
    assert out[3]["top_bigram_char_frac"] == round(15 / 19, 6)


def test_boilerplate_keeps_all_boiler_docs(spark):
    """A doc whose every line is boilerplate stays in the output with
    empty text (per-url contract: rows must not silently vanish)."""
    from harvesttext_spark.operators.dedup import drop_boilerplate_lines

    docs = [(i, "Subscribe now\nAll rights reserved") for i in range(12)] + [
        (99, "real content here\nSubscribe now")
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r["doc_id"]: r["text_clean"] for r in drop_boilerplate_lines(df, min_df=10).collect()}
    assert len(out) == 13
    assert out[0] == ""
    assert out[99] == "real content here"


def test_boilerplate_property_vs_python(spark):
    """Property: engine output == single-threaded python reference on
    random multi-line docs (census threshold, normalization, order)."""
    import random

    from harvesttext_spark.operators.dedup import drop_boilerplate_lines

    rng = random.Random(7)
    pool = ["alpha", "Beta line", "  gamma  ", "DELTA", "eps", "zeta z"]
    docs = []
    for i in range(40):
        n = rng.randint(1, 6)
        docs.append((i, "\n".join(rng.choice(pool) for _ in range(n))))
    min_df = 15

    # python reference
    from collections import defaultdict

    seen = defaultdict(set)
    for i, t in docs:
        for line in t.split("\n"):
            k = line.strip().lower()
            if k:
                seen[k].add(i)
    hot = {k for k, s in seen.items() if len(s) >= min_df}
    expect = {
        i: "\n".join(l for l in t.split("\n") if l.strip().lower() not in hot)
        for i, t in docs
    }

    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"]: r["text_clean"] for r in drop_boilerplate_lines(df, min_df=min_df).collect()}
    assert got == expect


def test_drop_url_dups(spark):
    """Canonical-URL dedup: utm/case/fragment variants collapse to the
    latest crawl; distinct pages survive; deterministic tie-break."""
    import datetime as dt

    from harvesttext_spark.operators.dedup import drop_url_dups

    t = lambda d: dt.datetime(2024, 1, d)  # noqa: E731
    rows = [
        ("https://a.example/p?utm_source=x", t(1), "old"),
        ("HTTPS://A.Example/p#frag", t(5), "new"),
        ("https://a.example/p", t(5), "tie"),   # same ts as 'new'
        ("https://b.example/q", t(2), "other"),
    ]
    df = spark.createDataFrame(rows, "url string, warc_ts timestamp, text string")
    out = drop_url_dups(df)
    got = {(r["url"], r["text"]) for r in out.collect()}
    # one survivor for the a.example group: max ts, then max raw url
    assert ("https://b.example/q", "other") in got
    assert len(got) == 2
    a_survivor = [g for g in got if "a.example" in g[0].lower()][0]
    assert a_survivor[1] == "tie"  # 'https://a...' > 'HTTPS://A...' lexicographically


def test_drop_url_dups_content_hash_tiebreak(spark):
    """Two rows identical in url AND timestamp but different payloads must
    pick the SAME survivor on every run/partitioning (the window orderBy
    ends in a full-row xxhash64 — nothing order-dependent feeds output)."""
    import datetime as dt

    from harvesttext_spark.operators.dedup import drop_url_dups

    rows = [
        ("https://a.example/p", dt.datetime(2024, 1, 1), "payload one"),
        ("https://a.example/p", dt.datetime(2024, 1, 1), "payload two"),
    ]
    df1 = spark.createDataFrame(rows, "url string, warc_ts timestamp, text string")
    df2 = spark.createDataFrame(
        list(reversed(rows)), "url string, warc_ts timestamp, text string"
    ).repartition(7)
    (a,) = drop_url_dups(df1).collect()
    (b,) = drop_url_dups(df2).collect()
    assert a["text"] == b["text"]  # input order / partitioning irrelevant


def test_drop_url_dups_exact_mode(spark):
    """canonicalize=False dedups on the EXACT url only — utm variants
    survive as distinct pages (the url-uniqueness guarantee pre-pass for
    drop_boilerplate_lines, without changing which pages exist)."""
    import datetime as dt

    from harvesttext_spark.operators.dedup import drop_url_dups

    rows = [
        ("https://a.example/p?utm_source=x", dt.datetime(2024, 1, 1), "v1"),
        ("https://a.example/p", dt.datetime(2024, 1, 2), "v2"),
        ("https://a.example/p", dt.datetime(2024, 1, 3), "v3"),
    ]
    df = spark.createDataFrame(rows, "url string, warc_ts timestamp, text string")
    got = {r["url"]: r["text"] for r in drop_url_dups(df, canonicalize=False).collect()}
    assert got == {
        "https://a.example/p?utm_source=x": "v1",  # distinct exact url kept
        "https://a.example/p": "v3",               # latest crawl wins
    }


def test_drop_url_dups_agg_equals_window_reference(spark):
    """The max_by aggregate must pick EXACTLY the row a row_number window
    over (ts desc, url desc, payload_hash desc) picks — survivor
    semantics pinned against future refactors, across 300 pages with
    planted canonical collisions and ties."""
    import datetime as dt

    from pyspark.sql import Window

    from harvesttext_spark.functions.urls import canonical_url
    from harvesttext_spark.operators.dedup import drop_url_dups
    from harvesttext_spark.pipeline.pages import synthesize_pages

    base = synthesize_pages(spark, n=300, seed=17).select("url", "warc_ts", "text")
    # plant collisions: utm variants + exact-ts ties
    variants = base.limit(40).select(
        F.concat(F.col("url"), F.lit("?utm_source=x")).alias("url"),
        "warc_ts",
        F.concat(F.lit("v2 "), F.col("text")).alias("text"),
    )
    df = base.unionByName(variants)
    got = sorted(map(tuple, drop_url_dups(df).collect()))
    keyed = df.withColumn("_curl", canonical_url(F.col("url")))
    ph = F.xxhash64(*[F.col(c) for c in df.columns])
    w = Window.partitionBy("_curl").orderBy(
        F.col("warc_ts").desc(), F.col("url").desc(), ph.desc()
    )
    want = sorted(
        map(
            tuple,
            keyed.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn", "_curl")
            .collect(),
        )
    )
    assert got == want and len(got) == 300


def test_brute_force_topk_blas_matches_hof(spark):
    """The BLAS scoring path must return the same ranking as the
    HOF-fold baseline (same (cos desc, id asc) tie-break); cosine values
    agree to float tolerance (fold order differs by design)."""
    from harvesttext_spark.operators.similarity import (
        brute_force_topk,
        brute_force_topk_blas,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").cache()
    queries = emb.limit(4).select(F.col("vec_id").alias("query_id"), "embedding")
    hof = brute_force_topk(emb, queries, k=7).collect()
    blas = brute_force_topk_blas(emb, queries, k=7).collect()
    key = lambda r: (r["query_id"], r["rank"])
    h = {key(r): r for r in hof}
    b = {key(r): r for r in blas}
    assert set(h) == set(b)
    for kk in h:
        assert h[kk]["vec_id"] == b[kk]["vec_id"], kk
        # normalize-then-dot vs dot-then-divide: ~1e-9 float drift
        assert abs(h[kk]["cos_sim"] - b[kk]["cos_sim"]) < 1e-6, kk
    # empty query set returns an empty frame with the contract schema
    none = brute_force_topk_blas(emb, queries.limit(0), k=3)
    assert none.count() == 0
    assert set(none.columns) == {"query_id", "vec_id", "cos_sim", "rank"}
    # ... and with string ids the empty path mirrors the INPUT dtypes
    # instead of hardcoding long — schema must not flip with |queries|
    from harvesttext_spark.operators.similarity import lsh_topk_blas

    s_emb = emb.withColumn("vec_id", F.concat(F.lit("v"), "vec_id"))
    s_q = queries.withColumn("query_id", F.concat(F.lit("q"), "query_id"))
    expect = dict(brute_force_topk_blas(s_emb, s_q, k=2).dtypes)
    got = dict(brute_force_topk_blas(s_emb, s_q.limit(0), k=2).dtypes)
    assert got == expect and got["query_id"] == "string" and got["vec_id"] == "string"
    expect = dict(lsh_topk_blas(s_emb, s_q, dim=64, k=2).dtypes)
    got = dict(lsh_topk_blas(s_emb, s_q.limit(0), dim=64, k=2).dtypes)
    assert got == expect and got["vec_id"] == "string"


def test_simhash32_shapes_value_identical(spark):
    """auto-shape dispatch: fold and explode shapes must be value-identical
    (incl. NULL text -> NULL, empty/whitespace text -> 0) so the choice is
    pure physical planning."""
    from harvesttext_spark.operators.dedup import simhash32_frame

    rows = [
        (1, "the quick brown fox"),
        (2, "the quick brown fox"),
        (3, "entirely different words here"),
        (4, ""),
        (5, "   "),
        (6, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fold = {r["id"]: r["sh"] for r in simhash32_frame(df, shape="fold").collect()}
    expl = {r["id"]: r["sh"] for r in simhash32_frame(df, shape="explode").collect()}
    assert fold == expl
    assert fold[1] == fold[2] and fold[6] is None and fold[4] == 0 and fold[5] == 0
    # auto on a tiny frame resolves to SOME shape and matches both
    auto = {r["id"]: r["sh"] for r in simhash32_frame(df).collect()}
    assert auto == fold


def test_contamination_flags_and_drop(spark):
    """Benchmark decontamination: n-gram overlap flags docs; whole-text
    shingle rule for shorter-than-n rows; anti-join drop is duplicate-id
    safe; distinct doc shingles count once."""
    from harvesttext_spark.operators.decontamination import (
        contamination_flags,
        drop_contaminated,
    )

    bench = spark.createDataFrame(
        [("the secret eval answer is forty two",), ("short row",)],
        "text string",
    )
    docs = spark.createDataFrame(
        [
            (1, "padding words the secret eval answer is forty two trailing"),
            (2, "THE SECRET EVAL ANSWER IS FORTY TWO"),  # case fold
            (3, "the secret eval answer differs here completely now"),
            (4, "short row"),                    # whole-text match (2 < n)
            (5, "a short row padded out"),       # 5-gram != whole-text: clean
            (6, None),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_hits"], r["contaminated"])
        for r in contamination_flags(docs, bench, n=5).collect()
    }
    assert got[1][1] and got[1][0] >= 1
    assert got[2] == (3, True)  # 7 tokens -> 3 distinct 5-grams, all hit
    assert got[3] == (0, False)
    assert got[4] == (1, True)
    assert got[5] == (0, False)
    assert got[6] == (0, False)

    kept = sorted(r["doc_id"] for r in drop_contaminated(docs, bench, n=5).collect())
    assert kept == [3, 5, 6]
    # duplicate ids: BOTH copies of a contaminated id drop (anti-join)
    dup = docs.unionByName(docs.filter("doc_id = 1"))
    kept2 = [r["doc_id"] for r in drop_contaminated(dup, bench, n=5).collect()]
    assert sorted(kept2) == [3, 5, 6]


def test_lsh_topk_blas_matches_hof(spark):
    """The one-pass BLAS LSH (bucket + probe + score in a single map)
    must return the same ranking as the HOF shape — identical
    deterministic hyperplanes, identical probe policy (exact + 1-bit
    flips), same (cos desc, id asc) tie-break."""
    from harvesttext_spark.operators.similarity import lsh_topk, lsh_topk_blas

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").cache()
    queries = emb.limit(4).select(F.col("vec_id").alias("query_id"), "embedding")
    key = lambda r: (r["query_id"], r["rank"], r["vec_id"])
    a = sorted(map(key, lsh_topk(emb, queries, dim=64, k=5, n_planes=6).collect()))
    b = sorted(map(key, lsh_topk_blas(emb, queries, dim=64, k=5, n_planes=6).collect()))
    assert a == b and len(a) > 0
    none = lsh_topk_blas(emb, queries.limit(0), dim=64, k=3)
    assert none.count() == 0


def test_paragraph_dedup_keep_first(spark):
    """CCNet-style corpus paragraph dedup: later occurrences of a
    duplicated (lower/trim-normalized) paragraph are removed, the global
    first survives, untouched docs are byte-identical (empty lines
    preserved), an all-duplicate doc becomes '', NULL stays NULL, and
    string ids order lexicographically."""
    from harvesttext_spark.operators.dedup import drop_duplicate_paragraphs

    rows = [
        (1, "alpha one\nshared paragraph here\ntail a"),
        (2, "beta intro\nshared paragraph here\nbeta tail"),
        (3, "SHARED PARAGRAPH HERE  \nonly unique stuff"),
        (4, "untouched doc\n\nwith empty line"),
        (5, "shared paragraph here"),
        (6, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r["text_dedup"] for r in drop_duplicate_paragraphs(df).collect()}
    assert out[1] == "alpha one\nshared paragraph here\ntail a"
    assert out[2] == "beta intro\nbeta tail"
    assert out[3] == "only unique stuff"
    assert out[4] == "untouched doc\n\nwith empty line"
    assert out[5] == ""
    assert out[6] is None

    # string url ids: struct-min keep-first still well-defined
    srows = [("https://a.example/1", "dup para\nx"), ("https://b.example/2", "dup para\ny")]
    sdf = spark.createDataFrame(srows, "url string, text string")
    got = {
        r["url"]: r["text_dedup"]
        for r in drop_duplicate_paragraphs(sdf, id_col="url").collect()
    }
    assert got["https://a.example/1"] == "dup para\nx"
    assert got["https://b.example/2"] == "y"


def test_minhash_shingle_sampling(spark):
    """Opt-in sketch thinning: sampling OFF (None or 1) must be
    bit-identical to the exact signature; sampling ON thins the shingle
    stream deterministically (content-keyed — the same shingle samples
    identically everywhere) and still finds heavily-duplicated pairs."""
    from pyspark.sql import functions as F

    from harvesttext_spark.operators.dedup import (
        minhash_dup_pairs,
        minhash_signature_frame,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    exact = {r["id"]: r["sig"] for r in minhash_signature_frame(docs).collect()}
    off_none = {
        r["id"]: r["sig"]
        for r in minhash_signature_frame(docs, shingle_sample_mod=None).collect()
    }
    off_one = {
        r["id"]: r["sig"]
        for r in minhash_signature_frame(docs, shingle_sample_mod=1).collect()
    }
    assert exact == off_none == off_one

    sampled = {
        r["id"]: r["sig"]
        for r in minhash_signature_frame(docs, shingle_sample_mod=2).collect()
    }
    assert sampled != exact  # thinning really changes the sketch
    # exact duplicates still pair under sampling (same text -> same
    # sampled shingle set -> identical signature)
    dup = docs.limit(6).unionByName(
        docs.limit(6).withColumn("doc_id", F.col("doc_id") + 1000000)
    )
    pairs = {
        (r["id_a"], r["id_b"])
        for r in minhash_dup_pairs(
            dup, min_jaccard=0.9, shingle_sample_mod=2
        ).collect()
    }
    base = {r["doc_id"] for r in docs.limit(6).filter("text IS NOT NULL").collect()}
    for d in base:
        assert (d, d + 1000000) in pairs, d


def test_substring_census_tokenizer_matches_java_ws(spark):
    """The census's Python tokenizer must split on EXACTLY Java's default
    \\s class ([ \\t\\n\\x0b\\f\\r]) — NOT Python re's Unicode \\s — so the
    mapInPandas census, the cut stage's F.split, and the RE2 oracle all
    agree.  NBSP (U+00A0) is the canonical divergence: it must NOT split,
    so two docs differing only by NBSP-vs-space tokenization share no
    8-token window here."""
    from harvesttext_spark.operators.substring_dedup import (
        cut_duplicate_spans,
        window_census,
    )

    run = "w1 w2 w3 w4 w5 w6 w7 w8"
    nbsp_run = run.replace(" ", " ")  # ONE token under Java \s
    rows = [
        (1, f"{run} tail"),
        (2, f"lead {run}"),            # real dup of doc 1's window
        (3, f"lead {nbsp_run} x y z"), # NBSP glue: no 8-token window match
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    census = window_census(df, k=8).collect()
    assert {r["id"] for r in census} == {1, 2}  # doc 3 has only 5 tokens
    out = {r["doc_id"]: r["text_dedup"] for r in cut_duplicate_spans(df, k=8).collect()}
    assert out[2] == "lead"
    assert out[3] == f"lead {nbsp_run} x y z"  # byte-identical, NBSP intact
    # vertical tab/form feed DO split (they are in Java's \s)
    vt = spark.createDataFrame([(9, run.replace(" ", "\x0b"))], "doc_id long, text string")
    assert window_census(vt, k=8).count() == 1


def test_rolling_hash_matches_fold():
    """The vectorized prefix-hash window census must equal the sequential
    fold acc=(acc*B + h) % m the DuckDB oracle runs — exact modular
    identity, fuzzed over random token streams, window sizes, and all
    three prime channels (pure numpy, no Spark)."""
    import numpy as np

    from harvesttext_spark.operators.substring_dedup import (
        SS_MODS,
        SS_WIN_BASE,
        _token_hashes,
        _window_hash_channel,
    )

    rng = np.random.default_rng(7)
    for _ in range(20):
        n = int(rng.integers(1, 60))
        k = int(rng.integers(1, 12))
        toks = ["t%d" % x for x in rng.integers(0, 10, n)]
        h = _token_hashes(toks, {})
        for c, m in enumerate(SS_MODS):
            got = list(_window_hash_channel(h[:, c], k, m))
            exp = []
            for p in range(max(0, n - k + 1)):
                acc = 0
                for i in range(p, p + k):
                    acc = (acc * SS_WIN_BASE + int(h[i, c])) % m
                exp.append(acc)
            assert got == exp


def test_exact_substring_dedup(spark):
    """Lee-et-al-style exact-substring dedup: duplicated >=k-token runs
    cut from all but the corpus-first occurrence; overlapping windows
    merge into one span; in-doc self-repeats cut; untouched docs pass
    through byte-identical."""
    from harvesttext_spark.operators.substring_dedup import (
        cut_duplicate_spans,
        duplicate_window_spans,
    )

    rows = [
        (1, "a b c d e f g h unique tail one"),
        (2, "prefix two a b c d e f g h suffix two"),
        (3, "x1 x2 x3 a b c d e f g h i9 j9"),
        (4, "r1 r2 r3 r4 r5 r6 r7 r8 r1 r2 r3 r4 r5 r6 r7 r8 tail"),
        (5, "nothing  shared   here with odd   spacing at all"),
        (6, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    spans = {
        (r["doc_id"], r["start_tok"], r["end_tok"])
        for r in duplicate_window_spans(df, k=8).collect()
    }
    assert spans == {(2, 2, 10), (3, 3, 11), (4, 8, 16)}
    out = {r["doc_id"]: r["text_dedup"] for r in cut_duplicate_spans(df, k=8).collect()}
    assert out[1] == "a b c d e f g h unique tail one"   # first occurrence intact
    assert out[2] == "prefix two suffix two"
    assert out[3] == "x1 x2 x3 i9 j9"
    assert out[4] == "r1 r2 r3 r4 r5 r6 r7 r8 tail"      # self-repeat cut
    # untouched docs byte-identical (odd whitespace preserved)
    assert out[5] == "nothing  shared   here with odd   spacing at all"
    assert out[6] is None


def test_pq_adc_matches_numpy_reference(spark):
    """The distributed PQ path (encode mapInPandas + ADC LUT scoring +
    global top-k window) must reproduce a pure-numpy reference
    implementation ROW-FOR-ROW given the same codebooks — encoding
    argmins, LUT distances, and the (dist asc, id asc) tie-break all
    pinned."""
    import numpy as np
    from pyspark.sql import functions as F

    from harvesttext_spark.operators.pq import (
        pq_encode,
        pq_topk,
        train_pq_codebooks,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").cache()
    cb = train_pq_codebooks(emb, dim=64, n_sub=8, k_codes=16, sample=500, seed=7)
    n_sub, kc, dsub = cb.shape
    rows = emb.collect()
    ids = np.array([r["vec_id"] for r in rows])
    X = np.array([r["embedding"] for r in rows], dtype=np.float64)

    # reference encode
    ref_codes = np.empty((len(X), n_sub), dtype=np.int64)
    for s in range(n_sub):
        sub = X[:, s * dsub : (s + 1) * dsub]
        d = ((sub[:, None, :] - cb[s][None, :, :]) ** 2).sum(-1)
        ref_codes[:, s] = np.argmin(d, axis=1)
    got_codes = {
        r["vec_id"]: list(r["codes"]) for r in pq_encode(emb, cb).collect()
    }
    for i, v in enumerate(ids):
        assert got_codes[v] == list(ref_codes[i]), v

    # reference ADC top-k
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = [
        (r["query_id"], r["rank"], r["vec_id"], round(r["adc_dist"], 9))
        for r in pq_topk(pq_encode(emb, cb), queries, cb, k=7).collect()
    ]
    exp = []
    for q in sorted(r["query_id"] for r in queries.collect()):
        qv = X[list(ids).index(q)]
        lut = np.empty((n_sub, kc))
        for s in range(n_sub):
            qs = qv[s * dsub : (s + 1) * dsub]
            lut[s] = ((qs[None, :] - cb[s]) ** 2).sum(-1)
        d = lut[np.arange(n_sub)[None, :], ref_codes].sum(1)
        order = np.lexsort((ids, d))[:7]
        for rk, j in enumerate(order, 1):
            exp.append((q, rk, ids[j], round(float(d[j]), 9)))
    assert sorted(got) == sorted(exp)


def test_pq_recall_and_determinism(spark):
    """PQ quality floor on the (worst-case, structureless) synthetic
    embeddings: recall@10 >= 0.4 at 8x64 codebooks and every query finds
    ITSELF at rank 1; codebook training is double-run deterministic;
    IVF-PQ (fused assign+encode, probe-list ADC) returns sane rows;
    empty queries keep the contract schema."""
    import numpy as np
    from pyspark.sql import functions as F

    from harvesttext_spark.operators.pq import (
        ivf_pq_topk,
        pq_encode,
        pq_topk,
        train_pq_codebooks,
    )
    from harvesttext_spark.operators.similarity import brute_force_topk

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet").cache()
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    cb = train_pq_codebooks(emb, dim=64, n_sub=8, k_codes=64, sample=500, seed=7)
    assert np.array_equal(
        cb, train_pq_codebooks(emb, dim=64, n_sub=8, k_codes=64, sample=500, seed=7)
    )
    exact = {(r["query_id"], r["vec_id"]) for r in brute_force_topk(emb, queries, k=10).collect()}
    rows = pq_topk(pq_encode(emb, cb), queries, cb, k=10).collect()
    pq = {(r["query_id"], r["vec_id"]) for r in rows}
    assert len(pq & exact) / len(exact) >= 0.4
    assert sum(1 for r in rows if r["rank"] == 1 and r["vec_id"] == r["query_id"]) == 5

    ivfpq = ivf_pq_topk(
        emb, queries, dim=64, k=10, n_centroids=8, n_probe=4, n_sub=8,
        k_codes=64, codebooks=cb,
    ).collect()
    assert {r["query_id"] for r in ivfpq} == {0, 1, 2, 3, 4}
    # probing 4/8 lists can only shrink the candidate set vs full PQ
    ivf_pairs = {(r["query_id"], r["vec_id"]) for r in ivfpq}
    assert len(ivf_pairs & pq) >= len(pq) // 2

    none = pq_topk(pq_encode(emb, cb), queries.limit(0), cb, k=3)
    assert none.count() == 0
    assert set(none.columns) == {"query_id", "vec_id", "adc_dist", "rank"}
    # ivf_pq_topk honors the same typed-empty contract (used to IndexError
    # on Q[:, slice] with a 1-D empty array)
    inone = ivf_pq_topk(
        emb, queries.limit(0), dim=64, k=3, n_centroids=8, n_probe=4,
        n_sub=8, k_codes=64, codebooks=cb,
    )
    assert inone.count() == 0
    assert dict(inone.dtypes)["vec_id"] == dict(emb.dtypes)["vec_id"]
    assert set(inone.columns) == {"query_id", "vec_id", "adc_dist", "rank"}
