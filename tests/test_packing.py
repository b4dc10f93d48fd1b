"""Sequence packing (operators/packing.py): pure-python row-for-row
reference, partitioning/batch-size invariance, capacity invariants, and
edge modes."""

import hashlib

import pytest
from pyspark.sql import functions as F

from harvesttext_spark.operators.packing import _ffd_pack, pack_sequences, pack_stats

MAX_TOKENS = 10
N_SHARDS = 4


def _shard(doc_id, seed=42, n_shards=N_SHARDS):
    if doc_id is None:
        return -1
    v = int(hashlib.md5(f"{seed}:{doc_id}".encode()).hexdigest()[:15], 16)
    return v % n_shards


def _py_pack(rows, max_tokens=MAX_TOKENS, n_shards=N_SHARDS):
    """Reference: shard by salted md5, FFD per shard in (tokens desc,
    id asc) order."""
    by_shard = {}
    for doc_id, n_tok in rows:
        by_shard.setdefault(_shard(doc_id, n_shards=n_shards), []).append(
            (doc_id, n_tok)
        )
    out = {}
    for sh, members in by_shard.items():
        members.sort(key=lambda t: (-t[1], t[0]))
        bins = _ffd_pack([n for _, n in members], max_tokens)
        for (doc_id, n_tok), b in zip(members, bins):
            out[doc_id] = (sh, b, n_tok, n_tok > max_tokens)
    return out


ROWS = [(i, "tok " * ((i * 7) % 10 + 1)) for i in range(60)] + [
    (200, "x " * 25),  # oversize: singleton bin
    (201, None),  # null text: 0 tokens, packs normally
]


def _df(spark, parts=4):
    return spark.createDataFrame(ROWS, "doc_id bigint, text string").repartition(parts)


def _counts():
    return [(i, len(t.split()) if t else 0) for i, t in ROWS]


def test_pack_matches_python_reference(spark):
    got = {
        r["doc_id"]: (r["pack_shard"], r["pack_bin"], r["pack_tokens"], r["oversize"])
        for r in pack_sequences(
            _df(spark), MAX_TOKENS, n_shards=N_SHARDS
        ).collect()
    }
    want = _py_pack(_counts())
    assert got == want


def test_pack_partitioning_and_batch_invariant(spark):
    base = sorted(
        map(
            tuple,
            pack_sequences(_df(spark, 1), MAX_TOKENS, n_shards=N_SHARDS)
            .select("doc_id", "pack_shard", "pack_bin")
            .collect(),
        )
    )
    many = sorted(
        map(
            tuple,
            pack_sequences(_df(spark, 13), MAX_TOKENS, n_shards=N_SHARDS)
            .select("doc_id", "pack_shard", "pack_bin")
            .collect(),
        )
    )
    assert base == many
    # tiny Arrow batches: a shard's rows arrive split across batches —
    # the per-partition concat must reassemble them before packing or
    # bin ids collide / capacity breaks
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "5")
    try:
        tiny = sorted(
            map(
                tuple,
                pack_sequences(_df(spark, 2), MAX_TOKENS, n_shards=N_SHARDS)
                .select("doc_id", "pack_shard", "pack_bin")
                .collect(),
            )
        )
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    assert tiny == base


def test_capacity_invariant_and_oversize(spark):
    packed = pack_sequences(_df(spark), MAX_TOKENS, n_shards=N_SHARDS)
    stats = pack_stats(packed, MAX_TOKENS).collect()
    for r in stats:
        if r["has_oversize"]:
            assert r["n_docs"] == 1  # oversize docs pack alone
        else:
            assert r["n_tokens"] <= MAX_TOKENS
    over = packed.filter("oversize").collect()
    assert [r["doc_id"] for r in over] == [200]


def test_null_id_reserved_shard(spark):
    df = spark.createDataFrame(
        [(None, "a b c"), (1, "d e")], "doc_id bigint, text string"
    )
    got = {
        r["doc_id"]: r["pack_shard"]
        for r in pack_sequences(df, 5, n_shards=N_SHARDS).collect()
    }
    assert got[None] == -1 and got[1] == _shard(1)


def test_precomputed_token_count_col(spark):
    df = _df(spark).withColumn("n_tok", F.size(F.split("text", " ")) - 1)
    via_text = pack_sequences(_df(spark), MAX_TOKENS, n_shards=N_SHARDS)
    via_col = pack_sequences(
        df, MAX_TOKENS, token_count_col="n_tok", n_shards=N_SHARDS
    )
    a = sorted(map(tuple, via_text.select("doc_id", "pack_shard", "pack_bin").collect()))
    b = sorted(map(tuple, via_col.select("doc_id", "pack_shard", "pack_bin").collect()))
    # "tok " * n splits to n tokens + trailing '' -> size-1 == token_count
    assert a == b


def test_fill_efficiency(spark):
    """FFD must actually pack: on uniform 1..10-token docs with budget 10
    the mean fill of multi-doc bins should be well above half."""
    packed = pack_sequences(_df(spark), MAX_TOKENS, n_shards=N_SHARDS)
    stats = [
        r["fill_ratio"]
        for r in pack_stats(packed, MAX_TOKENS).collect()
        if not r["has_oversize"]
    ]
    assert sum(stats) / len(stats) > 0.6


def test_rejects_bad_budget(spark):
    with pytest.raises(ValueError):
        pack_sequences(_df(spark), 0)


def test_pack_tokenizer_bpe_counts_subwords(spark):
    """--pack-tokenizer bpe: pack_tokens must equal the BPE subword
    count (whitespace words under-count subwords, so the same doc packs
    fatter under bpe), and the bin capacity invariant holds on the
    subword measure."""
    from pyspark.sql import functions as F

    from jobs.run_quality_filter import apply_packing

    rows = [
        (f"https://p{i}.x/", "internationalization antidisestablishment "
         f"floccinaucinihilipilification row {i}", True, None)
        for i in range(30)
    ]
    df = spark.createDataFrame(
        rows, "url string, text_clean string, keep boolean, drop_reason string"
    )
    ws = apply_packing(df, 64, tokenizer="ws").collect()
    bpe = apply_packing(df, 64, tokenizer="bpe", bpe_merges=20).collect()
    ws_tok = {r["url"]: r["pack_tokens"] for r in ws}
    bpe_tok = {r["url"]: r["pack_tokens"] for r in bpe}
    # 20 merges leave long words split into many subwords
    assert all(bpe_tok[u] > ws_tok[u] for u in ws_tok)
    # capacity invariant on the subword measure: multi-doc bins fit the
    # budget; only oversize singletons may exceed it
    bins = {}
    for r in bpe:
        key = (r["pack_shard"], r["pack_bin"])
        tot, n, any_over = bins.get(key, (0, 0, False))
        bins[key] = (tot + r["pack_tokens"], n + 1, any_over or r["oversize"])
        assert r["oversize"] == (r["pack_tokens"] > 64)
    for tot, n, any_over in bins.values():
        if n > 1:
            assert tot <= 64 and not any_over
        elif tot > 64:
            assert any_over
