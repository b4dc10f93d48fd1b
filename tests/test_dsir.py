"""DSIR importance resampling (operators/dsir.py): pure-python reference
parity, partitioning determinism, the target-upweights property, edge
modes, and the broadcast plan shape."""

import hashlib
import math
import re

import pytest
from pyspark.sql import functions as F

from harvesttext_spark.operators.dsir import (
    N_BUCKETS,
    dsir_threshold_select,
    dsir_topk,
    dsir_weights,
)

RAW = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "quality data makes quality models train well"),
    (3, "spark shuffles the hash join across partitions"),
    (4, "quality text selection by importance weights"),
    (5, "the dog sleeps"),
    (6, None),
    (7, ""),
    (8, "one"),
]
TARGET_IDS = {2, 4}  # the "quality" docs


def _tokens(text):
    if text is None:
        return []
    return [t for t in re.split("[ \t\n\x0b\f\r]+", text.lower()) if t != ""]


def _bucket(feat):
    return int(hashlib.md5(feat.encode()).hexdigest()[:8], 16) % N_BUCKETS


def _features(text):
    toks = _tokens(text)
    feats = list(toks)
    feats += [f"{a} {b}" for a, b in zip(toks, toks[1:])]
    return [_bucket(f) for f in feats]


def _py_weights(raw_rows, target_rows, alpha=1.0):
    """Reference implementation straight from the paper's formula."""
    rc, tc = {}, {}
    for _, text in raw_rows:
        for b in _features(text):
            rc[b] = rc.get(b, 0) + 1
    for _, text in target_rows:
        for b in _features(text):
            tc[b] = tc.get(b, 0) + 1
    r_tot, t_tot = sum(rc.values()), sum(tc.values())
    ab = alpha * N_BUCKETS
    out = {}
    for doc_id, text in raw_rows:
        w = 0.0
        for b in _features(text):
            w += math.log((tc.get(b, 0) + alpha) / (t_tot + ab)) - math.log(
                (rc[b] + alpha) / (r_tot + ab)
            )
        out[doc_id] = w
    return out


def _gumbel(doc_id, seed=42):
    v = int(hashlib.md5(f"{seed}:{doc_id}".encode()).hexdigest()[:15], 16)
    u = (float(v) + 0.5) / float(1 << 60)
    return -math.log(-math.log(u))


def _raw_df(spark, parts=4):
    return spark.createDataFrame(RAW, "doc_id bigint, text string").repartition(parts)


def _target_df(spark, parts=2):
    rows = [r for r in RAW if r[0] in TARGET_IDS]
    return spark.createDataFrame(rows, "doc_id bigint, text string").repartition(parts)


def test_weights_match_python_reference(spark):
    got = {
        r["doc_id"]: r["logw"]
        for r in dsir_weights(_raw_df(spark), _target_df(spark)).collect()
    }
    want = _py_weights(RAW, [r for r in RAW if r[0] in TARGET_IDS])
    assert set(got) == set(want)
    for doc_id in want:
        assert got[doc_id] == pytest.approx(want[doc_id], abs=1e-9), doc_id


def test_featureless_docs_get_zero_weight(spark):
    got = {
        r["doc_id"]: (r["logw"], r["n_feats"])
        for r in dsir_weights(_raw_df(spark), _target_df(spark)).collect()
    }
    for doc_id in (6, 7):
        assert got[doc_id] == (0.0, 0)
    assert got[8][1] == 1  # single token: unigram only, no bigram


def test_target_docs_upweighted(spark):
    """Docs sharing the target's vocabulary must outscore docs that
    don't — the operator's whole point."""
    got = {
        r["doc_id"]: r["logw"]
        for r in dsir_weights(_raw_df(spark), _target_df(spark)).collect()
    }
    quality_docs = {2, 4}
    others = {1, 3, 5}
    assert min(got[d] for d in quality_docs) > max(got[d] for d in others)


def test_weights_partitioning_invariant(spark):
    a = sorted(
        map(tuple, dsir_weights(_raw_df(spark, 1), _target_df(spark, 1)).collect())
    )
    b = sorted(
        map(tuple, dsir_weights(_raw_df(spark, 7), _target_df(spark, 3)).collect())
    )
    assert a == b


def test_topk_matches_python_reference(spark):
    out = dsir_topk(_raw_df(spark), _target_df(spark), k=3).collect()
    assert len(out) == 3
    want_w = _py_weights(RAW, [r for r in RAW if r[0] in TARGET_IDS])
    keys = sorted(
        ((want_w[d] + _gumbel(d), d) for d, _ in RAW), key=lambda t: (-t[0], t[1])
    )
    want_ids = [d for _, d in keys[:3]]
    assert [r["doc_id"] for r in out] == want_ids
    for r in out:
        assert r["logw"] == pytest.approx(round(want_w[r["doc_id"]], 4), abs=1e-9)
        assert r["gkey"] == pytest.approx(
            round(want_w[r["doc_id"]] + _gumbel(r["doc_id"]), 4), abs=1e-9
        )


def test_topk_k_exceeds_corpus(spark):
    out = dsir_topk(_raw_df(spark), _target_df(spark), k=100).collect()
    assert len(out) == len(RAW)


def test_threshold_select_modes(spark):
    full = dsir_threshold_select(_raw_df(spark), _target_df(spark), 1.0)
    rows = full.collect()
    assert len(rows) == len(RAW)
    assert all(r["dsir_keep"] for r in rows)
    assert set(full.columns) >= {"doc_id", "text", "logw", "dsir_keep"}

    half = dsir_threshold_select(_raw_df(spark), _target_df(spark), 0.5).collect()
    kept = {r["doc_id"] for r in half if r["dsir_keep"]}
    # kept set must be a PREFIX of the full key ranking (threshold rule)
    want_w = _py_weights(RAW, [r for r in RAW if r[0] in TARGET_IDS])
    ranked = sorted(RAW, key=lambda r: (-(want_w[r[0]] + _gumbel(r[0])), r[0]))
    assert kept == {d for d, _ in ranked[: len(kept)]}

    with pytest.raises(ValueError):
        dsir_threshold_select(_raw_df(spark), _target_df(spark), 0.0)


def test_ratio_join_is_broadcast(spark):
    """The B-row log-ratio table must reach the feature stream as a
    broadcast hash join — a shuffle join on `bucket` here would move the
    whole exploded feature stream at 100 TB."""
    plan = dsir_weights(_raw_df(spark), _target_df(spark))._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
