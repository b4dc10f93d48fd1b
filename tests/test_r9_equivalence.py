"""Round-9 optimization equivalence pins.

Each r9 rewrite that changed an operator's INTERNALS (not its values)
gets a dedicated equivalence test against the pre-rewrite formulation,
beyond the DuckDB oracles that already pin the end-to-end values:

* substring census token hashing: numpy char-position fold vs the
  scalar per-char reference fold (bit-identical int64 output).
* langid char-trigram stream: split('')+slices+arrays_zip vs the old
  transform(sequence, substr) expression (row-identical buckets,
  including astral-plane / CJK / empty / NULL inputs).
* classifier/dsir/LM gram streams: slice+arrays_zip+concat vs the old
  transform/zip_with lambdas (identical gram multisets).
"""

from __future__ import annotations

import random
import string

import numpy as np
import pytest
from pyspark.sql import functions as F


def _scalar_token_hashes(tokens):
    from harvesttext_spark.operators.substring_dedup import (
        SS_CHAR_BASE,
        SS_MODS,
    )

    out = np.empty((len(tokens), len(SS_MODS)), dtype=np.int64)
    for j, tok in enumerate(tokens):
        for k, m in enumerate(SS_MODS):
            acc = 0
            for c in tok:
                acc = (acc * SS_CHAR_BASE + ord(c)) % m
            out[j, k] = acc
    return out


def test_token_hash_vectorization_bit_identical():
    from harvesttext_spark.operators.substring_dedup import _token_hashes

    rng = random.Random(1)
    toks = (
        ["hello", "世界和平abc", "x", "a" * 300, "é😀z", "\t", "0"]
        + [
            "".join(rng.choices(string.printable.strip() + "中文éß😀", k=rng.randint(1, 40)))
            for _ in range(1500)
        ]
    ) * 2  # duplicates exercise the memo path
    rng.shuffle(toks)
    got = _token_hashes(toks, {})
    want = _scalar_token_hashes(toks)
    assert (got == want).all()
    # incremental calls sharing one cache (census batch behavior)
    cache = {}
    a = _token_hashes(toks[:50], cache)
    b = _token_hashes(toks, cache)
    assert (a == want[:50]).all() and (b == want).all()


def test_langid_trigram_codegen_matches_substr_lambda(spark):
    from harvesttext_spark.operators.langid_model import (
        MAX_GRAMS_PER_DOC,
        _feature_rows,
    )

    rows = [
        (1, "hello world"),
        (2, "ab"),
        (3, ""),
        (4, None),
        (5, "日本語テキストです"),
        (6, "mix 中文 latin"),
        (7, "😀x😀yz"),
        (8, "x" * 500),  # exercises the MAX_GRAMS_PER_DOC cap
        (9, "é" * 3),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    new = _feature_rows(df, "text", ["doc_id"]).orderBy("doc_id", "bucket").collect()
    # the pre-r9 expression, verbatim
    lowered = df.select("doc_id", F.lower(F.col("text")).alias("_lt"))
    n = F.length("_lt")
    tris = F.when(
        n >= 3,
        F.transform(
            F.sequence(F.lit(1), F.least(n - 2, F.lit(MAX_GRAMS_PER_DOC))),
            lambda i: F.col("_lt").substr(i, F.lit(3)),
        ),
    ).otherwise(F.array(F.col("_lt")))
    old = (
        lowered.select("doc_id", F.explode(tris).alias("_tri"))
        .select(
            "doc_id",
            (F.conv(F.substring(F.md5("_tri"), 1, 8), 16, 10).cast("bigint") % 16384)
            .cast("int")
            .alias("bucket"),
        )
        .orderBy("doc_id", "bucket")
        .collect()
    )
    assert new == old


@pytest.mark.parametrize("sep", ["_", " "])
def test_gram_pair_stream_matches_lambda(spark, sep):
    """slice+arrays_zip+concat pair stream == transform(concat_ws) pair
    stream, as multisets per doc (the aggregation consumers are
    order-independent)."""
    rows = [
        (1, "a b c d"),
        (2, "single"),
        (3, ""),
        (4, None),
        (5, "x " * 250),  # beyond the 200-word cap
        (6, "中文 词 流 test"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    if sep == "_":
        from harvesttext_spark.operators.quality_classifier import (
            N_BUCKETS,
            _gram_rows,
        )

        new = _gram_rows(df, "text", ["doc_id"])
    else:
        from harvesttext_spark.operators.dsir import N_BUCKETS, _word_feature_rows

        new = _word_feature_rows(df, "text", ["doc_id"])
    got = sorted(
        tuple(r) for r in new.select("doc_id", "bucket").collect()
    )
    # reference: explicit python tokenization + gram build, same md5 rule
    import hashlib

    want = []
    for doc_id, text in rows:
        t = (text or "").lower()
        toks = [w for w in __import__("re").split("[ \t\n\x0b\f\r]+", t) if w != ""]
        if sep == "_":
            toks = toks[:200]
        grams = list(toks) + [f"{a}{sep}{b}" for a, b in zip(toks, toks[1:])]
        for g in grams:
            h = int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % N_BUCKETS
            want.append((doc_id, h))
    assert got == sorted(want)
