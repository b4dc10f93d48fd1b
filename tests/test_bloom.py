"""Bloom-filter seen-URL state (round-7, VERDICT r6 next-round #3).

Pins the two contractual properties of ``streaming_url_dedup_bloom``:
  * NO FALSE DROPS on a fixture sized under capacity — the bloom variant
    emits exactly the same first-seen set as the exact operator;
  * no false negatives ever — a true duplicate is never re-emitted, even
    across checkpoint restarts (state bytes persist in the state store).
Plus the pure-python BloomFilter invariants the streaming operator
relies on (determinism, serialization round-trip, measured FP rate at
the theoretical bound).
"""

import pandas as pd
import pytest

from harvesttext_spark.functions.bloom import (
    BloomFilter,
    bloom_params,
    expected_fp_rate,
)

PAGES_DDL = "url string, warc_ts timestamp, html binary, text string, lang string"


# ---------------------------------------------------------------- unit


def test_bloom_params_standard_sizing():
    m, k = bloom_params(1_000_000, 1e-4)
    # ~19.17 bits/element and k ~= 13 at p=1e-4 (standard formulae)
    assert 19.0 <= m / 1_000_000 <= 19.5
    assert k == 13
    assert expected_fp_rate(m, k, 1_000_000) <= 1.2e-4


def test_bloom_params_validation():
    with pytest.raises(ValueError):
        bloom_params(0, 0.01)
    with pytest.raises(ValueError):
        bloom_params(100, 1.5)


def test_no_false_negatives_and_determinism():
    keys = [f"https://site{i}.com/page{i * 7}" for i in range(2000)]
    a = BloomFilter.for_capacity(4000, 1e-3)
    b = BloomFilter.for_capacity(4000, 1e-3)
    for key in keys:
        assert a.test_and_add(key) is False  # first insert: not seen
        b.add(key)
    for key in keys:
        assert key in a  # no false negatives, ever
        assert a.test_and_add(key) is True  # re-insert reports seen
    # same insert sequence -> bit-identical state (resume determinism)
    assert a.to_bytes() == b.to_bytes()


def test_serialization_round_trip():
    f = BloomFilter.for_capacity(500, 1e-3)
    for i in range(300):
        f.add(f"k{i}")
    g = BloomFilter(f.m, f.k, bits=f.to_bytes())
    assert g.to_bytes() == f.to_bytes()
    assert all(f"k{i}" in g for i in range(300))
    with pytest.raises(ValueError):
        BloomFilter(f.m + 8, f.k, bits=f.to_bytes())  # wrong-size state


def test_measured_fp_rate_near_theory():
    cap, p = 2000, 1e-2
    f = BloomFilter.for_capacity(cap, p)
    for i in range(cap):
        f.add(f"inserted-{i}")
    novel = [f"novel-{i}" for i in range(20000)]
    fp = sum(1 for key in novel if key in f) / len(novel)
    # at capacity the realized rate should sit near theory; 3x slack
    assert fp <= 3 * expected_fp_rate(f.m, f.k, cap)
    assert 0.2 < f.fill_ratio < 0.6  # ~ln2 fill at capacity


# ----------------------------------------------------------- streaming


def _write_pages(spark, path, urls, tag, mode="overwrite"):
    pdf = pd.DataFrame(
        {
            "url": urls,
            "warc_ts": pd.to_datetime("2024-01-01")
            + pd.to_timedelta(range(len(urls)), unit="s"),
            "html": [b""] * len(urls),
            "text": [f"{tag}{i}" for i in range(len(urls))],
            "lang": ["en"] * len(urls),
        }
    )
    spark.createDataFrame(pdf, PAGES_DDL).coalesce(1).write.mode(mode).parquet(path)


def test_streaming_bloom_no_false_drop_matches_exact(spark, tmp_path):
    """Under capacity, the bloom variant's emissions == the exact
    operator's first-seen set (same canonical keys, same survivors)."""
    from harvesttext_spark.streaming.stream_filter import (
        run_stream_to_memory,
        streaming_url_dedup,
        streaming_url_dedup_bloom,
    )

    src = str(tmp_path / "src")
    urls = [
        "https://a.com/p?utm_source=x",
        "HTTPS://A.com/p#frag",
        "https://a.com/p",
        "https://b.com/q",
        "https://b.com/q?gclid=z",
        "https://c.com/r",
    ] + [f"https://site{i}.com/x" for i in range(40)]
    _write_pages(spark, src, urls, "t")

    run_stream_to_memory(streaming_url_dedup(spark, src), "bloom_exact")
    run_stream_to_memory(
        streaming_url_dedup_bloom(spark, src, shards=4, capacity_per_shard=10_000),
        "bloom_approx",
    )
    exact = {
        (r["curl"], r["text"])
        for r in spark.sql("SELECT curl, text FROM bloom_exact").collect()
    }
    approx = {
        (r["curl"], r["text"])
        for r in spark.sql("SELECT curl, text FROM bloom_approx").collect()
    }
    assert approx == exact  # zero false drops, identical survivors
    assert len(approx) == 43  # 3 canonical groups collapse + 40 distinct


def test_streaming_bloom_state_survives_restart(spark, tmp_path):
    """A duplicate arriving AFTER a checkpointed restart is still
    suppressed: the bloom bit arrays persist in the state store."""
    from harvesttext_spark.streaming.stream_filter import (
        streaming_url_dedup_bloom,
    )

    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    def run_once():
        q = (
            streaming_url_dedup_bloom(
                spark, src, shards=2, capacity_per_shard=1000
            )
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .start()
        )
        q.processAllAvailable()
        q.stop()

    _write_pages(spark, src, ["https://a.com/1", "https://a.com/2"], "a")
    run_once()
    assert spark.read.parquet(sink).count() == 2

    # second file: one dup of a pre-restart URL + one novel
    _write_pages(
        spark, src, ["https://a.com/1?utm_source=z", "https://a.com/3"], "b",
        mode="append",
    )
    run_once()
    out = spark.read.parquet(sink)
    assert out.count() == 3  # dup suppressed across the restart
    assert sorted(r["curl"] for r in out.collect()) == [
        "https://a.com/1",
        "https://a.com/2",
        "https://a.com/3",
    ]
