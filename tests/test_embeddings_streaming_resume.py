"""Word2Vec embeddings + embedding-cosine dedup; streaming checkpoint
restart (exactly-once file processing across stream restarts)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from harvesttext_spark.operators.embeddings import (
    embed_documents,
    embedding_dup_pairs,
    train_word2vec,
)


@pytest.fixture(scope="module")
def embedded(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog".split()),
        (1, "the quick brown fox jumps over the lazy dog".split()),  # dup
        (2, "the quick brown fox leaps over the lazy dog".split()),  # near
        (3, "spark engines shuffle data across many executors".split()),
    ] + [(10 + i, f"filler doc number {i} with common words the and of".split()) for i in range(20)]
    docs = spark.createDataFrame(rows, "doc_id long, words array<string>")
    model = train_word2vec(docs, dim=16, min_count=1)
    return embed_documents(model, docs).cache()


def test_embed_documents_shape(embedded):
    row = embedded.first()
    assert len(row["embedding"]) == 16


def test_embedding_dup_pairs(embedded):
    pairs = {
        (r["id_a"], r["id_b"]): r["cos_sim"]
        for r in embedding_dup_pairs(embedded, dim=16, min_cos=0.999).collect()
    }
    assert pairs[(0, 1)] == pytest.approx(1.0)  # identical docs
    assert (0, 3) not in pairs


def test_streaming_checkpoint_restart(spark, tmp_path):
    """Exactly-once across restarts: files processed before the stop are
    not reprocessed when the stream restarts from the checkpoint."""
    from harvesttext_spark.pipeline.pages import PAGES_SCHEMA

    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    def write_batch(tag, n):
        pdf = pd.DataFrame(
            {
                "url": [f"https://x.com/{tag}/{i}" for i in range(n)],
                "warc_ts": pd.to_datetime(["2024-01-01"] * n),
                "html": [b""] * n,
                "text": [f"document body {tag} {i} with enough text here" for i in range(n)],
                "lang": ["en"] * n,
            }
        )
        spark.createDataFrame(pdf, PAGES_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    def run_once():
        from harvesttext_spark.streaming.stream_filter import streaming_quality_filter

        q = (
            streaming_quality_filter(spark, src)
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .start()
        )
        q.processAllAvailable()
        q.stop()

    write_batch("a", 5)
    run_once()
    assert spark.read.parquet(sink).count() == 5

    write_batch("b", 3)
    run_once()
    out = spark.read.parquet(sink)
    assert out.count() == 8  # 5 + 3, nothing reprocessed
    assert out.select("url").distinct().count() == 8


def test_real_bmp_pipeline(spark):
    """REAL (no-dependency) image path: BMP synth -> decode stats ->
    resize -> grayscale features, all byte-level real, not fakes."""
    import numpy as np

    from harvesttext_spark.sources.multimodal import (
        decode_bmp,
        decode_image_stats,
        encode_bmp,
        image_grayscale_features,
        resize_images,
        synth_bmp_table,
    )

    imgs = synth_bmp_table(spark, n=12, seed=7).cache()
    stats = {r.item_id: r for r in decode_image_stats(imgs).collect()}
    assert len(stats) == 12
    assert all(8 <= r.width < 64 and 8 <= r.height < 64 for r in stats.values())
    assert all(0.0 <= r.mean_r <= 255.0 for r in stats.values())

    small = resize_images(imgs, max_side=16)
    sstats = {r.item_id: r for r in decode_image_stats(small).collect()}
    assert all(r.width <= 16 and r.height <= 16 for r in sstats.values())

    feats = {r.item_id: r.features for r in image_grayscale_features(imgs).collect()}
    v = np.array(feats[0])
    assert abs(float(np.linalg.norm(v)) - 1.0) < 1e-5

    # decode is byte-exact: re-encode the decoded pixels reproduces payload
    row = imgs.filter("item_id = 0").first()
    assert encode_bmp(decode_bmp(row.payload)) == bytes(row.payload)

    # non-BMP payload degrades to NULLs, not an error
    junk = spark.createDataFrame([(99, bytearray(b"not a bmp"))], "item_id long, payload binary")
    r = decode_image_stats(junk).first()
    assert r.width is None


def test_real_wav_audio_path(spark):
    """REAL audio path (round 4, stdlib wave — mirrors the BMP story):
    encode/decode round-trips byte-exactly, stats are deterministic,
    downsample halves rates above target, and non-WAV payloads yield
    NULL stats gracefully."""
    import numpy as np

    from harvesttext_spark.sources.multimodal import (
        decode_audio_stats,
        decode_wav,
        downsample_audio_table,
        encode_wav,
        synth_wav_table,
    )

    # pure round-trip
    sig = (np.sin(np.arange(400) / 7.0) * 12000).astype("<i2")
    rate, back = decode_wav(encode_wav(sig, 16000))
    assert rate == 16000 and np.array_equal(back, sig)

    tbl = synth_wav_table(spark, n=20, seed=11)
    stats = {r["item_id"]: r for r in decode_audio_stats(tbl).collect()}
    assert len(stats) == 20
    assert all(r["sample_rate"] in (8000, 16000, 22050) for r in stats.values())
    assert all(r["rms"] > 0 and r["peak"] > 0 for r in stats.values())
    # determinism across partitionings
    stats2 = {
        r["item_id"]: r
        for r in decode_audio_stats(tbl.repartition(5)).collect()
    }
    assert {k: (v["rms"], v["peak"]) for k, v in stats.items()} == {
        k: (v["rms"], v["peak"]) for k, v in stats2.items()
    }
    # downsample: everything lands at <= 8000 with duration preserved ~
    down = decode_audio_stats(downsample_audio_table(tbl, target_rate=8000))
    for r in down.collect():
        assert r["sample_rate"] == 8000 if stats[r["item_id"]]["sample_rate"] >= 8000 else True
        assert abs(r["duration_s"] - stats[r["item_id"]]["duration_s"]) < 0.01
    # graceful non-WAV
    bad = spark.createDataFrame([(99, bytearray(b"not a wav"))], "item_id long, payload binary")
    row = decode_audio_stats(bad).first()
    assert row["sample_rate"] is None and row["rms"] is None


def test_wet_source_reader(spark, tmp_path):
    """Native WET reader: records split by lineSep, headers carved with
    codegen regexes, body CRLF-trimmed; warcinfo preamble dropped; the
    output feeds quality_filter directly (pages-table shape)."""
    from harvesttext_spark.pipeline.quality_filter import quality_filter
    from harvesttext_spark.sources.wet import read_wet, synth_wet_file, write_wet

    p = str(tmp_path / "seg.wet")
    synth_wet_file(p, n=30, seed=3)
    df = read_wet(spark, p)
    rows = {r["url"]: r for r in df.collect()}
    assert len(rows) == 30  # warcinfo record dropped
    r0 = rows["https://wet0.example/p/0"]
    assert r0["warc_ts"] is not None and r0["html"] is None
    assert "second line of the page" in r0["text"]  # multi-line body intact
    assert not r0["text"].endswith("\r\n")          # trailing CRLFs trimmed
    # hand-built record: exact byte-level expectations
    p2 = str(tmp_path / "one.wet")
    write_wet([("https://x.example/a", "2024-02-03T04:05:06Z",
                "hello world\r\nline two")], p2)
    (one,) = read_wet(spark, p2).collect()
    assert one["text"] == "hello world\r\nline two"
    assert str(one["warc_ts"]).startswith("2024-02-03 04:05:06")
    # end-to-end: the reader output labels without schema glue
    out = quality_filter(read_wet(spark, p))
    assert out.count() == 30 and "drop_reason" in out.columns


def test_wet_strict_parser_matches_linesep_on_clean_input(spark, tmp_path):
    """Fuzz: on clean segments (no body embeds the version line, bodies
    don't end in CRLF) the Content-Length carver and the lineSep scan
    must agree row-for-row."""
    import random

    from harvesttext_spark.sources.wet import (
        read_wet,
        read_wet_strict,
        synth_wet_file,
        write_wet,
    )

    p = str(tmp_path / "clean.wet")
    synth_wet_file(p, n=40, seed=11)
    key = lambda r: (r["url"], str(r["warc_ts"]), r["text"])
    a = sorted(map(key, read_wet(spark, p).collect()))
    b = sorted(map(key, read_wet_strict(spark, p).collect()))
    assert a == b and len(a) == 40

    # fuzzed bodies: CRLFs mid-body, unicode, long runs — still clean
    rng = random.Random(7)
    rows = []
    for i in range(25):
        parts = []
        for _ in range(rng.randint(1, 6)):
            parts.append(
                "".join(rng.choice("abc xyz 机器 学习 -") for _ in range(rng.randint(1, 60)))
            )
        rows.append(
            (f"https://f.example/{i}", "2024-03-04T05:06:07Z", "\r\n".join(parts))
        )
    p2 = str(tmp_path / "fuzz.wet")
    write_wet(rows, p2)
    a = sorted(map(key, read_wet(spark, p2).collect()))
    b = sorted(map(key, read_wet_strict(spark, p2).collect()))
    assert a == b and len(a) == 25


def test_wet_strict_parser_gunzips_compressed_segments(spark, tmp_path):
    """Real Common-Crawl shards are .warc.wet.gz (multi-member gzip, one
    member per record).  binaryFile does not decompress, so the strict
    carver must gunzip itself — before round 6 compressed input yielded
    ZERO rows silently.  Both single-member and per-record-member gzip
    must match the uncompressed parse row-for-row; the lineSep reader
    handles .gz transparently via Hadoop codecs and must agree too."""
    import gzip

    from harvesttext_spark.sources.wet import (
        read_wet,
        read_wet_strict,
        synth_wet_file,
    )

    p = str(tmp_path / "plain.wet")
    synth_wet_file(p, n=30, seed=5)
    raw = open(p, "rb").read()

    gz1 = str(tmp_path / "single.warc.wet.gz")
    with open(gz1, "wb") as f:
        f.write(gzip.compress(raw, mtime=0))
    # per-record members, like real CC output: split at record starts
    recs = [b"WARC/1.0\r\n" + chunk for chunk in raw.split(b"WARC/1.0\r\n") if chunk]
    gz2 = str(tmp_path / "multi.warc.wet.gz")
    with open(gz2, "wb") as f:
        for r in recs:
            f.write(gzip.compress(r, mtime=0))

    key = lambda r: (r["url"], str(r["warc_ts"]), r["text"])
    base = sorted(map(key, read_wet_strict(spark, p).collect()))
    assert len(base) == 30
    assert sorted(map(key, read_wet_strict(spark, gz1).collect())) == base
    assert sorted(map(key, read_wet_strict(spark, gz2).collect())) == base
    assert sorted(map(key, read_wet(spark, gz1).collect())) == base


def test_wet_strict_parser_survives_embedded_version_line(spark, tmp_path):
    """The adversarial case the lineSep scan documents as its limit: a
    body that EMBEDS the exact record-start bytes.  The strict parser
    carves by Content-Length and keeps the body intact; the lineSep scan
    splits the record early (pinned here so the divergence stays
    visible)."""
    from harvesttext_spark.sources.wet import read_wet, read_wet_strict, write_wet

    evil_body = "before the bomb\r\nWARC/1.0\r\nWARC-Target-URI: https://fake.example/x\r\n\r\nafter"
    rows = [
        ("https://ok.example/1", "2024-01-01T00:00:00Z", "plain first record"),
        ("https://evil.example/2", "2024-01-02T00:00:00Z", evil_body),
        ("https://ok.example/3", "2024-01-03T00:00:00Z", "plain last record"),
    ]
    p = str(tmp_path / "evil.wet")
    write_wet(rows, p)

    strict = {r["url"]: r["text"] for r in read_wet_strict(spark, p).collect()}
    assert strict == {u: t for (u, _d, t) in rows}  # bodies byte-intact

    loose = {r["url"] for r in read_wet(spark, p).collect()}
    assert "https://fake.example/x" in loose  # lineSep splits early: documented
