"""KB interchange format, idempotent resume, streaming, multimodal."""

import os

import pytest
from pyspark.sql import functions as F

from harvesttext_spark.pipeline.pages import synthesize_pages
from harvesttext_spark.pipeline.resume import committed_buckets, run_with_resume
from harvesttext_spark.sources.kb_io import (
    load_kb,
    save_entity_text,
    triples_from_text,
)
from harvesttext_spark.sources.multimodal import (
    decode_metadata,
    extract_features,
    sample_frames,
    synth_multimodal,
)


def test_kb_text_roundtrip(tmp_path):
    triples = [
        ("武磊", "武磊", "球员"),
        ("武球王", "武磊", "球员"),
        ("上港", "上海上港", "球队"),
        ("上海上港", "上海上港", "球队"),
    ]
    p = str(tmp_path / "ents.txt")
    save_entity_text(triples, p)
    back = triples_from_text(p)
    assert sorted(back) == sorted(triples)
    # format parity: line looks like 'entity||type mention||type'
    line = [l for l in open(p, encoding="utf-8") if l.startswith("武磊")][0]
    assert line.strip() == "武磊||球员 武球王||球员"


def test_load_kb_from_text(spark, tmp_path):
    p = str(tmp_path / "ents.txt")
    save_entity_text([("武球王", "武磊", "球员"), ("武磊", "武磊", "球员")], p)
    kb = load_kb(spark, text_path=p)
    assert kb.link("武球王来了")[0][2] == "武磊"


def test_kb_parquet_roundtrip(spark, tmp_path):
    """save/load analog of saveHT/loadHT: KB -> parquet dimension -> KB
    produces identical links (and clear() == fresh instance)."""
    from harvesttext_spark.sources.kb_io import mentions_df, save_kb_parquet

    triples = [("武磊", "武磊", "球员"), ("武球王", "武磊", "球员")]
    p = str(tmp_path / "kb.parquet")
    save_kb_parquet(mentions_df(spark, triples), p)
    kb = load_kb(spark, parquet_path=p)
    assert [s[2] for s in kb.link("武球王和武磊")] == ["武磊", "武磊"]


def test_resume_idempotent(spark, tmp_path):
    out = str(tmp_path / "out")
    pages = synthesize_pages(spark, n=400, seed=11, partitions=4)

    # run 1: only 3 buckets (simulated interruption)
    r1 = run_with_resume(spark, pages, out, n_buckets=8, max_buckets_this_run=3)
    assert len(r1["processed"]) == 3
    assert sorted(committed_buckets(spark, out)) == sorted(r1["processed"])

    # run 2: resumes with the rest, skipping committed buckets
    r2 = run_with_resume(spark, pages, out, n_buckets=8)
    assert set(r1["processed"]).isdisjoint(r2["processed"])
    assert r2["skipped"] == 3

    # run 3: nothing left
    r3 = run_with_resume(spark, pages, out, n_buckets=8)
    assert r3["processed"] == []

    # final output == single-shot ground truth, no dups no gaps
    data = spark.read.parquet(os.path.join(out, "data"))
    assert data.count() == 400
    assert data.select("url").distinct().count() == 400
    manifest = spark.read.parquet(os.path.join(out, "manifest"))
    assert manifest.agg(F.sum("n_docs")).first()[0] == 400


def test_streaming_quality_filter(spark, tmp_path):
    from harvesttext_spark.streaming.stream_filter import (
        run_stream_to_memory,
        streaming_quality_filter,
    )

    src = str(tmp_path / "pages_stream")
    synthesize_pages(spark, n=200, seed=5, partitions=2).write.mode("overwrite").parquet(src)
    out = streaming_quality_filter(spark, src)
    assert out.isStreaming
    run_stream_to_memory(out, "sqf")
    got = spark.sql("SELECT count(*) c, sum(CAST(keep AS INT)) k FROM sqf").first()
    assert got["c"] == 200 and 0 < got["k"] < 200


def test_streaming_event_counts(spark, tmp_path):
    from harvesttext_spark.streaming.stream_filter import (
        run_stream_to_memory,
        streaming_event_counts,
    )

    src = str(tmp_path / "events_stream")
    spark.read.parquet("/root/testdata/sf0.001/events.parquet").write.mode(
        "overwrite"
    ).parquet(src)
    agg = streaming_event_counts(spark, src, window="1 hour")
    run_stream_to_memory(agg, "sec", mode="complete")
    batch = spark.sql("SELECT sum(n) FROM sec").first()[0]
    assert batch == 1000  # every event lands in exactly one window


def test_multimodal_pipeline(spark):
    mm = synth_multimodal(spark, n=60, seed=42).cache()
    assert mm.count() == 60
    meta = decode_metadata(mm)
    rows = meta.filter("width IS NULL").count()
    assert rows == 0
    feats = extract_features(mm).select("item_id", "features").collect()
    by_id = {r["item_id"]: r["features"] for r in feats}
    assert all(len(v) == 16 for v in by_id.values())
    # determinism
    feats2 = extract_features(synth_multimodal(spark, n=60, seed=42)).collect()
    assert {r["item_id"]: r["features"] for r in feats2} == by_id
    frames = sample_frames(mm.filter("modality = 'video'"))
    assert frames.count() > 0
    assert frames.filter("frame_idx % 2 != 0").count() == 0


def test_multimodal_real_engine_stubbed(spark):
    mm = synth_multimodal(spark, n=5)
    with pytest.raises(NotImplementedError):
        decode_metadata(mm, engine="real")


def test_snapshot_log_time_travel(spark, tmp_path):
    """Iceberg-style snapshot log: each run commits an atomic snapshot;
    read_as_of(v1) sees only the first run's buckets (time travel), the
    default read sees everything; snapshot lineage chains via parent_id."""
    from harvesttext_spark.pipeline.pages import synthesize_pages
    from harvesttext_spark.pipeline.resume import (
        list_snapshots,
        read_as_of,
        run_with_resume,
    )

    out = str(tmp_path / "snapout")
    pages = synthesize_pages(spark, n=400, seed=5, partitions=4)
    r1 = run_with_resume(spark, pages, out, n_buckets=8, max_buckets_this_run=3)
    r2 = run_with_resume(spark, pages, out, n_buckets=8)
    assert r1["snapshot_id"] == 1 and r2["snapshot_id"] == 2

    snaps = list_snapshots(out)
    assert [s["snapshot_id"] for s in snaps] == [1, 2]
    assert snaps[1]["parent_id"] == 1
    assert set(snaps[0]["buckets_total"]) == set(r1["processed"])
    assert set(snaps[1]["buckets_total"]) == set(r1["processed"]) | set(r2["processed"])

    v1 = read_as_of(spark, out, snapshot_id=1)
    cur = read_as_of(spark, out)
    assert set(r["bucket"] for r in v1.select("bucket").distinct().collect()) == set(
        r1["processed"]
    )
    assert cur.count() == 400
    assert v1.count() < 400

    # a third run is a no-op but still yields a consistent current pointer
    r3 = run_with_resume(spark, pages, out, n_buckets=8)
    assert r3["processed"] == []
    assert read_as_of(spark, out).count() == 400


def test_streaming_enrich_domains(spark, tmp_path):
    """Stream-static broadcast enrichment: denylisted domains dropped
    before labeling, reputation carried through."""
    import pandas as pd

    from harvesttext_spark.pipeline.pages import PAGES_SCHEMA
    from harvesttext_spark.streaming.stream_filter import (
        run_stream_to_memory,
        streaming_enrich_domains,
    )

    src = str(tmp_path / "pages_src")
    pdf = pd.DataFrame(
        {
            "url": [
                "https://good.com/a", "https://bad.com/b", "https://good.com/c",
            ],
            "warc_ts": pd.to_datetime(["2024-01-01"] * 3),
            "html": [b""] * 3,
            "text": ["a decent document body with plenty of text here ok"] * 3,
            "lang": ["en"] * 3,
        }
    )
    spark.createDataFrame(pdf, PAGES_SCHEMA).coalesce(1).write.parquet(src)
    dim = spark.createDataFrame(
        [("bad.com", "deny"), ("good.com", "trusted")], "domain string, reputation string"
    )
    out = streaming_enrich_domains(spark, src, dim)
    run_stream_to_memory(out, "enrich")
    rows = {r.url: r for r in spark.sql("SELECT * FROM enrich").collect()}
    assert set(rows) == {"https://good.com/a", "https://good.com/c"}
    assert all(r.reputation == "trusted" for r in rows.values())


def test_streaming_click_attribution(spark, tmp_path):
    """Stream-stream interval join: clicks attach to the same user's view
    within the window; out-of-window or cross-user clicks don't."""
    import pandas as pd

    from harvesttext_spark.streaming.stream_filter import (
        EVENTS_SCHEMA,
        run_stream_to_memory,
        streaming_click_attribution,
    )

    src = str(tmp_path / "events_src")
    t0 = pd.Timestamp("2024-01-01 10:00:00")
    rows = [
        (1, t0, 100, "view", 1.0, ""),
        (2, t0 + pd.Timedelta("10 minutes"), 100, "click", 1.0, ""),   # attributed
        (3, t0 + pd.Timedelta("50 minutes"), 100, "click", 1.0, ""),   # outside 30m window
        (4, t0 + pd.Timedelta("5 minutes"), 200, "click", 1.0, ""),    # other user, no view
    ]
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    spark.createDataFrame(pdf, EVENTS_SCHEMA).coalesce(1).write.parquet(src)
    out = streaming_click_attribution(spark, src)
    run_stream_to_memory(out, "attrib")
    got = [
        (r.user_id, r.view_id, r.click_id)
        for r in spark.sql("SELECT * FROM attrib").collect()
    ]
    assert got == [(100, 1, 2)]


def test_expire_snapshots(spark, tmp_path):
    """Snapshot expiry keeps the newest N + the current pointer target;
    time travel to surviving snapshots still works (cumulative states,
    not deltas — expiring ancestors orphans nothing)."""
    from harvesttext_spark.pipeline.pages import synthesize_pages
    from harvesttext_spark.pipeline.resume import (
        expire_snapshots,
        list_snapshots,
        read_as_of,
        run_with_resume,
    )

    out = str(tmp_path / "exp")
    pages = synthesize_pages(spark, n=200, seed=21)
    for _ in range(5):  # five runs -> five snapshots (2 buckets each)
        run_with_resume(spark, pages, out, n_buckets=10, max_buckets_this_run=2)
    assert [s["snapshot_id"] for s in list_snapshots(out)] == [1, 2, 3, 4, 5]
    expired = expire_snapshots(out, keep_last=2)
    assert expired == [1, 2, 3]
    assert [s["snapshot_id"] for s in list_snapshots(out)] == [4, 5]
    # survivors stay readable and cumulative
    n4 = read_as_of(spark, out, 4).count()
    n5 = read_as_of(spark, out, 5).count()
    assert 0 < n4 < n5 == 200
    # idempotent / bounded
    assert expire_snapshots(out, keep_last=2) == []
