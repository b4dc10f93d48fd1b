"""Structured Streaming surfaces.

The reference is batch-only; these are the engine's streaming variants:
  * ``streaming_quality_filter`` — the full scrub+label pipeline over a
    file stream.  Every stage is map-side (Arrow UDF + column expressions),
    so it lifts to streaming unchanged; exactly-once comes from the
    checkpointLocation + idempotent file sink.
  * ``streaming_event_counts`` — watermarked sliding-window aggregation
    over the events stream (late data bounded by the watermark).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from harvesttext_spark.pipeline.pages import PAGES_SCHEMA
from harvesttext_spark.pipeline.quality_filter import label, scrub


def streaming_quality_filter(spark: SparkSession, input_dir: str) -> DataFrame:
    """readStream over a pages parquet directory -> labeled stream.
    Caller attaches the sink (memory for tests, parquet+checkpoint in
    production via ``.writeStream.option('checkpointLocation', ...)``)."""
    pages = (
        spark.readStream.schema(PAGES_SCHEMA).parquet(input_dir)
    )
    out = label(scrub(pages.withColumn("raw_text", F.coalesce("text", F.decode("html", "UTF-8")))))
    return out.select("url", "lang_pred", "text_clean", "keep", "drop_reason")


EVENTS_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, event_type string, "
    "value double, props string"
)


def streaming_event_counts(
    spark: SparkSession,
    input_dir: str,
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "2 hours",
) -> DataFrame:
    events = spark.readStream.schema(EVENTS_SCHEMA).parquet(input_dir)
    w = F.window("ts", window, slide) if slide else F.window("ts", window)
    return (
        events.withWatermark("ts", watermark)
        .groupBy(w.alias("win"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("sum_value"))
        .select("win.start", "win.end", "event_type", "n", "sum_value")
    )


def streaming_sessionize(
    spark: SparkSession, input_dir: str, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Native streaming sessionization: ``session_window`` gap-merges each
    user's events; watermark bounds state (the streaming sibling of the
    batch lag-window sessionize in __spark_entry__)."""
    events = spark.readStream.schema(EVENTS_SCHEMA).parquet(input_dir)
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("win"), "user_id")
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("sum_value"))
        .select("user_id", "win.start", "win.end", "n_events", "sum_value")
    )


def streaming_exact_dedup(spark: SparkSession, input_dir: str) -> DataFrame:
    """Custom STATEFUL streaming operator: emit each document only the
    first time its text digest appears, keeping the seen-digest set in
    per-group state (``applyInPandasWithState``).  Groups by digest so
    state per key is one flag — the streaming analog of exact dedup."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    pages = spark.readStream.schema(PAGES_SCHEMA).parquet(input_dir)
    keyed = pages.withColumn("digest", F.md5(F.coalesce("text", F.lit(""))))

    def first_only(key, pdfs, state):
        # Concatenate ALL chunks before picking the min-url survivor:
        # taking the first non-empty chunk would make the survivor depend
        # on chunk iteration order (nondeterministic — breaks the repo's
        # resume-determinism rule).  State is one flag per digest and is
        # deliberately unbounded (NoTimeout): exact dedup must remember
        # every digest forever; production bounds it with a digest TTL
        # (processing-time timeout) when eventual re-emission is allowed.
        if state.exists:
            return iter(())
        # materialize BEFORE the truthiness test: the pdfs iterator object
        # is always truthy, so `if pdfs` never guards pd.concat([]) (which
        # raises ValueError on zero chunks, e.g. a future timeout config)
        chunks = list(pdfs)
        all_rows = pd.concat(chunks, ignore_index=True) if chunks else pd.DataFrame()
        state.update((1,))
        if len(all_rows) == 0:
            return iter(())
        first = all_rows.sort_values("url").iloc[[0]][["digest", "url", "text"]]
        return iter((first,))

    return keyed.groupBy("digest").applyInPandasWithState(
        first_only,
        outputStructType="digest string, url string, text string",
        stateStructType="seen int",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_stream_to_memory(df: DataFrame, name: str, mode: str = "append") -> None:
    """Drive a streaming DF to completion over the currently-available files
    (test harness): memory sink + processAllAvailable.  Windowed aggregations
    use mode='complete' (append would hold rows until the watermark passes,
    which never happens on a finite file set)."""
    q = (
        df.writeStream.outputMode(mode)
        .format("memory")
        .queryName(name)
        .start()
    )
    q.processAllAvailable()
    q.stop()


def streaming_enrich_domains(
    spark: SparkSession, input_dir: str, domain_dim: DataFrame
) -> DataFrame:
    """Stream-STATIC broadcast enrichment: the labeled page stream joined
    with a small domain-reputation dimension (broadcast per micro-batch;
    no state).  Drops pages from denylisted domains before labeling."""
    pages = spark.readStream.schema(PAGES_SCHEMA).parquet(input_dir)
    dom = F.regexp_extract("url", r"https?://([^/]+)/", 1).alias("domain")
    enriched = pages.withColumn("domain", dom).join(
        F.broadcast(domain_dim), "domain", "left"
    )
    keep = enriched.filter(
        F.coalesce(F.col("reputation"), F.lit("ok")) != "deny"
    )
    out = label(scrub(keep.withColumn("raw_text", F.coalesce("text", F.decode("html", "UTF-8")))))
    return out.select("url", "domain", "reputation", "keep", "drop_reason")


def streaming_click_attribution(
    spark: SparkSession,
    input_dir: str,
    watermark: str = "1 hour",
    attribution_window: str = "30 minutes",
) -> DataFrame:
    """Stream-STREAM interval join: 'click' events attributed to the same
    user's preceding 'view' within the attribution window.  Both sides
    watermarked so the join state is bounded (late rows beyond the
    watermark are dropped — the documented Structured Streaming
    contract)."""
    events = spark.readStream.schema(EVENTS_SCHEMA).parquet(input_dir)
    views = (
        events.filter(F.col("event_type") == "view")
        .select(
            F.col("user_id").alias("v_user"),
            F.col("ts").alias("v_ts"),
            F.col("event_id").alias("view_id"),
        )
        .withWatermark("v_ts", watermark)
    )
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
            F.col("event_id").alias("click_id"),
        )
        .withWatermark("c_ts", watermark)
    )
    cond = (
        (F.col("v_user") == F.col("c_user"))
        & (F.col("v_ts") <= F.col("c_ts"))
        & (F.col("c_ts") <= F.col("v_ts") + F.expr(f"INTERVAL {attribution_window}"))
    )
    return views.join(clicks, cond, "inner").select(
        F.col("c_user").alias("user_id"), "view_id", "click_id", "v_ts", "c_ts"
    )


def streaming_url_dedup(spark: SparkSession, input_dir: str) -> DataFrame:
    """Streaming URL-level dedup: emit each page the FIRST time its
    canonical URL (functions/urls.py — utm/fragment/case variants
    collapse) appears; per-key state is one flag.

    Documented semantic difference vs the batch ``drop_url_dups``:
    append-mode streams cannot retract, so the survivor is the
    first-SEEN crawl, not the latest — the batch operator remains the
    backfill/compaction pass that re-picks latest-crawl survivors."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    from harvesttext_spark.functions.urls import canonical_url

    pages = spark.readStream.schema(PAGES_SCHEMA).parquet(input_dir)
    keyed = pages.withColumn("curl", canonical_url(F.col("url")))

    def first_only(key, pdfs, state):
        if state.exists:
            return iter(())
        chunks = list(pdfs)
        all_rows = pd.concat(chunks, ignore_index=True) if chunks else pd.DataFrame()
        state.update((1,))
        if len(all_rows) == 0:
            return iter(())
        # deterministic within the micro-batch: min (warc_ts, url) row
        first = all_rows.sort_values(["warc_ts", "url"]).iloc[[0]][
            ["curl", "url", "warc_ts", "text"]
        ]
        return iter((first,))

    return keyed.groupBy("curl").applyInPandasWithState(
        first_only,
        outputStructType="curl string, url string, warc_ts timestamp, text string",
        stateStructType="seen int",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_url_dedup_bloom(
    spark: SparkSession,
    input_dir: str,
    shards: int = 64,
    capacity_per_shard: int = 1_000_000,
    fp_rate: float = 1e-4,
) -> DataFrame:
    """BOUNDED-state streaming URL dedup (round-7, VERDICT r6 #3): the
    exact operator above keeps one state-store row per distinct
    canonical URL — unbounded at crawl scale.  This variant shards the
    canonical-URL space by hash into ``shards`` groups and keeps ONE
    Bloom bit array per shard as binary state: total state is fixed at
    ``shards * m_bits/8`` bytes regardless of how many URLs stream
    through (defaults: 64 shards x 1M capacity @ 1e-4 -> ~154 MB for
    64M URLs, vs 64M state rows for the exact operator).

    Semantics trade-off, documented: a Bloom false positive means a
    NOVEL url is wrongly treated as seen and silently dropped, with
    probability ``expected_fp_rate(m, k, n_inserted)`` per novel URL
    (~1e-4 at capacity); there are NO false negatives, so a true
    duplicate is never re-emitted.  Everything is deterministic (md5
    double hashing, deterministic shard assignment, rows processed in
    (warc_ts, url) order inside each micro-batch), so checkpoint replay
    reproduces the same emissions bit-for-bit.  Past capacity the FP
    rate degrades smoothly, never the dedup guarantee — size shards for
    the expected crawl frontier and let the batch ``drop_url_dups``
    compaction pass re-pick survivors exactly.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    from harvesttext_spark.functions.bloom import BloomFilter, bloom_params
    from harvesttext_spark.functions.urls import canonical_url

    m_bits, k = bloom_params(capacity_per_shard, fp_rate)
    pages = spark.readStream.schema(PAGES_SCHEMA).parquet(input_dir)
    keyed = pages.withColumn("curl", canonical_url(F.col("url"))).withColumn(
        "shard", F.pmod(F.xxhash64("curl"), F.lit(shards)).cast("int")
    )

    def dedup_shard(key, pdfs, state):
        chunks = list(pdfs)
        if not chunks:
            return iter(())
        rows = pd.concat(chunks, ignore_index=True)
        bloom = BloomFilter(
            m_bits, k, bits=bytes(state.get[0]) if state.exists else None
        )
        # deterministic intra-batch order: first (warc_ts, url) wins
        rows = rows.sort_values(["warc_ts", "url"], kind="mergesort")
        emit_mask = [
            not bloom.test_and_add(c) for c in rows["curl"].tolist()
        ]
        state.update((bytearray(bloom.to_bytes()),))
        out = rows.loc[emit_mask, ["curl", "url", "warc_ts", "text"]]
        if len(out) == 0:
            return iter(())
        return iter((out,))

    return keyed.groupBy("shard").applyInPandasWithState(
        dedup_shard,
        outputStructType="curl string, url string, warc_ts timestamp, text string",
        stateStructType="bits binary",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_dedup_against(
    spark: SparkSession,
    input_dir: str,
    bloom_params: dict,
    bloom_shards: dict,
) -> DataFrame:
    """Ingest-time cross-snapshot dedup: drop pages from the stream whose
    text LSH-band-matches a PREVIOUS dump's persisted band index
    (operators/dedup.py snapshot_band_index), compressed to a sharded
    Bloom sketch (band_index_bloom) so the check is a STATELESS per-row
    membership test — no stream-side aggregation, no state store, no
    watermark; exactly-once comes from checkpoint + idempotent sink as
    with every map-only stage.

    Per-row band keys are computed Python-side inside the same Arrow
    batch that probes the Bloom (operators/dedup.py band_keys_py —
    bit-identical to the batch index's arithmetic, and the explode+
    groupBy hot path would be a stateful streaming agg anyway).
    Semantics: NO false negatives (every true cross-dump dup drops);
    novel pages are falsely dropped with probability <= bands * fp_rate
    (~4e-4 at defaults) — the documented Bloom trade, same as
    streaming_url_dedup_bloom.  The batch --dedup-against pass remains
    the exact compaction."""
    from harvesttext_spark.operators.dedup import cross_dup_bloom_udf

    pages = spark.readStream.schema(PAGES_SCHEMA).parquet(input_dir)
    any_hit = cross_dup_bloom_udf(bloom_params, bloom_shards)
    keyed = pages.withColumn("cross_dup", any_hit(F.col("text")))
    return keyed.filter(~F.col("cross_dup")).select(
        "url", "warc_ts", "text"
    )
