"""Sequence packing: assign documents to fixed token-budget bins for
LLM training export (the "sample packing" step every pretraining
pipeline runs between curation and tokenization).

Global bin packing is inherently sequential, so the distributed recast
shards documents by a salted id hash and packs each shard independently
with first-fit-decreasing (FFD) — the standard quality/speed tradeoff
(≤ 11/9·OPT + 1 bins per shard).  Crucially the shard assignment and the
intra-shard order are both pure functions of (id, token_count, seed),
NEVER of the physical partitioning, so the full assignment is
deterministic and partition-invariant (this repo's resume-determinism
ground rule; no monotonically_increasing_id).

Scale design (100 TB): the pack decision needs only (id, n_tokens) —
the applyInPandas groups carry ~16 bytes/doc, not the text, so even
million-doc shards are megabytes; the text never moves through the
packing shuffle and joins back by id afterwards.  ``n_shards`` trades
packing quality (fewer, bigger shards pack tighter) against group
memory; at web scale use 2^12-2^16.

Precondition: ids unique (run exact dedup first) — duplicate ids with
equal token counts are interchangeable under the deterministic sort, so
their bin labels could swap between runs.

Rows-only contract entry (`pack_sequences`): FFD's first-fit scan is
stateful over bins and not SQL-expressible; correctness is pinned by a
pure-python row-for-row reference test instead (the pq_topk precedent).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from harvesttext_spark.functions.textstats import token_count

N_SHARDS = 256


def _ffd_pack(counts: list[int], max_tokens: int) -> list[int]:
    """First-fit-decreasing over already-sorted (desc) counts -> bin ids.
    Oversize items (> max_tokens) get a singleton bin.  Pure function —
    shared by the Spark path and the test reference."""
    bins: list[int] = []  # remaining capacity per bin; -1 = closed
    out = []
    for c in counts:
        if c > max_tokens:
            # closed singleton bin: rem -1 so even 0-token docs (NULL/
            # empty text) can never first-fit into it
            bins.append(-1)
            out.append(len(bins) - 1)
            continue
        placed = -1
        for i, rem in enumerate(bins):
            if rem >= c:
                placed = i
                break
        if placed < 0:
            bins.append(max_tokens)
            placed = len(bins) - 1
        bins[placed] -= c
        out.append(placed)
    return out


def pack_sequences(
    df: DataFrame,
    max_tokens: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    token_count_col: str | None = None,
    n_shards: int = N_SHARDS,
    seed: int = 42,
) -> DataFrame:
    """All input rows + (pack_shard, pack_bin, pack_tokens, oversize):
    documents grouped into bins of ≤ ``max_tokens`` whitespace tokens
    (or a precomputed ``token_count_col``).  (pack_shard, pack_bin)
    globally identifies a training sequence; ``oversize`` marks docs
    that exceed the budget alone (singleton bin — truncate or split
    downstream, the packer never silently drops).  NULL ids pack into a
    reserved shard -1 (route explicitly).  Deterministic on any
    partitioning."""
    if max_tokens <= 0:
        raise ValueError(f"max_tokens must be positive, got {max_tokens}")
    nt = (
        F.col(token_count_col)
        if token_count_col
        else token_count(F.col(text_col))
    )
    shard = F.when(
        F.col(id_col).isNull(), F.lit(-1)
    ).otherwise(
        (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string"))),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("bigint")
            % n_shards
        ).cast("int")
    )
    meta = df.select(
        F.col(id_col).alias("_pid"),
        F.coalesce(nt.cast("bigint"), F.lit(0)).alias("_ptok"),
        shard.alias("pack_shard"),
    )

    def pack_shard_group(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # a partition arrives as MULTIPLE Arrow batches — concat before
        # grouping, or one shard's rows would be packed as independent
        # fragments with colliding bin ids and broken capacity accounting
        # (metadata-only rows: ~16 B/doc, a partition fits comfortably)
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if not chunks:
            return
        whole = chunks[0] if len(chunks) == 1 else pd.concat(chunks, ignore_index=True)
        for _sh, grp in whole.groupby("pack_shard", sort=True):
            # FFD order: token count desc, id asc — pure data order
            grp = grp.sort_values(
                ["_ptok", "_pid"], ascending=[False, True], kind="mergesort"
            )
            counts = grp["_ptok"].tolist()
            bins = _ffd_pack(counts, max_tokens)
            yield pd.DataFrame(
                {
                    "_pid": grp["_pid"].to_numpy(),
                    "pack_shard": grp["pack_shard"].to_numpy(),
                    "pack_bin": bins,
                    "pack_tokens": grp["_ptok"].to_numpy(),
                    "oversize": [c > max_tokens for c in counts],
                }
            )

    id_type = dict(df.dtypes)[id_col]
    packed = (
        meta.repartition(n_shards if n_shards > 1 else 1, "pack_shard")
        .mapInPandas(
            pack_shard_group,
            schema=(
                f"_pid {id_type}, pack_shard int, pack_bin int, "
                "pack_tokens bigint, oversize boolean"
            ),
        )
    )
    # null-safe equality: the reserved NULL-id shard must join back too
    return df.join(packed, df[id_col].eqNullSafe(packed["_pid"]), "left").drop(
        "_pid"
    )


def pack_epochs(
    df: DataFrame,
    max_tokens: int,
    id_col: str = "doc_id",
    copies_col: str = "mix_copies",
    text_col: str = "text",
    token_count_col: str | None = None,
    n_shards: int = N_SHARDS,
    seed: int = 42,
) -> DataFrame:
    """Mixture-aware packing (round 8, VERDICT #4): one packed sequence
    slot per (document, epoch copy) — the composition step between
    mixture up-sampling (``mixture.sample_to_mixture``'s ``mix_copies``,
    the GPT-3 epoch-repeat recipe) and training export.  Plain
    ``pack_sequences`` consumes one row per id, so exploded epochs never
    reached the packed export.

    -> (id, mix_copy, pack_shard, pack_bin, pack_tokens, oversize), one
    row per copy, ``mix_copy`` in [0, copies).  The pack identity is the
    id salted with the copy ORDINAL (unit-separator concat — no rand(),
    the resume-determinism rule), so every epoch copy gets its own
    deterministic shard/bin and copies of one document spread across
    shards instead of stacking into one sequence.  Token counts are
    computed ONCE per document and exploded as metadata (~20 B/copy);
    the text never transits the explode or the packing shuffle.  Rows
    with NULL/zero copies emit nothing (dropped docs)."""
    nt = (
        F.col(token_count_col)
        if token_count_col
        else token_count(F.col(text_col))
    )
    meta = df.select(
        F.col(id_col).alias("_eid"),
        F.coalesce(nt.cast("bigint"), F.lit(0)).alias("_ptok"),
        F.coalesce(F.col(copies_col), F.lit(0)).cast("int").alias("_mc"),
    ).filter(F.col("_mc") >= 1)
    # sequence(0, mc-1) DESCENDS when mc-1 < 0 — the filter above is a
    # correctness guard, not an optimization
    exploded = meta.select(
        "_eid",
        "_ptok",
        F.explode(F.sequence(F.lit(0), F.col("_mc") - 1)).alias("mix_copy"),
    )
    salted = exploded.select(
        F.concat_ws(
            "\x1f", F.col("_eid").cast("string"), F.col("mix_copy").cast("string")
        ).alias("_pid2"),
        "_eid",
        "mix_copy",
        "_ptok",
    )
    packed = pack_sequences(
        salted,
        max_tokens,
        id_col="_pid2",
        token_count_col="_ptok",
        n_shards=n_shards,
        seed=seed,
    )
    id_type = dict(df.dtypes)[id_col]
    return packed.select(
        F.col("_eid").cast(id_type).alias(id_col),
        "mix_copy",
        "pack_shard",
        "pack_bin",
        "pack_tokens",
        "oversize",
    )


def read_packed_export(
    spark,
    output_dir: str,
    text_col: str = "text_clean",
) -> DataFrame:
    """Training-export reader for a job OUTPUT directory: one row per
    packed slot with the document text attached, ordered inside each
    (pack_shard, pack_bin) sequence by (pack_tokens desc, url, mix_copy)
    — the same deterministic order FFD placed them, so concatenating a
    bin's rows in this order reproduces the training sequence.

    Handles BOTH export shapes the job writes: with an epoch manifest
    (OUTPUT/pack_manifest — mixture max_repeat > 1) the manifest joins
    text back by url (one row per epoch copy); without it the per-row
    pack columns on OUTPUT/data are used directly (mix_copy 0).  Text
    transits one broadcast-eligible-or-shuffled equi-join on url —
    nothing is collected."""
    import os

    data = spark.read.parquet(os.path.join(output_dir, "data"))
    manifest_path = os.path.join(output_dir, "pack_manifest")
    slot_cols = [
        "url", "mix_copy", "pack_shard", "pack_bin", "pack_tokens", "oversize",
    ]
    if os.path.isdir(manifest_path):
        slots = spark.read.parquet(manifest_path).select(*slot_cols)
    else:
        if "pack_bin" not in data.columns:
            raise ValueError(
                f"{output_dir}: no pack_manifest and no pack columns on "
                "data — was the job run with --pack-max-tokens?"
            )
        slots = data.filter(F.col("pack_bin").isNotNull()).select(
            "url",
            F.lit(0).alias("mix_copy"),
            "pack_shard",
            "pack_bin",
            "pack_tokens",
            "oversize",
        )
    texts = data.select("url", F.col(text_col).alias("text"))
    return (
        slots.join(texts, "url")
        .select(
            "pack_shard", "pack_bin", "url", "mix_copy", "pack_tokens",
            "oversize", "text",
        )
        # co-locate each training sequence, THEN order inside it: the
        # text join scatters a bin's rows across partitions, and
        # sortWithinPartitions alone would order each fragment
        # separately.  One exchange on the sequence id — no global sort.
        .repartition("pack_shard", "pack_bin")
        .sortWithinPartitions(
            "pack_shard", "pack_bin", F.desc("pack_tokens"), "url", "mix_copy"
        )
    )


def pack_stats(packed: DataFrame, max_tokens: int) -> DataFrame:
    """One row per (pack_shard, pack_bin): docs, tokens, fill ratio —
    the packing-efficiency audit (two map-side-combinable aggs)."""
    return (
        packed.groupBy("pack_shard", "pack_bin")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("pack_tokens").alias("n_tokens"),
            F.max("oversize").alias("has_oversize"),
        )
        .withColumn(
            "fill_ratio", F.round(F.col("n_tokens") / F.lit(float(max_tokens)), 4)
        )
    )
