"""Benchmark decontamination: flag/drop training documents that share
token n-grams with an evaluation set (the GPT-3 / Pile 13-gram overlap
rule) — a standard large-scale training-data pipeline stage.

Spark shape: the benchmark side is SMALL (eval suites are thousands of
rows) — shingle it once, distinct, and BROADCAST; the document side
explodes its (distinct, case-folded) shingles and the broadcast join
never shuffles the corpus.  The only shuffle is the per-doc hit count
(map-side partial count).  At 100 TB the corpus side stays a single
scan + broadcast probe.

Tokenization matches the dedup family (whitespace tokens, lowercase
fold; ``token_shingles`` semantics incl. the shorter-than-n →
whole-text shingle rule), so the DuckDB oracle mirrors it exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from harvesttext_spark.operators.dedup import token_shingles


def _bench_shingles(bench: DataFrame, n: int, text_col: str) -> DataFrame:
    """(s) — distinct case-folded n-gram shingles of the benchmark set."""
    return (
        bench.select(
            F.explode(token_shingles(F.lower(F.col(text_col)), n)).alias("s")
        )
        .filter(F.col("s") != "")
        .distinct()
    )


def contamination_flags(
    docs: DataFrame,
    bench: DataFrame,
    n: int = 13,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str = "text",
) -> DataFrame:
    """(id, n_hits, contaminated) per document: n_hits = how many of the
    document's DISTINCT case-folded n-gram shingles appear anywhere in
    the benchmark set; contaminated = n_hits > 0.  NULL-text docs score
    0 hits (nothing to leak).

    PRECONDITION: ``id_col`` must be unique.  This is an aggregate +
    join-back on id, so duplicate ids would merge shingle hits across
    copies and fan the inflated n_hits back onto every copy — the
    duplicate-id-merging pitfall per-row scores avoid.  For inputs that
    may carry duplicate ids use ``drop_contaminated`` (anti-join,
    duplicate-safe, and what the job path calls)."""
    bs = _bench_shingles(bench, n, bench_text_col)
    ds = docs.select(
        F.col(id_col).alias("id"),
        F.explode(token_shingles(F.lower(F.col(text_col)), n)).alias("s"),
    )
    hits = (
        ds.join(F.broadcast(bs), "s")
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    return (
        docs.select(F.col(id_col).alias("id"))
        .join(hits, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce("n_hits", F.lit(0).cast("bigint")).alias("n_hits"),
            (F.coalesce("n_hits", F.lit(0).cast("bigint")) > 0).alias("contaminated"),
        )
    )


def drop_contaminated(
    docs: DataFrame,
    bench: DataFrame,
    n: int = 13,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str = "text",
) -> DataFrame:
    """Remove every document sharing an n-gram with the benchmark set.
    ANTI-join on the contaminated id set — duplicate-id safe (all copies
    of a contaminated id drop; no score merging), so it needs no
    uniqueness precondition and composes anywhere in the job."""
    bs = _bench_shingles(bench, n, bench_text_col)
    bad_ids = (
        docs.select(
            F.col(id_col).alias("id"),
            F.explode(token_shingles(F.lower(F.col(text_col)), n)).alias("s"),
        )
        .join(F.broadcast(bs), "s")
        .select("id")
        .distinct()
    )
    return docs.join(
        bad_ids.withColumnRenamed("id", id_col), id_col, "anti"
    )
