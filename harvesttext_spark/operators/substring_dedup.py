"""Exact-substring deduplication — remove duplicated >=k-token runs from
all but their first occurrence (the "Deduplicating Training Data Makes
Language Models Better" rule, Lee et al. 2022; canonical k=50).

The reference implementation builds a corpus-wide suffix array — a
single-machine construction.  The Spark-first recast:

  1. WINDOW CENSUS — every k-token window of every doc, keyed by
     md5 of the space-joined window (portable: the DuckDB oracle
     reproduces it), via one per-doc sort + sliding collect_list.
  2. KEEP-FIRST — per window key, the globally first occurrence
     (lexicographic min of (id, pos) — a struct min, so string url ids
     work; the DuckDB oracle's numeric-id encode selects identically)
     survives; every other occurrence is a duplicate.
  3. SPAN MERGE — duplicate window starts cover tokens [pos, pos+k);
     overlapping/adjacent covers merge per doc with the classic
     gaps-and-islands window (break when pos > lag(pos) + k).
  4. CUT — tokens inside a span are dropped and the doc re-joined
     with single spaces; untouched docs pass through BYTE-IDENTICAL
     (no re-join), so whitespace normalization only affects docs that
     actually lost a span.

Scale: the census explodes n_tokens rows/doc (the same order of work as
MinHash shingling), shuffles once on the doc for the sliding window and
once on the uniform window hash; the duplicate-occurrence join is a
shuffle on that same hash.  Span merge touches only duplicate rows
(tiny), and the cut is a broadcast-back of per-doc span arrays.
Windows longer than a doc simply yield no rows — short docs are never
flagged.  A suffix array finds duplicated runs of ANY length >= k; the
window census finds exactly the same >=k runs (any such run contains a
duplicated k-window, and merged adjacent windows reconstruct the full
run), so the flagged spans agree with the reference rule.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def duplicate_window_spans(
    docs: DataFrame,
    k: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, start_tok, end_tok) — merged token spans (end exclusive)
    covered by k-token windows whose exact content occurs elsewhere in
    the corpus EARLIER (global order doc_id, then position).  Exact
    match: no case folding, whitespace tokens."""
    toks = docs.select(
        F.col(id_col).alias("id"),
        F.posexplode(
            F.filter(F.split(F.col(text_col), "\\s+"), lambda t: t != "")
        ).alias("pos", "tok"),
    )
    w = Window.partitionBy("id").orderBy("pos").rowsBetween(0, k - 1)
    wins = (
        toks.withColumn("_wtoks", F.collect_list("tok").over(w))
        .filter(F.size("_wtoks") == k)
        .select(
            "id",
            "pos",
            F.md5(F.array_join("_wtoks", " ")).alias("wkey"),
            # struct min = lexicographic (id, pos): works for numeric AND
            # string ids; for numeric ids it selects the same occurrence
            # as the oracle's id*1e6+pos scalar encode (pos < 1e6)
            F.struct(F.col("id").alias("i"), F.col("pos").alias("p")).alias("ord"),
        )
    )
    census = wins.groupBy("wkey").agg(
        F.count(F.lit(1)).alias("cnt"), F.min("ord").alias("first_ord")
    )
    dups = (
        wins.join(census.filter(F.col("cnt") > 1), "wkey")
        .filter(F.col("ord") != F.col("first_ord"))
        .select("id", "pos")
    )
    lagw = Window.partitionBy("id").orderBy("pos")
    spans = (
        dups.withColumn("_prev", F.lag("pos").over(lagw))
        .withColumn(
            "_break",
            F.when(
                F.col("_prev").isNull() | (F.col("pos") > F.col("_prev") + k), 1
            ).otherwise(0),
        )
        .withColumn(
            "_island",
            F.sum("_break").over(lagw.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .groupBy("id", "_island")
        .agg(
            F.min("pos").alias("start_tok"),
            (F.max("pos") + k).alias("end_tok"),
        )
        .select(F.col("id").alias(id_col), "start_tok", "end_tok")
    )
    return spans


def cut_duplicate_spans(
    docs: DataFrame,
    k: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "text_dedup",
    spans: DataFrame | None = None,
) -> DataFrame:
    """All original columns + ``out_col``: the text with duplicated spans
    removed (first occurrence corpus-wide survives).  Docs with no spans
    pass through byte-identical; cut docs are re-joined with single
    spaces.  Pass precomputed ``spans`` to reuse a census."""
    if spans is None:
        spans = duplicate_window_spans(docs, k, text_col, id_col)
    per_doc = spans.groupBy(id_col).agg(
        F.collect_list(F.struct("start_tok", "end_tok")).alias("_spans")
    )
    out = docs.join(per_doc, id_col, "left")
    toks = F.filter(F.split(F.col(text_col), "\\s+"), lambda t: t != "")
    kept = F.filter(
        toks,
        lambda t, i: ~F.exists(
            F.col("_spans"),
            lambda s: (i >= s["start_tok"]) & (i < s["end_tok"]),
        ),
    )
    return out.withColumn(
        out_col,
        F.when(F.col("_spans").isNull(), F.col(text_col)).otherwise(
            F.array_join(kept, " ")
        ),
    ).drop("_spans")
