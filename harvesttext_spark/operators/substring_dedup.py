"""Exact-substring deduplication — remove duplicated >=k-token runs from
all but their first occurrence (the "Deduplicating Training Data Makes
Language Models Better" rule, Lee et al. 2022; canonical k=50).

The reference implementation builds a corpus-wide suffix array — a
single-machine construction.  The Spark-first recast:

  1. WINDOW CENSUS — every k-token window of every doc, keyed by a
     3-channel polynomial rolling hash of the window's token hashes
     (O(1) per position, fully numpy-vectorized, ZERO shuffle: one
     Arrow mapInPandas pass over (id, text) — no posexplode, no
     per-doc window sort, no k-token collect_list materialization).
     Portable: the DuckDB oracle reproduces every fold bit-exactly
     with list_reduce over the same moduli.
  2. KEEP-FIRST — per window key, the globally first occurrence
     (lexicographic min of (id, pos) — a struct min, so string url ids
     work; the DuckDB oracle's row_number over (id, pos) selects
     identically) survives; every other occurrence is a duplicate.
  3. SPAN MERGE — duplicate window starts cover tokens [pos, pos+k);
     overlapping/adjacent covers merge per doc with the classic
     gaps-and-islands window (break when pos > lag(pos) + k).
  4. CUT — tokens inside a span are dropped and the doc re-joined
     with single spaces; untouched docs pass through BYTE-IDENTICAL
     (no re-join), so whitespace normalization only affects docs that
     actually lost a span.

Scale: the census emits n_tokens rows/doc (the same order of rows as
MinHash shingling) but, unlike the round-5 sliding-collect_list shape,
holds O(n) memory per doc regardless of k — no k× transient token
blowup, which is what made the old shape the repo's one `weak` at the
canonical k=50.  The only shuffles are the census groupBy on the
uniform hash triple and the duplicate-occurrence join on that same
triple (AQE skew-join splits hot boilerplate keys; a groupBy census
with map-side partial aggregation is used instead of a window over
wkey for exactly that reason).  The window frame feeding census and
the join-back is deliberately NOT persisted: recomputing one Arrow
pass is cheaper at scale than materializing n_tokens rows.  Span merge
touches only duplicate rows (tiny), and the cut is a broadcast-back of
per-doc span arrays.  Windows longer than a doc simply yield no rows —
short docs are never flagged.  A suffix array finds duplicated runs of
ANY length >= k; the window census finds exactly the same >=k runs
(any such run contains a duplicated k-window, and merged adjacent
windows reconstruct the full run), so the flagged spans agree with the
reference rule.

Hash-key collision note: the three channels are independent polynomial
hashes mod distinct primes just under 2^31 (~93 bits joint).  At 10^14
windows (100 TB), expected joint collisions ≈ (10^14)²/2^94 ≈ 0.5 —
add a fourth channel (one more numpy pass + one more groupBy column)
if that matters for a given run; the md5 shape this replaced paid a
per-position k-token array sort for its extra bits.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# Three largest primes < 2^31: token-hash values and window-hash values
# stay < 2^31, so every intermediate product below fits in int64
# (acc*131 < 2^39 for the char fold, acc*1000003 < 2^51 for the window
# fold, h*pow < 2^62 for the vectorized prefix form) — in numpy AND in
# DuckDB BIGINT arithmetic, which is what makes the oracle mirrorable.
SS_MODS = (2147483629, 2147483587, 2147483563)
SS_CHAR_BASE = 131  # same char-fold base as functions/textstats.doc_fingerprint
SS_WIN_BASE = 1000003

# Java's default (non-UNICODE_CHARACTER_CLASS) \s = [ \t\n\x0b\f\r].
# RE2's \s is NOT the same — it EXCLUDES \x0b (vertical tab) — so the
# DuckDB oracle spells the class out explicitly ('[ \t\n\v\f\r]+') to
# tokenize identically.  Python re's \s is Unicode-aware (NBSP etc.),
# so the census tokenizer must spell the class out too, to agree
# byte-for-byte with cut_duplicate_spans' F.split(text, "\\s+").
_JAVA_WS = "[ \t\n\x0b\f\r]+"


def _token_hashes(tokens, cache):
    """Per-channel polynomial char-fold hash for each token:
    acc = (acc*131 + codepoint) % M, per SS_MODS channel.  Memoized per
    Arrow batch — web text's token vocabulary is far smaller than its
    token count."""
    out = np.empty((len(tokens), len(SS_MODS)), dtype=np.int64)
    for j, tok in enumerate(tokens):
        h = cache.get(tok)
        if h is None:
            h = []
            for m in SS_MODS:
                acc = 0
                for c in tok:
                    acc = (acc * SS_CHAR_BASE + ord(c)) % m
                h.append(acc)
            h = tuple(h)
            cache[tok] = h
        out[j] = h
    return out


def _mod_pows(base, n, m):
    """[base^0 .. base^(n-1)] mod m as int64, built with a doubling
    ladder (log2(n) vectorized multiplies, no overflow: both factors
    < 2^31)."""
    p = np.ones(1, dtype=np.int64)
    while len(p) < n:
        step = int(p[-1] * base % m)
        p = np.concatenate([p, p * step % m])
    return p[:n]


def _window_hash_channel(h, k, m):
    """Hash of every k-window of the int64 vector ``h`` under
    acc = (acc*SS_WIN_BASE + h_i) % m, vectorized via prefix hashes:

      W(p) = sum_{i=p}^{p+k-1} h_i * B^(p+k-1-i)
           = B^(p+k-1) * (Q(p+k-1) - Q(p-1))            (mod m)
      with  Q(j) = sum_{i<=j} h_i * B^(-i)  (mod m).

    Exactly equals the sequential fold the DuckDB oracle runs — pure
    modular-arithmetic identity, no floating point anywhere."""
    n = len(h)
    if n < k:
        return np.empty(0, dtype=np.int64)
    pows = _mod_pows(SS_WIN_BASE, n, m)
    inv = pow(SS_WIN_BASE, m - 2, m)
    invpows = _mod_pows(inv, n, m)
    q = np.cumsum(h * invpows % m) % m  # safe: n*2^31 < 2^63 for n < 2^32
    diff = np.empty(n - k + 1, dtype=np.int64)
    diff[0] = q[k - 1]
    diff[1:] = (q[k:] - q[:-k]) % m
    return diff * pows[k - 1 :] % m


def _census_batches(batches, k):
    """mapInPandas worker: (id, text) batches → (id, pos, h1, h2, h3)
    rows, one per k-token window.  Tokens across the batch concatenate
    into one vector (per-doc numpy overhead amortized); windows that
    would straddle a doc boundary are masked out."""
    import re

    ws = re.compile(_JAVA_WS)
    for pdf in batches:
        cache = {}
        ids, texts = pdf.iloc[:, 0], pdf.iloc[:, 1]
        all_toks, doc_idx, doc_start = [], [], []
        for i, t in enumerate(texts):
            if t is None or (isinstance(t, float) and pd.isna(t)):
                continue
            toks = [x for x in ws.split(t) if x != ""]
            if len(toks) < k:
                continue
            doc_start.append((i, len(all_toks)))
            doc_idx.extend([len(doc_start) - 1] * len(toks))
            all_toks.extend(toks)
        n = len(all_toks)
        if n < k:
            continue
        h = _token_hashes(all_toks, cache)
        d = np.asarray(doc_idx, dtype=np.int64)
        starts = np.asarray([s for _, s in doc_start], dtype=np.int64)
        valid = d[: n - k + 1] == d[k - 1 :]
        chans = [_window_hash_channel(h[:, c], k, m)[valid]
                 for c, m in enumerate(SS_MODS)]
        gpos = np.arange(n - k + 1, dtype=np.int64)[valid]
        dv = d[: n - k + 1][valid]
        row_of = np.asarray([r for r, _ in doc_start])
        yield pd.DataFrame(
            {
                "id": ids.iloc[row_of[dv]].to_numpy(),
                "pos": gpos - starts[dv],
                "h1": chans[0],
                "h2": chans[1],
                "h3": chans[2],
            }
        )


def window_census(
    docs: DataFrame,
    k: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, pos, h1, h2, h3) — one row per k-token window, keyed by the
    3-channel rolling hash.  Zero-shuffle: a single Arrow pass over the
    scan."""
    id_type = dict(docs.dtypes)[id_col]
    return docs.select(
        F.col(id_col).alias("id"), F.col(text_col).alias("t")
    ).mapInPandas(
        lambda it: _census_batches(it, k),
        schema=f"id {id_type}, pos long, h1 long, h2 long, h3 long",
    )


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
    wins = window_census(docs, k, text_col, id_col).withColumn(
        # struct min = lexicographic (id, pos): works for numeric AND
        # string ids; the oracle's row_number over (id, pos) agrees
        "ord", F.struct(F.col("id").alias("i"), F.col("pos").alias("p"))
    )
    census = wins.groupBy("h1", "h2", "h3").agg(
        F.count(F.lit(1)).alias("cnt"), F.min("ord").alias("first_ord")
    )
    dups = (
        wins.join(census.filter(F.col("cnt") > 1), ["h1", "h2", "h3"])
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
