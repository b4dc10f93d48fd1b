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

# persist the window census only for inputs this small (docs, not
# windows: ~200 tokens/doc ⇒ ≤ ~100M census rows ≈ a few GB serialized,
# MEMORY_AND_DISK-safe on one box; beyond that recomputing the Arrow
# pass is the documented at-scale choice)
SS_PERSIST_MAX_DOCS = 500_000


def _token_hashes(tokens, cache):
    """Per-channel polynomial char-fold hash for each token:
    acc = (acc*131 + codepoint) % M, per SS_MODS channel.

    r9 vectorization (guide §4.2): the old shape looped chars in pure
    Python per UNIQUE token (memoized, but still ~len(token) interpreted
    steps × 3 channels).  Now unique tokens are deduplicated with one
    dict pass, their codepoints land in a single int64 vector via a
    UTF-32 decode, and the fold runs char-POSITION-wise as masked numpy
    ops over the whole vocabulary (max_token_len iterations of O(vocab)
    vector math).  Arithmetic is bit-identical: acc < 2^31, so
    acc*131 + cp < 2^39 fits int64 before each mod.  ``cache`` maps
    token -> row index in the batch's unique-vocab hash table (kept
    across calls within one Arrow batch)."""
    n = len(tokens)
    inv = np.empty(n, dtype=np.int64)
    new_toks = []
    base = len(cache) - (1 if _HASH_TABLE_KEY in cache else 0)
    for j, tok in enumerate(tokens):
        k = cache.get(tok)
        if k is None:
            k = base + len(new_toks)
            cache[tok] = k
            new_toks.append(tok)
        inv[j] = k
    table = cache.get(_HASH_TABLE_KEY)
    if new_toks:
        new_h = _hash_unique_tokens(new_toks)
        table = new_h if table is None else np.vstack([table, new_h])
        cache[_HASH_TABLE_KEY] = table
    return table[inv]


_HASH_TABLE_KEY = object()  # sentinel key for the per-batch hash table


def _hash_unique_tokens(uniq):
    """(len(uniq), 3) int64 — vectorized char fold for a list of distinct
    tokens."""
    lens = np.fromiter((len(t) for t in uniq), dtype=np.int64, count=len(uniq))
    codes = np.frombuffer(
        "".join(uniq).encode("utf-32-le"), dtype=np.uint32
    ).astype(np.int64)
    offs = np.zeros(len(uniq), dtype=np.int64)
    offs[1:] = np.cumsum(lens)[:-1]
    out = np.zeros((len(uniq), len(SS_MODS)), dtype=np.int64)
    max_len = int(lens.max()) if len(lens) else 0
    for p in range(max_len):
        mask = lens > p
        cp = codes[offs[mask] + p]
        for j, m in enumerate(SS_MODS):
            out[mask, j] = (out[mask, j] * SS_CHAR_BASE + cp) % m
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
    wins = window_census(docs, k, text_col, id_col)
    # The census feeds BOTH the per-key aggregate (broadcast build) and
    # the duplicate-probe join, so the Arrow census pass evaluates twice
    # per invocation.  Below ~SS_PERSIST_MAX_DOCS input docs the window
    # table is small (n_tokens rows × 5 narrow cols) and a plan-keyed
    # persist halves the Python cost; above it the module keeps the
    # documented recompute-over-materialize choice (at crawl scale the
    # census is ~10^13 rows — spilling it to disk costs more than one
    # more Arrow pass).  Size gate via the free Catalyst estimate
    # (dedup._estimated_rows precedent — errs toward recompute).
    from harvesttext_spark.operators.dedup import _estimated_rows

    est = _estimated_rows(docs)
    if est is not None and est <= SS_PERSIST_MAX_DOCS:
        from harvesttext_spark.session import plan_keyed_persist

        # persist PRE-PARTITIONED on the window key: the cached layout
        # then satisfies ClusteredDistribution for both census levels AND
        # co-partitions the duplicate-probe join, so the warm path runs
        # with zero further exchange of the window table (the one
        # repartition is paid at materialization, where an aggregation
        # exchange was due anyway)
        wins = plan_keyed_persist(
            wins.repartition("h1", "h2", "h3"), "ss_wins"
        )
    id_type = dict(docs.dtypes)[id_col]
    if id_type in ("bigint", "int", "smallint", "tinyint"):
        # r9: numeric ids get an all-HashAggregate census.  min(struct)
        # has no mutable hash buffer → SortAggregate → TWO full sorts of
        # the window table (measured in the sf1.0 plan).  Two levels of
        # plain min/sum/min_by instead: level 1 groups by (key, id) —
        # skew-safe because the id spreads a hot boilerplate key across
        # reducers — and level 2's map-side partial aggregation collapses
        # each key to ≤1 row per partition BEFORE its exchange, so the
        # hot-key funnel the module docstring worries about never ships
        # raw rows.  first_ord ≡ (min id, min pos of that id): min_by has
        # no ties because level 1 made ids distinct per key.
        per_id = wins.groupBy("h1", "h2", "h3", "id").agg(
            F.count(F.lit(1)).alias("_ci"), F.min("pos").alias("_mpos")
        )
        census = per_id.groupBy("h1", "h2", "h3").agg(
            F.sum("_ci").alias("cnt"),
            F.min("id").alias("_mid"),
            F.min_by("_mpos", "id").alias("_mp"),
        )
        dups = (
            wins.join(census.filter(F.col("cnt") > 1), ["h1", "h2", "h3"])
            .filter(
                (F.col("id") != F.col("_mid")) | (F.col("pos") != F.col("_mp"))
            )
            .select("id", "pos")
        )
    else:
        # string ids: struct min = lexicographic (id, pos); the oracle's
        # row_number over (id, pos) agrees
        wins = wins.withColumn(
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
