"""Distributed BPE vocabulary learner + tokenizer — the tokenizer-side
operator a training-data pipeline needs between curation and export
(Sennrich et al. 2016 "Neural Machine Translation of Rare Words with
Subword Units"; the same word-level BPE shape GPT-2/SentencePiece use).

Scale split (the langid/classifier pattern — distribute the counting,
close the model on the driver, broadcast it back):

  TRAIN    one groupBy word count (the ONLY corpus-wide exchange, at
           word-type cardinality), capped to the ``max_word_types``
           most frequent types via TakeOrderedAndProject — the standard
           heavy-tail guard: BPE merge decisions are driven by the head
           of the Zipf curve, and a 2^17-type dictionary is ~5 MB on
           the driver no matter how many petabytes were scanned.
           Merges are then learned on the (word, count) dictionary with
           the classic incremental pair-statistics loop — O(merges x
           affected-words), never re-scanning the corpus.
  APPLY    broadcast the merge ranks; one Arrow mapInPandas pass
           applies merges per word with a per-batch word cache (web
           text is Zipfian — the cache hits ~95% of tokens).

Determinism: word-count ties break lexicographically, pair-count ties
break lexicographically on the pair — training is a pure function of
the corpus bag-of-words.  Tokenization is a pure per-row function of
(text, merges).  No rand(), no monotonically_increasing_id.

Not SQL-expressible (the merge loop is inherently sequential), so the
``bpe_tokens`` queries() entry is rows-only; correctness is pinned by
pure-python row-for-row references and the Sennrich paper's worked
example in tests/test_bpe.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

END = "</w>"  # word-final marker (Sennrich §3.2)

# explicit class: Java \s and RE2 \s disagree on \x0b (substring_dedup pin)
_WS = "[ \t\n\x0B\f\r]+"


def word_counts(
    docs: DataFrame,
    text_col: str = "text",
    max_word_types: int = 1 << 17,
    lowercase: bool = True,
) -> DataFrame:
    """-> (word, cnt) — the ``max_word_types`` most frequent word types
    (count desc, word asc tie-break; TakeOrderedAndProject keeps the
    limit map-side partial).  The exchange is word-type-bounded."""
    col = F.col(text_col)
    if lowercase:
        col = F.lower(col)
    words = docs.select(
        F.explode(F.filter(F.split(col, _WS), lambda w: w != "")).alias("word")
    )
    return (
        words.groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("word"))
        .limit(max_word_types)
    )


def _pair_stats(vocab):
    """pair -> total count, and pair -> {word_index} over the symbolized
    vocab list [(symbols tuple, count), ...]."""
    stats: dict = {}
    index: dict = {}
    for i, (syms, cnt) in enumerate(vocab):
        for a, b in zip(syms, syms[1:]):
            stats[(a, b)] = stats.get((a, b), 0) + cnt
            index.setdefault((a, b), set()).add(i)
    return stats, index


def _merge_word(syms, pair, joined):
    out = []
    i = 0
    while i < len(syms):
        if i < len(syms) - 1 and syms[i] == pair[0] and syms[i + 1] == pair[1]:
            out.append(joined)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def learn_bpe_merges(word_cnt_rows, n_merges: int = 200) -> list[tuple[str, str]]:
    """Classic BPE on a (word, count) dictionary (driver-side; the
    dictionary is bounded by construction).  Incremental pair-statistics
    updates — each merge touches only the words containing the pair —
    with a lazy max-heap over pair counts, so a merge costs
    O(affected words + log |pairs|), not a full pair-table scan.
    Count ties break lexicographically-smallest on the pair (the heap
    order gives this for free), so the merge list is a pure function of
    the dictionary."""
    import heapq

    vocab = [
        (tuple(list(w) + [END]), int(c)) for w, c in word_cnt_rows if w
    ]
    stats, index = _pair_stats(vocab)
    heap = [(-c, p) for p, c in stats.items()]
    heapq.heapify(heap)
    merges: list[tuple[str, str]] = []

    def bump(pair, delta):
        c = stats.get(pair, 0) + delta
        stats[pair] = c
        if c > 0:
            # push on EVERY positive update (decreases too): the pop
            # loop only trusts an entry whose count matches the live
            # table, so each pair's current count must always have an
            # entry present
            heapq.heappush(heap, (-c, pair))

    while len(merges) < n_merges:
        pair = None
        while heap:
            negc, cand = heapq.heappop(heap)
            if stats.get(cand, 0) == -negc and -negc > 0:
                pair = cand
                break
            # stale entry (count changed since push) — skip; the live
            # count, if still positive, has its own heap entry
        if pair is None:
            break
        joined = pair[0] + pair[1]
        merges.append(pair)
        for i in sorted(index.get(pair, ())):
            syms, cnt = vocab[i]
            new = _merge_word(syms, pair, joined)
            if new == syms:
                continue
            # net pair-count diff only (most of a long word's pairs are
            # untouched by one merge — bumping them all was measured 10x
            # slower: every no-op decrement+increment cost two heap
            # pushes)
            delta: dict = {}
            for p in zip(syms, syms[1:]):
                delta[p] = delta.get(p, 0) - 1
            for p in zip(new, new[1:]):
                delta[p] = delta.get(p, 0) + 1
            for p, d in delta.items():
                if d == 0:
                    continue
                bump(p, d * cnt)
                if d < 0 and stats.get(p, 0) <= 0:
                    s = index.get(p)
                    if s is not None:
                        s.discard(i)
                elif d > 0:
                    index.setdefault(p, set()).add(i)
            vocab[i] = (new, cnt)
        stats.pop(pair, None)
        index.pop(pair, None)
    return merges


def train_bpe(
    docs: DataFrame,
    text_col: str = "text",
    n_merges: int = 200,
    max_word_types: int = 1 << 17,
    lowercase: bool = True,
) -> dict:
    """-> {"merges": [(a, b), ...], "lowercase": bool} — the trained
    model.  One corpus exchange (word counts), then driver-side merge
    learning on the bounded dictionary."""
    rows = word_counts(docs, text_col, max_word_types, lowercase).collect()
    merges = learn_bpe_merges([(r["word"], r["cnt"]) for r in rows], n_merges)
    return {"merges": merges, "lowercase": lowercase}


def encode_word(word: str, ranks: dict) -> list[str]:
    """Apply merges to one word by ascending rank (the GPT-2 bpe()
    shape): repeatedly merge the lowest-ranked adjacent pair."""
    syms = list(word) + [END]
    while len(syms) > 1:
        best_rank = None
        best_i = -1
        for i, pair in enumerate(zip(syms, syms[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def bpe_tokenize(
    docs: DataFrame,
    model: dict,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """-> (doc_id, bpe_tokens array<string>, n_bpe_tokens) — one Arrow
    pass, merge ranks broadcast, per-batch word cache (Zipf hit rate).
    NULL/empty text -> empty array."""
    import pandas as pd

    ranks = {pair: i for i, pair in enumerate(model["merges"])}
    lowercase = bool(model.get("lowercase", True))
    bc = docs.sparkSession.sparkContext.broadcast((ranks, lowercase))

    @F.pandas_udf("array<string>")
    def _tok(texts):
        ranks_, lower_ = bc.value
        cache: dict = {}
        out = []
        for t in texts:
            if not isinstance(t, str) or not t:
                out.append([])
                continue
            if lower_:
                t = t.lower()
            toks: list[str] = []
            for w in t.split():
                got = cache.get(w)
                if got is None:
                    got = encode_word(w, ranks_)
                    cache[w] = got
                toks.extend(got)
            out.append(toks)
        return pd.Series(out)

    return docs.select(
        F.col(id_col).alias("doc_id"), _tok(F.col(text_col)).alias("bpe_tokens")
    ).select("doc_id", "bpe_tokens", F.size("bpe_tokens").alias("n_bpe_tokens"))
