"""New-word discovery — freq / left-right branching entropy / PMI-style
aggregation / quality score — as a PURE RELATIONAL pipeline.

Reference semantics (``harvesttext/algorithms/word_discoverer.py:29-221`` and
``harvesttext/word_discover.py:22-96``): corpus = docs joined by newline,
punct/latin normalized to single spaces; candidates = all ≤max_word_len
substrings not containing a space; per candidate
    freq      = count / corpus_length
    left/right entropy = Shannon entropy (natural log) of the neighbor-symbol
                histograms (spaces count as neighbors; corpus ends have none)
    agg       = min over two-way splits of freq(w) / (freq(p1) * freq(p2))
    score     = log10(agg) * freq * (left_ent + right_ent)
auto params: min_entropy=ln(L)/10, min_freq=min(5e-5, 20/L),
min_aggregation=sqrt(L)/15.

Spark design — NO suffix sorting, NO driver-side dicts:
    docs --(normalize: regexp_replace, trim)--> symbol arrays
         --(explode positions, explode n)-----> candidate rows  [narrow]
         --(groupBy word [+neighbor])---------> counts & entropies  [shuffle]
         --(explode splits + 2 self-joins)----> aggregation  [shuffle]
The reference's `mem_saving` two-pass trick is unnecessary: partial hash
aggregation + spill replaces its memory management.  Skewed head grams
(的/是...) are handled by Catalyst partial aggregation (map-side combine
collapses the hot key before the shuffle) — verified in bench.

The same core runs in two modes:
  * unit="char"  — reference parity (zh new-word discovery)
  * unit="token" — the engine's web-scale repurposing: token-level
    collocation/entropy statistics as document-quality signals, and the
    DuckDB-oracle-checkable ``queries()`` path.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# exact normalization class of word_discoverer.py:139 (digits preserved)
NORM_PATTERN = (
    "[\\s,.<>/?:;'\"\\[\\]{}()\\|~!@#$%^&*\\-_=+a-zA-Z"
    "，。《》、？：；“”‘’｛｝【】（）…￥！—┄－]+"
)


# repartition the persisted candidate stream by word only below this many
# input docs (hot-word skew shield above it — see ngram_stats)
WD_REPARTITION_MAX_DOCS = 500_000


def normalize_corpus(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Punct/latin runs -> single space, trimmed; empty docs dropped.

    Per-doc normalize+strip is equivalent to the reference's
    join-then-normalize because separator newlines collapse into the
    adjacent space run (divergence only for all-whitespace docs, dropped)."""
    norm = F.trim(F.regexp_replace(F.col(text_col), NORM_PATTERN, " "))
    return (
        docs.select(F.col(id_col).alias("doc_id"), norm.alias("norm"))
        .filter(F.length("norm") > 0)
    )


def _symbolize(docs: DataFrame, text_col: str, id_col: str, unit: str) -> DataFrame:
    if unit == "char":
        # reference parity: punct/latin normalized away before char n-grams
        normed = normalize_corpus(docs, text_col, id_col)
        syms = F.filter(F.split(F.col("norm"), ""), lambda c: c != "")
    elif unit == "token":
        # token mode (engine's web-scale repurposing): whitespace tokens,
        # text kept as-is — the cleaning battery runs upstream if wanted
        normed = docs.select(
            F.col(id_col).alias("doc_id"), F.col(text_col).alias("norm")
        ).filter(F.length(F.trim("norm")) > 0)
        syms = F.filter(F.split(F.col("norm"), "\\s+"), lambda t: t != "")
    else:
        raise ValueError(unit)
    return normed.select("doc_id", syms.alias("syms")).withColumn("len", F.size("syms"))


def candidate_grams(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_word_len: int = 5,
    unit: str = "char",
) -> tuple[DataFrame, int]:
    """Emit one row per (occurrence of) candidate n-gram:
        (word, left, right)  — left/right neighbor symbol or NULL at corpus
    boundary, ' ' (char mode) / NULL (token mode) at document boundary.

    Returns (candidates, corpus_length) where corpus_length follows the
    reference's joined-string definition: sum(doc symbol count) + (N-1)
    separators.
    """
    sep = "" if unit == "char" else " "
    boundary = F.lit(" ") if unit == "char" else F.lit(None).cast("string")

    base = _symbolize(docs, text_col, id_col, unit)
    # ONE scalar job for all four corpus stats (was two separate actions —
    # two full tokenize passes; guide §1.2: don't compute things twice)
    n_docs, total, first_id, last_id = base.agg(
        F.count("*"), F.sum("len"), F.min("doc_id"), F.max("doc_id")
    ).first()
    if not n_docs:
        return base.sparkSession.createDataFrame([], "word string, left string, right string"), 0
    corpus_len = int(total) + (int(n_docs) - 1)

    # r9 codegen gram stream: the old shape exploded every position and
    # built each gram with a transform() lambda (slice + array_join per
    # element — higher-order lambdas evaluate INTERPRETED, repo rule).
    # One branch per gram length w instead: the w token slices, the left-
    # neighbor array (boundary prepended) and the right-neighbor array
    # (boundary appended) zip into array<struct> natively, ONE explode per
    # branch, and the word string is assembled per ROW with concat_ws —
    # whole-stage codegen end to end.  Same (word, left, right) multiset:
    # a length-w gram exists at position i iff i <= len - w + 1.
    flagged = base.select(
        "syms",
        "len",
        (F.col("doc_id") == F.lit(first_id)).alias("is_first"),
        (F.col("doc_id") == F.lit(last_id)).alias("is_last"),
    )
    first_left = F.when(~F.col("is_first"), boundary)
    last_right = F.when(~F.col("is_last"), boundary)
    branches = []
    for w in range(1, max_word_len + 1):
        cnt = F.col("len") - F.lit(w) + 1  # gram positions in this doc
        parts = [
            F.slice("syms", 1 + j, cnt).alias(f"s{j}") for j in range(w)
        ]
        lefts = F.concat(
            F.array(first_left), F.slice("syms", 1, cnt - 1)
        ).alias("lft")
        rights = F.concat(
            F.slice("syms", w + 1, cnt - 1), F.array(last_right)
        ).alias("rgt")
        branches.append(
            flagged.filter(F.col("len") >= w)
            .select(F.explode(F.arrays_zip(*parts, lefts, rights)).alias("g"))
            .select(
                F.concat_ws(sep, *[F.col(f"g.s{j}") for j in range(w)]).alias(
                    "word"
                ),
                F.col("g.lft").alias("left"),
                F.col("g.rgt").alias("right"),
            )
        )
    cands = branches[0]
    for b in branches[1:]:
        cands = cands.unionByName(b)
    if unit == "char":
        cands = cands.filter(~F.col("word").contains(" "))
    return cands, corpus_len


def _entropy_agg(cands: DataFrame, side: str) -> DataFrame:
    """Shannon entropy (natural log) of the neighbor histogram per word.
    ent = ln(tot) - sum(c*ln c)/tot  — two hash aggregations, both with
    map-side partial aggregation; no window, no UDF."""
    per = (
        cands.filter(F.col(side).isNotNull())
        .groupBy("word", side)
        .agg(F.count("*").alias("c"))
    )
    return per.groupBy("word").agg(
        (
            F.log(F.sum("c")) - F.sum(F.col("c") * F.log("c")) / F.sum("c")
        ).alias(f"{side}_ent")
    )


def ngram_stats(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_word_len: int = 5,
    unit: str = "char",
    min_count: int = 1,
) -> tuple[DataFrame, int]:
    """Full candidate statistics table:
        (word, cnt, freq, left_ent, right_ent, agg, score)

    ``min_count`` pre-filters the aggregation join inputs (scale knob; the
    reference keeps everything — use 1 for parity).
    """
    cands, corpus_len = candidate_grams(docs, text_col, id_col, max_word_len, unit)
    # three consumers (counts + left/right entropy) each re-ran the full
    # gram explosion; plan-keyed LRU-1 persist collapses them to one
    from harvesttext_spark.operators.dedup import _estimated_rows
    from harvesttext_spark.session import plan_keyed_persist

    est = _estimated_rows(docs)
    if est is not None and est <= WD_REPARTITION_MAX_DOCS:
        # r9: persist PRE-PARTITIONED on word — the cached layout then
        # satisfies ClusteredDistribution for counts, both entropy
        # aggregations (subset rule via (word, neighbor)) and the final
        # stats joins, removing ~5 exchanges of the gram stream from the
        # warm path.  Size-gated: above the gate a Zipf-head word would
        # funnel its raw occurrences into one partition, so the default
        # shape keeps map-side partial aggregation as the skew shield.
        cands = cands.repartition("word")
    cands = plan_keyed_persist(cands, "wd_cands")
    sep = "" if unit == "char" else " "

    counts = cands.groupBy("word").agg(F.count("*").alias("cnt"))
    if min_count > 1:
        counts = counts.filter(F.col("cnt") >= min_count)
    counts = counts.cache()  # reused three times (splits + 2 join probes)

    lent = _entropy_agg(cands, "left")
    rent = _entropy_agg(cands, "right")

    # aggregation: explode every two-way split of multi-symbol words, join
    # part frequencies back, take the min.
    if unit == "char":
        n_syms = F.length("word")
        part1 = lambda k: F.col("word").substr(F.lit(1), k)  # noqa: E731
        part2 = lambda k: F.col("word").substr(k + 1, n_syms)  # noqa: E731
    else:
        toks = F.split(F.col("word"), " ")
        n_syms = F.size(toks)
        part1 = lambda k: F.array_join(F.slice(toks, F.lit(1), k), sep or " ")  # noqa: E731
        part2 = lambda k: F.array_join(F.slice(toks, k + 1, n_syms - k), sep or " ")  # noqa: E731

    splits = (
        counts.filter(n_syms > 1)
        .select(
            "word",
            "cnt",
            F.explode(F.sequence(F.lit(1), (n_syms - 1).cast("int"))).alias("k"),
        )
        .select(
            "word",
            "cnt",
            part1(F.col("k")).alias("p1"),
            part2(F.col("k")).alias("p2"),
        )
    )
    c1 = counts.select(F.col("word").alias("p1"), F.col("cnt").alias("cnt1"))
    c2 = counts.select(F.col("word").alias("p2"), F.col("cnt").alias("cnt2"))
    agg = (
        splits.join(c1, "p1")
        .join(c2, "p2")
        .groupBy("word")
        .agg(
            F.min(
                F.col("cnt")
                * F.lit(float(corpus_len))
                / (F.col("cnt1") * F.col("cnt2"))
            ).alias("agg")
        )
    )

    stats = (
        counts.join(lent, "word", "left")
        .join(rent, "word", "left")
        .join(agg, "word", "left")
        .select(
            "word",
            "cnt",
            (F.col("cnt") / F.lit(float(corpus_len))).alias("freq"),
            F.coalesce("left_ent", F.lit(0.0)).alias("left_ent"),
            F.coalesce("right_ent", F.lit(0.0)).alias("right_ent"),
            F.coalesce("agg", F.lit(0.0)).alias("agg"),
        )
        .withColumn(
            "score", F.log10("agg") * F.col("freq") * (F.col("left_ent") + F.col("right_ent"))
        )
    )
    return stats, corpus_len


def doc_coherence(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 3,
) -> DataFrame:
    """Per-document coherence from corpus n-gram statistics (the north-star
    repurposing: word-discovery cohesion as a QUALITY SIGNAL).

    For each doc: its token bigrams join the corpus stats table; output
        mean_log_agg — mean ln(aggregation) of its known bigrams (how
                       collocation-like the doc's word pairs are)
        coverage     — fraction of its bigrams frequent enough to be known.
    Low coverage + low cohesion = shuffled word soup / boilerplate.
    -> (doc_id, n_bigrams, n_known, coverage, mean_log_agg)."""
    stats, _ = ngram_stats(docs, text_col, id_col, max_word_len=2, unit="token")
    known = stats.filter(
        (F.col("cnt") >= min_count) & (F.col("agg") > 0)
    ).select("word", F.log("agg").alias("log_agg"))

    toks = F.filter(F.split(F.col(text_col), "\\s+"), lambda t: t != "")
    base = docs.select(F.col(id_col).alias("doc_id"), toks.alias("toks")).filter(
        F.size("toks") >= 2
    )
    # codegen pair stream (r9): slice+arrays_zip+per-row concat replaces
    # the interpreted transform(sequence, element_at) lambda — identical
    # "w1 w2" strings (tokens are non-empty, concat_ws == concat here)
    n = F.size("toks")
    pairs = base.select(
        "doc_id",
        F.explode(
            F.arrays_zip(
                F.slice("toks", 1, n - 1).alias("a"),
                F.slice("toks", 2, n - 1).alias("b"),
            )
        ).alias("_bg"),
    ).select(
        "doc_id",
        F.concat(F.col("_bg.a"), F.lit(" "), F.col("_bg.b")).alias("word"),
    )
    joined = pairs.join(known, "word", "left")
    return joined.groupBy("doc_id").agg(
        F.count("*").alias("n_bigrams"),
        F.count("log_agg").alias("n_known"),
        (F.count("log_agg") / F.count("*")).alias("coverage"),
        F.avg("log_agg").alias("mean_log_agg"),
    )


@dataclass
class DiscoverParams:
    max_word_len: int = 5
    min_freq: float = 0.00005
    min_entropy: float = 1.4
    min_aggregation: float = 50.0
    ent_threshold: str = "both"  # or "avg"


def mentions_of_types(kb, excluding_types: list[str]) -> list[str]:
    """word_discover's excluding_types (word_discover.py:65-71): every
    mention of every entity registered under the given types — feed the
    result to word_discover(exclude_words=...)."""
    wanted = {f"#{t}#" for t in excluding_types} | set(excluding_types)
    out = []
    for mention, pairs in kb.mention_entities.items():
        if any(t in wanted or t[1:-1] in excluding_types for _, t in pairs):
            out.append(mention)
    return out


def auto_params(corpus_len: int, max_word_len: int = 5) -> DiscoverParams:
    """word_discover.py:46-53 empirical parameter schedule."""
    return DiscoverParams(
        max_word_len=max_word_len,
        min_entropy=math.log(corpus_len) / 10 if corpus_len > 1 else 0.0,
        min_freq=min(0.00005, 20.0 / corpus_len) if corpus_len else 0.0,
        min_aggregation=math.sqrt(corpus_len) / 15 if corpus_len else 0.0,
    )


def word_discover(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    params: DiscoverParams | None = None,
    auto: bool = True,
    unit: str = "char",
    exclude_words: list[str] | None = None,
    exclude_number: bool = True,
    sort_by: str = "freq",
    threshold_seeds: list[str] | None = None,
) -> DataFrame:
    """End-to-end new-word discovery: stats -> threshold filter -> exclusions
    -> score -> sort.  Exclusion list joins as a broadcast anti-join."""
    base_stats, corpus_len = ngram_stats(
        docs, text_col, id_col, (params or DiscoverParams()).max_word_len, unit
    )
    p = auto_params(corpus_len) if auto else (params or DiscoverParams())

    sym_len = F.length("word") if unit == "char" else F.size(F.split("word", " "))
    cond = (
        (sym_len > 1)
        & (F.col("agg") > p.min_aggregation)
        & (F.col("freq") > p.min_freq)
    )
    if p.ent_threshold == "both":
        cond = cond & (F.col("left_ent") > p.min_entropy) & (F.col("right_ent") > p.min_entropy)
    else:
        cond = cond & ((F.col("left_ent") + F.col("right_ent")) / 2.0 > p.min_entropy)
    out = base_stats.filter(cond)

    if exclude_number:
        out = out.filter(~F.col("word").rlike("^[0-9]+$"))
    if exclude_words:
        ex = docs.sparkSession.createDataFrame(
            [(w,) for w in set(exclude_words)], "word string"
        )
        out = out.join(F.broadcast(ex), "word", "left_anti")
    if threshold_seeds:
        # keep words scoring >= 0.9 * the worst seed found
        # (word_discover.py:83-92); scalar aggregate then filter
        seeds = docs.sparkSession.createDataFrame(
            [(w,) for w in set(threshold_seeds)], "word string"
        )
        min_score = (
            out.join(F.broadcast(seeds), "word", "semi")
            .agg(F.min("score"))
            .first()[0]
        )
        if min_score is not None:
            out = out.filter(F.col("score") > 0.9 * min_score)
    return out.orderBy(F.desc(sort_by))


def corpus_info(discovered: DataFrame, unit: str = "char") -> DataFrame:
    """Corpus averages over the surviving discovered words — the reference
    WordDiscoverer's avg_len / avg_freq / avg_left_entropy /
    avg_right_entropy / avg_aggregation block
    (``harvesttext/algorithms/word_discoverer.py:117-130``) as ONE scalar
    aggregate row (word_count, avg_len, avg_freq, avg_left_entropy,
    avg_right_entropy, avg_aggregation; zeros when no word survives)."""
    sym_len = (
        F.length("word") if unit == "char" else F.size(F.split("word", " "))
    )
    row = discovered.agg(
        F.count("*").alias("word_count"),
        F.coalesce(F.avg(sym_len), F.lit(0.0)).alias("avg_len"),
        F.coalesce(F.avg("freq"), F.lit(0.0)).alias("avg_freq"),
        F.coalesce(F.avg("left_ent"), F.lit(0.0)).alias("avg_left_entropy"),
        F.coalesce(F.avg("right_ent"), F.lit(0.0)).alias("avg_right_entropy"),
        F.coalesce(F.avg("agg"), F.lit(0.0)).alias("avg_aggregation"),
    )
    return row
